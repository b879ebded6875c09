"""STMG preconditioner integration tests: mesh-independent O(10) FGMRES
iteration counts and golden-exact errors for heat and wave.

Iteration-count parity with the reference goldens (7/9 for heat DG(1) refs
2/3) is within +-1 since the order-invariant Arnoldi eigenvalue estimates
(GMGParams.eig_exact, round 3); bounds here are golden + 1.05."""
import pytest

from stfem_tpu.drivers.heat import run_heat_cycle, stmg_preconditioner_factory
from stfem_tpu.stmg.gmg import GMGParams
from stfem_tpu.types import ProblemType, TimeStepType

GOLDEN_DG1 = {2: 1.78760e-02, 3: 3.24200e-03}


@pytest.mark.parametrize("ref,max_avg", [(2, 8.05), (3, 10.05)])
def test_heat_stmg_iterations(ref, max_avg):
    res = run_heat_cycle(
        refinement=ref, fe_degree=1, type_=TimeStepType.DG,
        n_timesteps_at_once=2,
        preconditioner_factory=stmg_preconditioner_factory(fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= max_avg
    assert res.l2_l2 == pytest.approx(GOLDEN_DG1[ref], rel=2e-5)


def test_wave_stmg():
    res = run_heat_cycle(
        refinement=2, fe_degree=1, type_=TimeStepType.DG,
        problem=ProblemType.wave, n_timesteps_at_once=4,
        preconditioner_factory=stmg_preconditioner_factory(
            params=GMGParams(skip_identity_levels=True), fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= 13
    # golden tests/tp_01.output:371 (wave DG(1), 4 steps at once)
    assert res.l2_l2 == pytest.approx(2.07852e-02, rel=2e-5)
    assert res.linf_linf == pytest.approx(7.45999e-02, rel=2e-5)


def test_heat_cgp_stmg():
    res = run_heat_cycle(
        refinement=2, fe_degree=2, type_=TimeStepType.CGP,
        n_timesteps_at_once=2,
        preconditioner_factory=stmg_preconditioner_factory(fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= 14
    assert res.converged if hasattr(res, "converged") else True


def test_vanka_fastdiag_scan_equals_dense():
    """Multi-step fastdiag (block-bidiagonal per-step solve + associative-scan
    coupling) must agree with the reference-style dense patch inverse to
    machine precision, for DG and CGP tables; the wave tables (full
    lower-triangular cross-step coupling) must fall back to the dense
    T x T eigen-path."""
    import jax.numpy as jnp
    import numpy as np

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.vanka import PreconditionVanka
    from stfem_tpu.time.tables import (get_fe_time_weights,
                                       get_fe_time_weights_wave)

    mesh = StructuredMesh([3, 3], [0.0, 0.0], [1.0, 1.0], refinement=1)
    K = LaplaceMassOperator(mesh, 2, 3, 0.0, 1.0)
    M = LaplaceMassOperator(mesh, 2, 3, 1.0, 0.0)
    rng = np.random.default_rng(7)
    import os
    for type_, r in [(TimeStepType.DG, 1), (TimeStepType.CGP, 2)]:
        A, B, _, _ = get_fe_time_weights(type_, r, 0.125, 4)
        # grid apply (per-axis banded matmuls) is the default on this
        # uniform unmapped mesh; the cell-major scan path stays under
        # STFEM_GRID_VANKA=0
        v_grid = PreconditionVanka(K, M, A, B, mode="fastdiag", n_steps=4)
        assert v_grid.n_steps == 4 and v_grid.Wdn is not None
        os.environ["STFEM_GRID_VANKA"] = "0"
        try:
            v_scan = PreconditionVanka(K, M, A, B, mode="fastdiag",
                                       n_steps=4)
        finally:
            del os.environ["STFEM_GRID_VANKA"]
        assert v_scan.n_steps == 4 and v_scan.Ginv is not None
        v_dense = PreconditionVanka(K, M, A, B, mode="dense")
        # defects are interior-supported in the solver (rhs and operator
        # outputs are masked); the separable eigenbasis relies on it
        src = jnp.asarray(rng.standard_normal((A.shape[0],)
                                              + mesh.dof_shape(2))) * K.mask
        np.testing.assert_allclose(np.asarray(v_scan.vmult(src)),
                                   np.asarray(v_dense.vmult(src)),
                                   rtol=1e-9, atol=1e-11)
        # single-step fastdiag path unchanged
        v_fd = PreconditionVanka(K, M, A, B, mode="fastdiag")
        np.testing.assert_allclose(np.asarray(v_fd.vmult(src)),
                                   np.asarray(v_dense.vmult(src)),
                                   rtol=1e-9, atol=1e-11)

    # separable (per-axis Kronecker) eigenbasis active on this uniform
    # unmapped mesh and exact vs both the dense-eigh fastdiag and the dense
    # inverse (round-2: kills the batched C x A x A eigh at setup and the
    # dense V matmul in the apply)
    A, B, _, _ = get_fe_time_weights(TimeStepType.DG, 1, 0.125, 4)
    # default: grid apply (banded matmuls built from the per-axis factors)
    v_auto = PreconditionVanka(K, M, A, B, mode="fastdiag", n_steps=4)
    assert v_auto.Wdn is not None and v_auto.V is None
    os.environ["STFEM_SEP_VANKA_APPLY"] = "1"
    os.environ["STFEM_GRID_VANKA"] = "0"
    try:
        v_fac = PreconditionVanka(K, M, A, B, mode="fastdiag", n_steps=4)
    finally:
        del os.environ["STFEM_SEP_VANKA_APPLY"]
        del os.environ["STFEM_GRID_VANKA"]
    assert v_fac.Vsep is not None
    os.environ["STFEM_NO_SEP_VANKA"] = "1"
    try:
        v_eigh = PreconditionVanka(K, M, A, B, mode="fastdiag", n_steps=4)
    finally:
        del os.environ["STFEM_NO_SEP_VANKA"]
    assert v_eigh.Vsep is None
    src = jnp.asarray(rng.standard_normal((A.shape[0],)
                                          + mesh.dof_shape(2))) * K.mask
    y_eigh = np.asarray(v_eigh.vmult(src))
    np.testing.assert_allclose(np.asarray(v_auto.vmult(src)), y_eigh,
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(v_fac.vmult(src)), y_eigh,
                               rtol=1e-9, atol=1e-11)
    # ineligible (coefficient field) -> falls back to the batched eigh
    coeff = lambda pts: 1.0 + pts[..., 0]
    K_c = LaplaceMassOperator(mesh, 2, 3, 0.0, 1.0, coefficient=coeff)
    v_c = PreconditionVanka(K_c, M, A, B, mode="fastdiag", n_steps=4)
    assert v_c.Vsep is None

    # wave tables: cross-step coupling is NOT rank-1 bidiagonal -> fallback
    A, B, G, Z = get_fe_time_weights(TimeStepType.DG, 1, 0.125, 1)
    Aw, Bw = get_fe_time_weights_wave(TimeStepType.DG, A, B, G, Z, 4)[:2]
    v_wave = PreconditionVanka(K, M, Aw, Bw, mode="fastdiag", n_steps=4)
    assert v_wave.n_steps == 1 and v_wave.TTg is not None
    v_wave_dense = PreconditionVanka(K, M, Aw, Bw, mode="dense")
    src = jnp.asarray(rng.standard_normal((Aw.shape[0],)
                                          + mesh.dof_shape(2))) * K.mask
    np.testing.assert_allclose(np.asarray(v_wave.vmult(src)),
                               np.asarray(v_wave_dense.vmult(src)),
                               rtol=1e-9, atol=1e-11)


def test_direct_coarse_solver():
    """coarse_grid_smoother_type='Direct': the assembled-and-inverted
    coarsest slab operator gives the same FGMRES iteration counts as the
    reference-style coarse GMRES (measured identical on TPU; pinned here on
    CPU), at one matmul of runtime cost."""
    import jax.numpy as jnp
    from stfem_tpu.krylov import fgmres
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights

    import numpy as np

    mesh = StructuredMesh([2, 2], [0, 0], [1, 1], refinement=2)
    K = LaplaceMassOperator(mesh, 2, 3, 0.0, 1.0, dtype=jnp.float32)
    M = LaplaceMassOperator(mesh, 2, 3, 1.0, 0.0, dtype=jnp.float32)
    a, b, _, _ = get_fe_time_weights(TimeStepType.DG, 1, 1 / 16, 4)
    matrix = SystemMatrix(K, M, a, b)
    rng = np.random.default_rng(0)
    rhs = matrix.vmult(jnp.asarray(
        rng.standard_normal((8,) + mesh.dof_shape(2)), jnp.float32))
    iters = {}
    for ctype in ("GMRES", "Direct"):
        gmg = build_stmg(mesh, 1, 2, TimeStepType.DG, 4, 1 / 16,
                         dtype=jnp.float32, fe_degree_min=1,
                         params=GMGParams(smoothing_steps=2, variable=False,
                                          coarse_grid_smoother_type=ctype))
        res = fgmres(matrix.vmult, rhs, jnp.zeros_like(rhs),
                     precondition=gmg.vmult, maxiter=40, abstol=1e-30,
                     reltol=1e-8)
        assert bool(res.converged)
        iters[ctype] = int(res.iterations)
    assert abs(iters["Direct"] - iters["GMRES"]) <= 1


def test_pallas_grid_vanka_parity(monkeypatch):
    """Pallas grid Vanka (fused per-block chains, reversed-order factors)
    must agree with the XLA grid apply to machine precision."""
    import jax.numpy as jnp
    import numpy as np

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.vanka import PreconditionVanka
    from stfem_tpu.time.tables import get_fe_time_weights

    monkeypatch.setenv("STFEM_PALLAS_GRID", "1")
    monkeypatch.setenv("STFEM_PALLAS_MIN_DOFS", "1")
    rng = np.random.default_rng(1)
    for dim, cells, k, ns in [(2, (4, 4), 3, 1), (3, (3, 3, 3), 4, 4)]:
        mesh = StructuredMesh(list(cells), [0.0] * dim, [1.0] * dim)
        K = LaplaceMassOperator(mesh, k, k + 1, 0.0, 1.0)
        M = LaplaceMassOperator(mesh, k, k + 1, 1.0, 0.0)
        A, B, _, _ = get_fe_time_weights(TimeStepType.DG, 2, 0.125, ns)
        vp = PreconditionVanka(K, M, A, B, n_steps=ns)
        assert vp.pallas_grid
        monkeypatch.setenv("STFEM_PALLAS_GRID", "0")
        vx = PreconditionVanka(K, M, A, B, n_steps=ns)
        monkeypatch.setenv("STFEM_PALLAS_GRID", "1")
        assert not vx.pallas_grid
        x = jnp.asarray(rng.standard_normal(
            (A.shape[0],) + tuple(K.dof_shape))) * K.mask
        np.testing.assert_allclose(np.asarray(vp.vmult(x)),
                                   np.asarray(vx.vmult(x)),
                                   rtol=1e-9, atol=1e-12)


def test_pallas_timesolve_kernel_parity():
    """The fused Pallas time-solve kernel (ops/pallas_timesolve.py,
    interpret mode on CPU) must reproduce the sequential block-bidiagonal
    recurrence exactly, and the grid Vanka must pick a lane tile on
    128-divisible eigen grids."""
    import jax.numpy as jnp
    import numpy as np

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.pallas_timesolve import pick_tile, time_solve_pallas
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.vanka import PreconditionVanka
    from stfem_tpu.time.tables import get_fe_time_weights

    S, nt, N = 4, 3, 1024
    TN = pick_tile(N, S, nt, 4)
    assert TN is not None and N % TN == 0 and TN % 128 == 0
    rng = np.random.default_rng(11)
    w = rng.standard_normal((S * nt, N)).astype(np.float32)
    GinvT = (0.3 * rng.standard_normal((nt, nt, N))).astype(np.float32)
    cvecT = rng.uniform(-0.9, 0.9, (nt, N)).astype(np.float32)

    # sequential reference recurrence
    ws = w.reshape(S, nt, N)
    y = np.einsum("ijn,sjn->sin", GinvT, ws)
    out_ref = np.empty_like(y)
    prev = np.zeros(N, np.float32)
    for s in range(S):
        out_ref[s] = y[s] + prev[None] * cvecT
        prev = y[s, nt - 1] + cvecT[nt - 1] * prev
    out = time_solve_pallas(jnp.asarray(w), jnp.asarray(GinvT),
                            jnp.asarray(cvecT), S, nt, TN, jnp.float32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), out_ref.reshape(S * nt, N),
                               rtol=1e-5, atol=1e-5)

    # integration: a grid Vanka whose eigen grid is 128-divisible picks a
    # tile; on CPU platform_dependent lowers the XLA branch (parity with
    # the scan path is covered by test_vanka_fastdiag_scan_equals_dense)
    mesh = StructuredMesh([8, 8], [0.0, 0.0], [1.0, 1.0])
    K = LaplaceMassOperator(mesh, 3, 4, 0.0, 1.0, dtype=jnp.float32)
    M = LaplaceMassOperator(mesh, 3, 4, 1.0, 0.0, dtype=jnp.float32)
    A, B, _, _ = get_fe_time_weights(TimeStepType.DG, 2, 0.125, 4)
    v = PreconditionVanka(K, M, A, B, n_steps=4)
    assert v._ts_tile is not None
    x = jnp.asarray(rng.standard_normal(
        (A.shape[0],) + tuple(K.dof_shape))) * K.mask
    assert np.isfinite(np.asarray(v.vmult(x))).all()


def test_pallas_timesolve_tile_legality():
    """pick_tile must only return Mosaic-legal tiles: lane dim 128, row
    count divisible by 8 (or the full array), dividing N; N = 40^3 (the
    8^3 bench eigen grid) has no legal tile and must return None."""
    from stfem_tpu.ops.pallas_timesolve import pick_tile

    for N in (80 ** 3, 40 ** 3, 160 ** 3, 1024, 999):
        t = pick_tile(N, 32, 3, 2)
        if t is None:
            continue
        rows = t // 128
        assert t % 128 == 0 and N % t == 0
        assert rows % 8 == 0 or rows == N // 128
    assert pick_tile(40 ** 3, 32, 3, 2) is None
    assert pick_tile(999, 32, 3, 2) is None
