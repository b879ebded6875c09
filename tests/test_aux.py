"""Aux subsystems: time-only multigrid (the transfer_01 analogue), campaign
generation, 3D heat convergence, timers."""
import numpy as np
import pytest

from stfem_tpu.drivers.heat import run_heat_cycle, stmg_preconditioner_factory
from stfem_tpu.types import CoarseningType, TimeStepType
from stfem_tpu.utils.campaign import (emit_job_script,
                                      generate_convergence_campaign)
from stfem_tpu.utils.timer import TimerOutput


def test_time_only_multigrid():
    """Time-only GMG (tau/k levels, no space coarsening): the reference's
    transfer_01 scenario."""
    res = run_heat_cycle(
        refinement=2, fe_degree=1, type_=TimeStepType.DG,
        n_timesteps_at_once=4,
        preconditioner_factory=stmg_preconditioner_factory(
            fe_degree_min=1, time_only=True,
            n_timesteps_at_once_min=1,
            coarsening_type=CoarseningType.space_or_time),
        gmres_maxiter=60)
    assert res.avg_iterations <= 25
    assert res.l2_l2 < 2e-2


@pytest.mark.slow
def test_heat_3d_converges():
    """3D heat with the full STMG preconditioner."""
    factory = stmg_preconditioner_factory(fe_degree_min=1)
    r2 = run_heat_cycle(refinement=2, fe_degree=1, type_=TimeStepType.DG,
                        n_timesteps_at_once=2, subdivisions=(1, 1, 1),
                        lower=(0.0,) * 3, upper=(1.0,) * 3,
                        preconditioner_factory=factory, gmres_maxiter=60)
    r3 = run_heat_cycle(refinement=3, fe_degree=1, type_=TimeStepType.DG,
                        n_timesteps_at_once=2, subdivisions=(1, 1, 1),
                        lower=(0.0,) * 3, upper=(1.0,) * 3,
                        preconditioner_factory=factory, gmres_maxiter=60)
    rate = np.log2(r2.l2_l2 / r3.l2_l2)
    assert rate > 1.7, (r2.l2_l2, r3.l2_l2)
    assert r3.avg_iterations <= 20


def test_campaign_generation(tmp_path):
    files = generate_convergence_campaign(str(tmp_path))
    assert len(files) == 2 * 2 * 3
    assert len(set(files)) == len(files)  # content-hashed, unique
    script = emit_job_script(files[0], str(tmp_path))
    assert "python -m stfem_tpu.drivers.tp01" in open(script).read()


def test_campaign_postprocess(tmp_path):
    """Table extraction from run logs (reference
    submit_job_postprocess.sh:33-35 awk)."""
    from stfem_tpu.utils.campaign import postprocess_campaign

    log = (":: Number of active cells: 16\n"
           "Average GMRES iterations 8 (32 / 4)\n\n"
           "Convergence table k=1\n"
           "cells s-dofs L2-L2\n16 81 1.78760e-02\n\n"
           "noise\n\n"
           "Iteration count table\n"
           "  k \\ r  2  3\n  1  8.0  8.75\n\n")
    (tmp_path / "run1.log").write_text(log)
    res = postprocess_campaign(str(tmp_path))
    assert "run1" in res
    conv = (tmp_path / "output" / "run1" / "convergence.txt").read_text()
    assert "1.78760e-02" in conv and "noise" not in conv
    iters = (tmp_path / "output" / "run1" / "iterations.txt").read_text()
    assert "8.75" in iters


def test_timer_output():
    t = TimerOutput()
    with t.scope("vmult"):
        pass
    with t.scope("vmult"):
        pass
    assert t.counts["vmult"] == 2
    assert "vmult" in t.summary()


def test_masked_cell_domain_heat():
    """Masked structured mesh (cells removed -- the dfgBenchmarkSquare
    representation, reference grids.h:243-323): heat on a square with a
    hole; dofs touching removed cells are eliminated, time-only STMG."""
    import numpy as np
    from stfem_tpu.mesh.grid import StructuredMesh

    cells = (8, 8)
    cm = np.ones(cells)
    cm[3:5, 3:5] = 0.0  # the hole
    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=3, cell_mask=cm)
    assert mesh.boundary_dof_mask(2)[7, 7] == 0.0  # hole dof eliminated

    def bump(coords):
        d2 = np.sum((coords - np.array([0.2, 0.8])) ** 2, axis=-1)
        r2 = 0.15 ** 2
        with np.errstate(divide="ignore", over="ignore"):
            v = np.where(d2 < r2, np.exp(1.0 - 1.0 / (1.0 - d2 / r2)), 0.0)
        return np.nan_to_num(v)

    # build by hand (run_heat_cycle has no cell_mask plumbing): one slab
    import jax.numpy as jnp
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.krylov import fgmres
    from stfem_tpu.time.tables import get_fe_time_weights
    K = LaplaceMassOperator(mesh, 2, 3, 0.0, 1.0)
    M = LaplaceMassOperator(mesh, 2, 3, 1.0, 0.0)
    A, B, G, Z = get_fe_time_weights(TimeStepType.DG, 1, 1 / 16, 2)
    mat = SystemMatrix(K, M, A, B)
    rhs_m = SystemMatrix(K, M, np.zeros_like(G), G)
    u0 = jnp.asarray(bump(np.asarray(mesh.dof_coordinates(2)))) * K.mask
    rhs = rhs_m.vmult(u0[None])
    res = fgmres(mat.vmult, rhs, jnp.zeros_like(rhs), maxiter=600,
                 abstol=1e-12, reltol=1e-10)
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.all(np.isfinite(x))
    # solution stays zero inside the hole, decays the bump elsewhere
    assert abs(x[-1][7, 7]) == 0.0
    assert 0 < np.max(np.abs(x[-1])) < np.max(np.abs(np.asarray(u0)))


def test_right_preconditioned_gmres_matches_fgmres():
    """flexible=False (right-preconditioned GMRES, no Z basis) must produce
    the same iterates as FGMRES when the preconditioner is a fixed linear
    operator -- identical iteration count and solution to solver tolerance
    (the STMG V-cycle is linear: fixed-step relaxation + direct coarse)."""
    import jax.numpy as jnp
    from stfem_tpu.krylov import fgmres
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights

    mesh = StructuredMesh([8, 8], [0.0, 0.0], [1.0, 1.0])
    K = LaplaceMassOperator(mesh, 2, 3, 0.0, 1.0)
    M = LaplaceMassOperator(mesh, 2, 3, 1.0, 0.0)
    A, B, G, _ = get_fe_time_weights(TimeStepType.DG, 1, 1 / 16, 2)
    mat = SystemMatrix(K, M, A, B)
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.standard_normal((A.shape[0],) + tuple(K.dof_shape))
                      ) * K.mask[None]
    # linear preconditioner: a fixed diagonal scaling
    diag = 1.0 / (1.0 + jnp.asarray(
        rng.uniform(0.0, 2.0, rhs.shape)))
    precond = lambda v: diag * v
    r1 = fgmres(mat.vmult, rhs, jnp.zeros_like(rhs), precondition=precond,
                maxiter=200, abstol=1e-30, reltol=1e-10, flexible=True)
    r2 = fgmres(mat.vmult, rhs, jnp.zeros_like(rhs), precondition=precond,
                maxiter=200, abstol=1e-30, reltol=1e-10, flexible=False)
    assert bool(r1.converged) and bool(r2.converged)
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                               rtol=0, atol=1e-8 * float(
                                   jnp.max(jnp.abs(r1.x))))


@pytest.mark.slow
def test_richardson_and_chebyshev_outer_solvers():
    """Glue-free outer iterations (preconditioned Richardson and Chebyshev
    over the STMG V-cycle) must reach the same solution as FGMRES at the
    same tolerance, with Chebyshev needing no more steps than Richardson
    (the acceleration can only help on a real positive spectrum)."""
    import jax.numpy as jnp
    from stfem_tpu.krylov import (chebyshev_solve,
                                  estimate_error_propagator_radius, fgmres,
                                  richardson_solve)
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights

    mesh = StructuredMesh([2, 2], [0, 0], [1, 1], refinement=2)
    K = LaplaceMassOperator(mesh, 2, 3, 0.0, 1.0, dtype=jnp.float64)
    M = LaplaceMassOperator(mesh, 2, 3, 1.0, 0.0, dtype=jnp.float64)
    a, b, _, _ = get_fe_time_weights(TimeStepType.DG, 1, 1 / 16, 4)
    matrix = SystemMatrix(K, M, a, b)
    gmg = build_stmg(mesh, 1, 2, TimeStepType.DG, 4, 1 / 16,
                     dtype=jnp.float64, fe_degree_min=1,
                     params=GMGParams(smoothing_steps=1,
                                      smoother_inner_iterations=2,
                                      skip_identity_levels=True,
                                      coarse_grid_smoother_type="Direct"))
    rng = np.random.default_rng(0)
    rhs = matrix.vmult(jnp.asarray(
        rng.standard_normal((8,) + mesh.dof_shape(2))) * K.mask[None])
    x0 = jnp.zeros_like(rhs)

    ref = fgmres(matrix.vmult, rhs, x0, precondition=gmg.vmult,
                 maxiter=60, abstol=1e-30, reltol=1e-10)
    assert bool(ref.converged)

    rho = float(estimate_error_propagator_radius(
        matrix.vmult, gmg.vmult,
        jnp.asarray(rng.standard_normal(rhs.shape)) * K.mask[None]))
    assert 0.0 < rho < 1.0          # the V-cycle must be contractive here

    rich = richardson_solve(matrix.vmult, rhs, x0, gmg.vmult, omega=1.0,
                            maxiter=400, abstol=1e-30, reltol=1e-10)
    assert bool(rich.converged)
    scale = float(jnp.max(jnp.abs(ref.x)))
    np.testing.assert_allclose(np.asarray(rich.x), np.asarray(ref.x),
                               rtol=0, atol=1e-8 * scale)

    cheb = chebyshev_solve(matrix.vmult, rhs, x0, gmg.vmult,
                           lambda_min=1.0 - 1.05 * rho,
                           lambda_max=1.0 + 1.05 * rho,
                           maxiter=400, abstol=1e-30, reltol=1e-10)
    assert bool(cheb.converged)
    np.testing.assert_allclose(np.asarray(cheb.x), np.asarray(ref.x),
                               rtol=0, atol=1e-8 * scale)
    # with a strong V-cycle (rho << 1) acceleration is marginal and the
    # 1.05x interval slack can cost one step; allow it
    assert int(cheb.iterations) <= int(rich.iterations) + 1
