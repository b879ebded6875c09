"""3D Stokes STMG convergence lab: the round-3 Stokes bench ran 30+ FGMRES
iterations without converging at 8^3/ntao=8 where the 2D goldens run ~12.
Isolate: small 3D problems, f64, sweep smoother configurations."""
from __future__ import annotations

import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from stfem_tpu.krylov import fgmres  # noqa: E402
from stfem_tpu.mesh.grid import StructuredMesh  # noqa: E402
from stfem_tpu.ops.spatial import LaplaceMassOperator  # noqa: E402
from stfem_tpu.ops.stokes import StokesOperator  # noqa: E402
from stfem_tpu.stmg.gmg import GMGParams, build_stmg_stokes  # noqa: E402
from stfem_tpu.system_stokes import StokesSystemMatrix  # noqa: E402
from stfem_tpu.time.tables import get_fe_time_weights  # noqa: E402
from stfem_tpu.types import (SupportedSmoothers,  # noqa: E402
                             TimeStepType)


def run_rich(cells, ntao, params, label, maxiter=40, dim=3):
    """Glue-free Richardson outer with a TRUE-residual check: is the 3D
    'iteration count' actually an FGMRES-estimate artifact?"""
    from stfem_tpu.krylov import richardson_solve
    k, u_deg, p_deg, n_q, nt = 1, 2, 1, 3, 2
    tau = 1.0 / 16.0
    mesh = StructuredMesh([2] * dim, [0.0] * dim, [1.0] * dim,
                          refinement=int(np.log2(cells // 2)))
    S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0, dtype=jnp.float64)
    Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0,
                             dtype=jnp.float64, mask=S.mask_u_np)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, ntao and tau, ntao)
    matrix = StokesSystemMatrix(S, Mu, a, b)
    gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                            viscosity=1.0, dtype=jnp.float64,
                            params=params, fe_degree_min=1)
    T = nt * ntao
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((dim,) + S.dof_shape_u)) * S.mask_u
    rhs = jnp.broadcast_to(S.pack(u0, jnp.zeros(S.p_shape)),
                           (T, S.n_u + S.n_p))
    t0 = time.time()
    res = richardson_solve(jax.jit(matrix.vmult), rhs,
                           jnp.zeros_like(rhs), jax.jit(gmg.vmult),
                           maxiter=maxiter, abstol=1e-30, reltol=1e-8)
    r = rhs - matrix.vmult(res.x)
    tr = float(jnp.linalg.norm(r.reshape(-1))
               / jnp.linalg.norm(rhs.reshape(-1)))
    print(f"{label} [RICH]: iters {int(res.iterations)}  "
          f"true {tr:.2e}  ({time.time() - t0:.0f}s)", flush=True)


def run_rho(cells, ntao, params, label, dim=3, n_it=25):
    """Spectral radius of I - P A (Richardson contraction) by power
    iteration -- instant contractivity diagnosis per smoother config."""
    from stfem_tpu.krylov import estimate_error_propagator_radius
    k, u_deg, p_deg, n_q, nt = 1, 2, 1, 3, 2
    tau = 1.0 / 16.0
    mesh = StructuredMesh([2] * dim, [0.0] * dim, [1.0] * dim,
                          refinement=int(np.log2(cells // 2)))
    S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0, dtype=jnp.float64)
    Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0,
                             dtype=jnp.float64, mask=S.mask_u_np)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, tau, ntao)
    matrix = StokesSystemMatrix(S, Mu, a, b)
    gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                            viscosity=1.0, dtype=jnp.float64,
                            params=params, fe_degree_min=1)
    T = nt * ntao
    rng = np.random.default_rng(0)
    v0 = jnp.asarray(rng.standard_normal((T, S.n_u + S.n_p)))
    t0 = time.time()
    rho = float(jax.jit(lambda v: estimate_error_propagator_radius(
        matrix.vmult, gmg.vmult, v, n_iterations=n_it))(v0))
    oms = [f"{getattr(l.smoother, 'omega', None)}" for l in gmg.levels]
    print(f"{label}: rho(I-PA) = {rho:.3f}  omegas {oms}  "
          f"({time.time() - t0:.0f}s)", flush=True)


def run(cells, ntao, params, label, maxiter=60, dim=3):
    k = 1
    u_deg, p_deg, n_q = 2, 1, 3
    nt = 2
    tau = 1.0 / 16.0
    mesh = StructuredMesh([2] * dim, [0.0] * dim, [1.0] * dim,
                          refinement=int(np.log2(cells // 2)))
    S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0, dtype=jnp.float64)
    Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0,
                             dtype=jnp.float64, mask=S.mask_u_np)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, tau, ntao)
    matrix = StokesSystemMatrix(S, Mu, a, b)
    gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                            viscosity=1.0, dtype=jnp.float64,
                            params=params, fe_degree_min=1)
    T = nt * ntao
    rng = np.random.default_rng(0)
    u0 = rng.standard_normal((dim,) + S.dof_shape_u)
    u0 = jnp.asarray(u0) * S.mask_u
    p0 = jnp.zeros(S.p_shape)
    rhs = jnp.broadcast_to(S.pack(u0, p0), (T, S.n_u + S.n_p))
    x0 = jnp.zeros_like(rhs)
    t0 = time.time()
    res = fgmres(jax.jit(matrix.vmult), rhs, x0,
                 precondition=jax.jit(gmg.vmult), maxiter=maxiter,
                 abstol=1e-30, reltol=1e-10)
    r = rhs - matrix.vmult(res.x)
    tr = float(jnp.linalg.norm(r.reshape(-1))
               / jnp.linalg.norm(rhs.reshape(-1)))
    print(f"{label}: iters {int(res.iterations)}  est "
          f"{float(res.residual):.2e}  true {tr:.2e}  "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        run(4, 2, GMGParams(smoothing_range=5.0), "3d 4^3 ntao2 default")
        run(4, 4, GMGParams(smoothing_range=5.0), "3d 4^3 ntao4 default")
    if which in ("all", "knobs"):
        run(4, 4, GMGParams(smoothing_range=5.0,
                            smoother_inner_iterations=2),
            "3d 4^3 ntao4 inner2")
        run(4, 4, GMGParams(smoother=SupportedSmoothers.Chebyshev,
                            smoothing_range=20.0,
                            smoother_inner_iterations=3),
            "3d 4^3 ntao4 cheb3/r20")
    if which in ("all", "2d"):
        run(4, 4, GMGParams(smoothing_range=5.0), "2d 4^2 ntao4 default",
            dim=2)
    if which in ("all", "8"):
        run(8, 8, GMGParams(smoothing_range=5.0), "3d 8^3 ntao8 default")
    if which in ("all", "rho"):
        run_rho(4, 2, GMGParams(smoothing_range=5.0), "r5 (bench cfg)")
        run_rho(4, 2, GMGParams(smoothing_range=5.0), "r5 2D", dim=2)
        run_rho(4, 2, GMGParams(smoothing_range=1.0), "r1")
        run_rho(4, 2, GMGParams(smoothing_range=5.0, relaxation=0.5),
                "r5 omega0.5")
        run_rho(4, 2, GMGParams(smoothing_range=5.0, relaxation=0.3),
                "r5 omega0.3")
        run_rho(4, 2, GMGParams(smoothing_range=5.0,
                                smoother_inner_iterations=2), "r5 inner2")
        run_rho(4, 2, GMGParams(smoother=SupportedSmoothers.Chebyshev,
                                smoothing_range=20.0,
                                smoother_inner_iterations=3), "cheb3 r20")
    if which in ("all", "rich"):
        run_rich(4, 2, GMGParams(smoothing_range=5.0), "3d 4^3 ntao2")
        run_rich(4, 4, GMGParams(smoothing_range=5.0), "3d 4^3 ntao4")
        run_rich(4, 4, GMGParams(smoothing_range=5.0,
                                 smoother_inner_iterations=2),
                 "3d 4^3 ntao4 inner2")

    if which in ("all", "pinv"):
        # round 4: Direct+pinv coarse (exact solve on range(A_c), pressure
        # nullspace dropped) -- root cause fix from stokes_spectrum_lab
        pd = GMGParams(smoothing_range=5.0,
                       coarse_grid_smoother_type="Direct",
                       coarse_direct_pinv=True)
        run_rho(4, 2, pd, "r5 Direct-pinv coarse 4^3")
        run_rich(4, 2, pd, "3d 4^3 ntao2 Direct-pinv")
        run_rich(4, 4, pd, "3d 4^3 ntao4 Direct-pinv")
        run(4, 4, pd, "3d 4^3 ntao4 Direct-pinv FGMRES")

    if which in ("all", "isolate"):
        # which transfer injects the expansive modes at 4^3? p-only ladder
        # (4^3 mesh built at refinement 0 -> no h levels) vs h-only ladder
        # (use_pmg=False -> no p levels), both with exact (pinv) coarse.
        from stfem_tpu.krylov import estimate_error_propagator_radius
        pd = GMGParams(smoothing_range=5.0,
                       coarse_grid_smoother_type="Direct",
                       coarse_direct_pinv=True)

        def rho_custom(mesh, params, label, ntao=2, use_pmg=True,
                       fe_degree_min=1):
            k, u_deg, p_deg, n_q, nt = 1, 2, 1, 3, 2
            tau = 1.0 / 16.0
            S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0,
                               dtype=jnp.float64)
            Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0,
                                     dtype=jnp.float64, mask=S.mask_u_np)
            a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, tau, ntao)
            matrix = StokesSystemMatrix(S, Mu, a, b)
            gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                                    viscosity=1.0, dtype=jnp.float64,
                                    params=params, fe_degree_min=1,
                                    use_pmg=use_pmg)
            T = nt * ntao
            rng = np.random.default_rng(0)
            v0 = jnp.asarray(rng.standard_normal((T, S.n_u + S.n_p)))
            rho = float(jax.jit(lambda v: estimate_error_propagator_radius(
                matrix.vmult, gmg.vmult, v, n_iterations=30))(v0))
            print(f"{label}: rho(I-PA) = {rho:.3f}  "
                  f"levels {len(gmg.levels)}", flush=True)

        mesh_p = StructuredMesh([4] * 3, [0.0] * 3, [1.0] * 3, refinement=0)
        rho_custom(mesh_p, pd, "4^3 p-only ladder (pinv coarse)")
        mesh_h = StructuredMesh([2] * 3, [0.0] * 3, [1.0] * 3, refinement=1)
        rho_custom(mesh_h, pd, "4^3 h-only ladder (pinv coarse)",
                   use_pmg=False)
        rho_custom(mesh_h, pd, "4^3 h+p ladder (pinv coarse)")

    if which in ("all", "ladder"):
        from stfem_tpu.krylov import estimate_error_propagator_radius
        from stfem_tpu.stmg.smoother import IdentitySmoother

        def rho_ladder(params, label, ntao=2, **kw):
            k, u_deg, p_deg, n_q, nt = 1, 2, 1, 3, 2
            tau = 1.0 / 16.0
            mesh = StructuredMesh([2] * 3, [0.0] * 3, [1.0] * 3,
                                  refinement=1)
            S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0,
                               dtype=jnp.float64)
            Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0,
                                     dtype=jnp.float64, mask=S.mask_u_np)
            a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, tau, ntao)
            matrix = StokesSystemMatrix(S, Mu, a, b)
            gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                                    viscosity=1.0, dtype=jnp.float64,
                                    params=params, fe_degree_min=1, **kw)
            desc = []
            for lvl in gmg.levels:
                om = getattr(lvl.smoother, "omega", None)
                sm = type(lvl.smoother).__name__[:5]
                desc.append(f"{lvl.n_blocks}b/{tuple(lvl.dof_shape)}"
                            f"/{sm}/{None if om is None else round(om, 3)}")
            T = nt * ntao
            rng = np.random.default_rng(0)
            v0 = jnp.asarray(rng.standard_normal((T, S.n_u + S.n_p)))
            rho = float(jax.jit(lambda v: estimate_error_propagator_radius(
                matrix.vmult, gmg.vmult, v, n_iterations=30))(v0))
            print(f"{label}: rho = {rho:.3f}\n   levels: {desc}",
                  flush=True)

        pd = dict(smoothing_range=5.0, coarse_grid_smoother_type="Direct",
                  coarse_direct_pinv=True)
        rho_ladder(GMGParams(**pd), "h+p default")
        rho_ladder(GMGParams(**pd, smooth_all_levels=True),
                   "h+p smooth_all_levels")
        rho_ladder(GMGParams(**pd), "h+p time_before_space",
                   time_before_space=True)
        rho_ladder(GMGParams(**pd), "h+p space_time_level_first",
                   space_time_level_first=True)
        rho_ladder(GMGParams(**pd, relaxation=1.0), "h+p omega=1 all")

    if which in ("all", "fixed"):
        # round-4 fix validation: reference-faithful space ladder (velocity
        # never below Q2) + Direct/pinv coarse
        pd = GMGParams(smoothing_range=5.0,
                       coarse_grid_smoother_type="Direct",
                       coarse_direct_pinv=True)
        run_rho(4, 2, pd, "FIXED 4^3 ntao2")
        run_rich(4, 4, pd, "FIXED 4^3 ntao4")
        run(4, 4, pd, "FIXED 4^3 ntao4 FGMRES")
        ps = GMGParams(smoothing_range=5.0)
        run_rho(4, 2, ps, "FIXED 4^3 ntao2 (GMRES coarse)")
        run(8, 8, pd, "FIXED 8^3 ntao8 FGMRES", maxiter=30)
        run_rich(8, 8, pd, "FIXED 8^3 ntao8 RICH")

    if which in ("all", "fixed8"):
        pd = GMGParams(smoothing_range=5.0,
                       coarse_grid_smoother_type="Direct",
                       coarse_direct_pinv=True)
        run(8, 8, pd, "FIXED8 8^3 ntao8 FGMRES", maxiter=40)
        run_rich(8, 8, pd, "FIXED8 8^3 ntao8 RICH", maxiter=40)
        run_rho(8, 4, pd, "FIXED8 8^3 ntao4 rho")
