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
