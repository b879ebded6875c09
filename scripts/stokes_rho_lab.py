"""3D Stokes STMG contractivity A/B lab (VERDICT r4 #1b).

Measures rho(I - P A) of the Stokes slab system by masked power iteration
(constant-pressure nullspace and constrained dofs projected out) across
cells and smoother configurations, on CPU -- the cheap search loop for
the 3D h-growth fix before burning chip time.

Usage: CELLS=4,8 NTAO=2 CONFIGS=base,cheb20,inner2 python
       scripts/stokes_rho_lab.py
"""
from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stfem_tpu.mesh.grid import StructuredMesh  # noqa: E402
from stfem_tpu.ops.spatial import LaplaceMassOperator  # noqa: E402
from stfem_tpu.ops.stokes import StokesOperator  # noqa: E402
from stfem_tpu.stmg.gmg import GMGParams, build_stmg_stokes  # noqa: E402
from stfem_tpu.system_stokes import StokesSystemMatrix  # noqa: E402
from stfem_tpu.time.tables import get_fe_time_weights  # noqa: E402
from stfem_tpu.types import (SupportedSmoothers,  # noqa: E402
                             TimeStepType)

CONFIGS = {
    # bench default: Relaxation, range 5, 1 inner sweep
    "base": dict(),
    "range1": dict(smoothing_range=1.0),
    "range20": dict(smoothing_range=20.0),
    "inner2": dict(smoother_inner_iterations=2),
    "inner3": dict(smoother_inner_iterations=3),
    # Chebyshev wrapper around Vanka, deal.II degree = smoothing_steps
    "cheb20d2": dict(smoother=SupportedSmoothers.Chebyshev,
                     smoothing_range=20.0, smoother_inner_iterations=2),
    "cheb20d3": dict(smoother=SupportedSmoothers.Chebyshev,
                     smoothing_range=20.0, smoother_inner_iterations=3),
    "cheb5d2": dict(smoother=SupportedSmoothers.Chebyshev,
                    smoothing_range=5.0, smoother_inner_iterations=2),
    "steps2": dict(smoothing_steps=2),
    "steps2inner2": dict(smoothing_steps=2, smoother_inner_iterations=2),
    "steps3": dict(smoothing_steps=3),
    "cheb5d2steps2": dict(smoother=SupportedSmoothers.Chebyshev,
                          smoothing_range=5.0,
                          smoother_inner_iterations=2, smoothing_steps=2),
}


def build(cells, ntao, cfg, dim=3, k=1, u_deg=2, p_deg=1, n_q=3,
          tau=1.0 / 16.0):
    refinement = int(np.log2(cells // 2))
    mesh = StructuredMesh([2] * dim, [0.0] * dim, [1.0] * dim,
                          refinement=refinement)
    dtype = jnp.float32
    S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0, dtype=dtype)
    Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0, dtype=dtype,
                             mask=S.mask_u_np)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, tau, ntao)
    matrix = StokesSystemMatrix(S, Mu, a, b)
    params = GMGParams(**{"smoothing_range": 5.0, **cfg})
    gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                            viscosity=1.0, dtype=dtype, params=params,
                            fe_degree_min=1)
    T = a.shape[0]
    n_flat = S.n_u + S.n_p
    mask_u = np.broadcast_to(np.asarray(S.mask_u_np)[None],
                             (dim,) + tuple(S.dof_shape_u)).reshape(-1)
    mask = np.concatenate([mask_u, np.ones(S.n_p)])
    # per-time-block constant-pressure mode (normalized)
    zp = np.zeros((int(np.prod(S.cells)), S.n_ploc))
    zp[:, 0] = 1.0
    null = np.concatenate([np.zeros(S.n_u), zp.reshape(-1)])
    null = null / np.linalg.norm(null)
    return S, matrix, gmg, (T, n_flat), jnp.asarray(mask, jnp.float32), \
        jnp.asarray(null, jnp.float32)


def rho_power(matrix, gmg, shape, mask, null, iters=80, seed=0):
    rng = np.random.default_rng(seed)

    def proj(v):
        v = v * mask
        coef = v @ null
        return v - coef[:, None] * null[None, :]

    v = proj(jnp.asarray(rng.standard_normal(shape), jnp.float32))
    v = v / jnp.linalg.norm(v.reshape(-1))

    @jax.jit
    def step(v):
        w = v - gmg.vmult(matrix.vmult(v)).astype(jnp.float32)
        w = proj(w)
        n = jnp.linalg.norm(w.reshape(-1))
        return w / n, n

    lam = None
    for _ in range(iters):
        v, lam = step(v)
    return float(lam)


def main():
    cells_list = [int(c) for c in os.environ.get("CELLS", "4,8").split(",")]
    ntao = int(os.environ.get("NTAO", "2"))
    names = os.environ.get("CONFIGS", "base").split(",")
    iters = int(os.environ.get("ITERS", "80"))
    for name in names:
        cfg = CONFIGS[name]
        for cells in cells_list:
            t0 = time.time()
            S, matrix, gmg, shape, mask, null = build(cells, ntao, cfg)
            r = rho_power(matrix, gmg, shape, mask, null, iters=iters)
            print(f"{name} cells={cells} ntao={ntao}: rho(I-PA)={r:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
