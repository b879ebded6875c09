"""Wave STMG contractivity / h-robustness lab (VERDICT r4 #3).

Measures rho(I - P A) of the Schur-reduced wave slab system by power
iteration across ntao in {8, 16, 32} and cells, plus the per-level
lambda_max(P_s A_s) estimates the smoother calibration uses -- to
root-cause (a) the ntao=32 divergence and (b) the 8^3 -> 16^3 iteration
growth (18 -> 31) seen on the chip, both on a cheap CPU mesh.

Usage: DIM=2 CELLS=4,8 NTAO=8,16,32 python scripts/wave_lab.py
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
from stfem_tpu.stmg.gmg import GMGParams, build_stmg  # noqa: E402
from stfem_tpu.system import SystemMatrix  # noqa: E402
from stfem_tpu.time.tables import (get_fe_time_weights,  # noqa: E402
                                   get_fe_time_weights_wave)
from stfem_tpu.types import (ProblemType, SupportedSmoothers,  # noqa: E402
                             TimeStepType)


def build(dim, cells, ntao, fe_degree=2, space_degree=4, tau=1.0 / 16.0,
          smoothing_range=1.0, inner=2, dtype=jnp.float32):
    refinement = int(np.log2(cells // 2))
    mesh = StructuredMesh([2] * dim, [0.0] * dim, [1.0] * dim,
                          refinement=refinement)
    K = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 0.0, 1.0,
                            dtype=dtype)
    M = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 1.0, 0.0,
                            dtype=dtype)
    A1, B1, G1, Z1 = get_fe_time_weights(TimeStepType.DG, fe_degree, tau, 1)
    A_lhs, B_lhs, rhs_uK, rhs_uM, rhs_vM = get_fe_time_weights_wave(
        TimeStepType.DG, A1, B1, G1, Z1, ntao)
    matrix = SystemMatrix(K, M, A_lhs, B_lhs)
    mask = jnp.asarray(K.mask_np, jnp.float32)
    gmg = build_stmg(mesh, fe_degree, space_degree, TimeStepType.DG,
                     ntao, tau, problem=ProblemType.wave, dtype=dtype,
                     fe_degree_min=1,
                     params=GMGParams(
                         smoother=SupportedSmoothers.Relaxation,
                         smoothing_range=smoothing_range,
                         coarse_grid_smoother_type="Direct",
                         smoother_inner_iterations=inner,
                         skip_identity_levels=True,
                         vanka_bf16=False, level_bf16=False,
                         eig_proxy_cells=0))
    shape = (A_lhs.shape[0],) + mesh.dof_shape(space_degree)
    return mesh, matrix, gmg, shape, mask


def rho_power(matrix, gmg, shape, mask, iters=60, seed=0):
    """rho(I - P A) by power iteration on the FREE dofs (f32, like the
    bench hierarchy; constrained dofs are identity modes of I - PA and
    would read a spurious rho = 1)."""
    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32) * mask
    v = v / jnp.linalg.norm(v.reshape(-1))

    @jax.jit
    def step(v):
        w = (v - gmg.vmult(matrix.vmult(v)).astype(jnp.float32)) * mask
        n = jnp.linalg.norm(w.reshape(-1))
        return w / n, n

    lam = None
    for _ in range(iters):
        v, lam = step(v)
    return float(lam)


def main():
    dim = int(os.environ.get("DIM", "2"))
    cells_list = [int(c) for c in os.environ.get("CELLS", "4,8").split(",")]
    ntao_list = [int(n) for n in os.environ.get("NTAO", "8,16,32").split(",")]
    rng_env = os.environ.get("RANGE", "1.0")
    inner = int(os.environ.get("INNER", "2"))
    print(f"# wave lab dim={dim} range={rng_env} inner={inner}")
    for cells in cells_list:
        for ntao in ntao_list:
            t0 = time.time()
            _, matrix, gmg, shape, mask = build(
                dim, cells, ntao, smoothing_range=float(rng_env),
                inner=inner)
            r = rho_power(matrix, gmg, shape, mask)
            # per-level relaxation omegas (2/(alpha+lam_max)) from the
            # build's eigenvalue estimates
            oms = [getattr(lvl.smoother, "omega", None)
                   for lvl in gmg.levels]
            print(f"cells={cells} ntao={ntao}: rho(I-PA)={r:.4f}  "
                  f"({time.time() - t0:.0f}s)  level omega: "
                  + ", ".join("-" if o is None else f"{float(o):.3g}"
                              for o in oms), flush=True)


if __name__ == "__main__":
    main()
