"""Per-phase setup-time breakdown for the bench problem (VERDICT r1 next #8:
16^3 setup must drop from ~632 s to < 30 s).

Phases measured separately, on a chosen device (STFEM_SETUP_DEVICE=cpu|tpu):
  ops        LaplaceMassOperator construction (element matrices, geometry)
  tables     time-weight tables
  vanka      PreconditionVanka jitted builds (banded assembly + eigh + inv)
  eig        power-iteration eigenvalue estimates (jitted, per level)
  hierarchy  full build_stmg (includes vanka+eig; the difference is the
             python/meta/transfer overhead)
  force64    per-slab f64 force assembly (the IR path's host-side work)

Usage: CELLS=16 python scripts/setup_profile.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells = int(os.environ.get("CELLS", "16"))
    n_at_once = int(os.environ.get("NTAO", "32"))
    fe_degree, space_degree = 2, 4
    refinement = int(np.log2(cells // 2))
    dtype = jnp.float32
    tau = 1.0 / 16.0

    want = os.environ.get("STFEM_SETUP_DEVICE", "cpu")
    dev = jax.devices("cpu")[0] if want == "cpu" else jax.devices()[0]
    print(f"# device {dev}", flush=True)

    def phase(name, fn):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out) if out is not None else None
        dt = time.time() - t0
        print(f"{name:12s} {dt:8.2f} s", flush=True)
        return out

    with jax.default_device(dev):
        mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                              refinement=refinement)

        def mk_ops():
            K = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                    0.0, 1.0, dtype=dtype)
            M = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                    1.0, 0.0, dtype=dtype)
            return K, M

        K, M = phase("ops", mk_ops)
        tabs = phase("tables", lambda: None) or get_fe_time_weights(
            TimeStepType.DG, fe_degree, tau, n_at_once)
        Alpha, Beta, Gamma, Zeta = tabs

        from stfem_tpu.stmg.vanka import PreconditionVanka

        vanka = phase("vanka_fine", lambda: PreconditionVanka(
            K, M, Alpha, Beta, dtype=dtype, storage_dtype=jnp.bfloat16,
            n_steps=n_at_once))

        from stfem_tpu.stmg.smoother import (estimate_eigenvalues)
        from stfem_tpu.system import SystemMatrix

        matrix = SystemMatrix(K, M, Alpha, Beta, precision=None)
        shape = (Alpha.shape[0],) + mesh.dof_shape(space_degree)
        phase("eig_fine", lambda: estimate_eigenvalues(
            matrix, vanka, shape, K.mask_np, dtype, 20, 1.2))

        phase("hierarchy", lambda: build_stmg(
            mesh, fe_degree, space_degree, TimeStepType.DG, n_at_once, tau,
            dtype=dtype, fe_degree_min=1,
            params=GMGParams(smoothing_steps=1, vanka_bf16=True,
                             smoother_inner_iterations=2,
                             skip_identity_levels=True,
                             coarse_grid_smoother_type="Direct")))


if __name__ == "__main__":
    main()
