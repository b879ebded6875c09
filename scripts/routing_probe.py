"""One-process A/B of every SystemMatrix middle routing x precision, plus
Vanka apply variants, at the bench shapes.  All variants timed back-to-back
on the same chip state (cross-session numbers proved unreliable).

Env: STFEM_BENCH_CELLS (16), STFEM_BENCH_NTAO (32), STFEM_PROBE_REPS (20).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.vanka import PreconditionVanka
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "16"))
    n_at_once = int(os.environ.get("STFEM_BENCH_NTAO", "32"))
    reps = int(os.environ.get("STFEM_PROBE_REPS", "20"))
    dtype = jnp.float32
    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]

    mats = {}
    vankas = {}
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, 4, 5, 0.0, 1.0, dtype=dtype)
        M = LaplaceMassOperator(mesh, 4, 5, 1.0, 0.0, dtype=dtype)
        A, B, _, _ = get_fe_time_weights(TimeStepType.DG, 2, 1.0 / 16,
                                         n_at_once)
        for routing, env in [("grid", {}),
                             ("fullbasis", {"STFEM_GRID_SUMFAC": "0"}),
                             ("celllocal", {"STFEM_GRID_SUMFAC": "0",
                                            "STFEM_NO_PALLAS": "1"})]:
            old = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                for prec in (None, "highest"):
                    mats[f"{routing}_{prec or 'fast'}"] = SystemMatrix(
                        K, M, A, B, precision=prec)
            finally:
                for k, v in old.items():
                    os.environ.pop(k, None) if v is None else \
                        os.environ.__setitem__(k, v)
        vankas["vanka_grid"] = PreconditionVanka(
            K, M, A, B, storage_dtype=jnp.bfloat16, n_steps=n_at_once)
        os.environ["STFEM_GRID_VANKA"] = "0"
        vankas["vanka_ship"] = PreconditionVanka(
            K, M, A, B, storage_dtype=jnp.bfloat16, n_steps=n_at_once)
        del os.environ["STFEM_GRID_VANKA"]

    shape = (A.shape[0],) + tuple(K.dof_shape)
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), dtype), tpu)
    out = {"cells": cells_per_axis, "ntao": n_at_once}
    for name, m in {**mats, **vankas}.items():
        m = jax.device_put(m, tpu)

        @jax.jit
        def loop(m_, v):
            def body(_, u):
                return m_.vmult(u) / jnp.linalg.norm(u.reshape(-1))
            return jax.lax.fori_loop(0, reps, body, v)

        y = loop(m, x); _ = float(jnp.sum(y))
        t0 = time.time(); _ = float(jnp.sum(x)); rb = time.time() - t0
        t0 = time.time()
        y = loop(m, x); _ = float(jnp.sum(y))
        out[name] = round(1e3 * max((time.time() - t0 - rb) / reps, 0.0), 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
