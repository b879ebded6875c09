"""Time one SystemMatrix.vmult on-chip under each middle routing
(grid / full-basis / cell-local) x (f32-highest outer, emulated f64).
Env: STFEM_BENCH_CELLS (8), STFEM_BENCH_NTAO (32), STFEM_PROBE_REPS (10).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(routing, dtype_name, precision):
    import jax
    import jax.numpy as jnp
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "8"))
    n_at_once = int(os.environ.get("STFEM_BENCH_NTAO", "32"))
    dtype = dict(f32=jnp.float32, f64=jnp.float64)[dtype_name]
    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    cpu = jax.devices("cpu")[0]
    env = {"grid": {},
           "fullbasis": {"STFEM_GRID_SUMFAC": "0"},
           "celllocal": {"STFEM_GRID_SUMFAC": "0",
                         "STFEM_NO_PALLAS": "1"}}[routing]
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    # defeat the f64-emulated auto-rule so every routing is measurable
    real_backend = jax.default_backend
    jax.default_backend = lambda: "cpu"
    try:
        with jax.default_device(cpu):
            K = LaplaceMassOperator(mesh, 4, 5, 0.0, 1.0, dtype=dtype)
            M = LaplaceMassOperator(mesh, 4, 5, 1.0, 0.0, dtype=dtype)
            A, B, _, _ = get_fe_time_weights(
                TimeStepType.DG, 2, 1.0 / 16, n_at_once)
            m = SystemMatrix(K, M, A, B, precision=precision)
    finally:
        jax.default_backend = real_backend
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert (m._grid is not None) == (routing == "grid")
    assert (m._phig is not None) == (routing == "fullbasis")
    shape = (A.shape[0],) + mesh.dof_shape(4)
    return m, shape


def main():
    import jax
    import jax.numpy as jnp

    reps = int(os.environ.get("STFEM_PROBE_REPS", "10"))
    tpu = jax.devices()[0]
    out = {}
    for routing in ("grid", "fullbasis", "celllocal"):
        for dtype_name in ("f32", "f64"):
            key = f"{routing}_{dtype_name}"
            m, shape = build(routing, dtype_name, "highest")
            m = jax.device_put(m, tpu)
            x = jax.device_put(jnp.asarray(
                np.random.default_rng(0).standard_normal(shape),
                m.dtype), tpu)

            @jax.jit
            def loop(m_, v):
                def body(_, u):
                    return m_.vmult(u) / jnp.linalg.norm(u.reshape(-1))
                return jax.lax.fori_loop(0, reps, body, v)

            y = loop(m, x); _ = float(jnp.sum(y))
            t0 = time.time(); _ = float(jnp.sum(x)); rb = time.time() - t0
            t0 = time.time()
            y = loop(m, x); _ = float(jnp.sum(y))
            out[key] = round(1e3 * max(
                (time.time() - t0 - rb) / reps, 0.0), 3)
            print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    import jax
    jax.config.update("jax_enable_x64", True)
    main()
