"""Bisect the grid-matvec perf gap: GridSumFac-in-SystemMatrix vs the lab fn.

Variants timed on-chip (8^3 ntao=32 by default):
  A  SystemMatrix grid path (production; _mix step-structured)
  B  GridSumFac.apply with DENSE einsum mixes (lab-style mixing)
  C  lab make_grid_matvec (folded 1/h, single W, dense mixes)
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
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType
    from scripts.gridsumfac_lab import make_grid_matvec

    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "8"))
    n_at_once = int(os.environ.get("STFEM_BENCH_NTAO", "32"))
    reps = int(os.environ.get("STFEM_PROBE_REPS", "20"))
    dtype = jnp.float32
    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, 4, 5, 0.0, 1.0, dtype=dtype)
        M = LaplaceMassOperator(mesh, 4, 5, 1.0, 0.0, dtype=dtype)
        A, B, _, _ = get_fe_time_weights(TimeStepType.DG, 2, 1.0 / 16,
                                         n_at_once)
        m = SystemMatrix(K, M, A, B, precision=None)
        assert m._grid is not None
        lab_fn = make_grid_matvec(K, M, A, B, dtype)
        A_dense = jnp.asarray(np.asarray(A), dtype)
        B_dense = jnp.asarray(np.asarray(B), dtype)

    shape = (A.shape[0],) + tuple(K.dof_shape)
    m = jax.device_put(m, tpu)
    A_dense = jax.device_put(A_dense, tpu)
    B_dense = jax.device_put(B_dense, tpu)
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), dtype), tpu)

    def variant_A(m_, Ad, Bd, v):
        return m_.vmult(v)

    def variant_B(m_, Ad, Bd, v):
        mix_a = lambda t: jnp.einsum("ji,i...->j...", Ad, t)
        mix_b = lambda t: jnp.einsum("ji,i...->j...", Bd, t)
        v = v * m_.K.mask
        return m_._grid.apply(v, mix_a, mix_b, False, False) * m_.K.mask

    # lab fn: lift closure arrays to device args (same trick as the lab)
    cells = list(lab_fn.__closure__ or ())
    specs, leaves = [], []
    for i, cell in enumerate(cells):
        vv = cell.cell_contents
        if isinstance(vv, jnp.ndarray):
            specs.append(i); leaves.append(vv)
        elif isinstance(vv, list) and vv and isinstance(vv[0], jnp.ndarray):
            specs.append(i); leaves.append(list(vv))
    lab_params = jax.device_put(leaves, tpu)

    def variant_C(params, v):
        for i, val in zip(specs, params):
            cells[i].cell_contents = val
        return lab_fn(v)

    out = {}
    for name, fn, args in [("A_system_grid", variant_A, (m, A_dense, B_dense)),
                           ("B_grid_densemix", variant_B,
                            (m, A_dense, B_dense)),
                           ("C_lab_fn", variant_C, (lab_params,))]:
        @jax.jit
        def loop(v, *a):
            def body(_, u):
                return fn(*a, u) / jnp.linalg.norm(u.reshape(-1))
            return jax.lax.fori_loop(0, reps, body, v)

        y = loop(x, *args); _ = float(jnp.sum(y))
        t0 = time.time(); _ = float(jnp.sum(x)); rb = time.time() - t0
        t0 = time.time()
        y = loop(x, *args); _ = float(jnp.sum(y))
        out[name] = round(1e3 * max((time.time() - t0 - rb) / reps, 0.0), 3)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
