"""Microbenchmark: outer-FGMRES per-iteration components at bench shapes.

The full-iteration cost (fgmres_noprec_per_iter) bundles the f32-highest
outer matvec, two chunked Gram-Schmidt passes, the Givens/norm scalar work,
and the basis writes.  This lab times them separately on the TPU:

  matvec_f32   SystemMatrix.vmult at outer precision (highest)
  gs_pass      one chunked CGS pass (h + projection) at a fixed prefix
  gs_iter      the two-pass GS + norm + basis write (no A, no P)
  axpy         one basis-sized read-modify-write (HBM roofline anchor)

Env: LAB_CELLS (16), LAB_NTAO (32), LAB_J (active prefix row, default 5),
LAB_CH (chunk, default 8), LAB_REPS (30).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells = int(os.environ.get("LAB_CELLS", "16"))
    ntao = int(os.environ.get("LAB_NTAO", "32"))
    J = int(os.environ.get("LAB_J", "5"))
    CH = int(os.environ.get("LAB_CH", "8"))
    reps = int(os.environ.get("LAB_REPS", "30"))
    m = 24
    k, r = 4, 2
    refinement = int(np.log2(cells // 2))
    tau = 1.0 / 16

    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    K = LaplaceMassOperator(mesh, k, k + 1, 0.0, 1.0, dtype=jnp.float32)
    M = LaplaceMassOperator(mesh, k, k + 1, 1.0, 0.0, dtype=jnp.float32)
    A_, B_, _, _ = get_fe_time_weights(TimeStepType.DG, r, tau, ntao)
    mat = SystemMatrix(K, M, A_, B_, precision="highest")
    nb = A_.shape[0]
    shape = (nb,) + tuple(K.dof_shape)
    n = int(np.prod(shape))

    rng = np.random.default_rng(0)
    tpu = jax.devices()[0]
    x = jax.device_put(jnp.asarray(
        rng.standard_normal(shape), jnp.float32), tpu)
    m_pad = ((m + 1 + CH - 1) // CH) * CH
    V = jax.device_put(jnp.asarray(
        rng.standard_normal((m_pad, n)), jnp.float32), tpu)
    w0 = jax.device_put(jnp.asarray(
        rng.standard_normal((n,)), jnp.float32), tpu)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        y = f(*args)
        _ = float(jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(y)[0],
                                      jnp.float32).ravel()[:1]))
        t0 = time.time()
        _ = float(jnp.sum(x.ravel()[:1]))
        rb = time.time() - t0
        t0 = time.time()
        y = f(*args)
        _ = float(jnp.sum(jnp.asarray(jax.tree_util.tree_leaves(y)[0],
                                      jnp.float32).ravel()[:1]))
        dt = (time.time() - t0 - rb)
        out[name] = round(1e3 * max(dt, 0.0), 3)

    out = {"cells": cells, "ntao": ntao, "J": J, "CH": CH,
           "n": n, "vec_mb": round(4 * n / 2 ** 20, 1)}

    def matvec_loop(v):
        def body(_, u):
            y = mat.vmult(u)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
        return jax.lax.fori_loop(0, reps, body, v)

    n_active = J // CH + 1
    dtype = jnp.float32

    def gs_pass(V_, w):
        def hc_body(c, h):
            blk = jax.lax.dynamic_slice_in_dim(V_, c * CH, CH, 0)
            return jax.lax.dynamic_update_slice_in_dim(
                h, blk @ w, c * CH, 0)
        h = jax.lax.fori_loop(0, n_active, hc_body,
                              jnp.zeros(V_.shape[0], dtype))

        def proj_body(c, wv):
            blk = jax.lax.dynamic_slice_in_dim(V_, c * CH, CH, 0)
            hc = jax.lax.dynamic_slice_in_dim(h, c * CH, CH, 0)
            return wv - blk.T @ hc
        w = jax.lax.fori_loop(0, n_active, proj_body, w)
        return h, w

    def gs_pass_loop(V_, w):
        def body(_, u):
            with jax.default_matmul_precision("highest"):
                _, u = gs_pass(V_, u)
            return u / jnp.maximum(jnp.linalg.norm(u), 1.0)
        return jax.lax.fori_loop(0, reps, body, w)

    def gs_iter_loop(V_, w):
        def body(_, carry):
            V_c, u = carry
            with jax.default_matmul_precision("highest"):
                h1, u = gs_pass(V_c, u)
                h2, u = gs_pass(V_c, u)
            wn = jnp.linalg.norm(u)
            V_c = V_c.at[J + 1].set(u / jnp.maximum(wn, 1.0))
            return V_c, u / jnp.maximum(wn, 1.0)
        return jax.lax.fori_loop(0, reps, body, (V_, w))

    def axpy_loop(w):
        def body(_, u):
            return 0.5 * u + w0
        return jax.lax.fori_loop(0, reps, body, w)

    timed("matvec_f32_ms", matvec_loop, x)
    timed("gs_pass_ms", gs_pass_loop, V, w0)
    timed("gs_iter_ms", gs_iter_loop, V, w0)
    timed("axpy_ms", axpy_loop, w0)
    for name in ("matvec_f32_ms", "gs_pass_ms", "gs_iter_ms", "axpy_ms"):
        out[name] = round(out[name] / reps, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
