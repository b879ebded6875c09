"""Raw per-op bandwidth/latency probe at the bench vector size.

The FGMRES glue measures ~15-20 ms/iter in isolation (fgmres_glue_lab) and
is nearly INDEPENDENT of the basis length -- i.e. not bound by basis HBM
traffic.  This probe measures what one elementwise op / one reduction / one
skinny matmul actually costs on a 105 MB f32 vector through this backend,
to separate "HBM bandwidth" from "per-op overhead" in the glue model.

Chains k ops inside one jitted fori_loop (no dispatch between ops) and
reports ms/op for: axpy (2 reads 1 write), scale (1r1w), full reduction,
skinny matmul (m, n) @ n, and dynamic row update of an (m, n) carry.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("LAB_N", str(96 * 65 ** 3)))
    m = int(os.environ.get("LAB_M", "24"))
    reps = int(os.environ.get("LAB_REPS", "50"))
    dt = jnp.float32
    rng = np.random.default_rng(0)
    tpu = jax.devices()[0]
    x = jax.device_put(jnp.asarray(rng.standard_normal(n), dt), tpu)
    y = jax.device_put(jnp.asarray(rng.standard_normal(n), dt), tpu)
    V = jax.device_put(jnp.asarray(rng.standard_normal((m, n)) / n, dt), tpu)

    out = {"n": n, "m": m, "reps": reps,
           "vec_mb": round(n * 4 / 1e6, 1)}

    def timed(key, fn, *args):
        r = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        t0 = time.time()
        _ = float(jnp.sum(x))
        rb = time.time() - t0
        t0 = time.time()
        r = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        ms = 1e3 * max(time.time() - t0 - rb, 0.0) / reps
        out[key + "_ms"] = round(ms, 3)

    @jax.jit
    def axpy_chain(x_, y_):
        def body(i, v):
            return y_ + 0.5 * v
        return jax.lax.fori_loop(0, reps, body, x_)

    @jax.jit
    def scale_chain(x_):
        def body(i, v):
            return v * 1.0000001
        return jax.lax.fori_loop(0, reps, body, x_)

    @jax.jit
    def reduce_chain(x_):
        def body(i, s):
            return s + jnp.linalg.norm(x_ + s)
        return jax.lax.fori_loop(0, reps, body, jnp.asarray(0.0, dt))

    @jax.jit
    def dots_chain(x_, V_):
        def body(i, v):
            with jax.default_matmul_precision("highest"):
                h = V_ @ v
                return v - V_.T @ h
        return jax.lax.fori_loop(0, reps, body, x_)

    @jax.jit
    def dus_chain(V_, x_):
        def body(i, Vc):
            return jax.lax.dynamic_update_slice_in_dim(
                Vc, x_[None], i % m, 0)
        return jax.lax.fori_loop(0, reps, body, V_)

    timed("axpy", axpy_chain, x, y)
    timed("scale", scale_chain, x)
    timed("reduce", reduce_chain, x)
    timed("gs_pass", dots_chain, x, V)        # dots + proj = 2 skinny matmuls
    timed("dus_row", dus_chain, V, x)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
