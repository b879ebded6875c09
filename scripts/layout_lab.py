"""Microbenchmark: block-axis-LAST layout for the per-axis contractions.

The level matvec / Vanka grid apply contract a (nd x nd)-ish factor against
one spatial axis of [nb, nd, nd, nd].  In that block-major layout the
minormost (lane) axis is nd=65 -- half the 128 lanes are padding, and the
tensordot lowering pays moveaxis copies on both sides (measured 8.9 ms at
16^3 for the Kron pair vs a ~1.3 ms roofline).

Hypothesis: with the BLOCK axis last ([nd, nd, nd, nb], nb=96 -> 128-lane
pad 33%, or 120 -> 6%) every axis contraction is a batched matmul whose
minor block is contiguous (B, or nd*B), the canonical efficient TPU
dot_general shape, with NO relayouts.

Measures per-axis contraction + the full Kron pair in both layouts.
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

    nb = int(os.environ.get("LAB_NB", "96"))
    nc = int(os.environ.get("LAB_CELLS", "16"))
    k = 4
    nd = nc * k + 1                       # 65
    dt = jnp.bfloat16 if os.environ.get("LAB_BF16", "1") == "1" \
        else jnp.float32
    reps = int(os.environ.get("LAB_REPS", "30"))

    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.standard_normal((nb, nd, nd, nd)), dt)
    x_bl = jnp.asarray(np.moveaxis(np.asarray(x_bf, np.float32), 0, -1), dt)
    M1 = [jnp.asarray(rng.standard_normal((nd, nd)) * 0.1, dt)
          for _ in range(3)]
    A1 = [jnp.asarray(rng.standard_normal((nd, nd)) * 0.1, dt)
          for _ in range(3)]
    tpu = jax.devices()[0]
    x_bf, x_bl, M1, A1 = jax.device_put((x_bf, x_bl, M1, A1), tpu)

    # --- block-first (current) ---
    def ax_td(M, v, axis):
        return jnp.moveaxis(jnp.tensordot(M, v, axes=(1, axis)), 0, axis)

    def pair_bf(v):
        val = v
        ks = None
        for d in range(3):
            ax = 1 + d
            ks = (ax_td(A1[d], val, ax) if ks is None
                  else ax_td(M1[d], ks, ax) + ax_td(A1[d], val, ax))
            val = ax_td(M1[d], val, ax)
        return ks, val

    # --- block-last: einsum forms (contracted axis o in place) ---
    def ax_bl(M, v, axis):
        sub = "xyz"[:3]
        src = sub[:axis] + "j" + sub[axis + 1:] + "b"
        out = sub[:axis] + "o" + sub[axis + 1:] + "b"
        return jnp.einsum(f"oj,{src}->{out}", M, v)

    def pair_bl(v):
        val = v
        ks = None
        for d in range(3):
            ks = (ax_bl(A1[d], val, d) if ks is None
                  else ax_bl(M1[d], ks, d) + ax_bl(A1[d], val, d))
            val = ax_bl(M1[d], val, d)
        return ks, val

    # --- block-last: explicit dot_general with batch dims ---
    def ax_bl_dg(M, v, axis):
        # v: [n0, n1, n2, b]; batch = leading axes before `axis`
        batch = tuple(range(axis))
        Mb = jnp.broadcast_to(M, tuple(v.shape[i] for i in batch) + M.shape)
        y = jax.lax.dot_general(
            Mb, v,
            dimension_numbers=(((len(batch) + 1,), (axis,)),
                               (batch, batch)))
        # result: [*batch, o, *rest] == already in place
        return y

    def pair_bl_dg(v):
        val = v
        ks = None
        for d in range(3):
            ks = (ax_bl_dg(A1[d], val, d) if ks is None
                  else ax_bl_dg(M1[d], ks, d) + ax_bl_dg(A1[d], val, d))
            val = ax_bl_dg(M1[d], val, d)
        return ks, val

    def run(name, fn, v, out, ref=None):
        try:
            f = jax.jit(fn)
            y1 = f(v)
            _ = [float(jnp.sum(t.astype(jnp.float32))) for t in y1]
        except Exception as e:
            out[name + "_err"] = str(e)[:200]
            return None

        @partial(jax.jit, static_argnums=())
        def loop(u):
            def body(_, u):
                ks, val = fn(u)
                y = ks + 0.5 * val
                return (y / jnp.maximum(
                    jnp.max(jnp.abs(y)).astype(y.dtype), 1)).astype(dt)
            return jax.lax.fori_loop(0, reps, body, u)

        y = loop(v)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        t0 = time.time()
        _ = float(jnp.sum(v.astype(jnp.float32)))
        rb = time.time() - t0
        t0 = time.time()
        y = loop(v)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        out[name + "_ms"] = round(
            1e3 * max((time.time() - t0 - rb) / reps, 0.0), 3)
        if ref is not None:
            diff = max(
                float(jnp.max(jnp.abs(
                    (jnp.moveaxis(a, -1, 0) - b).astype(jnp.float32)))
                    / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-30))
                for a, b in zip(y1, ref))
            out[name + "_maxdiff"] = round(diff, 6)
        return y1

    out = {"nb": nb, "nd": nd, "dtype": str(np.dtype(dt))}
    ref = run("bf_tensordot", pair_bf, x_bf, out)
    run("bl_einsum", pair_bl, x_bl, out, ref=ref)
    run("bl_dotgeneral", pair_bl_dg, x_bl, out, ref=ref)

    # single-axis timings, block-last einsum
    for d in range(3):
        run(f"bl_ax{d}", lambda v, d=d: (ax_bl(M1[d], v, d),
                                         ax_bl(M1[d], v, d)), x_bl, out)
        run(f"bf_ax{d}", lambda v, d=d: (ax_td(M1[d], v, 1 + d),
                                         ax_td(M1[d], v, 1 + d)), x_bf, out)
    # layout flip cost (there and back per rep)
    run("flip2", lambda v: (jnp.moveaxis(jnp.moveaxis(v, 0, -1), -1, 0),
                            v), x_bf, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
