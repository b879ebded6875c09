"""Microbenchmark: per-axis banded contraction-chain variants on TPU.

The grid sum-factorization path applies one (q_d x n_d) banded matmul per
axis to a (nb, n0, n1, n2) slab array.  This lab times layout strategies
for the full down+up chain (the Vanka apply skeleton) at bench shapes:

  A. tensordot+moveaxis per axis (current axis_apply default)
  B. cyclic: contract the LAST axis, rotate result axes (0,3,1,2); after
     dim steps the layout is restored -- no moveaxis-back copies
  C. cyclic-transposed: contract the last axis via x @ M.T, then rotate
  D. B but keeping the rotation implicit (contract axis dim, then dim-1,
     then dim-2 positions as they land) -- zero transposes, final layout
     differs; one final transpose at the end
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
    nd = nc * k + 1          # 65
    ne = nc * (k + 1)        # 80
    dt = jnp.bfloat16 if os.environ.get("LAB_BF16", "1") == "1" \
        else jnp.float32
    reps = int(os.environ.get("LAB_REPS", "30"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nb, nd, nd, nd)), dt)
    Wdn = [jnp.asarray(rng.standard_normal((ne, nd)) * 0.1, dt)
           for _ in range(3)]
    Wup = [jnp.asarray(rng.standard_normal((nd, ne)) * 0.1, dt)
           for _ in range(3)]
    tpu = jax.devices()[0]
    x, Wdn, Wup = jax.device_put((x, Wdn, Wup), tpu)

    def ax_td(M, v, axis):
        return jnp.moveaxis(jnp.tensordot(M, v, axes=(1, axis)), 0, axis)

    def chain_A(v):
        for d in range(3):
            v = ax_td(Wdn[d], v, 1 + d)
        v = v * 0.5
        for d in range(3):
            v = ax_td(Wup[d], v, 1 + d)
        return v

    def ax_last_rot(M, v):
        # contract v's last axis with M's second axis; result axis lands
        # LAST (x @ M.T with no input transpose), then rotate so the next
        # original axis becomes last: (nb, a, b, r) -> (nb, r, a, b)
        y = jax.lax.dot_general(v, M, (((v.ndim - 1,), (1,)), ((), ())))
        return jnp.transpose(y, (0, 3, 1, 2))

    def chain_B(v):
        # down: contract z, y, x (axes arrive at last position cyclically)
        for d in (2, 1, 0):
            v = ax_last_rot(Wdn[d], v)
        v = v * 0.5
        for d in (2, 1, 0):
            v = ax_last_rot(Wup[d], v)
        return v

    def chain_D(v):
        # contract last axis three times with rotation only in matrix
        # choice; no transposes at all; layout cycles by itself via
        # dot_general's result placement... dot_general keeps batch order,
        # so the result axis is last: repeated last-axis contraction hits
        # ORIGINAL axes 3, then (new) 3 = old 2 after an explicit swap.
        # Here: contract axis 3 (z), transpose (0,1,3,2)->swap y into last,
        # contract, swap x into last, contract, then restore.
        v = jax.lax.dot_general(v, Wdn[2], (((3,), (1,)), ((), ())))
        v = jnp.swapaxes(v, 2, 3)
        v = jax.lax.dot_general(v, Wdn[1], (((3,), (1,)), ((), ())))
        v = jnp.swapaxes(v, 1, 3)
        v = jax.lax.dot_general(v, Wdn[0], (((3,), (1,)), ((), ())))
        # layout now (nb, z', y', x'); elementwise middle
        v = v * 0.5
        v = jax.lax.dot_general(v, Wup[0], (((3,), (1,)), ((), ())))
        v = jnp.swapaxes(v, 1, 3)
        v = jax.lax.dot_general(v, Wup[1], (((3,), (1,)), ((), ())))
        v = jnp.swapaxes(v, 2, 3)
        v = jax.lax.dot_general(v, Wup[2], (((3,), (1,)), ((), ())))
        return v

    def chain_E(v):
        # 2D-reshaped explicit matmuls: collapse leading dims so every
        # contraction is a plain (rows, n) @ (n, q) matmul; swaps bring
        # each axis to the last position
        s = v.shape
        v = v.reshape(-1, s[-1]) @ Wdn[2].T
        v = v.reshape(nb, nd, nd, ne)
        v = jnp.swapaxes(v, 2, 3).reshape(-1, nd) @ Wdn[1].T
        v = v.reshape(nb, nd, ne, ne)
        v = jnp.swapaxes(v, 1, 3).reshape(-1, nd) @ Wdn[0].T
        v = v.reshape(nb, ne, ne, ne)
        v = v * 0.5
        v = v.reshape(-1, ne) @ Wup[0].T
        v = v.reshape(nb, ne, ne, nd)
        v = jnp.swapaxes(v, 1, 3).reshape(-1, ne) @ Wup[1].T
        v = v.reshape(nb, nd, ne, nd)
        v = jnp.swapaxes(v, 2, 3).reshape(-1, ne) @ Wup[2].T
        v = v.reshape(nb, nd, nd, nd)
        return v

    @partial(jax.jit, static_argnums=(0,))
    def loop(key, v):
        fn = {"A": chain_A, "B": chain_B, "D": chain_D, "E": chain_E}[key]

        def body(_, u):
            return fn(u) / jnp.maximum(
                jnp.max(jnp.abs(u)).astype(u.dtype), 1)
        return jax.lax.fori_loop(0, reps, body, v)

    out = {"nb": nb, "nc": nc, "dtype": str(np.dtype(dt))}
    for key in ("A", "B", "D", "E"):
        y = loop(key, x)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        t0 = time.time()
        _ = float(jnp.sum(x.astype(jnp.float32)))
        rb = time.time() - t0
        t0 = time.time()
        y = loop(key, x)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        out[f"chain_{key}_ms"] = round(
            1e3 * max((time.time() - t0 - rb) / reps, 0.0), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
