"""Microbenchmark: fused Pallas kron-pair chain vs the XLA kron matvec.

The level matvec's Kronecker pair (Kx, Mx) costs 8 axis matmuls; XLA's
tensordot+moveaxis implementation measures ~5.9 ms at 16^3 Q4 bf16 against
a ~1.3 ms HBM roofline (read x once, write Kx+Mx once + small factors).
This lab tests a per-block-chunk Pallas kernel that keeps the whole chain
in VMEM:

  per step d (original axis d leading):  ks = M_d @ ks + A_d @ val;
  val = M_d @ val;  then cyclic-rotate both (axis d+1 to the front) --
  every matmul is the Mosaic-lowerable (m,k) x (k, N) form, and after dim
  steps the layout is back to the original.

Variants: A = XLA pair (reference), B = Pallas chunk kernel (LAB_B blocks
per program), varying LAB_B.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = int(os.environ.get("LAB_NB", "96"))
    nc = int(os.environ.get("LAB_CELLS", "16"))
    k = 4
    nd = nc * k + 1                       # 65
    dt = jnp.bfloat16 if os.environ.get("LAB_BF16", "1") == "1" \
        else jnp.float32
    reps = int(os.environ.get("LAB_REPS", "30"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((nb, nd, nd, nd)), dt)
    M1 = [jnp.asarray(rng.standard_normal((nd, nd)) * 0.1, dt)
          for _ in range(3)]
    A1 = [jnp.asarray(rng.standard_normal((nd, nd)) * 0.1, dt)
          for _ in range(3)]
    tpu = jax.devices()[0]
    x, M1, A1 = jax.device_put((x, M1, A1), tpu)

    def ax_td(M, v, axis):
        return jnp.moveaxis(jnp.tensordot(M, v, axes=(1, axis)), 0, axis)

    def pair_xla(v):
        val = v
        ks = None
        for d in range(3):
            ax = 1 + d
            ks = (ax_td(A1[d], val, ax) if ks is None
                  else ax_td(M1[d], ks, ax) + ax_td(A1[d], val, ax))
            val = ax_td(M1[d], val, ax)
        return ks, val

    # Pallas: per program, B blocks; chain with leading-axis matmuls +
    # cyclic rotations (transpose in VMEM)
    def kernel(b_static, m0, m1, m2, a0, a1, a2, x_ref, k_ref, v_ref):
        B = b_static
        Ms = (m0, m1, m2)
        As = (a0, a1, a2)
        for b in range(B):
            val = x_ref[b]                          # (nd, nd, nd)
            ks = None
            for d in range(3):
                f = val.reshape(nd, nd * nd)
                av = jnp.dot(As[d][...], f,
                             preferred_element_type=jnp.float32)
                if ks is None:
                    ksf = av
                else:
                    ksf = jnp.dot(Ms[d][...], ks.reshape(nd, nd * nd),
                                  preferred_element_type=jnp.float32) + av
                vf = jnp.dot(Ms[d][...], f,
                             preferred_element_type=jnp.float32)
                # cyclic rotate: move the (contracted, axis-d) leading axis
                # to the back so axis d+1 leads next step
                ks = jnp.transpose(ksf.reshape(nd, nd, nd).astype(dt),
                                   (1, 2, 0))
                val = jnp.transpose(vf.reshape(nd, nd, nd).astype(dt),
                                    (1, 2, 0))
            k_ref[b] = ks
            v_ref[b] = val

    def pair_pallas(v, B):
        grid = (nb // B,)
        fac_specs = [pl.BlockSpec((nd, nd), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 6
        out = pl.pallas_call(
            partial(kernel, B),
            grid=grid,
            in_specs=fac_specs + [
                pl.BlockSpec((B, nd, nd, nd), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((B, nd, nd, nd), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((nb, nd, nd, nd), dt)] * 2,
        )(M1[0], M1[1], M1[2], A1[0], A1[1], A1[2], v)
        return out

    @partial(jax.jit, static_argnums=(0, 1))
    def loop(key, B, v):
        def body(_, u):
            if key == "xla":
                ks, val = pair_xla(u)
            else:
                ks, val = pair_pallas(u, B)
            y = ks + 0.5 * val
            return (y / jnp.maximum(jnp.max(jnp.abs(y)).astype(y.dtype),
                                    1)).astype(dt)
        return jax.lax.fori_loop(0, reps, body, v)

    out = {"nb": nb, "nd": nd}
    ref = None
    for key, B in [("xla", 0), ("pallas", 2), ("pallas", 4), ("pallas", 8)]:
        name = key if key == "xla" else f"{key}_B{B}"
        try:
            if key == "xla":
                y1 = jax.jit(lambda v: pair_xla(v))(x)
            else:
                y1 = jax.jit(lambda v, B=B: pair_pallas(v, B))(x)
            _ = [float(jnp.sum(t.astype(jnp.float32))) for t in y1]
            y = loop(key, B, x)
            _ = float(jnp.sum(y.astype(jnp.float32)))
        except Exception as e:
            out[name + "_err"] = str(e)[:160]
            continue
        if key == "xla":
            ref = y1
        else:
            diff = max(
                float(jnp.max(jnp.abs((a - b).astype(jnp.float32)))
                      / (jnp.max(jnp.abs(b.astype(jnp.float32))) + 1e-30))
                for a, b in zip(y1, ref))
            out[name + "_maxdiff"] = round(diff, 6)
        t0 = time.time()
        _ = float(jnp.sum(x.astype(jnp.float32)))
        rb = time.time() - t0
        t0 = time.time()
        y = loop(key, B, x)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        out[name + "_ms"] = round(
            1e3 * max((time.time() - t0 - rb) / reps, 0.0), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
