"""Isolate the FGMRES per-iteration glue cost (everything except A and P).

perf_decompose measures ~26 ms/iter with NO preconditioner at 16^3 where
the A apply is 5.9 ms and the Gram-Schmidt bandwidth bound is ~3-8 ms --
and the same ~26-28 ms shows at 8^3, pointing at size-independent or
buffer-copy overhead (V/Z carry copies in the while_loop?).

Variants on a cheap A (diagonal scale, ~0.5 ms): flexible on/off,
reorthogonalize on/off, maxiter 10/24.  If per-iter cost scales with
maxiter (buffer size) the carried-basis updates are copying.
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

    from stfem_tpu.krylov import fgmres

    n = int(os.environ.get("LAB_N", str(96 * 65 ** 3)))
    dt = jnp.float32
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n), dt)
    d = jnp.asarray(1.0 + rng.random(n), dt)
    tpu = jax.devices()[0]
    b, d = jax.device_put((b, d), tpu)

    def A(x):
        return d * x

    out = {"n": n}
    for flex in (True, False):
        for reorth in (True, False):
            for mi in (10, 24):
                key = f"fl{int(flex)}_re{int(reorth)}_m{mi}"

                @jax.jit
                def run(b_):
                    r = fgmres(A, b_, jnp.zeros_like(b_), maxiter=mi,
                               abstol=0.0, reltol=0.0,
                               reorthogonalize=reorth, flexible=flex)
                    return r.x

                y = run(b)
                _ = float(jnp.sum(y))
                t0 = time.time()
                _ = float(jnp.sum(b))
                rb = time.time() - t0
                t0 = time.time()
                y = run(b)
                _ = float(jnp.sum(y))
                ms = 1e3 * max(time.time() - t0 - rb, 0.0)
                out[key + "_per_iter_ms"] = round(ms / mi, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
