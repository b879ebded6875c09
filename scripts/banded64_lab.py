"""Measure on-TPU: dense vs banded (shifted-diagonal) 1D-factor apply in
emulated f64 for the Kronecker matvec used by the IR residual (bench.py).

The 1D assembled factors have bandwidth 2k+1 (9 at Q4); a dense 65-length
contraction in software double-double pays ~7x more VPU ops than 9
shifted elementwise FMAs.  Validates exactness and times both at the
16^3 m_step shape (nt=3 blocks).

Usage: python scripts/banded64_lab.py   (axon TPU)
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

    k = 4
    nc = 16
    nd = nc * k + 1            # 65
    dim = 3
    nt = 3
    rng = np.random.default_rng(0)

    # banded SPD-ish 1D factors like the assembled mass/stiffness
    def banded_mat():
        A = np.zeros((nd, nd))
        for c in range(nc):
            E = rng.standard_normal((k + 1, k + 1))
            A[c * k:c * k + k + 1, c * k:c * k + k + 1] += E @ E.T
        return A

    M1 = [banded_mat() for _ in range(dim)]
    A1 = [banded_mat() for _ in range(dim)]
    x = rng.standard_normal((nt, nd, nd, nd))

    def to_diags(A):
        """(2k+1, nd): diag o stores A[i, i+o-k] (zero out of range)."""
        D = np.zeros((2 * k + 1, nd))
        for o in range(-k, k + 1):
            for i in range(nd):
                j = i + o
                if 0 <= j < nd:
                    D[o + k, i] = A[i, j]
        return D

    Md = [to_diags(m) for m in M1]
    Ad = [to_diags(a) for a in A1]

    def axis_apply_dense(M, v, axis):
        return jnp.moveaxis(jnp.tensordot(M, v, axes=(1, axis)), 0, axis)

    def axis_apply_banded(D, v, axis):
        """y_i = sum_o D[o, i] * v_{i+o-k} along `axis` (static slices)."""
        pad = [(0, 0)] * v.ndim
        pad[axis] = (k, k)
        vp = jnp.pad(v, pad)
        out = None
        dshape = [1] * v.ndim
        dshape[axis] = nd
        for o in range(2 * k + 1):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(o, o + nd)
            term = D[o].reshape(dshape) * vp[tuple(sl)]
            out = term if out is None else out + term
        return out

    def kron_pair_dense(v):
        ks = None
        val = v
        for d in range(dim):
            ax = 1 + d
            Mj = jnp.asarray(M1[d])
            Aj = jnp.asarray(A1[d])
            ks = (axis_apply_dense(Aj, val, ax) if ks is None
                  else axis_apply_dense(Mj, ks, ax)
                  + axis_apply_dense(Aj, val, ax))
            val = axis_apply_dense(Mj, val, ax)
        return ks + val

    def kron_pair_banded(v):
        ks = None
        val = v
        for d in range(dim):
            ax = 1 + d
            Mj = jnp.asarray(Md[d])
            Aj = jnp.asarray(Ad[d])
            ks = (axis_apply_banded(Aj, val, ax) if ks is None
                  else axis_apply_banded(Mj, ks, ax)
                  + axis_apply_banded(Aj, val, ax))
            val = axis_apply_banded(Mj, val, ax)
        return ks + val

    xj = jnp.asarray(x)
    fd = jax.jit(kron_pair_dense)
    fb = jax.jit(kron_pair_banded)
    yd = np.asarray(fd(xj))
    yb = np.asarray(fb(xj))
    rel = np.abs(yd - yb).max() / np.abs(yd).max()
    print(f"banded vs dense rel err {rel:.3e}")

    def timeit(name, f, n=10):
        _ = float(jnp.sum(f(xj)))
        t0 = time.time()
        for _i in range(n):
            out = f(xj)
        _ = float(jnp.sum(out))
        print(f"{name:22s} {(time.time() - t0) / n * 1e3:8.2f} ms")

    # simulate the 32-step scan cost: apply to (nt, nd^3) 32 times
    def scan32(f):
        def g(v):
            def body(c, _):
                return f(c) * 0 + c, None
            # just 32 sequential applies
            out = v
            for _ in range(32):
                out = f(out)
            return out
        return g

    timeit("dense f64 pair", fd)
    timeit("banded f64 pair", fb)
    timeit("dense f64 x32", jax.jit(scan32(kron_pair_dense)), n=2)
    timeit("banded f64 x32", jax.jit(scan32(kron_pair_banded)), n=2)


if __name__ == "__main__":
    main()
