"""Single-apply Pallas kernel for the float-float banded 1D contraction.

The fused 63-roll ff kron-pair kernel (pallas_ffresid.py) is blocked by
Mosaic's superlinear compile time in the roll-chain length (25 s for one
9-offset banded apply, 173 s for two, >10 min for the full chain --
scripts/mosaic_probe*.py).  This module stays UNDER that wall: ONE
9-roll banded apply per kernel, applied along the LANE (last) axis only;
XLA transposes bring the other axes to lanes (measured cheap: tensordot
chains run at ~0.8 ms at the 16^3 bench shape) and XLA chains the 8
applies of the kron pair.  Mosaic compiles the kernel once per distinct
shape (~25 s), not once per call site.

Why a kernel at all: the XLA elementwise ff form materializes every
shifted operand and ff temporary through HBM (~50 arrays per apply) and
measured 78-110 ms per slab against a ~10 ms VPU bound; here HBM sees
one read of the (hi, lo) pair and one write per apply, with the 9
rolls/compensated chains resident in VMEM.

Shape contract: cubic lane axis (all bench-family grids).  The banded
factors D[o, i] = A1[i, i+o-k] are zero off-range, so lane rolls with
wraparound are safe (wrapped entries meet a zero coefficient) --
pallas_ffresid.py:14-17 semantics.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.module import register_module
from .floatfloat import KronAssembledFF

__all__ = ["banded_ff_lane_apply", "KronPallas9"]


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


_SPLIT = np.float32(4097.0)


def _two_prod(a, b):
    p = a * b
    ca = _SPLIT * a
    ah = ca - (ca - a)
    al = a - ah
    cb = _SPLIT * b
    bh = cb - (cb - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _ff_add(a, b):
    s, e = _two_sum(a[0], b[0])
    return _quick_two_sum(s, e + (a[1] + b[1]))


def _ff_mul(a, b):
    p, e = _two_prod(a[0], b[0])
    return _quick_two_sum(p, e + (a[0] * b[1] + a[1] * b[0]))


def _kernel(k, n, xh_ref, xl_ref, dh_ref, dl_ref, yh_ref, yl_ref):
    h = xh_ref[0]
    l = xl_ref[0]
    out = None
    for o in range(2 * k + 1):
        # np.int32: under jax_enable_x64 a Python int weak-types to i64
        # and tpu.dynamic_rotate rejects it
        sh = np.int32((k - o) % n)
        rh = pltpu.roll(h, sh, axis=2)
        rl = pltpu.roll(l, sh, axis=2)
        co = (dh_ref[o], dl_ref[o])        # [1, n] lanes
        t = _ff_mul(co, (rh, rl))
        out = t if out is None else _ff_add(out, t)
    yh_ref[0], yl_ref[0] = out


def banded_ff_lane_apply(xh, xl, dh, dl, k: int, interpret: bool = False):
    """y = D x along the LAST axis, in ff.  xh/xl: [B, n, n, n] f32;
    dh/dl: [2k+1, n] banded diagonal factors (hi/lo).  Returns (yh, yl)."""
    B, n = xh.shape[0], xh.shape[-1]
    z = np.int32(0)
    cspec = pl.BlockSpec((2 * k + 1, 1, n), lambda b: (z, z, z),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, n, n, n), lambda b: (b, z, z, z),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, k, n),
        grid=(B,),
        interpret=interpret,
        in_specs=[bspec, bspec, cspec, cspec],
        out_specs=[bspec, bspec],
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(xh, xl, dh.reshape(2 * k + 1, 1, n), dl.reshape(2 * k + 1, 1, n))
    return out[0], out[1]


@register_module
class KronPallas9:
    """KronAssembledFF with the banded axis applies routed through the
    single-apply Pallas kernel on TPU (XLA fallback elsewhere and for
    non-cubic shapes).  interpret=True forces interpreter-mode kernels
    (parity tests)."""

    def __init__(self, kron64, interpret: bool = False):
        self.base = KronAssembledFF(kron64)
        self.dim = self.base.dim
        self.k = self.base.k
        self.interpret = interpret
        nds = {int(self.base.Md[d][0].shape[1]) for d in range(self.dim)}
        self._cubic = self.dim == 3 and len(nds) == 1

    def _apply(self, Dff, aff, axis: int):
        hi, lo = aff
        ndim = hi.ndim
        if axis != ndim - 1:
            hi = jnp.moveaxis(hi, axis, -1)
            lo = jnp.moveaxis(lo, axis, -1)
        B = int(np.prod(hi.shape[:-3])) if hi.ndim > 3 else 1
        yh, yl = banded_ff_lane_apply(
            hi.reshape((B,) + hi.shape[-3:]), lo.reshape((B,) + lo.shape[-3:]),
            Dff[0], Dff[1], self.k, interpret=self.interpret)
        yh = yh.reshape(hi.shape)
        yl = yl.reshape(lo.shape)
        if axis != ndim - 1:
            yh = jnp.moveaxis(yh, -1, axis)
            yl = jnp.moveaxis(yl, -1, axis)
        return yh, yl

    def _pair_pallas(self, xff, need_K: bool, need_M: bool):
        from .floatfloat import ff_add
        dim, k = self.dim, self.k
        base = self.base
        lead = xff[0].ndim - dim
        val = xff
        ks = None
        for d in range(dim):
            ax = lead + d
            if need_K:
                a_term = self._apply(base.Ad[d], val, ax)
                ks = (a_term if ks is None
                      else ff_add(self._apply(base.Md[d], ks, ax), a_term))
            if need_M or (need_K and d < dim - 1):
                val = self._apply(base.Md[d], val, ax)
        return (ks if need_K else None), (val if need_M else None)

    def pair(self, xff, need_K: bool = True, need_M: bool = True):
        if not (self._cubic and xff[0].ndim >= self.dim):
            return self.base._pair_xla(xff, need_K, need_M)
        if self.interpret:
            return self._pair_pallas(xff, need_K, need_M)

        def _tpu(ops):
            K, M = self._pair_pallas(ops, need_K, need_M)
            return tuple(x for r in (K, M) if r is not None for x in r)

        def _default(ops):
            K, M = self.base._pair_xla(ops, need_K, need_M)
            return tuple(x for r in (K, M) if r is not None for x in r)

        flat = jax.lax.platform_dependent(xff, tpu=_tpu, default=_default)
        it = iter(flat)
        K = (next(it), next(it)) if need_K else None
        M = (next(it), next(it)) if need_M else None
        return K, M
