"""Pallas TPU kernel for the float-float Kronecker pair (K x, M x).

The IR residual's dominant cost is kron.pair in double-single arithmetic:
~2200 native f32 flops per dof element (7 banded per-axis applies x 9
offsets x ~35-flop ff mul/add chains).  The XLA form materializes every
shifted operand and ff temporary through HBM and, scanned over the slab's
32 steps, measured 78 ms at the 16^3 bench shape against a ~10 ms VPU flop
bound; batching the steps in XLA made it WORSE (216 ms -- bigger
materialized temps).  This kernel keeps one block's whole dof grid plus
all ff streams resident in VMEM: HBM sees one read of x and one write of
(K x, M x) per block, the rolls/multiplies all happen on-chip.

Shape contract (the bench/minibench family): dim=3, equal per-axis dof
extents nd = cells*k+1 (cubic grids).  The banded 1D factors D[o, i] =
A1[i, i+o-k] are zero off-range, so lane ROLLS with wraparound are safe --
wrapped entries always meet a zero coefficient.

Batched over leading dims via the grid: x [B, n, n, n] -> 4 outputs
[B, n, n, n] (K hi/lo, M hi/lo).  Used by KronAssembledFF.pair on TPU via
jax.lax.platform_dependent (CPU keeps the XLA form, which is also the
parity oracle)."""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supports", "kron_pair_ff_pallas"]


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


def _kernel(k, n, xh_ref, xl_ref, dmh_ref, dml_ref, dah_ref, dal_ref,
            kh_ref, kl_ref, mh_ref, ml_ref):
    """One block's dof grid: x [n, n, n] ff -> (K x, M x) ff.

    dmh/dml/dah/dal: [3, 2k+1, 1, n] per-axis banded factors (hi/lo).
    All three axes are applied as LANE-axis banded rolls; axes 0/1 are
    brought to lanes by in-VMEM transposes (supported per mosaic probe)."""
    fwd = {0: (1, 2, 0), 1: (0, 2, 1), 2: None}
    inv = {0: (2, 0, 1), 1: (0, 2, 1), 2: None}

    def banded(dh_ref, dl_ref, d, v):
        h, l = v
        if fwd[d] is not None:
            h = jnp.transpose(h, fwd[d])
            l = jnp.transpose(l, fwd[d])
        oh = None
        for o in range(2 * k + 1):
            # np.int32: under jax_enable_x64 a Python int weak-types to
            # i64 and tpu.dynamic_rotate rejects it
            sh = np.int32((k - o) % n)
            rh = pltpu.roll(h, sh, axis=2)
            rl = pltpu.roll(l, sh, axis=2)
            co = (dh_ref[d, o], dl_ref[d, o])      # [1, n] lanes
            t = _ff_mul(co, (rh, rl))
            oh = t if oh is None else _ff_add(oh, t)
        h, l = oh
        if inv[d] is not None:
            h = jnp.transpose(h, inv[d])
            l = jnp.transpose(l, inv[d])
        return h, l

    val = (xh_ref[0], xl_ref[0])
    ks = None
    for d in range(3):
        a_term = banded(dah_ref, dal_ref, d, val)
        if ks is None:
            ks = a_term
        else:
            ks = _ff_add(banded(dmh_ref, dml_ref, d, ks), a_term)
        val = banded(dmh_ref, dml_ref, d, val)
    kh_ref[0], kl_ref[0] = ks
    mh_ref[0], ml_ref[0] = val


def supports(dim: int, nds) -> bool:
    nds = list(nds)
    return dim == 3 and len(set(nds)) == 1


def kron_pair_ff_pallas(xh, xl, Dm_h, Dm_l, Da_h, Da_l, k: int,
                        interpret: bool = False):
    """xh/xl: [B, n, n, n] f32.  Dm_*/Da_*: [3, 2k+1, n] stacked per-axis
    banded factors.  Returns (Kh, Kl, Mh, Ml) each [B, n, n, n]."""
    B, n = xh.shape[0], xh.shape[-1]
    z = np.int32(0)
    coef_shape = (3, 2 * k + 1, 1, n)
    cspec = pl.BlockSpec(coef_shape, lambda b: (z, z, z, z),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, n, n, n), lambda b: (b, z, z, z),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, k, n),
        grid=(B,),
        interpret=interpret,
        in_specs=[bspec, bspec, cspec, cspec, cspec, cspec],
        out_specs=[bspec] * 4,
        out_shape=[jax.ShapeDtypeStruct(xh.shape, jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(xh, xl, Dm_h.reshape(coef_shape), Dm_l.reshape(coef_shape),
      Da_h.reshape(coef_shape), Da_l.reshape(coef_shape))
    return tuple(out)
