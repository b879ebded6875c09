"""MXU-exact float-float Kronecker pair: banded 1D applies as SLICED
bf16 matmuls (Ozaki-style error-free splitting).

The IR residual's dominant cost is (K x, M x) in double-single arithmetic
(ops/floatfloat.py): the VPU roll-chain form measured 78 ms/slab at the
16^3 bench shape against a ~10 ms flop bound, and the fused Mosaic kernel
is compile-blocked (scripts/mosaic_probe*.py).  This module instead runs
the per-axis banded contraction on the MXU at high precision:

* Each ff operand is split into `ns` bf16 slices holding 8 mantissa bits
  each: x = s * sum_i S_i * 2^-8(i+1) with S_i INTEGER-valued in
  [-256, 256] (exactly representable in bf16).  The slicing scale s is a
  power of two >= max|x| -- dynamic (from a traced max) for the input,
  propagated through row-sum-norm bounds for intermediate stages, so the
  slices can never saturate.  The banded 1D factor matrices are sliced
  the same way in f64 at setup.
* A slice-pair product S_i @ D_j then accumulates EXACTLY in the MXU's
  f32 accumulator: products are integers <= 2^16 and the contraction adds
  <= n of them (n = 65 at bench shape), staying far below 2^24.
* Pass outputs of equal scale i+j = g are grouped (f32 adds of integers
  <= (g+1) * 2^22: exact through g = 2, <= 2^-46-relative rounding
  beyond) and the <= smax+1 group sums are combined in ff.
* Pairs with i + j > smax are dropped: truncation ~ 2^-8(smax+1) relative
  to the slicing scale -- smax=5 keeps ~2^-45 even with the few bits of
  row-sum-bound slack, far below the ~2^-33 the true-1e-8 iterative
  refinement needs.

Everything is plain XLA (elementwise splits + dot_general): no Mosaic
kernels, no compile-time blowup, and the matmuls ride the MXU instead of
the VPU.  Reference semantics anchor: the residual this feeds is the f64
outer residual of time_integrators.h:56-59 / stmg.h:1331-1344.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.module import register_module
from .floatfloat import _two_sum as two_sum, ff_add

__all__ = ["KronMXU", "slice_ff", "slice_f64_host", "mxu_axis_apply"]

def _rint(t):
    # a REAL round op, not the (t + 1.5*2^23) - 1.5*2^23 trick: XLA's
    # algebraic simplifier folds (t + c) - c back to t under jit, which
    # silently destroys the integer-slice exactness (measured: jit diff
    # 1.5e-2 vs eager 1e-13)
    return jnp.round(t)


def _pow2ceil(m):
    """Smallest power of two >= m (traced; exact: exp2 of an integer)."""
    return jnp.where(m > 0.0, jnp.exp2(jnp.ceil(jnp.log2(
        jnp.maximum(m, np.float32(1e-38))))), np.float32(1.0)
    ).astype(jnp.float32)


def slice_f64_host(D: np.ndarray, ns: int):
    """Split a f64 matrix into ns integer-valued slices (host, exact).

    Returns (scale, rowsum_bound, [S_0..S_{ns-1}]) with D ~= scale *
    sum_i S_i * 2^-8(i+1), each S_i integer in [-256, 256], and
    rowsum_bound a power of two >= the inf-norm ||D||_inf (so
    ||D x||_max <= rowsum_bound * ||x||_max)."""
    m = float(np.max(np.abs(D)))
    assert m > 0.0
    scale = float(2.0 ** np.ceil(np.log2(m)))
    bound = float(np.max(np.sum(np.abs(D), axis=1)))
    bound = float(2.0 ** np.ceil(np.log2(bound)))
    r = np.asarray(D, np.float64) / scale
    slices = []
    for i in range(ns):
        k = 2.0 ** (8 * (i + 1))
        q = np.rint(r * k)
        slices.append(q)
        r = r - q / k
    return scale, bound, slices


def slice_ff(xh, xl, ns: int, inv_scale):
    """Split an ff pair into ns integer-valued f32 slice arrays (traced).

    inv_scale: reciprocal of a power-of-two scale >= max|x| (exact
    multiply; scalar, may be traced).  Returns [S_0..S_{ns-1}] with
    (xh+xl) * inv_scale ~= sum S_i 2^-8(i+1), S_i integer in [-256, 256]
    (bf16-exact)."""
    r_h = xh * inv_scale
    r_l = xl * inv_scale
    out = []
    for i in range(ns):
        k = np.float32(2.0 ** (8 * (i + 1)))
        ik = np.float32(2.0 ** (-8 * (i + 1)))
        q = _rint(r_h * k)
        out.append(q)
        r_h = r_h - q * ik          # exact (grid-extraction split)
        r_h, r_l = two_sum(r_h, r_l)  # drain lo bits into hi as hi empties
    return out


def mxu_axis_apply(x_slices, d_slices, axis: int, smax: int, scale):
    """y ~= D x along `axis` in ff from pre-sliced operands.

    x_slices: list of f32 integer-slice arrays [..., n, ...]
    d_slices: list of bf16 integer-slice matrices [n, n] (D[i, j]; the
        apply contracts x's axis with D's second index)
    scale: s_x * s_D (scalar; may be traced -- powers of two, so the
        final multiplies are exact).
    Returns (hi, lo) f32 ff pair."""
    ndim = x_slices[0].ndim
    # move the contraction axis last once; move back at the end
    perm = [a for a in range(ndim) if a != axis] + [axis]
    inv = np.argsort(perm)
    xs = [jnp.transpose(s, perm).astype(jnp.bfloat16) for s in x_slices]
    groups = {}
    for i in range(len(xs)):
        for j in range(len(d_slices)):
            g = i + j
            if g > smax:
                continue
            # [..., n] @ [n, n]^T contraction over D's second index
            y = jax.lax.dot_general(
                xs[i], d_slices[j],
                dimension_numbers=(((ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            groups[g] = y if g not in groups else groups[g] + y
    # ff-combine group sums smallest-scale first
    hi = jnp.zeros_like(groups[0])
    lo = jnp.zeros_like(groups[0])
    for g in sorted(groups.keys(), reverse=True):
        c = jnp.asarray(scale, jnp.float32) * np.float32(
            2.0 ** (-8 * (g + 2)))
        hi, lo = ff_add((hi, lo), (groups[g] * c, jnp.zeros_like(hi)))
    return (jnp.transpose(hi, inv), jnp.transpose(lo, inv))


@register_module
class KronMXU:
    """MXU twin of KronAssembledFF: (K x, M x) in ff via sliced matmuls.

    Built from an f64 KronAssembled (exact 1D assemblies M1/A1).  The
    input slicing scale is computed per call from max|x_hi| (a cheap
    reduction); intermediate stage scales are propagated through the
    factors' power-of-two row-sum bounds, so slices never saturate.
    ns/smax: slice count and pass cutoff."""

    def __init__(self, kron64, ns: int = 6, smax: int = 5):
        self.dim = kron64.dim
        self.k = kron64.k
        self.ns = int(ns)
        self.smax = int(smax)
        self.Ms, self.As = [], []
        self.sM, self.sA = [], []
        self.bM, self.bA = [], []
        for d in range(self.dim):
            M1 = np.asarray(kron64.M1[d], np.float64)
            A1 = np.asarray(kron64.A1[d], np.float64)
            sm, bm, ms = slice_f64_host(M1, ns)
            sa, ba, as_ = slice_f64_host(A1, ns)
            self.sM.append(np.float32(sm))
            self.sA.append(np.float32(sa))
            self.bM.append(np.float32(bm))
            self.bA.append(np.float32(ba))
            self.Ms.append([jnp.asarray(s, jnp.bfloat16) for s in ms])
            self.As.append([jnp.asarray(s, jnp.bfloat16) for s in as_])

    def _apply(self, which: str, d: int, x_slices, axis: int, s_x):
        """Returns (ff_result, new_value_bound) for slices scaled by
        s_x."""
        ds = self.Ms[d] if which == "M" else self.As[d]
        sd = self.sM[d] if which == "M" else self.sA[d]
        bd = self.bM[d] if which == "M" else self.bA[d]
        return (mxu_axis_apply(x_slices, ds, axis, self.smax, s_x * sd),
                s_x * bd)

    def pair(self, xff, need_K: bool = True, need_M: bool = True):
        """(K x, M x) in ff; mirrors KronAssembledFF._pair_xla's shared
        mass-chain prefix (slices of each stage input are reused between
        the A- and M-applies)."""
        dim = self.dim
        lead = xff[0].ndim - dim
        # bounds track ||.||_max; the SLICING scale is always the
        # power-of-two ceiling of the bound (slice scale and recombine
        # scale must match exactly)
        b_val = _pow2ceil(jnp.max(jnp.abs(xff[0])))
        val = xff
        ks, b_ks = None, None
        for d in range(dim):
            ax = lead + d
            s_val = _pow2ceil(b_val)
            sl = slice_ff(val[0], val[1], self.ns, 1.0 / s_val)
            if need_K:
                a_term, b_a = self._apply("A", d, sl, ax, s_val)
                if ks is None:
                    ks, b_ks = a_term, b_a
                else:
                    s_ks = _pow2ceil(b_ks)
                    skl = slice_ff(ks[0], ks[1], self.ns, 1.0 / s_ks)
                    m_term, b_m = self._apply("M", d, skl, ax, s_ks)
                    ks = ff_add(m_term, a_term)
                    b_ks = b_m + b_a
            if need_M or (need_K and d < dim - 1):
                val, b_val = self._apply("M", d, sl, ax, s_val)
        return (ks if need_K else None), (val if need_M else None)
