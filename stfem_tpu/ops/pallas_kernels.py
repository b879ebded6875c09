"""Pallas TPU kernels for the hot operator paths.

fused_quad_middle: the quad-level middle of the space-time slab operator
(reference SystemMatrix::vmult, include/operators.h:536-559, fused per
SURVEY section 7's TPU mapping) -- everything between cell_gather and
cell_scatter fused so the per-cell-chunk intermediates live in VMEM:

    ub  = Beta  @ u            time-block mixing (outside the kernel: it
    ua  = Alpha @ u            commutes with the spatial contraction and
                               is a single MXU-shaped matmul, ~20 us)
    yv  = ((ub @ Phi ) * Wv) @ Phi^T      } one Pallas program per
    yg  = ((ua @ Grad) * Wg) @ Grad^T     } cell chunk, all in VMEM
    y   = yv + yg

XLA emits each contraction of the unfused form as a separate HBM round
trip (~6 x 25-100 MB of intermediate traffic at bench shapes).  The
full-cell basis matrices Phi (A x Q) / Grad (A x dim*Q) give MXU-shaped
matmuls (K ~= 128) where per-axis sum factorization would issue K=5
contractions the systolic array cannot fill; the ~2x extra FLOPs are far
cheaper than the HBM traffic they replace.

Weights W fold jxw, the per-axis inverse-Jacobian squares and optional
coefficient tables, so every diagonal-geometry mesh (uniform, non-uniform
tensor steps, masked cells) is covered; fully mapped meshes (jinv) fall
back to the XLA path.  All kernel dot_generals contract the LAST lhs dim
against the FIRST rhs dim -- the layout Mosaic lowers without relayouts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# i32 index-map constant (Python 0 weak-types to i64 under jax_enable_x64;
# Mosaic rejects mixed i64/i32 index tuples at lowering)
_Z = np.int32(0)

try:  # pallas is TPU/Mosaic; keep importable on any backend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _premix(u, Alpha, Beta):
    T, C, A = u.shape
    flat = u.reshape(T, C * A)
    ub = (Beta @ flat).reshape(Beta.shape[0], C, A)
    ua = (Alpha @ flat).reshape(Alpha.shape[0], C, A)
    return ub, ua


def _middle_reference(u, PhiG, W, Alpha, Beta, n_q_pts):
    """Pure-jnp reference (also the CPU execution path)."""
    Q = n_q_pts
    ub, ua = _premix(u, Alpha, Beta)
    qv = jnp.einsum("tca,aq->tcq", ub, PhiG[:, :Q])
    qg = jnp.einsum("tca,aq->tcq", ua, PhiG[:, Q:])
    yv = jnp.einsum("tcq,aq->tca", qv * W[None, :, :Q], PhiG[:, :Q])
    yg = jnp.einsum("tcq,aq->tca", qg * W[None, :, Q:], PhiG[:, Q:])
    return yv + yg


def _middle_kernel(ub_ref, ua_ref, phig_ref, phigT_ref, w_ref, out_ref,
                   *, n_q_pts):
    Q = n_q_pts

    def dot_last(x, m):
        return jax.lax.dot_general(
            x, m, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    phig = phig_ref[:]                             # (A, (1+d)Q)
    phigT = phigT_ref[:]                           # ((1+d)Q, A)
    w = w_ref[:]                                   # (c, (1+d)Q)
    qv = dot_last(ub_ref[:], phig[:, :Q])          # (T, c, Q)
    qg = dot_last(ua_ref[:], phig[:, Q:])          # (T, c, dQ)
    yv = dot_last(qv * w[:, :Q], phigT[:Q])        # (T, c, A)
    yg = dot_last(qg * w[:, Q:], phigT[Q:])
    out_ref[:] = yv + yg


def fused_quad_middle(u, PhiG, W, Alpha, Beta, n_q_pts: int,
                      cell_chunk: int = 16, mix=None):
    """u: (T, C, A) cell-gathered blocks -> (T_dst, C, A) integrated locals.

    PhiG: (A, (1+dim)Q) basis values+gradients at quad points;
    W: (C, (1+dim)Q) quadrature weights (mass part cols [:Q], stiffness
    cols [Q:], with jfac^2 and coefficients folded in);
    Alpha/Beta: (T_dst, T) time-block mixing tables.
    mix: optional (mix_beta, mix_alpha) callables replacing the dense
    premix (structure-aware block-bidiagonal mixing from SystemMatrix).
    """
    import os

    T_src, C, A = u.shape
    T_dst = Alpha.shape[0]
    if mix is not None:
        mix_b, mix_a = mix
        premix = lambda v: (mix_b(v), mix_a(v))
    else:
        premix = lambda v: _premix(v, Alpha, Beta)
    # Measured on-chip at the bench shapes: the restructured XLA path
    # (premix + two full-basis matmul pairs) runs 0.24 ms vs 0.45 ms for
    # the explicit Pallas kernel (XLA pipelines the HBM traffic better than
    # the v1 grid here), so XLA is the default; the kernel stays available
    # for shapes where it wins (STFEM_PALLAS_MIDDLE=1).
    if (not HAVE_PALLAS
            or os.environ.get("STFEM_PALLAS_MIDDLE") != "1"
            or jax.default_backend() not in ("tpu", "axon")):
        Q = n_q_pts
        ub, ua = premix(u)
        qv = jnp.einsum("tca,aq->tcq", ub, PhiG[:, :Q])
        qg = jnp.einsum("tca,aq->tcq", ua, PhiG[:, Q:])
        yv = jnp.einsum("tcq,aq->tca", qv * W[None, :, :Q], PhiG[:, :Q])
        yg = jnp.einsum("tcq,aq->tca", qg * W[None, :, Q:], PhiG[:, Q:])
        return yv + yg
    while C % cell_chunk:
        cell_chunk //= 2
    grid = (C // cell_chunk,)
    nq_all = PhiG.shape[1]
    ub, ua = premix(u)
    return pl.pallas_call(
        partial(_middle_kernel, n_q_pts=n_q_pts),
        out_shape=jax.ShapeDtypeStruct((T_dst, C, A), u.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T_dst, cell_chunk, A), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_dst, cell_chunk, A), lambda i: (_Z, i, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, nq_all), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq_all, A), lambda i: (_Z, _Z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cell_chunk, nq_all), lambda i: (i, _Z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_dst, cell_chunk, A), lambda i: (_Z, i, _Z),
                               memory_space=pltpu.VMEM),
    )(ub, ua, PhiG, jnp.transpose(PhiG), W)
