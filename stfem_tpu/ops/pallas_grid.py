"""Fused per-block Pallas chains for the grid sum-factorization applies.

The XLA grid path applies one banded per-axis matmul at a time; every pass
round-trips the (nb, ~q^dim) temporary through HBM and pays tensordot's
moveaxis copies (measured 16^3: Vanka apply 8.4 ms, matvec 9 ms, vs a
~2-3 ms flop/HBM bound).  These kernels keep the WHOLE per-block chain in
VMEM: one grid program per space-time block loads the block once, runs the
per-axis dot_general chain on-chip, and writes only the final result.

Mosaic lowers only last-lhs x first-rhs contractions without relayouts
(see ops/pallas_kernels.py), so each chain step contracts the LAST axis
and rotates the result (dim-1, 0, 1, ...).  The down chain therefore
yields the axis order chain_down_order(dim) (e.g. (q1, q2, q0) in 3D).
The per-position time-solve factors are elementwise on the flattened quad
grid, so the consumer builds them in that same order; the up chain
restores (n0, ..., n_{dim-1}).

VMEM budget: one block of the dof grid + <= 4 chain stages.  At 16^3 Q4
f32 that is ~7 MB (fits); 32^3+ per-block tiles exceed VMEM -- callers
must fall back to the XLA path (see fits_vmem()).

On CPU the kernels run in interpreter mode so the same code path is covered
by the regular test suite.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["chain_down", "chain_up", "fits_vmem",
           "chain_down_order", "factor_perm", "disabled", "is_disabled"]


# Runtime bypass: tracing inside `disabled()` takes the XLA fallback even
# when a module was built with the pallas path (host-side eigenvalue
# estimates trace the same modules that later run on the TPU).
_disabled = 0


def is_disabled() -> bool:
    return _disabled > 0


from contextlib import contextmanager


@contextmanager
def disabled():
    global _disabled
    _disabled += 1
    try:
        yield
    finally:
        _disabled -= 1


def chain_down_order(dim: int) -> list[int]:
    """Axis ids (original axis d of the quad grid) in the order produced
    by chain_down, e.g. [1, 2, 0] for dim=3."""
    ord_ = list(range(dim))
    for i in range(dim - 1):
        ord_ = [ord_[-1]] + ord_[:-1]
    return ord_


def factor_perm(dim: int) -> list[int]:
    """Transpose permutation taking lam[*cells, *(k+1)^dim] to the flat
    order produced by chain_down (interleaved (c_d, a_d) per axis, axes
    ordered by chain_down_order)."""
    return [p for d in chain_down_order(dim) for p in (d, dim + d)]


def fits_vmem(in_shape, mats, dtype, budget_bytes: int = 12 * 2 ** 20) -> bool:
    """Per-program VMEM estimate for one block chain, including Mosaic's
    tile padding (last dim to 128 lanes, second-minor to the dtype's
    sublane: 8 f32 / 16 bf16)."""
    isize = np.dtype(dtype).itemsize
    sub = 16 if isize == 2 else 8

    def padded(shape):
        s = list(shape)
        s[-1] = -(-s[-1] // 128) * 128
        if len(s) >= 2:
            s[-2] = -(-s[-2] // sub) * sub
        return int(np.prod(s))

    dims_out = [m.shape[0] for m in mats]
    n_in = padded(in_shape)
    n_out = padded(tuple(dims_out))
    n_mid = padded(tuple(max(m.shape) for m in mats))
    # double-buffered input + output blocks (ref dtype) + two live chain
    # stages, which always compute in f32 (bf16 widened at entry)
    est = isize * (2 * n_in + 2 * n_out) + 4 * 2 * n_mid
    return est <= budget_bytes


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _dot_last(t, m, acc):
    """Contract t's LAST axis with m's FIRST -- the only dot_general form
    Mosaic lowers without relayouts."""
    nd = t.ndim
    return jax.lax.dot_general(t, m, (((nd - 1,), (0,)), ((), ())),
                               preferred_element_type=acc)


def _rot(t):
    dim = t.ndim
    return jnp.transpose(t, (dim - 1,) + tuple(range(dim - 1)))


def _down_body(dim, acc, refs):
    # m_refs[d] holds mats[d].T: (n_d, q_d).  The chain computes in the
    # accumulator dtype: Mosaic cannot lower bf16 3D transposes/dots
    # ("unsupported shape cast"), so bf16 blocks are widened at entry --
    # HBM traffic stays bf16 through the refs, VMEM compute is f32.
    x_ref = refs[0]
    m_refs = refs[1:1 + dim]
    o_ref = refs[1 + dim]
    t = x_ref[0].astype(acc)
    order = list(range(dim))
    for i in range(dim):
        d = order[-1]
        t = _dot_last(t, m_refs[d][...].astype(acc), acc)
        if i < dim - 1:
            t = _rot(t)
            order = [order[-1]] + order[:-1]
    o_ref[0] = t.astype(o_ref.dtype)


def _up_body(dim, acc, refs):
    # input axis order chain_down_order(dim); m_refs[d] holds mats[d].T:
    # (q_d, n_d)
    w_ref = refs[0]
    m_refs = refs[1:1 + dim]
    o_ref = refs[1 + dim]
    t = w_ref[0].astype(acc)
    order = chain_down_order(dim)
    for i in range(dim):
        d = order[-1]
        t = _dot_last(t, m_refs[d][...].astype(acc), acc)
        if i < dim - 1:
            t = _rot(t)
            order = [order[-1]] + order[:-1]
    perm = tuple(order.index(j) for j in range(dim))
    if perm != tuple(range(dim)):
        t = jnp.transpose(t, perm)
    o_ref[0] = t.astype(o_ref.dtype)


def _chain(x, mats, body, out_dims, out_dtype):
    dim = len(mats)
    nb = x.shape[0]
    in_dims = x.shape[1:]
    acc = jnp.float32 if x.dtype != jnp.float64 else jnp.float64
    # i32 index-map constants: Python 0 weak-types to i64 under
    # jax_enable_x64 and Mosaic rejects mixed i64/i32 index tuples
    z = np.int32(0)
    specs = [pl.BlockSpec((1,) + tuple(in_dims),
                          lambda b: (b,) + (z,) * dim,
                          memory_space=pltpu.VMEM)]
    for m in mats:
        specs.append(pl.BlockSpec(m.shape, lambda b: (z, z),
                                  memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1,) + tuple(out_dims),
                            lambda b: (b,) + (z,) * dim,
                            memory_space=pltpu.VMEM)

    def run(interp):
        def f(x_, *mats_):
            return pl.pallas_call(
                partial(body, dim, acc),
                grid=(nb,),
                in_specs=specs,
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((nb,) + tuple(out_dims),
                                               out_dtype),
                interpret=interp,
            )(x_, *mats_)
        return f

    # interpret mode is chosen at LOWERING time per platform: the same
    # program may execute on the host (eager setup pieces, CPU tests)
    # and on the TPU (the solve) within one process
    return jax.lax.platform_dependent(x, *mats,
                                      cpu=run(True), default=run(False))


def chain_down(x, mats, out_dtype=None):
    """x: (nb, n0..n_{dim-1}); mats[d]: (q_d, n_d).
    Returns (nb, *quads) with axis order chain_down_order(dim)."""
    dim = len(mats)
    out_dims = tuple(mats[d].shape[0] for d in chain_down_order(dim))
    matsT = [jnp.swapaxes(m, 0, 1) for m in mats]
    return _chain(x, matsT, _down_body, out_dims,
                  out_dtype or x.dtype)


def chain_up(w, mats, out_dtype=None):
    """w: (nb, *quads) in chain_down's axis order; mats[d]: (n_d, q_d).
    Returns (nb, n0, ..., n_{dim-1})."""
    dim = len(mats)
    out_dims = tuple(mats[d].shape[0] for d in range(dim))
    matsT = [jnp.swapaxes(m, 0, 1) for m in mats]
    return _chain(w, matsT, _up_body, out_dims,
                  out_dtype or w.dtype)


# pallas_call passes refs positionally; adapt the bodies
_down_body_raw = _down_body
_up_body_raw = _up_body


def _down_body(dim, acc, *refs):  # noqa: F811
    return _down_body_raw(dim, acc, refs)


def _up_body(dim, acc, *refs):  # noqa: F811
    return _up_body_raw(dim, acc, refs)
