"""Fused Pallas TPU kernel for the Vanka grid time-solve stage.

In the grid Vanka apply (stmg/vanka.py::_vmult_grid) the multi-step
block-bidiagonal time solve
    y_s = Ginv w_s;   last_s = y_s[-1] + kappa * last_{s-1};
    y_s += last_{s-1} * cvec
is elementwise over the flattened eigen-position axis N with tiny per-step
(nt x nt) factors.  The XLA formulation (stacked FMAs + associative scan)
is exact but materializes ~4 S*nt*N f32 temporaries through HBM; at the
16^3 bench shape (S=32, nt=3, N=80^3) it measures 6.5 ms against a ~1 ms
HBM bound (scripts/timesolve_lab.py).

This kernel tiles N into lane-major (rows, 128) blocks that stay in VMEM:
one grid program loads its (S*nt, TN) slab once, runs the whole mix +
recurrence on-chip (the sequential S loop is FREE here -- it is unrolled
over registers/VMEM, no HBM round trips), and writes only the final
output: measured 1.1 ms at the bench shape, exact to bf16 resolution.

TN is capped at 4096 lanes: TN=8192 miscompiles on current Mosaic
(maxdiff 0.5 in the lab); 4096 is validated.  Callers route through
jax.lax.platform_dependent so CPU lowers the XLA fallback and only TPU
lowers the kernel.

Replaces (performance-only) the per-patch solve loop of the reference's
PreconditionVanka::vmult (include/stmg.h:832-872).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pick_tile", "time_solve_pallas"]

_MAX_TN = 4096  # validated; 8192 miscompiles (timesolve_lab)
_VMEM_BUDGET = 10 * 2 ** 20


def pick_tile(N: int, S: int, nt: int, itemsize: int) -> int | None:
    """Largest TN = 128*r with r dividing N//128, TN <= _MAX_TN, and the
    per-program working set within the VMEM budget.  None if unsupported."""
    if N % 128 or N <= 0:
        return None
    rows_total = N // 128
    best = None
    for r in range(1, min(rows_total, _MAX_TN // 128) + 1):
        if rows_total % r:
            continue
        # Mosaic requires the second-minor block dim divisible by 8 unless
        # it equals the full array dim (lowering check); 25-row tiles at
        # 8^3 (N = 40^3) fail without this
        if r % 8 and r != rows_total:
            continue
        tn = 128 * r
        # in + out slabs (item dtype) + f32 working copy + nt f32 y rows
        # + factors
        bytes_ = tn * (S * nt * (2 * itemsize + 4 + 4)
                       + (nt * nt + nt) * 4)
        if bytes_ <= _VMEM_BUDGET:
            best = tn
    return best


def _kernel(S: int, nt: int, out_dtype, w_ref, g_ref, c_ref, o_ref):
    ws = w_ref[...].astype(jnp.float32)       # (S*nt, rows, 128)
    kap = c_ref[nt - 1]
    prev = jnp.zeros_like(kap)
    for s in range(S):
        y_last = None
        for i in range(nt):
            yi = sum(g_ref[i, j] * ws[s * nt + j] for j in range(nt))
            o_ref[s * nt + i] = (yi + prev * c_ref[i]).astype(out_dtype)
            if i == nt - 1:
                y_last = yi
        prev = y_last + kap * prev


def time_solve_pallas(w: jnp.ndarray, GinvT: jnp.ndarray, cvecT: jnp.ndarray,
                      S: int, nt: int, TN: int, out_dtype,
                      interpret: bool = False) -> jnp.ndarray:
    """w: (S*nt, N) -> (S*nt, N) in out_dtype.  GinvT: (nt, nt, N) f32,
    cvecT: (nt, N) f32.  TN from pick_tile (must divide N).  interpret=True
    runs the Pallas interpreter (CPU test coverage only)."""
    N = w.shape[-1]
    rows = TN // 128
    wf = w.reshape(S * nt, N // 128, 128)
    gf = GinvT.reshape(nt, nt, N // 128, 128)
    cf = cvecT.reshape(nt, N // 128, 128)
    # index-map constants must be i32: under jax_enable_x64 a Python 0
    # weak-types to i64 while the program id stays i32, and Mosaic rejects
    # the mixed-type index tuple at lowering (failed to legalize func.return)
    z = np.int32(0)
    out = pl.pallas_call(
        partial(_kernel, S, nt, out_dtype),
        grid=(N // TN,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((S * nt, rows, 128), lambda b: (z, b, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, nt, rows, 128), lambda b: (z, z, b, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nt, rows, 128), lambda b: (z, b, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S * nt, rows, 128), lambda b: (z, b, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S * nt, N // 128, 128), out_dtype),
    )(wf, gf, cf)
    return out.reshape(S * nt, N)
