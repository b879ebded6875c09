"""1D-assembled Kronecker-sum operator apply for tensor-product geometry.

On an axis-aligned tensor mesh without coefficient or cell mask the global
assembled operators factorize exactly (the geometry Jacobian is diagonal and
jxw separates per axis):

    M_glob = M_1 (x) M_2 (x) ... (x) M_dim
    K_glob = sum_e  M_1 (x) ... (x) A_e (x) ... (x) M_dim

with tiny 1D assembled mass/stiffness matrices M_d, A_d (dense (nd_d, nd_d),
bandwidth 2k+1) built from the SAME 1D quadrature rule as the volume
operator -- so the apply is bit-for-bit the assembled operator, including
the reference's under-integration quirk.

One (Kx, Mx) pair costs 3*dim-1 DOF-sized per-axis matmuls instead of the
quadrature-grid sum-factorization sweep's ~(dim^2 + 3 dim) QUAD-sized ones
(plus the weight multiplies): at Q4/16^3 that is ~7x less HBM traffic, the
binding resource on TPU.  Under emulated f64 (TPU software double-double)
this is also the form with the FEWEST non-matmul ops, which is what wins
there (see system.py routing notes).

The 1D factors are UNCONSTRAINED (no Dirichlet zeroing): constraint masking
stays external (y = mask * A (mask * x)), which keeps the strong-Dirichlet
lift path (mask_input=False) exact as well.

Replaces the quadrature loop of the reference's MatrixFreeOperator
(include/operators.h:967-1187) for the separable-geometry case; coefficient
fields, cell masks, and mapped meshes keep the grid / cell-local paths.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.module import register_module

__all__ = ["KronAssembled"]


def _to_diags(A: np.ndarray, k: int) -> np.ndarray:
    """(2k+1, nd) diagonal storage: D[o, i] = A[i, i+o-k] (0 off-range)."""
    nd = A.shape[0]
    D = np.zeros((2 * k + 1, nd))
    for o in range(-k, k + 1):
        lo, hi = max(0, -o), min(nd, nd - o)
        D[o + k, lo:hi] = A[np.arange(lo, hi), np.arange(lo, hi) + o]
    return D


def _banded_axis_apply(D, x, axis, k: int):
    """y_i = sum_o D[o, i] * x_{i+o-k} along `axis` via static pad+slice."""
    nd = D.shape[1]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k, k)
    xp = jnp.pad(x, pad)
    dshape = [1] * x.ndim
    dshape[axis] = nd
    out = None
    for o in range(2 * k + 1):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(o, o + nd)
        term = D[o].reshape(dshape) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def _assemble_1d_dense(op1) -> np.ndarray:
    """Dense (nd, nd) assembled matrix of a 1D LaplaceMassOperator."""
    E = np.asarray(op1.element_matrices(), np.float64)   # (nc, k+1, k+1)
    k = op1.degree
    nc = E.shape[0]
    nd = nc * k + 1
    A = np.zeros((nd, nd))
    for c in range(nc):
        A[c * k:c * k + k + 1, c * k:c * k + k + 1] += E[c]
    return A


def _sharded_shifted() -> bool:
    """STFEM_KRON_STYLE=shifted: banded pad+slice applies on every
    backend.  Under a sharded spatial axis GSPMD lowers the shifted
    slices to one-hop, surface-sized collective-permute halo exchanges
    (the reference's ghost-exchange pattern, stmg.h:843-871), where the
    dense per-axis matmul lowers to full-array gathers/partial-sum
    all-reduces (measured on an 8-device CPU mesh: 14 collective-permutes
    / 0 all-gather vs 0 / 1).  The env knob is an A/B override only --
    the sharded production path flips `force_banded` programmatically
    (parallel.sharding.enable_halo_mode, auto-run by
    install_level_shardings), so no env state leaks across tests
    (ADVICE r4).  Read ONCE at construction, never per call."""
    import os
    return os.environ.get("STFEM_KRON_STYLE", "") == "shifted"


@register_module
class KronAssembled:
    """Per-axis assembled factors + the shared-prefix pair apply."""

    @staticmethod
    def supports(K_op, M_op) -> bool:
        """True when the geometry separates: diagonal Jacobian, no
        coefficient field, no cell mask, no vertex perturbation."""
        mesh = K_op.mesh
        return (K_op.jinv is None and K_op.coeff is None
                and M_op.coeff is None
                and getattr(mesh, "cell_mask", None) is None
                and getattr(mesh, "_vertices", None) is None)

    def __init__(self, K_op, M_op, dtype):
        assert self.supports(K_op, M_op)
        from ..mesh.grid import StructuredMesh
        from .spatial import LaplaceMassOperator

        mesh = K_op.mesh
        k, dim, n_q = K_op.degree, K_op.dim, K_op.n_q
        self.dim = dim
        self.k = k
        self._f64 = np.dtype(dtype) == np.float64
        # style captured ONCE here (ADVICE r4: pair() must not re-read the
        # env -- a mid-life flip would find Md/Ad missing).  force_banded
        # is the programmatic halo-mode switch for sharded runs
        # (parallel.sharding.enable_halo_mode).
        self._shifted = _sharded_shifted()
        self.force_banded = False
        self.M1, self.A1 = [], []
        self.Md, self.Ad = [], []
        for d in range(dim):
            verts = mesh.axis_vertices(d)
            steps = np.diff(verts)
            if np.allclose(steps, steps[0]):
                mesh1 = StructuredMesh([int(mesh.cells[d])],
                                       [float(verts[0])],
                                       [float(verts[-1])], refinement=0)
            else:
                mesh1 = StructuredMesh([len(steps)], [float(verts[0])],
                                       None, refinement=0,
                                       axis_steps=[steps])
            nd = int(mesh.cells[d]) * k + 1
            free = np.ones(nd)
            M1op = LaplaceMassOperator(mesh1, k, n_q, 1.0, 0.0,
                                       dtype=jnp.float64, mask=free)
            A1op = LaplaceMassOperator(mesh1, k, n_q, 0.0, 1.0,
                                       dtype=jnp.float64, mask=free)
            M1np = _assemble_1d_dense(M1op)
            A1np = _assemble_1d_dense(A1op)
            self.M1.append(jnp.asarray(M1np, dtype))
            self.A1.append(jnp.asarray(A1np, dtype))
            # diagonal (banded) form, ALWAYS built (it is (2k+1, nd) --
            # negligible storage): used by the emulated-f64 TPU apply
            # (a dense 1D contraction in software double-double pays
            # ~(nd/(2k+1))x more VPU ops than 2k+1 shifted elementwise
            # FMAs, measured 4.4x at Q4/16^3, scripts/banded64_lab.py) and
            # by the sharded halo mode, which may be enabled AFTER
            # construction (enable_halo_mode)
            self.Md.append(jnp.asarray(_to_diags(M1np, k), dtype))
            self.Ad.append(jnp.asarray(_to_diags(A1np, k), dtype))

    def _pair_impl(self, x, need_K: bool, need_M: bool, banded: bool):
        from .gridsumfac import axis_apply

        dim = self.dim
        lead = x.ndim - dim
        if banded:
            apM = [lambda v, ax, d=d: _banded_axis_apply(
                self.Md[d], v, ax, self.k) for d in range(dim)]
            apA = [lambda v, ax, d=d: _banded_axis_apply(
                self.Ad[d], v, ax, self.k) for d in range(dim)]
        else:
            apM = [lambda v, ax, d=d: axis_apply(self.M1[d], v, ax)
                   for d in range(dim)]
            apA = [lambda v, ax, d=d: axis_apply(self.A1[d], v, ax)
                   for d in range(dim)]
        val = x
        ks = None
        for d in range(dim):
            ax = lead + d
            if need_K:
                ks = (apA[d](val, ax) if ks is None
                      else apM[d](ks, ax) + apA[d](val, ax))
            last_val_needed = need_M or (need_K and d < dim - 1)
            if last_val_needed:
                val = apM[d](val, ax)
        return (ks if need_K else None), (val if need_M else None)

    def pair(self, x, need_K: bool = True, need_M: bool = True):
        """x: [..., *dofshape] -> (K_glob x, M_glob x); either result may be
        None when not requested.  The two share the mass-chain prefix:
        3*dim-1 matmuls for both, dim for mass alone.

        Under emulated f64 the TPU lowering uses the banded diagonal form
        (4.4x measured, scripts/banded64_lab.py); CPU (native f64) and all
        hardware dtypes keep the dense MXU matmuls."""
        import jax

        if self.force_banded or self._shifted:
            # sharded halo mode (see _sharded_shifted / enable_halo_mode)
            return self._pair_impl(x, need_K, need_M, banded=True)
        if not self._f64:
            return self._pair_impl(x, need_K, need_M, banded=False)

        def _tpu(x_):
            kk, mm = self._pair_impl(x_, need_K, need_M, banded=True)
            return [t for t in (kk, mm) if t is not None]

        def _default(x_):
            kk, mm = self._pair_impl(x_, need_K, need_M, banded=False)
            return [t for t in (kk, mm) if t is not None]

        out = jax.lax.platform_dependent(x, tpu=_tpu, default=_default)
        it = iter(out)
        return (next(it) if need_K else None), (next(it) if need_M else None)
