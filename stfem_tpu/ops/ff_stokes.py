"""Float-float residual engine for the Stokes saddle operator.

The heat/wave iterative-refinement path proves TRUE rel <= 1e-8 through a
double-single (two-f32) residual of the exact discretization
(ops/floatfloat.py); Stokes lacked one, so its bench bar was stuck at the
f32 floor (VERDICT r4 #2).  This module closes that: on separable geometry
(hyperRectangle, diagonal Jacobian, no coefficient/mask/morph -- every
shipped Stokes convergence config) the WHOLE saddle operator factorizes
into Kronecker products of small banded 1D matrices:

  * velocity vector Laplacian / mass: the scalar per-axis assembled
    factors (ops/kronfac.py), one KronAssembledFF per the existing heat
    machinery, batched over the component axis;
  * B (divergence) and B^T (pressure gradient): each modal DGP pressure
    mode P_{m1}(x)P_{m2}(y)P_{m3}(z) (total degree <= kp,
    mesh/fe_dgp.py) is itself a tensor product, so the (q, div u) pairing
    factorizes per mode into rectangular banded 1D factors between the
    u dof grid (nc*k+1) and the cell grid (nc):
        V[d][i, m, a] = h_i sum_q w_q P_m(x_q) phi_a(x_q)
        G[d][i, m, a] =     sum_q w_q P_m(x_q) phi_a'(x_q)
    (the 1/h of the physical derivative cancels the h of jxw along the
    derivative axis), assembled with the SAME 1D quadrature as the
    volume operator -- so the ff apply is the assembled operator
    bit-for-bit in exact arithmetic, under-integration quirks included.

KronStokesFF plugs into the generic FFSlabResidual scan (kron_ff/mask
injection): the "K path" is the full saddle apply [nu K u - B^T p; B u],
the "M path" is [M u; 0], and the scalar DG/CGP time tables mix them
exactly as SystemMatrixStokes::tensorproduct_eval does
(reference include/operators.h:819-867); the previous-slab coupling uses
Gamma on the M path (DG jump column) and optionally Gamma_K on the saddle
path (CGP), matching vmult_slice (operators.h:748-782).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh.fe import shape_data_1d
from ..mesh.fe_dgp import dgp_exponents, shifted_legendre_value
from ..time.quadrature import gauss
from ..utils.module import register_module
from .floatfloat import (FFSlabResidual, KronAssembledFF, ff_add,
                         ff_from_f64, ff_mul, ff_neg)

__all__ = ["KronStokesFF", "build_ff_stokes_residual"]


@register_module
class KronStokesFF:
    """ff saddle-operator apply on the flat [..., n_u + n_p] layout.

    pair(xff) -> (S x, Mtilde x) in ff with S x = [nu K u - B^T p; B u]
    and Mtilde x = [M u; 0] -- the (K-path, M-path) contract of
    FFSlabResidual's tables."""

    @staticmethod
    def supports(S) -> bool:
        mesh = S.mesh
        return (S.jinv is None and S.dg_pressure and not S.weak_faces
                and not S.free_faces and not S.weak_obstacle
                and getattr(mesh, "cell_mask", None) is None
                and getattr(mesh, "_vertices", None) is None)

    def __init__(self, S64):
        from ..ops.spatial import LaplaceMassOperator
        from .kronfac import KronAssembled

        assert self.supports(S64), "KronStokesFF needs separable geometry"
        mesh = S64.mesh
        self.dim = S64.dim
        self.k = S64.u_degree
        self.p_degree = S64.p_degree
        n_q = S64.n_q
        self.dof_shape_u = tuple(S64.dof_shape_u)
        self.cells = tuple(int(c) for c in S64.cells)
        self.n_ploc = int(S64.n_ploc)
        self.n_u = int(S64.n_u)
        self.n_p = int(S64.n_p)
        self.exps = dgp_exponents(self.dim, self.p_degree)
        # scalar velocity factors (viscosity folded into the stiffness 1D
        # factors in f64 BEFORE the ff split)
        K64 = LaplaceMassOperator(mesh, self.k, n_q, 0.0, 1.0,
                                  dtype=jnp.float64)
        M64 = LaplaceMassOperator(mesh, self.k, n_q, 1.0, 0.0,
                                  dtype=jnp.float64)
        kron64 = KronAssembled(K64, M64, jnp.float64)
        if S64.viscosity != 1.0:
            nu = np.float64(S64.viscosity)
            kron64.A1 = [jnp.asarray(np.asarray(A, np.float64) * nu)
                         for A in kron64.A1]
        self.base = KronAssembledFF(kron64)
        # B factors per axis: V (value pairing, carries h) and G
        # (derivative pairing, h cancels), per cell x mode x local dof
        sd = shape_data_1d(self.k, n_q)
        qx, qw = np.asarray(sd.quad_x), np.asarray(sd.quad_w)
        Pm = np.stack([shifted_legendre_value(m, qx)
                       for m in range(self.p_degree + 1)])  # [kp+1, q]
        Vq = np.einsum("q,mq,qa->ma", qw, Pm, np.asarray(sd.S))
        Gq = np.einsum("q,mq,qa->ma", qw, Pm, np.asarray(sd.D))
        self.Vf, self.Gf = [], []
        for d in range(self.dim):
            h = np.diff(np.asarray(mesh.axis_vertices(d), np.float64))
            V = h[:, None, None] * Vq[None]          # [nc, kp+1, k+1]
            G = np.broadcast_to(Gq[None], (len(h),) + Gq.shape).copy()
            self.Vf.append(ff_from_f64(V))
            self.Gf.append(ff_from_f64(G))

    # -- rectangular banded 1D applies (u grid <-> cell grid) -------------
    def _b_axis(self, Fff, m1, aff, axis):
        """u-grid -> cell-grid along `axis` (mode value index m1):
        y_i = sum_a F[i, m1, a] x_{i*k+a}."""
        k = self.k
        nc = int(Fff[0].shape[0])
        hi, lo = aff
        shape = [1] * hi.ndim
        shape[axis] = nc
        out = None
        for a in range(k + 1):
            sl = [slice(None)] * hi.ndim
            sl[axis] = slice(a, a + (nc - 1) * k + 1, k)
            co = (Fff[0][:, m1, a].reshape(shape),
                  Fff[1][:, m1, a].reshape(shape))
            t = ff_mul(co, (hi[tuple(sl)], lo[tuple(sl)]))
            out = t if out is None else ff_add(out, t)
        return out

    def _bt_axis(self, Fff, m1, aff, axis, nd):
        """cell-grid -> u-grid along `axis`: y_{i*k+a} += F[i, m1, a] x_i.
        Overlapping endpoint writes (a=k of cell i meets a=0 of cell i+1)
        are combined by TRUE ff adds of disjointly-scattered arrays, so
        the accumulation stays error-free."""
        k = self.k
        nc = int(Fff[0].shape[0])
        hi, lo = aff
        shape = [1] * hi.ndim
        shape[axis] = nc
        tshape = list(hi.shape)
        tshape[axis] = nd
        out = None
        for a in range(k + 1):
            co = (Fff[0][:, m1, a].reshape(shape),
                  Fff[1][:, m1, a].reshape(shape))
            t = ff_mul(co, (hi, lo))
            sl = [slice(None)] * hi.ndim
            sl[axis] = slice(a, a + (nc - 1) * k + 1, k)
            th = jnp.zeros(tshape, jnp.float32).at[tuple(sl)].set(t[0])
            tl = jnp.zeros(tshape, jnp.float32).at[tuple(sl)].set(t[1])
            out = (th, tl) if out is None else ff_add(out, (th, tl))
        return out

    def pair(self, xff, need_K: bool = True, need_M: bool = True):
        hi, lo = xff
        lead = hi.shape[:-1]
        nlead = len(lead)
        dim = self.dim
        grid = self.dof_shape_u
        u = (hi[..., :self.n_u].reshape(lead + (dim,) + grid),
             lo[..., :self.n_u].reshape(lead + (dim,) + grid))
        Ku, Mu = self.base.pair(u, need_K=need_K, need_M=need_M)
        Mout = None
        if need_M:
            zp = jnp.zeros(lead + (self.n_p,), jnp.float32)
            Mout = (jnp.concatenate(
                        [Mu[0].reshape(lead + (self.n_u,)), zp], axis=-1),
                    jnp.concatenate(
                        [Mu[1].reshape(lead + (self.n_u,)), zp], axis=-1))
        if not need_K:
            return None, Mout
        p = (hi[..., self.n_u:].reshape(lead + self.cells + (self.n_ploc,)),
             lo[..., self.n_u:].reshape(lead + self.cells + (self.n_ploc,)))
        # B u (p rows) and B^T p (u rows), mode by mode
        rp_modes = []
        bt_comps = [None] * dim
        for m, e in enumerate(self.exps):
            pm = (p[0][..., m], p[1][..., m])
            acc_m = None
            for c in range(dim):
                sel = (Ellipsis, c) + (slice(None),) * dim
                val = (u[0][sel], u[1][sel])
                tval = pm
                for d in range(dim):
                    ax = nlead + d
                    F = self.Gf[d] if d == c else self.Vf[d]
                    val = self._b_axis(F, e[d], val, ax)
                    tval = self._bt_axis(F, e[d], tval, ax, grid[d])
                acc_m = val if acc_m is None else ff_add(acc_m, val)
                bt_comps[c] = (tval if bt_comps[c] is None
                               else ff_add(bt_comps[c], tval))
            rp_modes.append(acc_m)
        rp = (jnp.stack([t[0] for t in rp_modes], axis=-1),
              jnp.stack([t[1] for t in rp_modes], axis=-1))
        bt = (jnp.stack([t[0] for t in bt_comps], axis=nlead),
              jnp.stack([t[1] for t in bt_comps], axis=nlead))
        ru = ff_add(Ku, ff_neg(bt))
        Kout = (jnp.concatenate([ru[0].reshape(lead + (self.n_u,)),
                                 rp[0].reshape(lead + (self.n_p,))],
                                axis=-1),
                jnp.concatenate([ru[1].reshape(lead + (self.n_u,)),
                                 rp[1].reshape(lead + (self.n_p,))],
                                axis=-1))
        return Kout, Mout


def build_ff_stokes_residual(S64, a, b, zeta=None, gamma=None):
    """FFSlabResidual over the Stokes saddle operator.

    a/b: the scalar multi-step time tables (the SAME arrays
    StokesSystemMatrix mixes with); zeta: previous-step M-coupling column
    (DG jump / CGP Zeta); gamma: previous-step SADDLE coupling column
    (CGP only -- also drives the p rows, vmult_slice semantics)."""
    kron = KronStokesFF(S64)
    mask_u = np.broadcast_to(
        np.asarray(S64.mask_u_np)[None],
        (S64.dim,) + tuple(S64.dof_shape_u)).reshape(-1)
    mask = np.concatenate([mask_u, np.ones(S64.n_p)])
    zcol = np.zeros((np.asarray(a).shape[0], 1)) if zeta is None \
        else np.asarray(zeta, np.float64)
    return FFSlabResidual(None, None, a, b, zcol, Gamma_K=gamma,
                          kron_ff=kron, mask=mask)
