"""Matrix-free Stokes saddle-point operator on structured meshes.

Weak form per cell (reference include/operators.h:1525-1575):
  u-row:  nu (grad u, grad v) - (p, div v)
  p-row:  (div u, q)
Velocity: vector Q_k (component axis leading), pressure: modal DGP.
The operator acts batched over arbitrary leading axes (time positions) and is
Cartesian-geometry for now (all shipped convergence configs use
hyperRectangle grids).

Flat packing: a Stokes space-time vector is [T, n_u + n_p] with
u = x[:, :n_u].reshape(T, dim, *dofgrid) and
p = x[:, n_u:].reshape(T, *cells, n_ploc), so the generic Krylov/GMG
machinery stays array-based.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh.fe import shape_data_1d
from ..mesh.fe_dgp import (dgp_values_at_tensor_gauss, n_dgp_dofs)
from ..mesh.grid import StructuredMesh
from ..utils.module import register_module
from .spatial import LaplaceMassOperator, _sumfac, cell_gather, cell_scatter


@register_module
class StokesOperator:
    def __init__(self, mesh: StructuredMesh, u_degree: int, p_degree: int,
                 n_q: int, viscosity: float = 1.0, dtype=jnp.float64,
                 dg_pressure: bool = True):
        assert dg_pressure, "FE_Q pressure: not yet implemented"
        self.mesh = mesh
        self.dim = mesh.dim
        self.u_degree = u_degree
        self.p_degree = p_degree
        self.n_q = n_q
        self.viscosity = float(viscosity)
        self.dtype = dtype
        self.cells = mesh.cells
        self.dof_shape_u = mesh.dof_shape(u_degree)
        self.n_ploc = n_dgp_dofs(self.dim, p_degree)

        sd = shape_data_1d(u_degree, n_q)
        self.S = jnp.asarray(sd.S, dtype)
        self.D = jnp.asarray(sd.D, dtype)
        self._sd = sd
        geom = mesh.geometry(n_q, u_degree)
        assert geom.cartesian, "Stokes on distorted meshes: TODO"
        self.jxw = jnp.asarray(geom.jxw, dtype)
        self.jinv_diag = jnp.asarray(geom.jinv_diag, dtype)
        self.mask_u_np = mesh.boundary_dof_mask(u_degree)
        self.mask_u = jnp.asarray(self.mask_u_np, dtype)
        # modal pressure basis at the tensor Gauss points (reference cell)
        self.Pq = jnp.asarray(
            dgp_values_at_tensor_gauss(self.dim, p_degree, n_q), dtype)

        self.n_u = self.dim * int(np.prod(self.dof_shape_u))
        self.n_p = int(np.prod(self.cells)) * self.n_ploc

    # -- packing ------------------------------------------------------------
    def pack(self, u: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        lead = u.shape[:-self.dim - 1]
        return jnp.concatenate(
            [u.reshape(lead + (self.n_u,)), p.reshape(lead + (self.n_p,))],
            axis=-1)

    def unpack(self, x: jnp.ndarray):
        lead = x.shape[:-1]
        u = x[..., :self.n_u].reshape(lead + (self.dim,) + self.dof_shape_u)
        p = x[..., self.n_u:].reshape(lead + self.cells + (self.n_ploc,))
        return u, p

    def _p_at_quad(self, p: jnp.ndarray) -> jnp.ndarray:
        """[..., *cells, nploc] -> [..., *cells, *q]."""
        qshape = (self.n_q,) * self.dim
        Pq = self.Pq.reshape(self.n_ploc, -1)
        pq = jnp.einsum("...m,mQ->...Q", p, Pq)
        return pq.reshape(p.shape[:-1] + qshape)

    # -- apply --------------------------------------------------------------
    def apply(self, u: jnp.ndarray, p: jnp.ndarray):
        """(ru, rp); u: [..., dim, *dofgrid], p: [..., *cells, nploc]."""
        dim, k = self.dim, self.u_degree
        S, D = self.S, self.D
        nu = self.viscosity
        u = u * self.mask_u
        p_q = self._p_at_quad(p)

        # per-component gather & physical gradients
        gphys = []  # gphys[c][e]
        for c in range(dim):
            uc = cell_gather(u[..., c, *([slice(None)] * dim)],
                             self.cells, k)
            gc = []
            for e in range(dim):
                mats = [D if d == e else S for d in range(dim)]
                gc.append(_sumfac(mats, uc, dim) * self.jinv_diag[e])
            gphys.append(gc)

        div_q = sum(gphys[c][c] for c in range(dim))

        # rp = (q, div u)
        rp = jnp.einsum("mQ,...Q->...m", self.Pq.reshape(self.n_ploc, -1),
                        (div_q * self.jxw).reshape(
                            div_q.shape[:-dim] + (-1,)))

        # ru_c = sum_e int d_e v (nu d_e u_c - delta_ce p)
        ru_comps = []
        for c in range(dim):
            acc = None
            for e in range(dim):
                t = nu * gphys[c][e]
                if e == c:
                    t = t - p_q
                t = t * (self.jxw * self.jinv_diag[e])
                mats = [D if d == e else S for d in range(dim)]
                contrib = _sumfac(mats, t, dim, forward=False)
                acc = contrib if acc is None else acc + contrib
            ru_comps.append(cell_scatter(acc, self.cells, k))
        ru = jnp.stack(ru_comps, axis=-self.dim - 1) * self.mask_u
        return ru, rp

    def apply_flat(self, x: jnp.ndarray) -> jnp.ndarray:
        u, p = self.unpack(x)
        ru, rp = self.apply(u, p)
        return self.pack(ru, rp)

    # -- element matrices for the Vanka patches -----------------------------
    def element_matrices(self):
        """(E_uu_scalar, E_up, E_pu): E_uu_scalar = nu-scaled scalar Laplace
        element matrices [C, A, A] (identical per component, Dirichlet rows/
        cols eliminated); E_up [C, dim*A, nploc] (u rows component-major):
        -int d_c phi_a psi_m; E_pu [C, nploc, dim*A]: +int psi_m d_c phi_a."""
        dim, k = self.dim, self.u_degree
        lap = LaplaceMassOperator(self.mesh, k, self.n_q, 0.0, self.viscosity,
                                  dtype=self.dtype)
        E_uu = lap.element_matrices()
        Phi, Grad = lap._basis_tensors()
        C = int(np.prod(self.cells))
        A = (k + 1) ** dim
        Q = self.n_q ** dim
        wq = jnp.broadcast_to(self.jxw, self.cells + (self.n_q,) * dim
                              ).reshape(C, Q)
        Pq = self.Pq.reshape(self.n_ploc, Q)
        parts = []
        for c in range(dim):
            G = jnp.asarray(Grad[c], self.dtype) * self.jinv_diag[c]
            blk = -jnp.einsum("cq,aq,mq->cam", wq, G, Pq)
            parts.append(blk)
        E_up = jnp.concatenate(parts, axis=1)
        mloc = cell_gather(self.mask_u, self.cells, k).reshape(C, A)
        mrows = jnp.concatenate([mloc] * dim, axis=1)
        E_up = E_up * mrows[:, :, None]
        E_pu = -jnp.transpose(E_up, (0, 2, 1))
        return E_uu, E_up, E_pu
