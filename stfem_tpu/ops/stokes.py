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
                 dg_pressure: bool = True, weak_faces=(), free_faces=(),
                 penalty1: float = 20.0, penalty2: float = 10.0,
                 delta0: float = 0.0, outflow_penalty: float = 0.0,
                 weak_obstacle: bool = False):
        """weak_faces: iterable of (axis, side) boundary faces with Nitsche
        weak Dirichlet conditions (reference operators.h:1658-1751); those
        faces are NOT eliminated from the velocity mask.  free_faces: faces
        with no constraint at all (do-nothing outflow).  penalties gamma1 =
        nu*penalty1, gamma2 = penalty2 (reference ctor defaults 20/10).

        weak_obstacle=True imposes the no-slip condition on the faces of the
        removed-cell region (the DFG obstacle, possibly curved through the
        mesh's exact vertex morph) by Nitsche penalties instead of strong
        elimination -- the reference applies its boundary Nitsche terms on
        the (curved) cylinder boundary too (operators.h:1658-1751).  The
        obstacle-boundary velocity dofs then stay free; only dofs interior
        to the removed region remain eliminated.  g = 0 there, so no RHS
        term arises.

        dg_pressure=False selects the Taylor-Hood pair Q_{u_degree}/Q_{
        p_degree} with a CONTINUOUS nodal pressure (reference
        tp_03stokes.cc:83-86: FE_DGP vs FE_Q switch on dGPressure)."""
        self.dg_pressure = bool(dg_pressure)
        self.mesh = mesh
        self.dim = mesh.dim
        self.u_degree = u_degree
        self.p_degree = p_degree
        self.n_q = n_q
        self.viscosity = float(viscosity)
        self.delta0 = float(delta0)
        self.beta = float(outflow_penalty)
        self.dtype = dtype
        self.cells = mesh.cells
        self.dof_shape_u = mesh.dof_shape(u_degree)
        self.n_ploc = n_dgp_dofs(self.dim, p_degree)
        if not dg_pressure:
            self.dof_shape_p = mesh.dof_shape(p_degree)
            sdp = shape_data_1d(p_degree, n_q)
            self.Sp = jnp.asarray(sdp.S, dtype)
            self.Dp = jnp.asarray(sdp.D, dtype)
            maskp = np.ones(self.dof_shape_p)
            if mesh.cell_mask is not None:
                maskp = np.zeros(self.dof_shape_p)
                kp = p_degree
                for cidx in np.argwhere(mesh.cell_mask == 1.0):
                    sl = tuple(slice(int(c) * kp, int(c) * kp + kp + 1)
                               for c in cidx)
                    maskp[sl] = 1.0
            self.mask_p_np = maskp
            self.mask_p = jnp.asarray(maskp, dtype)

        sd = shape_data_1d(u_degree, n_q)
        self.S = jnp.asarray(sd.S, dtype)
        self.D = jnp.asarray(sd.D, dtype)
        self._sd = sd
        geom = mesh.geometry(n_q, u_degree)
        self.jxw = jnp.asarray(geom.jxw, dtype)
        self.jinv = None
        if geom.jinv is not None:
            # general path (mapped/distorted meshes, e.g. the DFG cylinder
            # morph): full per-(cell, quad) inverse Jacobians.  Nitsche faces
            # use the axis-aligned tensor-face machinery, which stays exact
            # as long as the map is the identity ON the outer boundary (the
            # DFG morphs have compact support around the obstacle) -- verify.
            if weak_faces or free_faces:
                assert mesh.vertex_map is not None, \
                    "Nitsche faces on distorted meshes: unsupported"
                import jax
                axes = [mesh.axis_vertices(d) for d in range(self.dim)]
                base = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
                fmap = mesh.vertex_map
                for d in range(self.dim):
                    for side in (0, -1):
                        idx = [slice(None)] * self.dim
                        idx[d] = side
                        pts = jnp.asarray(
                            base[tuple(idx)].reshape(-1, self.dim))
                        ok_v = np.allclose(np.asarray(jax.vmap(fmap)(pts)),
                                           np.asarray(pts), atol=1e-12)
                        J = np.asarray(jax.vmap(jax.jacfwd(fmap))(pts))
                        ok_j = np.allclose(J, np.eye(self.dim), atol=1e-10)
                        assert ok_v and ok_j, \
                            "Nitsche faces on mapped meshes need the map " \
                            "to be identity (incl. Jacobian) on the outer " \
                            "boundary"
            self.jinv = jnp.asarray(geom.jinv, dtype)
            self.jinv_diag = None
            self.jfac = None
        elif geom.jinv_diag is not None:
            self.jinv_diag = jnp.asarray(geom.jinv_diag, dtype)
            self.jfac = [self.jinv_diag[e] for e in range(self.dim)]
        else:
            self.jinv_diag = None
            jfac = []
            for e in range(self.dim):
                shape = [1] * (2 * self.dim)
                shape[e] = mesh.cells[e]
                jfac.append(jnp.asarray(geom.jinv_axis[e], dtype
                                        ).reshape(shape))
            self.jfac = jfac
        self.weak_faces = tuple(weak_faces)
        self.free_faces = tuple(free_faces)
        self.gamma1 = viscosity * float(penalty1)
        self.gamma2 = float(penalty2)
        unconstrained = self.weak_faces + self.free_faces
        mask = mesh.boundary_dof_mask(u_degree)
        for (d0, side) in unconstrained:
            idx = [slice(None)] * self.dim
            idx[d0] = 0 if side == 0 else -1
            sub = mask[tuple(idx)]
            mask[tuple(idx)] = np.maximum(sub, 1.0) if mesh.cell_mask is None \
                else 1.0 * (np.ones_like(sub))
        # re-eliminate obstacle dofs (removed-cell adjacency) and corners
        # shared with strong faces.  With a weak obstacle only dofs carried
        # by NO active cell stay eliminated; the obstacle-boundary layer is
        # free and constrained by the Nitsche terms.
        self.weak_obstacle = bool(weak_obstacle) and mesh.cell_mask is not None
        if mesh.cell_mask is not None and not self.weak_obstacle:
            k = u_degree
            for cidx in np.argwhere(mesh.cell_mask == 0.0):
                sl = tuple(slice(int(c) * k, int(c) * k + k + 1)
                           for c in cidx)
                mask[sl] = 0.0
        elif self.weak_obstacle:
            # boundary_dof_mask eliminated every removed-cell dof; re-free
            # the obstacle-boundary layer (it is constrained weakly) and
            # keep only dofs carried by NO active cell eliminated
            k = u_degree
            active = np.zeros(self.dof_shape_u)
            for cidx in np.argwhere(mesh.cell_mask == 1.0):
                sl = tuple(slice(int(c) * k, int(c) * k + k + 1)
                           for c in cidx)
                active[sl] = 1.0
            outer = np.ones(self.dof_shape_u)
            for d in range(self.dim):
                for sd_ in (0, -1):
                    if (d, 0 if sd_ == 0 else 1) in unconstrained:
                        continue
                    idx = [slice(None)] * self.dim
                    idx[d] = sd_
                    outer[tuple(idx)] = 0.0
            mask = outer * active
        for d in range(self.dim):
            for sd in (0, -1):
                if (d, 0 if sd == 0 else 1) in unconstrained:
                    continue
                idx = [slice(None)] * self.dim
                idx[d] = sd
                mask[tuple(idx)] = 0.0
        self.mask_u_np = mask
        self.mask_u = jnp.asarray(self.mask_u_np, dtype)
        # modal pressure basis at the tensor Gauss points (reference cell)
        self.Pq = jnp.asarray(
            dgp_values_at_tensor_gauss(self.dim, p_degree, n_q), dtype)

        self.n_u = self.dim * int(np.prod(self.dof_shape_u))
        self.n_p = (int(np.prod(self.cells)) * self.n_ploc if dg_pressure
                    else int(np.prod(self.dof_shape_p)))
        if self.weak_obstacle:
            # eager build so the face matrices are pytree leaves (jit args)
            self._obstacle_face_setup()

    # -- packing ------------------------------------------------------------
    def pack(self, u: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        lead = u.shape[:-self.dim - 1]
        return jnp.concatenate(
            [u.reshape(lead + (self.n_u,)), p.reshape(lead + (self.n_p,))],
            axis=-1)

    def unpack(self, x: jnp.ndarray):
        lead = x.shape[:-1]
        u = x[..., :self.n_u].reshape(lead + (self.dim,) + self.dof_shape_u)
        p = x[..., self.n_u:].reshape(lead + self.p_shape)
        return u, p

    @property
    def p_shape(self) -> tuple[int, ...]:
        """Per-block pressure shape: [*cells, nploc] (DGP modal) or
        [*pdofgrid] (FE_Q nodal)."""
        return (self.cells + (self.n_ploc,) if self.dg_pressure
                else self.dof_shape_p)

    def _p_at_quad(self, p: jnp.ndarray) -> jnp.ndarray:
        """[..., *p_shape] -> [..., *cells, *q]."""
        if not self.dg_pressure:
            pc = cell_gather(p * self.mask_p, self.cells, self.p_degree)
            return _sumfac([self.Sp] * self.dim, pc, self.dim)
        qshape = (self.n_q,) * self.dim
        Pq = self.Pq.reshape(self.n_ploc, -1)
        pq = jnp.einsum("...m,mQ->...Q", p, Pq)
        return pq.reshape(p.shape[:-1] + qshape)

    # -- geometry-generic gradient helpers ----------------------------------
    def _grad_phys(self, uc):
        """Physical gradient of a cell-gathered scalar field at the quad
        points: list over d of d(u)/dx_d, [..., *cells, *q]."""
        dim = self.dim
        S, D = self.S, self.D
        ghat = []
        for e in range(dim):
            mats = [D if d == e else S for d in range(dim)]
            ghat.append(_sumfac(mats, uc, dim))
        if self.jinv is None:
            return [ghat[e] * self.jfac[e] for e in range(dim)]
        ji = self.jinv
        return [sum(ghat[e] * ji[..., e, d] for e in range(dim))
                for d in range(dim)]

    def _int_grad_phys(self, tvec):
        """Integrate sum_d (d_d v, tvec[d]) against test gradients back to
        reference cell-local dofs (includes the jxw measure)."""
        dim = self.dim
        S, D = self.S, self.D
        acc = None
        for e in range(dim):
            if self.jinv is None:
                s = tvec[e] * (self.jxw * self.jfac[e])
            else:
                s = sum(tvec[d] * self.jinv[..., e, d]
                        for d in range(dim)) * self.jxw
            mats = [D if d == e else S for d in range(dim)]
            contrib = _sumfac(mats, s, dim, forward=False)
            acc = contrib if acc is None else acc + contrib
        return acc

    # -- apply --------------------------------------------------------------
    def apply(self, u: jnp.ndarray, p: jnp.ndarray, mode: str = "none",
              u_lin: jnp.ndarray | None = None, mask_input: bool = True):
        """(ru, rp); u: [..., dim, *dofgrid], p: [..., *cells, nploc].

        mode: "none" (linear Stokes), "jacobian" (Navier linearization:
        gradient term -= u_lin (x) du + du (x) u_lin) or "form" (nonlinear
        residual: -= du (x) u_lin with du = u); reference OperatorMode
        dispatch, operators.h:1530-1567.
        mask_input=False reads Dirichlet-eliminated u dofs too (the
        strong-Dirichlet lift path, ops/boundary.py); outputs stay masked.
        """
        dim, k = self.dim, self.u_degree
        S, D = self.S, self.D
        nu = self.viscosity
        if mask_input:
            u = u * self.mask_u
        p_q = self._p_at_quad(p)
        navier = mode in ("jacobian", "form")

        # per-component gather & physical gradients (+ values when nonlinear)
        gphys = []  # gphys[c][d] = d u_c / d x_d at quad points
        vq = [] if navier else None
        vlinq = [] if navier else None
        for c in range(dim):
            uc = cell_gather(u[..., c, *([slice(None)] * dim)],
                             self.cells, k)
            gphys.append(self._grad_phys(uc))
            if navier:
                vq.append(_sumfac([S] * dim, uc, dim))
                ulc = cell_gather(
                    (u_lin * self.mask_u)[..., c, *([slice(None)] * dim)],
                    self.cells, k)
                vlinq.append(_sumfac([S] * dim, ulc, dim))

        div_q = sum(gphys[c][c] for c in range(dim))

        # rp = (q, div u)
        if self.dg_pressure:
            rp = jnp.einsum("mQ,...Q->...m",
                            self.Pq.reshape(self.n_ploc, -1),
                            (div_q * self.jxw).reshape(
                                div_q.shape[:-dim] + (-1,)))
        else:
            y = _sumfac([self.Sp] * dim, div_q * self.jxw, dim,
                        forward=False)
            rp = cell_scatter(y, self.cells, self.p_degree) * self.mask_p

        # ru_c = sum_d int d_d v (nu d_d u_c - delta_cd p [- convection_cd])
        ru_comps = []
        for c in range(dim):
            tvec = []
            for d in range(dim):
                t = nu * gphys[c][d]
                if d == c:
                    t = t - p_q
                if mode == "jacobian":
                    t = t - vlinq[c] * vq[d] - vq[c] * vlinq[d]
                elif mode == "form":
                    t = t - vq[c] * vlinq[d]
                tvec.append(t)
            acc = self._int_grad_phys(tvec)
            ru_comps.append(cell_scatter(acc, self.cells, k))
        ru = jnp.stack(ru_comps, axis=-self.dim - 1)
        if self.weak_faces:
            ru_n, rp_n = self.apply_nitsche(u, p)
            ru = ru + ru_n
            rp = rp + rp_n
        if self.weak_obstacle:
            ru_o, rp_o = self.apply_nitsche_obstacle(u, p)
            ru = ru + ru_o
            rp = rp + rp_o
        if navier and self.delta0 != 0.0:
            ru = ru + self.apply_cip(u, u_lin, self.delta0)
        if navier and self.beta != 0.0 and self.free_faces:
            ru = ru + self.apply_backflow(u, u_lin, self.beta)
        return ru * self.mask_u, rp

    def apply_flat(self, x: jnp.ndarray) -> jnp.ndarray:
        u, p = self.unpack(x)
        ru, rp = self.apply(u, p)
        return self.pack(ru, rp)

    @property
    def n_ploc_cell(self) -> int:
        """Local pressure dofs per cell: DGP modes or Q_{kp} nodal values."""
        return (self.n_ploc if self.dg_pressure
                else (self.p_degree + 1) ** self.dim)

    def _p_basis_at_quad(self) -> jnp.ndarray:
        """[n_ploc_cell, Q] local pressure basis at the tensor Gauss points
        (modal shifted-Legendre for DGP, nodal Lagrange for FE_Q)."""
        Q = self.n_q ** self.dim
        if self.dg_pressure:
            return self.Pq.reshape(self.n_ploc, Q)
        dim, kp = self.dim, self.p_degree
        Sp = np.asarray(shape_data_1d(kp, self.n_q).S)   # (q, kp+1)
        A_p = (kp + 1) ** dim
        a_idx = np.stack(np.meshgrid(*[np.arange(kp + 1)] * dim,
                                     indexing="ij"), -1).reshape(A_p, dim)
        q_idx = np.stack(np.meshgrid(*[np.arange(self.n_q)] * dim,
                                     indexing="ij"), -1).reshape(Q, dim)
        PqN = np.ones((A_p, Q))
        for d in range(dim):
            PqN *= Sp[q_idx[:, d][None, :], a_idx[:, d][:, None]]
        return jnp.asarray(PqN, self.dtype)

    # -- element matrices for the Vanka patches -----------------------------
    def element_matrices(self):
        """(E_uu_scalar, E_up, E_pu): E_uu_scalar = nu-scaled scalar Laplace
        element matrices [C, A, A] (identical per component, Dirichlet rows/
        cols eliminated); E_up [C, dim*A, n_ploc_cell] (u rows
        component-major): -int d_c phi_a psi_m; E_pu [C, n_ploc_cell, dim*A]:
        +int psi_m d_c phi_a.  For FE_Q pressure the psi_m are the cell-local
        NODAL basis (the assembled coupling is the neighbor-overlap sum,
        done by the Vanka build)."""
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
        Pq = self._p_basis_at_quad()
        parts = []
        if self.jinv is not None:
            ji = self.jinv.reshape(C, Q, dim, dim)
            GradJ = jnp.asarray(np.asarray(Grad), self.dtype)
            gphys = jnp.einsum("cqed,eaq->cdaq", ji, GradJ)
        for c in range(dim):
            if self.jinv is not None:
                blk = -jnp.einsum("cq,caq,mq->cam", wq, gphys[:, c], Pq)
            else:
                Gc = jnp.asarray(Grad[c], self.dtype)
                jf = jnp.broadcast_to(self.jfac[c],
                                      self.cells + (1,) * dim).reshape(C, 1)
                blk = -jnp.einsum("cq,aq,mq->cam", wq * jf, Gc, Pq)
            parts.append(blk)
        E_up = jnp.concatenate(parts, axis=1)
        mloc = cell_gather(self.mask_u, self.cells, k).reshape(C, A)
        mrows = jnp.concatenate([mloc] * dim, axis=1)
        E_up = E_up * mrows[:, :, None]
        if not self.dg_pressure:
            # eliminate constrained (masked-cell) pressure dofs
            mp = cell_gather(self.mask_p, self.cells,
                             self.p_degree).reshape(C, -1)
            E_up = E_up * mp[:, None, :]
        E_pu = -jnp.transpose(E_up, (0, 2, 1))
        return E_uu, E_up, E_pu

    # -- Nitsche weak boundary machinery ------------------------------------
    # (reference do_boundary_face_integral_local, operators.h:1658-1751, and
    #  StokesNitscheMatrixFreeOperator, operators.h:1768-1951)
    def _face_setup(self, d0: int, side: int):
        """Static per-face data: edge derivative weights, face quadrature,
        modal pressure trace, face coords, face measure."""
        from ..mesh.fe import q_nodes_1d
        from ..mesh.fe_dgp import dgp_exponents, shifted_legendre_value
        from ..time.quadrature import LagrangeBasis, gauss
        dim, k = self.dim, self.u_degree
        mesh = self.mesh
        basis = LagrangeBasis(np.asarray(q_nodes_1d(k)))
        edge_x = 0.0 if side == 0 else 1.0
        D1edge = basis.deriv_matrix(np.array([edge_x]))[0]   # (k+1,)
        oth = [d for d in range(dim) if d != d0]
        qx, qw = gauss(self.n_q)

        def steps(d):
            if getattr(mesh, "axis_steps", None) is not None:
                return np.asarray(mesh.axis_steps[d])
            return np.full(mesh.cells[d], mesh.h[d])

        # per-(cell, quad) face weights and per-cell face size: shape
        # [*cells_oth, *q_oth] and [*cells_oth, 1...] (broadcastable)
        jxw = np.ones(tuple(mesh.cells[d] for d in oth)
                      + (self.n_q,) * (dim - 1))
        hf = np.ones(tuple(mesh.cells[d] for d in oth))
        for i, d in enumerate(oth):
            cshape = [1] * (2 * (dim - 1))
            cshape[i] = mesh.cells[d]
            qshape = [1] * (2 * (dim - 1))
            qshape[(dim - 1) + i] = self.n_q
            jxw = jxw * steps(d).reshape(cshape) * qw.reshape(qshape)
            hshape = [1] * (dim - 1)
            hshape[i] = mesh.cells[d]
            hf = hf * steps(d).reshape(hshape)
        hf = hf ** (1.0 / max(dim - 1, 1))
        hf = hf.reshape(hf.shape + (1,) * (dim - 1))
        h0 = float(steps(d0)[0 if side == 0 else -1])
        exps = dgp_exponents(dim, self.p_degree)
        Pqf = np.ones((len(exps),) + (self.n_q,) * (dim - 1))
        for m, e in enumerate(exps):
            Pqf[m] *= shifted_legendre_value(e[d0], np.array([edge_x]))[0]
            for i, d in enumerate(oth):
                shape = [1] * (dim - 1)
                shape[i] = self.n_q
                Pqf[m] = Pqf[m] * shifted_legendre_value(
                    e[d], qx).reshape(shape)
        # physical face-quad coordinates [cells_oth.., q_oth.., dim]
        cells_oth = tuple(mesh.cells[d] for d in oth)
        coords = np.zeros(cells_oth + (self.n_q,) * (dim - 1) + (dim,))
        coords[..., d0] = mesh.lower[d0] if side == 0 else mesh.upper[d0]
        for i, d in enumerate(oth):
            v = mesh.axis_vertices(d) if hasattr(mesh, "axis_vertices") \
                else mesh.lower[d] + mesh.h[d] * np.arange(mesh.cells[d] + 1)
            widths = np.diff(v)
            pos = v[:-1, None] + widths[:, None] * qx[None, :]
            shape = [1] * (2 * (dim - 1))
            shape[i] = mesh.cells[d]
            shape[(dim - 1) + i] = self.n_q
            coords[..., d] = pos.reshape(shape)
        return dict(D1edge=jnp.asarray(D1edge, self.dtype), oth=oth,
                    jxw=jnp.asarray(jxw, self.dtype),
                    hf=jnp.asarray(hf, self.dtype), h0=h0,
                    Pqf=jnp.asarray(Pqf, self.dtype),
                    coords=jnp.asarray(coords, self.dtype))

    def _trace_eval(self, field, oth, degree=None, mat=None):
        """[..., *dofs_oth] -> [..., *cells_oth, *q_oth]."""
        cells_oth = tuple(self.cells[d] for d in oth)
        fc = cell_gather(field, cells_oth,
                         self.u_degree if degree is None else degree)
        m = self.S if mat is None else mat
        return _sumfac([m] * (self.dim - 1), fc, self.dim - 1)

    def _trace_integrate(self, vals, oth, degree=None, mat=None):
        cells_oth = tuple(self.cells[d] for d in oth)
        m = self.S if mat is None else mat
        y = _sumfac([m] * (self.dim - 1), vals, self.dim - 1,
                    forward=False)
        return cell_scatter(y, cells_oth,
                            self.u_degree if degree is None else degree)

    def apply_nitsche(self, u, p):
        """Weak-boundary operator contributions (ru_add, rp_add).

        u: [..., dim, *grid] (already masked by apply()), p: [..., cells, m].
        """
        dim, k = self.dim, self.u_degree
        nu = self.viscosity
        L = u.ndim - dim - 1  # number of leading axes
        ru = jnp.zeros(u.shape, self.dtype)
        rp = jnp.zeros(p.shape, self.dtype)
        for (d0, side) in self.weak_faces:
            fd = self._face_setup(d0, side)
            oth, jxwf, hf = fd["oth"], fd["jxw"], fd["hf"]
            D1e = fd["D1edge"]
            n_sign = -1.0 if side == 0 else 1.0
            eidx = 0 if side == 0 else -1
            grid_sl = [slice(None)] * dim
            grid_sl[d0] = eidx
            cell_sl = [slice(None)] * dim
            cell_sl[d0] = eidx
            layer_sl = [slice(None)] * dim
            layer_sl[d0] = (slice(0, k + 1) if side == 0
                            else slice(-(k + 1), None))
            uq, dnq = [], []
            for c in range(dim):
                uc = jnp.take(u, c, axis=L)          # lead + grid
                uf = uc[(..., *grid_sl)]             # lead + dofs_oth
                uq.append(self._trace_eval(uf, oth))
                # normal derivative from the boundary-cell layer only
                ul = uc[(..., *layer_sl)]
                dn = jnp.tensordot(D1e, jnp.moveaxis(ul, L + d0, 0),
                                   axes=(0, 0)) * (n_sign / fd["h0"])
                dnq.append(self._trace_eval(dn, oth))
            un = n_sign * uq[d0]
            if self.dg_pressure:
                p_b = p[(..., *cell_sl, slice(None))]
                pq = jnp.einsum("...m,mQ->...Q", p_b,
                                fd["Pqf"].reshape(self.n_ploc, -1))
                pq = pq.reshape(p_b.shape[:-1] + (self.n_q,) * (dim - 1))
                rp_add = -jnp.einsum(
                    "mQ,...Q->...m", fd["Pqf"].reshape(self.n_ploc, -1),
                    (un * jxwf).reshape(
                        un.shape[:un.ndim - (dim - 1)] + (-1,)))
                rp = rp.at[(..., *cell_sl, slice(None))].add(rp_add)
            else:
                # FE_Q: nodal pressure trace straight from the grid boundary
                grid_sl_p = [slice(None)] * dim
                grid_sl_p[d0] = eidx
                pf = (p * self.mask_p)[(..., *grid_sl_p)]
                pq = self._trace_eval(pf, oth, self.p_degree, self.Sp)
                rp_add = -self._trace_integrate(un * jxwf, oth,
                                                self.p_degree, self.Sp)
                mp_f = self.mask_p[tuple(grid_sl_p)]
                rp = rp.at[(..., *grid_sl_p)].add(rp_add * mp_f)
            for c in range(dim):
                n_c = n_sign if c == d0 else 0.0
                T1 = (self.gamma1 / hf) * uq[c] - nu * dnq[c]
                if c == d0:
                    T1 = T1 + (self.gamma2 / hf) * n_c * un + n_c * pq
                y1 = self._trace_integrate(T1 * jxwf, oth)
                ru = ru.at[(..., c, *grid_sl)].add(y1)
                # adjoint consistency: -nu u against the normal derivative
                y2 = self._trace_integrate((-nu * uq[c]) * jxwf, oth)
                prof = D1e * (n_sign / fd["h0"])
                pshape = [1] * (y2.ndim + 1)
                pshape[y2.ndim - (dim - 1) + d0] = k + 1
                arr = jnp.expand_dims(y2, y2.ndim - (dim - 1) + d0)
                arr = arr * prof.reshape(pshape)
                cell_layer = [slice(None)] * dim
                cell_layer[d0] = (slice(0, k + 1) if side == 0
                                  else slice(-(k + 1), None))
                ru = ru.at[(..., c, *cell_layer)].add(arr)
        return ru, rp

    def nitsche_rhs(self, g_fn, t):
        """RHS from weak Dirichlet data g(x, t): returns (rhs_u, rhs_p) in
        grid layout (reference StokesNitscheMatrixFreeOperator::vmult)."""
        dim, k = self.dim, self.u_degree
        nu = self.viscosity
        rhs_u = jnp.zeros((dim,) + tuple(self.dof_shape_u), self.dtype)
        rhs_p = jnp.zeros(self.p_shape, self.dtype)
        for (d0, side) in self.weak_faces:
            fd = self._face_setup(d0, side)
            oth, jxwf, hf = fd["oth"], fd["jxw"], fd["hf"]
            D1e = fd["D1edge"]
            n_sign = -1.0 if side == 0 else 1.0
            eidx = 0 if side == 0 else -1
            grid_sl = [slice(None)] * dim
            grid_sl[d0] = eidx
            cell_sl = [slice(None)] * dim
            cell_sl[d0] = eidx
            g = g_fn(fd["coords"], t)               # [cells_oth, q_oth, dim]
            gn = n_sign * g[..., d0]
            if self.dg_pressure:
                rp_add = -jnp.einsum(
                    "mQ,...Q->...m", fd["Pqf"].reshape(self.n_ploc, -1),
                    (gn * jxwf).reshape(
                        gn.shape[:gn.ndim - (dim - 1)] + (-1,)))
                rhs_p = rhs_p.at[(*cell_sl, slice(None))].add(rp_add)
            else:
                grid_sl_p = [slice(None)] * dim
                grid_sl_p[d0] = eidx
                rp_add = -self._trace_integrate(gn * jxwf, oth,
                                                self.p_degree, self.Sp)
                mp_f = self.mask_p[tuple(grid_sl_p)]
                rhs_p = rhs_p.at[tuple(grid_sl_p)].add(rp_add * mp_f)
            for c in range(dim):
                T1 = (self.gamma1 / hf) * g[..., c]
                if c == d0:
                    T1 = T1 + (self.gamma2 / hf) * n_sign * gn
                y1 = self._trace_integrate(T1 * jxwf, oth)
                rhs_u = rhs_u.at[(c, *grid_sl)].add(y1)
                y2 = self._trace_integrate((-nu * g[..., c]) * jxwf, oth)
                prof = D1e * (n_sign / fd["h0"])
                pshape = [1] * (y2.ndim + 1)
                pshape[y2.ndim - (dim - 1) + d0] = k + 1
                arr = jnp.expand_dims(y2, y2.ndim - (dim - 1) + d0)
                arr = arr * prof.reshape(pshape)
                cell_layer = [slice(None)] * dim
                cell_layer[d0] = (slice(0, k + 1) if side == 0
                                  else slice(-(k + 1), None))
                rhs_u = rhs_u.at[(c, *cell_layer)].add(arr)
        # contributions landing on strongly-eliminated dofs (e.g. corners
        # shared with strong faces) must not enter the residual
        return rhs_u * self.mask_u, rhs_p

    def _obstacle_face_setup(self):
        """Assembled Nitsche matrices for the obstacle (removed-cell) faces.

        The obstacle surface is O(faces) small, so the weak terms are built
        ONCE as dense per-face local matrices over the (possibly curved,
        via the mesh's exact vertex morph) face quadrature -- Nanson normals
        n ds = detJ J^{-T} n_ref dxi, physical gradients through J^{-1} --
        and applied as a batched gather -> local matvec -> scatter-add.
        Mirrors the reference's boundary-face Nitsche integral
        (operators.h:1658-1751) evaluated on the mapped cylinder boundary.

        Returns dict(E_uu [F,dim,dim,A,A], E_up [F,dim,A,m], uidx [F,A]
        flat dof-grid indices, pidx [F] flat cell indices) or None when the
        mesh has no removed cells.
        """
        if getattr(self, "_obstacle_cache", "unset") != "unset":
            return self._obstacle_cache
        from .functionals import obstacle_faces
        from ..mesh.fe import q_nodes_1d
        from ..mesh.fe_dgp import dgp_exponents, shifted_legendre_value
        from ..time.quadrature import LagrangeBasis, gauss
        assert self.dg_pressure, \
            "weak obstacle implemented for the DGP pressure pair"
        mesh = self.mesh
        dim, k = self.dim, self.u_degree
        nu = self.viscosity
        faces = obstacle_faces(mesh)
        if not faces:
            self._obstacle_cache = None
            return None
        A = (k + 1) ** dim
        m = self.n_ploc
        nqf = self.n_q ** (dim - 1)
        basis = LagrangeBasis(np.asarray(q_nodes_1d(k)))
        qx, qw = gauss(self.n_q)
        sd = self._sd
        S1, D1 = np.asarray(sd.S), np.asarray(sd.D)
        steps = [np.asarray(mesh.axis_steps[d]) if mesh.axis_steps is not None
                 else np.full(mesh.cells[d], mesh.h[d]) for d in range(dim)]
        starts = [np.asarray(mesh.axis_vertices(d))[:-1] for d in range(dim)]
        fmap = getattr(mesh, "vertex_map", None)
        if fmap is not None:
            import jax
            jac_at = jax.vmap(jax.jacfwd(fmap))
        exps = dgp_exponents(dim, self.p_degree)
        dof_strides = np.cumprod(
            [1] + list(self.dof_shape_u[::-1]))[::-1][1:]
        cell_strides = np.cumprod([1] + list(self.cells[::-1]))[::-1][1:]
        a_idx = np.stack(np.meshgrid(*[np.arange(k + 1)] * dim,
                                     indexing="ij"), -1).reshape(A, dim)

        F = len(faces)
        E_uu = np.zeros((F, dim, dim, A, A))
        E_up = np.zeros((F, dim, A, m))
        uidx = np.zeros((F, A), np.int64)
        pidx = np.zeros((F,), np.int64)
        wq_ref = np.ones((self.n_q,) * (dim - 1))
        for i in range(dim - 1):
            shp = [1] * (dim - 1)
            shp[i] = self.n_q
            wq_ref = wq_ref * qw.reshape(shp)
        wq_ref = wq_ref.reshape(nqf)

        for f, (d0, cidx, side) in enumerate(faces):
            edge_x = 1.0 if side == 1 else 0.0
            n_sign = 1.0 if side == 1 else -1.0   # outward from the fluid
            oth = [d for d in range(dim) if d != d0]
            D1e = basis.deriv_matrix(np.array([edge_x]))[0]
            V1e = basis.eval_matrix(np.array([edge_x]))[0]
            hs = [float(steps[d][cidx[d]]) for d in range(dim)]
            # full-cell basis traces at the face quad points: Phi (A, Q),
            # Ghat (dim, A, Q) reference-space
            ev = {d: (S1 if d != d0 else None) for d in range(dim)}
            Phi = np.ones((A, nqf))
            Ghat = np.ones((dim, A, nqf))
            q_idx = np.stack(np.meshgrid(
                *[np.arange(self.n_q) for _ in oth], indexing="ij"),
                -1).reshape(nqf, len(oth)) if dim > 1 else \
                np.zeros((1, 0), np.int64)
            for a in range(A):
                col_v = np.ones(nqf)
                col_g = np.ones((dim, nqf))
                for d in range(dim):
                    ai = a_idx[a, d]
                    if d == d0:
                        v = V1e[ai]
                        g = D1e[ai]
                        col_v *= v
                        for e in range(dim):
                            col_g[e] *= g if e == d0 else v
                    else:
                        j = oth.index(d)
                        vv = S1[q_idx[:, j], ai]
                        gg = D1[q_idx[:, j], ai]
                        col_v *= vv
                        for e in range(dim):
                            col_g[e] *= gg if e == d else vv
                Phi[a] = col_v
                Ghat[:, a, :] = col_g
            # geometry at the face points
            if fmap is not None:
                axes_pos = [np.array([starts[d][cidx[d]] + hs[d] * edge_x])
                            if d == d0 else starts[d][cidx[d]] + hs[d] * qx
                            for d in range(dim)]
                grid = np.meshgrid(*axes_pos, indexing="ij")
                pts = np.stack(grid, -1).reshape(nqf, dim)
                Jm = np.asarray(jac_at(jnp.asarray(pts)))
                J = Jm * np.asarray(hs)[None, None, :]
            else:
                J = np.broadcast_to(np.diag(hs), (nqf, dim, dim)).copy()
            detJ = np.linalg.det(J)
            Jinv = np.linalg.inv(J)                      # (Q, ref, phys)
            wn = n_sign * detJ[:, None] * Jinv[:, d0, :]  # Nanson n ds
            ds_w = np.linalg.norm(wn, axis=1) * wq_ref    # physical weights
            n_unit = wn / np.linalg.norm(wn, axis=1)[:, None]
            # physical gradients and normal derivative per basis function
            Gphys = np.einsum("eaq,qed->adq", Ghat, Jinv)
            Gn = np.einsum("adq,qd->aq", Gphys, n_unit)
            # face size for the penalties: physical area^(1/(dim-1))
            hf = float(np.sum(ds_w)) ** (1.0 / max(dim - 1, 1))
            # pressure modal basis at the face points
            Pqf = np.ones((m, nqf))
            for mi, e_ in enumerate(exps):
                col = np.ones((self.n_q,) * (dim - 1))
                for i, d in enumerate(oth):
                    shp = [1] * (dim - 1)
                    shp[i] = self.n_q
                    col = col * shifted_legendre_value(
                        e_[d], qx).reshape(shp)
                Pqf[mi] = shifted_legendre_value(
                    e_[d0], np.array([edge_x]))[0] * col.reshape(-1)
            PhiW = Phi * ds_w[None]
            mass_f = PhiW @ Phi.T
            adj = Phi @ (Gn * ds_w[None]).T               # (A_test, A_trial)
            for c in range(dim):
                for e in range(dim):
                    blk = (self.gamma2 / hf) * (
                        Phi @ (Phi * (ds_w * n_unit[:, c]
                                      * n_unit[:, e])[None]).T)
                    if c == e:
                        blk = blk + (self.gamma1 / hf) * mass_f \
                            - nu * adj - nu * adj.T
                    E_uu[f, c, e] = blk
                E_up[f, c] = (Phi * (ds_w * n_unit[:, c])[None]) @ Pqf.T
            uidx[f] = ((np.asarray(cidx) * k + a_idx)
                       * dof_strides[None, :]).sum(-1)
            pidx[f] = int((np.asarray(cidx) * cell_strides).sum())
        self._obstacle_cache = dict(
            E_uu=jnp.asarray(E_uu, self.dtype),
            E_up=jnp.asarray(E_up, self.dtype),
            uidx=jnp.asarray(uidx), pidx=jnp.asarray(pidx))
        return self._obstacle_cache

    def apply_nitsche_obstacle(self, u, p):
        """Weak no-slip obstacle contributions (ru_add, rp_add); same weak
        form as apply_nitsche with g = 0, on the (curved) obstacle faces."""
        ob = self._obstacle_face_setup()
        dim = self.dim
        L = u.ndim - dim - 1
        u_flat = u.reshape(u.shape[:L + 1] + (-1,))
        u_loc = u_flat[..., ob["uidx"]]                  # [..., dim, F, A]
        p_flat = p.reshape(p.shape[:p.ndim - dim - 1]
                           + (-1, self.n_ploc))
        p_loc = p_flat[..., ob["pidx"], :]               # [..., F, m]
        ru_loc = (jnp.einsum("fceab,...efb->...cfa", ob["E_uu"], u_loc)
                  + jnp.einsum("fcam,...fm->...cfa", ob["E_up"], p_loc))
        rp_loc = -jnp.einsum("fcam,...cfa->...fm", ob["E_up"], u_loc)
        ru = jnp.zeros_like(u_flat).at[..., ob["uidx"]].add(ru_loc)
        rp = jnp.zeros_like(p_flat).at[..., ob["pidx"], :].add(rp_loc)
        return ru.reshape(u.shape), rp.reshape(p.shape)

    def face_element_matrices(self):
        """Per weak face: (d0, side, Fuu[c] list, Fup, Fpu) -- the Nitsche
        contributions to the boundary-layer cells' element matrices, PER
        LAYER CELL (supports non-uniform tensor meshes).  Fuu[c]:
        (C_layer, A, A); Fup: (C_layer, dim*A, nploc) component-major rows;
        Fpu transposed with the p-row sign (reference compute_matrix_helper
        incl. faces, operators.h:1472-1494)."""
        from ..mesh.fe import shape_data_1d
        dim, k = self.dim, self.u_degree
        nu = self.viscosity
        A = (k + 1) ** dim
        out = []
        sd = shape_data_1d(k, self.n_q)
        for (d0, side) in self.weak_faces:
            fd = self._face_setup(d0, side)
            oth = fd["oth"]
            Qf = self.n_q ** (dim - 1)
            C_layer = int(np.prod([self.cells[d] for d in oth]))
            jxwf = np.asarray(fd["jxw"]).reshape(C_layer, Qf)
            hf = np.asarray(fd["hf"]).reshape(C_layer, 1)
            n_sign = -1.0 if side == 0 else 1.0
            locs = np.stack(np.meshgrid(*([np.arange(k + 1)] * dim),
                                        indexing="ij"), -1).reshape(A, dim)
            edge_loc = 0 if side == 0 else k
            S1 = np.asarray(sd.S)
            D1e = np.asarray(fd["D1edge"])
            tr = np.ones((A, Qf))
            Dn = np.ones((A, Qf))
            q_idx = np.stack(np.meshgrid(*([np.arange(self.n_q)] * (dim - 1)),
                                         indexing="ij"), -1).reshape(Qf,
                                                                     dim - 1)
            for a in range(A):
                t_a = 1.0 if locs[a, d0] == edge_loc else 0.0
                d_a = D1e[locs[a, d0]] * n_sign / fd["h0"]
                prof_t = np.full(Qf, t_a)
                prof_d = np.full(Qf, d_a)
                for i, d in enumerate(oth):
                    vals = S1[q_idx[:, i], locs[a, d]]
                    prof_t = prof_t * vals
                    prof_d = prof_d * vals
                tr[a] = prof_t
                Dn[a] = prof_d
            n_pl = self.n_ploc_cell
            if self.dg_pressure:
                Pqf = np.asarray(fd["Pqf"]).reshape(self.n_ploc, Qf)
            else:
                # nodal FE_Q pressure trace of the cell-local basis
                kp = self.p_degree
                Sp1 = np.asarray(shape_data_1d(kp, self.n_q).S)
                locsp = np.stack(np.meshgrid(*([np.arange(kp + 1)] * dim),
                                             indexing="ij"),
                                 -1).reshape(n_pl, dim)
                edge_locp = 0 if side == 0 else kp
                Pqf = np.ones((n_pl, Qf))
                for a in range(n_pl):
                    prof = np.full(Qf, 1.0 if locsp[a, d0] == edge_locp
                                   else 0.0)
                    for i, d in enumerate(oth):
                        prof = prof * Sp1[q_idx[:, i], locsp[a, d]]
                    Pqf[a] = prof
            Fuu = []
            for c in range(dim):
                g = self.gamma1 / hf + (self.gamma2 / hf if c == d0 else 0.0)
                pen = np.einsum("cq,aq,bq->cab", jxwf, tr, tr) * g[:, :,
                                                                   None]
                con = (np.einsum("cq,aq,bq->cab", jxwf, tr, Dn)
                       + np.einsum("cq,aq,bq->cab", jxwf, Dn, tr))
                Fuu.append(pen - nu * con)
            Fup = np.zeros((C_layer, dim * A, n_pl))
            Fpu = np.zeros((C_layer, n_pl, dim * A))
            blk = np.einsum("cq,aq,mq->cam", jxwf, tr, Pqf) * n_sign
            Fup[:, d0 * A:(d0 + 1) * A, :] = blk          # + p n . v
            Fpu[:, :, d0 * A:(d0 + 1) * A] = -np.transpose(blk, (0, 2, 1))
            out.append((d0, side, [jnp.asarray(m, self.dtype) for m in Fuu],
                        jnp.asarray(Fup, self.dtype),
                        jnp.asarray(Fpu, self.dtype)))
        return out

    # -- CIP interior-face convective stabilization -------------------------
    # (reference do_face_integral_local, operators.h:1605-1633: jump penalty
    #  delta_K = delta0 h^2/pa (b.n)^2 on [grad u . n] across interior faces;
    #  the coefficient velocity b is the LINEARIZATION state here -- the
    #  reference evaluates it from the trial function, which is only
    #  meaningful inside a nonlinear application; delta0 = 0 in every shipped
    #  convergence config.)
    def apply_cip(self, u, u_lin, delta0: float):
        """Returns the stabilization contribution to ru (same shape as u)."""
        dim, k = self.dim, self.u_degree
        from ..mesh.fe import q_nodes_1d
        from ..time.quadrature import LagrangeBasis, gauss
        basis = LagrangeBasis(np.asarray(q_nodes_1d(k)))
        D_at1 = jnp.asarray(basis.deriv_matrix(np.array([1.0]))[0],
                            self.dtype)
        D_at0 = jnp.asarray(basis.deriv_matrix(np.array([0.0]))[0],
                            self.dtype)
        V_at1 = jnp.asarray(basis.eval_matrix(np.array([1.0]))[0], self.dtype)
        pa = k ** 3 * np.sqrt(k)
        ru = jnp.zeros(u.shape, self.dtype)
        L = u.ndim - dim - 1
        for d0 in range(dim):
            nc = self.cells[d0]
            if nc < 2:
                continue
            h0 = float(self.mesh.h[d0])
            oth = [d for d in range(dim) if d != d0]
            hf = float(np.prod([self.mesh.h[d] for d in oth])) ** (
                1.0 / max(dim - 1, 1))
            delta_K = delta0 * hf * hf / pa
            # plane dof indices: k, 2k, ..., (nc-1)k along axis d0
            for c in range(dim):
                uc = jnp.take(u, c, axis=L)
                ulc = jnp.take(u_lin, c, axis=L) if u_lin is not None else uc
                # layers: left cell of each interior plane spans
                # [(j)k ... (j+1)k], right cell [(j+1)k ... (j+2)k]
                # normal derivative traces at the shared plane
                mv = jnp.moveaxis(uc, L + d0, 0)
                n_dof = mv.shape[0]
                # gather per interior plane j=0..nc-2: left layer start j*k
                lidx = np.arange(nc - 1)[:, None] * k + np.arange(k + 1)
                ridx = lidx + k
                left = mv[jnp.asarray(lidx.reshape(-1))].reshape(
                    (nc - 1, k + 1) + mv.shape[1:])
                right = mv[jnp.asarray(ridx.reshape(-1))].reshape(
                    (nc - 1, k + 1) + mv.shape[1:])
                dn_l = jnp.tensordot(D_at1 / h0, left, axes=(0, 1))
                dn_r = jnp.tensordot(D_at0 / h0, right, axes=(0, 1))
                jump = dn_l - dn_r              # [(nc-1), lead, dofs_oth]
                # (b.n)^2 coefficient at the face (values of comp d0)
                mb = jnp.moveaxis(
                    jnp.take(u_lin if u_lin is not None else u, d0, axis=L),
                    L + d0, 0)
                bl = mb[jnp.asarray(lidx.reshape(-1))].reshape(
                    (nc - 1, k + 1) + mb.shape[1:])
                bn = jnp.tensordot(V_at1, bl, axes=(0, 1))
                coef = delta_K * bn * bn
                # test-function distribution: same traces transposed, with
                # the oth-axes treated nodally (GLL trace is interpolatory;
                # the face integral over oth axes uses the lumped GLL rule --
                # consistent penalty, documented quadrature simplification)
                w_oth = float(np.prod([self.mesh.h[d] for d in oth]))
                t = coef * jump * w_oth
                addl = jnp.einsum("a,p...->pa...", D_at1 / h0, t)
                addr = jnp.einsum("a,p...->pa...", -D_at0 / h0, t)
                upd = jnp.zeros(mv.shape, self.dtype)
                upd = upd.at[jnp.asarray(lidx.reshape(-1))].add(
                    addl.reshape((-1,) + mv.shape[1:]))
                upd = upd.at[jnp.asarray(ridx.reshape(-1))].add(
                    addr.reshape((-1,) + mv.shape[1:]))
                upd = jnp.moveaxis(upd, 0, L + d0)
                ru = ru.at[(..., c) + (slice(None),) * dim].add(upd)
        return ru * self.mask_u

    # -- outflow backflow stabilization -------------------------------------
    def apply_backflow(self, u, u_lin, beta: float):
        """Bertoglio-Caiazzo backflow value term on do-nothing outflow faces:
        ru_c += int_F -0.5*beta*b_c*(u.n) v_c with b the linearization
        velocity (reference do_boundary_face_integral_local outflow branch,
        operators.h:1680-1714; only active when nonlinear and
        outflowPenalty != 0 -- the gradient part there is multiplied by a
        literal 0.0 and is therefore dead)."""
        dim = self.dim
        b_src = u_lin if u_lin is not None else u
        ru = jnp.zeros(u.shape, self.dtype)
        L = u.ndim - dim - 1
        for (d0, side) in self.free_faces:
            fs = self._face_setup(d0, side)
            oth = fs["oth"]
            n_sign = -1.0 if side == 0 else 1.0
            idx = [slice(None)] * dim
            idx[d0] = 0 if side == 0 else -1

            def plane(field, c):
                return field[(Ellipsis, c) + tuple(idx)]

            un = n_sign * self._trace_eval(plane(u, d0), oth)
            for c in range(dim):
                bc = self._trace_eval(plane(b_src, c), oth)
                t = -0.5 * beta * bc * un * fs["jxw"]
                add = self._trace_integrate(t, oth)
                ru = ru.at[(Ellipsis, c) + tuple(idx)].add(add)
        return ru * self.mask_u
