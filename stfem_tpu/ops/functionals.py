"""Surface and volume functionals: drag/lift over obstacle faces and the
divergence norm (reference StokesMatrixFreeOperator::compute_drag_lift /
compute_divergence, operators.h:1344-1439)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..mesh.fe import q_nodes_1d, shape_data_1d
from ..time.quadrature import LagrangeBasis, gauss
from .spatial import _sumfac, cell_gather
from .stokes import StokesOperator


def obstacle_faces(mesh):
    """All interior faces between active and removed cells:
    list of (axis d, cell index of the ACTIVE cell, side) where side=1 means
    the obstacle is on the + side of the active cell."""
    cm = mesh.cell_mask
    assert cm is not None
    out = []
    dim = mesh.dim
    for d in range(dim):
        sl_lo = [slice(None)] * dim
        sl_hi = [slice(None)] * dim
        sl_lo[d] = slice(0, -1)
        sl_hi[d] = slice(1, None)
        diff = cm[tuple(sl_lo)] - cm[tuple(sl_hi)]
        for idx in np.argwhere(diff == 1.0):   # active | inactive
            out.append((d, tuple(idx), 1))
        for idx in np.argwhere(diff == -1.0):  # inactive | active
            jdx = list(idx)
            jdx[d] += 1
            out.append((d, tuple(jdx), 0))
    return out


def compute_drag_lift(S: StokesOperator, u, p, scale: float) -> np.ndarray:
    """F = scale * sum over obstacle faces of int [p n - nu (grad u +
    grad u^T) n];  n = outward from the fluid (into the obstacle).

    Dispatches to the curved-geometry path for vertex-mapped meshes
    (DFG cylinder); reference compute_drag_lift operators.h:1344-1389."""
    mesh = S.mesh
    if getattr(mesh, "vertex_map", None) is not None:
        return compute_drag_lift_mapped(S, u, p, scale)
    dim, k = S.dim, S.u_degree
    nu = S.viscosity
    from ..mesh.fe_dgp import dgp_exponents, shifted_legendre_value
    basis = LagrangeBasis(np.asarray(q_nodes_1d(k)))
    qx, qw = gauss(S.n_q)
    sd = shape_data_1d(k, S.n_q)
    S1 = np.asarray(sd.S)
    F = np.zeros(dim)
    u_np = np.asarray(u)
    p_np = np.asarray(p)
    for (d0, cidx, side) in obstacle_faces(mesh):
        # trace on the active cell's face at local coord 0/1 of THAT cell
        edge_x = 1.0 if side == 1 else 0.0
        n_sign = 1.0 if side == 1 else -1.0   # outward from fluid
        oth = [d for d in range(dim) if d != d0]
        D1e = basis.deriv_matrix(np.array([edge_x]))[0]
        V1e = basis.eval_matrix(np.array([edge_x]))[0]
        # cell-local dofs of the active cell
        sl = tuple(slice(cidx[d] * k, cidx[d] * k + k + 1)
                   for d in range(dim))
        hs = [float(mesh.axis_steps[d][cidx[d]])
              if mesh.axis_steps is not None else float(mesh.h[d])
              for d in range(dim)]
        # face quadrature weights
        wq = np.ones((S.n_q,) * (dim - 1))
        for i, d in enumerate(oth):
            shp = [1] * (dim - 1)
            shp[i] = S.n_q
            wq = wq * (qw * hs[d]).reshape(shp)
        # grad u at the face quad points (per component c, direction e)
        grads = np.zeros((dim, dim) + (S.n_q,) * (dim - 1))
        vals_p = None
        for c in range(dim):
            loc = u_np[c][sl]
            for e in range(dim):
                vec = D1e / hs[d0] if e == d0 else V1e
                arr = np.tensordot(vec, loc, axes=(0, d0))
                # arr keeps the oth axes in order; evaluate along them
                for i, d in enumerate(oth):
                    m = np.asarray(sd.D) / hs[d] if d == e else S1
                    arr = np.moveaxis(
                        np.tensordot(m, arr, axes=(1, i)), 0, i)
                grads[c, e] = arr
        # pressure trace: modal of the active cell at (edge, q_oth)
        exps = dgp_exponents(dim, S.p_degree)
        Pq = np.ones((len(exps),) + (S.n_q,) * (dim - 1))
        for m_, e_ in enumerate(exps):
            Pq[m_] *= shifted_legendre_value(e_[d0], np.array([edge_x]))[0]
            for i, d in enumerate(oth):
                shp = [1] * (dim - 1)
                shp[i] = S.n_q
                Pq[m_] = Pq[m_] * shifted_legendre_value(
                    e_[d], qx).reshape(shp)
        pq = np.tensordot(p_np[cidx], Pq, axes=(0, 0))
        # tau = p n - nu (grad u + grad u^T) n; n = n_sign e_{d0}
        for c in range(dim):
            tau_c = -nu * (grads[c, d0] + grads[d0, c]) * n_sign
            if c == d0:
                tau_c = tau_c + pq * n_sign
            F[c] += float(np.sum(wq * tau_c))
    return scale * F


def compute_drag_lift_mapped(S: StokesOperator, u, p,
                             scale: float) -> np.ndarray:
    """Drag/lift over the CURVED obstacle boundary of a vertex-mapped mesh
    (DFG cylinder): base-grid face quadrature pushed through the analytic
    map; the weighted outward normal comes from Nanson's formula
    n ds = detJ J^{-T} n_ref dxi."""
    assert S.dg_pressure, \
        "compute_drag_lift_mapped assumes DGP modal pressure; FE_Q nodal " \
        "pressure on mapped meshes needs a nodal-trace branch"
    import jax
    import jax.numpy as jnp
    mesh = S.mesh
    dim, k = S.dim, S.u_degree
    nu = S.viscosity
    from ..mesh.fe_dgp import dgp_exponents, shifted_legendre_value
    basis = LagrangeBasis(np.asarray(q_nodes_1d(k)))
    qx, qw = gauss(S.n_q)
    sd = shape_data_1d(k, S.n_q)
    S1 = np.asarray(sd.S)
    D1 = np.asarray(sd.D)
    fmap = mesh.vertex_map
    jac_at = jax.vmap(jax.jacfwd(fmap))
    steps = mesh._axis_steps_arrays()
    starts = [mesh.axis_vertices(d)[:-1] for d in range(dim)]
    F = np.zeros(dim)
    u_np = np.asarray(u)
    p_np = np.asarray(p)
    nq_face = S.n_q ** (dim - 1)
    for (d0, cidx, side) in obstacle_faces(mesh):
        edge_x = 1.0 if side == 1 else 0.0
        n_sign = 1.0 if side == 1 else -1.0
        oth = [d for d in range(dim) if d != d0]
        D1e = basis.deriv_matrix(np.array([edge_x]))[0]
        V1e = basis.eval_matrix(np.array([edge_x]))[0]
        sl = tuple(slice(cidx[d] * k, cidx[d] * k + k + 1)
                   for d in range(dim))
        hs = [float(steps[d][cidx[d]]) for d in range(dim)]
        # base coordinates of the face quadrature points
        axes_pos = []
        for d in range(dim):
            if d == d0:
                axes_pos.append(np.array(
                    [starts[d][cidx[d]] + hs[d] * edge_x]))
            else:
                axes_pos.append(starts[d][cidx[d]] + hs[d] * qx)
        grid = np.meshgrid(*axes_pos, indexing="ij")
        pts_base = np.stack(grid, axis=-1).reshape(nq_face, dim)
        Jm = np.asarray(jac_at(jnp.asarray(pts_base)))   # (Q, dx, dbase)
        J = Jm * np.asarray(hs)[None, None, :]           # chain: dxi -> dx
        detJ = np.linalg.det(J)
        Jinv = np.linalg.inv(J)                          # (Q, dxi, dx)
        # weighted outward normal (Nanson): n ds = n_sign detJ Jinv[d0,:] dxi
        wn = n_sign * detJ[:, None] * Jinv[:, d0, :]     # (Q, dim)
        # reference gradients of u at the face points -> physical via Jinv
        gphys = np.zeros((dim, dim, nq_face))            # [c, d, q]
        for c in range(dim):
            loc = u_np[c][sl]
            ghat = np.zeros((dim, nq_face))
            for e in range(dim):
                vec = D1e if e == d0 else V1e
                arr = np.tensordot(vec, loc, axes=(0, d0))
                for i, d in enumerate(oth):
                    m = D1 if d == e else S1
                    arr = np.moveaxis(
                        np.tensordot(m, arr, axes=(1, i)), 0, i)
                ghat[e] = arr.reshape(-1)
            gphys[c] = np.einsum("eq,qed->dq", ghat, Jinv).reshape(
                dim, nq_face)
        # pressure trace (modal DGP on the base reference cell)
        exps = dgp_exponents(dim, S.p_degree)
        Pq = np.ones((len(exps), nq_face))
        for m_, e_ in enumerate(exps):
            col = np.ones((S.n_q,) * (dim - 1))
            for i, d in enumerate(oth):
                shp = [1] * (dim - 1)
                shp[i] = S.n_q
                col = col * shifted_legendre_value(e_[d], qx).reshape(shp)
            Pq[m_] = (shifted_legendre_value(e_[d0],
                                             np.array([edge_x]))[0]
                      * col.reshape(-1))
        pq = np.tensordot(p_np[cidx], Pq, axes=(0, 0))   # (Q,)
        wq = np.ones((S.n_q,) * (dim - 1))
        for i in range(dim - 1):
            shp = [1] * (dim - 1)
            shp[i] = S.n_q
            wq = wq * qw.reshape(shp)
        wq = wq.reshape(nq_face)
        for c in range(dim):
            tau_c = pq * wn[:, c] - nu * sum(
                (gphys[c][d] + gphys[d][c]) * wn[:, d] for d in range(dim))
            F[c] += float(np.sum(wq * tau_c))
    return scale * F


def compute_wall_force(S: StokesOperator, u, p, face, scale: float = 1.0
                       ) -> np.ndarray:
    """Traction integral over a DOMAIN-BOUNDARY plane (axis d0, side):
    F = scale * int_face [p n - nu (grad u + grad u^T) n], n outward.
    The lid-driven practical config reports forces on the moving wall
    (reference compute_drag_lift over a boundary id, operators.h:1344-1389).
    Uniform Cartesian meshes (the lid cavity grid)."""
    import jax.numpy as jnp
    d0, side = face
    mesh = S.mesh
    assert mesh.axis_steps is None and getattr(mesh, "_vertices", None) \
        is None, "wall force implemented for uniform Cartesian meshes"
    assert S.dg_pressure
    dim, k = S.dim, S.u_degree
    nu = S.viscosity
    from ..mesh.fe_dgp import dgp_exponents, shifted_legendre_value
    basis = LagrangeBasis(np.asarray(q_nodes_1d(k)))
    qx, qw = gauss(S.n_q)
    edge_x = 0.0 if side == 0 else 1.0
    n_sign = -1.0 if side == 0 else 1.0
    oth = [d for d in range(dim) if d != d0]
    D1e = jnp.asarray(basis.deriv_matrix(np.array([edge_x]))[0], S.dtype)
    eidx = 0 if side == 0 else -1
    grid_sl = [slice(None)] * dim
    grid_sl[d0] = eidx
    layer_sl = [slice(None)] * dim
    layer_sl[d0] = slice(0, k + 1) if side == 0 else slice(-(k + 1), None)
    u = jnp.asarray(u)
    # grads[c][e] at the face quad points, [*cells_oth, *q_oth]
    grads = []
    for c in range(dim):
        uf = u[c][tuple(grid_sl)]
        ul = u[c][tuple(layer_sl)]
        dn = jnp.tensordot(D1e, jnp.moveaxis(ul, d0, 0), axes=(0, 0)) \
            / mesh.h[d0]
        ge = []
        for e in range(dim):
            if e == d0:
                ge.append(S._trace_eval(dn, oth))
            else:
                j = oth.index(e)
                mats = [S.D / mesh.h[d] if d == e else S.S for d in oth]
                from .spatial import _sumfac, cell_gather as _cg
                fc = _cg(uf, tuple(mesh.cells[d] for d in oth), k)
                ge.append(_sumfac(mats, fc, dim - 1))
        grads.append(ge)
    # pressure trace (DGP modal of the boundary cell layer)
    exps = dgp_exponents(dim, S.p_degree)
    cell_sl = [slice(None)] * dim
    cell_sl[d0] = eidx
    p_b = np.asarray(p)[tuple(cell_sl)]
    Pq = np.ones((len(exps),) + (S.n_q,) * (dim - 1))
    for m_, e_ in enumerate(exps):
        Pq[m_] *= shifted_legendre_value(e_[d0], np.array([edge_x]))[0]
        for i, d in enumerate(oth):
            shp = [1] * (dim - 1)
            shp[i] = S.n_q
            Pq[m_] = Pq[m_] * shifted_legendre_value(e_[d], qx).reshape(shp)
    pq = np.tensordot(p_b, Pq, axes=(-1, 0))
    wq = np.ones((S.n_q,) * (dim - 1))
    for i, d in enumerate(oth):
        shp = [1] * (dim - 1)
        shp[i] = S.n_q
        wq = wq * (qw * mesh.h[d]).reshape(shp)
    F = np.zeros(dim)
    for c in range(dim):
        tau_c = -nu * (np.asarray(grads[c][d0]) + np.asarray(grads[d0][c])) \
            * n_sign
        if c == d0:
            tau_c = tau_c + pq * n_sign
        F[c] = np.sum(wq * tau_c)
    return scale * F


def compute_divergence_norm(S: StokesOperator, u) -> float:
    """sqrt(int_Omega (div u)^2) over active cells
    (reference operators.h:1391-1439)."""
    from .stokes import _sumfac
    dim, k = S.dim, S.u_degree
    div_q = 0.0
    for c in range(dim):
        uc = cell_gather(u[c] * S.mask_u, S.cells, k)
        if S.jinv is None:
            # Cartesian/diagonal geometry: only d(u_c)/dx_c is needed --
            # one sum-factorization sweep per component instead of dim
            mats = [S.D if d == c else S.S for d in range(dim)]
            div_q = div_q + _sumfac(mats, uc, dim) * S.jfac[c]
            continue
        div_q = div_q + S._grad_phys(uc)[c]
    val = jnp.sum(S.jxw * div_q ** 2)
    return float(jnp.sqrt(val))
