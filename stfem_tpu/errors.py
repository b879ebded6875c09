"""Space-time error norms: L2(L2), Linf(Linf), L2(H1-semi) (+ optional
Hdiv-semi for vector fields), matching the reference ErrorCalculator
(include/exact_solution.h:503-649):

For each timestep in the slab and each Gauss point of QGauss(time_degree+1)
on the unit interval, reconstruct u_h(t) from the block vector (CGP prepends
the step's start value), evaluate cell-wise errors at the spatial
QGauss(space_degree+1) rule against the exact solution, and accumulate
  err_L2  += tau * w_q * ||e||_L2^2,  err_Linf = max |e|,
  err_H1  += tau * w_q * |e|_H1^2.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mesh.fe import shape_data_1d
from .mesh.grid import StructuredMesh
from .ops.spatial import cell_gather, _sumfac
from .time.quadrature import gauss
from .time.tables import get_time_basis
from .types import TimeStepType


def quad_coordinates(mesh: StructuredMesh, n_q: int) -> np.ndarray:
    """Physical coordinates of the tensor Gauss points, [*cells, *q, dim]."""
    qx, _ = gauss(n_q)
    dim = mesh.dim
    out = np.zeros(mesh.cells + (n_q,) * dim + (dim,))
    for d in range(dim):
        if getattr(mesh, "axis_steps", None) is not None:
            v = mesh.axis_vertices(d)
            pos = v[:-1, None] + np.diff(v)[:, None] * qx[None, :]
        else:
            pos = (mesh.lower[d] + mesh.h[d]
                   * (np.arange(mesh.cells[d])[:, None] + qx[None, :]))
        shape = [1] * (2 * dim)
        shape[d] = mesh.cells[d]
        shape[dim + d] = n_q
        out[..., d] = pos.reshape(shape)
    return out


class SpatialEvaluator:
    """Evaluate a dof-grid field (values + physical gradients) at the tensor
    Gauss quadrature points.  Handles all three geometry paths (Cartesian,
    non-uniform tensor steps, fully distorted trilinear cells), mirroring the
    reference's mapped FEValues evaluation (exact_solution.h:503-649 runs on
    any Mapping)."""

    def __init__(self, mesh: StructuredMesh, degree: int, n_q: int,
                 dtype=jnp.float64):
        self.mesh = mesh
        self.degree = degree
        self.n_q = n_q
        self.dim = mesh.dim
        sd = shape_data_1d(degree, n_q)
        self.S = jnp.asarray(sd.S, dtype)
        self.D = jnp.asarray(sd.D, dtype)
        geom = mesh.geometry(n_q, degree)
        self.jxw = jnp.asarray(geom.jxw, dtype)
        self.jinv = None
        self.jinv_diag = None
        self.jinv_axis = None
        if geom.jinv is not None:          # distorted: full per-quad Jinv
            self.jinv = jnp.asarray(geom.jinv, dtype)
            self.coords = jnp.asarray(geom.points, dtype)
            return
        if geom.jinv_diag is not None:     # Cartesian (possibly masked)
            self.jinv_diag = jnp.asarray(geom.jinv_diag, dtype)
        else:                              # non-uniform tensor steps
            jfac = []
            for e in range(self.dim):
                shape = [1] * (2 * self.dim)
                shape[e] = mesh.cells[e]
                jfac.append(jnp.asarray(geom.jinv_axis[e],
                                        dtype).reshape(shape))
            self.jinv_axis = jfac
        self.coords = jnp.asarray(quad_coordinates(mesh, n_q), dtype)

    def values(self, u: jnp.ndarray) -> jnp.ndarray:
        uc = cell_gather(u, self.mesh.cells, self.degree)
        return _sumfac([self.S] * self.dim, uc, self.dim)

    def gradients(self, u: jnp.ndarray) -> jnp.ndarray:
        """[..., *cells, *q, dim] physical gradients."""
        uc = cell_gather(u, self.mesh.cells, self.degree)
        ref = []
        for e in range(self.dim):
            mats = [self.D if d == e else self.S for d in range(self.dim)]
            ref.append(_sumfac(mats, uc, self.dim))
        if self.jinv is not None:
            # d u / d x_d = sum_e (d u / d xi_e) jinv[..., e, d]
            g = jnp.stack(ref, axis=-1)
            return jnp.einsum("...e,...ed->...d", g, self.jinv)
        if self.jinv_diag is not None:
            comps = [ref[e] * self.jinv_diag[e] for e in range(self.dim)]
        else:
            comps = [ref[e] * self.jinv_axis[e] for e in range(self.dim)]
        return jnp.stack(comps, axis=-1)


class ErrorCalculator:
    """Reference include/exact_solution.h:503-649 for scalar fields."""

    def __init__(self, mesh: StructuredMesh, type_: TimeStepType,
                 time_degree: int, space_degree: int,
                 exact_fn, exact_grad_fn, dtype=jnp.float64,
                 n_q: int | None = None):
        self.type_ = type_
        self.nt_dofs = (time_degree + 1 if type_ == TimeStepType.DG
                        else time_degree)
        self.time_basis = get_time_basis(type_, time_degree)
        tq, tw = gauss(time_degree + 1)
        self.tq, self.tw = tq, tw
        # basis values at the time quadrature points
        self.phi_at_tq = self.time_basis.eval_matrix(tq)  # (n_tq, r+1|r+1)
        # NOTE: the reference constructs its ErrorCalculator with
        # space_degree = TIME degree (tp_01.cc:809-815), i.e. the error norms
        # are integrated with QGauss(time_degree+1) -- match that by passing
        # the same n_q here.
        if n_q is None:
            n_q = space_degree + 1
        self.ev = SpatialEvaluator(mesh, space_degree, n_q, dtype)
        self.exact_fn = exact_fn
        self.exact_grad_fn = exact_grad_fn

    def reconstruct(self, tq_idx: int, x: jnp.ndarray, prev: jnp.ndarray,
                    block_offset: int) -> jnp.ndarray:
        """u_h(t_q) from the slab blocks (reference tp_01.cc:409-432)."""
        phi = self.phi_at_tq[tq_idx]
        is_cgp = self.type_ == TimeStepType.CGP
        u = jnp.zeros_like(prev)
        for i, v in enumerate(phi):
            if v == 0.0:
                continue
            if is_cgp:
                blk = prev if (block_offset + i == 0) \
                    else x[block_offset + i - 1]
            else:
                blk = x[block_offset + i]
            u = u + v * blk
        return u

    def evaluate_error(self, time: float, time_step: float, x: jnp.ndarray,
                       prev: jnp.ndarray, n_timesteps_at_once: int) -> dict:
        """Returns dict with keys 'l2' (squared, time-integrated), 'linf',
        'h1_semi' (squared)."""
        l2 = 0.0
        linf = -1.0
        h1 = 0.0
        for it in range(n_timesteps_at_once):
            step_prev = prev if it == 0 else x[self.nt_dofs * it - 1]
            for q in range(len(self.tq)):
                t = time + time_step * it + self.tq[q] * time_step
                u = self.reconstruct(q, x, step_prev, self.nt_dofs * it)
                uq = self.ev.values(u)
                gq = self.ev.gradients(u)
                ue = self.exact_fn(self.ev.coords, t)
                ge = self.exact_grad_fn(self.ev.coords, t)
                diff = uq - ue
                l2_t = jnp.sum(self.ev.jxw * diff ** 2)
                linf_t = jnp.max(jnp.abs(diff))
                h1_t = jnp.sum(self.ev.jxw
                               * jnp.sum((gq - ge) ** 2, axis=-1))
                l2 = l2 + time_step * self.tw[q] * l2_t
                h1 = h1 + time_step * self.tw[q] * h1_t
                linf = jnp.maximum(linf, linf_t)
        return {"l2": l2, "linf": linf, "h1_semi": h1}
