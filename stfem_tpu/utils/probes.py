"""Point probes and functionals output.

Replaces the reference's RemotePointEvaluation + dense time-resampling
(tests/tp_01.cc:449-481, 584-635): on a structured Cartesian mesh a physical
point maps to (cell, reference coords) arithmetically, so point evaluation is
a tiny dense contraction -- no communication, no search trees.
"""
from __future__ import annotations

import numpy as np

from ..mesh.fe import q_nodes_1d
from ..mesh.grid import StructuredMesh
from ..time.quadrature import LagrangeBasis
from ..time.tables import get_time_basis, get_time_evaluation_matrix
from ..types import TimeStepType


def _locate_in_distorted(mesh: StructuredMesh, p: np.ndarray):
    """(cell index tuple, reference coords) of a physical point on a
    vertex-distorted mesh: per-cell Newton inversion of the Q1 (multilinear)
    cell map -- the replacement for the reference's RemotePointEvaluation
    search tree (tp_01.cc:455-456) on the structured grid."""
    dim = mesh.dim
    verts = mesh._vertices
    corners_b = list(np.ndindex(*((2,) * dim)))
    # candidate order: nearest undistorted cell first, then all cells
    guess = tuple(int(np.clip((p[d] - mesh.lower[d]) / mesh.h[d], 0,
                              mesh.cells[d] - 1)) for d in range(dim))
    cands = [guess] + [c for c in np.ndindex(*mesh.cells) if c != guess]
    for cidx in cands:
        V = np.stack([verts[tuple(np.add(cidx, b))] for b in corners_b])
        xi = np.full(dim, 0.5)
        ok = False
        for _ in range(30):
            w = np.ones(len(corners_b))
            dw = np.ones((dim, len(corners_b)))
            for d in range(dim):
                f = np.array([xi[d] if b[d] else 1.0 - xi[d]
                              for b in corners_b])
                g = np.array([1.0 if b[d] else -1.0 for b in corners_b])
                w = w * f
                for e in range(dim):
                    dw[e] = dw[e] * (g if e == d else f)
            x = w @ V
            J = dw @ V                      # (dim_xi, dim_x)
            try:
                dxi = np.linalg.solve(J.T, p - x)
            except np.linalg.LinAlgError:
                break
            xi = xi + dxi
            if np.linalg.norm(dxi) < 1e-13:
                ok = True
                break
        if ok and np.all(xi > -1e-10) and np.all(xi < 1 + 1e-10):
            return cidx, np.clip(xi, 0.0, 1.0)
    raise ValueError(f"probe point {p} not found in the distorted mesh")


class PointEvaluator:
    """Evaluate a dof-grid field at fixed physical points.

    Cartesian meshes: arithmetic cell lookup.  Vertex-distorted meshes:
    Newton inversion of the Q1 cell map (consistent with dof_coordinates'
    Q1-mapped node placement)."""

    def __init__(self, mesh: StructuredMesh, degree: int, points):
        self.mesh = mesh
        self.degree = degree
        pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
        self.points = pts
        dim = mesh.dim
        basis = LagrangeBasis(np.asarray(q_nodes_1d(degree)))
        # per point: owning cell + per-axis basis values at the local coord
        self.cells_of_point = []
        self.weights = []  # list of per-axis (degree+1,) arrays
        for p in pts:
            if mesh._vertices is not None:
                ci, xi = _locate_in_distorted(mesh, p)
                ci = list(ci)
                w = [basis.eval_matrix(np.array([xi[d]]))[0]
                     for d in range(dim)]
            else:
                ci = []
                w = []
                for d in range(dim):
                    c = int(np.clip((p[d] - mesh.lower[d]) / mesh.h[d], 0,
                                    mesh.cells[d] - 1))
                    xi = (p[d] - mesh.lower[d]) / mesh.h[d] - c
                    ci.append(c)
                    w.append(basis.eval_matrix(np.array([xi]))[0])
            self.cells_of_point.append(ci)
            self.weights.append(w)

    def __call__(self, u) -> np.ndarray:
        """u: [*dofshape] -> values at the probe points."""
        u = np.asarray(u)
        k = self.degree
        out = np.zeros(len(self.points))
        for i, (ci, w) in enumerate(zip(self.cells_of_point, self.weights)):
            sl = tuple(slice(c * k, c * k + k + 1) for c in ci)
            loc = u[sl]
            for d in range(self.mesh.dim):
                loc = np.tensordot(w[d], loc, axes=(0, 0))
            out[i] = loc
        return out


class FunctionalsWriter:
    """Appends time-resampled point values to a functionals file in the
    reference's format (tp_01.cc:618-631): per sample row
    't  v(p1) v(p2) ...' in scientific notation, blank line between slabs."""

    def __init__(self, path: str, type_: TimeStepType, time_degree: int,
                 samples_per_interval: int | None = None):
        self.path = path
        self.type_ = type_
        self.nt_dofs = (time_degree + 1 if type_ == TimeStepType.DG
                        else time_degree)
        if samples_per_interval is None:
            samples_per_interval = (time_degree + 1) ** 2
        self.samples = samples_per_interval
        basis = get_time_basis(type_, time_degree)
        self.evaluator = get_time_evaluation_matrix(basis, samples_per_interval)
        self.is_cgp = type_ == TimeStepType.CGP

    def write_step(self, time: float, time_step: float,
                   values_per_tdof: np.ndarray,
                   prev_values: np.ndarray | None = None):
        """values_per_tdof: (nt_dofs, n_points) point values of the step's
        time dofs; prev_values: values at the step start (CGP only)."""
        vals = np.asarray(values_per_tdof)
        if self.is_cgp:
            assert prev_values is not None
            vals = np.vstack([np.atleast_2d(prev_values), vals])
        res = self.evaluator @ vals  # (samples, n_points)
        step = 1.0 / (self.samples - 1)
        with open(self.path, "a") as f:
            for row in range(res.shape[0]):
                t = time + time_step * row * step
                f.write(f"{t:16.6e}")
                for c in range(res.shape[1]):
                    f.write(f" {res[row, c]:16.6e}")
                f.write("\n")
            f.write("\n")
