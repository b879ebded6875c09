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


class PointEvaluator:
    """Evaluate a dof-grid field at fixed physical points (Cartesian mesh)."""

    def __init__(self, mesh: StructuredMesh, degree: int, points):
        assert mesh._vertices is None, "point probes on distorted mesh: TODO"
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
