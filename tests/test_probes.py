"""Point evaluation and functionals output."""
import numpy as np

from stfem_tpu.mesh.grid import StructuredMesh
from stfem_tpu.utils.probes import FunctionalsWriter, PointEvaluator
from stfem_tpu.types import TimeStepType


def test_point_evaluator_exact_for_polynomial():
    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=2)
    coords = mesh.dof_coordinates(2)
    u = coords[..., 0] ** 2 + 0.5 * coords[..., 1]  # in Q2
    pe = PointEvaluator(mesh, 2, [[0.75, 0.0], [0.33, 0.77]])
    vals = pe(u)
    np.testing.assert_allclose(vals[0], 0.75 ** 2, rtol=1e-12)
    np.testing.assert_allclose(vals[1], 0.33 ** 2 + 0.5 * 0.77, rtol=1e-12)


def test_functionals_writer(tmp_path):
    f = tmp_path / "fn.txt"
    w = FunctionalsWriter(str(f), TimeStepType.DG, 1, samples_per_interval=3)
    w.write_step(0.0, 0.5, np.array([[1.0], [2.0]]))
    lines = [l for l in f.read_text().split("\n") if l.strip()]
    assert len(lines) == 3
    t0 = float(lines[0].split()[0])
    assert t0 == 0.0
