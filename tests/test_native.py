"""Native setup runtime (C++/ctypes) vs NumPy fallback parity, plus the VTK
writer."""
import numpy as np

from stfem_tpu.utils import native


def test_band_indices_native_matches_fallback():
    lib = native._load()
    if lib is None:
        import subprocess
        subprocess.run(["make", "-C", "native"], check=True)
        native._TRIED = False
        lib = native._load()
    assert lib is not None, "native library failed to build"
    for cells, k in [((4, 4), 2), ((2, 3), 1), ((2, 2, 2), 2)]:
        native._LIB = lib
        a = native.band_indices(cells, k)
        native._LIB = None
        b = native.band_indices(cells, k)
        native._LIB = lib
        np.testing.assert_array_equal(a, b)
        va = native.dof_valence(cells, k)
        native._LIB = None
        vb = native.dof_valence(cells, k)
        native._LIB = lib
        np.testing.assert_array_equal(va, vb)


def test_vtk_writer(tmp_path):
    from stfem_tpu.mesh.grid import StructuredMesh
    mesh = StructuredMesh([1, 1], [0, 0], [1, 1], refinement=2)
    pts = mesh.dof_coordinates(1)
    vals = np.asarray(pts[..., 0] + pts[..., 1])
    out = tmp_path / "sol.vtk"
    native.write_vtk(str(out), np.asarray(pts), vals)
    data = out.read_bytes()
    assert b"STRUCTURED_GRID" in data
    assert b"DIMENSIONS 5 5 1" in data
