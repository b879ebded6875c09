"""ctypes bindings for the native setup runtime (native/libstfem_setup.so).

Provides multithreaded index-map generation for banded assembly / Vanka
patches, dof valence fields, and a binary VTK structured-grid writer.  Every
entry point has a NumPy fallback so the framework works without the compiled
library (e.g. fresh checkouts before `make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).resolve().parents[2] / "native" / "libstfem_setup.so"
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.stfem_band_indices.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64)]
        lib.stfem_dof_valence.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        lib.stfem_write_vtk.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_char_p]
        lib.stfem_write_vtk.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def band_indices(cells, degree: int) -> np.ndarray:
    """(C, A, A) int64 flat scatter indices for banded assembly."""
    dim = len(cells)
    A = (degree + 1) ** dim
    C = int(np.prod(cells))
    lib = _load()
    if lib is not None:
        out = np.empty(C * A * A, dtype=np.int64)
        carr = (ctypes.c_int64 * dim)(*[int(c) for c in cells])
        lib.stfem_band_indices(
            dim, carr, degree,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out.reshape(C, A, A)
    # NumPy fallback (same math as ops before the native port)
    k = degree
    dof_shape = tuple(c * k + 1 for c in cells)
    n_off = (2 * k + 1) ** dim
    loc = np.stack(np.meshgrid(*([np.arange(k + 1)] * dim), indexing="ij"),
                   -1).reshape(A, dim)
    cell_idx = np.stack(np.meshgrid(*[np.arange(c) for c in cells],
                                    indexing="ij"), -1).reshape(C, dim)
    dof_strides = np.cumprod([1] + list(dof_shape[::-1]))[::-1][1:]
    gidx = ((cell_idx[:, None, :] * k + loc[None, :, :])
            * dof_strides[None, None, :]).sum(-1)
    off = loc[None, :, :] - loc[:, None, :] + k
    off_strides = np.cumprod([1] + [2 * k + 1] * (dim - 1))[::-1]
    off_flat = (off * off_strides[None, None, :]).sum(-1)
    return gidx[:, :, None] * n_off + off_flat[None, :, :]


def dof_valence(cells, degree: int) -> np.ndarray:
    dim = len(cells)
    dof_shape = tuple(c * degree + 1 for c in cells)
    lib = _load()
    if lib is not None:
        out = np.empty(int(np.prod(dof_shape)), dtype=np.float64)
        carr = (ctypes.c_int64 * dim)(*[int(c) for c in cells])
        lib.stfem_dof_valence(
            dim, carr, degree,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out.reshape(dof_shape)
    out = np.ones(dof_shape)
    for d in range(dim):
        ax = np.ones(dof_shape[d])
        if degree > 0:
            ax[degree::degree] = 2.0
            ax[0] = 1.0
            ax[-1] = 1.0
        shape = [1] * dim
        shape[d] = len(ax)
        out = out * ax.reshape(shape)
    return out


def write_vtk(path: str, points: np.ndarray, values: np.ndarray,
              name: str = "u") -> None:
    """Structured-grid VTK dump; points [*, dim], values [*] on the dof grid.
    2D grids are padded with z=0."""
    grid_shape = values.shape
    # VTK wants x varying fastest; Fortran-order raveling makes our axis 0
    # the fastest, so axis 0 becomes VTK's x.
    dims3 = (list(grid_shape) + [1, 1])[:3]
    n = int(np.prod(grid_shape))
    pts_flat = np.asarray(points, dtype=np.float64).reshape(
        grid_shape + (-1,))
    pr = pts_flat.reshape(n, pts_flat.shape[-1], order="F")
    pts3 = np.zeros((n, 3))
    pts3[:, :pr.shape[1]] = pr
    vals = np.asarray(values, dtype=np.float64).reshape(n, order="F")
    lib = _load()
    if lib is not None:
        darr = (ctypes.c_int64 * 3)(*[int(x) for x in dims3])
        r = lib.stfem_write_vtk(
            path.encode(), darr,
            np.ascontiguousarray(pts3).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            np.ascontiguousarray(vals).ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            name.encode())
        if r != 0:
            raise IOError(f"stfem_write_vtk failed for {path}")
        return
    # ASCII fallback
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nstfem_tpu solution\nASCII\n")
        f.write("DATASET STRUCTURED_GRID\n")
        f.write(f"DIMENSIONS {dims3[0]} {dims3[1]} {dims3[2]}\n")
        f.write(f"POINTS {n} double\n")
        for row in pts3:
            f.write(f"{row[0]} {row[1]} {row[2]}\n")
        f.write(f"\nPOINT_DATA {n}\nSCALARS {name} double 1\n"
                "LOOKUP_TABLE default\n")
        for v in vals:
            f.write(f"{v}\n")
