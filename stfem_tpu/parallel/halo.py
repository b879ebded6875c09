"""Explicit SPMD domain decomposition with ppermute halo exchange.

This is the hand-written counterpart of the GSPMD path in
parallel/sharding.py: the spatial domain is split into contiguous cell slabs
along the first grid axis, each device owns its cell slab plus the SHARED dof
plane at internal interfaces (replicated on both neighbors, like the
reference's ghosted partitioners, SURVEY.md section 2.4).  One operator apply
is then: local sum-factorized sweep + ONE neighbor exchange (jax.lax.ppermute
over the ICI ring) accumulating the interface-plane contributions -- the
direct analogue of deal.II's ghost-value update/compress around cell loops.

Time-direction operations stay embarrassingly parallel (block-local), exactly
mirroring the reference's structural property that only space communicates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..system import SystemMatrix


def split_dof_grid(x: np.ndarray, n_shards: int, degree: int,
                   axis: int) -> list[np.ndarray]:
    """Split a dof-grid array into overlapping per-shard slabs (interface
    plane replicated)."""
    n_dofs = x.shape[axis]
    n_cells = (n_dofs - 1) // degree
    assert n_cells % n_shards == 0
    cl = n_cells // n_shards
    out = []
    for s in range(n_shards):
        lo = s * cl * degree
        hi = (s + 1) * cl * degree + 1
        out.append(np.take(x, np.arange(lo, hi), axis=axis))
    return out


def join_dof_grid(parts: list[np.ndarray], degree: int,
                  axis: int) -> np.ndarray:
    """Inverse of split_dof_grid (drops the replicated planes)."""
    pieces = [np.take(parts[0], np.arange(parts[0].shape[axis]), axis=axis)]
    for p in parts[1:]:
        pieces.append(np.take(p, np.arange(1, p.shape[axis]), axis=axis))
    return np.concatenate(pieces, axis=axis)


def make_sharded_vmult(matrix_local: SystemMatrix, mesh: Mesh,
                       axis_name: str = "x"):
    """Sharded space-time system apply.

    matrix_local: a SystemMatrix built for the LOCAL sub-mesh (each shard's
    cell slab with its own Dirichlet mask slice).  Returns a function on
    [n_blocks, local_dofs_x, ny, ...] per-shard arrays (use under shard_map
    or jit with explicit shardings).
    """
    n = mesh.devices.size

    def vmult(x_local):
        y = matrix_local.vmult(x_local)
        # accumulate the shared interface planes:
        # send my FIRST plane's partial sum to the left neighbor, add what I
        # receive onto my LAST plane; then mirror (right -> left).
        idx = jax.lax.axis_index(axis_name)
        first = y[:, :1]
        last = y[:, -1:]
        from_right = jax.lax.ppermute(
            first, axis_name, [(i, (i - 1) % n) for i in range(n)])
        from_left = jax.lax.ppermute(
            last, axis_name, [(i, (i + 1) % n) for i in range(n)])
        # ring wrap-around must not contribute (non-periodic domain)
        add_last = jnp.where(idx < n - 1, from_right, 0.0)
        add_first = jnp.where(idx > 0, from_left, 0.0)
        y = y.at[:, -1:].add(add_last)
        y = y.at[:, :1].add(add_first)
        return y

    return vmult


def local_submesh(mesh_full, shard: int, n_shards: int):
    """The shard's cell slab as a StructuredMesh (first axis split)."""
    from ..mesh.grid import StructuredMesh
    cells = mesh_full.cells
    assert cells[0] % n_shards == 0
    clx = cells[0] // n_shards
    h0 = mesh_full.h[0]
    lo = np.array(mesh_full.lower, dtype=float)
    hi = np.array(mesh_full.upper, dtype=float)
    lo[0] = mesh_full.lower[0] + shard * clx * h0
    hi[0] = lo[0] + clx * h0
    sub = StructuredMesh([1] * mesh_full.dim, lo, hi, refinement=0)
    # overwrite cell structure: clx cells on axis 0, full cells elsewhere
    sub.cells = (clx,) + tuple(cells[1:])
    sub.h = np.array([h0] + list(mesh_full.h[1:]))
    return sub


def local_mask(mesh_full, degree: int, shard: int, n_shards: int):
    """Per-shard slice of the global Dirichlet mask (interface planes are
    interior dofs, NOT eliminated)."""
    full = mesh_full.boundary_dof_mask(degree)
    parts = split_dof_grid(full, n_shards, degree, axis=0)
    return parts[shard]
