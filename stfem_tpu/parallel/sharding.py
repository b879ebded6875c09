"""Multi-chip distribution of the space-time solver.

Parallelism mapping (SURVEY.md section 2.4): the reference's MPI domain
decomposition becomes sharding of the SPATIAL dof-grid axes over a JAX device
mesh; time-direction operations (Alpha/Beta mixing, time transfers, wave
recovery) are block-local and need no communication, matching the reference's
structural fact that only the spatial direction communicates.

Strategy (GSPMD): annotate the block vector [n_blocks, *dofgrid] with
PartitionSpec(None, 'x', 'y'[, 'z']) and jit the whole slab solve; XLA
partitions the sum-factorization einsums and inserts halo collectives for the
cell gather/overlap-add scatter over ICI.  Coarse MG levels smaller than the
device grid degrade to (tiny) all-gathers, mirroring the reference's
repartitioning policy for coarse levels.  Pipeline/expert parallelism are
absent by design (absent in the reference, SURVEY.md section 2.4).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def spatial_mesh(n_devices: int | None = None, dim: int = 2,
                 devices=None) -> Mesh:
    """Device mesh over up to two spatial axes ('x', 'y').

    For dim >= 2 the mesh is near-square over (x, y); 1D problems shard x
    only.  The z axis (3D) stays unsharded by default: two sharded axes
    already expose all ICI links on current pod slices.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if dim == 1:
        return Mesh(np.array(devices), ("x",))
    # factor n_devices = a*b as square as possible
    a = int(np.floor(np.sqrt(n_devices)))
    while n_devices % a:
        a -= 1
    arr = np.array(devices).reshape(a, n_devices // a)
    return Mesh(arr, ("x", "y"))


def block_vector_spec(mesh: Mesh, dim: int) -> PartitionSpec:
    """PartitionSpec for [n_blocks, *dofgrid]: blocks replicated, leading
    spatial axes sharded."""
    names = list(mesh.axis_names)
    spatial = [names[i] if i < len(names) else None for i in range(dim)]
    return PartitionSpec(None, *spatial)


def shard_block_vector(x, mesh: Mesh):
    dim = x.ndim - 1
    return jax.device_put(x, NamedSharding(mesh, block_vector_spec(mesh, dim)))
