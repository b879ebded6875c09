"""Independent brute-force check of PreconditionVanka: assemble global K, M
densely from unit-vector applies, extract per-cell patch submatrices, scale
rows by valence, invert, gather->solve->scatter-add.  Compare against
PreconditionVanka.vmult on random vectors (ntao=2, DG(1), Q2, 4x4 mesh).
"""
from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stfem_tpu.mesh.grid import StructuredMesh  # noqa: E402
from stfem_tpu.ops.spatial import LaplaceMassOperator  # noqa: E402
from stfem_tpu.stmg.vanka import PreconditionVanka  # noqa: E402
from stfem_tpu.time.tables import get_fe_time_weights  # noqa: E402
from stfem_tpu.types import TimeStepType  # noqa: E402


def dense_op(op):
    shape = op.dof_shape
    n = int(np.prod(shape))
    eye = jnp.eye(n, dtype=jnp.float64).reshape((n,) + shape)
    cols = jax.lax.map(op.vmult, eye, batch_size=128)
    A = np.array(cols.reshape(n, n)).T
    # unit diagonal on constrained dofs, as in the banded assembly
    mask = np.asarray(op.mask).reshape(-1)
    A[np.arange(n), np.arange(n)] += 1.0 - mask
    return A


def main():
    ref = 2
    deg = 2
    mesh = StructuredMesh((1, 1), (0.0, 0.0), (1.0, 1.0), refinement=ref)
    tau = 2.0 ** -(ref + 1)
    K = LaplaceMassOperator(mesh, deg, deg + 1, 0.0, 1.0, dtype=jnp.float64)
    M = LaplaceMassOperator(mesh, deg, deg + 1, 1.0, 0.0, dtype=jnp.float64)
    Alpha, Beta, _, _ = get_fe_time_weights(TimeStepType.DG, 1, tau, 2)
    T = Alpha.shape[0]

    Kd = dense_op(K)
    Md = dense_op(M)
    nx = Kd.shape[0]
    dof_shape = K.dof_shape

    # per-cell dof indices (lexicographic grid, degree deg)
    cells = mesh.cells
    k = deg
    loc = np.stack(np.meshgrid(*([np.arange(k + 1)] * 2), indexing="ij"),
                   -1).reshape(-1, 2)
    strides = np.array([dof_shape[1], 1])
    cell_list = []
    for cx in range(cells[0]):
        for cy in range(cells[1]):
            base = np.array([cx * k, cy * k])
            gidx = ((base[None] + loc) * strides[None]).sum(-1)
            cell_list.append(gidx)
    valence = np.zeros(nx)
    for gidx in cell_list:
        valence[gidx] += 1.0

    rng = np.random.default_rng(0)
    r = rng.standard_normal((T, nx))
    r *= np.asarray(K.mask_np).reshape(-1)[None]

    # brute-force Vanka
    y = np.zeros((T, nx))
    for gidx in cell_list:
        A_loc = Kd[np.ix_(gidx, gidx)]
        M_loc = Md[np.ix_(gidx, gidx)]
        nloc = len(gidx)
        B = np.kron(Alpha, A_loc) + np.kron(Beta, M_loc)
        # rows scaled by valence (reference compute_block_matrix.h:135-137)
        vrow = np.tile(valence[gidx], T)
        B = B * vrow[:, None]
        r_loc = r[:, gidx].reshape(-1)          # block-major
        y_loc = np.linalg.solve(B, r_loc).reshape(T, nloc)
        for t in range(T):
            y[t, gidx] += y_loc[t]

    vanka = PreconditionVanka(K, M, Alpha, Beta, dtype=jnp.float64, n_steps=2)
    y_repo = np.array(vanka.vmult(
        jnp.asarray(r.reshape((T,) + dof_shape)))).reshape(T, nx)
    err = np.abs(y - y_repo).max() / (np.abs(y).max() + 1e-30)
    print(f"brute-force vs PreconditionVanka rel err: {err:.3e}")
    vanka_d = PreconditionVanka(K, M, Alpha, Beta, dtype=jnp.float64,
                                mode="dense")
    y_dense = np.array(vanka_d.vmult(
        jnp.asarray(r.reshape((T,) + dof_shape)))).reshape(T, nx)
    err2 = np.abs(y - y_dense).max() / (np.abs(y).max() + 1e-30)
    print(f"brute-force vs dense-mode Vanka   rel err: {err2:.3e}")


if __name__ == "__main__":
    main()
