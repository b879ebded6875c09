"""Exact spectrum of the STMG-preconditioned Stokes operator, 2D vs 3D.

Round-3 found rho(I - P A) = 1.00 (2D, FGMRES still hits golden 12) vs
1.35 (3D, FGMRES stalls).  This lab materializes P A densely on tiny
problems (2^dim cells) and eigendecomposes: where does the 3D spectrum
differ -- expansive modes (|1-lam| > 1), near-null modes (lam ~ 0), and
what do the offending eigenvectors look like (velocity / pressure /
boundary-concentrated)?
"""
from __future__ import annotations

import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from stfem_tpu.mesh.grid import StructuredMesh  # noqa: E402
from stfem_tpu.ops.spatial import LaplaceMassOperator  # noqa: E402
from stfem_tpu.ops.stokes import StokesOperator  # noqa: E402
from stfem_tpu.stmg.gmg import GMGParams, build_stmg_stokes  # noqa: E402
from stfem_tpu.system_stokes import StokesSystemMatrix  # noqa: E402
from stfem_tpu.time.tables import get_fe_time_weights  # noqa: E402
from stfem_tpu.types import TimeStepType  # noqa: E402


def build(dim, cells=2, ntao=1, params=None, dg_pressure=True):
    k, u_deg, p_deg, n_q = 1, 2, 1, 3
    tau = 1.0 / 16.0
    refinement = int(np.log2(cells // 2))
    mesh = StructuredMesh([2] * dim, [0.0] * dim, [1.0] * dim,
                          refinement=refinement)
    S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0, dtype=jnp.float64,
                       dg_pressure=dg_pressure)
    Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0,
                             dtype=jnp.float64, mask=S.mask_u_np)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, tau, ntao)
    matrix = StokesSystemMatrix(S, Mu, a, b)
    gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                            viscosity=1.0, dtype=jnp.float64,
                            params=params or GMGParams(smoothing_range=5.0),
                            fe_degree_min=1)
    T = 2 * ntao
    return S, matrix, gmg, T


def dense_op(fn, shape):
    n = int(np.prod(shape))
    cols = []
    eye = np.eye(n)
    f = jax.jit(fn)
    for i in range(n):
        cols.append(np.asarray(f(jnp.asarray(
            eye[:, i].reshape(shape)))).reshape(-1))
    return np.stack(cols, axis=1)


def analyze(dim, ntao=1, params=None, dg_pressure=True, label=""):
    t0 = time.time()
    S, matrix, gmg, T = build(dim, 2, ntao, params, dg_pressure)
    shape = (T, S.n_u + S.n_p)
    n = int(np.prod(shape))
    print(f"== {label or f'{dim}D'}: n = {n} (n_u={S.n_u} n_p={S.n_p} "
          f"T={T})", flush=True)
    A = dense_op(matrix.vmult, shape)
    P = dense_op(gmg.vmult, shape)
    PA = P @ A
    lam = np.linalg.eigvals(PA)
    # sort by |1 - lam| (Richardson contraction per mode)
    dist = np.abs(1.0 - lam)
    order = np.argsort(dist)[::-1]
    print(f"  rho(I-PA) = {dist.max():.3f}   "
          f"|lam| range [{np.abs(lam).min():.2e}, {np.abs(lam).max():.2f}]")
    worst = lam[order[:8]]
    print("  worst modes (lam):", " ".join(
        f"{w.real:+.3f}{w.imag:+.3f}j" for w in worst))
    n_exp = int((dist > 1.0).sum())
    n_null = int((np.abs(lam) < 1e-8).sum())
    n_small = int((np.abs(lam) < 1e-2).sum())
    print(f"  expansive modes (|1-lam|>1): {n_exp}   "
          f"null (|lam|<1e-8): {n_null}   small (|lam|<1e-2): {n_small}")
    # examine worst eigenvector: u vs p energy
    w, V = np.linalg.eig(PA)
    iworst = np.argmax(np.abs(1.0 - w))
    v = V[:, iworst].reshape(shape)
    eu = float(np.linalg.norm(v[:, :S.n_u]))
    ep = float(np.linalg.norm(v[:, S.n_u:]))
    print(f"  worst eigvec energy: u {eu:.3f}  p {ep:.3f} "
          f" lam={w[iworst]:.4f}  ({time.time() - t0:.0f}s)", flush=True)
    # A's own null space size (consistency check: enclosed flow ->
    # constant-pressure null modes)
    sv = np.linalg.svd(A, compute_uv=False)
    print(f"  A nullity (sv < 1e-10 * max): "
          f"{int((sv < 1e-10 * sv[0]).sum())}", flush=True)
    return lam


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "2d"):
        analyze(2, label="2D DGP ntao1")
    if which in ("all", "3d"):
        analyze(3, label="3D DGP ntao1")


def oracle_vanka(dim, ntao=1, dg_pressure=True):
    """Dense reference-semantics Vanka from the GLOBAL matrix: restrict A
    to each cell's (all-time-blocks x patch-spatial-dofs) index set with
    valence row scaling, exact-invert (zero rows regularized), sum
    R^T B^-1 R.  Compare against our StokesVanka.vmult as a dense map."""
    from stfem_tpu.stmg.vanka import dof_valence
    from stfem_tpu.ops.spatial import cell_gather

    S, matrix, gmg, T = build(dim, 2, ntao, dg_pressure=dg_pressure)
    shape = (T, S.n_u + S.n_p)
    n = int(np.prod(shape))
    A = dense_op(matrix.vmult, shape)

    cells = S.cells
    k = S.u_degree
    C = int(np.prod(cells))
    A_s = (k + 1) ** dim
    # spatial flat index of each cell-local u dof: gather an index array
    iu = np.asarray(cell_gather(
        jnp.arange(int(np.prod(S.dof_shape_u)), dtype=jnp.float64
                   ).reshape(S.dof_shape_u), cells, k)).astype(np.int64)
    iu = iu.reshape(C, A_s)
    val = np.asarray(dof_valence(cells, k)).reshape(-1)  # per spatial dof
    n_pl = S.n_ploc_cell
    nu_c = int(np.prod(S.dof_shape_u))

    P = np.zeros((n, n))
    for c in range(C):
        gidx = []   # flat global indices, block-major like StokesVanka
        rowscale = []
        for b in range(T):
            # u dofs of this cell, component-major
            for comp in range(dim):
                for a in range(A_s):
                    gidx.append(b * (S.n_u + S.n_p) + comp * nu_c + iu[c, a])
                    rowscale.append(val[iu[c, a]])
            for m in range(n_pl):
                gidx.append(b * (S.n_u + S.n_p) + S.n_u + c * n_pl + m)
                rowscale.append(1.0)
        gidx = np.asarray(gidx)
        rs = np.asarray(rowscale)
        B = A[np.ix_(gidx, gidx)] * rs[:, None]
        zr = np.max(np.abs(B), axis=1) == 0.0
        B[zr, zr] = 1.0
        Binv = np.linalg.inv(B)
        P[np.ix_(gidx, gidx)] += Binv
    return S, matrix, gmg, shape, A, P


def compare_vanka(dim):
    S, matrix, gmg, shape, A, P_or = oracle_vanka(dim)
    # our fine-level Vanka as dense
    v = gmg.levels[-1].smoother.precond  # the Vanka inside
    P_ours = dense_op(lambda x: v.vmult(x), shape)
    d = np.max(np.abs(P_ours - P_or)) / np.max(np.abs(P_or))
    print(f"{dim}D vanka vs oracle: rel max diff {d:.2e}")
    lam_or = np.linalg.eigvals(P_or @ A)
    lam_us = np.linalg.eigvals(P_ours @ A)
    for name, lam in (("oracle", lam_or), ("ours", lam_us)):
        dist = np.abs(1.0 - lam)
        nexp = int((dist > 1.0).sum())
        # worst non-null mode
        print(f"  {name}: rho(I-PA) {dist.max():.3f} expansive {nexp} "
              f"min Re lam (nonnull) "
              f"{lam[np.abs(lam) > 1e-8].real.min():.3f}")


if __name__ == "__main__" and "compare" in sys.argv:
    compare_vanka(3)
    compare_vanka(2)


def twogrid_variants(dim=3, ntao=1):
    """Which composition step injects the expansive 3D pressure modes?
    Variants: full GMG | exact coarse solve | no coarse correction
    (smoother only, both sweeps) | coarse correction without post-smooth."""
    S, matrix, gmg, T = build(dim, 2, ntao)
    shape = (T, S.n_u + S.n_p)
    A = dense_op(matrix.vmult, shape)

    def spec(P, name):
        lam = np.linalg.eigvals(P @ A)
        dist = np.abs(1.0 - lam)
        nn = lam[np.abs(lam) > 1e-8]
        nexp = int((dist > 1.0).sum())
        worst = lam[np.argmax(dist)]
        print(f"  {name:26s} rho {dist.max():.3f}  expansive {nexp}  "
              f"min Re {nn.real.min():+.3f}  worst lam "
              f"{worst.real:+.3f}{worst.imag:+.3f}j", flush=True)

    print(f"== {dim}D two-grid variants (n={int(np.prod(shape))}, "
          f"{len(gmg.levels)} levels) ==", flush=True)
    spec(dense_op(gmg.vmult, shape), "full GMG")

    # exact coarse solve
    c_shape = (gmg.levels[0].n_blocks,) + tuple(gmg.levels[0].dof_shape) \
        if hasattr(gmg.levels[0], "dof_shape") else None
    lvl0 = gmg.levels[0]
    A0 = dense_op(lvl0.matrix.vmult, None) if False else None
    # dense coarse operator via matvec on the coarse vector shape: probe it
    import jax.numpy as jnp
    probe = gmg.transfers[0].restrict(jnp.zeros(shape))
    cshape = probe.shape
    A_c = dense_op(lvl0.matrix.vmult, cshape)
    # regularize null rows (constrained dofs) for the inverse
    zr = np.max(np.abs(A_c), axis=1) == 0.0
    A_c[zr, zr] = 1.0
    # pressure-constant nullspace keeps A_c singular: pinv drops it (the
    # exact solve on range(A_c), which is what any converged coarse
    # Krylov solve would return up to nullspace components)
    A_c_inv = np.linalg.pinv(A_c, rcond=1e-10)

    orig_coarse = gmg._coarse_solve

    A_c_inv_j = jnp.asarray(A_c_inv)

    def exact_coarse(defect):
        d = defect.reshape(-1)
        return (A_c_inv_j @ d).reshape(cshape)

    gmg._coarse_solve = exact_coarse
    spec(dense_op(gmg.vmult, shape), "exact coarse")
    gmg._coarse_solve = orig_coarse

    # no coarse correction: pre+post smoother only
    def no_coarse(defect):
        return jnp.zeros_like(defect)

    gmg._coarse_solve = no_coarse

    def tg_nocoarse(x):
        lvl = gmg.max_level
        u = gmg._apply_smoother(lvl, x)
        return gmg._post_smooth(lvl, u, x)

    spec(dense_op(tg_nocoarse, shape), "smoother only (pre+post)")
    gmg._coarse_solve = orig_coarse

    # coarse correction only (no smoothing): I term absent -- P_cgc
    def cgc_only(x):
        r = gmg.transfers[0].restrict(x)
        uc = exact_coarse(r)
        return gmg.transfers[0].prolongate(uc)

    spec(dense_op(cgc_only, shape), "exact CGC only")


if __name__ == "__main__" and "twogrid" in sys.argv:
    twogrid_variants(3)
    twogrid_variants(2)
