"""Spectral diagnostics for the tf01 h-growth: per-level smoother quality
(true lambda of Vanka*A vs the power estimate) and the full V-cycle
preconditioned spectrum, plus truncated-hierarchy analysis (direct solve at
level c) to localize which level degrades the cycle.

Usage: REFS=2,3 python scripts/h_growth_spectrum.py
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
from stfem_tpu.stmg.gmg import GMG, GMGParams, build_stmg  # noqa: E402
from stfem_tpu.stmg.smoother import IdentitySmoother  # noqa: E402
from stfem_tpu.system import SystemMatrix  # noqa: E402
from stfem_tpu.time.tables import get_fe_time_weights  # noqa: E402
from stfem_tpu.types import ProblemType, TimeStepType  # noqa: E402


def densify(apply_fn, shape, free):
    """Dense matrix of apply_fn restricted to free dofs."""
    n = int(np.prod(shape))
    eye = jnp.eye(n, dtype=jnp.float64).reshape((n,) + shape)
    cols = jax.lax.map(apply_fn, eye, batch_size=256)
    Afull = np.asarray(cols.reshape(n, n)).T
    return Afull[np.ix_(free, free)]


def level_masks(gmg: GMG, lvl_idx: int):
    lvl = gmg.levels[lvl_idx]
    K = lvl.matrix.K
    mask = np.asarray(K.mask_np).reshape(-1)
    full = np.tile(mask, lvl.n_blocks).astype(bool)
    return full


def build_tf01(ref: int, params: GMGParams):
    mesh = StructuredMesh((1, 1), (0.0, 0.0), (1.0, 1.0), refinement=ref)
    time_step = 2.0 ** -(ref + 1)
    K = LaplaceMassOperator(mesh, 2, 3, 0.0, 1.0, dtype=jnp.float64)
    M = LaplaceMassOperator(mesh, 2, 3, 1.0, 0.0, dtype=jnp.float64)
    Alpha, Beta, Gamma, Zeta = get_fe_time_weights(
        TimeStepType.DG, 1, time_step, 2)
    matrix = SystemMatrix(K, M, Alpha, Beta)
    gmg = build_stmg(mesh, 1, 2, TimeStepType.DG, 2, time_step,
                     problem=ProblemType.heat, params=params,
                     dtype=jnp.float64, fe_degree_min=1, use_pmg=True)
    return mesh, matrix, gmg


def v_step_custom(gmg: GMG, level: int, defect, direct_at: int,
                  direct_invs: dict):
    """GMG._level_v_step but with a DIRECT dense solve at level<=direct_at."""
    if level <= direct_at:
        d = defect.reshape(-1)
        return (direct_invs[level] @ d).reshape(defect.shape)
    if level == 0:
        return gmg._coarse_solve(defect)
    u = gmg._apply_smoother(level, defect)
    r = defect - gmg.levels[level].matrix.vmult(u)
    dc = gmg.transfers[level - 1].restrict(r)
    uc = v_step_custom(gmg, level - 1, dc, direct_at, direct_invs)
    u = u + gmg.transfers[level - 1].prolongate(uc)
    return gmg._post_smooth(level, u, defect)


def direct_inverse(lvl):
    shape = (lvl.n_blocks,) + tuple(lvl.dof_shape)
    n = int(np.prod(shape))
    eye = jnp.eye(n, dtype=jnp.float64).reshape((n,) + shape)
    cols = jax.lax.map(lvl.matrix.vmult, eye, batch_size=256)
    A = np.asarray(cols.reshape(n, n)).T
    zero_rows = np.max(np.abs(A), axis=1) == 0.0
    A = A + np.diag(zero_rows.astype(np.float64))
    return jnp.asarray(np.linalg.inv(A))


def spectrum_report(tag, PA):
    ev = np.linalg.eigvals(PA)
    re = ev.real
    print(f"    {tag}: n={PA.shape[0]} re(lam) in [{re.min():.4f}, "
          f"{re.max():.4f}]  |1-lam|max={np.abs(1 - ev).max():.4f}  "
          f"#re<0.1: {(re < 0.1).sum()}", flush=True)


def main():
    refs = [int(r) for r in os.environ.get("REFS", "2,3").split(",")]
    params = GMGParams()
    for ref in refs:
        print(f"=== tf01 ref={ref} ===", flush=True)
        mesh, matrix, gmg = build_tf01(ref, params)
        # per-level smoother info
        for li, lvl in enumerate(gmg.levels):
            sm = lvl.smoother
            tag = type(sm).__name__
            extra = ""
            if hasattr(sm, "omega"):
                extra = f" omega={sm.omega:.4f}"
            free = level_masks(gmg, li)
            nfree = int(free.sum())
            # true lambda extremes of the smoother-preconditioned operator
            if nfree and not isinstance(sm, IdentitySmoother) and nfree < 6000:
                shape = (lvl.n_blocks,) + tuple(lvl.dof_shape)
                PA = densify(
                    lambda v: sm.precond.vmult(lvl.matrix.vmult(v)),
                    shape, free)
                ev = np.linalg.eigvals(PA)
                extra += (f" true_re(lam) in [{ev.real.min():.4f},"
                          f"{ev.real.max():.4f}]"
                          f" omega*lmax={getattr(sm, 'omega', 0) * ev.real.max():.3f}")
            print(f"  L{li}: {tag} blocks={lvl.n_blocks} "
                  f"dofs={np.prod(lvl.dof_shape)} free={nfree}{extra}",
                  flush=True)
        # full V-cycle spectrum
        top = gmg.max_level
        free = level_masks(gmg, top)
        shape = (gmg.levels[top].n_blocks,) + tuple(gmg.levels[top].dof_shape)
        if int(free.sum()) < 6000:
            MA = densify(lambda v: gmg.vmult(matrix.vmult(v)), shape, free)
            spectrum_report("full V-cycle  M^-1 A", MA)
            # truncated: direct solve at successively higher levels
            invs = {}
            for cut in range(0, top):
                invs[cut] = direct_inverse(gmg.levels[cut])
                MA = densify(
                    lambda v: v_step_custom(gmg, top, matrix.vmult(v),
                                            cut, invs), shape, free)
                spectrum_report(f"direct@L{cut}   M^-1 A", MA)


if __name__ == "__main__":
    main()
