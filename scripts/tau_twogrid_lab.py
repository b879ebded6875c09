"""Minimal tau-coarsening two-grid analysis: single spatial mesh, DG(r) in
time, ntao=2 -> 1 (Delta-t doubled), cell-Vanka relaxation V(1,1) at the fine
level, EXACT coarse solve.  Measures the two-grid error-propagation spectrum
vs spatial refinement and prints the structure of the worst eigenmode.

Usage: REFS=2,3,4 DEG=2 python scripts/tau_twogrid_lab.py
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
from stfem_tpu.stmg.smoother import (RelaxationSmoother,  # noqa: E402
                                     estimate_eigenvalues,
                                     relaxation_parameters)
from stfem_tpu.stmg.transfers import TimeTransfer  # noqa: E402
from stfem_tpu.stmg.vanka import PreconditionVanka  # noqa: E402
from stfem_tpu.system import SystemMatrix  # noqa: E402
from stfem_tpu.time.tables import get_fe_time_weights  # noqa: E402
from stfem_tpu.types import MGType, TimeStepType  # noqa: E402


def densify(apply_fn, shape, free):
    n = int(np.prod(shape))
    eye = jnp.eye(n, dtype=jnp.float64).reshape((n,) + shape)
    cols = jax.lax.map(apply_fn, eye, batch_size=256)
    A = np.asarray(cols.reshape(n, n)).T
    return A[np.ix_(free, free)]


def main():
    refs = [int(r) for r in os.environ.get("REFS", "2,3,4").split(",")]
    deg = int(os.environ.get("DEG", "2"))  # space degree
    r_t = int(os.environ.get("RT", "1"))   # time degree (DG)
    pre_post = os.environ.get("PREPOST", "11")
    for ref in refs:
        sref = int(os.environ.get("SREF", str(ref)))
        mesh = StructuredMesh((1, 1), (0.0, 0.0), (1.0, 1.0), refinement=sref)
        tau = 2.0 ** -(ref + 1)
        K = LaplaceMassOperator(mesh, deg, deg + 1, 0.0, 1.0,
                                dtype=jnp.float64)
        M = LaplaceMassOperator(mesh, deg, deg + 1, 1.0, 0.0,
                                dtype=jnp.float64)
        nt = r_t + 1
        Af, Bf, _, _ = get_fe_time_weights(TimeStepType.DG, r_t, tau, 2)
        Ac, Bc, _, _ = get_fe_time_weights(TimeStepType.DG, r_t, 2 * tau, 1)
        fine = SystemMatrix(K, M, Af, Bf)
        coarse = SystemMatrix(K, M, Ac, Bc)
        vanka = PreconditionVanka(K, M, Af, Bf, dtype=jnp.float64, n_steps=2)
        mask = np.asarray(K.mask_np).reshape(-1)
        shape_f = (2 * nt,) + tuple(K.dof_shape)
        if os.environ.get("OMEGA"):
            omega = float(os.environ["OMEGA"])
        else:
            info = estimate_eigenvalues(fine, vanka, shape_f, K.mask_np,
                                        jnp.float64, 20, 1.2)
            omega = relaxation_parameters(info, 1.0)
        sm = RelaxationSmoother(fine, vanka, omega, 1)
        tt = TimeTransfer(TimeStepType.DG, MGType.tau, nt, nt, 2, True,
                          jnp.float64)
        free_f = np.tile(mask, 2 * nt).astype(bool)
        shape_c = (nt,) + tuple(K.dof_shape)
        nc = int(np.prod(shape_c))
        eye = jnp.eye(nc, dtype=jnp.float64).reshape((nc,) + shape_c)
        Acd = np.array(jax.lax.map(coarse.vmult, eye,
                                   batch_size=256).reshape(nc, nc)).T
        Acd = Acd + np.diag((np.abs(Acd).max(1) == 0).astype(np.float64))
        Acinv = jnp.asarray(np.linalg.inv(Acd))

        npre, npost = int(pre_post[0]), int(pre_post[1])

        def Minv(d):
            u = jnp.zeros_like(d)
            for i in range(npre):
                u = (sm.vmult(d) if i == 0
                     else u + sm.vmult(d - fine.vmult(u)))
            r = d - fine.vmult(u)
            rc = tt.restrict(r)
            ec = (Acinv @ rc.reshape(-1)).reshape(rc.shape)
            u = u + tt.prolongate(ec)
            for _ in range(npost):
                u = u + sm.vmult(d - fine.vmult(u))
            return u

        MA = densify(lambda v: Minv(fine.vmult(v)), shape_f, free_f)
        ev, V = np.linalg.eig(MA)
        worst = np.argmax(np.abs(1 - ev))
        print(f"ref={ref} deg={deg} omega={omega:.4f} "
              f"re(lam) in [{ev.real.min():.4f},{ev.real.max():.4f}] "
              f"|1-lam|max={np.abs(1 - ev).max():.4f}", flush=True)
        # worst-mode structure: energy per time block, spatial frequency
        v = np.zeros(int(np.prod(shape_f)), complex)
        v[free_f] = V[:, worst]
        v = v.reshape(shape_f)
        blk_energy = np.linalg.norm(v.reshape(2 * nt, -1), axis=1)
        print(f"   worst lam={ev[worst]:.4f} block energy="
              f"{np.array2string(blk_energy / blk_energy.max(), precision=2)}",
              flush=True)
        # spatial smoothness of the worst mode: ratio of H1 to L2 energy
        vb = np.real(v[0]) if np.linalg.norm(np.real(v[0])) > 0 else None
        if vb is not None:
            g = np.gradient(vb)
            h1 = sum(np.linalg.norm(gi) ** 2 for gi in g)
            print(f"   worst-mode spatial roughness (grad/val): "
                  f"{np.sqrt(h1) / (np.linalg.norm(vb) + 1e-30):.2f} "
                  f"(dof grid {vb.shape})", flush=True)


if __name__ == "__main__":
    main()
