"""Iteration-parity lab (VERDICT r2 #4): is the golden+2 iteration excess at
the coarsest refinement caused by the dof-order-dependent power-iteration
eigenvalue estimate?

For the tf01 ladder (heat 2D DG(1), 2 steps at once, refs 2..5, goldens
7/9/8.75/7.875) this script, per level of each hierarchy:
  * computes the EXACT lambda_max(P A) by dense assembly of the
    Vanka-smoothed operator (order-invariant ground truth),
  * prints it against the 20-step power estimate with the lexicographic
    start vector (the shipped path),
then re-runs the solve with (a) shipped estimates, (b) exact lambda_max
injected (relaxation omega from the same deal.II formula), (c) exact with
varied safety factor, and prints the average iteration counts.

Usage: python scripts/eig_parity_lab.py [max_ref]
"""
from __future__ import annotations

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from stfem_tpu.drivers.heat import (run_heat_cycle,  # noqa: E402
                                    stmg_preconditioner_factory)
from stfem_tpu.stmg.gmg import GMGParams, build_stmg  # noqa: E402
from stfem_tpu.stmg.smoother import (EigInfo,  # noqa: E402
                                     IdentitySmoother, RelaxationSmoother,
                                     relaxation_parameters)
from stfem_tpu.types import TimeStepType  # noqa: E402

GOLDEN = {2: 7.0, 3: 9.0, 4: 8.75, 5: 7.875}


def exact_lambda_max(matrix, vanka, n_blocks, dof_shape, mask):
    n_sp = int(np.prod(dof_shape))
    n = n_blocks * n_sp
    if n > 6000:
        return None
    shape = (n_blocks,) + tuple(dof_shape)
    eye = jnp.eye(n, dtype=jnp.float32).reshape((n,) + shape)
    cols = jax.jit(jax.vmap(lambda v: vanka.vmult(matrix.vmult(v))))(eye)
    PA = np.asarray(cols.reshape(n, n)).T
    ev = np.linalg.eigvals(PA)
    return float(np.max(np.abs(ev)))


def patched_factory(mode: str, safety: float = 1.2):
    """mode: 'shipped' | 'exact'."""

    def factory(ctx):
        gmg = build_stmg(ctx["mesh"], ctx["fe_degree"], ctx["space_degree"],
                         ctx["type_"], ctx["n_timesteps_at_once"],
                         ctx["time_step"], problem=ctx["problem"],
                         params=GMGParams(), dtype=jnp.float32,
                         fe_degree_min=1)
        if mode == "shipped":
            return gmg
        for li, lvl in enumerate(gmg.levels):
            sm = lvl.smoother
            if isinstance(sm, IdentitySmoother) or \
                    not isinstance(sm, RelaxationSmoother):
                continue
            mask = sm.precond.K_op.mask_np
            lam = exact_lambda_max(lvl.matrix, sm.precond, lvl.n_blocks,
                                   lvl.dof_shape, mask)
            if lam is None or lam <= 1e-12:
                print(f"    lvl {li}: exact eig unavailable (lam={lam}), "
                      f"keeping shipped omega {sm.omega:.4f}")
                continue
            info = EigInfo(min_eigenvalue=lam, max_eigenvalue=safety * lam)
            new_omega = relaxation_parameters(info, 1.0)
            print(f"    lvl {li}: exact lam_max {lam:.5f} -> omega "
                  f"{new_omega:.4f} (shipped omega {sm.omega:.4f})")
            sm.omega = new_omega
            gmg.__dict__.pop("_module_aux", None)
        return gmg

    return factory


def main():
    max_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    for ref in range(2, max_ref + 1):
        print(f"=== tf01 ref {ref} (golden avg iters {GOLDEN[ref]}) ===")
        for mode, safety in [("shipped", 1.2), ("exact", 1.2),
                             ("exact", 1.0)]:
            res = run_heat_cycle(
                refinement=ref, fe_degree=1, type_=TimeStepType.DG,
                n_timesteps_at_once=2,
                preconditioner_factory=patched_factory(mode, safety),
                gmres_maxiter=40)
            print(f"  mode={mode} safety={safety}: avg iters "
                  f"{res.avg_iterations:.3f}  l2_l2 {res.l2_l2:.5e}")


if __name__ == "__main__":
    main()
