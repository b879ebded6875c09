"""V-cycle-preconditioned Richardson contraction at the bench shape.

FGMRES glue (basis traffic + Gram-Schmidt + Givens) costs ~27 ms of the
~61 ms outer iteration at 16^3; preconditioned Richardson
x += omega * P(r) costs only matvec + V-cycle (~31 ms).  Whether it can
replace the outer Krylov depends on the contraction factor rho of
I - omega * P A: FGMRES reaches the f32 floor (1.5e-5) in ~6-7
iterations (rho_eff ~ 0.2); Richardson wins wall-clock if its rho stays
below ~0.55 (need <= 13 steps), loses otherwise.

Prints the per-step TRUE residual norms for omega in {1.0, 0.9, 0.8} and
the implied rho, on one representative slab (zero initial guess, the
bench's force RHS).

Usage: CELLS=16 NTAO=32 python scripts/richardson_lab.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from stfem_tpu.integrators import ForceAssembler
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.problems import heat as heat_problem
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights, get_time_quad
    from stfem_tpu.types import TimeStepType

    cells = int(os.environ.get("CELLS", "16"))
    n_at_once = int(os.environ.get("NTAO", "32"))
    n_steps = int(os.environ.get("STEPS", "16"))
    fe_degree, space_degree = 2, 4
    tau = 1.0 / 16.0
    dtype = jnp.float32

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    refinement = int(np.log2(cells // 2))
    with jax.default_device(cpu):
        mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                              refinement=refinement)
        K = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                0.0, 1.0, dtype=dtype)
        M = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                1.0, 0.0, dtype=dtype)
        Alpha, Beta, Gamma, _ = get_fe_time_weights(
            TimeStepType.DG, fe_degree, tau, n_at_once)
        matrix = SystemMatrix(K, M, Alpha, Beta)
        gmg = build_stmg(mesh, fe_degree, space_degree, TimeStepType.DG,
                         n_at_once, tau, dtype=dtype, fe_degree_min=1,
                         params=GMGParams(smoothing_steps=1,
                                          smoother_inner_iterations=2,
                                          skip_identity_levels=True,
                                          vanka_bf16=True, level_bf16=True,
                                          eig_proxy_cells=4),
                         eig_device=tpu)
        force = ForceAssembler(mesh, space_degree, space_degree + 1,
                               lambda p, t: heat_problem.rhs(p, t, 1.0),
                               K.mask_np, dtype=dtype)
        tq = get_time_quad(TimeStepType.DG, fe_degree)[0]
        nt = len(tq)
        n_blocks = Alpha.shape[0]
        t_offsets = np.array([tau * (r // nt) + tau * float(tq[r % nt])
                              for r in range(n_blocks)], np.float32)
        f_scales = np.array([Alpha[r, r] for r in range(n_blocks)],
                            np.float32)
    matrix, gmg, force = jax.device_put((matrix, gmg, force), tpu)

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def richardson(matrix_, gmg_, force_, n, omega):
        rhs = force_.batched(jnp.asarray(t_offsets), jnp.asarray(f_scales))
        bnorm = jnp.linalg.norm(rhs.reshape(-1))
        x = jnp.zeros_like(rhs)

        def step(x, _):
            r = rhs - matrix_.vmult(x)
            x = x + omega * gmg_.vmult(r)
            return x, jnp.linalg.norm(r.reshape(-1)) / bnorm
        x, rels = jax.lax.scan(step, x, jnp.arange(n))
        r = rhs - matrix_.vmult(x)
        return rels, jnp.linalg.norm(r.reshape(-1)) / bnorm

    for omega in (1.0, 0.9, 0.8):
        t0 = time.time()
        rels, final = richardson(matrix, gmg, force, n_steps,
                                 np.float32(omega))
        rels = np.asarray(rels)
        dt = time.time() - t0
        # contraction per step over the tail (skip the initial transient)
        tail = rels[3:]
        rho = float(np.exp(np.mean(np.diff(np.log(tail))))) if len(
            tail) > 2 else float("nan")
        print(json.dumps({"omega": omega, "rho": round(rho, 3),
                          "final_rel": float(final),
                          "rels": [float(f"{r:.3e}") for r in rels],
                          "wall_s": round(dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
