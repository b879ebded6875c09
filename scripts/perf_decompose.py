"""On-chip per-op timing decomposition of the STMG slab solve.

Times N repetitions of each component in ONE jitted fori_loop dispatch:
  * matrix.vmult        (finest-level space-time operator apply)
  * vanka.vmult         (finest-level fastdiag Vanka apply)
  * smoother.vmult      (relaxation wrap: steps x (vanka + matrix))
  * gmg.vmult           (full V-cycle)
  * fgmres fixed 10 it  (outer solve without convergence checks)

Env knobs mirror bench.py: STFEM_BENCH_CELLS / _NTAO / _STEPS / _BF16.
Timing forces a scalar readback (block_until_ready is unreliable through
the axon tunnel) and subtracts the measured readback latency.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from stfem_tpu.krylov import fgmres
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "8"))
    smoothing_steps = int(os.environ.get("STFEM_BENCH_STEPS", "1"))
    n_at_once = int(os.environ.get("STFEM_BENCH_NTAO", "32"))
    vanka_bf16 = os.environ.get("STFEM_BENCH_BF16", "1") == "1"
    reps = int(os.environ.get("STFEM_PROBE_REPS", "50"))
    fe_degree, space_degree = 2, 4
    dtype = jnp.float32

    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    tau = 1.0 / 16.0
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 0.0,
                                1.0, dtype=dtype)
        M = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 1.0,
                                0.0, dtype=dtype)
        Alpha, Beta, _, _ = get_fe_time_weights(
            TimeStepType.DG, fe_degree, tau, n_at_once)
        matrix = SystemMatrix(K, M, Alpha, Beta)
        inner_env = os.environ.get("STFEM_BENCH_INNER", "2")
        gmg = build_stmg(mesh, fe_degree, space_degree, TimeStepType.DG,
                         n_at_once, tau, dtype=dtype, fe_degree_min=1,
                         params=GMGParams(smoothing_steps=smoothing_steps,
                                          variable=False,
                                          coarse_grid_smoother_type=os.environ.get(
                                              "STFEM_BENCH_COARSE", "Direct"),
                                          vanka_bf16=vanka_bf16,
                                          smoother_inner_iterations=(
                                              int(inner_env) if inner_env
                                              else None),
                                          skip_identity_levels=os.environ.get(
                                              "STFEM_BENCH_SKIPID", "1") == "1",
                                          level_bf16=os.environ.get(
                                              "STFEM_BENCH_LEVEL_BF16",
                                              "1") == "1"))
    n_blocks = Alpha.shape[0]
    shape = (n_blocks,) + mesh.dof_shape(space_degree)
    tpu = jax.devices()[0]
    matrix, gmg = jax.device_put((matrix, gmg), tpu)
    x0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), dtype), tpu)

    fine = gmg.levels[-1]
    sm = fine.smoother
    vanka = getattr(sm, "precond", None)

    @partial(jax.jit, static_argnums=(0,))
    def loop(fn_key, mod, x):
        def body(_, v):
            if fn_key == "matrix":
                return mod.vmult(v) / jnp.linalg.norm(v.reshape(-1))
            if fn_key in ("vanka", "smoother", "gmg"):
                return mod.vmult(v) / jnp.linalg.norm(v.reshape(-1))
            raise ValueError(fn_key)
        return jax.lax.fori_loop(0, reps, body, x)

    def timed(fn_key, mod):
        y = loop(fn_key, mod, x0)
        _ = float(jnp.sum(y))                   # compile + settle
        t0 = time.time()
        _ = float(jnp.sum(x0))
        rb = time.time() - t0
        t0 = time.time()
        y = loop(fn_key, mod, x0)
        _ = float(jnp.sum(y))
        return max((time.time() - t0 - rb) / reps, 0.0)

    out = {"cells": cells_per_axis, "ntao": n_at_once,
           "steps": smoothing_steps, "bf16": vanka_bf16, "reps": reps}
    out["matrix_ms"] = 1e3 * timed("matrix", matrix)
    if vanka is not None:
        out["vanka_ms"] = 1e3 * timed("vanka", vanka)
    out["smoother_ms"] = 1e3 * timed("smoother", sm)
    out["vcycle_ms"] = 1e3 * timed("gmg", gmg)

    if os.environ.get("STFEM_PROBE_LEVELS", "1") == "1":
        # per-level smoother cost (the V-cycle visits each level with
        # pre+post smoothing; level 0 additionally runs the coarse GMRES)
        mgt = getattr(gmg, "mg_type_level", None)
        for li, lvl in enumerate(gmg.levels):
            shape_l = (lvl.n_blocks,) + tuple(lvl.dof_shape)
            xl = jax.device_put(jnp.asarray(
                np.random.default_rng(li).standard_normal(shape_l), dtype),
                tpu)

            @partial(jax.jit, static_argnums=(0,))
            def loop_l(key, mod, x):
                def body(_, v):
                    return mod.vmult(v) / jnp.linalg.norm(v.reshape(-1))
                return jax.lax.fori_loop(0, reps, body, x)

            y = loop_l(f"lvl{li}", lvl.smoother, xl)
            _ = float(jnp.sum(y))
            t0 = time.time(); _ = float(jnp.sum(xl)); rb = time.time() - t0
            t0 = time.time()
            y = loop_l(f"lvl{li}", lvl.smoother, xl)
            _ = float(jnp.sum(y))
            ms = 1e3 * max((time.time() - t0 - rb) / reps, 0.0)
            t = "" if mgt is None or li == 0 else str(mgt[li - 1])
            out[f"lvl{li}_smoother_ms"] = round(ms, 3)
            out[f"lvl{li}_info"] = f"{t} blocks={lvl.n_blocks} " \
                f"dofs={int(np.prod(lvl.dof_shape))}"

    maxiter_env = int(os.environ.get("STFEM_BENCH_MAXITER", "10"))

    @partial(jax.jit, static_argnums=(0,))
    def outer(use_precond, x):
        res = fgmres(matrix.vmult, x, jnp.zeros_like(x),
                     precondition=gmg.vmult if use_precond else None,
                     maxiter=maxiter_env, abstol=0.0,
                     reltol=0.0)
        return res.x

    # no-preconditioner run isolates the outer cost (A apply + Gram-Schmidt
    # + basis traffic) from the V-cycle
    y = outer(False, x0); _ = float(jnp.sum(y))
    t0 = time.time(); _ = float(jnp.sum(x0)); rb = time.time() - t0
    t0 = time.time()
    y = outer(False, x0); _ = float(jnp.sum(y))
    noprec = max(time.time() - t0 - rb, 0.0)
    out["fgmres_noprec_ms"] = 1e3 * noprec
    out["fgmres_noprec_per_iter_ms"] = 1e3 * noprec / maxiter_env

    y = outer(True, x0); _ = float(jnp.sum(y))
    t0 = time.time(); _ = float(jnp.sum(x0)); rb = time.time() - t0
    t0 = time.time(); y = outer(True, x0); _ = float(jnp.sum(y))
    out["fgmres10_ms"] = 1e3 * (time.time() - t0 - rb)
    out["fgmres_per_iter_ms"] = out["fgmres10_ms"] / maxiter_env
    print(json.dumps(out))


if __name__ == "__main__":
    main()
