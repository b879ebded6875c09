"""Measure on-TPU: (a) accuracy of an f32(highest) residual evaluation
vs the exact f64 residual, (b) cost of one emulated-f64 system matvec vs
f32, (c) whether f32-residual-driven IR reaches true 1e-8.

Decides the cheapest true-1e-8 slab-solve strategy for bench.py
(reference outer precision semantics: include/time_integrators.h:56-59).

Usage: python scripts/ir_residual_lab.py  (on the axon TPU; ~5 min)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from stfem_tpu.integrators import ForceAssembler
    from stfem_tpu.krylov import fgmres
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.problems import heat as heat_problem
    from stfem_tpu.stmg.gmg import build_stmg
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights, get_time_quad
    from stfem_tpu.types import TimeStepType

    cells = int(os.environ.get("CELLS", "8"))
    n_at_once = int(os.environ.get("NTAO", "32"))
    fe_degree, space_degree = 2, 4
    refinement = int(np.log2(cells // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    tau = 1.0 / 16.0
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, space_degree, 5, 0.0, 1.0,
                                dtype=jnp.float32)
        M = LaplaceMassOperator(mesh, space_degree, 5, 1.0, 0.0,
                                dtype=jnp.float32)
        A, B, G, Z = get_fe_time_weights(TimeStepType.DG, fe_degree, tau,
                                         n_at_once)
        matrix = SystemMatrix(K, M, A, B)
        rhs_matrix = SystemMatrix(K, M, np.zeros_like(G), G)
        gmg = build_stmg(mesh, fe_degree, space_degree, TimeStepType.DG,
                         n_at_once, tau, dtype=jnp.float32, fe_degree_min=1)
        force = ForceAssembler(mesh, space_degree, 5,
                               lambda p, t: heat_problem.rhs(p, t, 1.0),
                               K.mask_np, dtype=jnp.float32)
        K64 = LaplaceMassOperator(mesh, space_degree, 5, 0.0, 1.0,
                                  dtype=jnp.float64)
        M64 = LaplaceMassOperator(mesh, space_degree, 5, 1.0, 0.0,
                                  dtype=jnp.float64)
        m64 = SystemMatrix(K64, M64, A, B)
        r64m = SystemMatrix(K64, M64, np.zeros_like(G), G)
        f64 = ForceAssembler(mesh, space_degree, 5,
                             lambda p, t: heat_problem.rhs(p, t, 1.0),
                             K.mask_np, dtype=jnp.float64)
    n_blocks = A.shape[0]
    shape = (n_blocks,) + mesh.dof_shape(space_degree)
    tq = get_time_quad(TimeStepType.DG, fe_degree)[0]
    nt = len(tq)
    t_off = np.array([tau * (r // nt) + tau * float(tq[r % nt])
                      for r in range(n_blocks)])
    f_sc = np.array([A[r, r] for r in range(n_blocks)])

    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        coords = jnp.asarray(mesh.dof_coordinates(space_degree), jnp.float32)
        prev = heat_problem.exact_solution(coords, 0.0, 1.0)
    prev = jax.device_put(prev.astype(jnp.float32), tpu)
    matrix, rhs_matrix, gmg, force, m64, r64m, f64 = jax.device_put(
        (matrix, rhs_matrix, gmg, force, m64, r64m, f64), tpu)

    @jax.jit
    def solve(matrix_, rhs_matrix_, gmg_, force_, prev_x):
        rhs = rhs_matrix_.vmult(prev_x[None]) + force_.batched(
            jnp.asarray(t_off, jnp.float32), jnp.asarray(f_sc, jnp.float32))
        x0 = jnp.broadcast_to(prev_x, shape)
        res = fgmres(matrix_.vmult, rhs, x0, precondition=gmg_.vmult,
                     maxiter=18, abstol=1e-30, reltol=1e-8)
        return res.x, rhs

    @jax.jit
    def rhs64_fn(r64m_, f64_, prev_x):
        p64 = prev_x.astype(jnp.float64)
        return r64m_.vmult(p64[None]) + f64_.batched(
            jnp.asarray(t_off, jnp.float64), jnp.asarray(f_sc, jnp.float64))

    @jax.jit
    def resid32(matrix_, rhs, x):
        return rhs - matrix_.vmult(x)

    @jax.jit
    def resid64(m64_, rhs64, x):
        return rhs64 - m64_.vmult(x.astype(jnp.float64))

    @jax.jit
    def ir_pass32(matrix_, gmg_, rhs, x):
        r = rhs - matrix_.vmult(x)
        rn = jnp.linalg.norm(r.reshape(-1))
        res = fgmres(matrix_.vmult, r / rn, jnp.zeros_like(r),
                     precondition=gmg_.vmult, maxiter=8, abstol=1e-30,
                     reltol=2e-3)
        return x + rn * res.x, res.iterations

    x, rhs32 = solve(matrix, rhs_matrix, gmg, force, prev)
    _ = float(jnp.sum(x))
    rhs64 = rhs64_fn(r64m, f64, prev)
    bn = float(jnp.linalg.norm(rhs64.reshape(-1)))

    r32 = resid32(matrix, rhs32, x)
    r64 = resid64(m64, rhs64, x)
    _ = float(jnp.sum(r32)), float(jnp.sum(r64))
    ev_err = float(jnp.linalg.norm(
        (r32.astype(jnp.float64) - r64).reshape(-1))) / bn
    print(f"after f32 solve: true rel resid "
          f"{float(jnp.linalg.norm(r64.reshape(-1)))/bn:.3e}; "
          f"f32-eval error {ev_err:.3e} (rel to |b|)", flush=True)

    # f32-residual-driven IR passes
    xi = x
    for i in range(3):
        xi, its = ir_pass32(matrix, gmg, rhs32, xi)
        r64i = resid64(m64, rhs64, xi)
        print(f"  f32-IR pass {i+1} (+{int(its)} it): true rel "
              f"{float(jnp.linalg.norm(r64i.reshape(-1)))/bn:.3e}", flush=True)

    # timing: f32 matvec vs f64 matvec vs f32 IR pass
    def timeit(fn, *args, n=10):
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        t0 = time.time()
        for _i in range(n):
            out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        return (time.time() - t0) / n

    mv32 = jax.jit(lambda m_, v: m_.vmult(v))
    mv64 = jax.jit(lambda m_, v: m_.vmult(v))
    x64 = x.astype(jnp.float64)
    t32 = timeit(mv32, matrix, x)
    t64 = timeit(mv64, m64, x64)
    tr64 = timeit(jax.jit(lambda r_, f_, p: rhs64_fn.__wrapped__(r_, f_, p)),
                  r64m, f64, prev)
    tir = timeit(ir_pass32, matrix, gmg, rhs32, x, n=3)
    tsolve = timeit(lambda *a: solve(*a)[0], matrix, rhs_matrix, gmg, force,
                    prev, n=3)
    print(f"timings: f32 matvec {t32*1e3:.1f} ms, f64 matvec {t64*1e3:.1f} ms"
          f" ({t64/t32:.0f}x), rhs64 {tr64*1e3:.1f} ms, f32 IR pass "
          f"{tir*1e3:.1f} ms, full f32 solve {tsolve*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
