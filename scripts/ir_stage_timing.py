"""Per-stage on-chip timing of the true-1e-8 IR slab march (bench.py):
f32 FGMRES solve / emulated-f64 stepwise residual / f32 correction solve /
f64 update.  Finds where the IR overhead goes at the bench shape.

Usage: CELLS=16 python scripts/ir_stage_timing.py   (axon TPU)
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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from stfem_tpu.integrators import ForceAssembler
    from stfem_tpu.krylov import fgmres
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.problems import heat as heat_problem
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights, get_time_quad
    from stfem_tpu.types import TimeStepType

    cells = int(os.environ.get("CELLS", "16"))
    n_at_once = int(os.environ.get("NTAO", "32"))
    fe_degree, space_degree = 2, 4
    tau = 1.0 / 16.0
    refinement = int(np.log2(cells // 2))
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    t0 = time.time()
    with jax.default_device(cpu):
        mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                              refinement=refinement)
        dt32 = jnp.float32
        K = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 0.0,
                                1.0, dtype=dt32)
        M = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 1.0,
                                0.0, dtype=dt32)
        Alpha, Beta, Gamma, Zeta = get_fe_time_weights(
            TimeStepType.DG, fe_degree, tau, n_at_once)
        matrix = SystemMatrix(K, M, Alpha, Beta)
        rhs_matrix = SystemMatrix(K, M, np.zeros_like(Gamma), Gamma)
        gmg = build_stmg(mesh, fe_degree, space_degree, TimeStepType.DG,
                         n_at_once, tau, dtype=dt32, fe_degree_min=1,
                         params=GMGParams(smoothing_steps=1,
                                          smoother_inner_iterations=2,
                                          skip_identity_levels=True,
                                          vanka_bf16=True, level_bf16=True,
                                          eig_proxy_cells=4),
                         eig_device=tpu)
        force = ForceAssembler(mesh, space_degree, space_degree + 1,
                               lambda p, t: heat_problem.rhs(p, t, 1.0),
                               K.mask_np, dtype=dt32)
        K64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                  0.0, 1.0, dtype=jnp.float64)
        M64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                  1.0, 0.0, dtype=jnp.float64)
        struct64 = SystemMatrix._detect_step_structure(
            np.asarray(Alpha), np.asarray(Beta))
        nt64, A0_, A1_, B0_, B1_ = struct64
        # rectangular fused step form (bench.py): one banded pair over
        # [prev_last, step blocks]
        A04 = np.concatenate([A1_[:, -1:], A0_], axis=1)
        B04 = np.concatenate([B1_[:, -1:], B0_], axis=1)
        m64 = SystemMatrix(K64, M64, A04, B04)
        r64 = SystemMatrix(K64, M64, np.zeros_like(Gamma), Gamma)
        force64 = ForceAssembler(mesh, space_degree, space_degree + 1,
                                 lambda p, t: heat_problem.rhs(p, t, 1.0),
                                 K.mask_np, dtype=jnp.float64)
    print(f"# setup {time.time() - t0:.1f}s", flush=True)

    n_blocks = Alpha.shape[0]
    shape = (n_blocks,) + mesh.dof_shape(space_degree)
    tq = get_time_quad(TimeStepType.DG, fe_degree)[0]
    nt = len(tq)
    t_offsets = np.array([tau * (row // nt) + tau * float(tq[row % nt])
                          for row in range(n_blocks)], np.float32)
    f_scales = np.array([Alpha[row, row] for row in range(n_blocks)],
                        np.float32)
    maxiter = 24 if cells >= 16 else 18
    ir_rtol = 3e-4 if cells >= 16 else 2e-3

    def solve_slab(prev_x, t, rtol, mi):
        rhs = rhs_matrix.vmult(prev_x[None])
        rhs = rhs + force.batched(t + jnp.asarray(t_offsets),
                                  jnp.asarray(f_scales))
        x0 = jnp.broadcast_to(prev_x, shape)
        res = fgmres(matrix.vmult, rhs, x0, precondition=gmg.vmult,
                     maxiter=mi, abstol=1e-30, reltol=rtol,
                     reorthogonalize=True)
        return res.x, res.iterations

    # the bench stops the first solve at the f32 true-residual floor
    rtol1 = 4e-6 if cells <= 8 else 1.5e-5
    jit_solve = jax.jit(lambda p, t: solve_slab(p, t, rtol1, maxiter))

    def _resid_stepwise(rhs64, x):
        ntb = int(m64.Alpha.shape[0])
        sshape = (n_blocks // ntb, ntb) + x.shape[1:]
        xs = x.reshape(sshape)
        prev = jnp.concatenate(
            [jnp.zeros_like(xs[:1, -1:]), xs[:-1, -1:]], axis=0)
        xin = jnp.concatenate([prev, xs], axis=1)
        rh = rhs64.reshape(sshape)

        def body(carry, inp):
            xi, rhi = inp
            return carry, rhi - m64.vmult(xi)

        _, rs = jax.lax.scan(body, None, (xin, rh))
        r = rs.reshape(x.shape)
        return r, jnp.linalg.norm(r.reshape(-1))

    @jax.jit
    def jit_resid64(prev64, x, fslab64):
        rhs64 = r64.vmult(prev64[None]) + fslab64
        return _resid_stepwise(rhs64, x)

    @jax.jit
    def jit_correct(r, rnorm):
        r32 = (r / rnorm).astype(jnp.float32)
        res = fgmres(matrix.vmult, r32, jnp.zeros_like(r32),
                     precondition=gmg.vmult, maxiter=10,
                     abstol=1e-30, reltol=ir_rtol, reorthogonalize=True)
        return res.x, res.iterations

    @jax.jit
    def jit_update(x, rnorm, corr):
        return x + rnorm * corr.astype(jnp.float64)

    with jax.default_device(cpu):
        coords = jnp.asarray(mesh.dof_coordinates(space_degree), dt32)
        prev32 = heat_problem.exact_solution(coords, 0.0, 1.0).astype(dt32)
        t_off64 = np.array([tau * (row // nt) + tau * float(tq[row % nt])
                            for row in range(n_blocks)], np.float64)
        fslab64 = force64.batched(jnp.asarray(t_off64),
                                  jnp.asarray(f_scales, np.float64))
    matrix, rhs_matrix, gmg, force, m64, r64 = jax.device_put(
        (matrix, rhs_matrix, gmg, force, m64, r64), tpu)
    prev32 = jax.device_put(prev32, tpu)
    fslab64 = jax.device_put(fslab64, tpu)

    def timeit(name, fn, n=3):
        out = fn()
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(
                a, "block_until_ready") else a, out)
        # force a readback (tunnel-safe completion)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf) if hasattr(leaf, "sum") else 0.0)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf))
        dt = (time.time() - t0) / n
        print(f"{name:28s} {dt * 1e3:9.1f} ms", flush=True)
        return out

    t = np.float32(0.0)
    (x32, it) = timeit("f32 solve (1e-8)", lambda: jit_solve(prev32, t))
    print(f"   iters {int(it)}")
    x = x32.astype(jnp.float64)
    prev64 = prev32.astype(jnp.float64)
    (r, rnorm) = timeit("f64 stepwise residual",
                        lambda: jit_resid64(prev64, x, fslab64))
    (corr, extra) = timeit("f32 correction solve",
                           lambda: jit_correct(r, rnorm))
    print(f"   correction iters {int(extra)}")
    _ = timeit("f64 update", lambda: jit_update(x, rnorm, corr))


if __name__ == "__main__":
    main()
