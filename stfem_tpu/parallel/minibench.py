"""Bench-scale sharded mini-bench: the multi-chip validation path.

Runs the SAME solver composition as the headline bench (3D heat, Q4 space x
dG(2) time, temporal blocking, glue-free Richardson first solve stopped at
the f32 floor, high-precision IR correction and true-residual verification (f64 on CPU))
with the block vector sharded over a 2- or 3-axis spatial device mesh and
the per-level sharding policy installed (fine levels sharded, coarse levels
replicated -- the analogue of the reference's per-level partitioners /
repartitioning, include/stmg.h:563-586).

Validates (VERDICT r2 #5):
  * a 3D Q4 x dG(2) slab solve (>= 8^3 cells, ntao >= 8) converges to TRUE
    rel <= 1e-8 under the sharded hierarchy, ff residual included;
  * iteration parity with the single-device (unsharded) run;
  * the compiled HLO's collective mix (all-reduce / collective-permute /
    all-gather counts) is reported.

Used by __graft_entry__.dryrun_multichip and tests/test_multichip_bench.py
(8 virtual CPU devices).  The geometry mirrors the reference's MPI domain
decomposition (SURVEY.md section 2.4): spatial axes sharded, time blocks
replicated, halo exchange inserted by GSPMD over the mesh axes.
"""
from __future__ import annotations

import re

import numpy as np


def run_sharded_minibench(n_devices: int | None = None, cells: int = 8,
                          ntao: int = 8, fe_degree: int = 2,
                          space_degree: int = 4, shard_z: bool = True,
                          compare_single: bool = True,
                          rtol1: float = 2e-5, ir_rtol: float = 1e-3,
                          min_dofs_per_device: int = 2048,
                          verbose: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from ..integrators import ForceAssembler
    from ..krylov import richardson_solve
    from ..mesh.grid import StructuredMesh
    from ..ops.floatfloat import ff_add_f32, ff_from_f64
    from ..ops.spatial import LaplaceMassOperator
    from ..problems import heat as heat_problem
    from ..stmg.gmg import GMGParams, build_stmg
    from ..system import SystemMatrix
    from ..time.tables import get_fe_time_weights, get_time_quad
    from ..types import TimeStepType
    from .sharding import (block_vector_spec, install_level_shardings,
                           level_sharding_policy, spatial_mesh)

    if n_devices is None:
        n_devices = len(jax.devices())
    refinement = int(np.log2(cells // 2))
    mesh = StructuredMesh([2] * 3, [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    tau = 1.0 / 16.0
    dtype = jnp.float32
    K = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 0.0, 1.0,
                            dtype=dtype)
    M = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 1.0, 0.0,
                            dtype=dtype)
    Alpha, Beta, Gamma, _ = get_fe_time_weights(
        TimeStepType.DG, fe_degree, tau, ntao)
    matrix = SystemMatrix(K, M, Alpha, Beta)
    rhs_matrix = SystemMatrix(K, M, np.zeros_like(Gamma), Gamma)
    gmg = build_stmg(mesh, fe_degree, space_degree, TimeStepType.DG, ntao,
                     tau, dtype=dtype, fe_degree_min=1,
                     params=GMGParams(smoothing_steps=1, variable=False,
                                      smoother_inner_iterations=2,
                                      skip_identity_levels=True,
                                      coarse_grid_smoother_type="Direct",
                                      eig_proxy_cells=4))
    force = ForceAssembler(mesh, space_degree, space_degree + 1,
                           lambda p, t: heat_problem.rhs(p, t, 1.0),
                           K.mask_np, dtype=dtype)
    # high-precision residual: the f64 discretization (CPU-native f64;
    # rectangular per-step tables fusing the one-step coupling, the same
    # form as the bench's stepwise residual)
    import jax as _jax
    x64_was = bool(_jax.config.jax_enable_x64)
    if not x64_was:
        _jax.config.update("jax_enable_x64", True)
    K64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 0.0,
                              1.0, dtype=jnp.float64)
    M64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 1.0,
                              0.0, dtype=jnp.float64)
    n_blocks = Alpha.shape[0]
    nt64 = n_blocks // ntao
    struct = SystemMatrix._detect_step_structure(
        np.asarray(Alpha, np.float64), np.asarray(Beta, np.float64))
    assert struct is not None
    _, A0_, A1_, B0_, B1_ = struct
    A04 = np.concatenate([A1_[:, -1:], A0_], axis=1)
    B04 = np.concatenate([B1_[:, -1:], B0_], axis=1)
    matrix64 = SystemMatrix(K64, M64, A04, B04)
    rhs_matrix64 = SystemMatrix(K64, M64, np.zeros_like(Gamma),
                                np.asarray(Gamma, np.float64))
    # sharded halo mode, PROGRAMMATIC (ADVICE r4: no process-global env
    # mutation): flip every Kronecker apply to the banded pad+slice form,
    # which GSPMD lowers to one-hop collective-permute halo exchanges
    # instead of full-array all-reduces (ops/kronfac, VERDICT r3 #4).
    # Enabled BEFORE the single-device comparison run so the two runs use
    # the identical apply form (exact iteration parity); the GMG gets it
    # again (idempotently) from install_level_shardings below.
    from .sharding import enable_halo_mode
    enable_halo_mode(matrix, rhs_matrix, matrix64, rhs_matrix64, gmg,
                     force)
    shape = (n_blocks,) + mesh.dof_shape(space_degree)

    tq = get_time_quad(TimeStepType.DG, fe_degree)[0]
    nt = len(tq)
    t_off = np.array([tau * (row // nt) + tau * float(tq[row % nt])
                      for row in range(n_blocks)], np.float32)
    f_sc = np.array([Alpha[row, row] for row in range(n_blocks)], np.float32)

    coords = np.asarray(mesh.dof_coordinates(space_degree))
    prev_np = np.asarray(heat_problem.exact_solution(
        jnp.asarray(coords, jnp.float64), 0.0, 1.0), np.float64)
    # ff force pair from an exact f64 assembly (the solve itself uses the
    # f32 ForceAssembler above)
    f_slab64 = ForceAssembler(mesh, space_degree, space_degree + 1,
                              lambda p, t: heat_problem.rhs(p, t, 1.0),
                              K.mask_np, dtype=jnp.float64).batched(
        jnp.asarray(t_off, jnp.float64), jnp.asarray(f_sc, jnp.float64))
    fslab_ff = ff_from_f64(f_slab64)
    prev_ff = ff_from_f64(jnp.asarray(prev_np))
    # x64 stays ENABLED: the residual stage runs in native f64 on CPU

    # the IR pipeline as SEPARATE jitted stages, mirroring bench.py's
    # consolidation: one big outer-solver executable with reltol traced
    # (shared by first solve and correction) + a residual executable.
    # A single fused mega-program (round-3 first attempt) did not finish
    # compiling on XLA:CPU within an hour on a 1-core host.
    def build_stages(constrain):
        c = (lambda a: a) if constrain is None else constrain

        @jax.jit
        def jit_rhs(prev_hi):
            return c(rhs_matrix.vmult(prev_hi[None]) + force.batched(
                jnp.asarray(t_off), jnp.asarray(f_sc)))

        @jax.jit
        def jit_outer(rhs, x0, reltol):
            res = richardson_solve(matrix.vmult, rhs, c(x0), gmg.vmult,
                                   maxiter=40, abstol=1e-30, reltol=reltol)
            return c(res.x), res.iterations

        # high-precision IR residual.  On CPU float64 is NATIVE, so the
        # residual uses the f64 discretization directly (the reference's
        # own outer precision, time_integrators.h:56-59) -- bitwise
        # stronger than the TPU bench's float-float engine, whose ~2000-op
        # ff graph also compiles pathologically slowly on XLA:CPU
        # (>13 min measured standalone; the ff path stays TPU-only and is
        # exercised by bench.py on the real chip).
        @jax.jit
        def jit_resid(prev_hi, prev_lo, xh, xl, fhi, flo):
            x64 = (xh.astype(jnp.float64)
                   + xl.astype(jnp.float64)).reshape(
                       (ntao, nt64,) + shape[1:])
            prev64 = prev_hi.astype(jnp.float64) \
                + prev_lo.astype(jnp.float64)
            f64 = fhi.astype(jnp.float64) + flo.astype(jnp.float64)
            rhs64 = rhs_matrix64.vmult(prev64[None]) + f64
            xprev = jnp.concatenate(
                [jnp.zeros_like(x64[:1, -1:]), x64[:-1, -1:]], axis=0)
            xin = jnp.concatenate([xprev, x64], axis=1)
            rh = rhs64.reshape(x64.shape)

            def body(carry, inp):
                xi, rhi = inp
                return carry, rhi - matrix64.vmult(xi)

            _, rs = jax.lax.scan(body, None, (xin, rh))
            r = rs.reshape(shape)
            rnorm = jnp.linalg.norm(r.reshape(-1))
            bn = jnp.linalg.norm(rhs64.reshape(-1))
            return c((r / rnorm).astype(jnp.float32)), rnorm, bn

        @jax.jit
        def jit_update(xh, xl, rnorm, corr):
            h, l = ff_add_f32((xh, xl), rnorm * corr)
            return c(h), c(l)

        return jit_rhs, jit_outer, jit_resid, jit_update

    def run_slab(stages, prev_hi, prev_lo, fhi, flo):
        jit_rhs, jit_outer, jit_resid, jit_update = stages
        rhs = jit_rhs(prev_hi)
        x, it1 = jit_outer(rhs, jnp.broadcast_to(prev_hi, shape), rtol1)
        xh, xl = x, jnp.zeros_like(x)
        r32, rnorm, _bn = jit_resid(prev_hi, prev_lo, xh, xl, fhi, flo)
        corr, it2 = jit_outer(r32, jnp.zeros_like(r32), ir_rtol)
        xh, xl = jit_update(xh, xl, rnorm, corr)
        _r2, rn2, bn2 = jit_resid(prev_hi, prev_lo, xh, xl, fhi, flo)
        return int(it1) + int(it2), float(rn2) / float(bn2)

    out = {}
    if compare_single:
        its1, rel1 = run_slab(build_stages(None),
                              jnp.asarray(prev_ff[0]),
                              jnp.asarray(prev_ff[1]),
                              fslab_ff[0], fslab_ff[1])
        out["single_iters"] = int(its1)
        out["single_true_rel"] = float(rel1)
        if verbose:
            print(f"# minibench single-device: {int(its1)} total V-cycle "
                  f"steps, true rel {float(rel1):.2e}", flush=True)

    dev_mesh = spatial_mesh(n_devices, dim=3, shard_z=shard_z)
    spec = block_vector_spec(dev_mesh, dim=3)
    sharding = NamedSharding(dev_mesh, spec)
    install_level_shardings(
        gmg, level_sharding_policy(dev_mesh, gmg,
                                   min_dofs_per_device=min_dofs_per_device))

    def constrain(a):
        if a.ndim == len(shape):
            return jax.lax.with_sharding_constraint(a, sharding)
        return a

    msizes = dict(zip(dev_mesh.axis_names, dev_mesh.devices.shape))

    with dev_mesh:
        # inputs enter REPLICATED (odd dof extents 2^r k + 1 are not
        # divisible by the mesh axes, which explicit input shardings
        # require); the with_sharding_constraint calls inside the stages
        # distribute everything -- GSPMD handles uneven shard sizes freely
        # inside the program
        ph = jnp.asarray(prev_ff[0])
        plo = jnp.asarray(prev_ff[1])
        fhi, flo = fslab_ff
        stages = build_stages(constrain)
        # collective mix of the dominant executable (the shared outer
        # solve: matvec + V-cycle under the per-level sharding policy)
        rhs0 = stages[0](ph)
        lowered = stages[1].lower(rhs0, jnp.broadcast_to(ph, shape),
                                  rtol1)
        hlo = lowered.compile().as_text()
        counts = {name: len(re.findall(rf"{name}(?:-start)?", hlo))
                  for name in ("all-reduce", "collective-permute",
                               "all-gather", "reduce-scatter",
                               "all-to-all")}
        its, rel = run_slab(stages, ph, plo, fhi, flo)
        out.update(sharded_iters=int(its), sharded_true_rel=float(rel),
                   mesh=msizes, collectives=counts,
                   cells=cells, ntao=ntao, n_blocks=int(n_blocks),
                   space_dofs=int(np.prod(shape[1:])))
    out["converged"] = out["sharded_true_rel"] <= 1e-8
    if compare_single:
        out["iter_parity"] = out["sharded_iters"] == out["single_iters"]
    if verbose:
        print(f"# minibench sharded: mesh {msizes}, {out['sharded_iters']} "
              f"total V-cycle steps, true rel {out['sharded_true_rel']:.2e},"
              f" collectives {counts}", flush=True)
    return out
