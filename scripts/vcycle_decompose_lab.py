"""Decompose the V-cycle fine-level cost at the bench shape (16^3, ntao=32,
bf16 levels): time each sub-stage of the grid Vanka apply and the grid
matvec with a tunnel-robust harness (large n, readback-subtracted,
median of 3).  This tells us WHERE the ~31 ms/Richardson-step actually
goes before writing any more kernels."""
from __future__ import annotations

import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

N_IT = int(os.environ.get("N_IT", "30"))


def timeit(f, *args, n=N_IT):
    y = f(*args)
    y0 = y[0] if isinstance(y, tuple) else y
    _ = float(jnp.sum(y0.astype(jnp.float32)))   # compile + drain
    best = 1e9
    for _rep in range(3):
        t0 = time.time()
        _ = float(jnp.sum(y0.astype(jnp.float32)))
        rb = time.time() - t0
        t0 = time.time()
        for _i in range(n):
            y = f(*args)
        y0 = y[0] if isinstance(y, tuple) else y
        _ = float(jnp.sum(y0.astype(jnp.float32)))
        el = (time.time() - t0 - rb) / n
        best = min(best, el)
    return best


def main():
    cells = int(os.environ.get("STFEM_LAB_CELLS", "16"))
    ntao = int(os.environ.get("STFEM_LAB_NTAO", "32"))
    dt = jnp.bfloat16 if os.environ.get("STFEM_LAB_BF16", "1") == "1" \
        else jnp.float32

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.gridsumfac import GridSumFac, axis_apply
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.vanka import PreconditionVanka
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    refinement = int(np.log2(cells // 2))
    mesh = StructuredMesh([2] * 3, [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    k = 4
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, k, k + 1, 0.0, 1.0, dtype=dt)
        M = LaplaceMassOperator(mesh, k, k + 1, 1.0, 0.0, dtype=dt)
        Alpha, Beta, Gamma, Zeta = get_fe_time_weights(
            TimeStepType.DG, 2, 1.0 / 16, ntao)
        vanka = PreconditionVanka(K, M, Alpha, Beta, dtype=dt,
                                  storage_dtype=dt, n_steps=ntao)
        matrix = SystemMatrix(K, M, Alpha, Beta, precision=None)
        K32 = LaplaceMassOperator(mesh, k, k + 1, 0.0, 1.0,
                                  dtype=jnp.float32)
        M32 = LaplaceMassOperator(mesh, k, k + 1, 1.0, 0.0,
                                  dtype=jnp.float32)
        matrix32 = SystemMatrix(K32, M32, Alpha, Beta, precision=None)
    nb = Alpha.shape[0]
    shape = (nb,) + mesh.dof_shape(k)
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(shape).astype(np.float32)
    vanka, matrix, matrix32 = jax.device_put((vanka, matrix, matrix32), tpu)
    x = jax.device_put(jnp.asarray(x_np, dt), tpu)
    x32 = jax.device_put(jnp.asarray(x_np, jnp.float32), tpu)

    r = []

    def rep(name, ms):
        r.append((name, ms))
        print(f"{name:42s} {ms * 1e3:8.2f} ms", flush=True)

    # full applies
    rep("vanka.vmult (bf16)", timeit(jax.jit(lambda v, s: v.vmult(s)),
                                     vanka, x))
    rep("matrix.vmult (bf16 level op)",
        timeit(jax.jit(lambda m, s: m.vmult(s)), matrix, x))
    rep("matrix32.vmult (f32 outer op)",
        timeit(jax.jit(lambda m, s: m.vmult(s)), matrix32, x32))

    # vanka sub-stages
    Wdn = vanka.Wdn
    Wup = vanka.Wup

    @jax.jit
    def down(s):
        w = s.astype(vanka.dtype)
        for d in range(3):
            w = axis_apply(Wdn[d], w, 1 + d)
        return w

    w_dn = down(x)
    rep("  vanka down-chain", timeit(down, x))

    gshape = w_dn.shape[1:]
    N = int(np.prod(gshape))
    S, nt = vanka.n_steps, nb // vanka.n_steps
    ts_tile = vanka._ts_tile
    from stfem_tpu.ops.pallas_timesolve import time_solve_pallas

    @jax.jit
    def tsolve(w):
        wf = w.reshape(nb, N)
        wf = time_solve_pallas(wf, vanka.GinvT, vanka.cvecT, S, nt,
                               ts_tile, vanka.dtype)
        return wf.reshape((nb,) + gshape).astype(vanka.dtype)

    w_ts = tsolve(w_dn)
    rep("  vanka time-solve (pallas)", timeit(tsolve, w_dn))

    @jax.jit
    def up(w):
        for d in range(3):
            w = axis_apply(Wup[d], w, 1 + d)
        return w.astype(vanka.dtype)

    rep("  vanka up-chain", timeit(up, w_ts))

    # smoother composition: u = S(d) with 2 inner sweeps
    # (vanka, then vanka(d - A u)), as in RelaxationSmoother.vmult
    @jax.jit
    def relax2(m, v, d):
        u = 1.0 * v.vmult(d)
        return u + 1.0 * v.vmult(d - m.vmult(u))

    rep("relaxation 2-sweep (2 vanka + 1 matvec)",
        timeit(relax2, matrix, vanka, x))

    # ---- full V-cycle + richardson step + ff residual ----
    if os.environ.get("STFEM_LAB_FULL", "1") == "1":
        from stfem_tpu.stmg.gmg import GMGParams, build_stmg
        from stfem_tpu.ops.floatfloat import FFSlabResidual, ff_from_f64

        with jax.default_device(cpu):
            gmg = build_stmg(mesh, 2, k, TimeStepType.DG, ntao, 1.0 / 16,
                             dtype=jnp.float32, fe_degree_min=1,
                             params=GMGParams(
                                 smoothing_steps=1, variable=False,
                                 smoother_inner_iterations=2,
                                 skip_identity_levels=True,
                                 coarse_grid_smoother_type="Direct",
                                 vanka_bf16=True, level_bf16=True,
                                 eig_proxy_cells=4,
                                 no_post_smooth_finest=os.environ.get(
                                     "STFEM_LAB_NOPOST_FINE", "0") == "1"),
                             eig_device=tpu)
        gmg = jax.device_put(gmg, tpu)
        rep("gmg.vmult (full V-cycle)",
            timeit(jax.jit(lambda g, s: g.vmult(s)), gmg, x32))

        @jax.jit
        def rich_step(m, g, xx, b):
            rr = b - m.vmult(xx)
            return xx + g.vmult(rr), jnp.linalg.norm(rr.reshape(-1))

        b32 = jax.device_put(jnp.asarray(
            rng.standard_normal(shape), jnp.float32), tpu)
        rep("richardson step (matvec+norm+V-cycle)",
            timeit(rich_step, matrix32, gmg, x32, b32))

        if os.environ.get("STFEM_LAB_FF", "1") == "1":
            import jax as _jax
            _jax.config.update("jax_enable_x64", True)
            with jax.default_device(cpu):
                K64 = LaplaceMassOperator(mesh, k, k + 1, 0.0, 1.0,
                                          dtype=jnp.float64)
                M64 = LaplaceMassOperator(mesh, k, k + 1, 1.0, 0.0,
                                          dtype=jnp.float64)
                Gamma2 = Gamma
                ffres = FFSlabResidual(K64, M64, Alpha, Beta, Gamma2)
                fslab = ff_from_f64(jnp.zeros(shape, jnp.float64))
                prev_ff = ff_from_f64(
                    jnp.zeros(shape[1:], jnp.float64))
            ffres, fslab, prev_ff = jax.device_put(
                (ffres, fslab, prev_ff), tpu)

            @jax.jit
            def ff_resid(fr, pf, xh, fh, fl):
                (rh, _rl), rn, bn = fr.residual(pf, (xh,
                                                     jnp.zeros_like(xh)),
                                                (fh, fl))
                return rh, rn, bn

            rep("ff residual (scan over steps)",
                timeit(ff_resid, ffres, prev_ff, x32, fslab[0], fslab[1]))

    print("\nsummary:")
    for name, ms in r:
        print(f"  {name}: {ms * 1e3:.2f}")


if __name__ == "__main__":
    main()
