"""Diagnose the Stokes IR 1.8e-7 true-residual wall (round 5).

Runs the bench's Stokes IR composition at 8^3 with EXTRA instrumentation:
per-stage iteration counts, the ff residual split into u rows vs p rows,
and a SECOND and THIRD IR pass -- distinguishing a systematic
inconsistency (floor persists) from kappa-limited passes (floor divides).

Usage: python scripts/stokes_ir_probe.py  (on the TPU)
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

    from stfem_tpu.krylov import richardson_solve
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.mesh.fe import shape_data_1d
    from stfem_tpu.errors import quad_coordinates
    from stfem_tpu.ops.ff_stokes import build_ff_stokes_residual
    from stfem_tpu.ops.floatfloat import ff_add_f32, ff_from_f64
    from stfem_tpu.ops.spatial import (LaplaceMassOperator, _sumfac,
                                       cell_scatter)
    from stfem_tpu.ops.stokes import StokesOperator
    from stfem_tpu.stmg.gmg import GMGParams, build_stmg_stokes
    from stfem_tpu.system_stokes import StokesSystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights, get_time_quad
    from stfem_tpu.types import TimeStepType

    cells = int(os.environ.get("CELLS", "8"))
    ntao = int(os.environ.get("NTAO", "8"))
    steps = int(os.environ.get("STEPS", "2"))
    maxiter = int(os.environ.get("MAXITER", "80"))
    k, u_deg, p_deg, n_q, dim = 1, 2, 1, 3, 3
    nt = k + 1
    tau = 1.0 / 16.0
    dtype = jnp.float32
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        refinement = int(np.log2(cells // 2))
        mesh = StructuredMesh([2] * dim, [0.0] * dim, [1.0] * dim,
                              refinement=refinement)
        S = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0, dtype=dtype)
        Mu = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0, dtype=dtype,
                                 mask=S.mask_u_np)
        a, b, g, z = get_fe_time_weights(TimeStepType.DG, k, tau, ntao)
        matrix = StokesSystemMatrix(S, Mu, a, b)
        rhs_matrix = StokesSystemMatrix(S, Mu, a, b, gamma=None, zeta=g,
                                        type_=TimeStepType.DG)
        gmg = build_stmg_stokes(mesh, k, TimeStepType.DG, ntao, tau,
                                viscosity=1.0, dtype=dtype,
                                params=GMGParams(smoothing_range=5.0,
                                                 smoothing_steps=steps),
                                fe_degree_min=1)
        T = nt * ntao
        sd = shape_data_1d(u_deg, n_q)
        Sf = jnp.asarray(sd.S)
        geom = mesh.geometry(n_q, u_deg)
        jxw = jnp.asarray(geom.jxw)
        fcoords = jnp.asarray(quad_coordinates(mesh, n_q))
        tq = get_time_quad(TimeStepType.DG, k)[0]
        a1 = get_fe_time_weights(TimeStepType.DG, k, tau, 1)[0]

        def fvec(p, t):
            x, y_, z_ = p[..., 0], p[..., 1], p[..., 2]
            s = jnp.sin(np.pi * x) * jnp.sin(np.pi * y_) * jnp.sin(
                np.pi * z_) * jnp.sin(t + 0.3)
            return jnp.stack([s, 2.0 * s, -s], axis=-1)

        def force_u(t):
            f = fvec(fcoords, t)
            comps = []
            for c in range(dim):
                y = _sumfac([Sf] * dim, f[..., c] * jxw, dim, forward=False)
                comps.append(cell_scatter(y, mesh.cells, u_deg))
            return jnp.stack(comps, axis=0) * S.mask_u

        parts = []
        for it in range(ntao):
            for j, q in enumerate(tq):
                F = force_u(tau * it + tau * float(q))
                parts.append(F.reshape(-1) * float(a1[j, j]))
        flat_u = jnp.stack(parts)
        force = jnp.concatenate(
            [flat_u, jnp.zeros((T, S.n_p))], axis=1)
        prev0 = jnp.zeros(S.n_u + S.n_p, dtype)
        S64 = StokesOperator(mesh, u_deg, p_deg, n_q, 1.0,
                             dtype=jnp.float64)
        ffres = build_ff_stokes_residual(S64, a, b, zeta=g)
        fhi, flo = ff_from_f64(force.astype(jnp.float64))
    matrix, rhs_matrix, gmg, ffres, fhi, flo, prev0 = jax.device_put(
        (matrix, rhs_matrix, gmg, ffres, fhi, flo, prev0), tpu)
    n_flat = S.n_u + S.n_p
    prev_ff = (prev0, jnp.zeros_like(prev0))

    @jax.jit
    def jit_resid(x_hi, x_lo):
        (rh, rl), rn, bn = ffres.residual(prev_ff, (x_hi, x_lo),
                                          (fhi, flo))
        ru = jnp.linalg.norm(rh[:, :S.n_u].reshape(-1))
        rp = jnp.linalg.norm(rh[:, S.n_u:].reshape(-1))
        return (rh / rn).astype(jnp.float32), rn, bn, ru, rp

    @jax.jit
    def jit_solve(rhs, x0, reltol):
        mv = lambda v: matrix.vmult(v).astype(jnp.float32)
        pc = lambda v: gmg.vmult(v).astype(jnp.float32)
        res = richardson_solve(mv, rhs, x0, pc, maxiter=maxiter,
                               abstol=1e-30, reltol=reltol)
        return res.x, res.iterations, res.residual

    with jax.default_device(cpu):
        pass
    detj = float(np.prod(mesh.h))

    @jax.jit
    def jit_resid_at(prev_hi, prev_lo, x_hi, x_lo, fh, fl):
        (rh, rl), rn, bn = ffres.residual((prev_hi, prev_lo),
                                          (x_hi, x_lo), (fh, fl))
        ru = jnp.linalg.norm(rh[:, :S.n_u].reshape(-1))
        rp = jnp.linalg.norm(rh[:, S.n_u:].reshape(-1))
        return (rh / rn).astype(jnp.float32), rn, bn, ru, rp

    @jax.jit
    def jit_rhs_at(prev_hi, fh):
        pu = prev_hi[:S.n_u].reshape((dim,) + S.dof_shape_u)
        pp = prev_hi[S.n_u:].reshape(S.p_shape)
        return rhs_matrix.vmult_slice(pu, pp).astype(jnp.float32) + fh

    def mean_normalize(x):
        u_time, p_time = S.unpack(x)
        means = jnp.sum(p_time[..., 0],
                        axis=tuple(range(1, dim + 1))) * detj
        p_time = p_time.at[..., 0].add(-means.reshape((T,) + (1,) * dim))
        return S.pack(u_time, p_time)

    mode = os.environ.get("MODE", "single")
    if mode == "single":
        rhs32 = jit_rhs_at(prev0, fhi)
        t0 = time.time()
        x, it1, est1 = jit_solve(rhs32,
                                 jnp.broadcast_to(prev0, (T, n_flat)),
                                 np.float32(1e-9))
        x_ff = (x, jnp.zeros_like(x))
        r32, rn, bn, ru, rp = jit_resid(*x_ff)
        print(f"first solve: {int(it1)} iters, est {float(est1):.3e}, "
              f"TRUE {float(rn)/float(bn):.3e} (u {float(ru):.3e} "
              f"p {float(rp):.3e})  [{time.time()-t0:.0f}s]", flush=True)
        for p_i in range(3):
            c, it2, est2 = jit_solve(r32, jnp.zeros_like(r32),
                                     np.float32(2e-3))
            x_ff = ff_add_f32(x_ff, rn * c)
            r32, rn, bn, ru, rp = jit_resid(*x_ff)
            print(f"IR pass {p_i + 1}: {int(it2)} iters, est "
                  f"{float(est2):.3e}, TRUE {float(rn)/float(bn):.3e} "
                  f"(u {float(ru):.3e} p {float(rp):.3e})", flush=True)
        return

    # bench-exact 3-slab march: rtol1/ir_rtol like the bench derivation
    rtol1 = np.float32(float(os.environ.get("RTOL1", "8.26e-7")))
    ir_rtol = np.float32(float(os.environ.get("IR_RTOL", "2e-3")))
    x0_zero = os.environ.get("X0", "prev") == "zero"
    prev = (prev0, jnp.zeros_like(prev0))
    for i in range(3):
        rhs32 = jit_rhs_at(prev[0], fhi)
        x0 = (jnp.zeros((T, n_flat), jnp.float32) if x0_zero
              else jnp.broadcast_to(prev[0], (T, n_flat)))
        x, it1, est1 = jit_solve(rhs32, x0, rtol1)
        x_ff = (x, jnp.zeros_like(x))
        r32, rn, bn, ru, rp = jit_resid_at(prev[0], prev[1], x_ff[0],
                                           x_ff[1], fhi, flo)
        tr0 = float(rn) / float(bn)
        c, it2, est2 = jit_solve(r32, jnp.zeros_like(r32), ir_rtol)
        x_ff = ff_add_f32(x_ff, rn * c)
        _r2, rn2, bn2, ru2, rp2 = jit_resid_at(prev[0], prev[1], x_ff[0],
                                               x_ff[1], fhi, flo)
        print(f"slab {i}: first {int(it1)} iters est {float(est1):.3e} "
              f"true {tr0:.3e}; corr {int(it2)} iters est "
              f"{float(est2):.3e} -> TRUE {float(rn2)/float(bn2):.3e} "
              f"(u {float(ru2):.3e} p {float(rp2):.3e})", flush=True)
        xn = mean_normalize(x_ff[0])
        prev = (xn[-1], x_ff[1][-1])
    print("# NOTE: same fhi per slab (bench uses per-slab forces; "
          "irrelevant for the floor question)", flush=True)


if __name__ == "__main__":
    main()
