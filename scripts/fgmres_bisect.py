"""Bisect the outer FGMRES per-iteration cost on-chip (no preconditioner):
time 10-iteration loops with components progressively removed to find
where the ~21 ms/iter of non-matvec cost sits (16^3: noprec 26.7 ms/iter
vs ~6 ms matvec + ~5 ms theoretical basis traffic).

Variants:
  full        -- fgmres as shipped (CGS2, chunked prefix)
  cgs1        -- single GS pass
  nogs        -- no GS at all (matvec + norm + Givens glue only)
  nogivens    -- CGS2 but no Givens/rotation bookkeeping
  matvec_only -- bare A(v) chain in a fori_loop
  noz         -- full but Z never written
Usage: STFEM_BENCH_CELLS=16 python scripts/fgmres_bisect.py
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
    import jax.numpy as jnp
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "16"))
    n_at_once = int(os.environ.get("STFEM_BENCH_NTAO", "32"))
    iters = int(os.environ.get("STFEM_PROBE_ITERS", "10"))
    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, 4, 5, 0.0, 1.0, dtype=jnp.float32)
        M = LaplaceMassOperator(mesh, 4, 5, 1.0, 0.0, dtype=jnp.float32)
        A_, B_, _, _ = get_fe_time_weights(
            TimeStepType.DG, 2, 1.0 / 16, n_at_once)
        matrix = SystemMatrix(K, M, A_, B_)
    matrix = jax.device_put(matrix, tpu)
    shape = (A_.shape[0],) + tuple(mesh.dof_shape(4))
    b = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), jnp.float32), tpu)
    n = b.size
    m = iters
    CH = 8
    m_pad = ((m + 1 + CH - 1) // CH) * CH

    A = matrix.vmult

    def loop(b_, gs_passes, givens, write_z, use_chunks):
        dtype = b_.dtype
        r0 = b_
        beta = jnp.linalg.norm(r0.reshape(-1))
        V = jnp.zeros((m_pad, n), dtype)
        Z = jnp.zeros((m, n), dtype)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        vnext = (r0 / beta).reshape(-1)

        def body(j, state):
            V, Z, H, cs, sn, g, vnext = state
            V = jax.lax.dynamic_update_slice_in_dim(
                V, vnext[None], j, 0)
            v = vnext.reshape(shape)
            w = A(v).reshape(-1)
            if write_z:
                Z = Z.at[j].set(v.reshape(-1))

            n_active = j // CH + 1

            def gs_pass(w):
                if use_chunks:
                    def hc_body(c, h):
                        blk = jax.lax.dynamic_slice_in_dim(V, c * CH, CH, 0)
                        return jax.lax.dynamic_update_slice_in_dim(
                            h, blk @ w, c * CH, 0)
                    h = jax.lax.fori_loop(0, n_active, hc_body,
                                          jnp.zeros(V.shape[0], dtype))

                    def proj_body(c, wv):
                        blk = jax.lax.dynamic_slice_in_dim(V, c * CH, CH, 0)
                        hc = jax.lax.dynamic_slice_in_dim(h, c * CH, CH, 0)
                        return wv - blk.T @ hc
                    w = jax.lax.fori_loop(0, n_active, proj_body, w)
                else:
                    h = V @ w
                    w = w - V.T @ h
                return h, w

            with jax.default_matmul_precision("highest"):
                h = jnp.zeros(m_pad, dtype)
                for _ in range(gs_passes):
                    hp, w = gs_pass(w)
                    h = h + hp
                h = h[: m + 1]
                wnorm = jnp.linalg.norm(w)
            h = h.at[j + 1].add(wnorm)
            vnext = w / jnp.where(wnorm == 0, 1, wnorm)

            if givens:
                def rot_body(i, hcol):
                    hi = hcol[i]
                    hip = hcol[i + 1]
                    new_hi = cs[i] * hi + sn[i] * hip
                    new_hip = -sn[i] * hi + cs[i] * hip
                    pred = i < j
                    hcol = hcol.at[i].set(jnp.where(pred, new_hi, hi))
                    hcol = hcol.at[i + 1].set(jnp.where(pred, new_hip, hip))
                    return hcol

                h = jax.lax.fori_loop(0, m, rot_body, h)
                denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
                c_new = h[j] / jnp.where(denom == 0, 1, denom)
                s_new = h[j + 1] / jnp.where(denom == 0, 1, denom)
                cs = cs.at[j].set(c_new)
                sn = sn.at[j].set(s_new)
                H = H.at[:, j].set(h[: m + 1])
                g_j = g[j]
                g = g.at[j].set(c_new * g_j)
                g = g.at[j + 1].set(-s_new * g_j)
            return V, Z, H, cs, sn, g, vnext

        state = (V, Z, H, cs, sn, g, vnext)
        state = jax.lax.fori_loop(0, m, body, state)
        return state[-1]

    def matvec_only(b_):
        def body(i, acc):
            return A(acc.reshape(shape)).reshape(-1) / jnp.linalg.norm(
                acc) + 1e-30
        return jax.lax.fori_loop(0, m, body, b_.reshape(-1))

    from stfem_tpu.krylov import fgmres

    def shipped(b_, mm):
        res = fgmres(A, b_, jnp.zeros_like(b_), precondition=None,
                     maxiter=mm, abstol=1e-30, reltol=1e-30,
                     reorthogonalize=True)
        return res.x

    variants = {
        "matvec_only": jax.jit(matvec_only),
        "shipped_m10": jax.jit(lambda v: shipped(v, m)),
        "shipped_m24": jax.jit(lambda v: shipped(v, 24)),
        "full": jax.jit(lambda v: loop(v, 2, True, True, True)),
        "cgs1": jax.jit(lambda v: loop(v, 1, True, True, True)),
        "nogs": jax.jit(lambda v: loop(v, 0, True, True, True)),
        "nogivens": jax.jit(lambda v: loop(v, 2, False, True, True)),
        "noz": jax.jit(lambda v: loop(v, 2, True, False, True)),
        "nochunks": jax.jit(lambda v: loop(v, 2, True, True, False)),
    }
    out = {}
    readback = None
    for name, f in variants.items():
        r = f(b)
        _ = float(jnp.sum(r))       # compile + drain transfers
        if readback is None:
            _ = float(jnp.sum(b))   # compile the readback program itself
            t0 = time.time()
            _ = float(jnp.sum(b))
            readback = time.time() - t0
        t0 = time.time()
        r = f(b)
        _ = float(jnp.sum(r))
        denom = 24 if name.endswith("m24") else m
        ms = (time.time() - t0 - readback) / denom * 1e3
        out[name] = ms
        print(f"{name:12s} {ms:8.2f} ms/iter", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
