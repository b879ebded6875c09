"""On-chip timing of the Kronecker pair apply (K x, M x) variants:
dense MXU tensordot (default / highest precision, f32 and bf16) vs the
banded shifted-diagonal VPU form (f32, bf16).

The outer FGMRES matvec runs at f32-highest (3-pass bf16 emulation on the
MXU); if banded-f32 on the VPU is faster it wins TRUE f32 accuracy for
less.  Usage: STFEM_BENCH_CELLS=16 python scripts/kron_variant_probe.py
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
    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.kronfac import KronAssembled, _to_diags, \
        _banded_axis_apply
    from stfem_tpu.ops.spatial import LaplaceMassOperator

    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "16"))
    nb = int(os.environ.get("STFEM_BENCH_NTAO", "32")) * 3
    reps = int(os.environ.get("STFEM_PROBE_REPS", "30"))
    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    k = 4
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, k, k + 1, 0.0, 1.0, dtype=jnp.float32)
        M = LaplaceMassOperator(mesh, k, k + 1, 1.0, 0.0, dtype=jnp.float32)
        kr = KronAssembled(K, M, jnp.float32)
        Md = [jnp.asarray(_to_diags(np.asarray(m, np.float64), k),
                          jnp.float32) for m in kr.M1]
        Ad = [jnp.asarray(_to_diags(np.asarray(a, np.float64), k),
                          jnp.float32) for a in kr.A1]
    shape = (nb,) + tuple(mesh.dof_shape(k))
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), jnp.float32), tpu)
    kr = jax.device_put(kr, tpu)
    Md = jax.device_put(Md, tpu)
    Ad = jax.device_put(Ad, tpu)

    def banded_pair(x_, dt):
        xv = x_.astype(dt)
        dim = kr.dim
        lead = xv.ndim - dim
        val = xv
        ks = None
        for d in range(dim):
            ax = lead + d
            ap_m = partial(_banded_axis_apply, Md[d].astype(dt), axis=ax,
                           k=k)
            ap_a = partial(_banded_axis_apply, Ad[d].astype(dt), axis=ax,
                           k=k)
            ks = ap_a(val) if ks is None else ap_m(ks) + ap_a(val)
            if d < dim - 1:
                val = ap_m(val)
        mm = ap_m(val)
        return ks, mm

    def dense_pair(x_, dt, prec):
        xv = x_.astype(dt)
        krd = jax.tree.map(
            lambda a: a.astype(dt) if hasattr(a, "astype") else a, kr)
        if prec:
            with jax.default_matmul_precision(prec):
                return krd._pair_impl(xv, True, True, banded=False)
        return krd._pair_impl(xv, True, True, banded=False)

    variants = {
        "dense_f32_default": lambda v: dense_pair(v, jnp.float32, None),
        "dense_f32_highest": lambda v: dense_pair(v, jnp.float32, "highest"),
        "dense_bf16": lambda v: dense_pair(v, jnp.bfloat16, None),
        "banded_f32": lambda v: banded_pair(v, jnp.float32),
        "banded_bf16": lambda v: banded_pair(v, jnp.bfloat16),
    }

    # accuracy reference on CPU f64
    with jax.default_device(cpu):
        K64 = LaplaceMassOperator(mesh, k, k + 1, 0.0, 1.0,
                                  dtype=jnp.float32)
    out = {}
    ref_k = ref_m = None
    for name, fn in variants.items():
        f = jax.jit(lambda v, fn=fn: [t for t in fn(v)])
        r = f(x)
        _ = float(jnp.sum(r[0].astype(jnp.float32)))
        t0 = time.time()
        _ = float(jnp.sum(x))
        readback = time.time() - t0

        def loop(v):
            def body(i, acc):
                kk, mm = fn(acc)
                return acc + 1e-30 * (kk.astype(acc.dtype)
                                      + mm.astype(acc.dtype))
            return jax.lax.fori_loop(0, reps, body, v)

        lf = jax.jit(loop)
        r2 = lf(x)
        _ = float(jnp.sum(r2))          # compile
        t0 = time.time()
        r2 = lf(x)
        _ = float(jnp.sum(r2))
        dt_ms = (time.time() - t0 - readback) / reps * 1e3
        kk, mm = fn(x)
        if ref_k is None and name == "dense_f32_highest":
            ref_k = np.asarray(kk, np.float64)
            ref_m = np.asarray(mm, np.float64)
        err = ""
        if ref_k is not None and name != "dense_f32_highest":
            ek = np.abs(np.asarray(kk, np.float64) - ref_k).max() / \
                np.abs(ref_k).max()
            err = f"{ek:.2e}"
        out[name] = dt_ms
        print(f"{name:22s} {dt_ms:8.3f} ms  rel-err vs highest: {err}",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
