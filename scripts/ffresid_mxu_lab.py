"""On-TPU A/B: FFSlabResidual with the VPU roll-chain kron (xla) vs the
MXU exact-sliced kron (mxukron.py), at the bench shape.

Times with the two-window subtraction (tunnel-safe) and checks the two
engines agree to ff accuracy.  Usage:
    CELLS=16 NTAO=32 python scripts/ffresid_mxu_lab.py
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

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.floatfloat import FFSlabResidual, ff_from_f64
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells = int(os.environ.get("CELLS", "16"))
    ntao = int(os.environ.get("NTAO", "32"))
    mode = os.environ.get("STFEM_FF_RESID_MODE", "step")
    fe_degree, space_degree = 2, 4
    tau = 1.0 / 16.0
    refinement = int(np.log2(cells // 2))
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                              refinement=refinement)
        K64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                  0.0, 1.0, dtype=jnp.float64)
        M64 = LaplaceMassOperator(mesh, space_degree, space_degree + 1,
                                  1.0, 0.0, dtype=jnp.float64)
        Alpha, Beta, Gamma, _ = get_fe_time_weights(
            TimeStepType.DG, fe_degree, tau, ntao)
        engines = {}
        for name in os.environ.get("ENGINES", "xla,mxu").split(","):
            os.environ["STFEM_FF_KRON"] = name
            engines[name] = FFSlabResidual(K64, M64, Alpha, Beta, Gamma)
        nb = Alpha.shape[0]
        shape = (nb,) + mesh.dof_shape(space_degree)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape), jnp.float64)
        prev = jnp.asarray(rng.standard_normal(shape[1:]), jnp.float64)
        fslab = jnp.asarray(rng.standard_normal(shape), jnp.float64)
        args = tuple(ff_from_f64(a) for a in (prev, x, fslab))
    args = jax.device_put(args, tpu)
    print(f"shape {shape} ({int(np.prod(shape))} dof) mode={mode}",
          flush=True)

    outs = {}
    for name, eng in engines.items():
        eng_d = jax.device_put(eng, tpu)
        fn = jax.jit(lambda p, xx, f, e=eng_d: e.residual(p, xx, f,
                                                          mode=mode))
        t0 = time.time()
        r = fn(*args)
        rn = float(r[1])
        print(f"{name}: compile+first {time.time() - t0:.1f}s  "
              f"|r| {rn:.6e}", flush=True)
        outs[name] = rn

        def run(n):
            t0 = time.time()
            s = 0.0
            for _ in range(n):
                rr = fn(*args)
                s += float(rr[1])   # forced readback per call
            return time.time() - t0

        run(2)
        n1, n2 = 4, 12
        t1, t2 = run(n1), run(n2)
        dt = (t2 - t1) / (n2 - n1) * 1000
        print(f"{name}: {dt:.1f} ms/residual  (windows {t1:.2f}/{t2:.2f}s)",
              flush=True)
    vals = list(outs.values())
    rel = (max(vals) - min(vals)) / max(vals)
    print(f"norm agreement: rel {rel:.2e}")


if __name__ == "__main__":
    main()
