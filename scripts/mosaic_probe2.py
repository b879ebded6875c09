"""Bisect the chain3 'unsupported shape cast': replicate its exact op
sequence on the real shapes, stage by stage."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
import os
DT = jnp.float32 if os.environ.get("DT") == "f32" else jnp.bfloat16


def run(name, kernel, out_shape, inputs, dtype=DT):
    try:
        args = [jnp.asarray(a, dtype) for a in inputs]
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = np.asarray(jax.jit(f)(*args).astype(jnp.float32))
        print(f"{name}: OK (|y| {np.abs(y).max():.3f})", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


G = 2
X = rng.standard_normal((G, 65, 65, 65))
W = rng.standard_normal((80, 65))


def k_s1(x_ref, w_ref, o_ref):
    x = x_ref[:]
    y = jax.lax.dot_general(x.reshape(G * 65 * 65, 65), w_ref[:].T,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = y.astype(x.dtype).reshape(G, 65, 65, 80)


run("stage1 4D merge+dot+split", k_s1, (G, 65, 65, 80), [X, W])


def k_s1b(x_ref, w_ref, o_ref):
    # no reshape at all: 4D dot on minormost
    y = jax.lax.dot_general(x_ref[:], w_ref[:].T, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = y.astype(x_ref.dtype)


run("stage1 4D direct dot", k_s1b, (G, 65, 65, 80), [X, W])

Y1 = rng.standard_normal((G, 65, 65, 80))


def k_s2(x_ref, w_ref, o_ref):
    y = jnp.swapaxes(x_ref[:], 2, 3)           # [G,65,80,65]
    y = jax.lax.dot_general(y, w_ref[:].T, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = y.astype(x_ref.dtype)           # [G,65,80,80]


run("stage2 swap+4D dot", k_s2, (G, 65, 80, 80), [Y1, W])


def k_s2b(x_ref, w_ref, o_ref):
    # sublane contraction, no swap: contract dim 2 (65) of [G,65,65,80]
    y = jax.lax.dot_general(x_ref[:], w_ref[:],
                            (((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # y: [G, 65, 80lane?, 80]: dims (G,65,80) x (80,) -> [G,65,80,80]
    o_ref[:] = y.astype(x_ref.dtype)


run("stage2 sublane-contract dot", k_s2b, (G, 65, 80, 80), [Y1, W])

Y2 = rng.standard_normal((G, 65, 80, 80))


def k_s3(x_ref, w_ref, o_ref):
    y = jnp.transpose(x_ref[:], (0, 2, 3, 1))  # [G,80,80,65]
    y = jax.lax.dot_general(y, w_ref[:].T, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = y.astype(x_ref.dtype)


run("stage3 cyclic transpose+dot", k_s3, (G, 80, 80, 80), [Y2, W])


def k_s3b(x_ref, w_ref, o_ref):
    # contract the SECOND dim (65, leading) directly
    y = jax.lax.dot_general(x_ref[:], w_ref[:],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # y: [G, 80, 80, 80] (contracted dim1, appended w dim0)
    o_ref[:] = y.astype(x_ref.dtype)


run("stage3 lead-contract dot", k_s3b, (G, 80, 80, 80), [Y2, W])


def k_all(x_ref, w_ref, o_ref):
    x = x_ref[:]
    y = jax.lax.dot_general(x, w_ref[:].T, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(DT)
    y = jnp.swapaxes(y, 2, 3)
    y = jax.lax.dot_general(y, w_ref[:].T, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(DT)
    y = jnp.transpose(y, (0, 2, 3, 1))
    y = jax.lax.dot_general(y, w_ref[:].T, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(DT)
    o_ref[:] = y


run("full 3-stage (direct dots, transposes)", k_all, (G, 80, 80, 80),
    [X, W])
