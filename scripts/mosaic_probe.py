"""Probe which layout/contraction primitives Mosaic supports on this jax
version (remote-compile axon, v5e), to design the fused chain kernels
within the rules.  Each probe compiles a tiny kernel and checks numerics
vs numpy; prints OK / FAIL(reason)."""
from __future__ import annotations

import traceback
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)


def run(name, kernel, out_shape, inputs, ref_fn, dtype=jnp.float32):
    try:
        args = [jnp.asarray(a, dtype) for a in inputs]
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        y = np.asarray(jax.jit(f)(*args), np.float64)
        ref = ref_fn(*[np.asarray(a, np.float64) for a in inputs])
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30)
        print(f"{name}: OK (rel err {err:.1e})", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


A3 = rng.standard_normal((8, 64, 128))
B2 = rng.standard_normal((128, 96))
A3o = rng.standard_normal((8, 65, 65))
B2o = rng.standard_normal((65, 80))
A4 = rng.standard_normal((2, 8, 64, 128))


def k_dot3d(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


run("dot3d_minormost (A[8,64,128] x B[128,96])", k_dot3d,
    (8, 64, 96), [A3, B2], lambda a, b: np.einsum("ijk,kl->ijl", a, b))


def k_dot3d_odd(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


run("dot3d_odd (A[8,65,65] x B[65,80])", k_dot3d_odd,
    (8, 65, 80), [A3o, B2o], lambda a, b: np.einsum("ijk,kl->ijl", a, b))


def k_dot4d(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


run("dot4d_minormost (A[2,8,64,128] x B[128,96])", k_dot4d,
    (2, 8, 64, 96), [A4, B2], lambda a, b: np.einsum("gijk,kl->gijl", a, b))


def k_dot3d_sublane(a_ref, b_ref, o_ref):
    # contract the SECOND-minor (sublane) dim
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


run("dot3d_sublane (A[8,64,128] c-dim1 x B[64,96])", k_dot3d_sublane,
    (8, 128, 96), [A3, rng.standard_normal((64, 96))],
    lambda a, b: np.einsum("ijk,jl->ikl", a, b))


def k_dot2d_TT(a_ref, b_ref, o_ref):
    # A^T B: contract sublanes x sublanes
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


run("dot2d_AtB (A[64,128]^T x B[64,96])", k_dot2d_TT,
    (128, 96), [rng.standard_normal((64, 128)),
                rng.standard_normal((64, 96))],
    lambda a, b: a.T @ b)


def k_batched(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


run("dot3d_batched (A[8,64,128] x B[8,128,96], batch dim0)", k_batched,
    (8, 64, 96), [A3, rng.standard_normal((8, 128, 96))],
    lambda a, b: np.einsum("bij,bjk->bik", a, b))


def k_swap_last2(a_ref, o_ref):
    o_ref[:] = jnp.swapaxes(a_ref[:], 1, 2)


run("swap_last2 (A[8,64,128] -> [8,128,64])", k_swap_last2,
    (8, 128, 64), [A3], lambda a: np.swapaxes(a, 1, 2))


def k_swap_last2_odd(a_ref, o_ref):
    o_ref[:] = jnp.swapaxes(a_ref[:], 1, 2)


run("swap_last2_odd (A[8,65,65])", k_swap_last2_odd,
    (8, 65, 65), [A3o], lambda a: np.swapaxes(a, 1, 2))


def k_swap4_last2(a_ref, o_ref):
    o_ref[:] = jnp.swapaxes(a_ref[:], 2, 3)


run("swap4_last2 (A[2,8,64,128] -> [2,8,128,64])", k_swap4_last2,
    (2, 8, 128, 64), [A4], lambda a: np.swapaxes(a, 2, 3))


def k_reshape_merge(a_ref, o_ref):
    o_ref[:] = a_ref[:].reshape(512, 128)


run("reshape_merge_aligned (A[8,64,128] -> [512,128])", k_reshape_merge,
    (512, 128), [A3], lambda a: a.reshape(512, 128))


def k_reshape_merge_odd(a_ref, o_ref):
    o_ref[:] = a_ref[:].reshape(8 * 65, 65)


run("reshape_merge_odd (A[8,65,65] -> [520,65])", k_reshape_merge_odd,
    (520, 65), [A3o], lambda a: a.reshape(520, 65))


def k_roll_lead_to_lane(a_ref, o_ref):
    o_ref[:] = jnp.transpose(a_ref[:], (1, 2, 0))


run("roll_lead_to_lane (A[8,64,128] -> [64,128,8])", k_roll_lead_to_lane,
    (64, 128, 8), [A3], lambda a: np.transpose(a, (1, 2, 0)))


def k_roll_lane_to_lead(a_ref, o_ref):
    o_ref[:] = jnp.transpose(a_ref[:], (2, 0, 1))


run("roll_lane_to_lead (A[8,64,128] -> [128,8,64])", k_roll_lane_to_lead,
    (128, 8, 64), [A3], lambda a: np.transpose(a, (2, 0, 1)))


def k_perm_lead(a_ref, o_ref):
    o_ref[:] = jnp.transpose(a_ref[:], (1, 0, 2, 3))


run("perm_leading (A[2,8,64,128] -> [8,2,64,128])", k_perm_lead,
    (8, 2, 64, 128), [A4], lambda a: np.transpose(a, (1, 0, 2, 3)))


def k_swap_mid(a_ref, o_ref):
    # move a leading dim into sublanes: (0,2,1,3)
    o_ref[:] = jnp.transpose(a_ref[:], (0, 2, 1, 3))


run("swap_lead_sublane (A[2,8,64,128] -> [2,64,8,128])", k_swap_mid,
    (2, 64, 8, 128), [A4], lambda a: np.transpose(a, (0, 2, 1, 3)))
