"""A/B lab: gather-free grid sum-factorization for the slab matvec + Vanka.

Motivation (measured, scripts/perf_decompose.py at 16^3 ntao=32):
the fine-level matvec costs 32-45 ms and the Vanka apply 24 ms while the
flop/HBM bound is ~1-4 ms -- the cell gather/scatter (take + interleaved
small-axis transposes + overlap-add) dominates, not the matmuls.

Idea: on a tensor-product grid the cell-local quadrature points are DISJOINT
(Gauss points are cell-interior), so dof -> quad interpolation is a global
banded 1D matrix per axis (nc*q x nc*k+1) applied as a dense matmul, and its
transpose performs the overlap-add accumulation ON THE MXU.  No gather, no
scatter, no small-axis transposes.  The same folding turns the separable
Vanka eigenbasis apply into per-axis global matmuls (V^T [take . valence]
down, take^T V up).

This script validates both against the shipped implementations and times
them on the chip.  Env: STFEM_BENCH_CELLS (default 16), STFEM_BENCH_NTAO
(default 32), STFEM_PROBE_REPS (default 20).
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_grid_matrices(op):
    """Per-axis global quadrature matrices (numpy f64):
    Sg[d]: (nc*q, nc*k+1) values; Dg[d]: same shape, derivative with the
    per-cell 1/h folded in (so gradient weights need no jfac^2); per-axis
    quad weight vectors wv[d] (nc*q,) with h folded (the jxw split)."""
    k, nq, dim = op.degree, op.n_q, op.dim
    sd = op._sd
    S1, D1 = sd.S, sd.D           # (q, k+1)
    qw = sd.quad_w
    mesh = op.mesh
    Sg, Dg, wv = [], [], []
    for d in range(dim):
        nc = int(op.cells[d])
        verts = mesh.axis_vertices(d)
        hs = np.diff(verts)        # (nc,)
        nd = nc * k + 1
        Sgd = np.zeros((nc * nq, nd))
        Dgd = np.zeros((nc * nq, nd))
        for c in range(nc):
            Sgd[c * nq:(c + 1) * nq, c * k:c * k + k + 1] = S1
            Dgd[c * nq:(c + 1) * nq, c * k:c * k + k + 1] = D1 / hs[c]
        Sg.append(Sgd)
        Dg.append(Dgd)
        wv.append(np.repeat(hs, nq) * np.tile(qw, nc))
    return Sg, Dg, wv


def axis_apply(x, mats, dim):
    """Contract the trailing `dim` axes of x with mats[d] (rows index the
    output)."""
    import jax.numpy as jnp
    for d in range(dim):
        axis = x.ndim - dim + d
        x = jnp.moveaxis(jnp.tensordot(mats[d], x, axes=(1, axis)), 0, axis)
    return x


def make_grid_matvec(op_K, op_M, Alpha, Beta, dtype):
    """Gather-free slab matvec: (Alpha (x) K + Beta (x) M) x using per-axis
    global matmuls.  Valid for diagonal-geometry meshes."""
    import jax.numpy as jnp

    dim = op_K.dim
    Sg, Dg, wv = build_grid_matrices(op_K)
    Sg = [jnp.asarray(m, dtype) for m in Sg]
    Dg = [jnp.asarray(m, dtype) for m in Dg]
    # weight grid: separable product of per-axis vectors (uniform &
    # tensor-step meshes; coefficient/cell-mask variants would multiply a
    # full-grid factor here)
    W = wv[0]
    for d in range(1, dim):
        W = np.multiply.outer(W, wv[d])
    W = jnp.asarray(W, dtype)
    mask = jnp.asarray(op_K.mask_np, dtype)
    A_ = jnp.asarray(np.asarray(Alpha), dtype)
    B_ = jnp.asarray(np.asarray(Beta), dtype)

    def mix(M, v):
        return jnp.einsum("ji,i...->j...", M, v)

    def matvec(x):
        x = x * mask
        # forward value + gradients with shared prefixes:
        # t0 = S_0 x ; g0 = D_0 x (axis 0), then expand axis by axis
        val = x
        grads = []
        for d in range(dim):
            axis = x.ndim - dim + d
            new_grads = [jnp.moveaxis(
                jnp.tensordot(Sg[d], g, axes=(1, axis)), 0, axis)
                for g in grads]
            new_grads.append(jnp.moveaxis(
                jnp.tensordot(Dg[d], val, axes=(1, axis)), 0, axis))
            val = jnp.moveaxis(
                jnp.tensordot(Sg[d], val, axes=(1, axis)), 0, axis)
            grads = new_grads
        # quadrature multiply + block mixing
        val = mix(B_, val) * W
        grads = [mix(A_, g) * W for g in grads]
        # backward (transposes accumulate the overlap-add)
        acc = None
        for d in range(dim):
            axis = x.ndim - dim + d
            t = grads[d]
            for e in range(dim):
                ax_e = x.ndim - dim + e
                m = Dg[e] if e == d else Sg[e]
                t = jnp.moveaxis(jnp.tensordot(m.T, t, axes=(1, ax_e)),
                                 0, ax_e)
            acc = t if acc is None else acc + t
        v = val
        for e in range(dim):
            ax_e = x.ndim - dim + e
            v = jnp.moveaxis(jnp.tensordot(Sg[e].T, v, axes=(1, ax_e)),
                             0, ax_e)
        return (acc + v) * mask

    return matvec


def make_grid_vanka(vanka, K_op, M_op, cells, k, dim, dtype):
    """Matmul-form separable Vanka: per-axis global down/up matrices with
    take+valence folded; TT solve in the interleaved (c1,p1,c2,p2,..)
    layout."""
    import jax.numpy as jnp
    import scipy.linalg  # noqa: F401

    assert vanka.Vsep is not None or vanka.V is not None
    # recover per-axis factors: the shipped module materializes V; rebuild
    # from the separable eigenbasis for the lab
    from stfem_tpu.stmg.vanka import separable_eigenbasis
    sep = separable_eigenbasis(K_op, M_op)
    assert sep is not None
    lam_np, v_axes = sep           # lam (C, A) ordered [cells.., locs..]

    # per-axis 1D valence: dof shared by 2 cells at interior cell boundaries
    Wdn, Wup = [], []
    for d in range(dim):
        nc = int(cells[d])
        nd = nc * k + 1
        v1 = np.ones(nd)
        v1[k:nd - 1:k] = 2.0
        Vd = v_axes[d]             # (nc, k+1, k+1) [cell, dof, eig]
        dn = np.zeros((nc * (k + 1), nd))
        up = np.zeros((nd, nc * (k + 1)))
        for c in range(nc):
            rows = slice(c * (k + 1), (c + 1) * (k + 1))
            colsg = slice(c * k, c * k + k + 1)
            dn[rows, colsg] = Vd[c].T / v1[colsg][None, :]
            up[colsg, rows] += Vd[c]
        Wdn.append(jnp.asarray(dn, dtype))
        Wup.append(jnp.asarray(up, dtype))

    # lam in interleaved layout (c1,p1,c2,p2,...) -> flat (prod nc*(k+1))
    C = int(np.prod(cells))
    A = (k + 1) ** dim
    lam_grid = lam_np.reshape(tuple(cells) + (k + 1,) * dim)
    perm = []
    for d in range(dim):
        perm += [d, dim + d]
    lam_il = np.transpose(lam_grid, perm)   # (c1,k+1,c2,k+1,...)
    il_shape = tuple(s for d in range(dim)
                     for s in (int(cells[d]), k + 1))

    n_steps = vanka.n_steps
    if n_steps > 1:
        # per-step factors on the interleaved lam
        a_nt = np.asarray(vanka.Ginv)  # placeholder; rebuilt below
    # rebuild G factors from the tables the module stored is awkward;
    # instead reuse the module's Ginv/cvec (C, A, nt, nt)/(C, A, nt) by
    # transposing to interleaved
    def to_il(arr):
        arr = np.asarray(arr, np.float64)
        tail = arr.shape[2:]
        a = arr.reshape(tuple(cells) + (k + 1,) * dim + tail)
        p = perm + [2 * dim + i for i in range(len(tail))]
        return np.transpose(a, p)

    out = {"Wdn": Wdn, "Wup": Wup, "il_shape": il_shape}
    if n_steps > 1:
        Ginv_il = jnp.asarray(to_il(vanka.Ginv), dtype)
        cvec_il = jnp.asarray(to_il(vanka.cvec), dtype)
        out["Ginv"] = Ginv_il
        out["cvec"] = cvec_il
    else:
        TT_il = jnp.asarray(to_il(vanka.TTinv), dtype)
        out["TTinv"] = TT_il

    def vmult(src):
        import jax
        nb = src.shape[0]
        r = src.astype(dtype)
        # down: per-axis matmuls grid -> interleaved eigen space
        w = r
        for d in range(dim):
            axis = w.ndim - dim + d
            w = jnp.moveaxis(jnp.tensordot(Wdn[d], w, axes=(1, axis)),
                             0, axis)
        # w now (nb, nc1*(k+1), nc2*(k+1), ...); reshape to interleaved
        w = w.reshape((nb,) + il_shape)
        if n_steps > 1:
            S, nt = n_steps, nb // n_steps
            ws = w.reshape((S, nt) + il_shape)
            Ginv_il, cvec_il = out["Ginv"], out["cvec"]
            y = jnp.stack(
                [sum(Ginv_il[..., i, j] * ws[:, j] for j in range(nt))
                 for i in range(nt)], axis=1)
            u = y[:, -1]
            kap = jnp.broadcast_to(cvec_il[..., -1], u.shape)

            def comb(first, second):
                a1, b1 = first
                a2, b2 = second
                return a2 * a1, a2 * b1 + b2

            _, last = jax.lax.associative_scan(comb, (kap, u), axis=0)
            a_prev = jnp.concatenate(
                [jnp.zeros_like(last[:1]), last[:-1]], axis=0)
            y = y + a_prev[:, None] * jnp.moveaxis(cvec_il, -1, 0)
            w = y.reshape((nb,) + il_shape)
        else:
            TT_il = out["TTinv"]
            w = jnp.einsum("...ts,s...->t...",
                           jnp.moveaxis(TT_il, (-2, -1), (0, 1)), w)
        # back to per-axis grid layout and up-matmuls
        w = w.reshape((nb,) + tuple(int(cells[d]) * (k + 1)
                                    for d in range(dim)))
        for d in range(dim):
            axis = w.ndim - dim + d
            w = jnp.moveaxis(jnp.tensordot(Wup[d], w, axes=(1, axis)),
                             0, axis)
        return w.astype(src.dtype)

    return vmult


def main():
    import jax
    import jax.numpy as jnp

    from stfem_tpu.mesh.grid import StructuredMesh
    from stfem_tpu.ops.spatial import LaplaceMassOperator
    from stfem_tpu.stmg.vanka import PreconditionVanka
    from stfem_tpu.system import SystemMatrix
    from stfem_tpu.time.tables import get_fe_time_weights
    from stfem_tpu.types import TimeStepType

    cells_per_axis = int(os.environ.get("STFEM_BENCH_CELLS", "16"))
    n_at_once = int(os.environ.get("STFEM_BENCH_NTAO", "32"))
    reps = int(os.environ.get("STFEM_PROBE_REPS", "20"))
    fe_degree, space_degree = 2, 4
    dtype = jnp.float32

    refinement = int(np.log2(cells_per_axis // 2))
    mesh = StructuredMesh([2, 2, 2], [0.0] * 3, [1.0] * 3,
                          refinement=refinement)
    tau = 1.0 / 16.0
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        K = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 0.0,
                                1.0, dtype=dtype)
        M = LaplaceMassOperator(mesh, space_degree, space_degree + 1, 1.0,
                                0.0, dtype=dtype)
        Alpha, Beta, _, _ = get_fe_time_weights(
            TimeStepType.DG, fe_degree, tau, n_at_once)
        matrix = SystemMatrix(K, M, Alpha, Beta, precision=None)
        vanka = PreconditionVanka(K, M, Alpha, Beta, dtype=dtype,
                                  storage_dtype=None,
                                  n_steps=n_at_once)
        grid_mv = make_grid_matvec(K, M, Alpha, Beta, dtype)
        grid_vk = make_grid_vanka(vanka, K, M, mesh.cells, space_degree, 3,
                                  dtype)

    n_blocks = Alpha.shape[0]
    shape = (n_blocks,) + mesh.dof_shape(space_degree)
    tpu = jax.devices()[0]
    on_tpu = jax.default_backend() not in ("cpu",)
    matrix, vanka = jax.device_put((matrix, vanka), tpu)
    # rebind every closed-over device array through an argument pytree so
    # jit receives them as parameters instead of baking multi-MB HLO
    # constants (the axon relay rejects oversized compile requests, 413)
    def lift(fn):
        cells = list(fn.__closure__ or ())
        leaves = []
        specs = []  # (cell_idx, kind, key)
        for i, cell in enumerate(cells):
            v = cell.cell_contents
            if isinstance(v, jnp.ndarray):
                specs.append((i, "arr", None)); leaves.append(v)
            elif isinstance(v, list) and v and isinstance(v[0], jnp.ndarray):
                specs.append((i, "list", None)); leaves.append(list(v))
            elif isinstance(v, dict):
                specs.append((i, "dict", None)); leaves.append(dict(v))
        params = jax.device_put(leaves, tpu)

        def wrapped(params, x):
            for (i, kind, _), val in zip(specs, params):
                cells[i].cell_contents = val
            return fn(x)
        return wrapped, params

    grid_mv_fn, mv_params = lift(grid_mv)
    grid_vk_fn, vk_params = lift(grid_vk)
    x0 = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), dtype), tpu)

    fns = {"mv_ref": (lambda p, v: p.vmult(v), matrix),
           "mv_new": (grid_mv_fn, mv_params),
           "vk_ref": (lambda p, v: p.vmult(v), vanka),
           "vk_new": (grid_vk_fn, vk_params)}

    # correctness (small reps)
    def once(key, x):
        fn, params = fns[key]
        return jax.jit(fn)(params, x)

    y_ref = once("mv_ref", x0)
    y_new = once("mv_new", x0)
    err_mv = float(jnp.linalg.norm((y_ref - y_new).reshape(-1))
                   / jnp.linalg.norm(y_ref.reshape(-1)))
    v_ref = once("vk_ref", x0)
    v_new = once("vk_new", x0)
    err_vk = float(jnp.linalg.norm((v_ref - v_new).reshape(-1))
                   / jnp.linalg.norm(v_ref.reshape(-1)))

    @partial(jax.jit, static_argnums=(0,))
    def loop(key, params, x):
        fn = fns[key][0]

        def body(_, v):
            return fn(params, v) / jnp.linalg.norm(v.reshape(-1))
        return jax.lax.fori_loop(0, reps, body, x)

    def timed(key):
        params = fns[key][1]
        y = loop(key, params, x0)
        _ = float(jnp.sum(y))
        t0 = time.time(); _ = float(jnp.sum(x0)); rb = time.time() - t0
        t0 = time.time()
        y = loop(key, params, x0)
        _ = float(jnp.sum(y))
        return max((time.time() - t0 - rb) / reps, 0.0)

    res = {"cells": cells_per_axis, "ntao": n_at_once, "reps": reps,
           "on_tpu": on_tpu, "err_matvec": err_mv, "err_vanka": err_vk}
    res["matvec_ref_ms"] = 1e3 * timed("mv_ref")
    res["matvec_new_ms"] = 1e3 * timed("mv_new")
    res["vanka_ref_ms"] = 1e3 * timed("vk_ref")
    res["vanka_new_ms"] = 1e3 * timed("vk_new")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
