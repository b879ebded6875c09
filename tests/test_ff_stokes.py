"""Parity of the Stokes float-float residual engine (ops/ff_stokes.py)
against the native-f64 StokesSystemMatrix slab residual: the IR engine
that lifts the Stokes bench bar from the f32 floor to TRUE rel <= 1e-8
(VERDICT r4 #1a) must reproduce the exact f64 discretization residual to
~1e-12 relative, DG and CGP tables, uniform and non-uniform axis steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stfem_tpu.mesh.grid import StructuredMesh
from stfem_tpu.ops.ff_stokes import KronStokesFF, build_ff_stokes_residual
from stfem_tpu.ops.floatfloat import ff_from_f64, ff_to_f64
from stfem_tpu.ops.spatial import LaplaceMassOperator
from stfem_tpu.ops.stokes import StokesOperator
from stfem_tpu.system_stokes import StokesSystemMatrix
from stfem_tpu.time.tables import get_fe_time_weights
from stfem_tpu.types import TimeStepType


def _setup(dim, cells, u_deg, p_deg, axis_steps=None):
    if axis_steps is not None:
        mesh = StructuredMesh([len(s) for s in axis_steps], [0.0] * dim,
                              None, refinement=0, axis_steps=axis_steps)
    else:
        mesh = StructuredMesh([cells] * dim, [0.0] * dim, [1.0] * dim,
                              refinement=0)
    n_q = u_deg + 1
    S64 = StokesOperator(mesh, u_deg, p_deg, n_q, viscosity=1.0,
                         dtype=jnp.float64)
    Mu64 = LaplaceMassOperator(mesh, u_deg, n_q, 1.0, 0.0,
                               dtype=jnp.float64, mask=S64.mask_u_np)
    return mesh, S64, Mu64


def _residual_parity(S64, Mu64, a, b, zeta, gamma, type_, seed=0):
    T = np.asarray(a).shape[0]
    n_flat = S64.n_u + S64.n_p
    full = StokesSystemMatrix(S64, Mu64, a, b)
    rhsm = StokesSystemMatrix(S64, Mu64, a, b, gamma=gamma, zeta=zeta,
                              type_=type_)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((T, n_flat))
    prev = rng.standard_normal(n_flat)
    fslab = rng.standard_normal((T, n_flat))
    pu = prev[:S64.n_u].reshape((S64.dim,) + tuple(S64.dof_shape_u))
    pp = prev[S64.n_u:].reshape(S64.p_shape)
    rhs_ref = np.asarray(rhsm.vmult_slice(jnp.asarray(pu),
                                          jnp.asarray(pp))) + fslab
    r_ref = rhs_ref - np.asarray(full.vmult(jnp.asarray(x)))

    ffres = build_ff_stokes_residual(S64, a, b, zeta=zeta, gamma=gamma)
    (rh, rl), rnorm, bnorm = jax.jit(ffres.residual)(
        ff_from_f64(jnp.asarray(prev)), ff_from_f64(jnp.asarray(x)),
        ff_from_f64(jnp.asarray(fslab)))
    r_got = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    scale = np.linalg.norm(rhs_ref.reshape(-1))
    err = np.linalg.norm((r_got - r_ref).reshape(-1)) / scale
    assert err < 1e-12, err
    np.testing.assert_allclose(float(rnorm),
                               np.linalg.norm(r_ref.reshape(-1)),
                               rtol=1e-5, atol=1e-9 * scale)
    np.testing.assert_allclose(float(bnorm), scale, rtol=1e-5)


def test_kron_stokes_pair_matches_f64_apply():
    """K path == [nu K u - B^T p; B u], M path == [M u; 0] vs the f64
    quadrature apply (single block, 3D Q2/DGP1)."""
    _, S64, Mu64 = _setup(3, 2, 2, 1)
    n_flat = S64.n_u + S64.n_p
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n_flat)
    u, p = S64.unpack(jnp.asarray(x))
    mask_flat = np.concatenate(
        [np.broadcast_to(np.asarray(S64.mask_u_np)[None],
                         (S64.dim,) + tuple(S64.dof_shape_u)).reshape(-1),
         np.ones(S64.n_p)])
    ru, rp = S64.apply(u[None], p[None])
    K_ref = np.asarray(S64.pack(ru, rp))[0]
    Mu_ap = np.asarray(Mu64.apply((u * S64.mask_u)[None]))[0]
    M_ref = np.concatenate(
        [(Mu_ap * np.asarray(S64.mask_u_np)).reshape(-1), np.zeros(S64.n_p)])

    kron = KronStokesFF(S64)
    xff = ff_from_f64(jnp.asarray(x * mask_flat))
    Kff, Mff = kron.pair(xff)
    K_got = np.asarray(ff_to_f64(Kff)) * mask_flat
    M_got = np.asarray(ff_to_f64(Mff)) * mask_flat
    s = np.linalg.norm(K_ref)
    assert np.linalg.norm(K_got - K_ref) / s < 1e-12
    assert np.linalg.norm(M_got - M_ref) / np.linalg.norm(M_ref) < 1e-12


def test_ff_stokes_slab_residual_dg():
    """DG(1) multi-step slab residual, 3D, uniform mesh (the bench
    configuration family)."""
    _, S64, Mu64 = _setup(3, 2, 2, 1)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, 1, 1.0 / 8.0, 2)
    _residual_parity(S64, Mu64, a, b, zeta=g, gamma=None,
                     type_=TimeStepType.DG)


def test_ff_stokes_slab_residual_dg_nonuniform_2d():
    """Non-uniform tensor steps exercise the per-cell V factors (2D)."""
    steps = [np.array([0.3, 0.2, 0.5]), np.array([0.25, 0.75])]
    _, S64, Mu64 = _setup(2, None, 2, 1, axis_steps=steps)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, 2, 1.0 / 4.0, 2)
    _residual_parity(S64, Mu64, a, b, zeta=g, gamma=None,
                     type_=TimeStepType.DG, seed=5)


def test_ff_stokes_slab_residual_cgp():
    """CGP tables couple the SADDLE apply to the previous step (gamma)
    as well as the mass (zeta) -- the Gamma_K path."""
    _, S64, Mu64 = _setup(2, 2, 2, 1)
    a, b, g, z = get_fe_time_weights(TimeStepType.CGP, 1, 1.0 / 8.0, 2)
    _residual_parity(S64, Mu64, a, b, zeta=z, gamma=g,
                     type_=TimeStepType.CGP, seed=7)


def test_ff_stokes_higher_degree_pressure():
    """DGP2 pressure (10 modes in 3D) exercises the full mode loop."""
    _, S64, Mu64 = _setup(3, 2, 3, 2)
    a, b, g, z = get_fe_time_weights(TimeStepType.DG, 1, 1.0 / 8.0, 2)
    _residual_parity(S64, Mu64, a, b, zeta=g, gamma=None,
                     type_=TimeStepType.DG, seed=11)
