"""Symbolically-derived manufactured solutions.

Instead of hand-expanded RHS polynomials (reference exact_solution.h:87-144
heat solution 2, 328-501 stokespoly), the right-hand sides here are DERIVED
from the exact solutions with sympy at import time and lambdified to
jax-traceable functions -- same math, no 100-line transcriptions.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import sympy as sp


def _lambdify(args, expr):
    return sp.lambdify(args, expr, modules=[jnp])


@lru_cache(maxsize=None)
def heat2(dim: int = 2):
    """Heat 'solution 2': u = sin(2 pi x) sin(2 pi y)[sin(2 pi z)]
    (1 + sin(pi t)) exp(-t/2) and its derived RHS f = u_t - lap u
    (reference ExactSolution2/RHSFunction2)."""
    t = sp.Symbol("t")
    xs = sp.symbols(f"x0:{dim}")
    u = (1 + sp.sin(sp.pi * t)) * sp.exp(-t / 2)
    for x in xs:
        u *= sp.sin(2 * sp.pi * x)
    f = sp.diff(u, t) - sum(sp.diff(u, x, 2) for x in xs)
    grad = [sp.diff(u, x) for x in xs]
    u_fn = _lambdify((*xs, t), sp.simplify(u))
    f_fn = _lambdify((*xs, t), sp.simplify(f))
    g_fns = [_lambdify((*xs, t), sp.simplify(g)) for g in grad]

    def exact(pts, tt):
        return u_fn(*[pts[..., d] for d in range(dim)], tt)

    def rhs(pts, tt):
        return f_fn(*[pts[..., d] for d in range(dim)], tt)

    def exact_grad(pts, tt):
        comps = [g(*[pts[..., d] for d in range(dim)], tt) for g in g_fns]
        return jnp.stack(comps, axis=-1)

    return exact, exact_grad, rhs


@lru_cache(maxsize=None)
def stokes_poly(viscosity: float = 1.0):
    """The 'stokespoly' polynomial Stokes solution (2D): divergence-free
    polynomial velocity from a stream-function-style construction and a
    zero-mean polynomial pressure; RHS derived as f = u_t - nu lap u + grad p
    (reference stokespoly::ExactSolution*/RHSFunction)."""
    t, x, y = sp.symbols("t x y")
    nu = sp.Float(viscosity)
    u0 = 1000 * t * x ** 2 * (1 - x) ** 4 * y ** 2 * (1 - y) * (3 - 5 * y)
    u1 = (1000 * t * (-2) * x * (1 - x) ** 3 * (1 - 3 * x) * y ** 3
          * (1 - y) ** 2)
    p = t * (-16 * x * (1 - x) * y * (1 - y) + sp.Rational(4, 9))
    assert sp.simplify(sp.diff(u0, x) + sp.diff(u1, y)) == 0
    f0 = sp.diff(u0, t) - nu * (sp.diff(u0, x, 2) + sp.diff(u0, y, 2)) \
        + sp.diff(p, x)
    f1 = sp.diff(u1, t) - nu * (sp.diff(u1, x, 2) + sp.diff(u1, y, 2)) \
        + sp.diff(p, y)
    fns = {}
    for name, e in (("u0", u0), ("u1", u1), ("p", p), ("f0", f0), ("f1", f1),
                    ("du0x", sp.diff(u0, x)), ("du0y", sp.diff(u0, y)),
                    ("du1x", sp.diff(u1, x)), ("du1y", sp.diff(u1, y)),
                    ("dpx", sp.diff(p, x)), ("dpy", sp.diff(p, y))):
        fns[name] = _lambdify((x, y, t), sp.expand(e))

    def exact_u(pts, tt):
        X, Y = pts[..., 0], pts[..., 1]
        return jnp.stack([fns["u0"](X, Y, tt), fns["u1"](X, Y, tt)], axis=-1)

    def exact_grad_u(pts, tt):
        X, Y = pts[..., 0], pts[..., 1]
        return jnp.stack([
            jnp.stack([fns["du0x"](X, Y, tt), fns["du0y"](X, Y, tt)], -1),
            jnp.stack([fns["du1x"](X, Y, tt), fns["du1y"](X, Y, tt)], -1),
        ], axis=-2)

    def exact_p(pts, tt):
        return fns["p"](pts[..., 0], pts[..., 1], tt)

    def exact_grad_p(pts, tt):
        X, Y = pts[..., 0], pts[..., 1]
        return jnp.stack([fns["dpx"](X, Y, tt), fns["dpy"](X, Y, tt)], -1)

    def rhs_u(pts, tt, viscosity=None, navier=False):
        X, Y = pts[..., 0], pts[..., 1]
        return jnp.stack([fns["f0"](X, Y, tt), fns["f1"](X, Y, tt)], axis=-1)

    return dict(exact_u=exact_u, exact_grad_u=exact_grad_u, exact_p=exact_p,
                exact_grad_p=exact_grad_p, rhs_u=rhs_u)
