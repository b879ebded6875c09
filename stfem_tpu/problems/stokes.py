"""Stokes manufactured solution (2D trigonometric, divergence-free) and RHS
(reference include/exact_solution.h:199-325)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.pi


def exact_u(pts, t):
    """[..., 2] velocity."""
    x, y = pts[..., 0], pts[..., 1]
    st = jnp.sin(t)
    sx, sy = jnp.sin(PI * x), jnp.sin(PI * y)
    cx, cy = jnp.cos(PI * x), jnp.cos(PI * y)
    u0 = cy * st * sx * sx * sy
    u1 = -cx * st * sx * sy * sy
    return jnp.stack([u0, u1], axis=-1)


def exact_grad_u(pts, t):
    """[..., 2, 2]: grad_u[..., c, d] = d u_c / d x_d."""
    x, y = pts[..., 0], pts[..., 1]
    st = jnp.sin(t)
    sx, sy = jnp.sin(PI * x), jnp.sin(PI * y)
    cx, cy = jnp.cos(PI * x), jnp.cos(PI * y)
    Pst = PI * st
    g00 = 2 * Pst * cx * sx * cy * sy
    g01 = Pst * (sx * sx * cy * cy - sx * sx * sy * sy)
    g10 = Pst * (sx * sx - cx * cx) * sy * sy
    g11 = -2 * Pst * cx * sx * cy * sy
    return jnp.stack([jnp.stack([g00, g01], axis=-1),
                      jnp.stack([g10, g11], axis=-1)], axis=-2)


def exact_p(pts, t):
    x, y = pts[..., 0], pts[..., 1]
    st = jnp.sin(t)
    return (jnp.cos(PI * x) * jnp.cos(PI * y) * st
            * jnp.sin(PI * x) * jnp.sin(PI * y))


def exact_grad_p(pts, t):
    x, y = pts[..., 0], pts[..., 1]
    sx, sy = jnp.sin(PI * x), jnp.sin(PI * y)
    cx, cy = jnp.cos(PI * x), jnp.cos(PI * y)
    Pst = PI * jnp.sin(t)
    g0 = Pst * (cx * cx - sx * sx) * cy * sy
    g1 = Pst * (cy * cy - sy * sy) * cx * sx
    return jnp.stack([g0, g1], axis=-1)


def rhs_u(pts, t, viscosity=1.0, navier=False):
    """[..., 2] momentum right-hand side."""
    x, y = pts[..., 0], pts[..., 1]
    nu = viscosity
    nl = 1.0 if navier else 0.0
    st, ct = jnp.sin(t), jnp.cos(t)
    sx, sy = jnp.sin(PI * x), jnp.sin(PI * y)
    cx, cy = jnp.cos(PI * x), jnp.cos(PI * y)
    f0 = sy * (PI * (1.0 - 2.0 * PI * nu) * cx * cx * cy * st
               + cy * (ct + PI * (-1.0 + 6.0 * PI * nu) * st) * sx * sx
               + nl * PI * cx * st * st * sx * sx * sx * sy)
    f1 = sx * (nl * PI * cy * st * st * sx * sy * sy * sy
               + cx * (PI * (-2.0 * PI * nu
                             + (1.0 + 4.0 * PI * nu) * jnp.cos(2.0 * PI * y))
                       * st - ct * sy * sy))
    return jnp.stack([f0, f1], axis=-1)
