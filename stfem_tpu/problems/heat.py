"""Heat & acoustic-wave manufactured solutions and right-hand sides
(reference include/exact_solution.h:27-197)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.pi


def exact_solution(pts, t, f=1.0):
    """u = sin(2 pi f t) prod_i sin(2 pi f x_i)."""
    v = jnp.sin(2 * PI * f * t)
    for i in range(pts.shape[-1]):
        v = v * jnp.sin(2 * PI * f * pts[..., i])
    return v


def exact_gradient(pts, t, f=1.0):
    """grad u, shape [..., dim]."""
    dim = pts.shape[-1]
    tv = 2 * PI * f * jnp.sin(2 * PI * f * t)
    comps = []
    for i in range(dim):
        g = tv
        for j in range(dim):
            s = jnp.cos(2 * PI * f * pts[..., j]) if i == j \
                else jnp.sin(2 * PI * f * pts[..., j])
            g = g * s
        comps.append(g)
    return jnp.stack(comps, axis=-1)


def rhs(pts, t, f=1.0):
    dim = pts.shape[-1]
    v = (dim * 4 * PI ** 2 * f ** 2 * jnp.sin(2 * PI * f * t)
         + 2 * PI * f * jnp.cos(2 * PI * f * t))
    for i in range(dim):
        v = v * jnp.sin(2 * PI * f * pts[..., i])
    return v


# -- acoustic wave ----------------------------------------------------------
def wave_exact_v(pts, t, f=1.0):
    """v = du/dt."""
    v = 2 * PI * f * jnp.cos(2 * PI * f * t)
    for i in range(pts.shape[-1]):
        v = v * jnp.sin(2 * PI * f * pts[..., i])
    return v


def wave_rhs(pts, t, f=1.0):
    dim = pts.shape[-1]
    v = 2.0 ** dim * (PI * f) ** 2 * jnp.sin(2 * PI * f * t)
    for i in range(dim):
        v = v * jnp.sin(2 * PI * f * pts[..., i])
    return v
