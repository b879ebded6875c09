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


def cutoff_cinfty(pts, center, radius: float = 1e-2,
                  integrate_to_one: bool = True):
    """C-infinity cutoff bump (deal.II Functions::CutOffFunctionCinfty):
    e * exp(-r^2/(r^2 - d^2)) inside the ball of `radius` around `center`,
    zero outside.  The reference's practical configs use it as the initial
    value centered at `sourcePoint` with radius 1e-2 and unit integral
    (tests/tp_01.cc:376-380).

    The unit-ball normalization constant is computed numerically here (a 1D
    radial quadrature); deal.II tabulates the same integral.
    """
    center = jnp.asarray(center, dtype=pts.dtype)
    d2 = jnp.sum((pts - center) ** 2, axis=-1)
    r2 = radius * radius
    # guard the pole: clamp the exponent like deal.II's e<-50 cutoff
    denom = jnp.where(d2 < r2, r2 - d2, 1.0)
    e = jnp.where(d2 < r2, -r2 / denom, -jnp.inf)
    v = jnp.where(e < -50.0, 0.0, np.e * jnp.exp(jnp.maximum(e, -50.0)))
    if integrate_to_one:
        dim = pts.shape[-1]
        v = v / _cinfty_unit_integral(dim, radius)
    return v


def _cinfty_unit_integral(dim: int, radius: float) -> float:
    """integral over R^dim of the UNnormalized Cinfty bump of `radius`:
    surface(dim) * int_0^R e * exp(-R^2/(R^2-s^2)) s^(dim-1) ds."""
    s = np.linspace(0.0, 1.0, 20001)[:-1]
    f = np.e * np.exp(-1.0 / np.maximum(1.0 - s * s, 1e-300)) \
        * s ** (dim - 1)
    radial = np.trapezoid(f, s)
    surface = {1: 2.0, 2: 2.0 * np.pi, 3: 4.0 * np.pi}[dim]
    return float(surface * radial * radius ** dim)


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
