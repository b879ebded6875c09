"""Strong inhomogeneous time-dependent Dirichlet values.

Reference semantics (include/operators.h:2168-2222 + tests/tp_03stokes.cc:
1022-1063): per slab, interpolate the Dirichlet function g at every
(timestep, time-dof) quadrature time into per-block boundary values; ZERO
the constrained entries before the solve and PASTE the interpolated values
after.  In the reference the operators read constrained dofs as zero
(deal.II matrix-free resolves constraints homogeneously), so the boundary
data never feeds the interior equations — the "lift" term -A x_g is absent.
That is faithful for the shipped configs (all convergence tests have g == 0
on the boundary; the lid-driven practical config tf05stokes uses Nitsche),
but for truly inhomogeneous strong data it decouples the interior.  We
therefore also offer the mathematically consistent lift
(rhs_i -= [A_spacetime x_g]_i on interior rows), selectable per driver.

Block times (operators.h:2196-2210): time = t0 + dt*it + dt*qt[shift + id]
with shift = 0 for DG (Radau points) and 1 for CGP (Lobatto points,
skipping the interval start which belongs to the previous step).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..time.tables import get_time_quad
from ..types import TimeStepType
from ..utils.module import register_module


def slab_time_offsets(type_: TimeStepType, time_degree: int,
                      time_step: float, n_timesteps_at_once: int):
    """Offsets from the slab start t0 of each block's Dirichlet evaluation
    time, in block order (reference operators.h:2196-2210)."""
    qt = np.asarray(get_time_quad(type_, time_degree)[0], float)
    shift = 0 if type_ == TimeStepType.DG else 1
    nt = time_degree + 1 if type_ == TimeStepType.DG else time_degree
    return np.array([time_step * it + time_step * qt[shift + idx]
                     for it in range(n_timesteps_at_once)
                     for idx in range(nt)])


@register_module
class SlabBoundaryValues:
    """Evaluates g on the boundary dofs at every block time of a slab.

    g(coords, t) must be jax-traceable and return an array shaped like the
    dof field (scalar problems: [*dof_shape]; vector: [n_comp, *dof_shape]).
    `mask` is the interior elimination mask (1 interior / 0 boundary) of the
    operator; values are supported on its complement.
    """

    def __init__(self, mesh, degree: int, g, type_: TimeStepType,
                 time_degree: int, time_step: float,
                 n_timesteps_at_once: int, mask=None, dtype=jnp.float64):
        if mask is None:
            mask = mesh.boundary_dof_mask(degree)
        self.mask = jnp.asarray(mask, dtype)
        self.bnd = 1.0 - self.mask
        self.coords = jnp.asarray(mesh.dof_coordinates(degree), dtype)
        self.g = g
        self.offsets = jnp.asarray(
            slab_time_offsets(type_, time_degree, time_step,
                              n_timesteps_at_once), dtype)

    def blocks(self, time) -> jnp.ndarray:
        """[n_blocks, *field_shape] boundary-supported g values."""
        vals = [self.g(self.coords, time + dt) * self.bnd
                for dt in self.offsets]
        return jnp.stack(vals)

    def set_zero(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reference set_inhomogeneity_zero (operators.h:2133-2143)."""
        return x * self.mask

    def paste(self, x: jnp.ndarray, blocks: jnp.ndarray) -> jnp.ndarray:
        """Reference set_inhomogeneity (operators.h:2121-2131)."""
        return x * self.mask + blocks
