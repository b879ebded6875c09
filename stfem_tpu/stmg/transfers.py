"""Inter-level transfer operators.

Space transfers (h and p) are SEPARABLE on structured tensor-product grids:
the global prolongation is a Kronecker product of small dense 1D matrices,
applied as one matmul per axis (replacing deal.II's MGTwoLevelTransfer cell
loops + ghost exchange, reference stmg.h:38-112).  Time transfers are tiny
dense matrices over the block axis (reference stmg.h:114-247).  Restriction
defaults to the transpose of prolongation (restrict_is_transpose_prolongate,
reference parameters.h:29).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh.fe import p_interpolation_1d, prolongation_1d
from ..time.transfer import (get_time_projection_matrix,
                             get_time_prolongation_matrix,
                             get_time_restriction_matrix)
from ..types import MGType, TimeStepType
from ..utils.module import register_module


def h_prolongation_global_1d(n_coarse_cells: int, degree: int) -> np.ndarray:
    """Global 1D h-prolongation (n_fine_dofs, n_coarse_dofs): exact FE
    interpolation from a grid of n cells to 2n cells."""
    k = degree
    P1 = prolongation_1d(degree)         # (2k+1, k+1)
    nf = 2 * n_coarse_cells * k + 1
    nc = n_coarse_cells * k + 1
    P = np.zeros((nf, nc))
    for c in range(n_coarse_cells):
        P[2 * c * k:2 * (c + 1) * k + 1, c * k:(c + 1) * k + 1] = P1
    return P


def p_prolongation_global_1d(n_cells: int, degree_coarse: int,
                             degree_fine: int) -> np.ndarray:
    """Global 1D p-prolongation on the same cells."""
    Pc = p_interpolation_1d(degree_coarse, degree_fine)  # (kf+1, kc+1)
    kf, kc = degree_fine, degree_coarse
    nf = n_cells * kf + 1
    nc = n_cells * kc + 1
    P = np.zeros((nf, nc))
    for c in range(n_cells):
        P[c * kf:(c + 1) * kf + 1, c * kc:(c + 1) * kc + 1] = Pc
    return P


@register_module
class SpaceTransfer:
    """Separable space transfer: per-axis dense 1D matrices + Dirichlet masks
    on both levels."""

    def __init__(self, P1d_per_axis: list[np.ndarray], fine_mask, coarse_mask,
                 dtype=jnp.float64):
        self.P = [jnp.asarray(P, dtype) for P in P1d_per_axis]
        self.fine_mask = jnp.asarray(np.asarray(fine_mask), dtype)
        self.coarse_mask = jnp.asarray(np.asarray(coarse_mask), dtype)
        self.dim = len(P1d_per_axis)

    def _apply_axes(self, x, mats):
        # x: [..., *grid]; contract the TRAILING spatial axes with the 1D
        # matrices (leading axes = time blocks / vector components)
        dim = len(mats)
        for d, m in enumerate(mats):
            axis = x.ndim - dim + d
            x = jnp.moveaxis(jnp.tensordot(m, x, axes=(1, axis)), 0, axis)
        return x

    def prolongate(self, xc: jnp.ndarray) -> jnp.ndarray:
        return self._apply_axes(xc * self.coarse_mask, self.P) * self.fine_mask

    def restrict(self, xf: jnp.ndarray) -> jnp.ndarray:
        return self._apply_axes(xf * self.fine_mask,
                                [p.T for p in self.P]) * self.coarse_mask


@register_module
class TimeTransfer:
    """Dense block-axis transfer (k- or tau-type) for one variable."""

    def __init__(self, type_: TimeStepType, mg_type: MGType,
                 nt_dofs_hi: int, nt_dofs_lo: int, n_timesteps_hi: int,
                 restrict_is_transpose_prolongate: bool = True,
                 dtype=jnp.float64):
        if type_ == TimeStepType.DG:
            r_hi, r_lo = nt_dofs_hi - 1, nt_dofs_lo - 1
        else:
            r_hi, r_lo = nt_dofs_hi, nt_dofs_lo
        if mg_type == MGType.k:
            prol = get_time_projection_matrix(type_, r_lo, r_hi,
                                              n_timesteps_hi)
            down = get_time_projection_matrix(type_, r_hi, r_lo,
                                              n_timesteps_hi)
        elif mg_type == MGType.tau:
            prol = get_time_prolongation_matrix(type_, r_hi, n_timesteps_hi)
            down = get_time_restriction_matrix(type_, r_hi, n_timesteps_hi)
        else:
            raise ValueError(mg_type)
        self.prol = jnp.asarray(prol, dtype)
        self.interp_down = jnp.asarray(down, dtype)
        self.restr = (self.prol.T if restrict_is_transpose_prolongate
                      else self.interp_down)

    def prolongate(self, xc: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("ij,j...->i...", self.prol, xc)

    def restrict(self, xf: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("ij,j...->i...", self.restr, xf)

    def interpolate(self, xf: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("ij,j...->i...", self.interp_down, xf)
