"""Variational time-slab integrators: outer loop of the solver.

TimeIntegratorFO (first order in time: heat, Stokes) assembles the slab RHS
from the previous solution + force quadrature, then solves with FGMRES
preconditioned by STMG; TimeIntegratorWave adds the dense velocity-recovery
epilogue.  Mirrors reference include/time_integrators.h.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .errors import quad_coordinates
from .krylov import FGMRESResult, fgmres
from .mesh.fe import shape_data_1d
from .mesh.grid import StructuredMesh
from .ops.spatial import cell_scatter, _sumfac
from .time.tables import get_time_quad
from .types import TimeStepType
from .utils.module import register_module


@register_module
class ForceAssembler:
    """Spatial RHS vector F_i(t) = int f(x,t) phi_i dx (the analogue of
    VectorTools::create_right_hand_side with constraints, used per
    time-quadrature point; reference include/time_integrators.h:73-110)."""

    def __init__(self, mesh: StructuredMesh, degree: int, n_q: int,
                 rhs_fn: Callable, mask, dtype=jnp.float64):
        self.mesh = mesh
        self.degree = degree
        self.dim = mesh.dim
        sd = shape_data_1d(degree, n_q)
        self.S = jnp.asarray(sd.S, dtype)
        geom = mesh.geometry(n_q, degree)
        self.jxw = jnp.asarray(geom.jxw, dtype)
        self.coords = jnp.asarray(quad_coordinates(mesh, n_q), dtype)
        self.rhs_fn = rhs_fn
        self.mask = jnp.asarray(np.asarray(mask), dtype)

    def __call__(self, t) -> jnp.ndarray:
        fq = self.rhs_fn(self.coords, t) * self.jxw
        y = _sumfac([self.S] * self.dim, fq, self.dim, forward=False)
        return cell_scatter(y, self.mesh.cells, self.degree) * self.mask

    def batched(self, ts, scales) -> jnp.ndarray:
        """F for a whole slab at once: ts/scales of shape (n_blocks,) ->
        (n_blocks, *dofshape) with ONE integrate + scatter sweep (the
        per-block loop costs n_blocks kernel launches otherwise).  RHS
        data feeds the outer Krylov residual: true-f32 products."""
        import jax

        with jax.default_matmul_precision("highest"):
            fq = jax.vmap(lambda t: self.rhs_fn(self.coords, t))(ts)
            fq = fq * self.jxw * scales.reshape(
                (-1,) + (1,) * (2 * self.dim))
            y = _sumfac([self.S] * self.dim, fq, self.dim, forward=False)
            return cell_scatter(y, self.mesh.cells, self.degree) * self.mask


@dataclass
class SolveStats:
    iterations: int
    residual: float
    converged: bool


@register_module
class TimeIntegratorFO:
    """First-order-in-time slab integrator (reference TimeIntegratorFO,
    include/time_integrators.h:300-321).

    Registered as a pytree: the jitted slab solve takes the integrator itself
    as an argument, so operator/preconditioner arrays are jit inputs rather
    than baked HLO constants."""

    def __init__(self, type_: TimeStepType, time_degree: int,
                 Alpha_1: np.ndarray, Gamma_1: np.ndarray,
                 gmres_reltol: float, matrix, preconditioner,
                 rhs_matrix, force: ForceAssembler,
                 n_timesteps_at_once: int, extrapolate: bool = True,
                 abstol: float = 1e-12, maxiter: int = 100,
                 boundary_values=None, boundary_lift: bool = True):
        """boundary_values: optional ops.boundary.SlabBoundaryValues for
        strong inhomogeneous time-dependent Dirichlet data (reference
        tp_03stokes.cc:1022-1046 set-zero/solve/paste scheme).
        boundary_lift=True additionally applies the consistent lift
        rhs -= A x_g on interior rows (the reference omits it — its
        matrix-free reads constrained dofs as zero — which is only
        consistent for g == 0; see ops/boundary.py)."""
        self.type_ = type_
        self.time_degree = time_degree
        self.quad_time = get_time_quad(type_, time_degree)[0]
        self.Alpha_1 = np.asarray(Alpha_1)
        self.Gamma_1 = np.asarray(Gamma_1)
        self.reltol = gmres_reltol
        self.abstol = abstol
        self.maxiter = maxiter
        self.matrix = matrix
        self.preconditioner = preconditioner
        self.rhs_matrix = rhs_matrix
        self.force = force
        self.n_timesteps_at_once = n_timesteps_at_once
        self.nt_dofs = (time_degree + 1 if type_ == TimeStepType.DG
                        else time_degree)
        self.extrapolate = extrapolate
        self.boundary_values = boundary_values
        self.boundary_lift = boundary_lift

    # reference include/time_integrators.h:73-110 (exploits diagonal Alpha)
    def assemble_force(self, time, time_step) -> jnp.ndarray:
        nt = self.nt_dofs
        n_blocks = nt * self.n_timesteps_at_once
        parts = [None] * n_blocks
        for it in range(self.n_timesteps_at_once):
            for j, tq in enumerate(self.quad_time):
                t = time + time_step * it + time_step * tq
                F = self.force(t)
                if self.type_ == TimeStepType.DG:
                    b = it * nt + j
                    parts[b] = F * self.Alpha_1[j, j] if parts[b] is None \
                        else parts[b] + F * self.Alpha_1[j, j]
                else:
                    if j == 0:
                        for i in range(nt):
                            b = it * nt + i
                            c = -self.Gamma_1[i, 0]
                            parts[b] = F * c if parts[b] is None \
                                else parts[b] + F * c
                    else:
                        b = it * nt + j - 1
                        c = self.Alpha_1[j - 1, j - 1]
                        parts[b] = F * c if parts[b] is None \
                            else parts[b] + F * c
        return jnp.stack(parts)

    def _extrapolate(self, prev_x):
        n_blocks = self.nt_dofs * self.n_timesteps_at_once
        if self.extrapolate:
            return jnp.broadcast_to(prev_x, (n_blocks,) + prev_x.shape)
        return jnp.zeros((n_blocks,) + prev_x.shape, prev_x.dtype)

    def _solve_impl(self, prev_x, time, time_step):
        bv = self.boundary_values
        if bv is not None and self.boundary_lift:
            # consistent strong-Dirichlet: the rhs sees the raw previous
            # value (incl. its boundary data) and the lift -A x_g
            x_g = bv.blocks(time)
            rhs = self.rhs_matrix.vmult(prev_x[None], mask_input=False)
            rhs = rhs + self.assemble_force(time, time_step)
            rhs = rhs - self.matrix.vmult(x_g, mask_input=False)
        else:
            rhs = self.rhs_matrix.vmult(prev_x[None])
            rhs = rhs + self.assemble_force(time, time_step)
        x0 = self._extrapolate(prev_x)
        if bv is not None:
            x0 = bv.set_zero(x0)
        res = fgmres(self.matrix.vmult, rhs, x0,
                     precondition=self.preconditioner,
                     maxiter=self.maxiter, abstol=self.abstol,
                     reltol=self.reltol)
        if bv is not None:
            x_g = bv.blocks(time)
            res = res._replace(x=bv.paste(res.x, x_g))
        return res

    def solve(self, prev_x: jnp.ndarray, time: float,
              time_step: float) -> tuple[jnp.ndarray, SolveStats]:
        res: FGMRESResult = _solve_fo_jit(self, prev_x, jnp.asarray(time),
                                          jnp.asarray(time_step))
        return res.x, SolveStats(int(res.iterations), float(res.residual),
                                 bool(res.converged))


@jax.jit
def _solve_fo_jit(integ, prev_x, time, time_step):
    return integ._solve_impl(prev_x, time, time_step)


@jax.jit
def _solve_wave_jit(integ, prev_u, prev_v, time, time_step):
    return integ._solve_wave_impl(prev_u, prev_v, time, time_step)


@register_module
class TimeIntegratorWave(TimeIntegratorFO):
    """Wave integrator: u-solve + dense v-recovery epilogue
    (reference include/time_integrators.h:400-447)."""

    def __init__(self, type_: TimeStepType, time_degree: int,
                 Alpha_1, Beta_1, Gamma_1, Zeta_1,
                 gmres_reltol: float, matrix, preconditioner,
                 rhs_matrix, rhs_matrix_v, force: ForceAssembler,
                 n_timesteps_at_once: int, extrapolate: bool = True,
                 abstol: float = 1e-12, maxiter: int = 100):
        super().__init__(type_, time_degree, Alpha_1, Gamma_1, gmres_reltol,
                         matrix, preconditioner, rhs_matrix, force,
                         n_timesteps_at_once, extrapolate, abstol, maxiter)
        self.rhs_matrix_v = rhs_matrix_v
        Ainv = np.linalg.inv(np.asarray(Alpha_1))
        self.AixB = Ainv @ np.asarray(Beta_1)
        self.AixG = Ainv @ np.asarray(Gamma_1)
        self.AixZ = Ainv @ np.asarray(Zeta_1)
        if type_ == TimeStepType.DG:
            self.AixG = -self.AixG
        else:
            self.AixZ = -self.AixZ

    def _solve_wave_impl(self, prev_u, prev_v, time, time_step):
        rhs = self.rhs_matrix.vmult(prev_u[None])
        rhs = rhs + self.rhs_matrix_v.vmult(prev_v[None])
        rhs = rhs + self.assemble_force(time, time_step)
        x0 = self._extrapolate(prev_u)
        res = fgmres(self.matrix.vmult, rhs, x0,
                     precondition=self.preconditioner,
                     maxiter=self.maxiter, abstol=self.abstol,
                     reltol=self.reltol)
        u = res.x
        nt = self.AixB.shape[0]
        AixB = jnp.asarray(self.AixB, u.dtype)
        AixG = jnp.asarray(self.AixG, u.dtype)
        AixZ = jnp.asarray(self.AixZ, u.dtype)
        v_steps = []
        for it in range(self.n_timesteps_at_once):
            prev_u_ = prev_u if it == 0 else u[it * nt - 1]
            v_it = jnp.einsum("ij,j...->i...", AixB, u[it * nt:(it + 1) * nt])
            if self.type_ == TimeStepType.DG:
                v_it = v_it + AixG[:, 0].reshape((-1,) + (1,) * prev_u_.ndim) \
                    * prev_u_[None]
            else:
                prev_v_ = prev_v if it == 0 else v_steps[-1][-1]
                v_it = (v_it
                        + AixG[:, 0].reshape((-1,) + (1,) * prev_u_.ndim)
                        * prev_v_[None]
                        + AixZ[:, 0].reshape((-1,) + (1,) * prev_u_.ndim)
                        * prev_u_[None])
            v_steps.append(v_it)
        v = jnp.concatenate(v_steps, axis=0)
        return res, u, v

    def solve_wave(self, prev_u, prev_v, time, time_step):
        res, u, v = _solve_wave_jit(self, prev_u, prev_v, jnp.asarray(time),
                                    jnp.asarray(time_step))
        return u, v, SolveStats(int(res.iterations), float(res.residual),
                                bool(res.converged))
