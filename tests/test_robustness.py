"""Robustness configs: distorted meshes and heterogeneous discontinuous
coefficients keep STMG iteration counts O(10) (reference Readme.md claim,
run_convergence.sh distortGrid 0.15 / distortCoeff 0.5 campaigns)."""
import numpy as np
import pytest

from stfem_tpu.drivers.heat import run_heat_cycle, stmg_preconditioner_factory
from stfem_tpu.problems.coefficient import Coefficient
from stfem_tpu.types import TimeStepType


def bump(coords):
    """Smooth initial condition (CutOffFunction-style bump at the center)."""
    d2 = np.sum((coords - 0.5) ** 2, axis=-1)
    r2 = 0.3 ** 2
    with np.errstate(divide="ignore", over="ignore"):
        v = np.where(d2 < r2, np.exp(1.0 - 1.0 / (1.0 - d2 / r2)), 0.0)
    return np.nan_to_num(v)


@pytest.mark.slow
def test_heat_distorted_mesh_iterations():
    res = run_heat_cycle(
        refinement=3, fe_degree=1, type_=TimeStepType.DG,
        n_timesteps_at_once=2, distort_grid=0.15,
        compute_errors=False, initial_fn=bump,
        rhs_fn_override=lambda p, t: p[..., 0] * 0.0,
        preconditioner_factory=stmg_preconditioner_factory(fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= 14, res.avg_iterations


def test_heat_discontinuous_coefficient_iterations():
    coeff = Coefficient([1, 1], [0.0, 0.0], [1.0, 1.0], distort_coeff=0.5)
    res = run_heat_cycle(
        refinement=3, fe_degree=1, type_=TimeStepType.DG,
        n_timesteps_at_once=2, coefficient=coeff,
        compute_errors=False, initial_fn=bump,
        rhs_fn_override=lambda p, t: p[..., 0] * 0.0,
        preconditioner_factory=stmg_preconditioner_factory(fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= 14, res.avg_iterations
