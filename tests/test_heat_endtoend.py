"""End-to-end heat solve: space-time discretization errors must match the
reference goldens (tests/tp_01.output) to print precision.  Solver here is
unpreconditioned FGMRES (errors are preconditioner-independent once converged
to 1e-12); STMG iteration-count parity is tested separately."""
import numpy as np
import pytest

from stfem_tpu.drivers.heat import run_heat_cycle
from stfem_tpu.types import ProblemType, TimeStepType

# reference tests/tp_01.output:21-27 (heat DG(1), 2 steps at once, k=1)
GOLDEN_DG1 = {
    2: (5.53197e-02, 1.78760e-02, 1.35366e-01),
    3: (9.41838e-03, 3.24200e-03, 2.66020e-02),
}


@pytest.mark.parametrize("ref", [2, 3])
def test_heat_dg1_errors_match_golden(ref):
    res = run_heat_cycle(refinement=ref, fe_degree=1,
                         type_=TimeStepType.DG, n_timesteps_at_once=2,
                         gmres_maxiter=700)
    linf, l2, h1 = GOLDEN_DG1[ref]
    assert res.l2_l2 == pytest.approx(l2, rel=2e-5)
    assert res.linf_linf == pytest.approx(linf, rel=2e-5)
    assert res.l2_h1 == pytest.approx(h1, rel=2e-5)
    # slab grouping bookkeeping
    assert res.n_blocks == 4
    assert res.n_timesteps == 2 ** ref


def test_heat_single_step_same_errors():
    """n_timesteps_at_once groups steps into one system but does not change
    the discretization -- errors must equal the 2-at-once run."""
    res = run_heat_cycle(refinement=2, fe_degree=1, type_=TimeStepType.DG,
                         n_timesteps_at_once=1, gmres_maxiter=700)
    linf, l2, h1 = GOLDEN_DG1[2]
    assert res.l2_l2 == pytest.approx(l2, rel=2e-5)
    assert res.n_timesteps == 8


def test_heat_cgp1_converges():
    """CGP(1) heat: second-order convergence in the L2-L2 norm."""
    r2 = run_heat_cycle(refinement=2, fe_degree=1, type_=TimeStepType.CGP,
                        n_timesteps_at_once=2, gmres_maxiter=700)
    r3 = run_heat_cycle(refinement=3, fe_degree=1, type_=TimeStepType.CGP,
                        n_timesteps_at_once=2, gmres_maxiter=700)
    rate = np.log2(r2.l2_l2 / r3.l2_l2)
    assert rate > 1.8


def test_heat_cgp2_errors_match_golden():
    """tf02 config: CGP(2), 2 steps at once (golden tp_01.output:108-115)."""
    res = run_heat_cycle(refinement=2, fe_degree=2, type_=TimeStepType.CGP,
                         n_timesteps_at_once=2, gmres_maxiter=900)
    assert res.l2_l2 == pytest.approx(1.57444e-03, rel=2e-5)
    assert res.linf_linf == pytest.approx(4.36348e-03, rel=2e-5)
    assert res.l2_h1 == pytest.approx(1.16973e-02, rel=2e-5)
    assert res.n_blocks == 4


@pytest.mark.slow
def test_wave_cgp2_converges():
    """tf06-style: wave CGP(2), 4 steps at once."""
    r2 = run_heat_cycle(refinement=2, fe_degree=2, type_=TimeStepType.CGP,
                        problem=ProblemType.wave, n_timesteps_at_once=4,
                        gmres_maxiter=900)
    r3 = run_heat_cycle(refinement=3, fe_degree=2, type_=TimeStepType.CGP,
                        problem=ProblemType.wave, n_timesteps_at_once=4,
                        gmres_maxiter=1200)
    rate = np.log2(r2.l2_l2 / r3.l2_l2)
    assert rate > 2.5, (r2.l2_l2, r3.l2_l2, rate)
