"""Aux subsystems: time-only multigrid (the transfer_01 analogue), campaign
generation, 3D heat convergence, timers."""
import numpy as np

from stfem_tpu.drivers.heat import run_heat_cycle, stmg_preconditioner_factory
from stfem_tpu.types import CoarseningType, TimeStepType
from stfem_tpu.utils.campaign import (emit_job_script,
                                      generate_convergence_campaign)
from stfem_tpu.utils.timer import TimerOutput


def test_time_only_multigrid():
    """Time-only GMG (tau/k levels, no space coarsening): the reference's
    transfer_01 scenario."""
    res = run_heat_cycle(
        refinement=2, fe_degree=1, type_=TimeStepType.DG,
        n_timesteps_at_once=4,
        preconditioner_factory=stmg_preconditioner_factory(
            fe_degree_min=1, time_only=True,
            n_timesteps_at_once_min=1,
            coarsening_type=CoarseningType.space_or_time),
        gmres_maxiter=60)
    assert res.avg_iterations <= 25
    assert res.l2_l2 < 2e-2


def test_heat_3d_converges():
    """3D heat with the full STMG preconditioner."""
    factory = stmg_preconditioner_factory(fe_degree_min=1)
    r2 = run_heat_cycle(refinement=2, fe_degree=1, type_=TimeStepType.DG,
                        n_timesteps_at_once=2, subdivisions=(1, 1, 1),
                        lower=(0.0,) * 3, upper=(1.0,) * 3,
                        preconditioner_factory=factory, gmres_maxiter=60)
    r3 = run_heat_cycle(refinement=3, fe_degree=1, type_=TimeStepType.DG,
                        n_timesteps_at_once=2, subdivisions=(1, 1, 1),
                        lower=(0.0,) * 3, upper=(1.0,) * 3,
                        preconditioner_factory=factory, gmres_maxiter=60)
    rate = np.log2(r2.l2_l2 / r3.l2_l2)
    assert rate > 1.7, (r2.l2_l2, r3.l2_l2)
    assert r3.avg_iterations <= 20


def test_campaign_generation(tmp_path):
    files = generate_convergence_campaign(str(tmp_path))
    assert len(files) == 2 * 2 * 3
    assert len(set(files)) == len(files)  # content-hashed, unique
    script = emit_job_script(files[0], str(tmp_path))
    assert "python -m stfem_tpu.drivers.tp01" in open(script).read()


def test_timer_output():
    t = TimerOutput()
    with t.scope("vmult"):
        pass
    with t.scope("vmult"):
        pass
    assert t.counts["vmult"] == 2
    assert "vmult" in t.summary()
