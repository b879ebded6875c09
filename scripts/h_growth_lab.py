"""h-growth lab: reproduce the tf01 iteration ladder (reference golden
7 / 9 / 8.75 / 7.875 over refs 2-5, tests/tp_01.output:4-19) under
controlled component variants, to root-cause the repo's h-growth.

Usage: python scripts/h_growth_lab.py [variant ...]
Variants: base, min0, minmax, s0.9 .. s2.0 (omega = s/raw_estimate),
          allsmooth, novar, cheb
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import stfem_tpu.stmg.gmg as gmgmod  # noqa: E402
from stfem_tpu.config import Parameters  # noqa: E402
from stfem_tpu.drivers.heat import (run_heat_cycle,  # noqa: E402
                                    stmg_preconditioner_factory)
from stfem_tpu.stmg.gmg import GMGParams  # noqa: E402

TF01 = os.environ.get("CFG", os.environ.get(
    "STFEM_TF01", "/root/reference/tests/json/tf01.json"))

_orig_relax = gmgmod.relaxation_parameters


def omega_min0(info, smoothing_range):
    # hypothesis: deal.II's power-iteration path leaves min_eigenvalue at 0
    # => alpha = min(0.9*max, 0) = 0 => omega = 2/max_est
    return 2.0 / info.max_eigenvalue


def omega_minmax(info, smoothing_range):
    # hypothesis: min_eigenvalue defaults huge => alpha = 0.9*max_est
    return 2.0 / (0.9 * info.max_eigenvalue + info.max_eigenvalue)


def omega_scale(s):
    def f(info, smoothing_range):
        raw = info.max_eigenvalue / 1.2
        return s / raw

    return f


def run_ladder(refs, label, params=None, omega_fn=None,
               precond_dtype=jnp.float32, **build_kwargs):
    gmgmod.relaxation_parameters = omega_fn or _orig_relax
    p = Parameters.parse(TF01, 2)
    if os.environ.get("DEG"):
        p.fe_degree = int(os.environ["DEG"])
    iters = []
    for ref in refs:
        kw = dict(coarsening_type=p.coarsening_type,
                  time_before_space=p.time_before_space,
                  space_time_level_first=p.space_time_level_first,
                  use_pmg=p.use_pmg,
                  fe_degree_min=max(p.fe_degree_min, 1),
                  poly_coarsening=p.poly_coarsening)
        kw.update(build_kwargs)
        factory = stmg_preconditioner_factory(
            dtype=precond_dtype,
            params=params if params is not None else p.mg_data,
            **kw)
        res = run_heat_cycle(
            refinement=ref, fe_degree=p.fe_degree, type_=p.type,
            problem=p.problem,
            n_timesteps_at_once=p.n_timesteps_at_once,
            subdivisions=p.subdivisions,
            lower=p.hyperrect_lower_left,
            upper=p.hyperrect_upper_right,
            end_time=p.end_time, frequency=p.frequency,
            preconditioner_factory=factory,
            gmres_maxiter=200, rel_tol=p.rel_tol,
            extrapolate=p.extrapolate, compute_errors=False)
        iters.append(res.avg_iterations)
        print(f"  [{label}] ref={ref}: avg iters {res.avg_iterations:g}",
              flush=True)
    print(f"RESULT {label}: {iters}  (golden 7/9/8.75/7.875)", flush=True)
    gmgmod.relaxation_parameters = _orig_relax
    return iters


def main():
    wanted = sys.argv[1:] or ["base"]
    refs = [int(r) for r in os.environ.get("REFS", "2,3,4").split(",")]
    for v in wanted:
        if v == "base":
            run_ladder(refs, "base")
        elif v == "min0":
            run_ladder(refs, "min0", omega_fn=omega_min0)
        elif v == "minmax":
            run_ladder(refs, "minmax", omega_fn=omega_minmax)
        elif v[0] == "s" and v[1:].replace(".", "").isdigit():
            s = float(v[1:])
            run_ladder(refs, v, omega_fn=omega_scale(s))
        elif v == "allsmooth":
            run_ladder(refs, v, params=GMGParams(smooth_all_levels=True))
        elif v == "novar":
            run_ladder(refs, v, params=GMGParams(variable=False))
        elif v == "skipid":
            run_ladder(refs, v, params=GMGParams(skip_identity_levels=True))
        elif v == "l2restrict":
            run_ladder(refs, v, params=GMGParams(
                restrict_is_transpose_prolongate=False))
        elif v == "steps2":
            run_ladder(refs, v, params=GMGParams(smoothing_steps=2))
        elif v == "hladder":
            # pure h-MG: no tau, no p levels -> every level smoothed
            run_ladder(refs, v, use_pmg=False, n_timesteps_at_once_min=2)
        elif v == "htau":
            # h + tau levels, no p -> no Identity pairing
            run_ladder(refs, v, use_pmg=False, n_timesteps_at_once_min=1)
        elif v == "hp":
            # h + p levels, no tau -> no Identity pairing
            run_ladder(refs, v, use_pmg=True, n_timesteps_at_once_min=2)
        elif v == "tbs":
            # time levels at the coarse end (tau at the ladder bottom)
            run_ladder(refs, v, time_before_space=True)
        elif v == "tbs_allsmooth":
            run_ladder(refs, v, params=GMGParams(smooth_all_levels=True),
                       time_before_space=True)
        elif v == "ztf":
            run_ladder(refs, v, space_time_level_first=False)
        elif v == "tbs_ztf":
            run_ladder(refs, v, time_before_space=True,
                       space_time_level_first=False)
        elif v == "ztf_direct":
            run_ladder(refs, v, params=GMGParams(
                coarse_grid_smoother_type="Direct"),
                space_time_level_first=False)
        elif v == "ztf_f64":
            run_ladder(refs, v, precond_dtype=jnp.float64,
                       space_time_level_first=False)
        elif v == "ztf_eig40":
            run_ladder(refs, v, params=GMGParams(
                smoothing_eig_cg_n_iterations=40),
                space_time_level_first=False)
        else:
            raise SystemExit(f"unknown variant {v}")


if __name__ == "__main__":
    main()
