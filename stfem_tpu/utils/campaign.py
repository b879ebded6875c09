"""Campaign orchestration: parameter-file generation with content-hashed
names (the reference's tests/json/generate.py + generate_parameters.sh) and
job-script emission (job_generator.py) retargeted from SLURM/MPI to
single-host TPU invocations of the drivers."""
from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path


def content_hashed_name(params: dict, prefix: str = "cfg") -> str:
    blob = json.dumps(params, sort_keys=True).encode()
    return f"{prefix}_{hashlib.sha1(blob).hexdigest()[:12]}.json"


def generate_parameter_file(base: dict, overrides: dict, out_dir: str,
                            prefix: str = "cfg") -> str:
    """Merge overrides into base config and write under a content-hashed
    name (reference tests/json/generate.py:7-11)."""
    merged = dict(base)
    merged.update(overrides)
    name = content_hashed_name(merged, prefix)
    path = Path(out_dir) / name
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(merged, indent=4))
    return str(path)


def generate_convergence_campaign(out_dir: str, problem: str = "heat",
                                  types=("DG", "CGP"),
                                  distort_coeffs=(0.0, 0.5),
                                  steps_at_once=(1, 2, 4)) -> list[str]:
    """The reference's convergence campaign matrix
    (generate_parameters.sh:5-36)."""
    base = {
        "doOutput": "false", "spaceTimeMg": "true",
        "problemType": problem, "feDegree": "1", "nDegCycles": "3",
        "nRefCycles": "4", "refinement": "2", "usePMg": "true",
        "coarseningType": "space_and_time",
    }
    files = []
    for t in types:
        for d in distort_coeffs:
            for n in steps_at_once:
                files.append(generate_parameter_file(
                    base, {"timeType": t, "distortCoeff": str(d),
                           "nTimestepsAtOnce": str(n)}, out_dir,
                    prefix=f"{problem}_{t}"))
    return files


def emit_job_script(config_path: str, out_dir: str, dim: int = 3,
                    driver: str = "stfem_tpu.drivers.tp01") -> str:
    """Single-host runner script (the reference's job_generator.py emits
    SLURM/srun scripts; here one TPU host runs the jitted sharded solver)."""
    name = Path(config_path).stem
    script = Path(out_dir) / f"run_{name}.sh"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text(
        "#!/bin/bash\nset -e\n"
        f"python -m {driver} --file {config_path} --dim {dim} "
        f"| tee {out_dir}/{name}.log\n")
    os.chmod(script, 0o755)
    return str(script)
