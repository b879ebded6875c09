"""One-command full golden sweep (VERDICT r3 #7): run every
STFEM_GOLDEN_FULL case in its own subprocess (the XLA:CPU backend
segfaults when hundreds of executables accumulate in one process --
GOLDEN_FULL_r03.txt:11-63), retry crashes once, and write both the
human-readable artifact and a machine-readable JSON summary.

Usage:
    python scripts/golden_full.py [--only tf04,tf03-k2] [--resume FILE]
        [--out GOLDEN_FULL_rNN.txt] [--nice N] [--timeout SEC]

`make golden` wraps this with the round's default artifact name.
Exit code 0 iff every selected case passed.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CRASH_RCS = {-11, -6, 134, 139, 132, 136}  # segv/abort family


def collect_cases():
    env = dict(os.environ, STFEM_GOLDEN_FULL="1", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_golden_tables.py",
         "-m", "golden", "--collect-only", "-q"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    cases = []
    for line in out.stdout.splitlines():
        m = re.match(r"(tests/test_golden_tables\.py::\S+\[(\S+)\])", line)
        if m:
            cases.append((m.group(2), m.group(1)))
    if not cases:
        raise SystemExit(f"collection failed:\n{out.stdout}\n{out.stderr}")
    return cases


def parse_done(artifact_path):
    """case ids with rc=0 recorded in an existing artifact (resume)."""
    done = set()
    if artifact_path and os.path.exists(artifact_path):
        for line in open(artifact_path):
            m = re.match(r"case (\S+) rc=0", line)
            if m:
                done.add(m.group(1))
    return done


def run_case(case_id, node_id, log, nice, timeout):
    env = dict(os.environ, STFEM_GOLDEN_FULL="1", JAX_PLATFORMS="cpu")
    cmd = [sys.executable, "-m", "pytest", node_id, "-m", "golden", "-q",
           "--no-header", "-p", "no:cacheprovider"]
    if nice:
        cmd = ["nice", "-n", str(nice)] + cmd
    t0 = time.time()
    try:
        out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                             text=True, timeout=timeout)
        rc, text = out.returncode, out.stdout + out.stderr
    except subprocess.TimeoutExpired as e:
        rc, text = 124, (e.stdout or b"").decode(errors="replace") \
            if isinstance(e.stdout, bytes) else (e.stdout or "")
    dt = time.time() - t0
    log.write(f"== {case_id} ==\n")
    tail = "\n".join(text.strip().splitlines()[-12:])
    log.write(tail + "\n")
    log.write(f"case {case_id} rc={rc}  ({dt:.0f}s)\n")
    log.flush()
    return rc, dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma list; a bare config name (tf04) selects "
                         "all its degrees, tf04-k2 selects one case")
    ap.add_argument("--resume", default="",
                    help="existing artifact; cases recorded rc=0 there "
                         "are skipped (and copied into the summary)")
    ap.add_argument("--out", default=os.path.join(REPO, "GOLDEN_FULL.txt"))
    ap.add_argument("--summary", default="")
    ap.add_argument("--nice", type=int, default=10)
    # tf02stokes-k4 (2D Q5 x DGP4) legitimately needs >65 min: its XLA:CPU
    # modules compile at >7 min each (r4 artifact) -- budget 3 h per case
    ap.add_argument("--timeout", type=int, default=10800)
    args = ap.parse_args(argv)

    cases = collect_cases()
    sel = [s for s in args.only.split(",") if s]
    if sel:
        cases = [(cid, nid) for cid, nid in cases
                 if any(cid == s or cid.split("-")[0] == s for s in sel)]
    done = parse_done(args.resume)

    mode = "a" if os.path.exists(args.out) else "w"
    results = {}
    with open(args.out, mode) as log:
        if mode == "w":
            log.write("# Full golden-ladder sweep artifact "
                      "(scripts/golden_full.py; one subprocess per case, "
                      "crash-retried once)\n")
        for cid, nid in cases:
            if cid in done:
                results[cid] = {"rc": 0, "skipped": "resumed"}
                print(f"{cid}: resumed (rc=0 in {args.resume})", flush=True)
                continue
            rc, dt = run_case(cid, nid, log, args.nice, args.timeout)
            if rc in CRASH_RCS or rc < 0:
                print(f"{cid}: rc={rc} (backend crash) -- retrying",
                      flush=True)
                log.write(f"# {cid} crashed (rc={rc}); retry\n")
                rc, dt = run_case(cid, nid, log, args.nice, args.timeout)
            results[cid] = {"rc": rc, "seconds": round(dt, 1)}
            print(f"{cid}: rc={rc} ({dt:.0f}s)", flush=True)
    summary_path = args.summary or args.out.replace(".txt", ".json")
    # CUMULATIVE summary (VERDICT r4 weak #5): merge any existing summary
    # at the same path (earlier batches run with --only, resumed rounds)
    # with this invocation's results, so ONE JSON lists every case ever
    # recorded with its latest rc -- the canonical per-round artifact.
    merged = {}
    if os.path.exists(summary_path):
        try:
            merged = json.load(open(summary_path)).get("cases", {})
        except Exception:
            merged = {}
    merged.update(results)
    with open(summary_path, "w") as f:
        json.dump({"n_cases": len(merged),
                   "n_pass": sum(1 for r in merged.values()
                                 if r["rc"] == 0),
                   "cases": merged}, f, indent=1)
    bad = {c: r for c, r in results.items() if r["rc"] != 0}
    print(f"PASS {len(results) - len(bad)}/{len(results)} this run; "
          f"summary {summary_path}: "
          f"{sum(1 for r in merged.values() if r['rc'] == 0)}"
          f"/{len(merged)} cumulative"
          + (f"  FAILED: {sorted(bad)}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
