#!/usr/bin/env python
"""Quiet-protocol bench runner (VERDICT r13 item 3): run bench.py N
times back-to-back on an otherwise idle VM, collect every run's JSON
line, and write ONE record with a per-entry ``summary`` block
({min, median, max, n} per query and per meta throughput field) so a
reader never has to recompute minima across run arrays.

Usage:
    python scripts/quiet_bench.py [N_RUNS] [OUT_PATH]

Defaults: 3 runs, BENCH_QUIET_LOCAL.json. Every run inherits the
caller's env (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / BENCH_*), plus
BENCH_WC_STAGES=1 so each run records the web-curation stage ladder.
Each bench.py run is a FRESH process (fresh JVM — no cross-run cache
pollution); the last stdout line of each run is its JSON record.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def run_once(env: dict, run_idx: int) -> dict:
    # read the FULL record from BENCH_JSON_OUT, not stdout: bench.py's
    # LAST stdout line is the compact fallback (no meta, 2dp queries) —
    # parsing it would silently drop every meta:* summary entry
    # (review finding r14)
    # pid-keyed so two concurrent quiet_bench invocations on a shared
    # VM never overwrite each other's records mid-run (ADVICE r14 —
    # the same discipline as the repo's pid-keyed staging dirs)
    out_file = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"quiet_bench_{os.getpid()}_run{run_idx}.json",
    )
    env = dict(env)
    env["BENCH_JSON_OUT"] = out_file
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True,
        text=True,
        env=env,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench.py failed with rc={proc.returncode}")
    with open(out_file) as fh:
        rec = json.load(fh)
    os.unlink(out_file)
    return rec


def summarize(runs: list[dict]) -> dict:
    """Per-entry {min, median, max, n} over every numeric field in
    ``queries`` plus the suite total and numeric ``meta`` fields."""
    series: dict[str, list[float]] = {}
    for r in runs:
        series.setdefault("suite_seconds", []).append(float(r["value"]))
        for k, v in (r.get("queries") or {}).items():
            if isinstance(v, (int, float)):
                series.setdefault(k, []).append(float(v))
        for k, v in (r.get("meta") or {}).items():
            if isinstance(v, (int, float)):
                series.setdefault(f"meta:{k}", []).append(float(v))
    return {
        k: {
            "min": round(min(vs), 3),
            "median": round(statistics.median(vs), 3),
            "max": round(max(vs), 3),
            "n": len(vs),
        }
        for k, vs in sorted(series.items())
    }


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_QUIET_LOCAL.json"
    env = dict(os.environ)
    env.setdefault("BENCH_WC_STAGES", "1")
    runs = []
    for i in range(n_runs):
        t0 = time.time()
        rec = run_once(env, i)
        rec["_wall_sec"] = round(time.time() - t0, 1)
        runs.append(rec)
        print(
            f"run {i + 1}/{n_runs}: suite {rec['value']}s "
            f"(wall {rec['_wall_sec']}s)",
            flush=True,
        )
    record = {
        "protocol": (
            f"quiet re-measure: {n_runs} full bench.py runs, fresh JVM "
            "each, BENCH_WC_STAGES=1, idle VM; per-entry min/median/max "
            "in `summary` (keys: suite_seconds, every query, numeric "
            "meta fields as meta:<name>)"
        ),
        "runs": runs,
        "summary": summarize(runs),
    }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
