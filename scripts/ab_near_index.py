#!/usr/bin/env python
"""Same-session A/B of the near_index build + e2e flag step between two
commits (the ab_minhash_seals worktree protocol): alternating fresh
JVMs so machine drift hits both arms equally, reporting the index BUILD
and the against-stored-index E2E separately (they moved in opposite
directions during round 15's vectorization work, so a combined number
would hide a regression).

Usage:
    python scripts/ab_near_index.py <commit_a> <commit_b> [ROUNDS]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import os, sys, time, json, tempfile, shutil
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from llm_pretraining_data_pipeline_spark.session import get_spark
from llm_pretraining_data_pipeline_spark.operators import dedup as DD

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
COPIES = int(os.environ.get("BENCH_PIPELINE_COPIES", "100"))
spark = get_spark(app_name="ab_near_index", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
copies = spark.range(COPIES).withColumnRenamed("id", "copy")
base = (docs.crossJoin(copies)
        .select((F.col("doc_id") * COPIES + F.col("copy")).alias("doc_id"),
                "text")
        .repartition(CPUS))
ni_snap = base.where(F.col("doc_id") % 2 == 0)
ni_new = base.where(F.col("doc_id") % 2 == 1)
spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().count()
SPLIT = os.environ.get("AB_NI_SPLIT", "") == "1"  # split-layout arms instead
# per-arm id_buckets (round 16): AB_NI_IDB unset/empty = the tree's own
# default (auto-derive on sidecar-bearing trees, 64 on older ones);
# a number pins the r15 hand-tuned layout
IDB = os.environ.get("AB_NI_IDB", "")
d = tempfile.mkdtemp(prefix="ab_ni_")
kw = (
    dict(split_sig=True, **({"id_buckets": int(IDB)} if IDB else {}))
    if SPLIT
    else {}
)
sub = "idx_split" if SPLIT else "idx"
try:
    t0 = time.time()
    DD.write_minhash_index(DD.minhash_index_frame(ni_snap, "text"),
                           f"{d}/{sub}", sig_buckets=256, **kw)
    build = round(time.time() - t0, 3)
    t0 = time.time()
    row = (DD.near_dedup_against_stored_index(
               ni_new, f"{d}/{sub}", threshold=0.7, sig_buckets=256, **kw)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_known_near").cast("long")).alias("f"))
           .collect()[0])
    e2e = round(time.time() - t0, 3)
    print(json.dumps({"build": build, "e2e": e2e,
                      "n": int(row["n"]), "flagged": int(row["f"])}))
finally:
    shutil.rmtree(d, ignore_errors=True)
"""


def main() -> int:
    commit_a, commit_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    base = tempfile.mkdtemp(prefix=f"ab_ni_{os.getpid()}_")
    runner = os.path.join(base, "runner.py")
    with open(runner, "w") as fh:
        fh.write(RUNNER)
    trees = {}
    for label, commit in (("a", commit_a), ("b", commit_b)):
        wt = os.path.join(base, f"wt_{label}")
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, commit],
            check=True, capture_output=True,
        )
        trees[label] = wt
    results = {"a": [], "b": []}
    try:
        for _ in range(rounds):
            for label in ("a", "b"):  # interleaved: drift hits both
                env = dict(os.environ)
                arm_idb = os.environ.get(f"AB_NI_IDB_{label.upper()}")
                if arm_idb is not None:
                    env["AB_NI_IDB"] = arm_idb
                proc = subprocess.run(
                    [sys.executable, runner, trees[label]],
                    capture_output=True, text=True, env=env,
                )
                if proc.returncode != 0:
                    sys.stderr.write(proc.stderr[-3000:])
                    raise SystemExit(f"arm {label} failed")
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
                results[label].append(rec)
                sys.stderr.write(f"{label}: {rec}\n")
    finally:
        for wt in trees.values():
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force", wt],
                capture_output=True,
            )
    summary = {}
    for (label, commit) in (("a", commit_a), ("b", commit_b)):
        recs = results[label]
        summary[label] = {"commit": commit}
        for k in ("build", "e2e"):
            vs = [r[k] for r in recs]
            summary[label][k] = {
                "runs": vs, "min": min(vs),
                "median": sorted(vs)[len(vs) // 2],
            }
        summary[label]["flagged"] = sorted({r["flagged"] for r in recs})
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
