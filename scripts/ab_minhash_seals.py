#!/usr/bin/env python
"""Adjudicate the pipeline_minhash_e2e quiet-min drift (VERDICT r14
"What's wrong" 2: 47.7 -> 50.8 s r13->r14 with no code change on the
path): same-session-protocol A/B of the r13 seal vs the r14 seal code
on EXACTLY the bench entry, alternating fresh processes (fresh JVM
each run, interleaved so machine drift hits both arms equally) — the
web_curation playbook from r12.

Usage:
    python scripts/ab_minhash_seals.py <commit_a> <commit_b> [ROUNDS]

Creates read-only git worktrees under /tmp, runs the inlined entry
runner in each, prints one JSON line with per-arm runs/min/median.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import os, sys, time, json
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from llm_pretraining_data_pipeline_spark.session import get_spark
from llm_pretraining_data_pipeline_spark.plans import pipeline as P

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
COPIES = int(os.environ.get("BENCH_PIPELINE_COPIES", "100"))
spark = get_spark(app_name="ab_minhash", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
copies = spark.range(COPIES).withColumnRenamed("id", "copy")
raw = (docs.crossJoin(copies)
       .select(F.concat(F.lit("http://bench/"), F.col("doc_id"),
                        F.lit("/"), F.col("copy")).alias("url"), "text")
       .repartition(CPUS))
# bench.py's exact warm-up + entry (_materialize agg anchors all outputs)
spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().count()
t0 = time.time()
out = P.run_pipeline(raw, P.PipelineConfig(
    use_nfkc=True, apply_lang_filter=False, use_minhash_dedup=True,
    tokenizer_backend="regex"))
row = out.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.length("text_pii_masked")).alias("chars"),
    F.sum("n_tokens").alias("toks"),
    F.sum(F.length(F.coalesce("drop_reason", F.lit("")))).alias("reasons"),
    F.sum("quality_score").alias("quality"),
    F.sum(F.length("subset")).alias("subsets"),
).collect()[0]
print(json.dumps({"sec": round(time.time() - t0, 3), "n": int(row["n"])}))
"""


def main() -> int:
    commit_a, commit_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    base = tempfile.mkdtemp(prefix=f"ab_minhash_{os.getpid()}_")
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
                proc = subprocess.run(
                    [sys.executable, runner, trees[label]],
                    capture_output=True, text=True,
                )
                if proc.returncode != 0:
                    sys.stderr.write(proc.stderr[-3000:])
                    raise SystemExit(f"arm {label} failed")
                rec = json.loads(proc.stdout.strip().splitlines()[-1])
                results[label].append(rec["sec"])
    finally:
        for wt in trees.values():
            subprocess.run(
                ["git", "-C", REPO, "worktree", "remove", "--force", wt],
                capture_output=True,
            )
    summary = {
        label: {
            "commit": commit,
            "runs": runs,
            "min": min(runs),
            "median": sorted(runs)[len(runs) // 2],
        }
        for (label, commit), runs in zip(
            (("a", commit_a), ("b", commit_b)), results.values()
        )
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
