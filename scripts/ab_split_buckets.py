#!/usr/bin/env python
"""One-JVM alternating A/B of the split-index layout's id_buckets knob
(round 16, VERDICT r15 item 1): auto-derived (None -> docs/256 rule) vs
the r15 hand-pinned 2048 vs a flat-equivalent single bucket. Each arm,
each round: timed split BUILD, timed FULL-batch e2e flag, timed
SELECTIVE flag, plus untimed files-read accounting on the operator's
own pruned frames. Flag counts are refereed identical across arms
(bucketing is layout, never semantics).

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python
scripts/ab_split_buckets.py [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from llm_pretraining_data_pipeline_spark.operators import dedup as DD  # noqa: E402
from llm_pretraining_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
COPIES = int(os.environ.get("BENCH_PIPELINE_COPIES", "100"))
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
ARMS = [None, 2048, 1]  # None = auto rule


def main() -> int:
    spark = get_spark(
        app_name="ab_split_buckets",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    base = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * COPIES + F.col("copy")).alias("doc_id"),
            "text",
        )
        .repartition(CPUS)
    )
    ni_snap = base.where(F.col("doc_id") % 2 == 0)
    ni_new = base.where(F.col("doc_id") % 2 == 1)
    ni_small = ni_new.where(F.col("doc_id") % 20000 == 1)
    ni_new.count()  # warm input

    results: dict = {str(a): [] for a in ARMS}
    ref = {}

    def one(arm, d):
        rec = {}
        kw = {} if arm is None else {"id_buckets": arm}
        t0 = time.time()
        DD.write_minhash_index(
            DD.minhash_index_frame(ni_snap, "text"),
            f"{d}/idx", sig_buckets=256, split_sig=True, **kw,
        )
        rec["build"] = round(time.time() - t0, 2)
        with open(f"{d}/idx/_index_meta.json") as fh:
            rec["id_buckets"] = json.load(fh)["id_buckets"]
        t0 = time.time()
        row = (
            DD.near_dedup_against_stored_index(
                ni_new, f"{d}/idx", threshold=0.7
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_known_near").cast("long")).alias("f"),
            )
            .collect()[0]
        )
        rec["e2e"] = round(time.time() - t0, 2)
        rec["flagged"] = int(row["f"])
        t0 = time.time()
        srow = (
            DD.near_dedup_against_stored_index(
                ni_small, f"{d}/idx", threshold=0.7
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("is_known_near").cast("long")).alias("f"),
            )
            .collect()[0]
        )
        rec["selective"] = round(time.time() - t0, 2)
        rec["sel_flagged"] = int(srow["f"])
        bands_t, sigs_t = DD.read_minhash_split_frames(
            ni_small, f"{d}/idx", checkpoint=False
        )
        rec["sigs_files_read"] = (
            sigs_t.select(F.input_file_name()).distinct().count()
        )
        rec["sigs_files_total"] = len(
            spark.read.parquet(f"{d}/idx/sigs").inputFiles()
        )
        total = 0
        for root, _, names in os.walk(f"{d}/idx"):
            for nm in names:
                total += os.path.getsize(os.path.join(root, nm))
        rec["bytes"] = total
        return rec

    for r in range(ROUNDS):
        order = ARMS if r % 2 == 0 else list(reversed(ARMS))
        for arm in order:
            d = tempfile.mkdtemp(prefix="ab_sb_")
            try:
                rec = one(arm, d)
            finally:
                shutil.rmtree(d, ignore_errors=True)
            key = ("flagged", "sel_flagged")
            for k in key:
                ref.setdefault(k, rec[k])
                assert rec[k] == ref[k], f"DRIFT {k} on arm {arm}: {rec}"
            results[str(arm)].append(rec)
            print(f"round {r} id_buckets={arm}: {rec}", flush=True)

    for arm in ARMS:
        recs = results[str(arm)]
        out = {"arm": arm, "derived": recs[0]["id_buckets"]}
        for k in ("build", "e2e", "selective"):
            vs = sorted(r[k] for r in recs)
            out[k] = {"min": vs[0], "med": vs[len(vs) // 2], "runs": vs}
        out["sigs_files"] = (
            f"{recs[0]['sigs_files_read']}/{recs[0]['sigs_files_total']}"
        )
        out["bytes"] = recs[0]["bytes"]
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
