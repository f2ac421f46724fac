#!/usr/bin/env python
"""Adjudicate the charset_decode_mb_off > mb_on inversion (VERDICT r14
"What's wrong" 1): at sf0.1/32cpu the flag that ADDS an Arrow stage
over the ~8% multi-byte-gated slice consistently beat the pure-Catalyst
default (quiet medians 3.51 vs 3.12 s, all 8 r14 runs).

Protocol: ONE session, alternating A/B/A/B/A/B timings of the two arms
(so JVM warmth and page cache are shared), plus two isolation arms:

- ``off_nosjis``: the mb_off chain over the SAME corpus with the sjis
  labels relabeled windows-1252 — if this matches mb_on, the cost is
  specifically the sjis rows' fall-through work under mb_off (label
  arms + full-body is_valid_utf8 + JVM decode), not the 92% majority.
- ``utf8scan``: one full-corpus ``is_valid_utf8`` aggregate — bounds
  the validity-scan share of the fall-through cost.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python
scripts/profile_charset_mb.py [ROUNDS]. Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
COPIES = int(os.environ.get("BENCH_PIPELINE_COPIES", "100"))
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> int:
    from pyspark.sql import functions as F

    from llm_pretraining_data_pipeline_spark.session import get_spark
    from llm_pretraining_data_pipeline_spark.sources.http import (
        http_body_text_charset,
    )

    spark = get_spark(
        app_name="profile_charset_mb",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    raw = (
        docs.crossJoin(copies)
        .select(
            F.concat(
                F.lit("http://bench/"), F.col("doc_id"), F.lit("/"),
                F.col("copy"),
            ).alias("url"),
            "text",
        )
        .repartition(CPUS)
    )
    # same fixture as bench.py's mb arms
    mb_bodies = raw.select(
        F.encode("text", "utf-8").alias("body"),
        F.when(F.crc32(F.col("url")) % 12 == 0, F.lit("shift_jis"))
        .when(F.crc32(F.col("url")) % 2 == 0, F.lit("utf-8"))
        .otherwise(F.lit("windows-1252")).alias("charset"),
    )
    nosjis = raw.select(
        F.encode("text", "utf-8").alias("body"),
        F.when(F.crc32(F.col("url")) % 2 == 0, F.lit("utf-8"))
        .otherwise(F.lit("windows-1252")).alias("charset"),
    )

    def run(frame, multibyte):
        t0 = time.time()
        frame.select(
            http_body_text_charset(multibyte=multibyte).alias("d")
        ).agg(F.sum(F.length("d.text"))).collect()
        return round(time.time() - t0, 3)

    # warm-up: one throwaway of each shape
    run(mb_bodies, False)
    run(mb_bodies, True)

    out: dict[str, list[float]] = {
        "mb_off": [], "mb_on": [], "off_nosjis": [], "utf8scan": [],
    }
    for _ in range(ROUNDS):
        out["mb_off"].append(run(mb_bodies, False))
        out["mb_on"].append(run(mb_bodies, True))
        out["off_nosjis"].append(run(nosjis, False))
        t0 = time.time()
        mb_bodies.agg(
            F.sum(F.is_valid_utf8("body").cast("long"))
        ).collect()
        out["utf8scan"].append(round(time.time() - t0, 3))
    rec = {
        k: {"runs": v, "min": min(v), "median": sorted(v)[len(v) // 2]}
        for k, v in out.items()
    }
    rec["sf_dir"] = SF_DIR
    rec["cpus"] = CPUS
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
