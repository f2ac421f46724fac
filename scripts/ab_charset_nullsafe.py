#!/usr/bin/env python
"""One-session A/B of the round-15 charset label-arm short-circuit fix
(``label == lit`` → ``label.eqNullSafe(lit)`` in
``http_body_text_charset``): the OLD chain is reconstructed by loading
a textually de-patched copy of sources/http.py (``.eqNullSafe(`` →
`` == (``) as a separate module, so both expressions run alternating
in ONE JVM — machine drift cancels, unlike cross-session minima.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_charset_nullsafe.py [ROUNDS]
Prints one JSON line: old/new mb_off + mb_on run lists and mins.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
COPIES = int(os.environ.get("BENCH_PIPELINE_COPIES", "100"))
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def _load_depatched():
    """sources/http.py with the eqNullSafe fix textually reverted."""
    src_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "llm_pretraining_data_pipeline_spark", "sources", "http.py",
    )
    with open(src_path) as fh:
        src = fh.read()
    # .__eq__( keeps method-call precedence inside `... & ...` arms (a
    # bare ` == (` would bind the & tighter than the ==)
    old_src = src.replace(".eqNullSafe(", ".__eq__(")
    assert old_src != src, "expected eqNullSafe sites in http.py"
    spec = importlib.util.spec_from_loader("http_old_ab", loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__name__"] = "http_old_ab"
    exec(compile(old_src, src_path + " (de-patched)", "exec"), mod.__dict__)
    return mod


def main() -> int:
    from pyspark.sql import functions as F

    from llm_pretraining_data_pipeline_spark.session import get_spark
    from llm_pretraining_data_pipeline_spark.sources import http as http_new

    http_old = _load_depatched()
    spark = get_spark(
        app_name="ab_charset_nullsafe",
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
    mb_bodies = raw.select(
        F.encode("text", "utf-8").alias("body"),
        F.when(F.crc32(F.col("url")) % 12 == 0, F.lit("shift_jis"))
        .when(F.crc32(F.col("url")) % 2 == 0, F.lit("utf-8"))
        .otherwise(F.lit("windows-1252")).alias("charset"),
    )
    # the crawl_to_corpus shape: NO usable label anywhere (no header
    # param, no <meta>), so EVERY row falls through the label arms —
    # the maximal surface for the short-circuit fix (~12x the mb
    # fixture's 8.4% gated slice), used because the shared-VM noise
    # floor swamps the slice-sized effect
    nolabel = raw.select(
        F.encode("text", "utf-8").alias("body"),
        F.lit(None).cast("string").alias("charset"),
    )

    def run(frame, mod, multibyte):
        t0 = time.time()
        res = frame.select(
            mod.http_body_text_charset(multibyte=multibyte).alias("d")
        ).agg(F.sum(F.length("d.text"))).collect()[0][0]
        return round(time.time() - t0, 3), int(res)

    # warm-up both shapes once (JIT/codegen)
    run(mb_bodies, http_old, False)
    run(mb_bodies, http_new, False)
    out = {
        k: []
        for k in (
            "old_off", "new_off", "old_on", "new_on",
            "old_nolabel", "new_nolabel",
        )
    }
    ref = {}
    for _ in range(ROUNDS):
        for key, frame, mod, mb in (
            ("old_off", mb_bodies, http_old, False),
            ("new_off", mb_bodies, http_new, False),
            ("old_on", mb_bodies, http_old, True),
            ("new_on", mb_bodies, http_new, True),
            ("old_nolabel", nolabel, http_old, False),
            ("new_nolabel", nolabel, http_new, False),
        ):
            sec, res = run(frame, mod, mb)
            out[key].append(sec)
            fam = "nolabel" if "nolabel" in key else "mb"
            # in-run referee: the fix must be output-identical
            assert ref.setdefault(fam, res) == res, (
                f"{key} result drift: {res} != {ref[fam]}"
            )
    rec = {
        k: {"runs": v, "min": min(v), "median": sorted(v)[len(v) // 2]}
        for k, v in out.items()
    }
    rec["checksum"] = ref
    rec["sf_dir"], rec["cpus"] = SF_DIR, CPUS
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
