#!/usr/bin/env python
"""Alternating one-JVM A/B of the web-curation recipe with one of the
Arrow mirrors (default: the entity decoder, WC_AB_FLAG=mc_vectorized
for the block classifier) vs the Catalyst chain, on the EXACT bench
fixture (raw-HTML pages, robots rules, extract_main + smooth +
entities). Output-refereed: every arm's curation_summary rows must be
identical. Round 16, VERDICT r15 item 2.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=...
[WC_AB_FLAG=decode_vectorized|mc_vectorized] python
scripts/ab_web_curation_vec.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from llm_pretraining_data_pipeline_spark.plans import web_curation as WC  # noqa: E402
from llm_pretraining_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main() -> int:
    spark = get_spark(
        app_name="ab_web_curation_vec",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wc_copies = int(os.environ.get("BENCH_WC_COPIES", "10"))
    # the bench fixture, verbatim (bench.py web_curation_e2e)
    wc_raw = (
        docs.crossJoin(
            spark.range(wc_copies).withColumnRenamed("id", "copy")
        )
        .select(
            (F.col("doc_id") * wc_copies + F.col("copy")).alias("doc_id"),
            F.col("copy"),
            F.concat(
                F.lit('<div class="nav"><a href="/">home</a> '
                      '<a href="/x">more</a></div><p>'),
                F.concat_ws(
                    ". ",
                    F.col("text").substr(1, 90),
                    F.lit("fish &amp; chips &ndash; &pound;5 &#233;clair"
                          " &#x2713; deal"),
                    F.col("text").substr(45, 90),
                    F.col("text").substr(90, 90),
                    F.lit("the closing line of this page ends here."),
                ),
                F.lit('</p><div class="footer"><a href="/tos">terms</a>'
                      "</div>"),
            ).alias("text"),
        )
        .select(
            "doc_id",
            F.concat(
                F.lit("http://site-"),
                (F.col("doc_id") % 97).cast("string"),
                F.lit(".bench"),
                F.when(F.col("copy") % 11 == 0, F.lit("/blocked/"))
                .otherwise(F.lit("/p/")),
                F.col("doc_id").cast("string"),
            ).alias("url"),
            "text",
        )
        .repartition(CPUS)
    )
    wc_rules = (
        spark.range(97)
        .select(
            F.concat(F.lit("site-"), F.col("id").cast("string"),
                     F.lit(".bench")).alias("domain"),
            F.explode(
                F.array(
                    F.struct(F.lit("disallow").alias("rule"),
                             F.lit("/blocked").alias("pattern")),
                    F.struct(F.lit("disallow").alias("rule"),
                             F.lit("/*.tmp$").alias("pattern")),
                )
            ).alias("r"),
        )
        .select("domain", "r.rule", "r.pattern")
    )
    wc_raw.count()  # warm input

    flag = os.environ.get("WC_AB_FLAG", "decode_vectorized")

    def run(vectorized: bool):
        spark.sparkContext.setJobDescription(
            f"web_curation {flag}={vectorized}"
        )
        t0 = time.perf_counter()
        rows = WC.curation_summary(
            WC.run_web_curation(
                wc_raw,
                WC.WebCurationConfig(
                    gopher_min_words=10, gopher_min_stopwords=1,
                    extract_main=True, mc_smooth=True,
                    **{flag: vectorized},
                ),
                url_col="url",
                robots_rules=wc_rules,
            )
        ).collect()
        dt = time.perf_counter() - t0
        return dt, sorted(tuple(r) for r in rows)

    ref = None
    times = {True: [], False: []}
    for r in range(ROUNDS):
        for arm in (True, False) if r % 2 == 0 else (False, True):
            dt, rows = run(arm)
            times[arm].append(dt)
            if ref is None:
                ref = rows
            assert rows == ref, f"OUTPUT DRIFT on arm vectorized={arm}"
            print(f"round {r} vectorized={arm}: {dt:.2f}s", flush=True)
    for arm in (False, True):
        ts = sorted(times[arm])
        print(
            f"vectorized={arm}: min {ts[0]:.2f} med {ts[len(ts)//2]:.2f} "
            f"all {[round(t,2) for t in ts]}"
        )
    print("outputs identical on every run")
    return 0


if __name__ == "__main__":
    sys.exit(main())
