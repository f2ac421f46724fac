#!/usr/bin/env python
"""Warm stage-split profile of the bench's web_curation_e2e recipe
(VERDICT r12 item 3: quiet min moved 12.7 s -> 18.0 s on a nominally
unchanged recipe — decompose it).

Rebuilds the EXACT bench fixture (bench.py round-6 block: 50k raw-HTML
docs at sf0.1 x BENCH_WC_COPIES, 97-domain robots rules) and times a
progressive config ladder, best-of-N warm runs per rung:

    base      line/C4/Gopher/span/exact-dedup cascade only
    +robots   prepend the RFC 9309 gate
    +extract  prepend jusText block extraction (entities OFF explicitly)
    +smooth   good-neighbor smoothing
    +entities the full bench recipe (auto -> ON)

Rung deltas attribute cost per stage. Usage:
    python scripts/profile_web_curation.py [N_RUNS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main():
    from pyspark.sql import functions as F

    from llm_pretraining_data_pipeline_spark.plans import web_curation as WC
    from llm_pretraining_data_pipeline_spark.session import get_spark
    from llm_pretraining_data_pipeline_spark.sources.io import read_parquet

    spark = get_spark(
        app_name="profile_wc", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    docs = read_parquet(spark, os.path.join(SF_DIR, "documents.parquet"))

    wc_copies = int(os.environ.get("BENCH_WC_COPIES", "10"))
    wc_raw = (
        docs.crossJoin(spark.range(wc_copies).withColumnRenamed("id", "copy"))
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
    n = wc_raw.count()
    print(f"fixture: {n} docs, copies={wc_copies}, sf={SF_DIR}, "
          f"local[{CPUS}], runs={N_RUNS}")

    # ONE source of truth for the rung definitions (shared with bench.py's
    # BENCH_WC_STAGES arm — review finding r13)
    rungs = WC.BENCH_STAGE_LADDER

    def run(cfg_kw, robots):
        out = WC.curation_summary(
            WC.run_web_curation(
                wc_raw,
                WC.WebCurationConfig(**cfg_kw),
                url_col="url",
                robots_rules=wc_rules if robots else None,
            )
        )
        t0 = time.perf_counter()
        out.collect()
        return time.perf_counter() - t0

    results = {}
    for name, kw, robots in rungs:
        run(kw, robots)  # warm-up (JIT, codegen, page cache)
        best = min(run(kw, robots) for _ in range(N_RUNS))
        results[name] = best
        print(f"{name:<10} best-of-{N_RUNS}: {best:7.2f} s")

    print("\nstage deltas (cumulative ladder):")
    prev = None
    for name, _, _ in rungs:
        cur = results[name]
        d = "" if prev is None else f"  (+{cur - prev:5.2f} s)"
        print(f"  {name:<10} {cur:7.2f} s{d}")
        prev = cur


if __name__ == "__main__":
    main()
