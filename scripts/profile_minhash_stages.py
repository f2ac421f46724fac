#!/usr/bin/env python
"""Stage-level decomposition of the minhash-family bench entries
(guide §1: measure first, isolate with the noop sink).

Builds the SAME 500k-doc fixture as bench.py's pipeline entries, eagerly
localCheckpoints the dedup universe (so the text chain is paid once,
untimed), then times each downstream stage in isolation:

  shingle_hash  token_shingles + h32 per shingle (array<long> out)
  sig_fold      full _minhash_sig_frame (hash + aggregate fold)
  banded        sig frame + band-key explode
  lsh_cand      minhash_lsh_candidates (adds groupBy+combos)
  verify        ngram_jaccard_pairs over the (checkpointed) candidates
  cc            connected_components over the (checkpointed) verified
  text_chain    the untimed universe build, recorded for context

Each stage runs REPEATS times (median + min recorded); every stage is
forced with the noop sink so Catalyst cannot prune the computation.
Prints one JSON line. Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python scripts/profile_minhash_stages.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from llm_pretraining_data_pipeline_spark import session  # noqa: E402
from llm_pretraining_data_pipeline_spark.functions import hashing  # noqa: E402
from llm_pretraining_data_pipeline_spark.operators import dedup as DD  # noqa: E402
from llm_pretraining_data_pipeline_spark.plans import pipeline as P  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
COPIES = int(os.environ.get("BENCH_PIPELINE_COPIES", "100"))
REPEATS = int(os.environ.get("PROFILE_REPEATS", "3"))


def main() -> int:
    spark = session.get_spark(
        app_name="profile_minhash_stages",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sc = spark.sparkContext

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).withColumnRenamed("id", "copy")
    raw = (
        docs.crossJoin(copies)
        .select(
            F.concat(
                F.lit("http://bench/"), F.col("doc_id"), F.lit("/"), F.col("copy")
            ).alias("url"),
            "text",
        )
        .repartition(CPUS)
    )

    timings: dict[str, dict] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name: str, fn, repeats: int = REPEATS):
        runs = []
        for _ in range(repeats):
            sc.setJobDescription(f"profile:{name}")
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        timings[name] = {
            "min": min(runs),
            "median": sorted(runs)[len(runs) // 2],
            "runs": runs,
        }

    # ---- untimed-by-stage context: the text chain that produces the
    # dedup universe (same as pipeline.minhash_near_dedup's input —
    # stages ingest..dedup with the bench entry's exact config)
    cfg = P.PipelineConfig(
        use_nfkc=True, apply_lang_filter=False, use_minhash_dedup=True,
        tokenizer_backend="regex",
    )
    staged = P.run_pipeline(raw, cfg, upto="dedup")
    t0 = time.time()
    universe = (
        staged.filter(F.col("drop_reason").isNull())
        .select("doc_id", "text_pii_masked")
        .localCheckpoint(eager=True)
    )
    timings["text_chain_to_universe"] = {"min": round(time.time() - t0, 3)}
    n_docs = universe.count()

    # ---- stage isolations from the checkpointed universe
    hashed_arr = F.transform(
        hashing.token_shingles("text_pii_masked", 3), lambda s: hashing.h32(s)
    )
    timed(
        "shingle_hash",
        lambda: noop(universe.select(F.col("doc_id"), hashed_arr.alias("h"))),
    )
    timed(
        "sig_fold",
        lambda: noop(
            DD._minhash_sig_frame(universe, "text_pii_masked", id_col="doc_id")
        ),
    )
    timed(
        "banded",
        lambda: noop(
            DD._minhash_banded_frame(universe, "text_pii_masked", id_col="doc_id")
        ),
    )
    timed(
        "lsh_cand",
        lambda: noop(
            DD.minhash_lsh_candidates(universe, "text_pii_masked", id_col="doc_id")
        ),
    )

    cand = DD.minhash_lsh_candidates(
        universe, "text_pii_masked", id_col="doc_id"
    ).localCheckpoint(eager=True)
    n_cand = cand.count()
    timed(
        "verify",
        lambda: noop(
            DD.ngram_jaccard_pairs(
                universe, "text_pii_masked", id_col="doc_id",
                threshold=0.8, candidates=cand,
            )
        ),
    )
    verified = DD.ngram_jaccard_pairs(
        universe, "text_pii_masked", id_col="doc_id",
        threshold=0.8, candidates=cand,
    ).localCheckpoint(eager=True)
    n_ver = verified.count()
    timed("cc", lambda: noop(DD.connected_components(verified)), repeats=2)

    print(json.dumps({
        "sf_dir": SF_DIR, "cpus": CPUS, "docs": n_docs,
        "candidates": n_cand, "verified_pairs": n_ver,
        "timings": timings,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
