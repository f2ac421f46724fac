#!/usr/bin/env python
"""Experiment: lazy single-pass MinHash LSH candidates vs the persisted design.

Variants:
  A current  — persist barriers + self-join (operators/dedup.py today)
  B lazy     — single-pass sig (aggregate+zip_with), explode-struct barrier,
               groupBy+collect_list pair generation; zero persists
  C nobarrier— B without the explode barrier (measures the inline penalty)

Checks pair-set equality A==B and times each in the same session (order
C, B, A so the persisted variant can't be advantaged by cache warmth).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions import hashing
from llm_pretraining_data_pipeline_spark.operators import dedup as dedup_ops
from llm_pretraining_data_pipeline_spark.session import get_spark

M = hashing.MERSENNE_31


def lazy_candidates(df, text_col, id_col="doc_id", shingle_size=3,
                    num_hashes=32, bands=8, seed=42, barrier=True):
    rows_per_band = num_hashes // bands
    a_list, b_list = hashing.minhash_coeffs(num_hashes, seed)
    a_arr = F.array(*[F.lit(int(x)).cast("long") for x in a_list])
    b_arr = F.array(*[F.lit(int(x)).cast("long") for x in b_list])

    hashed = F.transform(
        hashing.token_shingles(text_col, shingle_size), lambda s: hashing.h32(s)
    )
    # single pass over the hashed shingles: fold each hash into all 32 minima
    sig = F.aggregate(
        hashed,
        F.array_repeat(F.lit(M).cast("long"), num_hashes),
        lambda acc, hv: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (a * hv + b) % F.lit(M)),
            lambda x, y: F.least(x, y),
        ),
    )
    base = df.select(F.col(id_col).alias("_id"), sig.alias("_sig"),
                     F.size(hashed).alias("_n")).filter(F.col("_n") > 0)
    if barrier:
        # Generate-node barrier: explode of a 1-element array evaluates its
        # child once per row; downstream band lambdas reference the generator
        # output attribute and cannot inline the md5 pass.
        base = base.select(
            F.explode(F.array(F.struct(F.col("_id"), F.col("_sig")))).alias("_r")
        ).select("_r._id", "_r._sig")
    banded = base.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.concat_ws(
                        "-",
                        F.transform(
                            F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    ).alias("band_sig"),
                ),
            )
        ).alias("band"),
    ).select("_id", "band.band_id", "band.band_sig")

    grouped = (
        banded.groupBy("band_id", "band_sig")
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    combos = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def main():
    spark = get_spark(app_name="exp-minhash")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    print("docs:", docs.count())

    t0 = time.time()
    c_nobar = lazy_candidates(docs, "text", barrier=False).count()
    t_nobar = time.time() - t0

    t0 = time.time()
    c_lazy = lazy_candidates(docs, "text", barrier=True).count()
    t_lazy = time.time() - t0

    t0 = time.time()
    c_cur = dedup_ops.minhash_lsh_candidates(docs, "text", num_hashes=32, bands=8).count()
    t_cur = time.time() - t0

    print(f"nobarrier: {c_nobar} pairs in {t_nobar:.2f}s")
    print(f"lazy     : {c_lazy} pairs in {t_lazy:.2f}s")
    print(f"current  : {c_cur} pairs in {t_cur:.2f}s")

    a = lazy_candidates(docs, "text").select("id_a", "id_b")
    b_cur = dedup_ops.minhash_lsh_candidates(docs, "text", num_hashes=32, bands=8)
    diff = a.exceptAll(b_cur).count() + b_cur.exceptAll(a).count()
    print("pairset symmetric difference:", diff)

    # leftover cached blocks after the sweep?
    sc = spark.sparkContext
    print("persistent RDD count after run:", len(sc._jsc.getPersistentRDDs()))


if __name__ == "__main__":
    main()
