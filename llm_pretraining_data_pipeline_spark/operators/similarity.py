"""Similarity search over embedding columns (array<float>).

Extension surface (SURVEY.md §2.9): brute-force cosine top-k as the exact
baseline, plus a random-hyperplane LSH bucketing as the approximate scale
path. Dot products are pure ``zip_with``/``aggregate`` HOFs — JVM-side, no
UDF, no Python in the loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a constant query vector.

    Per-partition scan + global top-k via orderBy+limit (Spark plans this as
    TakeOrderedAndProject — partial top-k per partition, no full sort/shuffle
    of the corpus). Ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(_as_double(F.col(vec_col)), q).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
) -> DataFrame:
    """k nearest corpus rows for every query row (small query side broadcast)."""
    q = queries.select(
        F.col(query_id), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(F.col(corpus_id), _as_double(F.col(vec_col)).alias("_cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        query_id, corpus_id, cosine(F.col("_qv"), F.col("_cv")).alias("score")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "score", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bits of the vector against fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only the query's hyperplane bucket.

    At 100 TB the bucket column is computed once at ingest and the table is
    partitioned by it — the probe then reads a single partition (partition
    pruning) instead of scanning the corpus.
    """
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_planes, seed)
    qv = [float(x) for x in query_vec]
    q_bucket = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(qv, plane)) >= 0:
            q_bucket += 1 << i

    q = F.array(*[F.lit(x) for x in qv])
    bucketed = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_bucket", hyperplane_bucket(F.col("_v"), planes))
    return (
        bucketed.filter(F.col("_bucket") == q_bucket)
        .select(F.col(id_col), cosine(F.col("_v"), q).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
