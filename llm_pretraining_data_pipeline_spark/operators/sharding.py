"""Sharding & sampling (SURVEY.md §2.6 O2/O3, reference sharding.py).

The reference slices the corpus into fixed 50k-doc shards by position
(sharding.py:104-148) and draws a 1000-doc seeded toy sample (:181-202).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame,
    docs_per_shard: int = 50_000,
    order_col: str | None = None,
) -> DataFrame:
    """Add ``shard_id`` = floor(position / docs_per_shard) in a deterministic
    global order.

    The global row_number is a single-partition window — fine to ~10M rows.
    At 100 TB use ``shard_id = pmod(hash(id), num_shards)`` (hash sharding,
    fully parallel; shard sizes are then statistically, not exactly, equal) or
    ``df.repartitionByRange`` on the order column; exact positional sharding
    inherently serialises on a total order.
    """
    order_col = order_col or ("row_order" if "row_order" in df.columns else df.columns[0])
    w = Window.orderBy(F.col(order_col))
    return df.withColumn(
        "shard_id",
        F.floor((F.row_number().over(w) - 1) / F.lit(docs_per_shard)).cast("int"),
    )


def assign_shards_hashed(df: DataFrame, num_shards: int, id_col: str = "doc_id") -> DataFrame:
    """Scale path: shard by stable hash — no global sort, no skew, writes
    parallelise with ``partitionBy('shard_id')``."""
    return df.withColumn(
        "shard_id", F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(num_shards)).cast("int")
    )


def shard_manifest(df: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """Per-shard num_docs/total_tokens + ordering (reference sharding.py:150-171)."""
    return (
        df.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("num_docs"),
            F.sum(F.col(token_col)).alias("total_tokens"),
        )
        .orderBy("shard_id")
    )


def toy_sample(df: DataFrame, n: int = 1000, id_col: str = "doc_id") -> DataFrame:
    """Deterministic pseudo-random n-doc sample.

    The reference uses pandas sample(random_state=42); a distributed engine
    gets determinism from content, not RNG state: order by md5(id) and take n.
    """
    return (
        df.withColumn("_rk", F.md5(F.col(id_col).cast("string")))
        .orderBy("_rk")
        .limit(n)
        .drop("_rk")
    )
