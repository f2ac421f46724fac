"""Skew & co-location utilities for the 100 TB path.

Three standard techniques, each with its trade-off documented:

  * AQE skew-join splitting — free, on by default (session.py); handles
    skewed SHUFFLE joins at runtime. First choice.
  * ``salted_join`` — explicit salting for when AQE can't help (e.g. the
    skewed side must also aggregate on the hot key, or the engine predates
    AQE): replicate the dim row R ways, scatter the fact's hot keys across
    R sub-keys.
  * bucketed tables (``write_bucketed``) — pre-shuffle once at write time so
    every later equi-join/agg on the bucket key runs exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side's hot keys scattered over salt buckets.

    fact rows get a random-but-deterministic salt (hash of a row-unique
    expression mod R); dim rows are replicated R times, one per salt value.
    Output equals ``fact.join(dim, key, how)`` row-for-row.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    salted_fact = fact.withColumn("_salt", salt.cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    salted_dim = dim.withColumn("_salt", salts)
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) table: later joins and
    aggregations on ``bucket_key`` between co-bucketed tables need no
    Exchange (verified by tests/test_scale_paths.py)."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)
