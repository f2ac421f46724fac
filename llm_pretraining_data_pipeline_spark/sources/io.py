"""Sources & sinks (SURVEY.md §2.1 S1-S7).

Schema-explicit readers (no inference at scale) and the reference's sink
shapes: parquet checkpoints, projected JSONL exports, CSV reports.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llm_pretraining_data_pipeline_spark.schemas import RAW_DOCUMENT_SCHEMA

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]

# On-disk parquet size under which a table is safe to broadcast. Parquet is
# column-compressed, so 64 MiB on disk is roughly 200-500 MB in executor
# memory — comfortably under Spark's 8 GB broadcast hard cap but large enough
# that every dimension table at test SFs qualifies.
BROADCAST_LIMIT_BYTES = 64 << 20


def table_size_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of a testdata table (single parquet file or directory)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def maybe_broadcast(
    df: DataFrame, sf_dir: str, name: str, limit_bytes: int = BROADCAST_LIMIT_BYTES
) -> DataFrame:
    """Size-aware broadcast hint: hint only when the table's on-disk footprint
    is under ``limit_bytes``; above it, return the frame unhinted and let
    Catalyst/AQE pick the join strategy (AQE can still convert to broadcast at
    runtime when a filter shrinks the build side).

    An unconditional ``F.broadcast(orders)`` is correct at test SFs but would
    OOM the driver at 100 TB — the hint must be a function of size, not of the
    query shape (VERDICT r1 item 8).
    """
    if table_size_bytes(sf_dir, name) <= limit_bytes:
        return F.broadcast(df)
    return df


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S1: line-delimited JSON scan with a declared schema (never infer —
    the reference's pd.read_json inference is a scale liability)."""
    return spark.read.schema(schema or RAW_DOCUMENT_SCHEMA).json(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S3: stage checkpoint. Partitioned writes give downstream partition
    pruning on subset/mixture/shard columns."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, fields: list[str]) -> None:
    """S4: projected JSONL export with exact field order.

    ``to_json(struct(...))`` preserves the given field order per line, which
    matches the reference's json.dumps field ordering contract.
    """
    df.select(F.to_json(F.struct(*[F.col(f) for f in fields])).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def write_csv_report(df: DataFrame, path: str) -> None:
    """S5: small report CSV (single file, with header)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its ``ts`` column normalised to a microsecond
    TIMESTAMP regardless of the parquet physical type the generator used:

    * TIMESTAMP(NANOS) — Spark reads it as long via
      spark.sql.legacy.parquet.nanosAsLong; we truncate ns → µs exactly the
      way DuckDB does, keeping oracle comparisons exact.
    * TIMESTAMP(MICROS, adjusted=false) — surfaces as TIMESTAMP_NTZ, which
      watermarks/unix_micros reject; with the session TZ pinned to UTC a cast
      to TIMESTAMP preserves the instant bit-for-bit.
    * TIMESTAMP(MICROS, adjusted=true) — already the type we want.

    The confs are set here, defensively, because the session may be
    externally provided (driver contract) and built without them; both are
    runtime-settable in Spark 4.x. Without nanosAsLong a NANOS file fails the
    read with PARQUET_TYPE_ILLEGAL on INT64 (TIMESTAMP(NANOS,false)).
    """
    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:  # pragma: no cover - static conf in exotic deploys
            pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer division — double division loses precision above 2^53
        # (epoch-nanos are ~1.7e18) and would round the microsecond up
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # scan planned before the NTZ conf landed (e.g. cached relation)
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
