"""SparkSession factory with scale-minded defaults.

The knobs here are the ones that matter both on ``local[32]`` (the test rig)
and on a real multi-executor cluster:

  * AQE on (runtime coalescing, skew-join splitting) — the dedup hash groups
    are skew-prone because all-null/empty documents canonicalise to one key
    (reference: duplication.py:39-40 maps null -> "").
  * ``spark.sql.shuffle.partitions`` sized to the parallelism of the rig, not
    the 200 default; AQE coalesces further at runtime.
  * Arrow enabled for every pandas-UDF exchange.
  * Session timezone pinned to UTC so timestamp semantics match the DuckDB
    oracle (DuckDB timestamps are UTC-naive).
  * ``nanosAsLong`` because the test ``events`` table carries parquet
    TIMESTAMP(NANOS) which Spark does not read natively; sources/events.py
    converts to microsecond timestamps (DuckDB-equivalent truncation).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "llm-pretraining-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Any already-active session is reused but patched with the runtime-settable
    configs (shuffle partitions, AQE, arrow) so the engine behaves consistently
    when the driver hands us its own session.
    """
    cpus = default_parallelism()
    parts = shuffle_partitions or cpus

    active = SparkSession.getActiveSession()
    if active is not None:
        _apply_runtime_conf(active, parts)
        return active

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE rewrites sort-merge joins to shuffled-hash at runtime when
        # EVERY post-shuffle partition of the build side is under this
        # threshold (guide §3.1) — skipping the sort where a per-partition
        # hash table provably fits. Landed round 16 after a quiet-machine
        # alternating fresh-JVM A/B (the r15 attempts were inconclusive on
        # noisy VMs): near_index_e2e 25.0/26.4/24.5 s vs default
        # 25.7/26.6/25.6, pipeline_minhash_e2e 49.4/50.3 vs 50.3/52.5 —
        # 5/5 paired rounds faster, ~2-4%. Scale-adaptive by construction:
        # a partition-size condition, not a plan hint — at 100 TB the
        # post-shuffle partitions exceed it and sort-merge engages as
        # before; outputs are join-strategy-independent (oracle-refereed).
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(128 * 1024 * 1024),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _apply_runtime_conf(spark: SparkSession, shuffle_partitions: int) -> None:
    runtime = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # the events testdata table is parquet TIMESTAMP(NANOS); without this
        # an externally-built session fails the read with PARQUET_TYPE_ILLEGAL
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # ...and some generations write it as TIMESTAMP(MICROS, adjusted=false),
        # which Spark would surface as TIMESTAMP_NTZ — a type watermarks and
        # unix_micros reject. With the session TZ pinned to UTC the instants
        # are identical either way, so read NTZ columns as plain TIMESTAMP.
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    }
    for k, v in runtime.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - config may be static in some deploys
            pass
    try:
        current = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        if current > 4 * shuffle_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    except Exception:  # pragma: no cover
        pass
