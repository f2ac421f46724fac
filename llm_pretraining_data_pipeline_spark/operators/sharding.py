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


def assign_shards_sized(
    df: DataFrame,
    target_bytes: int,
    size_col: str = "n_bytes",
    id_col: str = "doc_id",
    nlanes: int = 32,
    checkpoint: bool = False,
) -> DataFrame:
    """Byte-balanced sharding: documents are laid end-to-end in the
    deterministic order ``(lane, id)`` with ``lane = h64(id) % nlanes``
    and cut every ``target_bytes`` — ``shard_id = floor(cum_before /
    target_bytes)``. The export-side SLA is shard BYTES, not doc count
    (object-store part sizing, loader memory): count-based shards skew
    badly when document sizes are heavy-tailed, which pretraining
    corpora always are.

    Same two-phase cumsum as ``pack_sequences`` (corpus.py): a window
    cumsum inside each hash lane (parallel) plus per-lane prefix
    offsets (``nlanes`` rows through the driver, broadcast back) —
    never a global ORDER BY window. Bit-equal to the single-window
    form since byte counts are integers. A document larger than
    ``target_bytes`` still lands in exactly one shard (shards are
    cut by cumulative START position; oversize docs overflow their
    shard rather than split — splitting is ``pack_sequences``' job).
    Adds ``shard_id``; null sizes count as 0.

    Two-phase caveat (ADVICE r12, shared with ``budget_select``): the
    per-lane totals ``collect()`` and the returned plan each evaluate
    ``df``'s lineage once — ``size_col``/``id_col`` must be
    deterministic or the offsets from the first pass can disagree with
    the rows of the second; pass ``checkpoint=True`` to lazily
    localCheckpoint the input and pin both phases to one
    materialization (opt-in: localCheckpoint truncates lineage).
    """
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    if checkpoint:
        df = df.localCheckpoint(eager=False)
    from llm_pretraining_data_pipeline_spark.functions.hashing import h64

    spark = df.sparkSession
    lane = (h64(F.col(id_col)) % nlanes).cast("int")
    sz = F.coalesce(F.col(size_col), F.lit(0)).cast("long")
    base = df.withColumn("_lane", lane).withColumn("_sz", sz)
    # ROWS frame, not the default RANGE: RANGE includes all order-by
    # PEERS, so duplicate id values would each absorb their peers'
    # bytes into _cum and overshoot their shard (review finding);
    # bit-identical for unique ids. The _sz tiebreak makes duplicate
    # ids deterministic too (equal keys would otherwise cumsum in
    # arbitrary physical order — second review pass)
    w = (
        Window.partitionBy("_lane")
        .orderBy(id_col, "_sz")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = base.withColumn("_cum", F.sum("_sz").over(w))

    totals = {
        r["_lane"]: int(r["tot"] or 0)
        for r in base.groupBy("_lane").agg(F.sum("_sz").alias("tot")).collect()
    }
    offsets, acc = [], 0
    for s in range(nlanes):
        offsets.append((s, acc))
        acc += totals.get(s, 0)
    off = F.broadcast(
        spark.createDataFrame(offsets, "_lane int, _off long")
    )
    return (
        within.join(off, "_lane")
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("_off") + F.col("_cum") - F.col("_sz"))
                / target_bytes
            ).cast("int"),
        )
        .drop("_lane", "_sz", "_cum", "_off")
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
