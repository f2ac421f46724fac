"""Distributed Bloom filter: compact set membership for incremental dedup.

The Dolma pipeline deduplicates incoming web snapshots against the already-
ingested corpus with a Bloom filter (Soldaini et al. 2024 §3.2 — their
``deduper`` tool); CCNet keeps per-snapshot hash sets for the same job. At
100 TB the exact historical key set is terabytes, but a Bloom filter with
~1% false-positive rate is ~1.2 GB per 10^9 keys — broadcastable state that
turns "seen before?" into a map-side test with NO shuffle of the incoming
corpus.

Representation: the m-bit array lives as a DataFrame of 32-bit lanes
``(bucket = bit_pos // 32, mask = bit_or of 1 << (bit_pos % 32))`` —
``m/32`` rows regardless of corpus size. 32-bit lanes (not 64) keep every
mask value positive and < 2^32, so ANSI-mode bigint arithmetic can never
overflow and the DuckDB referee computes bit-identical masks (same
constraint as the aHash hi/lo split in ``multimodal/media.py``).

Hash family: position_j(key) = h64(key ‖ ':' ‖ j) mod m — the engine's
portable md5-based integer hash (``functions/hashing.h64``), so the oracle
replays the exact bit positions and the false-positive SET (not just the
rate) is deterministic and refereed.

Scale shape:
  * ``bloom_build`` — one map-side-combinable ``bit_or`` shuffle of k narrow
    (bucket, lane-mask) rows per key, output m/32 rows. For union-able
    incremental state, build per-snapshot filters and ``bit_or`` them again:
    Bloom filters merge losslessly under OR.
  * ``bloom_probe`` — k BROADCAST hash joins (one per hash index) ANDed
    map-side: zero exchanges of the probed corpus, no groupBy. The probe
    side never shuffles — the plan test pins it.

A Bloom "hit" means MAYBE-seen: callers route hits to an exact verify (the
engine's exact_dedup) and pass misses straight through — the miss path is
the guaranteed-new fast path that skips the expensive stage entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions import hashing

DEFAULT_M_BITS = 1 << 24  # 16 Mbit = 512k lanes ≈ 8 MB broadcast
DEFAULT_K = 4


def _bit_positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """The k refereed bit positions for one key (each in [0, m_bits))."""
    return [
        hashing.h64(F.concat(key, F.lit(":"), F.lit(str(j)))) % F.lit(m_bits)
        for j in range(k)
    ]


def _lane_bit(pos: Column) -> Column:
    """1 << (pos % 32) as a positive bigint, via a 32-literal lookup —
    ``F.shiftleft`` takes only a Python-int shift, and a lookup keeps the
    whole expression JVM-side/codegen-able."""
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(32)])
    return F.element_at(powers, (pos % 32).cast("int") + 1)


def bloom_build(
    df: DataFrame,
    key_col: str = "key",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Aggregate ``df[key_col]`` into Bloom lanes ``(bucket, mask)``.

    One ``bit_or`` shuffle of k narrow rows per key; map-side combine makes
    per-partition pre-ORed lanes, so the exchange carries at most
    ``partitions × m/32`` rows however large the key set is. Size ``m_bits``
    to the historical key count: FP rate ≈ (1 - e^(-k·n/m))^k.
    """
    pos = F.explode(
        F.array(*[p.cast("long") for p in _bit_positions(F.col(key_col), k, m_bits)])
    ).alias("_pos")
    lanes = df.select(pos).select(
        F.shiftright(F.col("_pos"), 5).alias("bucket"),
        _lane_bit(F.col("_pos")).alias("_bit"),
    )
    return lanes.groupBy("bucket").agg(F.bit_or("_bit").alias("mask"))


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Add ``out_col``: true iff every one of the key's k bits is set.

    k broadcast hash joins ANDed together — the probed frame itself is never
    shuffled and never grouped, so this composes into any scan→filter chain
    as a map-side stage. ``bloom`` must come from ``bloom_build`` with the
    SAME ``m_bits``/``k``.
    """
    positions = _bit_positions(F.col(key_col), k, m_bits)
    out = df
    hit_cols = []
    for j, p in enumerate(positions):
        b = F.broadcast(
            bloom.select(
                F.col("bucket").alias(f"_bb_{j}"), F.col("mask").alias(f"_bm_{j}")
            )
        )
        out = out.join(
            b, F.shiftright(p.cast("long"), 5) == F.col(f"_bb_{j}"), "left"
        )
        hit = (
            F.col(f"_bm_{j}").isNotNull()
            & (F.col(f"_bm_{j}").bitwiseAND(_lane_bit(p)) != 0)
        )
        hit_cols.append(hit)
    member = hit_cols[0]
    for h in hit_cols[1:]:
        member = member & h
    out = out.withColumn(out_col, member)
    return out.drop(*[c for j in range(k) for c in (f"_bb_{j}", f"_bm_{j}")])
