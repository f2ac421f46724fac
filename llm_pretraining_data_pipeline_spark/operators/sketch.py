"""Count-min sketch: sublinear heavy-hitter counting for streaming-scale keys.

The Bloom filter (``operators/bloom.py``) answers "seen?"; the count-min
sketch (Cormode & Muthukrishnan 2005) answers "how many times?" in
``depth × width`` integer counters regardless of key cardinality — the
structure behind heavy-hitter monitors over corpus sources, domains, or
event streams when the exact key set would not fit in memory. Estimates
NEVER undercount (min over d independent rows, each an overcount from
collisions) — the one-sided-error twin of Bloom's no-false-negatives.

Same engine recipe as the Bloom filter:
  * counters live as a DataFrame of ``(row, bucket, cnt)`` — at most
    ``depth × width`` rows however many keys stream through;
  * ``cms_build`` is one map-side-combinable sum shuffle of d narrow rows
    per key occurrence;
  * ``cms_estimate`` is d BROADCAST joins with a map-side ``least()`` —
    the probed frame never shuffles;
  * the hash family is the portable md5 h64 (``position_j(key) =
    h64(key ‖ ':' ‖ j) mod width``), so a DuckDB referee replays the
    exact counter layout and the deterministic OVERESTIMATE SET — not
    just the error bound — is refereed (``a22_countmin_sketch``).

Sketches with equal (depth, width) merge by summing counters bucket-wise
— the same lossless-union property Bloom filters have under OR, which is
what makes both per-shard-buildable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions import hashing

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1 << 16


def _buckets(key: Column, depth: int, width: int) -> list[Column]:
    """The d refereed counter positions for one key (each in [0, width))."""
    return [
        hashing.h64(F.concat(key, F.lit(":"), F.lit(str(j)))) % F.lit(width)
        for j in range(depth)
    ]


def cms_build(
    df: DataFrame,
    key_col: str = "key",
    weight_col: str | None = None,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Aggregate key occurrences into ``(row, bucket, cnt)`` counters.

    One sum shuffle of d narrow rows per input row (map-side combine keeps
    the exchange at ``partitions × depth × width`` rows max). ``weight_col``
    counts each row by an integer weight instead of 1 (e.g. token counts).
    Error bound: est ≤ true + 2N/width with prob ≥ 1 − (1/2)^depth.
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("row"),
                    b.cast("long").alias("bucket"),
                )
                for j, b in enumerate(_buckets(F.col(key_col), depth, width))
            ]
        )
    ).alias("_rb")
    return (
        df.select(pairs, w.alias("_w"))
        .select("_rb.row", "_rb.bucket", "_w")
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    cms: DataFrame,
    key_col: str = "key",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
    out_col: str = "est_cnt",
) -> DataFrame:
    """Add ``out_col``: the sketch's count estimate for each row's key.

    d broadcast hash joins (one per sketch row) combined with a map-side
    ``least()`` — the probed frame itself is never shuffled or grouped, so
    the estimate composes into any scan chain. Missing buckets read as 0
    (a key never inserted estimates 0 only if ALL its d buckets are
    untouched). ``cms`` must come from ``cms_build`` with the SAME
    ``depth``/``width``.
    """
    out = df
    cnt_cols = []
    for j, b in enumerate(_buckets(F.col(key_col), depth, width)):
        side = F.broadcast(
            cms.where(F.col("row") == j).select(
                F.col("bucket").alias(f"_cb_{j}"), F.col("cnt").alias(f"_cc_{j}")
            )
        )
        out = out.join(side, b.cast("long") == F.col(f"_cb_{j}"), "left")
        cnt_cols.append(F.coalesce(F.col(f"_cc_{j}"), F.lit(0).cast("long")))
    est = F.least(*cnt_cols) if len(cnt_cols) > 1 else cnt_cols[0]
    out = out.withColumn(out_col, est)
    return out.drop(*[c for j in range(depth) for c in (f"_cb_{j}", f"_cc_{j}")])
