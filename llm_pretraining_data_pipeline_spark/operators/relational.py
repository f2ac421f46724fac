"""Relational operators Spark lacks natively.

As-of join: the public-pattern sort-merge formulation (union + window) — one
shuffle on the key, no pair fan-out, which is the 100 TB path. The naive
join+filter+max alternative explodes on hot keys; pandas ``merge_asof`` via
``applyInPandas`` is a third option when per-group data fits an Arrow batch
(see pyspark guide "As-of / range join").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (direction='backward'; 'forward' = earliest >=).

    Plan shape: union both sides (tagged), single window over
    (key, ts, side) with ``last(right_payload, ignorenulls=True)`` — the
    merge-asof scan, expressed as one Exchange + one Sort. Right payload
    columns come back with their original names.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    right_payload = [c for c in right.columns if c != right_on]
    l_tag = left.select(
        F.col(left_on).alias("_key"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_payload]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(right_on).alias("_key"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        # right rows sort before left at equal ts so <= matches inclusively
        w = (
            Window.partitionBy("_key")
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("_key")
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    out = filled.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
    )
    return out
