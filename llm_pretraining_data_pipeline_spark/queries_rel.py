"""Relational / window / events / embeddings query surface (SURVEY.md §2.9).

Registered into the same ``QUERIES`` dict as the document-pipeline operators;
this module holds the star-schema extension surface: joins (inner/semi/anti/
outer/asof), window functions, grouping sets/rollup/cube/pivot, time windows
over ``events`` (batch + Structured Streaming), and embedding similarity.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark import oracle_fragments as O
from llm_pretraining_data_pipeline_spark.operators import dedup as dedup_ops
from llm_pretraining_data_pipeline_spark.operators import similarity
from llm_pretraining_data_pipeline_spark.queries import _docs, _t, register
from llm_pretraining_data_pipeline_spark.sources import io as src

# ================================================================ TPC-H-ish


@register(
    "rel_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           cast(count(*) as bigint) AS count_order
    FROM lineitem
    WHERE l_shipdate <= timestamp '2001-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan + filter + 8-agg groupBy (public TPC-H spec)",
)
def rel_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "rel_q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < timestamp '1999-01-01 00:00:00'
      AND l.l_shipdate > timestamp '1999-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + agg + top-N; the customer dim is "
        "broadcast (see .explain)",
)
def rel_q3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .join(src.maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "rel_q5_local_supplier",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way snowflake join with co-located nation condition",
)
def rel_q5(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .join(src.maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(
            src.maybe_broadcast(s, sf_dir, "supplier"),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(src.maybe_broadcast(n, sf_dir, "nation"), s.s_nationkey == n.n_nationkey)
        .join(src.maybe_broadcast(r, sf_dir, "region"), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "rel_semi_join",
    """
    SELECT o_orderstatus, cast(count(*) as bigint) AS cnt
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderstatus
    """,
    doc="left-semi join (EXISTS)",
)
def rel_semi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "rel_anti_join",
    """
    SELECT c_mktsegment, cast(count(*) as bigint) AS cnt
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="left-anti join (NOT EXISTS)",
)
def rel_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "rel_outer_join",
    """
    SELECT n.n_name, cast(count(c.c_custkey) as bigint) AS n_customers,
           round(coalesce(sum(c.c_acctbal), 0), 2) AS total_acctbal
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="left-outer join preserving empty nations",
)
def rel_outer_join(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0)), 2).alias("total_acctbal"),
        )
    )


@register(
    "rel_rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           cast(count(*) as bigint) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    doc="rollup over two dims (super-aggregate rows null-filled identically)",
)
def rel_rollup_orders(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "rel_cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           cast(count(*) as bigint) AS cnt,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="cube over two dims",
)
def rel_cube_lineitem(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@register(
    "rel_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, cast(count(*) as bigint) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="explicit grouping sets",
)
def rel_grouping_sets(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, cast(count(*) as bigint) AS cnt
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "rel_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="pivot with explicit value list (Spark .pivot ≡ CASE sums)",
)
def rel_pivot(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@register(
    "rel_distinct_counts",
    """
    SELECT l_returnflag,
           cast(count(DISTINCT l_partkey) as bigint) AS n_parts,
           cast(count(DISTINCT l_suppkey) as bigint) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="multi distinct-aggregate (exact; approx_count_distinct is bench-only "
        "since HLL implementations differ across engines)",
)
def rel_distinct_counts(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


# ================================================================= windows


@register(
    "win_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             cast(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) as int) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    doc="top-K per group via row_number window",
)
def win_top3_orders(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_running_quantity",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty
    FROM lineitem WHERE l_suppkey < 10
    """,
    doc="running sum window with fully-determined frame order",
)
def win_running_quantity(spark, sf_dir):
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") < 10)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 4).alias("running_qty"),
        )
    )


@register(
    "win_lag_price_delta",
    """
    SELECT o_custkey, o_orderkey,
           round(o_totalprice - lag(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
    FROM orders
    """,
    doc="lag window (price delta between a customer's consecutive orders)",
)
def win_lag_price_delta(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta"),
    )


# ================================================================== events


@register(
    "ev_tumbling_5min",
    """
    SELECT cast(time_bucket(INTERVAL '5 minutes', ts) as timestamp) AS window_start, event_type,
           cast(count(*) as bigint) AS cnt,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 5-minute window aggregation (batch form; streaming twin "
        "below shares this oracle)",
)
def ev_tumbling_5min(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
    )


@register(
    "ev_hourly_rollup",
    """
    SELECT cast(date_trunc('hour', ts) as timestamp) AS hour, event_type,
           cast(count(*) as bigint) AS cnt,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY ROLLUP(date_trunc('hour', ts), event_type)
    """,
    doc="hypertable-style hourly rollup with super-aggregates",
)
def ev_hourly_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("hour", F.date_trunc("hour", F.col("ts")))
    return ev.rollup("hour", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "ev_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), m AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM o
    ), s AS (
      SELECT *, cast(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
      FROM m
    )
    SELECT user_id, session_id,
           cast(min(ts) as timestamp) AS session_start, cast(max(ts) as timestamp) AS session_end,
           cast(count(*) as bigint) AS n_events,
           round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30-min gap) via lag + running sum "
        "(the batch twin of streaming session_window)",
)
def ev_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w_order).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
            > 1_800_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("brk", brk)
        .withColumn("session_id", F.sum("brk").over(w_run).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "ev_stream_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), m AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS brk
      FROM o
    ), s AS (
      SELECT *, cast(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS session_id
      FROM m
    ), sess AS (
      SELECT user_id, session_id,
             min(ts) AS session_start, max(ts) AS session_end,
             cast(count(*) as bigint) AS n_events
      FROM s GROUP BY user_id, session_id
    ), mx AS (SELECT max(ts) AS max_ts FROM events),
    last AS (SELECT user_id, max(session_id) AS last_sid FROM sess GROUP BY user_id)
    SELECT sess.user_id,
           cast(session_start as timestamp) AS session_start,
           cast(session_end as timestamp) AS session_end,
           n_events
    FROM sess JOIN last USING (user_id), mx
    WHERE sess.session_id <> last.last_sid
       OR epoch_us(sess.session_end) < epoch_us(mx.max_ts) - 3600000000
    """,
    doc="custom stateful streaming sessionizer (applyInPandasWithState, "
        "event-time timeout) run as a bounded drain, refereed by batch SQL "
        "implementing its exact emission contract: sessions closed by a gap, "
        "plus final sessions old enough that the closing watermark "
        "(max_ts - 30min) passed their last event + 30min gap. The one "
        "stateful-operator shape session_window cannot express",
)
def ev_stream_sessionize(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming import events as evs

    return evs.run_stateful_session_stream_once(spark, sf_dir)


@register(
    "ev_asof_last_click",
    """
    SELECT p.event_id, p.user_id, cast(max(c.ts) as timestamp) AS last_click_ts
    FROM events p JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
    doc="as-of join: most recent prior click for each purchase (Spark lacks a "
        "native as-of; this is the join+max formulation — see "
        "operators/relational.py for the sort-merge scale path)",
)
def ev_asof_last_click(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return asof_join(
        purchases, clicks,
        left_on="user_id", right_on="c_user",
        left_ts="ts", right_ts="c_ts",
    ).select("event_id", "user_id", F.col("c_ts").alias("last_click_ts")).filter(
        F.col("last_click_ts").isNotNull()
    )


@register(
    "ev_user_stats",
    """
    SELECT user_id, cast(count(*) as bigint) AS n_events,
           cast(count(DISTINCT event_type) as bigint) AS n_types,
           cast(min(ts) as timestamp) AS first_ts, cast(max(ts) as timestamp) AS last_ts,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="per-entity profile aggregation",
)
def ev_user_stats(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "ev_stream_tumbling",
    """
    SELECT cast(time_bucket(INTERVAL '5 minutes', ts) as timestamp) AS window_start,
           cast(count(*) as bigint) AS cnt
    FROM events GROUP BY 1
    """,
    doc="the SAME tumbling aggregation executed as a Structured Streaming "
        "query (readStream over the parquet, watermark, memory sink) — "
        "batch oracle applies because processAllAvailable drains everything",
)
def ev_stream_tumbling(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming.events import (
        run_tumbling_stream_once,
    )

    return run_tumbling_stream_once(spark, sf_dir)


@register(
    "ev_stream_dedup",
    """
    SELECT event_type, cast(count(DISTINCT event_id) as bigint) AS cnt
    FROM events GROUP BY event_type
    """,
    doc="streaming exact dedup (dropDuplicatesWithinWatermark on event_id — "
        "state bounded by the watermark, the only formulation that survives "
        "an unbounded feed): every event is delivered 3x (at-least-once "
        "simulation), survivors counted per type; oracle = distinct ids per "
        "type on the batch table",
)
def ev_stream_dedup(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming.events import (
        run_dedup_stream_once,
    )

    return run_dedup_stream_once(spark, sf_dir, copies=3)


# ============================================================== embeddings


@register(
    "emb_cosine_topk",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, round({O.cosine_double('e.embedding', 'q.qv')}, 6) AS score
    FROM embeddings e, q
    ORDER BY {O.cosine_double('e.embedding', 'q.qv')} DESC, e.vec_id
    LIMIT 10
    """,
    doc="exact cosine top-k (brute force; Spark plans TakeOrderedAndProject — "
        "per-partition partial top-k, no global sort)",
)
def emb_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("ev")
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        "vec_id", similarity.cosine(F.col("ev"), F.col("qv")).alias("raw_score")
    )
    return (
        scored.orderBy(F.desc("raw_score"), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round("raw_score", 6).alias("score"))
    )


@register(
    "emb_knn_join",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id, {O.cosine_double('e.embedding', 'q.qv')} AS raw_score
      FROM embeddings e, q
    ), ranked AS (
      SELECT query_id, vec_id, raw_score,
             cast(row_number() OVER (PARTITION BY query_id
                  ORDER BY raw_score DESC, vec_id) as int) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, round(raw_score, 6) AS score, rank
    FROM ranked WHERE rank <= 4
    """,
    doc="kNN join: per-query top-4 neighbors via broadcast + window",
)
def emb_knn_join(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.knn_join(queries, emb, k=4)
    return out.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), F.col("rank").cast("int")
    )


@register(
    "emb_near_dup_pairs",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({O.cosine_double('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {O.cosine_double('a.embedding', 'b.embedding')} >= 0.45
    """,
    doc="embedding-cosine near-duplicate pairs (threshold 0.45 — random "
        "64-dim vectors concentrate near 0, so 0.45 yields a small non-empty "
        "pair set at every sf; production near-dup uses ~0.95)",
)
def emb_near_dup_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    out = dedup_ops.embedding_near_dup_pairs(emb, threshold=0.45)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@register(
    "emb_decontaminate",
    f"""
    WITH ev AS (SELECT vec_id AS eval_id, embedding AS qv
                FROM embeddings WHERE vec_id % 20 = 0),
    c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 20 <> 0),
    scored AS (
      SELECT c.vec_id, ev.eval_id,
             {O.cosine_double('c.embedding', 'ev.qv')} AS raw
      FROM c, ev
    )
    SELECT vec_id, eval_id, round(raw, 6) AS max_eval_cos,
           raw >= 0.45 AS contaminated
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY raw DESC, eval_id) = 1
    """,
    doc="embedding-space test-set decontamination (the semantic sibling of "
        "corp_decontaminate's n-gram overlap, phi/DataComp practice): a "
        "deterministic 5% slice (vec_id%20=0) plays the benchmark/eval "
        "set; every remaining corpus vector reports its nearest eval "
        "vector, the max cosine, and a contaminated flag at tau=0.45 "
        "(random 64-dim fixture vectors top out ~0.51). Scale shape: the "
        "eval side is BROADCAST — benchmark sets stay small by nature — "
        "and the per-vector max is a map-side-combinable max(struct) "
        "aggregation, no window, one shuffle on vec_id; at bigger eval "
        "sets the brute broadcast swaps for the IVF candidate path "
        "(emb_ivf_topk) with the same output contract. Ties break to the "
        "smallest eval_id on both engines",
)
def emb_decontaminate(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    to_double = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    ev = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("eval_id"), to_double("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") % 20 != 0).select(
        "vec_id", to_double("embedding").alias("cv")
    )
    scored = corpus.crossJoin(F.broadcast(ev)).select(
        "vec_id",
        "eval_id",
        similarity.cosine(F.col("cv"), F.col("qv")).alias("raw"),
    )
    best = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("raw").alias("s"), (-F.col("eval_id")).alias("nid")
                )
            ).alias("b")
        )
        .select(
            "vec_id",
            (-F.col("b.nid")).alias("eval_id"),
            F.round(F.col("b.s"), 6).alias("max_eval_cos"),
            (F.col("b.s") >= 0.45).alias("contaminated"),
        )
    )
    return best


# Hyperplanes for the LSH variant are FIXED at registration time (dim=64,
# seed=7) so the oracle can receive the identical constants as SQL literals —
# the same trick the minhash banding oracles use with their hash coefficients.
_NDL_PLANES = similarity.random_hyperplanes(64, n_planes=4, seed=7)


def _duck_plane_dot(plane: list[float]) -> str:
    lit = "[" + ",".join(repr(float(x)) for x in plane) + "]"
    return (
        f"list_sum(list_transform(range(1, 65), "
        f"j -> cast(embedding[j] as double) * ({lit})[j]))"
    )


_NDL_BUCKET = " + ".join(
    f"(CASE WHEN {_duck_plane_dot(p)} >= 0 THEN {1 << i} ELSE 0 END)"
    for i, p in enumerate(_NDL_PLANES)
)


@register(
    "emb_near_dup_lsh",
    f"""
    WITH v AS (
      SELECT vec_id, embedding, {_NDL_BUCKET} AS bucket FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({O.cosine_double('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {O.cosine_double('a.embedding', 'b.embedding')} >= 0.45
    """,
    doc="hyperplane-LSH-bucketed embedding near-dup pairs — the scale path: "
        "candidates restricted to one bucket (equi-join on the 4-bit sign "
        "bucket, ~2^4 candidate reduction), exact cosine verify inside. The "
        "brute-force twin (emb_near_dup_pairs) is the recall baseline.",
)
def emb_near_dup_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    out = dedup_ops.embedding_near_dup_pairs(
        emb, threshold=0.45, lsh_planes=4, lsh_seed=7, dim=64
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


# OR-amplified variant: 8 independent 2-plane bucketings (seed 7, the first
# 16 planes of the same stream). A pair is a candidate if it collides in ANY
# band — miss probability (1 - (1-θ/π)^2)^8, ≈0.01 at cosine 0.45 where the
# single 4-plane AND bucket misses ~82% of true pairs.
_ORB_PLANES = similarity.random_hyperplanes(64, n_planes=16, seed=7)
_ORB_BANDS = [
    " + ".join(
        f"(CASE WHEN {_duck_plane_dot(p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_ORB_PLANES[b * 2:(b + 1) * 2])
    )
    for b in range(8)
]
_ORB_V = "SELECT vec_id, embedding, " + ", ".join(
    f"{expr} AS bb{b}" for b, expr in enumerate(_ORB_BANDS)
) + " FROM embeddings"
_ORB_ANY = " OR ".join(f"a.bb{b} = b.bb{b}" for b in range(8))


@register(
    "emb_near_dup_lsh_or",
    f"""
    WITH v AS ({_ORB_V})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({O.cosine_double('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM v a JOIN v b ON a.vec_id < b.vec_id AND ({_ORB_ANY})
    WHERE {O.cosine_double('a.embedding', 'b.embedding')} >= 0.45
    """,
    doc="OR-amplified hyperplane LSH near-dup pairs: 8 bands x 2 planes, "
        "candidate = same bucket in ANY band. The engine fans out only the "
        "narrow (id, band, bucket) rows and joins vectors back once per side "
        "after the distinct candidate set; the referee receives the 16 plane "
        "vectors as SQL literals (the emb_lsh_bucket_sizes trick)",
)
def emb_near_dup_lsh_or(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    out = dedup_ops.embedding_near_dup_pairs(
        emb, threshold=0.45, lsh_planes=2, lsh_seed=7, dim=64, lsh_bands=8
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


@register(
    "emb_lsh_or_recall",
    f"""
    WITH v AS ({_ORB_V}),
    brute AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {O.cosine_double('a.embedding', 'b.embedding')} >= 0.45
    ),
    lsh AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.vec_id < b.vec_id AND ({_ORB_ANY})
      WHERE {O.cosine_double('a.embedding', 'b.embedding')} >= 0.45
    )
    SELECT cast((SELECT count(*) FROM brute) as bigint) AS n_true,
           cast((SELECT count(*) FROM lsh) as bigint) AS n_found,
           round(cast((SELECT count(*) FROM lsh) as double)
                 / cast((SELECT count(*) FROM brute) as double), 6) AS recall
    """,
    doc="recall audit for the OR-amplified LSH near-dup path vs the exact "
        "brute-force pair set (every LSH pair is verified by exact cosine, "
        "so lsh ⊆ brute and the count ratio IS recall@threshold)",
)
def emb_lsh_or_recall(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    brute = dedup_ops.embedding_near_dup_pairs(emb, threshold=0.45)
    lsh = dedup_ops.embedding_near_dup_pairs(
        emb, threshold=0.45, lsh_planes=2, lsh_seed=7, dim=64, lsh_bands=8
    )
    return (
        brute.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
        .crossJoin(lsh.agg(F.count(F.lit(1)).cast("long").alias("n_found")))
        .select(
            "n_true",
            "n_found",
            F.round(F.col("n_found") / F.col("n_true"), 6).alias("recall"),
        )
    )


@register(
    "emb_label_stats",
    """
    SELECT label, cast(count(*) as bigint) AS cnt,
           round(sum(sqrt(list_sum(list_transform(embedding,
                 x -> cast(x as double) * cast(x as double))))), 4) AS total_norm
    FROM embeddings GROUP BY label
    """,
    doc="per-label aggregate over vector norms (array HOFs inside an agg)",
)
def emb_label_stats(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(similarity.norm(vec)), 4).alias("total_norm"),
    )


def _lsh_bucket_oracle() -> str:
    """Twin of hyperplane_bucket with the plane constants BAKED IN as
    literals: the planes are a deterministic function of (dim=64, n=6,
    seed=7), so the referee needs no numpy — it just evaluates the same 384
    doubles. The testdata embedding dim is fixed at 64 across SFs."""
    planes = similarity.random_hyperplanes(64, n_planes=6, seed=7)
    ev = "list_transform(embedding, x -> cast(x as double))"
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ",".join(repr(float(x)) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({ev}, {lit}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
    SELECT cast({bucket} as bigint) AS bucket, cast(count(*) as bigint) AS cnt
    FROM embeddings GROUP BY 1
    """


@register(
    "emb_lsh_bucket_sizes",
    _lsh_bucket_oracle(),
    doc="random-hyperplane LSH bucket histogram (the ANN scale path: bucket "
        "once at ingest, partition by bucket, prune at query time); oracle "
        "re-derives every bucket from the plane constants baked into the SQL",
)
def emb_lsh_bucket_sizes(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first().embedding)
    planes = similarity.random_hyperplanes(dim, n_planes=6, seed=7)
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return (
        emb.select(similarity.hyperplane_bucket(vec, planes).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "rel_q12_shipmode_case",
    """
    SELECT l_returnflag,
           cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) as bigint) AS high_line_count,
           cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) as bigint) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= timestamp '2000-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: conditional-sum aggregation over a join",
)
def rel_q12_shipmode_case(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "rel_q14_promo_ratio",
    """
    SELECT round(100.00 * sum(CASE WHEN p.p_type = 'PROMO'
                                   THEN l.l_extendedprice * (1 - l.l_discount)
                                   ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= timestamp '2000-01-01 00:00:00'
      AND l.l_shipdate <  timestamp '2000-07-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional-revenue ratio (division of two sums)",
)
def rel_q14_promo_ratio(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-07-01 00:00:00").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(src.maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "rel_q19_disjunctive",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           cast(count(*) as bigint) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_size >= 40 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-branch predicates across joined "
        "tables (tests OR-predicate planning)",
)
def rel_q19_disjunctive(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(src.maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 30))
        | ((F.col("p_size") >= 40) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "win_range_frame",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           cast(count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) as bigint) AS n_similar
    FROM orders WHERE o_custkey < 100
    """,
    doc="RANGE window frame: peers within ±1000 of each order's total",
)
def win_range_frame(spark, sf_dir):
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.count(F.lit(1)).over(w).alias("n_similar"),
        )
    )


@register(
    "win_value_family",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           lead(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="first/last/nth_value + lead on one window (frame semantics parity)",
)
def win_value_family(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "p26_array_ops",
    f"""
    WITH t AS (SELECT doc_id, {O.toks('text')} AS tk FROM documents)
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_distinct(list_slice(tk, 1, 8))), '|'), '') AS sorted_head,
           coalesce(array_to_string(list_filter(tk, x -> length(x) > 5), '|'), '') AS long_tokens,
           cast(len(list_distinct(tk)) as bigint) AS n_distinct,
           coalesce(array_to_string(list_reverse(list_slice(tk, 1, 4)), '|'), '') AS rev_head
    FROM t
    """,
    doc="array-function surface: slice/sort/distinct/filter/reverse with "
        "canonical string rendering (DuckDB array_to_string([]) is NULL, "
        "Spark array_join([]) is '' — oracle coalesces)",
)
def p26_array_ops(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions.text_norm import ws_tokens

    d = _docs(spark, sf_dir)
    tk = ws_tokens("text")
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(F.slice(tk, 1, 8))), "|").alias(
            "sorted_head"
        ),
        F.array_join(F.filter(tk, lambda x: F.length(x) > 5), "|").alias("long_tokens"),
        F.size(F.array_distinct(tk)).cast("long").alias("n_distinct"),
        F.array_join(F.reverse(F.slice(tk, 1, 4)), "|").alias("rev_head"),
    )


# ====================================================== TPC-H round-3 batch
# The remaining distinctive TPC-H plan shapes (public spec), adapted to the
# slim testdata schema: correlated EXISTS (q4), join + top-N revenue (q10),
# outer-join count distribution (q13), scalar max-over-agg subquery (q15),
# correlated per-group average (q17), IN-over-HAVING (q18), and
# anti-join + global scalar subquery (q22).


@register(
    "rel_q4_order_priority",
    """
    SELECT o.o_orderpriority, cast(count(*) as bigint) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= timestamp '1998-01-01 00:00:00'
      AND o.o_orderdate <  timestamp '1998-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS → left-semi join with a non-equi "
        "residual (l_shipdate > o_orderdate) + priority rollup",
)
def rel_q4_order_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "rel_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                          as bigint)) / 10000.0, 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= timestamp '1998-01-01 00:00:00'
      AND o.o_orderdate <  timestamp '1999-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: 4-way join, revenue per returned-item customer, "
        "top-20 (TakeOrderedAndProject; dims broadcast). Revenue sums exact "
        "integer e-4 currency units so the aggregate is order-independent "
        "(a double sum here straddled a round-half boundary across engines)",
)
def rel_q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .join(src.maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(src.maybe_broadcast(n, sf_dir, "nation"), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
                    ).cast("long")
                )
                / 10000.0,
                2,
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "rel_q13_count_distribution",
    """
    SELECT c_count, cast(count(*) as bigint) AS custdist
    FROM (SELECT c.c_custkey, cast(count(o.o_orderkey) as bigint) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: outer join with a join-side filter + two-level "
        "aggregation (orders-per-customer distribution; count skips nulls)",
)
def rel_q13_count_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "rel_q15_top_supplier",
    """
    WITH rev AS (SELECT l_suppkey,
                        sum(cast(round(l_extendedprice * (1 - l_discount) * 10000, 0)
                                 as bigint)) AS rev_e4
                 FROM lineitem
                 WHERE l_shipdate >= timestamp '1999-01-01 00:00:00'
                   AND l_shipdate <  timestamp '1999-04-01 00:00:00'
                 GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           round(cast(r.rev_e4 as bigint) / 10000.0, 2) AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_e4 = (SELECT max(rev_e4) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: supplier revenue view + scalar max-over-aggregate "
        "subquery (the agg result is tiny, so the max is a broadcast). The "
        "view and its max compare EXACT e-4 integer-unit sums (the q7-q10 "
        "idiom): equality on round(sum(double)) is shuffle-order-dependent "
        "near a half-cent boundary and can silently drop the top supplier",
)
def rel_q15_top_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-04-01 00:00:00").cast("timestamp"))
    )
    rev_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("bigint")
    rev = li.groupBy("l_suppkey").agg(F.sum(rev_e4).alias("rev_e4"))
    best = rev.agg(F.max("rev_e4").alias("m"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), rev.rev_e4 == F.col("m"))
        .join(src.maybe_broadcast(s, sf_dir, "supplier"), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_e4") / 10000.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "rel_q17_small_quantity",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           cast(count(*) as bigint) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: correlated per-part average subquery, decorrelated "
        "into a per-part aggregate joined back on the part key",
)
def rel_q17_small_quantity(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(src.maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "rel_q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: IN over a grouped HAVING subquery → semi-join on "
        "the aggregated order keys, then re-join and re-aggregate",
)
def rel_q18_large_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(big, o.o_orderkey == F.col("big_key"), "left_semi")
        .join(src.maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(20)
    )


@register(
    "rel_q22_idle_customers",
    """
    SELECT c.c_nationkey, cast(count(*) as bigint) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= timestamp '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: global scalar-average subquery + NOT EXISTS "
        "anti-join (rich customers with no recent orders), per-nation rollup",
)
def rel_q22_idle_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "ev_stream_enrich",
    """
    WITH seg AS (
      SELECT user_id,
             CASE WHEN count(*) >= 100 THEN 'heavy'
                  WHEN count(*) >= 50 THEN 'medium'
                  ELSE 'light' END AS segment
      FROM events GROUP BY user_id
    )
    SELECT cast(time_bucket(INTERVAL '15 minutes', e.ts) as timestamp) AS window_start,
           s.segment, cast(count(*) as bigint) AS cnt,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN seg s USING (user_id)
    GROUP BY 1, 2
    """,
    doc="stream-static enrichment: events stream joined (broadcast) to a "
        "static user-segment dimension, 15-min tumbling counts per segment "
        "(Structured Streaming; batch oracle via bounded drain)",
)
def ev_stream_enrich(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming import events as ev

    return ev.run_enriched_stream_once(spark, sf_dir)


@register(
    "rel_q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(vol_e4) / 10000.0, 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l.l_shipdate) AS l_year,
                 cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                      as bigint) AS vol_e4
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate >= timestamp '1998-01-01 00:00:00'
            AND l.l_shipdate <  timestamp '2000-01-01 00:00:00')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair trade volume by year "
        "(double nation join with a disjunctive pair predicate)",
)
def rel_q7_volume_shipping(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    return (
        li.join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .join(src.maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(src.maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(src.maybe_broadcast(n1, sf_dir, "nation"), s.s_nationkey == F.col("n1_key"))
        .join(src.maybe_broadcast(n2, sf_dir, "nation"), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(vol_e4) / 10000.0, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "rel_q8_market_share",
    """
    SELECT o_year,
           round(cast(sum(CASE WHEN nation = 'NATION_1' THEN vol_e4 ELSE 0 END)
                      as double)
                 / cast(sum(vol_e4) as double), 6) AS mkt_share
    FROM (SELECT year(o.o_orderdate) AS o_year, n2.n_name AS nation,
                 cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                      as bigint) AS vol_e4
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
    GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: 7-way snowflake + conditional market-share ratio "
        "per year (numerator and denominator as exact e-4 integer sums so "
        "the ratio is order-independent)",
)
def rel_q8_market_share(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol_e4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    base = (
        li.join(src.maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .join(src.maybe_broadcast(c, sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(src.maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(src.maybe_broadcast(n1, sf_dir, "nation"), c.c_nationkey == F.col("n1_key"))
        .join(src.maybe_broadcast(r, sf_dir, "region"), F.col("n1_region") == r.r_regionkey)
        .join(src.maybe_broadcast(n2, sf_dir, "nation"), s.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), F.col("nation"), vol_e4.alias("vol_e4"))
    )
    num = F.sum(F.when(F.col("nation") == "NATION_1", F.col("vol_e4")).otherwise(F.lit(0)))
    return (
        base.groupBy("o_year")
        .agg(
            F.round(num.cast("double") / F.sum("vol_e4").cast("double"), 6).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@register(
    "rel_q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amt_e4) / 10000.0, 2) AS sum_profit
    FROM (SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
                 cast(round((l.l_extendedprice * (1 - l.l_discount)
                             - 0.6 * p.p_retailprice * l.l_quantity) * 10000, 0)
                      as bigint) AS amt_e4
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE p.p_name LIKE '%gear%')
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit per supplier nation per year over parts "
        "matched by name substring (cost modeled as 0.6*p_retailprice — the "
        "slim testdata has no partsupp table; public TPC-H uses "
        "ps_supplycost)",
)
def rel_q9_product_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amt_e4 = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 10000,
        0,
    ).cast("long")
    return (
        li.join(src.maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .join(src.maybe_broadcast(s, sf_dir, "supplier"), li.l_suppkey == s.s_suppkey)
        .join(src.maybe_broadcast(n, sf_dir, "nation"), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amt_e4) / 10000.0, 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "rel_q21_waiting_suppliers",
    """
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, cast(count(*) as bigint) AS numwait
    FROM l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM l1 l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape: suppliers who were the SOLE late supplier on a "
        "multi-supplier finished order — dual correlated subqueries (EXISTS "
        "another supplier, NOT EXISTS another LATE supplier) compiled to a "
        "left-semi + left-anti join pair with an equi key (orderkey) plus a "
        "non-equi residual (suppkey <>). The slim testdata has no "
        "l_commitdate/l_receiptdate, so 'late' is modeled as shipping >90 "
        "days after o_orderdate (public Q21 uses receipt > commit)",
)
def rel_q21_waiting_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    l1 = (
        li.join(src.maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
            .alias("is_late"),
        )
    )
    late = l1.filter(F.col("is_late"))
    l2 = l1.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = late.select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    sole_late = (
        late.join(
            l2,
            (F.col("ok2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("ok3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(
            src.maybe_broadcast(s, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ===================================================== TPC-H fill: partsupp
# The testdata star schema has no partsupp table, so the four TPC-H queries
# that need one (Q2/Q11/Q16/Q20) derive it deterministically from lineitem's
# DISTINCT (l_partkey, l_suppkey) pairs — referentially consistent with the
# fact table by construction (every derived row has matching lineitem rows,
# and Q20's per-pair usage correlation is never vacuously null). availqty
# and supplycost are integer formulas over the keys; cost is kept in CENTS
# (bigint) wherever it is compared or aggregated, so cross-engine double
# drift cannot exist, and divided by 100.0 only for display. The identical
# construction runs on both engines (the derived-fixture pattern the URL and
# mm_* oracles established).

from llm_pretraining_data_pipeline_spark.sql_views import PARTSUPP_SELECT

_PARTSUPP_SQL = f"""
    partsupp AS (
{PARTSUPP_SELECT}
    )
"""


def _partsupp(spark, sf_dir):
    """Derived partsupp: one distinct-shuffle over the narrow key pair, then
    pure projections. At 100 TB the distinct is the op's only wide stage and
    AQE coalesces it; everything downstream joins on ps_suppkey/ps_partkey."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    return pairs.withColumn(
        "ps_availqty", (F.col("ps_partkey") * 3 + F.col("ps_suppkey") * 5) % 100 + 1
    ).withColumn(
        "ps_cost_cents",
        (F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 17) % 90000 + 1000,
    )


@register(
    "rel_q2_min_cost_supplier",
    f"""
    WITH {_PARTSUPP_SQL},
    eu AS (
      SELECT ps.ps_partkey, ps.ps_cost_cents, s.s_name, s.s_acctbal, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    mc AS (SELECT ps_partkey, min(ps_cost_cents) AS min_cents
           FROM eu GROUP BY ps_partkey)
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
           round(e.ps_cost_cents / 100.0, 2) AS ps_supplycost
    FROM part p
    JOIN eu e ON e.ps_partkey = p.p_partkey
    JOIN mc ON mc.ps_partkey = p.p_partkey AND e.ps_cost_cents = mc.min_cents
    WHERE p.p_size <= 10 AND p.p_type LIKE '%ROMO'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: min-supply-cost supplier per qualifying part within "
        "a region — the correlated MIN subquery decorrelates into a per-part "
        "aggregate joined back on (part, cost); cost compared in integer "
        "cents so the min-equality is exact on both engines. Dims broadcast; "
        "the only wide stages are the partsupp distinct and the per-part min",
)
def rel_q2_min_cost_supplier(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & F.col("p_type").like("%ROMO")
    )
    eu = (
        ps.join(src.maybe_broadcast(s, sf_dir, "supplier"), ps.ps_suppkey == s.s_suppkey)
        .join(src.maybe_broadcast(n, sf_dir, "nation"), s.s_nationkey == n.n_nationkey)
        .join(src.maybe_broadcast(r, sf_dir, "region"), n.n_regionkey == r.r_regionkey)
        .select("ps_partkey", "ps_cost_cents", "s_name", "s_acctbal", "n_name")
    )
    mc = eu.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_cost_cents").alias("min_cents")
    )
    return (
        eu.join(src.maybe_broadcast(p, sf_dir, "part"), eu.ps_partkey == p.p_partkey)
        .join(
            mc,
            (F.col("mk") == F.col("ps_partkey"))
            & (F.col("ps_cost_cents") == F.col("min_cents")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round(F.col("ps_cost_cents") / 100.0, 2).alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "rel_q11_important_stock",
    f"""
    WITH {_PARTSUPP_SQL},
    de AS (
      SELECT ps.ps_partkey, ps.ps_cost_cents * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    )
    SELECT ps_partkey, round(sum(v) / 100.0, 2) AS value
    FROM de GROUP BY ps_partkey
    HAVING sum(v) > (SELECT sum(v) * 0.001 FROM de)
    ORDER BY value DESC, ps_partkey
    """,
    doc="TPC-H Q11 shape: per-part stock value within one nation, kept only "
        "above a fraction of the nation's total — the scalar global-sum "
        "subquery becomes a 1-row broadcast cross join against the grouped "
        "frame. Values aggregate as integer cents (exact); the fraction is "
        "0.001 (canonical 0.0001/SF) so the fixture keeps a real subset",
)
def rel_q11_important_stock(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    de = (
        ps.join(src.maybe_broadcast(s, sf_dir, "supplier"), ps.ps_suppkey == s.s_suppkey)
        .join(src.maybe_broadcast(n, sf_dir, "nation"), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"),
        )
    )
    grouped = de.groupBy("ps_partkey").agg(F.sum("v").alias("sv"))
    thr = de.agg((F.sum("v") * F.lit(0.001)).alias("thr"))
    return (
        grouped.join(F.broadcast(thr))
        .filter(F.col("sv") > F.col("thr"))
        .select("ps_partkey", F.round(F.col("sv") / 100.0, 2).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "rel_q16_supplier_part_counts",
    f"""
    WITH {_PARTSUPP_SQL}
    SELECT p.p_brand, p.p_type, p.p_size,
           cast(count(DISTINCT ps.ps_suppkey) as bigint) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_type NOT LIKE 'MED%'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
      AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct supplier counts per (brand, type, size) "
        "excluding a supplier denylist — NOT IN compiles to a left-anti join "
        "(keys never null), the part dim broadcasts, and count(DISTINCT) "
        "runs as Spark's two-phase distinct-aggregate. The slim supplier "
        "table has no comment field, so the canonical '%Customer%Complaints%' "
        "denylist is modeled as negative account balance",
)
def rel_q16_supplier_part_counts(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & ~F.col("p_type").like("MED%")
        & F.col("p_size").isin([1, 4, 9, 14, 19, 24, 29, 34, 39, 49])
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == F.col("bad_key"), "left_anti")
        .join(src.maybe_broadcast(p, sf_dir, "part"), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "rel_q20_promotion_suppliers",
    f"""
    WITH {_PARTSUPP_SQL},
    red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    usage AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
        AND l_shipdate <  timestamp '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    cand AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN red ON red.p_partkey = ps.ps_partkey
      JOIN usage u ON u.l_partkey = ps.ps_partkey
                  AND u.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_availqty > 0.5 * u.qty
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT ps_suppkey FROM cand)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: suppliers in a region holding excess stock "
        "(availqty > half a year's shipped quantity) of 'red' parts — the "
        "correlated per-(part, supplier) usage subquery decorrelates into a "
        "grouped aggregate equi-joined on both keys; the final IN is a "
        "left-semi join. partsupp derives from lineitem's own key pairs, so "
        "the usage correlation always has matching rows",
)
def rel_q20_promotion_suppliers(spark, sf_dir):
    ps = _partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select(F.col("p_partkey").alias("red_key"))
    )
    usage = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("uk_part"), F.col("l_suppkey").alias("uk_supp")
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    cand = (
        ps.join(F.broadcast(red), ps.ps_partkey == F.col("red_key"), "left_semi")
        .join(
            usage,
            (F.col("uk_part") == F.col("ps_partkey"))
            & (F.col("uk_supp") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(cand, s.s_suppkey == cand.ps_suppkey, "left_semi")
        .join(src.maybe_broadcast(n, sf_dir, "nation"), s.s_nationkey == n.n_nationkey)
        .join(src.maybe_broadcast(r, sf_dir, "region"), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_name")
    )



# ===================================================== streaming cleanse

def _cleanse_oracle() -> str:
    from llm_pretraining_data_pipeline_spark.oracle_fragments import toks
    from llm_pretraining_data_pipeline_spark.queries_ext import _moji_fix_sql

    l1 = (
        "'Caf\u00c3\u00a9 event number ' || cast(event_id % 13 as varchar)"
        " || ' reports \u00e2\u20ac\u0153ok\u00e2\u20ac\u00a6 status fine.'"
    )
    l3 = (
        "CASE WHEN event_id % 3 = 0"
        " THEN 'Please enable javascript to continue now.'"
        " ELSE 'An ordinary second line with words enough.' END"
    )
    raw = f"{l1} || chr(10) || 'tiny.' || chr(10) || {l3}"
    kept = (
        "list_filter(list_filter(list_transform(string_split(txt, chr(10)),"
        " l -> trim(l)), l -> l <> ''),"
        " l -> regexp_matches(l, '[.!?\"]$')"
        f" AND len({toks('l')}) >= 5"
        " AND NOT contains(lower(l), 'javascript'))"
    )
    return f"""
    WITH u AS (SELECT event_type, {_moji_fix_sql(raw)} AS txt FROM events),
    c AS (SELECT event_type, {kept} AS kept FROM u)
    SELECT event_type, cast(count(*) as bigint) AS n_docs,
           cast(sum(len(kept)) as bigint) AS lines_kept,
           cast(sum(length(array_to_string(kept, chr(10)))) as bigint)
             AS clean_chars
    FROM c GROUP BY event_type
    """


@register(
    "ev_stream_cleanse",
    _cleanse_oracle(),
    doc="streaming ingestion cleanse: mojibake repair then C4 line "
        "retention composed DIRECTLY onto a Structured Streaming source "
        "(stateless per-row maps need nothing stream-specific — the exact "
        "batch Column expressions clean an unbounded feed), then a "
        "complete-mode per-type aggregate of cleaned volume; bounded "
        "drain, so the batch referee replays the identical cleanup in SQL",
)
def ev_stream_cleanse(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming.events import (
        run_cleanse_stream_once,
    )

    return run_cleanse_stream_once(spark, sf_dir)


# ============================================ SQL-addressable view surface

_SQL_SURFACE_TEXT = """
    SELECT n.n_name,
           cast(count(*) as bigint) AS n_pairs,
           cast(sum(ps.ps_availqty) as bigint) AS total_availqty,
           cast(sum(ps.ps_cost_cents) as bigint) AS total_cost_cents
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
"""


@register(
    "rel_sql_surface",
    f"""
    WITH {_PARTSUPP_SQL}
    {_SQL_SURFACE_TEXT}
    """,
    doc="the relational surface driven as PURE SQL TEXT: register_sql_views "
        "publishes every testdata table plus the derived partsupp as temp "
        "views, and this query is one spark.sql(...) string — no DataFrame "
        "code. Views are metadata only, so Catalyst gives the SQL route the "
        "same pushdown/broadcast plan as the DataFrame forms; the DuckDB "
        "referee runs the IDENTICAL select over its own views (partsupp "
        "via the shared verbatim CTE)",
)
def rel_sql_surface(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.sql_views import register_sql_views

    register_sql_views(spark, sf_dir)
    return spark.sql(_SQL_SURFACE_TEXT)


def _stream_quality_oracle() -> str:
    from llm_pretraining_data_pipeline_spark.oracle_fragments import h64, toks
    from llm_pretraining_data_pipeline_spark.queries_ext import (
        _H36_BIAS,
        _H36_W_SQL,
        _HQ_D,
        _moji_fix_sql,
    )

    l1 = (
        "'CafÃ© event number ' || cast(event_id % 13 as varchar)"
        " || ' reports â€œokâ€¦ status fine.'"
    )
    l3 = (
        "CASE WHEN event_id % 3 = 0"
        " THEN 'Please enable javascript to continue now.'"
        " ELSE 'An ordinary second line with words enough.' END"
    )
    raw = f"{l1} || chr(10) || 'tiny.' || chr(10) || {l3}"
    q = (
        f"round(1.0 / (1.0 + exp(-({_H36_BIAS!r} + CASE WHEN len(w) > 0"
        f" THEN list_sum(list_transform(w,"
        f" t -> {_H36_W_SQL}[({h64('t')} % {_HQ_D}) + 1]))"
        f" / cast(len(w) as double) ELSE 0.0 END))), 6)"
    )
    return f"""
    WITH u AS (SELECT event_type, {_moji_fix_sql(raw)} AS txt FROM events),
    s AS (SELECT event_type, {q} AS q
          FROM (SELECT event_type, {toks('lower(txt)')} AS w FROM u))
    SELECT event_type, cast(count(*) as bigint) AS n_docs,
           cast(sum(cast(round(q * 1000000.0, 0) as bigint)) as bigint)
             AS score_sum_micro
    FROM s GROUP BY event_type
    """


@register(
    "ev_stream_quality",
    _stream_quality_oracle(),
    doc="model-based quality scoring ON the stream: mojibake repair + the "
        "frozen hashed-token logistic scorer applied per event (stateless "
        "per-row maps need nothing stream-specific), then a complete-mode "
        "per-type aggregate. Per-row 6dp scores are integer-ized to "
        "micro-units before summing so the streaming aggregate is EXACT "
        "and order-independent — replayable bit-for-bit by the batch "
        "DuckDB referee; bounded drain",
)
def ev_stream_quality(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.queries_ext import (
        _H36_BIAS,
        _H36_W,
    )
    from llm_pretraining_data_pipeline_spark.streaming.events import (
        run_quality_stream_once,
    )

    return run_quality_stream_once(spark, sf_dir, _H36_W, _H36_BIAS)


@register(
    "ev_stream_trending",
    """
    WITH e AS (
      SELECT event_type,
             cast(time_bucket(INTERVAL '5 minutes', ts) as timestamp) AS b
      FROM events
    ),
    w AS (
      SELECT u.ws AS window_start, event_type
      FROM e, unnest([b, b - INTERVAL '5 minutes']) AS u(ws)
    ),
    c AS (SELECT window_start, event_type,
                 cast(count(*) as bigint) AS cnt
          FROM w GROUP BY 1, 2),
    r AS (SELECT window_start, event_type, cnt,
                 cast(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY cnt DESC, event_type) as int) AS rank
          FROM c)
    SELECT window_start, event_type, cnt, rank FROM r WHERE rank <= 3
    """,
    doc="sliding-window trending top-k event types (10-minute windows "
        "sliding every 5 — each event lands in two windows, so bursts "
        "surface within one slide): the stream maintains the sliding "
        "counts incrementally (the stateful part); ranking the few rows "
        "per window is a batch step on the drained result. The referee "
        "replays the two-windows-per-event expansion in SQL",
)
def ev_stream_trending(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming.events import (
        run_trending_stream_once,
    )

    return run_trending_stream_once(spark, sf_dir, k=3)


@register(
    "ev_stream_sliding",
    """
    WITH e AS (
      SELECT event_type, value,
             cast(time_bucket(INTERVAL '5 minutes', ts) as timestamp) AS b
      FROM events
    ),
    w AS (
      SELECT u.ws AS window_start, event_type, value
      FROM e, unnest([b, b - INTERVAL '5 minutes']) AS u(ws)
    )
    SELECT window_start, event_type, round(sum(value), 2) AS total_value
    FROM w GROUP BY 1, 2
    """,
    doc="sliding-window value sums per event type (10-minute windows "
        "sliding every 5) as a Structured Streaming query — the "
        "overlapping-window state pattern; aggregate doubles rounded 2dp "
        "(the engine's standard aggregated-double recipe), referee "
        "replays the two-windows-per-event expansion",
)
def ev_stream_sliding(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming.events import (
        _drain_to_memory,
        read_events_stream,
        sliding_value_sums,
    )

    return _drain_to_memory(
        sliding_value_sums(read_events_stream(spark, sf_dir)), "complete"
    )


@register(
    "ev_stream_bloom",
    f"""
    WITH hist AS (
      SELECT DISTINCT 'u:' || cast(user_id AS varchar) AS key
      FROM events WHERE user_id % 3 = 0
    ),
    pos AS (
      SELECT DISTINCT
             ({O.h64("key || ':' || cast(j AS varchar)")} % 1024) AS p
      FROM hist, unnest(range(0, 3)) AS u(j)
    ),
    expanded AS (
      SELECT event_id, user_id,
             ({O.h64("'u:' || cast(user_id AS varchar) || ':' || cast(j AS varchar)")}
              % 1024) AS pp
      FROM events, unnest(range(0, 3)) AS u(j)
    ),
    probe AS (
      SELECT event_id, bool_and(pp IN (SELECT p FROM pos)) AS maybe_seen
      FROM expanded GROUP BY event_id
    )
    SELECT e.event_id, e.user_id, pr.maybe_seen,
           e.user_id % 3 = 0 AS seen,
           pr.maybe_seen AND e.user_id % 3 <> 0 AS false_positive
    FROM events e JOIN probe pr USING (event_id)
    """,
    doc="Bloom-filter incremental dedup ON THE STREAM "
        "(streaming/events.py::run_bloom_stream_once + operators/"
        "bloom.py): the historical filter (user_id%3=0 slice) is static "
        "broadcast state; every streamed event answers maybe-seen via k "
        "broadcast joins ANDed map-side — a STATELESS per-row stage, "
        "append mode, zero aggregation state, the stream itself never "
        "shuffles. The continuous form of d19's nightly-crawl shape; "
        "the referee replays the exact md5 bit positions so the "
        "deterministic false-positive SET matches (fixture-small m=1024/"
        "k=3 makes FPs real), and zero false negatives by construction",
)
def ev_stream_bloom(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming import events as ev

    return ev.run_bloom_stream_once(spark, sf_dir, m_bits=1024, k=3)


@register(
    "a22_countmin_sketch",
    f"""
    WITH keyed AS (
      SELECT user_id, 'u:' || cast(user_id AS varchar) AS key FROM events
    ),
    exact AS (
      SELECT user_id, key, count(*) AS exact_cnt FROM keyed GROUP BY 1, 2
    ),
    cms AS (
      SELECT u.j,
             ({O.h64("key || ':' || cast(u.j AS varchar)")} % 256) AS bucket,
             sum(exact_cnt) AS cnt
      FROM exact CROSS JOIN unnest(range(0, 3)) AS u(j)
      GROUP BY 1, 2
    ),
    est AS (
      SELECT e.user_id, e.exact_cnt, min(c.cnt) AS est_cnt
      FROM exact e
      CROSS JOIN unnest(range(0, 3)) AS u(j)
      JOIN cms c
        ON c.j = u.j
       AND c.bucket = ({O.h64("e.key || ':' || cast(u.j AS varchar)")} % 256)
      GROUP BY 1, 2
    )
    SELECT user_id, cast(exact_cnt AS bigint) AS exact_cnt,
           cast(est_cnt AS bigint) AS est_cnt,
           est_cnt > exact_cnt AS overestimate
    FROM est
    ORDER BY exact_cnt DESC, user_id
    LIMIT 20
    """,
    doc="Count-min sketch heavy-hitter counting "
        "(operators/sketch.py::cms_build/cms_estimate): per-user event "
        "counts estimated from depth x width integer counters instead of "
        "the exact key set — the sublinear monitor for sources/domains/"
        "users when cardinality won't fit memory. Build = one map-side-"
        "combinable sum shuffle; estimate = d BROADCAST joins + "
        "map-side least(), the probed frame never shuffles. Fixture-"
        "small width=256/depth=3 makes collisions real, so the referee "
        "pins the deterministic OVERESTIMATE SET (md5 counter layout "
        "replayed in SQL), and est >= exact one-sided error is "
        "asserted per row in pytest. Top-20 by exact count, "
        "deterministic tie-break on user_id",
)
def a22_countmin_sketch(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators import sketch

    keyed = src.read_events(spark, sf_dir).select(
        "user_id",
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("key"),
    )
    cms = sketch.cms_build(keyed, "key", depth=3, width=256)
    exact = keyed.groupBy("user_id", "key").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    est = sketch.cms_estimate(exact, cms, "key", depth=3, width=256)
    return (
        est.select(
            "user_id",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") > F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "user_id")
        .limit(20)
    )


@register(
    "ev_stream_cms",
    f"""
    WITH hist AS (
      SELECT 'u:' || cast(user_id AS varchar) AS key
      FROM events WHERE user_id % 3 = 0
    ),
    cms AS (
      SELECT u.j,
             ({O.h64("key || ':' || cast(u.j AS varchar)")} % 256) AS bucket,
             count(*) AS cnt
      FROM hist CROSS JOIN unnest(range(0, 3)) AS u(j)
      GROUP BY 1, 2
    ),
    probe AS (
      SELECT e.event_id, e.user_id,
             min(coalesce(c.cnt, 0)) AS est
      FROM events e
      CROSS JOIN unnest(range(0, 3)) AS u(j)
      LEFT JOIN cms c
        ON c.j = u.j
       AND c.bucket = ({O.h64("'u:' || cast(e.user_id AS varchar) || ':' "
                              "|| cast(u.j AS varchar)")} % 256)
      GROUP BY 1, 2
    )
    SELECT event_id, user_id, cast(est AS bigint) AS est_hist_cnt,
           est >= 50 AS is_heavy
    FROM probe
    """,
    doc="Count-min heavy-hitter monitor ON THE STREAM "
        "(streaming/events.py::run_cms_stream_once + operators/"
        "sketch.py): the sketch over the historical slice (user_id%3=0) "
        "is static broadcast state; every streamed event reads its "
        "estimated historical count via d broadcast joins + map-side "
        "least() — stateless per-row, append mode, the Bloom probe's "
        "counting twin. The live is-this-key-already-hot gate for "
        "throttled/sampled handling of heavy users or domains, with no "
        "exact key set kept anywhere. The referee replays the exact md5 "
        "counter layout; fixture-small width=256 makes collision "
        "overestimates real and refereed",
)
def ev_stream_cms(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.streaming import events as ev

    return ev.run_cms_stream_once(
        spark, sf_dir, depth=3, width=256, heavy_threshold=50
    )
