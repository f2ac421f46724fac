"""Distributed link-graph centrality for domain-level curation.

Web-curation pipelines gate documents on the authority of their host
domain (Common Crawl's harmonic-centrality rankings, RefinedWeb's
domain-level filtering): a link graph over domains is orders of magnitude
smaller than the document corpus, yet its centrality scores feed a
first-stage URL gate that runs before any document byte is read — the
same 100 TB-shaped position as the f16 URL blocklist.

``pagerank`` is the standard damped power iteration, built Spark-first:

* Each iteration is one equi-join (edges ⋈ ranks on ``src``) plus one
  ``groupBy(dst)`` aggregation — the rank frame (one row per NODE) is
  tiny next to the edge frame, so AQE broadcasts it at runtime; the edge
  frame is scanned in place, never re-shuffled.
* Dangling mass (nodes with no outlinks) is redistributed uniformly each
  iteration via a 1-row aggregate, per the canonical formulation.
* Iterative DataFrame algorithms grow lineage linearly; every
  ``checkpoint_every`` iterations the rank frame is truncated with a
  narrow ``localCheckpoint`` (the pipeline's stage-boundary pattern).

EXACT-INTEGER ARITHMETIC: ranks live in fixed-point units of 1e-12
(bigint) and every division is floor division, so iteration results are
bit-identical regardless of aggregation order — float power iterations
diverge across engines at the ulp level (sum-order), integers cannot.
The tiny mass lost to flooring (< N·iterations·1e-12) is irrelevant for
a ranking signal and buys exact cross-engine reproducibility
(``corp_domain_pagerank`` referees 3 unrolled iterations in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 10**12  # fixed-point: 1.0 rank unit == 1e12


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
    broadcast_nodes: int = 200_000,
) -> DataFrame:
    """Damped PageRank over a directed edge list, exact fixed-point.

    ``edges`` must be distinct ``(src, dst)`` pairs (multi-edges would be
    double-counted; dedupe upstream if needed). Returns one row per node:
    ``(node, rank_e12 bigint)`` where ``rank_e12 / 1e12`` is the damped
    PageRank after ``iterations`` power steps from the uniform start.

    The node count ``n`` is known exactly (it seeds the uniform init), so
    when ``n <= broadcast_nodes`` every per-node frame (outdeg, the rank
    frame on the edge join, the per-iteration inflows) carries an explicit
    broadcast hint instead of hoping AQE's post-shuffle stats catch it —
    the edge frame is then NEVER shuffled, the per-iteration cost is one
    map-side join plus one groupBy exchange of (dst, contrib) rows. Past
    the threshold the joins fall back to shuffle joins on the node key
    (AQE still upgrades them when its BYTE-based stats allow). The
    threshold counts ROWS, and an explicit hint bypasses Spark's byte
    checks — the conservative default (~200k rows, a few MB even with
    long string node ids) exists so wide keys cannot drive hundreds of
    driver-materialized megabytes per iteration; size it to node-id
    width, not just count, when raising it.
    """
    if iterations < 1:
        raise ValueError(f"pagerank: iterations must be >= 1, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError(
            f"pagerank: damping {damping_num}/{damping_den} outside (0, 1)"
        )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # node count is a scalar the driver legitimately needs (uniform init +
    # dangling share); one tiny aggregate, not a data collect.
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    hint = F.broadcast if n <= broadcast_nodes else (lambda df: df)

    base = ((damping_den - damping_num) * UNIT // damping_den) // n
    ranks = nodes.withColumn("rank_e12", F.lit(UNIT // n).cast("long"))

    for it in range(iterations):
        with_deg = ranks.join(
            hint(outdeg), ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank_e12", "outdeg")
        # dangling mass: one-row aggregate, redistributed uniformly
        dangling = with_deg.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank_e12"), F.lit(0)).alias("d")
        )
        dangling_share = F.broadcast(dangling).select(
            F.expr(f"d div {n}").alias("dangling_share")
        )
        contribs = (
            e.join(
                hint(with_deg.where(F.col("outdeg").isNotNull())),
                e["src"] == F.col("node"),
            )
            .select(
                "dst",
                F.expr("rank_e12 div outdeg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            nodes.join(hint(contribs), nodes["node"] == contribs["dst"], "left")
            .crossJoin(dangling_share)  # 1-row broadcast, never cartesian
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_num} * (coalesce(inflow, 0L) + "
                        f"dangling_share) div {damping_den}"
                    )
                ).cast("long").alias("rank_e12"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
