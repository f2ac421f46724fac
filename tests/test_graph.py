"""PageRank (operators/graph.py) — exact fixed-point power iteration."""

import pytest

from llm_pretraining_data_pipeline_spark.operators.graph import UNIT, pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank_e12"] for r in pagerank(df, **kw).collect()}


class TestPagerank:
    def test_cycle_stays_uniform(self, spark):
        r = _ranks(spark, [(0, 1), (1, 2), (2, 0)], iterations=4)
        assert len(r) == 3 and len(set(r.values())) == 1
        assert r[0] == UNIT // 3

    def test_mass_conserved_with_dangling(self, spark):
        # 0 -> 1, node 1 dangles: uniform redistribution keeps total mass
        r = _ranks(spark, [(0, 1)], iterations=3)
        assert 0 <= UNIT - sum(r.values()) < 100  # flooring loss only
        assert r[1] > r[0]

    def test_star_leaves_symmetric(self, spark):
        r = _ranks(spark, [(0, i) for i in range(1, 5)], iterations=3)
        assert len({r[i] for i in range(1, 5)}) == 1
        assert r[0] < r[1]

    def test_authority_ordering(self, spark):
        # everyone links to 9; 9 links back to 0 only
        edges = [(i, 9) for i in range(9)] + [(9, 0)]
        r = _ranks(spark, edges, iterations=3)
        assert r[9] == max(r.values())
        assert r[0] > r[1]  # 9's endorsement beats the base rank
        assert len({r[i] for i in range(1, 9)}) == 1

    def test_deterministic_across_partitionings(self, spark):
        edges = [(i % 7, (i * 3 + 1) % 7) for i in range(40) if i % 7 != (i * 3 + 1) % 7]
        edges = sorted(set(edges))
        df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
        df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
        r1 = {r["node"]: r["rank_e12"] for r in pagerank(df1).collect()}
        r8 = {r["node"]: r["rank_e12"] for r in pagerank(df8).collect()}
        assert r1 == r8  # integer arithmetic: no sum-order sensitivity

    def test_checkpoint_every_matches_unchunked(self, spark):
        edges = [(i % 5, (i + 1) % 5) for i in range(5)]
        df = spark.createDataFrame(edges, "src long, dst long")
        a = {r["node"]: r["rank_e12"]
             for r in pagerank(df, iterations=6, checkpoint_every=2).collect()}
        b = {r["node"]: r["rank_e12"]
             for r in pagerank(df, iterations=6, checkpoint_every=100).collect()}
        assert a == b

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([(0, 1)], "src long, dst long")
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping_num=100)
        with pytest.raises(ValueError, match="empty"):
            pagerank(df.where("src < 0"))

    def test_plan_never_cartesian(self, spark):
        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (0, 2)], "src long, dst long"
        )
        plan = pagerank(df, iterations=2)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


    def test_plan_all_broadcast_under_threshold(self, spark):
        # n is known exactly at build time, so every per-node frame must
        # carry an explicit broadcast hint: the edge frame is never
        # shuffled and no sort-merge join appears anywhere.
        from pyspark.sql import functions as F
        edges = (
            spark.range(5000)
            .select((F.col("id") % 40).alias("src"),
                    ((F.col("id") * 7 + 13) % 40).alias("dst"))
            .where("src <> dst").distinct()
        )
        pr = pagerank(edges, iterations=2)
        pr.count()
        plan = pr._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_over_threshold_falls_back(self, spark):
        edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
        r = {x["node"]: x["rank_e12"]
             for x in pagerank(edges, broadcast_nodes=1).collect()}
        assert len(r) == 2 and len(set(r.values())) == 1  # results identical
