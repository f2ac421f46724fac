"""Count-min sketch (operators/sketch.py): one-sided error, merge, plans."""

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.operators import sketch


def _keys(spark, counts):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "key string")


class TestCountMin:
    def test_never_undercounts(self, spark):
        counts = {f"k{i}": (i % 7) + 1 for i in range(50)}
        df = _keys(spark, counts)
        cms = sketch.cms_build(df, depth=3, width=16)  # tiny -> collisions
        probe = spark.createDataFrame(
            [(k, n) for k, n in counts.items()], "key string, true_cnt long"
        )
        out = sketch.cms_estimate(probe, cms, depth=3, width=16).collect()
        assert all(r["est_cnt"] >= r["true_cnt"] for r in out)
        assert any(r["est_cnt"] > r["true_cnt"] for r in out)  # collisions real

    def test_exact_when_wide_enough(self, spark):
        counts = {"a": 5, "b": 2, "c": 9}
        df = _keys(spark, counts)
        cms = sketch.cms_build(df, depth=4, width=1 << 12)
        probe = spark.createDataFrame([(k,) for k in counts], "key string")
        out = {r["key"]: r["est_cnt"]
               for r in sketch.cms_estimate(probe, cms, depth=4, width=1 << 12).collect()}
        assert out == counts

    def test_weighted_build(self, spark):
        df = spark.createDataFrame(
            [("a", 3), ("a", 4), ("b", 10)], "key string, w long"
        )
        cms = sketch.cms_build(df, weight_col="w", depth=4, width=1 << 12)
        probe = spark.createDataFrame([("a",), ("b",), ("zz",)], "key string")
        out = {r["key"]: r["est_cnt"]
               for r in sketch.cms_estimate(probe, cms, depth=4, width=1 << 12).collect()}
        assert out["a"] == 7 and out["b"] == 10 and out["zz"] == 0

    def test_sketches_merge_by_counter_sum(self, spark):
        c1 = sketch.cms_build(_keys(spark, {"a": 3, "b": 1}), depth=3, width=64)
        c2 = sketch.cms_build(_keys(spark, {"a": 2, "c": 5}), depth=3, width=64)
        merged = (
            c1.unionByName(c2)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        whole = sketch.cms_build(
            _keys(spark, {"a": 5, "b": 1, "c": 5}), depth=3, width=64
        )
        diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
        assert diff == 0  # lossless union, like Bloom OR-merge

    def test_probe_plan_broadcast_only(self, spark):
        df = _keys(spark, {"a": 1})
        cms = sketch.cms_build(df, depth=3, width=64)
        probe = spark.createDataFrame([("a",)], "key string")
        plan = (
            sketch.cms_estimate(probe, cms, depth=3, width=64)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
