"""Bloom filter operator (operators/bloom.py) vs a pure-Python replica.

The replica recomputes the exact bit positions (md5-based h64, same as the
engine's portable hash) so expected membership — INCLUDING the deterministic
false-positive set at small m — is asserted value-for-value, not just
statistically."""

import hashlib

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.operators import bloom


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _positions(key: str, k: int, m: int) -> list[int]:
    return [_h64(f"{key}:{j}") % m for j in range(k)]


def _py_bloom(keys, k, m):
    bits = set()
    for key in keys:
        bits.update(_positions(key, k, m))
    return bits


def _py_probe(key, bits, k, m):
    return all(p in bits for p in _positions(key, k, m))


class TestBloom:
    def test_build_matches_python_replica(self, spark):
        keys = [f"doc-{i}" for i in range(40)]
        m, k = 4096, 4
        built = bloom.bloom_build(
            spark.createDataFrame([(x,) for x in keys], "key string"),
            m_bits=m, k=k,
        ).collect()
        got_bits = set()
        for r in built:
            for b in range(32):
                if r["mask"] & (1 << b):
                    got_bits.add(r["bucket"] * 32 + b)
        assert got_bits == _py_bloom(keys, k, m)

    def test_no_false_negatives_and_exact_fp_set(self, spark):
        # small m on purpose: the false-positive SET is deterministic and
        # must match the replica exactly
        members = [f"doc-{i}" for i in range(60)]
        probes = [f"doc-{i}" for i in range(120)]  # 60 members + 60 others
        m, k = 384, 3
        bits = _py_bloom(members, k, m)
        expected = {key: _py_probe(key, bits, k, m) for key in probes}
        assert all(expected[key] for key in members)  # no false negatives
        assert any(  # the small-m fixture really exercises FPs
            expected[key] for key in probes if key not in set(members)
        )
        filt = bloom.bloom_build(
            spark.createDataFrame([(x,) for x in members], "key string"),
            m_bits=m, k=k,
        )
        out = bloom.bloom_probe(
            spark.createDataFrame([(x,) for x in probes], "key string"),
            filt, m_bits=m, k=k,
        ).collect()
        got = {r["key"]: r["maybe_member"] for r in out}
        assert got == expected

    def test_filters_merge_by_bit_or(self, spark):
        m, k = 2048, 4
        a = bloom.bloom_build(
            spark.createDataFrame([("a1",), ("a2",)], "key string"), m_bits=m, k=k
        )
        b = bloom.bloom_build(
            spark.createDataFrame([("b1",)], "key string"), m_bits=m, k=k
        )
        merged = (
            a.unionByName(b)
            .groupBy("bucket")
            .agg(F.bit_or("mask").alias("mask"))
        )
        out = bloom.bloom_probe(
            spark.createDataFrame([("a1",), ("b1",), ("c1",)], "key string"),
            merged, m_bits=m, k=k,
        ).collect()
        got = {r["key"]: r["maybe_member"] for r in out}
        assert got["a1"] and got["b1"]
        bits = _py_bloom(["a1", "a2", "b1"], k, m)
        assert got["c1"] == _py_probe("c1", bits, k, m)

    def test_probe_plan_is_broadcast_only(self, spark):
        """The probed corpus must reach the output without ANY shuffle:
        every join broadcast, no Exchange hashpartitioning on the probe
        side, no aggregation."""
        filt = bloom.bloom_build(
            spark.createDataFrame([("x",)], "key string"), m_bits=2048, k=4
        )
        probe = bloom.bloom_probe(
            spark.range(100).select(F.concat(F.lit("p"), "id").alias("key")),
            filt, m_bits=2048, k=4,
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the only exchanges allowed anywhere are broadcast exchanges plus
        # the filter-build's own single aggregation shuffle
        import re

        hash_exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
        assert all("bucket" in e or "_bit" in e for e in hash_exchanges), (
            "probe side must not shuffle: " + "\n".join(hash_exchanges)
        )
