"""Sources & sinks: JSONL/parquet round-trips, partitioned writes with
pruning, the checkpointed pipeline variant, sharded export, as-of join."""

import json
import os

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.operators import sharding
from llm_pretraining_data_pipeline_spark.operators.relational import asof_join
from llm_pretraining_data_pipeline_spark.plans import pipeline as P
from llm_pretraining_data_pipeline_spark.schemas import RAW_DOCUMENT_SCHEMA
from llm_pretraining_data_pipeline_spark.sources import io as src


class TestJsonlRoundTrip:
    def test_read_with_declared_schema(self, spark, tmp_path):
        p = tmp_path / "raw.jsonl"
        rows = [
            {"url": "http://a", "text": "hello world"},
            {"url": None, "text": "second doc"},
            {"url": "http://c", "text": None},
        ]
        p.write_text("\n".join(json.dumps(r) for r in rows))
        df = src.read_jsonl(spark, str(p))
        assert df.schema == RAW_DOCUMENT_SCHEMA
        key = lambda t: (str(t[0]), str(t[1]))  # noqa: E731 (None-safe sort)
        got = sorted([(r.url, r.text) for r in df.collect()], key=key)
        assert got == sorted([(r["url"], r["text"]) for r in rows], key=key)

    def test_write_jsonl_field_order(self, spark, tmp_path):
        df = spark.createDataFrame([("d1", "some text", "src")],
                                   "doc_id string, text string, source string")
        out = str(tmp_path / "out")
        src.write_jsonl(df, out, ["doc_id", "text", "source"])
        lines = [l for f in os.listdir(out) if f.startswith("part-")
                 for l in open(os.path.join(out, f)).read().splitlines()]
        assert lines == ['{"doc_id":"d1","text":"some text","source":"src"}']


class TestPartitionedWrites:
    def test_partitioned_parquet_prunes(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(i, "high_quality" if i % 3 == 0 else "rest") for i in range(30)],
            "id long, subset string",
        )
        out = str(tmp_path / "by_subset")
        src.write_parquet(df, out, partition_by=["subset"])
        assert sorted(
            d for d in os.listdir(out) if d.startswith("subset=")
        ) == ["subset=high_quality", "subset=rest"]
        back = spark.read.parquet(out).filter(F.col("subset") == "rest")
        import contextlib, io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            back.explain("formatted")
        assert "PartitionFilters" in buf.getvalue()
        assert back.count() == 20


class TestCheckpointedPipeline:
    def test_stage_checkpoints_written_and_composable(self, spark, tmp_path):
        raw = spark.createDataFrame(
            [("http://x/%d" % i,
              f"the document number {i} has the usual words about the harbour and ships")
             for i in range(8)],
            "url string, text string",
        )
        paths = P.run_pipeline_checkpointed(
            spark, raw, str(tmp_path), P.PipelineConfig(use_nfkc=False)
        )
        assert set(paths) == {s for s, _ in P.STAGES}
        final = spark.read.parquet(paths["tokenise"])
        assert final.count() == 8
        assert "quality_score" in final.columns and "n_tokens" in final.columns
        # checkpointed result == fused-lazy result
        fused = P.run_pipeline(raw, P.PipelineConfig(use_nfkc=False))
        a = {(r.url, r.drop_reason, r.n_tokens) for r in final.collect()}
        b = {(r.url, r.drop_reason, r.n_tokens) for r in fused.collect()}
        assert a == b


class TestSharding:
    def test_positional_vs_hashed(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pos = sharding.assign_shards(docs, docs_per_shard=100, order_col="doc_id")
        sizes = [r.n for r in pos.groupBy("shard_id").agg(F.count("*").alias("n")).collect()]
        assert all(s == 100 for s in sizes)  # exact positional sizes
        hashed = sharding.assign_shards_hashed(docs, num_shards=8)
        hsizes = {r.shard_id: r.n for r in
                  hashed.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
        assert set(hsizes) <= set(range(8)) and sum(hsizes.values()) == docs.count()

    def test_manifest(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sharded = sharding.assign_shards(docs, docs_per_shard=200, order_col="doc_id")
        man = sharding.shard_manifest(sharded, token_col="n_chars").collect()
        assert sum(r.num_docs for r in man) == docs.count()
        assert [r.shard_id for r in man] == sorted(r.shard_id for r in man)


class TestAsofJoin:
    def test_backward_basic(self, spark):
        trades = spark.createDataFrame(
            [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3")],
            "key long, ts long, trade string",
        )
        quotes = spark.createDataFrame(
            [(1, 5, 100.0), (1, 15, 101.0), (1, 20, 102.0), (2, 99, 9.0)],
            "qkey long, qts long, price double",
        )
        out = asof_join(trades, quotes, "key", "qkey", "ts", "qts").collect()
        got = {r.trade: r.price for r in out}
        assert got == {"t1": 100.0, "t2": 102.0, "t3": None}  # inclusive <=

    def test_forward(self, spark):
        left = spark.createDataFrame([(1, 10, "a")], "key long, ts long, tag string")
        right = spark.createDataFrame(
            [(1, 8, "early"), (1, 12, "next"), (1, 30, "later")],
            "rkey long, rts long, label string",
        )
        out = asof_join(left, right, "key", "rkey", "ts", "rts",
                        direction="forward").collect()
        assert out[0].label == "next"


class TestSqlViewSurface:
    def test_register_sql_views_and_plan_parity(self, spark, sf_dir):
        """Every table + derived partsupp is SQL-addressable, and the SQL
        route gets the same Catalyst plan treatment as the DataFrame route
        (views are metadata, not materialisation)."""
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.sql_views import (
            register_sql_views,
        )

        names = register_sql_views(spark, sf_dir)
        assert "partsupp" in names and "lineitem" in names
        for n in names:
            assert spark.sql(f"SELECT * FROM {n} LIMIT 1").count() >= 0
        # partsupp view == the DataFrame derivation used by TPC-H Q2/Q11
        from llm_pretraining_data_pipeline_spark.queries_rel import _partsupp

        a = spark.sql(
            "SELECT cast(count(*) as bigint) n, cast(sum(ps_cost_cents) as bigint) c FROM partsupp"
        ).first()
        d = _partsupp(spark, sf_dir).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ps_cost_cents").cast("long").alias("c"),
        ).first()
        assert (a.n, a.c) == (d.n, d.c)
        # broadcast join survives the SQL route (plan parity, not just rows)
        plan_sql = spark.sql(
            "SELECT n.n_name, count(*) FROM partsupp ps "
            "JOIN supplier s ON s.s_suppkey = ps.ps_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey GROUP BY n.n_name"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_sql



def _wet_uuid(prefix, did):
    import hashlib
    h = hashlib.md5(f"{prefix}:{did}".encode()).hexdigest()
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"

class TestWetExport:
    """wet_record_frame / wet_shard_frame (plans/exports.py): the
    CC-convention extracted-text sidecar must round-trip through the
    engine's own strict WARC reader (VERDICT r9 item 7 'done' criterion)."""

    DOCS = [
        (1, "https://ex.org/a", "plain ascii body"),
        (2, "https://ex.org/b", "unicode – ünïcødé 多字节 body"),
        (3, "https://ex.org/c", ""),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.DOCS, "doc_id long, url string, text string"
        )

    def test_records_reparse_through_strict_reader(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.exports import (
            wet_record_frame,
        )
        from llm_pretraining_data_pipeline_spark.sources.warc import parse_warc

        rows = {r["doc_id"]: r for r in wet_record_frame(self._df(spark)).collect()}
        blob = b"".join(bytes(rows[i]["wet_record"]) for i in (1, 2, 3))
        recs = parse_warc(blob)
        assert [r["warc_type"] for r in recs] == ["conversion"] * 3
        for (did, url, text), rec in zip(self.DOCS, recs):
            assert rec["target_uri"] == url
            assert rec["record_id"] == f"<urn:uuid:{_wet_uuid('wet', did)}>"
            assert rec["payload"].decode("utf-8") == text
            # Content-Length is the OCTET length (multibyte-safe)
            assert rec["content_length"] == len(text.encode("utf-8"))
        # the mandatory WARC-Date header is present in the raw bytes
        assert blob.count(b"WARC-Date: 1970-01-01T00:00:00Z\r\n") == 3

    def test_record_bytes_matches_physical(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.exports import (
            wet_record_frame,
        )

        for r in wet_record_frame(self._df(spark)).collect():
            assert r["record_bytes"] == len(bytes(r["wet_record"]))

    def test_shard_files_reparse_and_cover_all_docs(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.exports import (
            wet_shard_frame,
        )
        from llm_pretraining_data_pipeline_spark.sources.warc import parse_warc

        shards = wet_shard_frame(self._df(spark), num_shards=2).collect()
        seen = {}
        for s in shards:
            recs = parse_warc(bytes(s["wet_file"]))
            assert len(recs) == s["n_records"]
            assert s["file_bytes"] == len(bytes(s["wet_file"]))
            uuid_to_id = {
                f"<urn:uuid:{_wet_uuid('wet', d)}>": d for d, _, _ in self.DOCS
            }
            ids = [uuid_to_id[r["record_id"]] for r in recs]
            assert ids == sorted(ids)  # deterministic in-shard order
            for r, i in zip(recs, ids):
                seen[i] = r["payload"].decode("utf-8")
        assert seen == {d: t for d, _, t in self.DOCS}

    def test_spark_side_roundtrip_via_warc_records(self, spark):
        # full circle INSIDE the engine: export → warc_records operator
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.plans.exports import (
            wet_shard_frame,
        )
        from llm_pretraining_data_pipeline_spark.sources.warc import warc_records

        files = wet_shard_frame(self._df(spark), num_shards=2).select(
            F.col("shard_id").alias("file_id"),
            F.col("wet_file").alias("payload"),
        )
        out = warc_records(files)
        assert out.where(~F.col("parse_ok")).count() == 0
        assert out.count() == 3
        assert set(
            r["warc_type"] for r in out.select("warc_type").collect()
        ) == {"conversion"}

    def test_plan_is_single_shuffle_no_python(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.exports import (
            wet_shard_frame,
        )

        plan = (
            wet_shard_frame(self._df(spark), num_shards=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Arrow" not in plan
        # one hash exchange for the shard groupBy, nothing else
        assert plan.count("Exchange hashpartitioning") == 1
        assert "SortMergeJoin" not in plan and "Window" not in plan

    def test_wat_records_reparse_with_json_payload(self, spark):
        import json as _json

        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.plans.exports import (
            wat_record_frame,
        )
        from llm_pretraining_data_pipeline_spark.sources.warc import parse_warc

        df = spark.createDataFrame(
            [(1, "https://ex.org/a", 200, "text/html"),
             (2, "https://ex.org/b", 404, "text/plain")],
            "doc_id long, url string, http_status int, content_type string",
        )
        rows = {r["doc_id"]: r for r in wat_record_frame(df).collect()}
        blob = b"".join(bytes(rows[i]["wat_record"]) for i in (1, 2))
        recs = parse_warc(blob)
        assert [r["warc_type"] for r in recs] == ["metadata", "metadata"]
        meta = _json.loads(recs[1]["payload"])
        assert meta == {"url": "https://ex.org/b", "http_status": 404,
                        "content_type": "text/plain"}
        assert recs[0]["record_id"] == f"<urn:uuid:{_wet_uuid('wat', 1)}>"
        # pure Catalyst: no Python in the plan
        plan = (
            wat_record_frame(df)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "Python" not in plan and "Exchange" not in plan


class TestWarcResponseExport:
    """warc_response_record_frame / warc_response_shard_frame
    (plans/exports.py, VERDICT r12 item 6): curated corpora re-published
    as 'response' records must round-trip through the engine's own
    strict reader, HTTP split, digest verification, and CDX indexing."""

    DOCS = [
        (1, "https://ex.org/a", "plain ascii body"),
        (2, "https://ex.org/b", "unicode – ünïcødé 多字节 body"),
        (3, "https://ex.org/c", ""),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.DOCS, "doc_id long, url string, text string"
        )

    def test_records_reparse_split_and_verify_digests(self, spark):
        import hashlib

        from llm_pretraining_data_pipeline_spark.plans.exports import (
            warc_response_record_frame,
        )
        from llm_pretraining_data_pipeline_spark.sources.http import (
            parse_http_response,
        )
        from llm_pretraining_data_pipeline_spark.sources.warc import parse_warc

        rows = {
            r["doc_id"]: r
            for r in warc_response_record_frame(self._df(spark)).collect()
        }
        for did, url, text in self.DOCS:
            rec = bytes(rows[did]["warc_record"])
            assert rows[did]["record_bytes"] == len(rec)
            p = parse_warc(rec)[0]
            assert p["warc_type"] == "response"
            assert p["target_uri"] == url
            assert p["record_id"] == f"<urn:uuid:{_wet_uuid('warc', did)}>"
            assert (
                p["headers"]["content-type"]
                == "application/http; msgtype=response"
            )
            body = text.encode("utf-8")
            # stamped digests match recomputation from the bytes
            assert p["headers"]["warc-payload-digest"] == (
                "sha256:" + hashlib.sha256(body).hexdigest()
            )
            assert p["headers"]["warc-block-digest"] == (
                "sha256:" + hashlib.sha256(p["payload"]).hexdigest()
            )
            d = parse_http_response(p["payload"])
            assert d["status"] == 200
            assert d["content_type"] == "text/plain"
            assert d["charset"] == "utf-8"
            assert bytes(d["body"]) == body

    def test_framing_constants_are_the_oracle_constants(self, spark):
        # the s18 referee computes record_bytes closed-form as
        # 408 + len(uri) + digits(hlen) + hlen with hlen = 78 +
        # digits(blen) + blen — pin both constants against the bytes
        from llm_pretraining_data_pipeline_spark.plans.exports import (
            warc_response_record_frame,
        )
        from llm_pretraining_data_pipeline_spark.sources.warc import parse_warc

        for r in warc_response_record_frame(self._df(spark)).collect():
            p = parse_warc(bytes(r["warc_record"]))[0]
            did = r["doc_id"]
            url, text = {
                d: (u, t) for d, u, t in self.DOCS
            }[did]
            blen = len(text.encode("utf-8"))
            hlen = 78 + len(str(blen)) + blen
            assert p["content_length"] == hlen
            assert r["record_bytes"] == (
                408 + len(url) + len(str(hlen)) + hlen
            )

    def test_shards_reindex_and_selective_read(self, spark):
        # the full s18 loop at unit scale: publish → cdx_records →
        # read_warc_selective recovers the exact original bytes
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.plans.exports import (
            warc_response_shard_frame,
        )
        from llm_pretraining_data_pipeline_spark.sources import cdx
        from llm_pretraining_data_pipeline_spark.sources.http import (
            parse_http_response,
        )

        shards = warc_response_shard_frame(self._df(spark), num_shards=2)
        idx = cdx.cdx_records(
            shards, payload_col="warc_file", id_col="shard_id"
        )
        assert idx.where("NOT cdx_ok").count() == 0
        assert idx.count() == 3
        sel = cdx.read_warc_selective(
            shards, idx, surt_prefix="org,ex)/b",
            payload_col="warc_file", id_col="shard_id",
        ).collect()
        assert len(sel) == 1
        d = parse_http_response(bytes(sel[0]["payload"]))
        assert bytes(d["body"]).decode("utf-8") == self.DOCS[1][2]

    def test_plan_is_pure_catalyst_single_shuffle(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.exports import (
            warc_response_shard_frame,
        )

        plan = (
            warc_response_shard_frame(self._df(spark), num_shards=4)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Arrow" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
        assert "SortMergeJoin" not in plan and "Window" not in plan


class TestWarcDateValidation:
    def test_trailing_newline_rejected(self, spark):
        # re.match with '$' forgives one trailing newline, which would
        # interpolate a bare LF into every record's header line
        import pytest as _pytest

        from llm_pretraining_data_pipeline_spark.plans.exports import (
            wet_record_frame,
        )

        df = spark.createDataFrame(
            [(1, "https://a/x", "t")], "doc_id long, url string, text string"
        )
        with _pytest.raises(ValueError, match="warc_date"):
            wet_record_frame(df, warc_date="2026-08-15T10:00:00Z\n")
        with _pytest.raises(ValueError, match="warc_date"):
            wet_record_frame(df, warc_date="not-a-date")
        # a valid explicit date passes and lands in the record
        rec = bytes(
            wet_record_frame(df, warc_date="2026-08-15T10:00:00Z")
            .collect()[0]["wet_record"]
        )
        assert b"WARC-Date: 2026-08-15T10:00:00Z\r\n" in rec
