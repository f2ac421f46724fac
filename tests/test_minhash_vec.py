"""Bit-parity of the Arrow MinHash signature pass (functions/minhash_vec)
against the definitional Catalyst chain — the metrics_vec discipline
applied to the round-15 signature fast path: the vectorized module must
FOLLOW the Catalyst semantics, never lead, because every signature value
backs DuckDB-oracle-refereed queries (d03/d08/d17-d28,
ev_stream_near_stored)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions import hashing
from llm_pretraining_data_pipeline_spark.operators import dedup


TRICKY_ROWS = [
    ("plain", "one two three four five"),
    ("single_token", "one"),
    ("two_tokens", "one two"),
    ("empty", ""),
    ("null", None),
    ("ws_only", " \t\n  "),
    ("file_seps", "a\x1cb\x1dc\x1ee\x1ff"),
    ("unicode_ws", "ideographic　space nbsp joined en quad"),
    ("zero_width", "zero​width is not whitespace"),
    ("cjk", "日本語 トークン 分割 テスト 文書"),
    ("accents", "héllo wörld çödé pôints über"),
    ("long", "tok " * 300),
    ("leading_ws", "   padded    with   runs   of space "),
    ("emoji", "🎉 party 🎈 tokens 🎂 here"),
]


def _sigs(df, **kw):
    return {
        r["id"]: r["sig"]
        for r in dedup._minhash_sig_frame(df, "text", id_col="doc_id", **kw)
        .collect()
    }


@pytest.mark.parametrize(
    "num_hashes,seed,shingle_size", [(32, 42, 3), (16, 7, 2), (8, 42, 5)]
)
def test_arrow_matches_catalyst_on_tricky_fixture(
    spark, num_hashes, seed, shingle_size
):
    df = spark.createDataFrame(TRICKY_ROWS, ["doc_id", "text"])
    kw = dict(num_hashes=num_hashes, seed=seed, shingle_size=shingle_size)
    vec = _sigs(df, vectorized=True, **kw)
    cat = _sigs(df, vectorized=False, **kw)
    assert vec == cat
    # shingle-less rows are filtered by BOTH paths (sentinel contract)
    assert {"empty", "null", "ws_only"}.isdisjoint(vec)


def test_arrow_matches_catalyst_on_testdata(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vec = _sigs(docs, vectorized=True)
    cat = _sigs(docs, vectorized=False)
    assert vec == cat and len(vec) > 0


def test_band_keys_unroll_matches_hof(spark):
    """The unrolled ``_band_keys`` (GetArrayItem + concat_ws, round 15)
    must emit exactly what the former transform/slice lambda emitted."""
    df = spark.createDataFrame(TRICKY_ROWS, ["doc_id", "text"])
    sigs = dedup._minhash_sig_frame(df, "text", id_col="doc_id")
    rows_per_band = 32 // 8
    hof = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.concat_ws(
                "-",
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string"),
                ),
            ).alias("band_sig"),
        ),
    )
    out = sigs.select(
        "id",
        dedup._band_keys(F.col("sig"), 8, rows_per_band).alias("unrolled"),
        hof.alias("reference"),
    ).collect()
    assert out and all(r["unrolled"] == r["reference"] for r in out)


def test_sig_match_count_matches_manual(spark):
    """_sig_match_count == the per-lane equality count, incl. 0 and all."""
    rows = [
        ([1, 2, 3, 4], [1, 2, 3, 4], 4),
        ([1, 2, 3, 4], [9, 2, 9, 4], 2),
        ([1, 2, 3, 4], [9, 9, 9, 9], 0),
    ]
    df = spark.createDataFrame(
        [(a, b) for a, b, _ in rows], ["sig_a", "sig_b"]
    )
    got = [
        r["m"]
        for r in df.select(
            dedup._sig_match_count(F.col("sig_a"), F.col("sig_b"), 4).alias("m")
        ).collect()
    ]
    assert got == [m for _, _, m in rows]


@pytest.mark.parametrize("n", [1, 3, 5])
def test_ngram_h64_arrow_matches_catalyst(spark, n):
    """ngram_h64_frame_arrow == explode(ngrams(ws_tokens(coalesce(text,
    ''))))+h64 — incl. the empty-list (NOT whole-text) short-doc rule."""
    from llm_pretraining_data_pipeline_spark.functions import minhash_vec
    from llm_pretraining_data_pipeline_spark.functions.hashing import h64
    from llm_pretraining_data_pipeline_spark.functions.text_norm import ws_tokens
    from llm_pretraining_data_pipeline_spark.operators.corpus import ngrams

    df = spark.createDataFrame(TRICKY_ROWS, ["doc_id", "text"])
    vec = sorted(
        (r["doc_id"], r["gh"])
        for r in minhash_vec.ngram_h64_frame_arrow(
            df, "text", n, keep=("doc_id",)
        )
        .select("doc_id", F.explode("gh").alias("gh"))
        .collect()
    )
    toks = ws_tokens(F.coalesce(F.col("text"), F.lit("")))
    cat = sorted(
        (r["doc_id"], r["gh"])
        for r in df.select(
            "doc_id", F.explode(ngrams(toks, n)).alias("gram")
        )
        .select("doc_id", h64(F.col("gram")).alias("gh"))
        .collect()
    )
    assert vec == cat and len(vec) > 0


def test_sentinel_unreachable_for_nonempty_docs(spark):
    """A one-token doc must NOT collide with the fold sentinel."""
    df = spark.createDataFrame([("x", "token")], ["doc_id", "text"])
    sig = _sigs(df, vectorized=True)["x"]
    assert sig[0] != hashing.MERSENNE_31
