"""operators/corpus.py: Gopher repetition signals, cross-doc n-gram
duplication, paragraph dedup, deterministic sampling, mixture weights,
vocabulary — hand-computed fixtures plus a brute-force Python referee."""

import collections
import math
import random

import pytest
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.operators import corpus


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------- repetition signals


def test_repetition_signals_hand_computed(spark):
    rows = [
        (1, "a b\nc d\na b"),          # dup line
        (2, "x y x y x"),              # repeated bigram
        (3, None),                     # null text
        (4, "solo"),                   # single word, no bigrams
    ]
    out = {
        r["doc_id"]: r
        for r in corpus.repetition_signals(
            _df(spark, rows), top_ngram_sizes=(2,), dup_ngram_sizes=(2,)
        ).collect()
    }
    r1 = out[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == pytest.approx(1 / 3)
    assert r1["dup_line_char_frac"] == pytest.approx(3 / 9)
    r2 = out[2]
    # bigrams of [x y x y x]: "x y"x2, "y x"x2 -> best=2 for "x y" (lex-first)
    assert r2["top2gram_char_frac"] == pytest.approx(2 * 3 / 9)
    assert r2["dup2gram_char_frac"] == pytest.approx(1.0)  # every bigram duplicated
    r3 = out[3]
    assert r3["n_lines"] == 0
    assert r3["dup_line_frac"] == 0.0 and r3["top2gram_char_frac"] == 0.0
    r4 = out[4]
    assert r4["top2gram_char_frac"] == 0.0 and r4["dup2gram_char_frac"] == 0.0


def _py_signals(text, top_n, dup_n):
    """Brute-force referee (Counter-based) for one document."""
    text = text or ""
    words = text.split()

    def grams(n):
        return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]

    c = collections.Counter(grams(top_n))
    if c:
        best_g = min(
            (g for g in c if c[g] == max(c.values())),
        )
        top = c[best_g] * len(best_g) / len(text) if len(text) else 0.0
    else:
        top = 0.0
    cd = collections.Counter(grams(dup_n))
    tot = sum(len(g) * n for g, n in cd.items())
    dup = sum(len(g) * n for g, n in cd.items() if n > 1)
    return top, (dup / tot if tot else 0.0)


def test_repetition_signals_vs_bruteforce(spark):
    rng = random.Random(7)
    vocab = ["spark", "row", "data", "the", "batch", "join"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(40)
    ]
    out = corpus.repetition_signals(
        _df(spark, rows), top_ngram_sizes=(3,), dup_ngram_sizes=(5,)
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    for i, text in rows:
        top, dup = _py_signals(text, 3, 5)
        assert by_id[i]["top3gram_char_frac"] == pytest.approx(top), (i, text)
        assert by_id[i]["dup5gram_char_frac"] == pytest.approx(dup), (i, text)


# ------------------------------------------------------ cross-doc n-grams


def test_cross_doc_dup_ngram_stats(spark):
    shared = "one two three four five"
    rows = [
        (1, shared + " alpha beta"),
        (2, "zzz " + shared),
        (3, "totally different words here now indeed"),
        (4, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in corpus.cross_doc_dup_ngram_stats(_df(spark, rows), n=5).collect()
    }
    # doc1 has 3 distinct 5-grams, only "one two three four five" shared
    assert out[1]["n_grams"] == 3 and out[1]["n_dup_grams"] == 1
    assert out[1]["cross_dup_frac"] == pytest.approx(1 / 3)
    assert out[2]["n_dup_grams"] == 1
    assert out[3]["n_dup_grams"] == 0
    assert out[4]["n_grams"] == 0 and out[4]["cross_dup_frac"] == 0.0


# -------------------------------------------------------- paragraph dedup


def test_paragraph_dedup_keep_first_and_reassembly(spark):
    rows = [
        (1, "P1\n\nP2"),
        (2, "P2\n\nP3\n\nP1"),
        (3, "P1"),
        (4, "  \n\n "),  # only-whitespace paragraphs -> empty doc
    ]
    out = {
        r["doc_id"]: r for r in corpus.paragraph_dedup(_df(spark, rows)).collect()
    }
    assert out[1]["dedup_text"] == "P1\n\nP2" and out[1]["n_paras_kept"] == 2
    assert out[2]["dedup_text"] == "P3"  # P2, P1 first seen in doc 1
    assert out[2]["n_paras_orig"] == 3 and out[2]["n_paras_kept"] == 1
    assert out[3]["dedup_text"] == "" and out[3]["n_paras_kept"] == 0
    assert out[4]["dedup_text"] == "" and out[4]["n_paras_orig"] == 0


def test_paragraph_dedup_order_preserved(spark):
    rows = [(1, "B\n\nA\n\nC")]
    out = corpus.paragraph_dedup(_df(spark, rows)).collect()[0]
    assert out["dedup_text"] == "B\n\nA\n\nC"  # original order, not sorted


# -------------------------------------------------- deterministic sampling


def test_stratified_sample_deterministic_and_nested(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = corpus.hash_stratified_sample(docs, "lang", {"en": 0.5}, key_col="doc_id")
    tenth = corpus.hash_stratified_sample(docs, "lang", {"en": 0.1}, key_col="doc_id")
    ids_half = {r["doc_id"] for r in half.select("doc_id").collect()}
    ids_half2 = {r["doc_id"] for r in half.select("doc_id").collect()}
    ids_tenth = {r["doc_id"] for r in tenth.select("doc_id").collect()}
    assert ids_half == ids_half2  # same rows every run
    assert ids_tenth <= ids_half  # smaller fraction is a strict subset
    n_en = docs.filter(F.col("lang") == "en").count()
    if n_en >= 50:
        rate = len(ids_half) / n_en
        assert abs(rate - 0.5) < 0.2  # hash threshold converges to fraction


def test_stratum_threshold_hex_bounds():
    assert corpus.stratum_threshold_hex(0.0) == "00000000"
    assert corpus.stratum_threshold_hex(1.0) == "gggggggg"  # above all hex
    assert corpus.stratum_threshold_hex(0.5) == "80000000"
    assert corpus.stratum_threshold_hex(-3) == "00000000"
    assert corpus.stratum_threshold_hex(7) == "gggggggg"


# ------------------------------------------------ mixture weights / vocab


def test_mixture_weights_sqrt_temperature(spark):
    rows = [(i, "t") for i in range(9)] + [(9, "t")]
    df = spark.createDataFrame(
        [(i, "en" if i < 9 else "de") for i in range(10)], "doc_id long, lang string"
    )
    out = {r["lang"]: r for r in corpus.mixture_weights(df, "lang").collect()}
    s = math.sqrt(0.9) + math.sqrt(0.1)
    assert out["en"]["mix_weight"] == pytest.approx(math.sqrt(0.9) / s, abs=1e-6)
    assert out["de"]["mix_weight"] == pytest.approx(math.sqrt(0.1) / s, abs=1e-6)
    assert sum(r["mix_weight"] for r in out.values()) == pytest.approx(1.0, abs=1e-5)


def test_vocab_top_tokens_matches_counter(spark):
    rows = [(1, "b a a C c b a"), (2, "a B b")]
    out = corpus.vocab_top_tokens(_df(spark, rows), k=2).collect()
    # counts: a=4, b=4, c=2 -> top2 = a,b (tie broken by token asc)
    assert [(r["token"], r["cnt"]) for r in out] == [("a", 4), ("b", 4)]


# -------------------------------------------------------- sequence packing


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def test_pack_sequences_contiguous_stream(spark):
    rows = [(i, (i * 7) % 40) for i in range(30)]  # includes a 0-token doc
    out = corpus.pack_sequences(_tok_df(spark, rows), 16, nshards=4).collect()
    by_order = sorted(out, key=lambda r: (r["shard"], r["doc_id"]))
    pos = 0
    for r in by_order:
        assert r["tok_start"] == pos, r
        assert r["tok_end"] == pos + r["n_tok"]
        pos = r["tok_end"]
    assert pos == sum(n for _, n in rows)
    zero = [r for r in by_order if r["n_tok"] == 0]
    assert zero and all(r["seq_first"] is None and r["seq_last"] is None for r in zero)
    for r in by_order:
        if r["n_tok"] > 0:
            assert r["seq_first"] == r["tok_start"] // 16
            assert r["seq_last"] == (r["tok_end"] - 1) // 16


def test_pack_manifest_reconstructs_docs_and_fills_seqs(spark):
    rows = [(i, 5 + (i % 11)) for i in range(25)]
    L = 16
    man = corpus.pack_manifest(_tok_df(spark, rows), L, nshards=4).collect()
    # every doc's slices cover exactly its token count, in order
    per_doc = {}
    for r in man:
        per_doc.setdefault(r["doc_id"], []).append(r)
    total = sum(n for _, n in rows)
    for doc_id, slices in per_doc.items():
        n = dict(rows)[doc_id]
        slices.sort(key=lambda r: r["doc_tok_start"])
        assert sum(s["slice_len"] for s in slices) == n
        assert slices[0]["doc_tok_start"] == 0
        for a, b in zip(slices, slices[1:]):
            assert a["doc_tok_start"] + a["slice_len"] == b["doc_tok_start"]
    # every sequence except the last is exactly full, none overflows
    per_seq = {}
    for r in man:
        per_seq.setdefault(r["seq_id"], 0)
        per_seq[r["seq_id"]] += r["slice_len"]
        assert 0 <= r["offset_in_seq"] < L and r["slice_len"] >= 1
    last = max(per_seq)
    for sid, filled in per_seq.items():
        assert filled == (L if sid != last else total - last * L)


def test_pack_sequences_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError):
        corpus.pack_sequences(_tok_df(spark, [(1, 2)]), 0)


# ---------------------------------------------------------- decontamination


def test_benchmark_overlap_planted(spark):
    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),  # planted 5-gram hit
        (2, "completely unrelated text with no shared grams at all"),
        (3, "too short"),                                    # no 5-grams
        (4, None),
    ]
    eval_rows = [
        (100, "benchmark says the quick brown fox jumps high"),
        (101, "another eval doc entirely"),
    ]
    out = {
        r["doc_id"]: r
        for r in corpus.benchmark_overlap(
            _df(spark, corpus_rows), _df(spark, eval_rows), n=5
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # doc 1 shares exactly "the quick brown fox jumps" (one distinct 5-gram)
    r1 = out[1]
    assert r1["n_grams"] == 5 and r1["n_hit"] == 1 and r1["contaminated"]
    assert r1["contam_frac"] == pytest.approx(1 / 5)
    assert out[2]["n_hit"] == 0 and not out[2]["contaminated"]
    assert out[3]["n_grams"] == 0 and out[3]["contam_frac"] == 0.0
    assert out[4]["n_grams"] == 0 and not out[4]["contaminated"]


def test_benchmark_overlap_broadcasts_eval_side(spark):
    plan = corpus.benchmark_overlap(
        _df(spark, [(1, "a b c d e f")]), _df(spark, [(2, "a b c d e")]), n=5
    )._jdf.queryExecution().executedPlan().toString()
    # the eval gram set probes via a broadcast semi-join — the corpus is
    # never shuffled on gram (the join-back on doc_id may shuffle; that one
    # carries only per-doc hit counts, not gram rows)
    gram_join = [
        ln for ln in plan.splitlines() if "Join" in ln and "[gh#" in ln
    ]
    assert gram_join, plan
    assert all(
        "BroadcastHashJoin" in ln and "LeftSemi" in ln for ln in gram_join
    ), plan


# --------------------------------------------------------------- span dedup


def test_span_dedup_removes_later_copy(spark):
    shared = "one two three four five"
    rows = [
        (1, f"{shared} tail1 a b"),
        (2, f"head {shared} tail2"),        # contains the same 5-token window
        (3, "entirely distinct words here live calmly"),
    ]
    out = {
        r["doc_id"]: r for r in corpus.span_dedup(_df(spark, rows), w=5).collect()
    }
    r1 = out[1]
    # doc 1 is the first occurrence — untouched
    assert r1["n_dup_windows"] == 0 and r1["dedup_text"] == rows[0][1]
    r2 = out[2]
    # doc 2's window "one..five" (start 2) loses; its 5 tokens are removed
    assert r2["n_dup_windows"] == 1
    assert r2["dedup_text"] == "head tail2"
    assert r2["n_tok_orig"] == 7 and r2["n_tok_kept"] == 2
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["dedup_text"] == rows[2][1]


def test_span_dedup_within_doc_repeat_and_short_docs(spark):
    rows = [
        (1, "x y z x y z"),    # windows of 3: "x y z"(1), "y z x"(2), "z x y"(3), "x y z"(4) — start 4 loses
        (2, "too short"),      # < w tokens: no windows, passthrough
        (3, None),
    ]
    out = {
        r["doc_id"]: r for r in corpus.span_dedup(_df(spark, rows), w=3).collect()
    }
    r1 = out[1]
    assert r1["n_dup_windows"] == 1
    assert r1["dedup_text"] == "x y z"      # positions 4-6 removed
    assert out[2]["dedup_text"] == "too short" and out[2]["n_dup_windows"] == 0
    assert out[3]["n_tok_orig"] == 0 and out[3]["dedup_text"] == ""


def test_span_dedup_rejects_bad_w(spark):
    with pytest.raises(ValueError):
        corpus.span_dedup(_df(spark, [(1, "a b")]), w=1)
