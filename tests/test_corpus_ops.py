

_SENT = (
    "the alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu of green house"
)


class TestGopherQualityFilter:
    """Each Gopher A1 rule tripped by an engineered doc; first-match-wins."""

    def test_every_rule_fires(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            gopher_quality_filter,
        )

        # 60 DISTINCT words (no repeated n-grams), 3 distinct stopwords
        filler = _SENT + (
            " that quick brown foxes jump over lazy dogs near riverbank "
            "meadow forest mountain valley ocean desert prairie tundra glacier "
            "canyon plateau island peninsula harbor lagoon estuary wetland "
            "grove orchard vineyard pasture"
        )
        docs = [
            (0, filler),                                        # kept
            (1, "too short"),                                   # word_count
            (2, "ab " * 60),                                    # mean_word_length (2.0)
            (3, ("the of #tag " * 20)),                         # symbol_ratio (20/60)
            (4, "\n".join(["* the bullet point of it"] * 20)),  # bullet_ellipsis
            (5, filler.replace("fox", "1234")),                 # alpha_words? no — most words alpha
            (6, "zzz yyy xxx www vvv uuu ttt sss rrr qqq " * 5),  # stopwords (0 distinct)
            (7, "\n".join(["the dup line of text here ok"] * 10) + "\n" + filler),  # dup_lines
            (8, "the of " + "spam ham " * 30),                  # top_ngram (top2 covers most chars)
            (9, _SENT + " " + _SENT),                           # dup_ngram (every 10-gram twice, no hot bigram)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {
            r.doc_id: r.gopher_drop_reason
            for r in gopher_quality_filter(df, min_words=10).collect()
        }
        assert out[0] is None
        assert out[1] == "gopher_word_count"
        assert out[2] == "gopher_mean_word_length"
        assert out[3] == "gopher_symbol_ratio"
        assert out[4] == "gopher_bullet_ellipsis"
        assert out[6] == "gopher_stopwords"
        assert out[7] == "gopher_dup_lines"
        assert out[8] == "gopher_top_ngram"
        assert out[9] == "gopher_dup_ngram"

    def test_alpha_word_rule(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            gopher_quality_filter,
        )

        # 12 words, 5 numeric -> alpha frac 7/12 < 0.8; stopwords present;
        # 4-char numbers keep mean word length above the 3.0 floor
        doc = "the of 1111 2222 3333 4444 5555 and have that whiskey november"
        df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
        row = gopher_quality_filter(df, min_words=5).collect()[0]
        assert row.gopher_drop_reason == "gopher_alpha_words"

    def test_first_match_wins(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            gopher_quality_filter,
        )

        # trips BOTH word_count (short) and stopwords (none) -> earlier wins
        df = spark.createDataFrame([(0, "zz yy")], "doc_id long, text string")
        row = gopher_quality_filter(df).collect()[0]
        assert row.gopher_drop_reason == "gopher_word_count"


class TestTfIdfTopTerms:
    def test_rare_term_beats_common(self, spark):
        import math

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            tfidf_top_terms,
        )

        docs = [
            (1, "common common common zebra"),
            (2, "common words here"),
            (3, "common words there"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {(r.doc_id, r.rank): (r.term, r.tfidf) for r in tfidf_top_terms(df, k=2).collect()}
        # 'zebra' (df=1) outranks 'common' (df=3) in doc 1 despite tf 1 vs 3:
        # 1*(ln(4/2)+1) = 1.693 vs 3*(ln(4/4)+1) = 3.0 — no wait, tf wins here;
        # assert the actual smoothed-formula values instead of folklore
        zebra = 1.0 * (math.log(4.0 / 2.0) + 1.0)
        common = 3.0 * (math.log(4.0 / 4.0) + 1.0)
        assert out[(1, 1)] == ("common", round(common, 6))
        assert out[(1, 2)] == ("zebra", round(zebra, 6))

    def test_rank_is_deterministic_on_ties(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            tfidf_top_terms,
        )

        df = spark.createDataFrame([(1, "bb aa")], "doc_id long, text string")
        rows = sorted(tfidf_top_terms(df, k=2).collect(), key=lambda r: r.rank)
        # equal scores -> lexicographic term order breaks the tie
        assert [r.term for r in rows] == ["aa", "bb"]


class TestGopherUnicodeEllipsis:
    def test_typographic_ellipsis_counts(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            gopher_quality_filter,
        )

        # short lines: 12 ellipses over 60 words -> symbol ratio 0.2 > 0.1
        # (proves U+2026 is counted at all; the ASCII-only regression would
        # score 0 and keep the doc)
        doc = "\n".join(["the story of it continues…"] * 12)
        df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
        row = gopher_quality_filter(df, min_words=10).collect()[0]
        assert row.gopher_drop_reason == "gopher_symbol_ratio"

        # longer lines: 12 ellipses over 144 words -> symbol ratio 0.083
        # passes, but every line ends with U+2026 -> ellipsis_frac 1.0 > 0.3
        line = "the story of it that we have told here simply continues on…"
        doc2 = "\n".join([line] * 12)
        df2 = spark.createDataFrame([(1, doc2)], "doc_id long, text string")
        row2 = gopher_quality_filter(df2, min_words=10).collect()[0]
        assert row2.gopher_drop_reason == "gopher_bullet_ellipsis"


class TestChunkSpans:
    def test_overlap_clip_and_coverage(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import chunk_spans

        words = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame(
            [(1, words), (2, "a b"), (3, ""), (4, None)],
            "doc_id long, text string",
        )
        out = chunk_spans(df, chunk_tokens=6, stride=4)
        rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_id))
        d1 = [r for r in rows if r.doc_id == 1]
        # n=10, chunk=6, stride=4 -> starts 0,4,8; start 8 adds tokens 10>9? 
        # 8 + (6-4) = 10 >= 10 -> dropped; [0,6) and [4,10) cover everything
        assert [(r.start_tok, r.end_tok) for r in d1] == [(0, 6), (4, 10)]
        assert d1[0].chunk_text == "w0 w1 w2 w3 w4 w5"
        assert d1[1].chunk_text == "w4 w5 w6 w7 w8 w9"
        # short doc: single clipped window
        d2 = [r for r in rows if r.doc_id == 2]
        assert [(r.start_tok, r.end_tok) for r in d2] == [(0, 2)]
        # empty and null docs produce no chunks
        assert not [r for r in rows if r.doc_id in (3, 4)]

    def test_invalid_stride_raises(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.operators.corpus import chunk_spans

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_spans(df, chunk_tokens=4, stride=0)
        with pytest.raises(ValueError):
            chunk_spans(df, chunk_tokens=4, stride=5)


class TestRecipeOps:
    def test_median_gate_odd_and_even_groups(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            group_median_gate,
        )

        rows = [
            (1, "a", 10), (2, "a", 20), (3, "a", 30),          # odd: median 20
            (4, "b", 10), (5, "b", 20), (6, "b", 30), (7, "b", 40),  # even: LOWER median 20
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, v long")
        out = {r.doc_id: r for r in group_median_gate(df, "v").collect()}
        assert out[1].group_median == 20 and out[1].below_median
        assert out[2].group_median == 20 and not out[2].below_median  # at median: kept
        assert out[4].group_median == 20 and out[4].below_median
        assert out[5].group_median == 20 and not out[5].below_median

    def test_quota_topn_with_ties(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            group_quota_topn,
        )

        rows = [(1, "a", 5), (2, "a", 5), (3, "a", 9), (4, "b", 1)]
        df = spark.createDataFrame(rows, "doc_id long, source string, v long")
        out = sorted(
            group_quota_topn(df, "v", n=2).collect(),
            key=lambda r: (r.source, r.group_rank),
        )
        # desc value, id tiebreak: a -> [9(doc3), 5(doc1)]; b -> [1(doc4)]
        assert [(r.doc_id, r.group_rank) for r in out] == [(3, 1), (1, 2), (4, 1)]

    def test_token_budget_up_and_downsample(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            token_budget_allocation,
        )

        # two sources, 90/10 token split, budget 100 -> sqrt weights 0.75/0.25
        rows = [("big", 90), ("small", 10)]
        df = spark.createDataFrame(rows, "source string, n_tok long")
        out = {r.source: r for r in token_budget_allocation(df, "n_tok", total_budget=100).collect()}
        assert out["big"].available == 90 and out["small"].available == 10
        assert abs(out["big"].budget_weight - 0.75) < 1e-6
        assert out["big"].target_tokens == 75 and out["small"].target_tokens == 25
        # big: 75/90 -> downsample rate, 1 epoch; small: 25/10 -> rate 1, 3 epochs
        assert out["big"].sampling_rate == round(75 / 90, 6) and out["big"].epochs == 1
        assert out["small"].sampling_rate == 1.0 and out["small"].epochs == 3


class TestRecipeOpsPlans:
    def test_median_gate_single_window_no_join(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            group_median_gate,
        )

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20)], "doc_id long, source string, v long"
        )
        plan = (
            group_median_gate(df, "v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # one shared group-key shuffle, no self-join back onto the corpus
        assert "Join" not in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan

    def test_token_budget_weights_partitioning_independent(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            token_budget_allocation,
        )

        rows = [(f"s{i}", 100 + 37 * i) for i in range(12)]
        df = spark.createDataFrame(rows, "source string, n_tok long")
        a = sorted(token_budget_allocation(df.repartition(1), "n_tok").collect())
        b = sorted(token_budget_allocation(df.repartition(7), "n_tok").collect())
        assert a == b


class TestC4Battery:
    """C4 cleanup (Raffel et al. 2020 §2.2): line retention rules, page
    cascade order, and three-sentence span dedup semantics."""

    def _clean(self, spark, text):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_quality_filter,
        )

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return c4_quality_filter(df).collect()[0]

    def test_line_rules(self, spark):
        r = self._clean(
            spark,
            "Good line with five words here.\n"
            "short line.\n"                             # <5 words
            "No terminal punct on this line\n"          # no terminal punct
            "Please enable JavaScript to continue viewing.\n"  # javascript
            'A quoted line with enough words ends right."\n'   # quote counts
            "Another proper sentence with enough words!",
        )
        assert r.n_lines == 6
        assert r.n_lines_kept == 3
        kept = r.text_c4.split("\n")
        assert kept[0].startswith("Good line")
        assert kept[1].startswith("A quoted")
        assert kept[2].startswith("Another proper")

    def test_cascade_order_first_match_wins(self, spark):
        # bad word fires before lorem ipsum / curly brace when both present
        r = self._clean(
            spark,
            "This line contains badword1 and lorem ipsum now.\n"
            "Second ordinary sentence fills the page nicely.\n"
            "Third ordinary sentence completes the minimum count.",
        )
        assert r.c4_drop_reason == "c4_bad_word"
        # fewer than 3 sentences beats everything
        r2 = self._clean(spark, "Only sentence with badword1 right here now.")
        assert r2.c4_drop_reason == "c4_min_sentences"

    def test_clean_page_kept(self, spark):
        r = self._clean(
            spark,
            "First ordinary sentence sits right here.\n"
            "Second ordinary sentence follows along nicely.\n"
            "Third ordinary sentence completes the page properly.",
        )
        assert r.c4_drop_reason is None
        assert r.n_lines_kept == 3

    def test_span_dedup_keep_first_and_rebuild(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_span_dedup,
        )

        df = spark.createDataFrame(
            [
                (1, "A one. B two. C three. D four."),
                (2, "X ex. B two. C three. D four. Y why."),  # shares B,C,D
                (3, "Short only. Two here."),                  # <3 sents
                (4, "A one. B two. C three. D four."),         # full dup
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in c4_span_dedup(df).collect()}
        assert out[1].n_sents_removed == 0
        assert out[1].text_dedup == "A one. B two. C three. D four."
        assert out[2].n_sents_removed == 3
        assert out[2].text_dedup == "X ex. Y why."
        assert out[3].n_sents_removed == 0  # no 3-sentence span exists
        assert out[4].n_sents_removed == 4
        assert out[4].text_dedup == ""

    def test_span_dedup_two_sentence_doc_has_no_spans(self, spark):
        # sequence(0, n-3) DESCENDS for n<3 — the guard must yield zero
        # spans, not a bogus descending index list
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_span_dedup,
        )

        df = spark.createDataFrame(
            [(1, "Only two. Sentences here."), (2, "Only two. Sentences here.")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in c4_span_dedup(df).collect()}
        # identical 2-sentence docs are NOT span-deduped (no 3-spans exist)
        assert out[1].n_sents_removed == 0 and out[2].n_sents_removed == 0

    def test_newline_separated_sentences_count(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            split_sentences,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("One here.\nTwo there.\nThree somewhere.",)], "t string"
        )
        n = df.select(F.size(split_sentences(F.col("t"))).alias("n")).collect()[0].n
        assert n == 3


class TestWeightedSampleAndOverlap:
    def test_weighted_sample_extremes_and_monotonicity(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            weighted_sample,
        )
        from pyspark.sql import functions as F

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        assert weighted_sample(df, F.lit(0.0)).count() == 0
        assert weighted_sample(df, F.lit(1.0)).count() == 2000
        # clamp: weights beyond [0,1] saturate
        assert weighted_sample(df, F.lit(7.5)).count() == 2000
        assert weighted_sample(df, F.lit(-2.0)).count() == 0
        # rate roughly tracks p (hash-uniformity at n=2000)
        half = weighted_sample(df, F.lit(0.5)).count()
        assert 850 < half < 1150
        # larger scale keeps a strict superset of the smaller one's rows
        small = {r.doc_id for r in weighted_sample(df, F.lit(0.3)).collect()}
        big = {r.doc_id for r in weighted_sample(df, F.lit(0.6)).collect()}
        assert small <= big

    def test_weighted_sample_partitioning_independent(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            weighted_sample,
        )
        from pyspark.sql import functions as F

        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        w = (F.col("doc_id") % 10).cast("double") / 10.0
        a = {r.doc_id for r in weighted_sample(df.repartition(1), w).collect()}
        b = {r.doc_id for r in weighted_sample(df.repartition(13), w).collect()}
        assert a == b and a  # nonempty and identical

    def test_source_overlap_known_jaccard(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            source_overlap,
        )

        # srcA grams: {a b c, b c d}; srcB: {b c d, c d e}; srcC: {x y z}
        df = spark.createDataFrame(
            [
                (1, "A", "a b c d"),
                (2, "B", "b c d e"),
                (3, "C", "x y z"),
            ],
            "doc_id long, source string, text string",
        )
        rows = {(r.s1, r.s2): r for r in source_overlap(df, group_col="source").collect()}
        ab = rows[("A", "B")]
        assert ab.inter == 1 and ab.union_cnt == 3
        assert abs(ab.jaccard - round(1 / 3, 6)) < 1e-9
        # disjoint pairs produce no row at all (inner semantics: only
        # pairs sharing >= 1 gram appear)
        assert ("A", "C") not in rows and ("B", "C") not in rows


class TestRefinedWebLineCorrect:
    def _run(self, spark, text):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            refinedweb_line_correct,
        )

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return refinedweb_line_correct(df).collect()[0]

    def test_each_line_rule(self, spark):
        r = self._run(
            spark,
            "A normal line of prose survives intact.\n"
            "THIS IS ALL SHOUTING LOUDLY\n"       # mostly uppercase
            "1234 5678\n"                          # no letters
            "3 likes\n"                            # counter
            "12 comments\n"                        # counter (plural)
            "Read More\n"                          # button artifact
            "Another normal line stays put.",
        )
        assert r.n_lines == 7 and r.n_lines_removed == 5
        assert r.text_rw.split("\n") == [
            "A normal line of prose survives intact.",
            "Another normal line stays put.",
        ]
        assert r.rw_drop_reason == "rw_excess_line_removal"

    def test_clean_doc_untouched(self, spark):
        r = self._run(
            spark,
            "First ordinary line of text.\nSecond ordinary line of text.",
        )
        assert r.n_lines_removed == 0 and r.rw_drop_reason is None

    def test_uppercase_threshold_boundary(self, spark):
        # exactly at 60% uppercase letters is NOT removed (> is strict)
        r = self._run(spark, "ABC de")  # 3 upper of 5 letters = 60%
        assert r.n_lines_removed == 0
        r2 = self._run(spark, "ABCD e")  # 4 of 5 = 80% -> removed, doc drops
        assert r2.n_lines_removed == 1
        assert r2.rw_drop_reason == "rw_excess_line_removal"


class TestCorpusDiff:
    def test_all_four_statuses(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import corpus_diff

        old = spark.createDataFrame(
            [(1, "alpha"), (2, "bravo"), (3, "charlie")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "alpha"), (2, "bravo EDITED"), (4, "delta")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in corpus_diff(old, new).collect()}
        assert out[1].status == "unchanged"
        assert out[2].status == "changed"
        assert out[2].old_hash != out[2].new_hash
        assert out[3].status == "removed" and out[3].new_hash is None
        assert out[4].status == "added" and out[4].old_hash is None

    def test_diff_join_is_narrow(self, spark, sf_dir):
        # text must never enter the join exchange — only (id, hash)
        from llm_pretraining_data_pipeline_spark.operators.corpus import corpus_diff

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = corpus_diff(docs, docs)._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(text" not in plan
        assert "FullOuter" in plan


class TestRepetitionSignalsGrouped:
    def test_bit_parity_with_hof_variant(self, spark, sf_dir):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            repetition_signals,
            repetition_signals_grouped,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
        a = repetition_signals(docs).orderBy("doc_id").collect()
        b = repetition_signals_grouped(docs).orderBy("doc_id").collect()
        assert a == b

    def test_bit_parity_on_edges(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            repetition_signals,
            repetition_signals_grouped,
        )

        edge = spark.createDataFrame(
            [
                (1, ""),
                (2, "word"),
                (3, "a b a b a b a b a b"),   # tie-heavy counts
                (4, None),
                (5, "x\nx\nx\ny"),            # duplicate lines
                (6, "one two three four five six seven eight nine ten eleven"),
            ],
            "doc_id long, text string",
        )
        a = repetition_signals(edge).orderBy("doc_id").collect()
        b = repetition_signals_grouped(edge).orderBy("doc_id").collect()
        assert a == b


class TestC4SpanDedupProperties:
    def test_idempotent_and_unique_corpus_untouched(self, spark):
        """Properties: (1) a corpus with all-unique sentences passes through
        unchanged (modulo separator normalisation); (2) running span dedup
        on its own output removes nothing further (idempotence)."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_span_dedup,
        )

        uniq = spark.createDataFrame(
            [
                (i, " ".join(f"Sentence number {i * 10 + k} stands alone." for k in range(4)))
                for i in range(20)
            ],
            "doc_id long, text string",
        )
        out1 = c4_span_dedup(uniq)
        assert out1.filter("n_sents_removed > 0").count() == 0
        r = {x.doc_id: x.text_dedup for x in out1.collect()}
        assert r[3] == uniq.collect()[0].text.__class__(  # same text, doc 3
            " ".join(f"Sentence number {3 * 10 + k} stands alone." for k in range(4))
        )

        # idempotence on a corpus WITH duplicates
        pool = spark.createDataFrame(
            [
                (i, " ".join(
                    f"Shared sentence {(i * 3 + k) % 7} ends here." for k in range(5)
                ))
                for i in range(30)
            ],
            "doc_id long, text string",
        )
        from pyspark.sql import functions as F

        once = c4_span_dedup(pool).select(
            "doc_id", F.col("text_dedup").alias("text")
        )
        twice = c4_span_dedup(once)
        assert twice.filter("n_sents_removed > 0").count() == 0
        a = {r.doc_id: r.text_dedup for r in twice.collect()}
        b = {r.doc_id: r.text for r in once.collect()}
        assert a == b


class TestReviewRound6Fixes:
    def test_badword_adjacent_punctuation_drops(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_page_filter,
        )

        df = spark.createDataFrame(
            [
                (1, "He said badword1. Second sentence sits here. Third one too."),
                (2, 'Quoted "badword2" appears. Second sentence sits here. Third one too.'),
                (3, "Substring notbadword1x is fine. Second sentence here. Third one too."),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r.c4_drop_reason for r in c4_page_filter(df, text_col="text").collect()}
        assert out[1] == "c4_bad_word"
        assert out[2] == "c4_bad_word"
        assert out[3] is None  # stripping punctuation never substring-matches

    def test_empty_badword_list_disables_rule(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_page_filter,
        )

        df = spark.createDataFrame(
            [(1, "Contains badword1 right here. Second sentence. Third sentence.")],
            "doc_id long, text string",
        )
        r = c4_page_filter(df, text_col="text", badwords=[]).collect()[0]
        assert r.c4_drop_reason is None


class TestHashSplit:
    def test_rates_determinism_and_monotone_boundary(self, spark):
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.operators.corpus import hash_split

        df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
        counts = {
            r.split: r.cnt
            for r in hash_split(df).groupBy("split").agg(
                F.count(F.lit(1)).alias("cnt")
            ).collect()
        }
        assert set(counts) == {"train", "val", "test"}
        assert 15200 < counts["train"] < 16800  # ~80%
        assert 1700 < counts["val"] < 2300
        assert 1700 < counts["test"] < 2300
        # partitioning-independent
        a = {r.doc_id: r.split for r in hash_split(df.repartition(1)).collect()}
        b = {r.doc_id: r.split for r in hash_split(df.repartition(13)).collect()}
        assert a == b
        # shrinking val only moves val rows to test — train never leaks
        c = {r.doc_id: r.split for r in hash_split(df, fractions=(0.8, 0.05, 0.15)).collect()}
        transitions = {(a[k], c[k]) for k in a if a[k] != c[k]}
        assert transitions == {("val", "test")}

    def test_validation(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.operators.corpus import hash_split

        df = spark.range(3).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError, match="sum to 1.0"):
            hash_split(df, fractions=(0.5, 0.2), names=("a", "b"))
        with pytest.raises(ValueError, match="align"):
            hash_split(df, fractions=(0.5, 0.5), names=("a", "b", "c"))


class TestLineFilterProperties:
    def test_kept_lines_are_an_ordered_subset(self, spark):
        """Property (hypothesis corpus, one Spark job): every line of
        c4_clean_lines' / refinedweb_line_correct's output text appears in
        the input, in order — the filters only ever REMOVE lines."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_clean_lines,
            refinedweb_line_correct,
        )

        word = st.from_regex(r"[A-Za-z]{1,8}", fullmatch=True)
        line = st.builds(
            lambda ws, tail: " ".join(ws) + tail,
            st.lists(word, min_size=1, max_size=8),
            st.sampled_from([".", "!", "", " ?", "..."]),
        )
        doc = st.lists(line, min_size=0, max_size=6).map("\n".join)

        docs = []

        @settings(max_examples=50, deadline=None,
                  suppress_health_check=list(HealthCheck))
        @given(doc)
        def collect(d):
            docs.append(d)

        collect()
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
        )
        for out_col, fn in (
            ("text_c4", lambda f: c4_clean_lines(f)),
            ("text_rw", lambda f: refinedweb_line_correct(f)),
        ):
            rows = fn(df).select("doc_id", "text", out_col).collect()
            for r in rows:
                src = [l.strip() for l in r.text.split("\n") if l.strip()]
                kept = [l for l in r[out_col].split("\n") if l]
                it = iter(src)
                for k in kept:
                    assert any(k == s for s in it), (r.text, kept)


class TestAdviceR6Fixes:
    def test_sampling_draws_are_decorrelated(self, spark):
        """ADVICE r6 (medium): weighted_sample, hash_split and
        hash_stratified_sample salt their sha256 draws per operator, so
        composing them on the SAME key keeps independent decisions. An
        unsalted shared draw would put EVERY p=0.5 sample survivor into
        hash_split's 'train' bucket (both test draw < threshold on the
        same hash), silently emptying val/test."""
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            hash_split,
            hash_stratified_sample,
            weighted_sample,
        )

        df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
        sampled = weighted_sample(df, F.lit(0.5))
        n = sampled.count()
        assert 9000 < n < 11000
        counts = {
            r.split: r.cnt
            for r in hash_split(sampled)
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        # all three splits populated at ~their fractions among survivors
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / n - 0.8) < 0.03
        assert abs(counts["val"] / n - 0.1) < 0.02
        assert abs(counts["test"] / n - 0.1) < 0.02
        # stratified sample is decorrelated from the weighted draw too
        strat = hash_stratified_sample(
            sampled.withColumn("lang", F.lit("en")), "lang", {"en": 0.5}
        )
        m = strat.count()
        assert abs(m / n - 0.5) < 0.03

    def test_salt_parameter_pins_legacy_unsalted_draw(self, spark):
        """ADVICE r7 (low): the r7 salting silently changed which rows
        every existing pipeline keeps/splits. Each sampler now takes a
        ``salt`` parameter; ``salt=""`` reproduces the pre-r7 unsalted
        sha256(key) draw exactly, so persisted legacy assignments can be
        pinned. Verified two ways: (a) hash_split(salt="") matches a
        hashlib recomputation of the legacy rule row-for-row, and (b) the
        legacy correlation pathology reappears under salt="" — every
        weighted_sample(p=0.5) survivor lands in 'train'."""
        import hashlib

        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            hash_split,
            weighted_sample,
        )

        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        legacy = {
            r.doc_id: r.split for r in hash_split(df, salt="").collect()
        }

        def expected(key: int) -> str:
            d = hashlib.sha256(str(key).encode()).hexdigest()[:8]
            if d < format(int(0.8 * 2**32), "08x"):
                return "train"
            if d < format(int(0.9 * 2**32), "08x"):
                return "val"
            return "test"

        assert legacy == {k: expected(k) for k in range(2000)}
        # (b) the correlation the salts were introduced to break
        survivors = weighted_sample(df, F.lit(0.5), salt="")
        splits = {
            r.split
            for r in hash_split(survivors, salt="").select("split").collect()
        }
        assert splits == {"train"}
        # and the salted default on the same data does NOT collapse
        splits_salted = {
            r.split
            for r in hash_split(weighted_sample(df, F.lit(0.5)))
            .select("split").collect()
        }
        assert splits_salted == {"train", "val", "test"}

    def test_split_sentences_vertical_tab_is_not_a_boundary(self, spark):
        """ADVICE r6: Java \\s includes \\x0B but RE2's does not — the
        boundary uses the explicit class [ \\t\\n\\r\\f] on both engines,
        so '.\\x0B' never splits (and never diverges from the oracle)."""
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            split_sentences,
        )

        df = spark.createDataFrame(
            [(1, "One.\x0bTwo."), (2, "One.\nTwo."), (3, "One.\tTwo.")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r.s
            for r in df.select(
                "doc_id", F.size(split_sentences(F.col("text"))).alias("s")
            ).collect()
        }
        assert rows[1] == 1  # \x0B: NOT a boundary
        assert rows[2] == 2 and rows[3] == 2

    def test_span_identity_does_not_collapse_distinct_triples(self, spark):
        """ADVICE r6: span identity joins member sentences with \\x01 (a
        char split_sentences always consumes), so distinct sentence triples
        whose space-joined text coincides are NOT treated as the same span."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            c4_span_dedup,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta. gamma. delta."), (2, "alpha. beta gamma. delta.")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in c4_span_dedup(df).collect()}
        assert out[1].n_sents_removed == 0
        assert out[2].n_sents_removed == 0
        # a REAL duplicate triple still dedups corpus-wide
        dup = spark.createDataFrame(
            [(1, "alpha beta. gamma. delta."), (2, "alpha beta. gamma. delta.")],
            "doc_id long, text string",
        )
        d = {r.doc_id: r for r in c4_span_dedup(dup).collect()}
        assert d[1].n_sents_removed == 0 and d[2].n_sents_removed == 3


class TestExactSubstrDedup:
    def test_stitches_maximal_runs_at_unaligned_offsets(self, spark):
        """A 15-token passage shared by two docs at DIFFERENT offsets is
        found (k=10 < 15) and stitched into ONE maximal 15-token run in
        the later doc; the first occurrence is untouched."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            exact_substr_dedup,
        )

        passage = " ".join(f"p{i}" for i in range(15))
        a_tail = " ".join(f"a{i}" for i in range(8))
        b_head = " ".join(f"b{i}" for i in range(11))
        df = spark.createDataFrame(
            [(1, passage + " " + a_tail), (2, b_head + " " + passage)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in exact_substr_dedup(df, min_tokens=10).collect()}
        assert out[1].n_dup_runs == 0
        assert out[1].dedup_text == passage + " " + a_tail
        assert out[2].n_dup_runs == 1
        assert out[2].max_run_tokens == 15  # six shingles fused into one run
        assert out[2].dedup_text == b_head
        assert out[2].n_tok_kept == 11 and out[2].n_tok_orig == 26

    def test_unique_corpus_identity(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            exact_substr_dedup,
        )

        df = spark.createDataFrame(
            [
                (i, " ".join(f"w{i}_{j}" for j in range(25)))
                for i in range(20)
            ],
            "doc_id long, text string",
        )
        out = exact_substr_dedup(df, min_tokens=10).collect()
        assert all(r.n_dup_runs == 0 for r in out)
        assert all(r.n_tok_kept == r.n_tok_orig == 25 for r in out)

    def test_idempotent(self, spark):
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            exact_substr_dedup,
        )

        shared = " ".join(f"s{j % 6}" for j in range(30))  # self-repetitive
        df = spark.createDataFrame(
            [(i, shared + " " + " ".join(f"t{i}_{j}" for j in range(10)))
             for i in range(12)],
            "doc_id long, text string",
        )
        once = exact_substr_dedup(df, min_tokens=10).select(
            "doc_id", F.col("dedup_text").alias("text")
        )
        twice = exact_substr_dedup(once, min_tokens=10)
        assert twice.filter("n_dup_runs > 0").count() == 0
        a = {r.doc_id: r.dedup_text for r in twice.collect()}
        b = {r.doc_id: r.text for r in once.collect()}
        assert a == b

    def test_short_docs_and_validation(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            exact_substr_dedup,
        )

        df = spark.createDataFrame(
            [(1, "too short"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in exact_substr_dedup(df, min_tokens=10).collect()}
        assert out[1].dedup_text == "too short" and out[1].n_dup_runs == 0
        assert out[2].n_tok_orig == 0 and out[3].n_tok_orig == 0
        with pytest.raises(ValueError, match=">= 2"):
            exact_substr_dedup(df, min_tokens=1)


class TestReadabilityAndZipf:
    def test_flesch_hand_computed(self, spark):
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.functions import metrics
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            split_sentences,
        )

        # "the cat sat. it sat there." -> 6 words, 2 sentences,
        # syllables: the(1) cat(1) sat(1) it(1) sat(1) there(2) = 7
        df = spark.createDataFrame(
            [(1, "the cat sat. it sat there."), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        n_sents = F.size(split_sentences(F.col("text")))
        rows = {
            r.doc_id: r
            for r in df.select(
                "doc_id",
                metrics.syllable_count("text").alias("syl"),
                metrics.flesch_reading_ease(F.col("text"), n_sents).alias("fre"),
            ).collect()
        }
        assert rows[1].syl == 7
        expected = round(206.835 - 1.015 * (6 / 2) - 84.6 * (7 / 6), 4)
        assert rows[1].fre == expected
        assert rows[2].fre == 0.0 and rows[3].fre == 0.0  # no words

    def test_zipf_slope_on_exact_power_law(self, spark):
        """A corpus built with freq(rank) = C / rank must fit slope = -1
        (exactly, up to the 6dp round: ln-freq is ln C - ln rank)."""
        import math

        from llm_pretraining_data_pipeline_spark.operators.corpus import zipf_fit

        C = 840  # lcm(1..8): C / rank is exact for every rank
        rows = []
        rid = 0
        for rank in range(1, 9):
            for _ in range(C // rank):
                rows.append((rid, f"tok{rank:02d}"))
                rid += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = zipf_fit(df, k=8).first()
        assert out.n_tokens == 8
        assert abs(out.zipf_slope - (-1.0)) < 1e-6
        assert abs(out.zipf_intercept - math.log(C)) < 1e-6


class TestZipfDegenerate:
    def test_single_token_corpus_yields_explicit_nulls(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import zipf_fit

        df = spark.createDataFrame(
            [(i, "same same same") for i in range(5)],
            "doc_id long, text string",
        )
        out = zipf_fit(df, k=10).first()
        assert out.n_tokens == 1
        assert out.zipf_slope is None and out.zipf_intercept is None


class TestDupClusterStatsAndEntropy:
    def test_cluster_histogram_hand_built(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            dup_cluster_stats,
        )

        rows = (
            [(i, "unique text %d" % i) for i in range(6)]   # 6 singletons
            + [(10 + i, "PAIR text") for i in range(2)]     # one 2-cluster
            + [(20 + i, "  pair TEXT ") for i in range(3)]  # canon-merges in
            + [(30 + i, None) for i in range(4)]            # nulls -> one 4-cluster
        )
        # "PAIR text" and "pair TEXT" canonicalize identically -> size 5
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.cluster_size: (r.n_clusters, r.n_docs)
               for r in dup_cluster_stats(df).collect()}
        assert out[1] == (6, 6)
        assert out[5] == (1, 5)
        assert out[4] == (1, 4)  # null/empty docs share the '' hash

    def test_entropy_hand_computed(self, spark):
        import math

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            token_entropy,
        )

        df = spark.createDataFrame(
            [
                (1, "a a a a"),          # one token: H = 0
                (2, "a b c d"),          # uniform over 4: H = 2
                (3, "a a b b c c d d"),  # uniform over 4: H = 2
                (4, "a a a b"),          # 3/4, 1/4
                (5, ""),
                (6, None),
                (7, "Case CASE case"),   # lowercased: one token
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in token_entropy(df).collect()}
        assert out[1].token_entropy == 0.0 and out[1].n_tokens == 4
        assert out[2].token_entropy == 2.0
        assert out[3].token_entropy == 2.0
        h4 = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
        assert abs(out[4].token_entropy - round(h4, 6)) < 1e-9
        assert out[5].n_tokens == 0 and out[5].token_entropy == 0.0
        assert out[6].token_entropy == 0.0
        assert out[7].token_entropy == 0.0  # lower() folds the variants


class TestMixtureInterleave:
    def test_proportions_converge_and_determinism(self, spark):
        from pyspark.sql import functions as F

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            mixture_interleave,
        )

        rows = [(s * 1000 + i, f"s{s}") for s in range(3) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = mixture_interleave(df, {"s0": 4.0, "s1": 2.0, "s2": 1.0})
        head = (
            out.orderBy("interleave_key", "source", "doc_id")
            .limit(140)
            .collect()
        )
        counts = {}
        for r in head:
            counts[r.source] = counts.get(r.source, 0) + 1
        # stride scheduling: first 140 rows ≈ 80/40/20 (weights 4:2:1)
        assert abs(counts["s0"] - 80) <= 2
        assert abs(counts["s1"] - 40) <= 2
        assert abs(counts["s2"] - 20) <= 2
        # partitioning-independent stream
        a = [(r.doc_id, r.interleave_key) for r in
             mixture_interleave(df.repartition(1), {"s0": 4.0, "s1": 2.0, "s2": 1.0})
             .orderBy("interleave_key", "source", "doc_id").limit(50).collect()]
        b = [(r.doc_id, r.interleave_key) for r in
             mixture_interleave(df.repartition(13), {"s0": 4.0, "s1": 2.0, "s2": 1.0})
             .orderBy("interleave_key", "source", "doc_id").limit(50).collect()]
        assert a == b

    def test_validation(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            mixture_interleave,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError, match="positive"):
            mixture_interleave(df, {"a": -1.0})
        with pytest.raises(ValueError, match="positive"):
            mixture_interleave(df, {}, default_weight=0.0)


class TestKsDriftAndNovelty:
    def test_ks_drift_hand_computed(self, spark):
        """KS between A={1,2,3,4} and B={3,4,5,6}: F_A-F_B peaks at v=2
        (|2*4-0*4|/16 = 0.5), attained first at value 2."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            ks_drift,
        )

        rows = [("a", v) for v in [1, 2, 3, 4]] + [
            ("b", v) for v in [3, 4, 5, 6]
        ]
        df = spark.createDataFrame(rows, "grp string, val long")
        out = ks_drift(df, "val", "grp", "a", "b").collect()[0]
        assert (out.n_a, out.n_b) == (4, 4)
        assert out.ks_stat == 0.5
        assert out.ks_at_value == 2

    def test_ks_identical_distributions_zero(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            ks_drift,
        )

        rows = [(g, v) for g in ("a", "b") for v in range(50)]
        df = spark.createDataFrame(rows, "grp string, val long")
        out = ks_drift(df, "val", "grp", "a", "b").collect()[0]
        assert out.ks_stat == 0.0

    def test_ks_disjoint_distributions_one(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            ks_drift,
        )

        rows = [("a", v) for v in range(10)] + [
            ("b", v) for v in range(100, 110)
        ]
        df = spark.createDataFrame(rows, "grp string, val long")
        out = ks_drift(df, "val", "grp", "a", "b").collect()[0]
        assert out.ks_stat == 1.0 and out.ks_at_value == 9

    def test_ks_fractional_values_keep_their_type(self, spark):
        """ADVICE r8 (low): ks_at_value used to be cast("long"), truncating
        a fractional attained-max location (0.53 -> 0). Double columns are
        now auto-quantized to 6dp and the attained value comes back AS a
        double."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            ks_drift,
        )

        rows = [("a", v) for v in [0.51, 0.52, 0.53, 0.54]] + [
            ("b", v) for v in [0.53, 0.54, 0.55, 0.56]
        ]
        df = spark.createDataFrame(rows, "grp string, val double")
        res = ks_drift(df, "val", "grp", "a", "b")
        assert dict(res.dtypes)["ks_at_value"] == "double"
        out = res.collect()[0]
        assert out.ks_stat == 0.5
        assert abs(out.ks_at_value - 0.52) < 1e-9

    def test_ks_auto_quantize_collapses_sub_6dp_noise(self, spark):
        """Values differing only past 6dp land in one grid cell — the
        distinct-value frame stays bounded by the grid, not the corpus."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            ks_drift,
        )

        # every value is 0.1 + k*1e-9: identical at the 6dp grid
        rows = [("a", 0.1 + k * 1e-9) for k in range(20)] + [
            ("b", 0.1 + k * 1e-9) for k in range(20)
        ]
        df = spark.createDataFrame(rows, "grp string, val double")
        out = ks_drift(df, "val", "grp", "a", "b").collect()[0]
        assert out.ks_stat == 0.0  # one shared grid cell -> no drift

    def test_ks_max_grid_breach_raises_with_quantize_message(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            ks_drift,
        )

        rows = [("a", v) for v in range(100)] + [
            ("b", v) for v in range(50, 150)
        ]
        df = spark.createDataFrame(rows, "grp string, val long")
        with pytest.raises(Exception, match="quantize"):
            ks_drift(df, "val", "grp", "a", "b", max_grid=10).collect()
        # under the cap the guard is inert and results match the unguarded run
        ok = ks_drift(df, "val", "grp", "a", "b", max_grid=1000).collect()[0]
        ref = ks_drift(df, "val", "grp", "a", "b").collect()[0]
        assert (ok.ks_stat, ok.ks_at_value) == (ref.ks_stat, ref.ks_at_value)

    def test_gram_novelty_hand_computed(self, spark):
        """old: 'a b c d' -> 3-grams {abc, bcd}; new: 'b c d e' ->
        {bcd, cde}: one of two new grams is novel -> rate 0.5."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            gram_novelty,
        )

        df = spark.createDataFrame(
            [("old", "a b c d"), ("new", "b c d e")], "snap string, text string"
        )
        out = gram_novelty(df, "text", "snap", "old", "new", n=3).collect()[0]
        assert (out.n_grams_old, out.n_grams_new, out.n_novel) == (2, 2, 1)
        assert out.novelty_rate == 0.5

    def test_gram_novelty_subset_is_zero_novel(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            gram_novelty,
        )

        df = spark.createDataFrame(
            [("old", "a b c d e f"), ("new", "b c d")],
            "snap string, text string",
        )
        out = gram_novelty(df, "text", "snap", "old", "new", n=3).collect()[0]
        assert out.n_novel == 0 and out.novelty_rate == 0.0


class TestContainmentPairs:
    def test_quote_inside_document_detected(self, spark):
        """A 5-token quote of a 40-token doc: containment from the quote
        side is 1.0 while Jaccard stays ~0.1 — the pair the Jaccard
        operator structurally misses at any dedup threshold."""
        from llm_pretraining_data_pipeline_spark.operators.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        long_doc = " ".join(f"w{i}" for i in range(40))
        quote = " ".join(f"w{i}" for i in range(5))
        df = spark.createDataFrame(
            [(1, long_doc), (2, quote), (3, "totally different words here")],
            "doc_id long, text string",
        )
        out = ngram_containment_pairs(df, "text", threshold=0.9).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
        assert out[0].containment_b == 1.0
        assert out[0].containment_a < 0.2
        # Jaccard at the same threshold finds nothing
        assert ngram_jaccard_pairs(df, "text", threshold=0.9).count() == 0

    def test_symmetric_duplicates_still_pair(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        t = "alpha beta gamma delta epsilon zeta"
        df = spark.createDataFrame(
            [(1, t), (2, t)], "doc_id long, text string"
        )
        out = ngram_containment_pairs(df, "text", threshold=0.9).collect()
        assert len(out) == 1
        assert out[0].containment_a == out[0].containment_b == 1.0


class TestTypeTokenStats:
    def test_hand_computed(self, spark):
        import math

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            type_token_stats,
        )

        df = spark.createDataFrame(
            [
                ("a", "x y x"),        # 3 tokens, 2 types
                ("a", None),           # null text contributes nothing
                ("b", "solo"),         # N=1 -> exponent null
                ("c", "p q r s"),      # 4 tokens, 4 types -> exponent 1.0
            ],
            "source string, text string",
        )
        rows = {r.source: r for r in type_token_stats(df, "text", "source").collect()}
        assert (rows["a"].n_tokens, rows["a"].n_types) == (3, 2)
        assert rows["a"].ttr == round(2 / 3, 6)
        assert rows["a"].heaps_exponent == round(math.log(2) / math.log(3), 6)
        assert rows["b"].heaps_exponent is None
        assert rows["c"].heaps_exponent == 1.0

    def test_approx_valve_close_to_exact(self, spark, sf_dir):
        """approx_rsd swaps in HLL: estimates within the configured rsd of
        exact at fixture scale, and the plan carries no distinct expand."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            type_token_stats,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact = {
            r.source: r.n_types
            for r in type_token_stats(docs, "text", "source").collect()
        }
        approx_df = type_token_stats(docs, "text", "source", approx_rsd=0.02)
        approx = {r.source: r.n_types for r in approx_df.collect()}
        assert approx.keys() == exact.keys()
        for src, n in exact.items():
            assert abs(approx[src] - n) <= max(4, 0.1 * n), (src, n, approx[src])
        plan = approx_df._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan  # HLL sketch, not a distinct expand

    def test_exact_plan_single_explode_partial_agg(self, spark, sf_dir):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            type_token_stats,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (
            type_token_stats(docs, "text", "source")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Generate") == 1  # one narrow explode
        assert "CartesianProduct" not in plan and "Join" not in plan


class TestVocabCoverage:
    def test_hand_computed(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            vocab_coverage,
        )

        # counts: a=4, b=2, c=1, d=1 (total 8, 4 types); top order a,b,c,d
        df = spark.createDataFrame(
            [(1, "a a b c"), (2, "a a b d"), (3, None)],
            "doc_id long, text string",
        )
        rows = {
            r.v: r
            for r in vocab_coverage(df, "text", vocab_sizes=(1, 2, 10)).collect()
        }
        assert rows[1].covered_tokens == 4 and rows[1].oov_rate == 0.5
        assert rows[2].covered_tokens == 6 and rows[2].oov_rate == 0.25
        # V beyond the vocabulary covers everything
        assert rows[10].covered_tokens == 8 and rows[10].oov_rate == 0.0
        assert all(r.n_types == 4 and r.total_tokens == 8 for r in rows.values())

    def test_tie_break_is_deterministic(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            vocab_coverage,
        )

        # b and a tie at 2; rank order (cnt desc, token asc) puts 'a' first
        df = spark.createDataFrame([(1, "b a b a c")], "doc_id long, text string")
        row = {r.v: r for r in vocab_coverage(df, vocab_sizes=(1,)).collect()}[1]
        assert row.covered_tokens == 2  # 'a' (not an arbitrary tie winner)

    def test_validation(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            vocab_coverage,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            vocab_coverage(df, vocab_sizes=())
        with pytest.raises(ValueError):
            vocab_coverage(df, vocab_sizes=(0,))

    def test_plan_bounds_ranking_to_topk(self, spark, sf_dir):
        """The type table must reach the rank window through
        TakeOrderedAndProject(max V), never a global Sort of all types —
        the property that keeps the audit viable on a billion-type
        web-scale vocabulary."""
        from llm_pretraining_data_pipeline_spark.operators.corpus import (
            vocab_coverage,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (
            vocab_coverage(docs, "text", vocab_sizes=(100, 2000))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        # the only Sort allowed is inside the K-bounded window, below the
        # single-partition exchange that TakeOrderedAndProject feeds
        for ln in plan.splitlines():
            if "Sort " in ln and "SortAggregate" not in ln:
                assert "rank" in plan  # window sort over the K rows only


class TestPsiDrift:
    """psi_drift (operators/corpus.py): Laplace-smoothed PSI, ordered fold."""

    def _psi(self, spark, rows, **kw):
        from llm_pretraining_data_pipeline_spark.operators.corpus import psi_drift
        df = spark.createDataFrame(rows, "bucket long, grp string")
        return psi_drift(df, "bucket", "grp", "a", "b", **kw).collect()[0]

    def test_identical_histograms_zero(self, spark):
        rows = [(b, g) for b in (1, 2, 3) for g in ("a", "b") for _ in range(4)]
        out = self._psi(spark, rows)
        assert out["psi"] == 0.0
        assert out["n_a"] == 12 and out["n_b"] == 12 and out["n_buckets"] == 3

    def test_hand_computed_value(self, spark):
        import math
        # a: 3 rows in bucket 1, 1 in bucket 2;  b: 1 and 3. K=2, L=1.
        rows = ([(1, "a")] * 3 + [(2, "a")] + [(1, "b")] + [(2, "b")] * 3)
        out = self._psi(spark, rows)
        pa1, pa2 = 4 / 6, 2 / 6
        pb1, pb2 = 2 / 6, 4 / 6
        t1 = round((pa1 - pb1) * math.log(pa1 / pb1), 6)
        t2 = round((pa2 - pb2) * math.log(pa2 / pb2), 6)
        assert out["psi"] == round(t1 + t2, 6)

    def test_one_sided_bucket_is_finite(self, spark):
        rows = [(1, "a"), (1, "b"), (9, "a")]  # bucket 9 empty on side b
        out = self._psi(spark, rows)
        assert out["psi"] is not None and out["n_buckets"] == 2

    def test_other_groups_ignored(self, spark):
        rows = [(1, "a"), (1, "b"), (1, "zzz"), (5, "zzz")]
        out = self._psi(spark, rows)
        assert out["n_a"] == 1 and out["n_b"] == 1 and out["n_buckets"] == 1

    def test_max_buckets_fence_raises(self, spark):
        import pytest
        from pyspark.errors.exceptions.captured import SparkRuntimeException
        rows = [(b, "a") for b in range(10)] + [(b, "b") for b in range(10)]
        with pytest.raises(SparkRuntimeException, match="max_buckets"):
            self._psi(spark, rows, max_buckets=5)

    def test_partitioning_invariant(self, spark):
        from llm_pretraining_data_pipeline_spark.operators.corpus import psi_drift
        rows = [((i * 7) % 5, "a" if i % 3 else "b") for i in range(200)]
        df = spark.createDataFrame(rows, "bucket long, grp string")
        p1 = psi_drift(df.repartition(1), "bucket", "grp", "a", "b").collect()[0]["psi"]
        p8 = psi_drift(df.repartition(8), "bucket", "grp", "a", "b").collect()[0]["psi"]
        assert p1 == p8  # ordered fold: no sum-order sensitivity


class TestBudgetSelect:
    """Global token-budget selection (operators/corpus.py::budget_select):
    bucket-histogram two-phase cut, bit-equal to the naive global
    window cumsum."""

    def _naive(self, rows, budget):
        # reference: (score desc, id) order, keep iff cum_before < budget
        kept, cum = {}, 0
        for did, score, tok in sorted(
            rows, key=lambda r: (-(r[1] if r[1] is not None else -1e18), r[0])
        ):
            kept[did] = cum < budget
            cum += tok
        return kept

    def _run(self, spark, rows, budget, **kw):
        from llm_pretraining_data_pipeline_spark.operators import corpus

        df = spark.createDataFrame(
            rows, "doc_id long, score double, n_tok long"
        )
        out = corpus.budget_select(
            df, budget, value_col="score", token_col="n_tok", **kw
        )
        got = {r["doc_id"]: r["kept"] for r in out.collect()}
        assert len(got) == len(rows)  # row set unchanged
        return got

    def test_matches_naive_cumsum(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (i, rng.random(), rng.randrange(0, 40)) for i in range(300)
        ]
        for budget in (0, 1, 500, 2500, 10**9):
            got = self._run(spark, rows, budget, buckets=16)
            assert got == self._naive(rows, budget), f"budget={budget}"

    def test_boundary_zero_token_rows(self, spark):
        # rows with 0 tokens sitting exactly AT the budget boundary are
        # NOT kept (their cum_before equals the budget)
        rows = [
            (1, 0.9, 10),
            (2, 0.8, 10),
            (3, 0.7, 0),   # cum_before = 20 == budget -> dropped
            (4, 0.6, 5),
        ]
        got = self._run(spark, rows, 20, buckets=1)
        assert got == {1: True, 2: True, 3: False, 4: False}

    def test_ties_break_on_id(self, spark):
        rows = [(2, 0.5, 10), (1, 0.5, 10), (3, 0.5, 10)]
        got = self._run(spark, rows, 15)
        assert got == {1: True, 2: True, 3: False}

    def test_checkpoint_flag_pins_both_phases(self, spark):
        # ADVICE r12: checkpoint=True lazily localCheckpoints the input
        # so the histogram collect and the returned plan share one
        # materialization; results are unchanged
        import random

        rng = random.Random(3)
        rows = [(i, rng.random(), rng.randrange(0, 40)) for i in range(120)]
        got = self._run(spark, rows, 800, buckets=16, checkpoint=True)
        assert got == self._naive(rows, 800)

    def test_null_scores_sort_last_and_clamping(self, spark):
        rows = [
            (1, None, 5),
            (2, 7.5, 5),    # clamps above value_max, still first
            (3, -2.0, 5),   # clamps below value_min, before nulls
            (4, 0.5, 5),
        ]
        got = self._run(spark, rows, 15)
        assert got == {2: True, 4: True, 3: True, 1: False}

    def test_whole_supply_fits(self, spark):
        rows = [(1, 0.1, 5), (2, 0.9, 5)]
        assert self._run(spark, rows, 100) == {1: True, 2: True}
        assert self._run(spark, rows, 0) == {1: False, 2: False}


class TestGroupPriorGate:
    def _run(self, spark, rows, **kw):
        from llm_pretraining_data_pipeline_spark.operators import corpus

        df = spark.createDataFrame(rows, "doc_id long, g string, v double")
        out = corpus.group_prior_gate(df, "v", group_col="g", **kw)
        return {r["doc_id"]: r for r in out.collect()}

    def test_gate_and_evidence_floor(self, spark):
        rows = (
            [(i, "bad", 0.2) for i in range(5)]
            + [(10 + i, "good", 0.9) for i in range(5)]
            + [(20 + i, "smallbad", 0.1) for i in range(3)]
        )
        got = self._run(spark, rows, tau=0.5, min_count=5)
        assert len(got) == 13  # join back keeps every row
        assert all(got[i]["below_prior"] for i in range(5))
        assert not any(got[10 + i]["below_prior"] for i in range(5))
        # under the evidence floor: never flagged, stats still present
        assert not any(got[20 + i]["below_prior"] for i in range(3))
        assert got[20]["group_n"] == 3 and got[20]["group_mean"] == 0.1

    def test_boundary_is_integer_exact(self, spark):
        # mean exactly tau -> NOT below (strict <), regardless of
        # summation order
        rows = [(i, "edge", 0.5) for i in range(8)]
        got = self._run(spark, rows, tau=0.5, min_count=5)
        assert not any(r["below_prior"] for r in got.values())
        rows[0] = (0, "edge", 0.499999)
        got = self._run(spark, rows, tau=0.5, min_count=5)
        assert all(r["below_prior"] for r in got.values())

    def test_null_scores_count_as_zero(self, spark):
        rows = [(0, "g", None), (1, "g", None), (2, "g", None),
                (3, "g", 0.9), (4, "g", 0.9)]
        got = self._run(spark, rows, tau=0.5, min_count=5)
        # sum = 1.8e6 < 0.5e6*5 -> flagged; nulls counted as evidence
        assert all(r["below_prior"] for r in got.values())
        assert got[0]["group_n"] == 5


class TestAssignShardsSized:
    def test_matches_naive_cumsum_and_oversize_docs(self, spark):
        from llm_pretraining_data_pipeline_spark.functions.hashing import h64
        from llm_pretraining_data_pipeline_spark.operators import sharding

        rows = [(i, (i * 37) % 90 + (900 if i == 5 else 0))
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
        out = sharding.assign_shards_sized(
            df, target_bytes=100, nlanes=4
        ).collect()
        lanes = {
            r["doc_id"]: r["lane"]
            for r in df.select(
                "doc_id", (h64("doc_id") % 4).cast("int").alias("lane")
            ).collect()
        }
        cum, naive = 0, {}
        for did, nb in sorted(rows, key=lambda r: (lanes[r[0]], r[0])):
            naive[did] = cum // 100
            cum += nb
        got = {r["doc_id"]: r["shard_id"] for r in out}
        assert got == naive
        # the 990-byte doc overflows its shard but stays in ONE shard
        assert len(out) == 40

    def test_null_sizes_and_validation(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.operators import sharding

        df = spark.createDataFrame(
            [(1, None), (2, 10)], "doc_id long, n_bytes long"
        )
        out = sharding.assign_shards_sized(df, target_bytes=100)
        assert {r["doc_id"]: r["shard_id"] for r in out.collect()} == {
            1: 0, 2: 0,
        }
        with pytest.raises(ValueError):
            sharding.assign_shards_sized(df, target_bytes=0)

    def test_checkpoint_flag_same_assignment(self, spark):
        # ADVICE r12: the totals collect and the returned plan share one
        # materialization under checkpoint=True; assignment is unchanged
        from llm_pretraining_data_pipeline_spark.operators import sharding

        rows = [(i, (i * 37) % 90) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
        plain = {
            r["doc_id"]: r["shard_id"]
            for r in sharding.assign_shards_sized(
                df, target_bytes=100, nlanes=4
            ).collect()
        }
        pinned = {
            r["doc_id"]: r["shard_id"]
            for r in sharding.assign_shards_sized(
                df, target_bytes=100, nlanes=4, checkpoint=True
            ).collect()
        }
        assert plain == pinned


class TestReviewFixesR12b:
    """Regression guards for the round-12-continuation review findings."""

    def test_group_prior_gate_keeps_null_group_rows(self, spark):
        from llm_pretraining_data_pipeline_spark.operators import corpus

        rows = [(i, None, 0.1) for i in range(5)] + [(9, "g", 0.9)]
        df = spark.createDataFrame(rows, "doc_id long, g string, v double")
        got = {
            r["doc_id"]: r
            for r in corpus.group_prior_gate(
                df, "v", group_col="g", tau=0.5, min_count=5
            ).collect()
        }
        # the null group is a real group: present, gated on its own stats
        assert len(got) == 6
        assert all(got[i]["below_prior"] for i in range(5))
        assert got[0]["group_n"] == 5
        assert not got[9]["below_prior"]

    def test_budget_select_nan_scores_sort_first(self, spark):
        from llm_pretraining_data_pipeline_spark.operators import corpus

        rows = [(1, float("nan"), 5), (2, 0.9, 5), (3, 0.1, 5)]
        df = spark.createDataFrame(rows, "doc_id long, score double, n_tok long")
        got = {
            r["doc_id"]: r["kept"]
            for r in corpus.budget_select(
                df, 10, value_col="score", token_col="n_tok"
            ).collect()
        }
        # Spark's (score desc) order puts NaN above every double — the
        # NaN row takes the first budget slot, 0.9 the second
        assert got == {1: True, 2: True, 3: False}

    def test_sized_shards_duplicate_ids_use_rows_frame(self, spark):
        from llm_pretraining_data_pipeline_spark.operators import sharding

        # same id twice in one lane: RANGE would give both rows a cum
        # including BOTH sizes (overshooting the first); ROWS keeps the
        # end-to-end layout
        df = spark.createDataFrame(
            [(7, 60), (7, 60), (7, 60)], "doc_id long, n_bytes long"
        )
        out = sharding.assign_shards_sized(
            df, target_bytes=100, nlanes=1
        ).collect()
        assert sorted(r["shard_id"] for r in out) == [0, 0, 1]


class TestGroupRankBuckets:
    def _run(self, spark, rows, labels=("head", "middle", "tail")):
        from llm_pretraining_data_pipeline_spark.operators import corpus

        df = spark.createDataFrame(rows, "doc_id long, g string, v double")
        out = corpus.group_rank_buckets(
            df, "v", group_col="g", labels=labels
        )
        return {r["doc_id"]: (r["bucket"], r["group_n"])
                for r in out.collect()}

    def test_terciles_exact_split(self, spark):
        rows = [(i, "a", float(i)) for i in range(9)]
        got = self._run(spark, rows)
        assert [got[i][0] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )
        assert got[0][1] == 9

    def test_nondivisible_and_tiny_groups(self, spark):
        # n=4: ceil(3*rank/4)-1 -> ranks 1:head 2:middle 3:tail 4:tail
        rows = [(i, "a", float(i)) for i in range(4)]
        got = self._run(spark, rows)
        assert [got[i][0] for i in range(4)] == [
            "head", "middle", "tail", "tail",
        ]
        # n=1: rank == n, and the highest rank always lands in the
        # LAST bucket (rank/n = 100th percentile) — consistent with
        # the ceil(K*rank/n)-1 arithmetic on both engines
        assert self._run(spark, [(0, "solo", 1.0)])[0][0] == "tail"

    def test_groups_are_independent_and_ties_break_on_id(self, spark):
        rows = [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 5.0),
                (10, "b", 99.0), (11, "b", 1.0), (12, "b", 50.0)]
        got = self._run(spark, rows)
        assert [got[i][0] for i in (1, 2, 3)] == ["head", "middle", "tail"]
        assert got[11][0] == "head" and got[12][0] == "middle"
        assert got[10][0] == "tail"

    def test_custom_label_count(self, spark):
        rows = [(i, "a", float(i)) for i in range(4)]
        got = self._run(spark, rows, labels=("lo", "hi"))
        assert [got[i][0] for i in range(4)] == ["lo", "lo", "hi", "hi"]


class TestConcentrationStats:
    def _run(self, spark, rows, **kw):
        from llm_pretraining_data_pipeline_spark.operators import corpus

        df = spark.createDataFrame(rows, "g string, w long")
        return corpus.concentration_stats(
            df, group_col="g", **kw
        ).collect()[0]

    def test_perfectly_even(self, spark):
        r = self._run(spark, [(f"g{i}", 10) for i in range(10)],
                      weight_col="w")
        assert r["gini"] == 0.0
        assert r["hhi"] == 0.1
        assert r["top1_share"] == 0.1
        assert r["top10_share"] == 1.0
        assert r["n_groups"] == 10 and r["total"] == 100

    def test_total_domination(self, spark):
        # one group holds everything: gini -> (n-1)/n, hhi -> 1
        rows = [("big", 1000)] + [(f"g{i}", 0) for i in range(9)]
        r = self._run(spark, rows, weight_col="w")
        assert r["gini"] == 0.9
        assert r["hhi"] == 1.0 and r["top1_share"] == 1.0

    def test_row_counting_default(self, spark):
        rows = [("a", 0)] * 3 + [("b", 0)]
        r = self._run(spark, rows)
        assert r["total"] == 4 and r["top1_share"] == 0.75
