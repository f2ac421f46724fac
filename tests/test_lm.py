"""Unigram LM scorer tests (functions/lm.py): probability-model sanity,
bucket semantics, and edge cases (empty/null docs, case folding)."""

import math

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions import lm


def _score(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(lm.doc_lm_struct("text").alias("s")).collect()[0].s


class TestModel:
    def test_probabilities_sum_to_one(self):
        in_vocab = sum(
            10 ** (-math.log10(r + 1.0) - lm.LOG10_Z)
            for r in range(1, len(lm.LM_VOCAB) + 1)
        )
        oov = lm.OOV_VOCAB_SIZE * 10**lm.LOG10_P_OOV
        assert abs(in_vocab - lm.IN_VOCAB_MASS) < 1e-9
        assert abs(in_vocab + oov - 1.0) < 1e-9

    def test_rank_orders_probability(self, spark):
        # 'the' (rank 1) must be more probable than 'that' (deeper rank),
        # which beats any OOV token
        s_common = _score(spark, "the")
        s_rarer = _score(spark, "that")
        s_oov = _score(spark, "zyzzyva")
        assert s_common.mean_logprob > s_rarer.mean_logprob > s_oov.mean_logprob
        assert s_oov.mean_logprob == round(lm.LOG10_P_OOV, 6)


class TestDocScore:
    def test_stopword_dense_beats_word_soup(self, spark):
        prose = _score(spark, "the cat is on the mat and it is a good cat")
        soup = _score(spark, "qwv zxb plk mnt vgy hjq wsd rfx tgc yhn ujm ikq")
        assert prose.pseudo_ppl < soup.pseudo_ppl
        assert prose.ppl_bucket == "head"

    def test_case_folded(self, spark):
        assert (
            _score(spark, "THE AND OF").mean_logprob
            == _score(spark, "the and of").mean_logprob
        )

    def test_empty_and_null(self, spark):
        for text in ("", "   ", None):
            s = _score(spark, text)
            assert s.n_lm_tokens == 0
            assert s.mean_logprob is None and s.pseudo_ppl is None
            assert s.ppl_bucket == "empty"

    def test_bucket_thresholds(self, spark):
        # all-OOV doc: ppl = 10^(-LOG10_P_OOV) ≈ 33k > PPL_MIDDLE -> tail
        s = _score(spark, "zzz yyy xxx")
        assert s.ppl_bucket == "tail"
        assert s.pseudo_ppl > lm.PPL_MIDDLE


class TestDsirImportance:
    def test_targetlike_doc_outweighs_soup(self, spark):
        def w(text):
            df = spark.createDataFrame([(text,)], "text string")
            return df.select(lm.doc_importance_weight("text").alias("w")).collect()[0].w

        # stopword-dense prose: every token far likelier under the Zipf
        # target than the uniform background -> positive weight
        assert w("the and of to in the a is") > 0
        # OOV soup: log p_target(OOV) < log p_raw(uniform) -> negative
        assert w("zzq wvx plk mnt") < 0
        assert w("") == 0.0 and w(None) == 0.0

    def test_weight_is_sum_not_mean(self, spark):
        def w(text):
            df = spark.createDataFrame([(text,)], "text string")
            return df.select(lm.doc_importance_weight("text").alias("w")).collect()[0].w

        one = w("the")
        three = w("the the the")
        assert abs(three - 3 * one) < 1e-9  # DSIR sums feature log-ratios


class TestTrainedUnigramLm:
    def test_table_matches_hand_computation(self, spark):
        import math

        from llm_pretraining_data_pipeline_spark.functions.lm import (
            train_unigram_lm,
        )

        df = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string"
        )
        rows = {r.token: r for r in train_unigram_lm(df, vocab_size=2).collect()}
        # N=6 tokens, V=min(3 distinct, 2)=2 kept, denom = 6 + (2+1) = 9
        assert set(rows) == {"a", "b"}  # c cut by vocab_size
        assert rows["a"].rank == 1 and rows["b"].rank == 2
        assert rows["a"].logprob10 == round(math.log10(4 / 9), 6)
        assert rows["b"].logprob10 == round(math.log10(3 / 9), 6)
        assert rows["a"].oov_logprob10 == round(math.log10(1 / 9), 6)

    def test_scoring_oov_and_empty(self, spark):
        import math

        from llm_pretraining_data_pipeline_spark.functions.lm import (
            score_with_unigram_lm,
            train_unigram_lm,
        )

        ref = spark.createDataFrame([(1, "a a a b b c")], "doc_id long, text string")
        lm = train_unigram_lm(ref, vocab_size=2)
        docs = spark.createDataFrame(
            [(10, "a b"), (11, "zzz"), (12, "")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in score_with_unigram_lm(docs, lm).collect()}
        lp_a = round(math.log10(4 / 9), 6)
        lp_b = round(math.log10(3 / 9), 6)
        lp_oov = round(math.log10(1 / 9), 6)
        assert out[10].n_lm_tokens == 2
        assert out[10].mean_logprob10 == round((lp_a + lp_b) / 2, 6)
        assert out[11].mean_logprob10 == round(lp_oov, 6)  # OOV floor
        assert out[12].n_lm_tokens == 0 and out[12].mean_logprob10 is None

    def test_scores_partitioning_independent(self, spark, sf_dir):
        from llm_pretraining_data_pipeline_spark.functions.lm import (
            score_with_unigram_lm,
            train_unigram_lm,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
        lm = train_unigram_lm(docs)
        a = sorted(score_with_unigram_lm(docs.repartition(1), lm).collect())
        b = sorted(score_with_unigram_lm(docs.repartition(13), lm).collect())
        assert a == b


class TestTrainedBigramLm:
    def test_hand_computed_probs_and_fallbacks(self, spark):
        import math

        from llm_pretraining_data_pipeline_spark.functions.lm import (
            score_with_bigram_lm,
            train_bigram_lm,
        )

        # corpus "a b a b c": pairs (a,b)x2? no: a b, b a, a b, b c ->
        # (a,b):2 (b,a):1 (b,c):1; ctx a:2 b:2; V=3
        ref = spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")
        lm = train_bigram_lm(ref)
        rows = {(r.w1, r.w2): r for r in lm.collect()}
        lp_ab = round(math.log10((2 + 1) / (2 + 3 + 1)), 6)
        lp_ba = round(math.log10((1 + 1) / (2 + 3 + 1)), 6)
        bo_a = round(math.log10(1 / (2 + 3 + 1)), 6)
        assert rows[("a", "b")].logprob10 == lp_ab
        assert rows[("b", "a")].logprob10 == lp_ba
        assert rows[("a", "b")].backoff_logprob10 == bo_a

        docs = spark.createDataFrame(
            [
                (10, "a b"),        # known pair
                (11, "a zzz"),      # known context, unseen pair -> backoff
                (12, "qq rr"),      # unseen context -> flat floor
                (13, "single"),     # no pairs
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in score_with_bigram_lm(docs, lm).collect()}
        assert out[10].mean_logprob10 == lp_ab
        assert out[11].mean_logprob10 == bo_a
        assert out[12].mean_logprob10 == -6.0
        assert out[13].n_pairs == 0 and out[13].mean_logprob10 is None

    def test_partitioning_independent(self, spark, sf_dir):
        from llm_pretraining_data_pipeline_spark.functions.lm import (
            score_with_bigram_lm,
            train_bigram_lm,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
        lm = train_bigram_lm(docs)
        a = sorted(score_with_bigram_lm(docs.repartition(1), lm).collect())
        b = sorted(score_with_bigram_lm(docs.repartition(11), lm).collect())
        assert a == b
