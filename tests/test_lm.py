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
