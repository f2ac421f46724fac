"""Randomized parity fuzz: 400 adversarial strings through the Catalyst
expressions vs direct Python reimplementations of the reference semantics.

One Spark round-trip for the whole corpus (per-example Spark jobs would be
prohibitively slow); the generator is seeded, so failures reproduce.
"""

import random
import re
import string
import unicodedata

import pytest
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions import metrics, pii, text_norm

ALPHABETS = [
    string.ascii_letters,
    string.digits,
    " \t\n\r\x0b\x0c",
    "\x00\x1c\x1d\x1e\x1f\x7f\x85\xa0",
    "àéîöüßñç",
    "日本語中文한국어",
    "!@#$%^&*()[]{}<>.,;:'\"-_+=",
    "ﬁﬂ①②½",  # NFKC compatibility chars
    "📧🙂",
]


def _gen_corpus(n=400, seed=20260813):
    rng = random.Random(seed)
    corpus = []
    for i in range(n):
        if i % 29 == 0:
            corpus.append(None)
            continue
        length = rng.randint(0, 80)
        parts = []
        for _ in range(length):
            alphabet = rng.choice(ALPHABETS)
            parts.append(rng.choice(alphabet))
        if i % 7 == 0:  # sprinkle PII-shaped substrings
            parts.append(rng.choice([
                " x@y.zz ", " 555-1234-9876 ", " 4111 1111 1111 1111 ",
                " GB29NWBK60161331926819 ",
            ]))
        corpus.append("".join(parts))
    return corpus


def _py_ws_tokens(t):
    return ("" if t is None else str(t)).split()


@pytest.fixture(scope="module")
def fuzz_rows(spark):
    corpus = _gen_corpus()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "id long, text string"
    )
    rows = (
        df.select(
            "id",
            text_norm.normalize_text_expr("text", nfkc=True).alias("norm"),
            text_norm.canonicalize_for_exact("text").alias("canon"),
            metrics.n_words("text").alias("n_words"),
            metrics.alpha_ratio("text").alias("alpha"),
            metrics.repetition_ratio("text").alias("rep"),
            pii.email_hits("text").alias("email"),
            pii.cc_hits("text").alias("cc"),
            pii.iban_hits("text").alias("iban"),
        )
        .orderBy("id")
        .collect()
    )
    return list(zip(corpus, rows))


class TestFuzzParity:
    def test_normalize(self, fuzz_rows):
        for text, row in fuzz_rows:
            if text is None:
                assert row.norm is None
                continue
            expected = unicodedata.normalize("NFKC", text)
            expected = re.sub(r"[\x00-\x1f\x7f-\x9f]", " ", expected)
            expected = re.sub(r"\s+", " ", expected).strip()
            expected = expected if expected else None
            assert row.norm == expected, repr(text)

    def test_canonicalize(self, fuzz_rows):
        for text, row in fuzz_rows:
            expected = "" if text is None else re.sub(r"\s+", " ", text.lower().strip())
            assert row.canon == expected, repr(text)

    def test_word_count_and_ratios(self, fuzz_rows):
        for text, row in fuzz_rows:
            toks = _py_ws_tokens(text)
            assert row.n_words == len(toks), repr(text)
            t = "" if text is None else text
            exp_alpha = (
                sum(ch.isalpha() for ch in t) / len(t) if len(t) > 0 else 0.0
            )
            assert row.alpha == pytest.approx(exp_alpha, abs=1e-12), repr(text)
            exp_rep = 1.0 - len(set(toks)) / len(toks) if toks else 0.0
            assert row.rep == pytest.approx(exp_rep, abs=1e-12), repr(text)

    def test_pii_counts(self, fuzz_rows):
        for text, row in fuzz_rows:
            t = "" if text is None else text
            assert row.email == len(re.findall(pii.EMAIL_RE, t)), repr(text)
            assert row.cc == len(re.findall(pii.CREDIT_CARD_RE, t)), repr(text)
            assert row.iban == len(re.findall(pii.IBAN_RE, t)), repr(text)
