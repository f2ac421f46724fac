"""Named query registry: the driver-facing correctness surface.

Each entry pairs a Spark DataFrame program with the equivalent DuckDB SQL
(oracle) over the same parquet tables. Naming convention groups entries by
the SURVEY.md §2 operator they exercise (p* scalar ops, f* filters, d* dedup,
a* aggregations, o* sort/shard, plus rel_*/win_*/ev_*/emb_* extension
surface). Entries with ``oracle=None`` are non-SQL-expressible (streaming,
backreference regexes, UDF-backed) and get the driver's rows-only check.

Determinism rules applied throughout (see oracle_fragments):
  * per-row doubles: identical op order on identical inputs → bit-identical;
  * aggregated doubles: rounded (2dp for money-scale sums, 6dp for ratios)
    because distributed summation order differs from DuckDB's;
  * LIMIT queries: fully-determined ORDER BY (unique tiebreak column);
  * counts cast to bigint on both sides (DuckDB sum(int) is hugeint).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark import oracle_fragments as O
from llm_pretraining_data_pipeline_spark.functions import (
    hashing,
    metrics,
    pii,
    scoring,
    structural,
    text_norm,
    tokenizer,
    toxicity,
)
from llm_pretraining_data_pipeline_spark.operators import dedup as dedup_ops
from llm_pretraining_data_pipeline_spark.operators import similarity
from llm_pretraining_data_pipeline_spark.sources import io as src


@dataclass
class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def wrap(fn):
        QUERIES[name] = QueryDef(spark=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _t(spark, sf_dir, name):
    return src.load_table(spark, sf_dir, name)


# =============================================================== documents —
# scalar operators (SURVEY.md §2.2)

@register(
    "p17_canonicalize",
    f"""
    SELECT doc_id,
           {O.canon_exact('text')} AS exact_canon_text,
           substr({O.canon_exact('text')}, 1, 100) AS near_key,
           cast(length({O.canon_exact('text')}) as bigint) AS canon_len
    FROM documents
    """,
    doc="P17/P18 canonical forms (duplication.py:31-56)",
)
def p17_canonicalize(spark, sf_dir):
    d = _docs(spark, sf_dir)
    canon = text_norm.canonicalize_for_exact("text")
    return d.select(
        "doc_id",
        canon.alias("exact_canon_text"),
        text_norm.canonicalize_for_near("text", 100).alias("near_key"),
        F.length(canon).cast("long").alias("canon_len"),
    )


@register(
    "p04_char_word_counts",
    f"""
    SELECT doc_id,
           cast(length(coalesce(text,'')) as bigint) AS n_chars_computed,
           cast(len({O.toks('text')}) as bigint) AS n_words
    FROM documents
    """,
    doc="P4/P5 char/word counts (text_clean_and_filter.py:124-127,220-222)",
)
def p04_char_word_counts(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        metrics.n_chars("text").alias("n_chars_computed"),
        metrics.n_words("text").alias("n_words"),
    )


@register(
    "p05_quality_metrics",
    f"""
    SELECT doc_id,
           {O.alpha_ratio('text')} AS alpha_ratio,
           {O.repetition_ratio('text')} AS repetition_ratio,
           {O.stopword_ratio('text', metrics.EN_STOPWORDS)} AS stopword_ratio
    FROM documents
    """,
    doc="P5/P15 ratios (text_clean_and_filter.py:206-236, deep_clean_and_pii.py:219-260)",
)
def p05_quality_metrics(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        metrics.alpha_ratio("text").alias("alpha_ratio"),
        metrics.repetition_ratio("text").alias("repetition_ratio"),
        metrics.stopword_ratio("text").alias("stopword_ratio"),
    )


@register(
    "p15_token_stats",
    f"""
    SELECT doc_id,
           cast(len({O.toks('text')}) as bigint) AS token_count,
           cast(len(list_distinct({O.toks('text')})) as bigint) AS unique_tokens,
           case when len({O.toks('text')}) > 0
                then cast(len(list_distinct({O.toks('text')})) as double)
                     / cast(len({O.toks('text')}) as double)
                else 0.0 end AS unique_token_ratio
    FROM documents
    """,
    doc="P15 token stats (deep_clean_and_pii.py:219-260)",
)
def p15_token_stats(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        metrics.token_count("text").alias("token_count"),
        metrics.unique_tokens("text").alias("unique_tokens"),
        metrics.unique_token_ratio("text").alias("unique_token_ratio"),
    )


@register(
    "p06_pii_hits",
    f"""
    SELECT doc_id,
           {O.regexp_count('text', pii.EMAIL_RE)} AS email_hits,
           {O.regexp_count('text', pii.SIMPLE_PHONE_RE.replace(chr(92) + '+', chr(92) + chr(92) + '+'))} AS phone_hits,
           {O.regexp_count('text', pii.IBAN_RE)} AS iban_hits
    FROM documents
    """,
    doc="P6/P16 PII hit counters (text_clean_and_filter.py:239-261)",
)
def p06_pii_hits(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        pii.email_hits("text").alias("email_hits"),
        pii.simple_phone_hits("text").alias("phone_hits"),
        pii.iban_hits("text").alias("iban_hits"),
    )


_MASK_SQL = "text"
for _pat, _repl in pii.MASK_ORDER:
    _MASK_SQL = f"regexp_replace({_MASK_SQL}, '{_pat}', '{_repl}', 'g')"


@register(
    "p16_pii_mask",
    f"""
    SELECT doc_id,
           {_MASK_SQL} AS masked,
           {O.regexp_count('text', pii.CREDIT_CARD_RE)} AS cc_hits
    FROM documents
    """,
    doc="P16 full 4-layer mask chain in the reference's exact order "
        "email→phone→cc→iban (deep_clean_and_pii.py:329-332); Java and RE2 "
        "agree on these patterns incl. the lazy cc quantifier (adversarial "
        "cases probed in round 1)",
)
def p16_pii_mask(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        pii.mask_pii("text").alias("masked"),
        pii.cc_hits("text").alias("cc_hits"),
    )


@register(
    "p07_toxicity",
    f"""
    WITH t AS (SELECT doc_id, {O.word_tokens_ascii('text')} AS tk FROM documents),
    n AS (SELECT doc_id, tk, greatest(1, len(tk)) AS n FROM t)
    SELECT doc_id,
           {O.scaled_score(O.lexicon_hits('tk', toxicity.BAD_WORDS + toxicity.INSULT_WORDS + toxicity.THREAT_WORDS + toxicity.SEXUAL_WORDS + toxicity.SLUR_WORDS), 'n')} AS toxicity,
           {O.scaled_score(O.lexicon_hits('tk', toxicity.INSULT_WORDS), 'n')} AS insult,
           {O.scaled_score(O.lexicon_hits('tk', toxicity.THREAT_WORDS), 'n')} AS threat
    FROM n
    """,
    doc="P7 lexicon toxicity (text_clean_and_filter.py:301-366); union lexicon "
        "hit-count equals the reference's per-lexicon sum because lexicons are disjoint",
)
def p07_toxicity(spark, sf_dir):
    scores = toxicity.toxicity_scores("text", ascii_only=True)
    return _docs(spark, sf_dir).select(
        "doc_id",
        scores["toxicity"].alias("toxicity"),
        scores["insult"].alias("insult"),
        scores["threat"].alias("threat"),
    )


@register(
    "p11_strip_html",
    """
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(text, '<[^>]+>', ' ', 'g'),
                               '\\s+', ' ', 'g')) AS text_stripped
    FROM documents
    """,
    doc="P11 HTML strip + whitespace re-collapse (deep_clean_and_pii.py:92-116)",
)
def p11_strip_html(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        text_norm.collapse_ws(structural.strip_html("text")).alias("text_stripped"),
    )


@register(
    "p12_boilerplate_lines",
    f"""
    SELECT doc_id,
           trim(array_to_string(list_filter(str_split(coalesce(text,''), chr(10)),
                l -> NOT regexp_matches(lower(l), '{structural.BOILERPLATE_COMBINED}')),
                chr(10))) AS text_noboiler
    FROM documents
    """,
    doc="P12 boilerplate line removal (deep_clean_and_pii.py:120-149)",
)
def p12_boilerplate_lines(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        structural.remove_boilerplate_lines("text").alias("text_noboiler"),
    )


@register(
    "p01_doc_identity",
    """
    SELECT doc_id, sha256(concat(coalesce(source,'nan'), '||', coalesce(text,'nan'))) AS content_id
    FROM documents
    """,
    doc="P1 content identity (ingest.py:51-67; sha256 flavor — DuckDB lacks sha1; "
        "the sha1-parity version is unit-tested)",
)
def p01_doc_identity(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.sha2(
            F.concat(
                F.coalesce(F.col("source"), F.lit("nan")),
                F.lit("||"),
                F.coalesce(F.col("text"), F.lit("nan")),
            ),
            256,
        ).alias("content_id"),
    )


@register(
    "p23_pick_text",
    """
    SELECT doc_id,
           coalesce(nullif(trim(text), ''), nullif(trim(source), ''), '') AS picked
    FROM documents
    """,
    doc="P23 first-non-empty fallback (Export_to_jsonl.py:25-30)",
)
def p23_pick_text(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", text_norm.pick_text("text", "source").alias("picked")
    )


@register(
    "p20_quality_score",
    f"""
    WITH t AS (
      SELECT doc_id, {O.toks('text')} AS tk,
             {O.regexp_count('text', pii.EMAIL_RE)}
              + {O.regexp_count('text', pii.IBAN_RE)} AS pii_hits
      FROM documents
    ), m AS (
      SELECT doc_id,
             cast(len(tk) as bigint) AS token_count,
             case when len(tk) > 0 then cast(len(list_distinct(tk)) as double) / cast(len(tk) as double) else 0.0 end AS uniq_ratio,
             case when len(tk) > 0 then cast(len(list_filter(tk, x -> list_contains({'[' + ','.join(chr(39) + w + chr(39) for w in metrics.EN_STOPWORDS) + ']'}, lower(x)))) as double) / cast(len(tk) as double) else 0.0 end AS stop_frac,
             pii_hits
      FROM t
    ), s AS (
      SELECT doc_id,
             least(1.0::double, stop_frac * 4.0::double) AS lang_score,
             {O.length_score('token_count')} AS len_score,
             greatest(0.0::double, least(1.0::double, uniq_ratio)) AS uniq_score,
             case when pii_hits > 0 then 0.0 else 1.0 end AS pii_score
      FROM m
    )
    SELECT doc_id,
           greatest(0.0::double, least(1.0::double,
             0.4::double * lang_score + 0.3::double * len_score
             + 0.2::double * uniq_score + 0.1::double * pii_score)) AS quality_score,
           case when greatest(0.0::double, least(1.0::double,
             0.4::double * lang_score + 0.3::double * len_score
             + 0.2::double * uniq_score + 0.1::double * pii_score)) >= 0.8
                then 'high_quality' else 'rest' end AS subset
    FROM s
    """,
    doc="P20/P21 quality score + subset (scoring_and_mixture.py:52-106,138-143), "
        "with the EN-stopword-fraction lang proxy",
)
def p20_quality_score(spark, sf_dir):
    d = _docs(spark, sf_dir)
    lang = F.least(F.lit(1.0), metrics.stopword_ratio("text") * F.lit(4.0))
    has_pii = (pii.email_hits("text") + pii.iban_hits("text")) > 0
    qs = scoring.quality_score(lang, metrics.token_count("text"),
                               metrics.unique_token_ratio("text"), has_pii)
    return d.select(
        "doc_id",
        qs.alias("quality_score"),
        scoring.subset(qs, 0.8).alias("subset"),
    )


@register(
    "p08_model_quality",
    f"""
    WITH m AS (
      SELECT doc_id,
             {O.alpha_ratio('text')} AS alpha,
             {O.repetition_ratio('text')} AS rep,
             {O.stopword_ratio('text', metrics.EN_STOPWORDS)} AS stop_frac,
             cast(len({O.toks('text')}) as double) AS nw,
             case when {O.regexp_count('text', pii.EMAIL_RE)}
                       + {O.regexp_count('text', pii.IBAN_RE)} > 0
                  then 1.0 else 0.0 end AS piif
      FROM documents
    ), z AS (
      SELECT doc_id,
             -2.0::double
             + 2.5::double * greatest(0.0::double, least(1.0::double, alpha))
             + 2.0::double * least(1.0::double,
                 ln(1.0::double + greatest(nw, 0.0::double)) / {math.log(1001.0)!r}::double)
             + 1.5::double * greatest(0.0::double, least(1.0::double,
                 least(1.0::double, stop_frac * 4.0::double)))
             + (-2.0::double) * greatest(0.0::double, least(1.0::double, rep))
             + (-1.0::double) * piif AS z
      FROM m
    )
    SELECT doc_id, round(1.0::double / (1.0::double + exp(-z)), 6) AS model_q
    FROM z
    """,
    doc="P8 real model-quality scorer: deterministic logistic over quality "
        "features (replaces the reference's constant-0.5 stub, "
        "text_clean_and_filter.py:370-378); EN-stopword lang proxy as in p20",
)
def p08_model_quality(spark, sf_dir):
    d = _docs(spark, sf_dir)
    lang = F.least(F.lit(1.0), metrics.stopword_ratio("text") * F.lit(4.0))
    has_pii = (pii.email_hits("text") + pii.iban_hits("text")) > 0
    return d.select(
        "doc_id",
        scoring.model_quality_score(
            lang,
            metrics.alpha_ratio("text"),
            metrics.repetition_ratio("text"),
            metrics.n_words("text"),
            has_pii,
        ).alias("model_q"),
    )


# ============================================================ filters (§2.3)

_NULL_LIKE = "', '".join(text_norm.NULL_LIKE_STRINGS)


@register(
    "f01_prefilter",
    f"""
    WITH n AS (
      SELECT doc_id, text,
             nullif(trim(regexp_replace(regexp_replace(coalesce(text, NULL),
                    '[\\x00-\\x1f\\x7f-\\x9f]', ' ', 'g'), '\\s+', ' ', 'g')), '') AS text_norm
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN text IS NULL THEN 'missing'
                WHEN text_norm IS NULL THEN 'empty_after_clean'
                WHEN lower(trim(text_norm)) IN ('{_NULL_LIKE}') THEN 'null_like'
                WHEN regexp_matches(text_norm, '^[\\d\\.\\-]+$') THEN 'numeric_like'
                WHEN length(text_norm) < 20 THEN 'too_short_chars'
                WHEN len({O.toks('text_norm')}) < 2 THEN 'too_short_words'
                WHEN length(text_norm) > 100000 THEN 'too_long'
                ELSE NULL END AS drop_reason
    FROM n
    """,
    doc="F1 prefilter cascade (text_clean_and_filter.py:133-184), first-match-wins",
)
def f01_prefilter(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.rules import first_match_expr

    d = _docs(spark, sf_dir)
    d = d.withColumn("text_norm", text_norm.normalize_text_expr("text", nfkc=False))
    norm = F.col("text_norm")
    reason = first_match_expr(
        [
            ("missing", F.col("text").isNull()),
            ("empty_after_clean", norm.isNull()),
            ("null_like", F.lower(F.trim(norm)).isin(*text_norm.NULL_LIKE_STRINGS)),
            ("numeric_like", norm.rlike(r"^[\d\.\-]+$")),
            ("too_short_chars", F.length(norm) < 20),
            ("too_short_words", text_norm.word_count(norm) < 2),
            ("too_long", F.length(norm) > 100_000),
        ]
    )
    return d.select("doc_id", reason.alias("drop_reason"))


@register(
    "f03_quality_filter",
    f"""
    SELECT doc_id,
           CASE WHEN len({O.toks('text')}) < 12 THEN 'too_short'
                WHEN len({O.toks('text')}) > 60 THEN 'too_long'
                WHEN {O.alpha_ratio('text')} < 0.79 THEN 'low_alpha_ratio'
                WHEN {O.repetition_ratio('text')} > 0.55 THEN 'high_repetition'
                ELSE NULL END AS drop_reason
    FROM documents
    """,
    doc="F3 quality cascade shape (text_clean_and_filter.py:537-595); thresholds "
        "tuned to the synthetic corpus so every branch fires",
)
def f03_quality_filter(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.rules import first_match_expr

    d = _docs(spark, sf_dir)
    reason = first_match_expr(
        [
            ("too_short", metrics.n_words("text") < 12),
            ("too_long", metrics.n_words("text") > 60),
            ("low_alpha_ratio", metrics.alpha_ratio("text") < 0.79),
            ("high_repetition", metrics.repetition_ratio("text") > 0.55),
        ]
    )
    return d.select("doc_id", reason.alias("drop_reason"))


@register(
    "f04_low_information",
    f"""
    WITH m AS (
      SELECT doc_id, {O.toks('text')} AS tk FROM documents
    ), freq AS (
      SELECT m.doc_id, max(cnt) AS max_freq, any_value(len(tk)) AS total
      FROM m, (SELECT m2.doc_id AS did, t AS tok, count(*) AS cnt
               FROM m m2, unnest(m2.tk) AS u(t) GROUP BY 1, 2) f
      WHERE f.did = m.doc_id
      GROUP BY m.doc_id
    )
    SELECT doc_id,
           CASE WHEN total >= 3 AND cast(max_freq as double) / cast(total as double) > 0.08
                THEN 'repetitive_token_spam' ELSE NULL END AS drop_reason,
           cast(max_freq as bigint) AS max_token_freq
    FROM freq
    """,
    doc="F4 repetitive-token-spam via max token frequency "
        "(deep_clean_and_pii.py:418-444); Spark side is the shuffle-free "
        "sorted-run HOF, oracle is the unnest+group equivalent",
)
def f04_low_information(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = text_norm.ws_tokens("text")
    max_ratio = metrics.max_token_frequency_ratio("text")
    return d.filter(F.size(toks) > 0).select(
        "doc_id",
        F.when(
            (F.size(toks) >= 3) & (max_ratio > 0.08), F.lit("repetitive_token_spam")
        ).alias("drop_reason"),
        metrics.max_token_frequency("text").alias("max_token_freq"),
    )


# ======================================================== dedup (§2.4, §2.9)


@register(
    "d01_exact_dedup",
    f"""
    WITH c AS (
      SELECT doc_id, cast(doc_id as varchar) AS dedup_id,
             sha256({O.canon_exact('text')}) AS exact_hash
      FROM documents
    )
    SELECT doc_id, exact_hash,
           row_number() OVER w > 1 AS is_dup_exact,
           CASE WHEN row_number() OVER w > 1
                THEN first_value(dedup_id) OVER w ELSE NULL END AS dup_of
    FROM c
    WINDOW w AS (PARTITION BY exact_hash ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="D1 exact dedup keep-first with dup_of lineage (duplication.py:119-143)",
)
def d01_exact_dedup(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = dedup_ops.exact_dedup(d, text_col="text", order_col="doc_id", id_col="doc_id")
    return out.select("doc_id", "exact_hash", "is_dup_exact", "dup_of")


@register(
    "d02_near_dedup",
    f"""
    WITH c AS (
      SELECT doc_id, cast(doc_id as varchar) AS dedup_id,
             {O.canon_exact('text')} AS canon,
             substr({O.canon_exact('text')}, 1, 100) AS near_key
      FROM documents
    ), g AS (
      SELECT *,
             CASE WHEN length(canon) >= 100 AND near_key <> ''
                  THEN near_key ELSE concat(chr(1), dedup_id) END AS grp,
             length(canon) >= 100 AND near_key <> '' AS eligible
      FROM c
    )
    SELECT doc_id,
           eligible AND row_number() OVER w > 1 AS is_dup_near,
           CASE WHEN eligible AND row_number() OVER w > 1
                THEN first_value(dedup_id) OVER w ELSE NULL END AS dup_of
    FROM g
    WINDOW w AS (PARTITION BY grp ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="D2 prefix near-dedup (duplication.py:145-177), min_len=100/key=100 for "
        "the synthetic corpus",
)
def d02_near_dedup(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = dedup_ops.exact_dedup(d, text_col="text", order_col="doc_id", id_col="doc_id")
    # isolate the near stage's semantics: ignore exact-dup marks (fresh frame)
    out = out.withColumn("is_dup_exact", F.lit(False)).withColumn(
        "dup_of", F.lit(None).cast("string")
    ).withColumn("drop_reason", F.lit(None).cast("string"))
    out = dedup_ops.near_dedup_prefix(out, text_col="text", order_col="doc_id",
                                      min_len=100, key_chars=100)
    return out.select("doc_id", "is_dup_near", "dup_of")


_MH_A, _MH_B = hashing.minhash_coeffs(32, seed=42)


@register(
    "d03_minhash_lsh_pairs",
    f"""
    WITH t AS (
      SELECT doc_id, {O.toks('text')} AS tk FROM documents
    ), s AS (
      SELECT doc_id, {O.shingles('tk', 3)} AS sh FROM t
    ), sig AS (
      SELECT doc_id, {O.minhash_signature('sh', _MH_A, _MH_B)} AS sig
      FROM s WHERE len(sh) > 0
    ), banded AS (
      SELECT doc_id, b.band_id,
             array_to_string(list_transform(
               list_slice(sig, b.band_id * 4 + 1, b.band_id * 4 + 4),
               v -> cast(v as varchar)), '-') AS band_sig
      FROM sig, (SELECT unnest(range(0, 8)) AS band_id) b
    )
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r
      ON l.band_id = r.band_id AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id
    """,
    doc="MinHash+LSH candidate pairs (scale near-dup; 32 hashes, 8 bands of 4)",
)
def d03_minhash_lsh_pairs(spark, sf_dir):
    d = _docs(spark, sf_dir)
    # max_bucket_size=None pins the refereed contract: the oracle mirrors
    # exact all-pairs-within-bucket semantics, so the refereed mode must be
    # the uncapped one regardless of fixture bucket sizes (the capped
    # engine default is equivalence-tested in tests/test_dedup.py and
    # regression-guarded at scale in tests/test_scale_paths.py).
    return dedup_ops.minhash_lsh_candidates(
        d, "text", id_col="doc_id", shingle_size=3, num_hashes=32, bands=8, seed=42,
        max_bucket_size=None,
    )


@register(
    "d04_ngram_jaccard_pairs",
    f"""
    WITH t AS (
      SELECT doc_id, {O.toks('text')} AS tk FROM documents
    ), s AS (
      SELECT doc_id, list_distinct({O.shingles('tk', 3)}) AS sh FROM t
      WHERE len({O.shingles('tk', 3)}) > 0
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           cast(n_inter as double)
             / cast(sa.n + sb.n - n_inter as double) AS jaccard
    FROM inter
    JOIN (SELECT doc_id, len(sh) AS n FROM s) sa ON sa.doc_id = id_a
    JOIN (SELECT doc_id, len(sh) AS n FROM s) sb ON sb.doc_id = id_b
    WHERE cast(n_inter as double) / cast(sa.n + sb.n - n_inter as double) >= 0.3
    """,
    doc="Exact n-gram Jaccard near-dup pairs (shingle inverted-index join)",
)
def d04_ngram_jaccard_pairs(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return dedup_ops.ngram_jaccard_pairs(d, "text", id_col="doc_id",
                                         shingle_size=3, threshold=0.3)


@register(
    "d05_simhash",
    f"""
    WITH t AS (SELECT doc_id, {O.toks('text')} AS tk FROM documents),
    h AS (SELECT doc_id, list_transform(tk, x -> {O.h32('x')}) AS hv FROM t),
    bits AS (
      SELECT doc_id,
             list_transform(range(0, 32), i ->
               CASE WHEN coalesce(list_sum(list_transform(hv, v ->
                 CASE WHEN v % (cast(power(2, i + 1) as bigint)) >= cast(power(2, i) as bigint)
                      THEN 1 ELSE -1 END)), 0) > 0
                    THEN cast(power(2, i) as bigint) ELSE 0 END) AS contrib
      FROM h
    )
    SELECT doc_id, cast(coalesce(list_sum(contrib), 0) as bigint) AS simhash
    FROM bits
    """,
    doc="SimHash32 document signature (per-row HOF fold in Spark; unnest "
        "formulation in the oracle)",
)
def d05_simhash(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", hashing.simhash32("text").alias("simhash")
    )


@register(
    "d06_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {O.toks('text')} AS tk FROM documents)
    SELECT doc_id,
           cast(list_reduce(
             list_prepend(0, list_transform(tk, x -> {O.h32('x')})),
             (a, b) -> (a * 1000003 + b) % {O.MERSENNE_31}) as bigint) AS fingerprint
    FROM t
    """,
    doc="Order-sensitive rolling document fingerprint (polynomial hash)",
)
def d06_fingerprint(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", hashing.rolling_fingerprint("text").alias("fingerprint")
    )


# =================================================== aggregation layer (§2.5)


@register(
    "a01_source_counts",
    """
    SELECT source, cast(count(*) as bigint) AS cnt
    FROM documents GROUP BY source
    """,
    doc="A1 value_counts pattern (drop_reason histogram shape) on source",
)
def a01_source_counts(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "a02_boolean_mask_sums",
    f"""
    SELECT cast(count(*) as bigint) AS input_rows,
           cast(count_if(n_chars >= 200) as bigint) AS long_docs,
           cast(count_if(lang = 'en') as bigint) AS en_docs,
           cast(count_if({O.regexp_count('text', pii.EMAIL_RE)} > 0) as bigint) AS docs_with_email
    FROM documents
    """,
    doc="A2 boolean-mask sums (kept/dropped/toxic counters)",
)
def a02_boolean_mask_sums(spark, sf_dir):
    return _docs(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("input_rows"),
        F.count_if(F.col("n_chars") >= 200).alias("long_docs"),
        F.count_if(F.col("lang") == "en").alias("en_docs"),
        F.count_if(pii.email_hits("text") > 0).alias("docs_with_email"),
    )


@register(
    "a05_numeric_summary",
    """
    SELECT cast(count(n_chars) as bigint) AS n_chars_count,
           round(avg(n_chars), 6) AS n_chars_mean,
           cast(min(n_chars) as bigint) AS n_chars_min,
           round(median(n_chars), 6) AS n_chars_median,
           cast(max(n_chars) as bigint) AS n_chars_max
    FROM documents
    """,
    doc="A3-A5 describe block with exact median",
)
def a05_numeric_summary(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count("n_chars").alias("n_chars_count"),
        F.round(F.avg("n_chars"), 6).alias("n_chars_mean"),
        F.min("n_chars").cast("long").alias("n_chars_min"),
        F.round(F.median("n_chars"), 6).alias("n_chars_median"),
        F.max("n_chars").cast("long").alias("n_chars_max"),
    )


@register(
    "a07_histogram",
    """
    SELECT cast(least(19, greatest(0, cast(floor((n_chars - 0.0) / 50.0) as int))) as int) AS bin,
           cast(count(*) as bigint) AS cnt
    FROM documents WHERE n_chars IS NOT NULL
    GROUP BY 1
    """,
    doc="A7 fixed-width histogram (plots_charts.py:53-71): 20 bins of 50 chars",
)
def a07_histogram(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.col("n_chars").isNotNull())
    bin_expr = F.least(
        F.lit(19), F.greatest(F.lit(0), F.floor((F.col("n_chars") - 0.0) / 50.0).cast("int"))
    ).cast("int")
    return d.groupBy(bin_expr.alias("bin")).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "a08_top_sources",
    """
    SELECT source, cast(count(*) as bigint) AS cnt
    FROM documents GROUP BY source
    ORDER BY cnt DESC, source LIMIT 5
    """,
    doc="A8 top-N value counts (plots_charts.py:74-95)",
)
def a08_top_sources(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.aggregates import top_n_counts

    return top_n_counts(_docs(spark, sf_dir), "source", 5).withColumnRenamed("count", "cnt")


@register(
    "a09_lang_breakdown",
    """
    SELECT lang, cast(count(*) as bigint) AS cnt,
           round(avg(n_chars), 6) AS avg_chars,
           cast(sum(n_chars) as bigint) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="A9 column sums per group",
)
def a09_lang_breakdown(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ===================================================== sort/shard/sample (§2.6)


@register(
    "o02_shard_assign",
    """
    SELECT doc_id,
           cast(floor((row_number() OVER (ORDER BY doc_id) - 1) / 100) as int) AS shard_id
    FROM documents
    """,
    doc="O2 positional sharding (sharding.py:104-148), 100 docs/shard",
)
def o02_shard_assign(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.sharding import assign_shards

    return assign_shards(_docs(spark, sf_dir), docs_per_shard=100, order_col="doc_id").select(
        "doc_id", "shard_id"
    )


@register(
    "o02b_shard_manifest",
    """
    WITH s AS (
      SELECT doc_id, n_chars,
             cast(floor((row_number() OVER (ORDER BY doc_id) - 1) / 100) as int) AS shard_id
      FROM documents
    )
    SELECT shard_id, cast(count(*) as bigint) AS num_docs,
           cast(sum(n_chars) as bigint) AS total_chars
    FROM s GROUP BY shard_id
    """,
    doc="A6 per-shard manifest aggregates (sharding.py:150-171)",
)
def o02b_shard_manifest(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.sharding import assign_shards

    sharded = assign_shards(_docs(spark, sf_dir), docs_per_shard=100, order_col="doc_id")
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("num_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "o03_toy_sample",
    """
    SELECT doc_id FROM documents
    ORDER BY md5(cast(doc_id as varchar)) LIMIT 50
    """,
    doc="O3 deterministic toy sample (sharding.py:181-202; content-keyed order "
        "replaces pandas random_state)",
)
def o03_toy_sample(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.sharding import toy_sample

    return toy_sample(_docs(spark, sf_dir), n=50, id_col="doc_id").select("doc_id")


@register(
    "d17_minhash_est_error",
    f"""
    WITH t AS (
      SELECT doc_id, {O.toks('text')} AS tk FROM documents
    ), s AS (
      SELECT doc_id, list_distinct({O.shingles('tk', 3)}) AS sh FROM t
      WHERE len({O.shingles('tk', 3)}) > 0
    ), e AS (
      SELECT doc_id, unnest(sh) AS g FROM s
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), exact AS (
      SELECT id_a, id_b,
             cast(n_inter as double)
               / cast(sa.n + sb.n - n_inter as double) AS jaccard
      FROM inter
      JOIN (SELECT doc_id, len(sh) AS n FROM s) sa ON sa.doc_id = id_a
      JOIN (SELECT doc_id, len(sh) AS n FROM s) sb ON sb.doc_id = id_b
      WHERE cast(n_inter as double)
            / cast(sa.n + sb.n - n_inter as double) >= 0.3
    ), sig AS (
      SELECT doc_id, {O.minhash_signature('sh', _MH_A, _MH_B)} AS sig
      FROM (SELECT doc_id, {O.shingles('tk', 3)} AS sh FROM t)
      WHERE len(sig) > 0
    )
    SELECT x.id_a, x.id_b, x.jaccard,
           cast(len(list_filter(range(1, 33),
                                j -> la.sig[j] = lb.sig[j])) as double)
             / 32.0 AS est_jaccard,
           round(cast(len(list_filter(range(1, 33),
                                      j -> la.sig[j] = lb.sig[j])) as double)
                 / 32.0 - x.jaccard, 6) AS est_error
    FROM exact x
    JOIN sig la ON la.doc_id = x.id_a
    JOIN sig lb ON lb.doc_id = x.id_b
    """,
    doc="MinHash estimator-quality audit: for every exact near-dup pair "
        "(n-gram Jaccard >= 0.3), the 32-hash MinHash estimate (matching "
        "signature components / 32 — a dyadic rational, engine-exact) and "
        "its signed error vs the true Jaccard. This is the calibration "
        "check run before trusting LSH band/row settings at scale: "
        "E[est] = J with sd sqrt(J(1-J)/32) (Broder), so systematic error "
        "here means the shingle or hash pipeline is broken. Reuses the "
        "d03 coefficients so the audited signature IS the production one",
)
def d17_minhash_est_error(spark, sf_dir):
    # Registry fixture stays on the BRUTE exact-Jaccard index for referee
    # determinism; the operator carries the candidates=/max_shingle_df=
    # scale valve (same contract as d04/d16) for production callers —
    # see tests/test_dedup.py::test_minhash_est_error_* for the
    # candidates-fed plan shape and brute-equivalence checks.
    return dedup_ops.minhash_estimate_error(
        _docs(spark, sf_dir),
        "text",
        id_col="doc_id",
        shingle_size=3,
        threshold=0.3,
        num_hashes=32,
        seed=42,
    )


@register(
    "d18_minhash_est_error_lsh",
    f"""
    WITH t AS (
      SELECT doc_id, {O.toks('text')} AS tk FROM documents
    ), raw AS (
      SELECT doc_id, {O.shingles('tk', 3)} AS sh FROM t
    ), sd AS (
      SELECT doc_id, list_distinct(sh) AS sh FROM raw WHERE len(sh) > 0
    ), sig AS (
      SELECT doc_id, {O.minhash_signature('sh', _MH_A, _MH_B)} AS sig
      FROM raw WHERE len(sh) > 0
    ), banded AS (
      SELECT doc_id, b.band_id,
             array_to_string(list_transform(
               list_slice(sig, b.band_id * 4 + 1, b.band_id * 4 + 4),
               v -> cast(v as varchar)), '-') AS band_sig
      FROM sig, (SELECT unnest(range(0, 8)) AS band_id) b
    ), cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM banded l JOIN banded r
        ON l.band_id = r.band_id AND l.band_sig = r.band_sig
       AND l.doc_id < r.doc_id
    ), exact AS (
      SELECT c.id_a, c.id_b,
             cast(len(list_intersect(sa.sh, sb.sh)) as double)
               / cast(len(sa.sh) + len(sb.sh)
                      - len(list_intersect(sa.sh, sb.sh)) as double) AS jaccard
      FROM cand c
      JOIN sd sa ON sa.doc_id = c.id_a
      JOIN sd sb ON sb.doc_id = c.id_b
      WHERE cast(len(list_intersect(sa.sh, sb.sh)) as double)
            / cast(len(sa.sh) + len(sb.sh)
                   - len(list_intersect(sa.sh, sb.sh)) as double) >= 0.3
    )
    SELECT x.id_a, x.id_b, x.jaccard,
           cast(len(list_filter(range(1, 33),
                                j -> la.sig[j] = lb.sig[j])) as double)
             / 32.0 AS est_jaccard,
           round(cast(len(list_filter(range(1, 33),
                                      j -> la.sig[j] = lb.sig[j])) as double)
                 / 32.0 - x.jaccard, 6) AS est_error
    FROM exact x
    JOIN sig la ON la.doc_id = x.id_a
    JOIN sig lb ON lb.doc_id = x.id_b
    """,
    doc="d17's MinHash calibration audit THROUGH the LSH scale valve: the "
        "candidate set is the d03 banded-collision frame, so the exact-"
        "Jaccard side verifies only O(|candidates|) pairs — the 100 TB "
        "shape — and the refereed answer proves the candidates= plumbing "
        "end-to-end (banding CTE shared with d03; exact Jaccard via "
        "distinct-shingle intersection lengths, integer-derived)",
)
def d18_minhash_est_error_lsh(spark, sf_dir):
    d = _docs(spark, sf_dir)
    cand = dedup_ops.minhash_lsh_candidates(
        d, "text", id_col="doc_id", shingle_size=3, num_hashes=32, bands=8,
        seed=42, max_bucket_size=None,
    )
    return dedup_ops.minhash_estimate_error(
        d, "text", id_col="doc_id", shingle_size=3, threshold=0.3,
        num_hashes=32, seed=42, candidates=cand,
    )


_BLOOM_M, _BLOOM_K = 2048, 3  # fixture-small m so false positives are real


@register(
    "d19_bloom_dedup",
    f"""
    WITH keyed AS (
      SELECT doc_id, sha256({O.canon_exact('text')}) AS key FROM documents
    ),
    hist AS (SELECT DISTINCT key FROM keyed WHERE doc_id % 3 <> 0),
    pos AS (
      SELECT DISTINCT
             ({O.h64("key || ':' || cast(j AS varchar)")} % {_BLOOM_M}) AS p
      FROM hist, unnest(range(0, {_BLOOM_K})) AS u(j)
    ),
    expanded AS (
      SELECT doc_id, key,
             ({O.h64("key || ':' || cast(j AS varchar)")} % {_BLOOM_M}) AS pp
      FROM keyed, unnest(range(0, {_BLOOM_K})) AS u(j)
    ),
    probe AS (
      SELECT doc_id, bool_and(pp IN (SELECT p FROM pos)) AS maybe_seen
      FROM expanded GROUP BY doc_id
    )
    SELECT k.doc_id, pr.maybe_seen,
           k.key IN (SELECT key FROM hist) AS seen,
           pr.maybe_seen AND k.key NOT IN (SELECT key FROM hist)
             AS false_positive
    FROM keyed k JOIN probe pr USING (doc_id)
    """,
    doc="Dolma-style Bloom-filter incremental dedup (operators/bloom.py): "
        "build a Bloom filter over the 'historical' corpus slice "
        "(doc_id%3!=0, sha256 canonical-text keys), probe EVERY doc "
        "against it — maybe_seen (the filter's answer), seen (exact "
        "ground truth), false_positive (the filter's deterministic "
        "errors; zero false negatives by construction). The filter is "
        "32-bit lanes built with one bit_or shuffle; the probe is k "
        "broadcast joins with ZERO shuffles of the probed corpus "
        "(plan-tested in tests/test_bloom.py). The oracle recomputes "
        "membership from the identical md5 bit positions — the FP SET "
        "matches, not just the rate. Fixture-small m=2048/k=3 makes "
        "false positives actually occur; production sizes m to the key "
        "count (~1.2 GB per 10^9 keys at 1% FP)",
)
def d19_bloom_dedup(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators import bloom

    keyed = _docs(spark, sf_dir).select(
        "doc_id",
        hashing.sha256_hex(text_norm.canonicalize_for_exact("text")).alias(
            "key"
        ),
    )
    hist = keyed.filter(F.col("doc_id") % 3 != 0).select("key").distinct()
    filt = bloom.bloom_build(hist, m_bits=_BLOOM_M, k=_BLOOM_K)
    probed = bloom.bloom_probe(
        keyed, filt, m_bits=_BLOOM_M, k=_BLOOM_K, out_col="maybe_seen"
    )
    seen = hist.withColumnRenamed("key", "_sk").withColumn(
        "_seen", F.lit(True)
    )
    out = probed.join(
        F.broadcast(seen), probed["key"] == seen["_sk"], "left"
    )
    is_seen = F.coalesce(F.col("_seen"), F.lit(False))
    return out.select(
        "doc_id",
        "maybe_seen",
        is_seen.alias("seen"),
        (F.col("maybe_seen") & ~is_seen).alias("false_positive"),
    )
