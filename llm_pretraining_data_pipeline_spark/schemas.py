"""Explicit schemas for the document table and its stage checkpoints.

The reference infers every schema at read time (ingest.py:43) — a scale
liability the survey calls out (SURVEY.md §1). Here every boundary has a
declared ``StructType`` so parquet/JSONL scans never pay inference and so
column pruning is exact.

Column catalogue mirrors SURVEY.md §1 / FIXTURES.md §2.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- raw input
# The pipeline's sole input: line-delimited JSON with url + text
# (reference required columns: ingest.py:82-85).
RAW_DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# ------------------------------------------------------------- stage deltas
# Stage 1 (ingest) adds provenance + identity (ingest.py:90-139).
INGEST_COLUMNS = [
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("ingest_ts", T.TimestampType(), False),
    # Deterministic encounter-order column: pandas keeps implicit row order;
    # a distributed engine must materialise it for keep-first dedup semantics.
    T.StructField("row_order", T.LongType(), False),
]

CLEANED_V2_COLUMNS = [
    T.StructField("text_norm", T.StringType(), True),
    T.StructField("char_len", T.LongType(), True),
    T.StructField("word_count", T.LongType(), True),
    T.StructField("drop_reason", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
    T.StructField("n_words", T.LongType(), True),
    T.StructField("alpha_ratio", T.DoubleType(), True),
    T.StructField("repetition_ratio", T.DoubleType(), True),
    T.StructField("lang_pred", T.StringType(), True),
    T.StructField("lang_score", T.DoubleType(), True),
    T.StructField("non_latin_ratio", T.DoubleType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("email_hits", T.LongType(), True),
    T.StructField("phone_hits", T.LongType(), True),
    T.StructField("toxicity", T.DoubleType(), True),
    T.StructField("severe_toxicity", T.DoubleType(), True),
    T.StructField("obscene", T.DoubleType(), True),
    T.StructField("threat", T.DoubleType(), True),
    T.StructField("insult", T.DoubleType(), True),
    T.StructField("identity_attack", T.DoubleType(), True),
    T.StructField("model_q", T.DoubleType(), True),
]

CLEANED_V4_COLUMNS = [
    T.StructField("text_deep_clean", T.StringType(), True),
    T.StructField("token_count", T.LongType(), True),
    T.StructField("unique_tokens", T.LongType(), True),
    T.StructField("unique_token_ratio", T.DoubleType(), True),
    T.StructField("stopword_ratio", T.DoubleType(), True),
    T.StructField("text_pii_masked", T.StringType(), True),
    T.StructField("pii_email_hits", T.LongType(), True),
    T.StructField("pii_phone_hits", T.LongType(), True),
    T.StructField("pii_cc_hits", T.LongType(), True),
    T.StructField("pii_iban_hits", T.LongType(), True),
    T.StructField("has_pii", T.BooleanType(), True),
]

DEDUP_V5_COLUMNS = [
    T.StructField("dedup_id", T.StringType(), True),
    T.StructField("exact_canon_text", T.StringType(), True),
    T.StructField("exact_hash", T.StringType(), True),
    T.StructField("is_dup_exact", T.BooleanType(), True),
    T.StructField("dup_of", T.StringType(), True),
    T.StructField("near_key", T.StringType(), True),
    T.StructField("is_dup_near", T.BooleanType(), True),
]

SCORED_V6_COLUMNS = [
    T.StructField("quality_score", T.DoubleType(), True),
    T.StructField("mixture_name", T.StringType(), True),
    T.StructField("subset", T.StringType(), True),
]

TOKENISED_V7_COLUMNS = [
    T.StructField("input_ids", T.ArrayType(T.IntegerType()), True),
    T.StructField("attention_mask", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tokens", T.LongType(), True),
]


def _extend(base: T.StructType, cols: list[T.StructField]) -> T.StructType:
    return T.StructType(list(base.fields) + cols)


INGESTED_SCHEMA = _extend(RAW_DOCUMENT_SCHEMA, INGEST_COLUMNS)
CLEANED_V2_SCHEMA = _extend(INGESTED_SCHEMA, CLEANED_V2_COLUMNS)
CLEANED_V4_SCHEMA = _extend(CLEANED_V2_SCHEMA, CLEANED_V4_COLUMNS)
DEDUP_V5_SCHEMA = _extend(CLEANED_V4_SCHEMA, DEDUP_V5_COLUMNS)
SCORED_V6_SCHEMA = _extend(DEDUP_V5_SCHEMA, SCORED_V6_COLUMNS)
TOKENISED_V7_SCHEMA = _extend(SCORED_V6_SCHEMA, TOKENISED_V7_COLUMNS)

# ------------------------------------------------------- driver test tables
# /root/testdata/sf*/ star schema (TESTDATA.md). Declared so scans never
# infer and so `events`'s nano timestamps get an explicit conversion.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal extension: opaque binary payload + typed metadata
# (prompt-mandated extension; decode is stubbed, plumbing is real).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)
