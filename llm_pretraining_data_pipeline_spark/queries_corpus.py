"""Query surface, batch 4: corpus-level training-data analytics —
Gopher repetition signals, cross-document n-gram duplication, paragraph
dedup, deterministic stratified sampling, mixture weights, vocabulary.

These extend the reference (which computes only within-doc scalar ratios,
text_clean_and_filter.py:206-236) with the corpus-wide signals a web-scale
pretraining pipeline needs. Registered into the shared ``QUERIES`` dict.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark import oracle_fragments as O
from llm_pretraining_data_pipeline_spark.operators import corpus
from llm_pretraining_data_pipeline_spark.queries import _docs, register

# ====================================================== repetition signals

_TOP_NS = (2, 3)
_DUP_NS = (5, 10)


def _rep_signals_oracle() -> str:
    lines = O.trimmed_lines("text")
    ctes = [
        f"w AS (SELECT doc_id, coalesce(text,'') AS t, {O.toks('text')} AS w, "
        f"{lines} AS lines FROM documents)"
    ]
    for n in _TOP_NS + _DUP_NS:
        g = O.word_ngrams("w", n)
        ctes.append(
            f"c{n} AS (SELECT doc_id, gram, cast(count(*) as bigint) AS cnt "
            f"FROM (SELECT doc_id, unnest({g}) AS gram FROM w) GROUP BY doc_id, gram)"
        )
    for n in _TOP_NS:
        ctes.append(
            f"t{n} AS (SELECT doc_id, cnt, gram FROM (SELECT doc_id, cnt, gram, "
            f"row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn "
            f"FROM c{n}) WHERE rn = 1)"
        )
    for n in _DUP_NS:
        ctes.append(
            f"d{n} AS (SELECT doc_id, "
            f"cast(coalesce(sum(length(gram) * cnt) FILTER (WHERE cnt > 1), 0) as bigint) AS dup_chars, "
            f"cast(coalesce(sum(length(gram) * cnt), 0) as bigint) AS tot_chars "
            f"FROM c{n} GROUP BY doc_id)"
        )
    nl = "cast(len(lines) as bigint)"
    uniq = "list_distinct(lines)"
    line_chars = O.list_char_sum("lines")
    uniq_chars = O.list_char_sum(uniq)
    sel = [
        "w.doc_id",
        f"{nl} AS n_lines",
        f"case when len(lines) > 0 then cast({nl} - len({uniq}) as double) / cast({nl} as double) "
        "else 0.0 end AS dup_line_frac",
        f"case when {line_chars} > 0 then cast({line_chars} - {uniq_chars} as double) "
        f"/ cast({line_chars} as double) else 0.0 end AS dup_line_char_frac",
    ]
    joins = []
    for n in _TOP_NS:
        sel.append(
            f"case when length(t) > 0 then cast(coalesce(t{n}.cnt * length(t{n}.gram), 0) as double) "
            f"/ cast(length(t) as double) else 0.0 end AS top{n}gram_char_frac"
        )
        joins.append(f"LEFT JOIN t{n} ON t{n}.doc_id = w.doc_id")
    for n in _DUP_NS:
        sel.append(
            f"case when coalesce(d{n}.tot_chars, 0) > 0 then cast(d{n}.dup_chars as double) "
            f"/ cast(d{n}.tot_chars as double) else 0.0 end AS dup{n}gram_char_frac"
        )
        joins.append(f"LEFT JOIN d{n} ON d{n}.doc_id = w.doc_id")
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT " + ", ".join(sel) + "\nFROM w "
        + " ".join(joins)
    )


@register(
    "corp_rep_signals",
    _rep_signals_oracle(),
    doc="Gopher repetition rules (Rae et al. 2021 A1): dup-line and "
    "top/dup-n-gram char fractions; shuffle-free HOF run-length scan",
)
def corp_rep_signals(spark, sf_dir):
    return corpus.repetition_signals(
        _docs(spark, sf_dir), top_ngram_sizes=_TOP_NS, dup_ngram_sizes=_DUP_NS
    )


# ================================================= cross-doc n-gram dedup

_CROSS_N = 5


@register(
    "corp_cross_dup_ngrams",
    f"""
    WITH w AS (SELECT doc_id, {O.toks('text')} AS w FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct({O.word_ngrams('w', _CROSS_N)})) AS gram FROM w),
    c AS (SELECT gram, cast(count(*) as bigint) AS nd FROM g GROUP BY gram),
    p AS (SELECT doc_id, cast(count(*) as bigint) AS n_grams,
                 cast(count(*) FILTER (WHERE nd >= 2) as bigint) AS n_dup
          FROM g JOIN c USING (gram) GROUP BY doc_id)
    SELECT d.doc_id,
           cast(coalesce(n_grams, 0) as bigint) AS n_grams,
           cast(coalesce(n_dup, 0) as bigint) AS n_dup_grams,
           case when coalesce(n_grams, 0) > 0
                then cast(coalesce(n_dup, 0) as double) / cast(n_grams as double)
                else 0.0 end AS cross_dup_frac
    FROM documents d LEFT JOIN p USING (doc_id)
    """,
    doc="per-doc share of distinct 5-grams appearing in >=2 docs "
    "(boilerplate signal); word-count shuffle shape on 60-bit gram hashes",
)
def corp_cross_dup_ngrams(spark, sf_dir):
    return corpus.cross_doc_dup_ngram_stats(_docs(spark, sf_dir), n=_CROSS_N)


# ======================================================== paragraph dedup

_SEP_SQL = "chr(10) || chr(10)"


@register(
    "corp_para_dedup",
    f"""
    WITH sp AS (SELECT doc_id,
                       list_transform(str_split(coalesce(text,''), {_SEP_SQL}),
                                      p -> trim(p)) AS paras
                FROM documents),
    px AS (SELECT doc_id, u.i AS pos, paras[u.i] AS para
           FROM sp, unnest(range(1, len(paras) + 1)) AS u(i)
           WHERE paras[u.i] <> ''),
    k AS (SELECT doc_id, pos, para,
                 row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
          FROM px),
    r AS (SELECT doc_id,
                 string_agg(para, {_SEP_SQL} ORDER BY pos) AS dedup_text,
                 cast(count(*) as bigint) AS n_paras_kept
          FROM k WHERE rn = 1 GROUP BY doc_id),
    o AS (SELECT doc_id, cast(len(list_filter(paras, p -> p <> '')) as bigint)
                 AS n_paras_orig
          FROM sp)
    SELECT o.doc_id,
           coalesce(dedup_text, '') AS dedup_text,
           cast(coalesce(n_paras_kept, 0) as bigint) AS n_paras_kept,
           n_paras_orig
    FROM o LEFT JOIN r USING (doc_id)
    """,
    doc="corpus-wide keep-first paragraph dedup with doc reassembly "
    "(RefinedWeb-style); window on para sha256 + per-doc agg",
)
def corp_para_dedup(spark, sf_dir):
    return corpus.paragraph_dedup(_docs(spark, sf_dir))


# ================================================== deterministic sampling

_SAMPLE_FRACTIONS = {"en": 0.8, "de": 0.5, "fr": 0.25, "es": 0.1, "zh": 0.05}


def _sample_case() -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN '{corpus.stratum_threshold_hex(v)}'"
        for k, v in sorted(_SAMPLE_FRACTIONS.items())
    )
    return f"CASE lang {arms} ELSE '{corpus.stratum_threshold_hex(0.0)}' END"


@register(
    "corp_stratified_sample",
    f"""
    SELECT doc_id, lang, source,
           substr(sha256(cast(doc_id as varchar) || ':stratum'), 1, 8)
             AS sample_bucket
    FROM documents
    WHERE substr(sha256(cast(doc_id as varchar) || ':stratum'), 1, 8)
          < {_sample_case()}
    """,
    doc="deterministic per-language subsample via sha256 threshold — "
    "reproducible across engines/runs, narrow filter, no RNG",
)
def corp_stratified_sample(spark, sf_dir):
    return corpus.hash_stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "source"),
        "lang",
        _SAMPLE_FRACTIONS,
    )


@register(
    "corp_mixture_weights",
    """
    WITH c AS (SELECT lang, cast(count(*) as bigint) AS n_docs
               FROM documents GROUP BY lang),
    p AS (SELECT lang, n_docs,
                 cast(n_docs as double) / cast(sum(n_docs) OVER () as double) AS p
          FROM c)
    SELECT lang, n_docs, round(p, 6) AS p_raw,
           round(sqrt(p) / sum(sqrt(p)) OVER (), 6) AS mix_weight
    FROM p
    """,
    doc="temperature-0.5 (sqrt) mixture weights per language, normalised; "
    "window renorm over the tiny aggregated frame only",
)
def corp_mixture_weights(spark, sf_dir):
    return corpus.mixture_weights(_docs(spark, sf_dir), "lang")


# ============================================================= vocabulary

_VOCAB_K = 50


@register(
    "corp_vocab_top50",
    f"""
    SELECT token, cast(count(*) as bigint) AS cnt
    FROM (SELECT unnest({O.toks("lower(text)")}) AS token FROM documents)
    GROUP BY token ORDER BY cnt DESC, token ASC LIMIT {_VOCAB_K}
    """,
    doc="global lowercase token top-50 (word-count shape, total-ordered)",
)
def corp_vocab_top50(spark, sf_dir):
    return corpus.vocab_top_tokens(_docs(spark, sf_dir), k=_VOCAB_K)


# ========================================================== decontamination

_DECON_N = 5
_DECON_MOD = 20  # h64(doc_id) % 20 == 0 → ~5% of docs act as the eval set


@register(
    "corp_decontaminate",
    f"""
    WITH w AS (SELECT doc_id,
                      list_distinct({O.word_ngrams(O.toks('text'), _DECON_N)}) AS grams,
                      ({O.h64('cast(doc_id as varchar)')} % {_DECON_MOD} = 0) AS is_eval
               FROM documents),
    e AS (SELECT DISTINCT {O.h64('gram')} AS gh
          FROM (SELECT unnest(grams) AS gram FROM w WHERE is_eval)),
    g AS (SELECT doc_id, {O.h64('gram')} AS gh
          FROM (SELECT doc_id, unnest(grams) AS gram FROM w WHERE NOT is_eval)),
    h AS (SELECT doc_id, cast(count(*) as bigint) AS n_hit
          FROM g WHERE gh IN (SELECT gh FROM e) GROUP BY doc_id)
    SELECT w.doc_id,
           cast(len(grams) as bigint) AS n_grams,
           cast(coalesce(n_hit, 0) as bigint) AS n_hit,
           case when len(grams) > 0
                then cast(coalesce(n_hit, 0) as double) / cast(len(grams) as double)
                else 0.0 end AS contam_frac,
           coalesce(n_hit, 0) >= 1 AS contaminated
    FROM w LEFT JOIN h USING (doc_id) WHERE NOT is_eval
    """,
    doc="test-set decontamination (GPT-3 appendix C shape): per-doc 5-gram "
    "overlap with a held-out eval subset; broadcast eval-gram semi-join. "
    "Both sides probe on the same 60-bit h64 gram hash (as the engine does "
    "at scale to keep the broadcast narrow), so the referee is symmetric — "
    "a raw-string oracle join would flip `contaminated` on an h64 collision "
    "(~2^-60 per gram pair) with no tolerance in the hash compare",
)
def corp_decontaminate(spark, sf_dir):
    from pyspark.sql import functions as F

    from llm_pretraining_data_pipeline_spark.functions.hashing import h64

    docs = _docs(spark, sf_dir)
    is_eval = (h64(F.col("doc_id")) % _DECON_MOD) == 0
    return corpus.benchmark_overlap(
        docs.filter(~is_eval), docs.filter(is_eval), n=_DECON_N
    )


# ========================================================= sequence packing

_SEQ_LEN = 128
_PACK_SHARDS = 8


def _pack_base_sql() -> str:
    shard = f"({O.h64('cast(doc_id as varchar)')} % {_PACK_SHARDS})"
    return (
        f"b AS (SELECT doc_id, cast({shard} as int) AS shard, "
        f"cast(len({O.toks('text')}) as bigint) AS n_tok FROM documents),\n"
        "c AS (SELECT doc_id, shard, n_tok, sum(n_tok) OVER "
        "(ORDER BY shard, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS cum FROM b),\n"
        "s AS (SELECT doc_id, shard, n_tok, "
        "cast(cum - n_tok as bigint) AS tok_start, cast(cum as bigint) AS tok_end, "
        f"cast(case when n_tok > 0 then (cum - n_tok) // {_SEQ_LEN} end as bigint) AS seq_first, "
        f"cast(case when n_tok > 0 then (cum - 1) // {_SEQ_LEN} end as bigint) AS seq_last FROM c)"
    )


def _pack_docs(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions import metrics

    return _docs(spark, sf_dir).select(
        "doc_id", metrics.n_words("text").alias("n_tok")
    )


@register(
    "corp_pack_spans",
    f"WITH {_pack_base_sql()}\nSELECT doc_id, shard, n_tok, tok_start, tok_end, "
    "seq_first, seq_last FROM s",
    doc="GPT-style concat-and-chunk packing spans; two-phase cumsum "
    "(per-shard window + broadcast prefix offsets), no global-order window",
)
def corp_pack_spans(spark, sf_dir):
    return corpus.pack_sequences(
        _pack_docs(spark, sf_dir), _SEQ_LEN, nshards=_PACK_SHARDS
    )


@register(
    "corp_pack_manifest",
    f"""
    WITH {_pack_base_sql()},
    m AS (SELECT doc_id, tok_start, tok_end, u.s AS seq_id
          FROM s, unnest(range(seq_first, seq_last + 1)) AS u(s)
          WHERE n_tok > 0)
    SELECT seq_id, doc_id,
           greatest(tok_start, seq_id * {_SEQ_LEN}) - seq_id * {_SEQ_LEN} AS offset_in_seq,
           least(tok_end, (seq_id + 1) * {_SEQ_LEN})
             - greatest(tok_start, seq_id * {_SEQ_LEN}) AS slice_len,
           greatest(tok_start, seq_id * {_SEQ_LEN}) - tok_start AS doc_tok_start
    FROM m
    """,
    doc="exploded (sequence, doc) slice manifest — the loader-side contract "
    "for assembling packed training batches",
)
def corp_pack_manifest(spark, sf_dir):
    return corpus.pack_manifest(
        _pack_docs(spark, sf_dir), _SEQ_LEN, nshards=_PACK_SHARDS
    )


# ============================================================= span dedup

_SPAN_W = 12


@register(
    "corp_span_dedup",
    f"""
    WITH wd AS (SELECT doc_id, {O.toks('text')} AS w FROM documents),
    g AS (SELECT doc_id, u.i AS start,
                 {O.h64("array_to_string(list_slice(w, u.i, u.i + " + str(_SPAN_W - 1) + "), ' ')")} AS gh
          FROM wd, unnest(range(1, len(w) - {_SPAN_W} + 2)) AS u(i)),
    r AS (SELECT doc_id, start,
                 row_number() OVER (PARTITION BY gh ORDER BY doc_id, start) AS rn
          FROM g),
    l AS (SELECT doc_id, list(start) AS dup_starts,
                 cast(count(*) as bigint) AS n_dup_windows
          FROM r WHERE rn > 1 GROUP BY doc_id),
    k AS (SELECT wd.doc_id, wd.w,
                 coalesce(l.dup_starts, []) AS ds, l.n_dup_windows,
                 list_filter(
                   list_transform(range(1, len(wd.w) + 1),
                     p -> CASE WHEN len(list_filter(coalesce(l.dup_starts, []),
                                        s -> p >= s AND p < s + {_SPAN_W})) = 0
                               THEN wd.w[p] END),
                   t -> t IS NOT NULL) AS kept
          FROM wd LEFT JOIN l USING (doc_id))
    SELECT doc_id,
           coalesce(array_to_string(kept, ' '), '') AS dedup_text,
           cast(len(w) as bigint) AS n_tok_orig,
           cast(len(kept) as bigint) AS n_tok_kept,
           cast(coalesce(n_dup_windows, 0) as bigint) AS n_dup_windows
    FROM k
    """,
    doc="ExactSubstr-style span dedup (Lee et al. 2022): duplicated "
    f"{_SPAN_W}-token windows keep their first corpus-wide occurrence; "
    "covered tokens are removed and docs reassembled. One hash-keyed "
    "keep-first shuffle, HOF rebuild",
)
def corp_span_dedup(spark, sf_dir):
    return corpus.span_dedup(_docs(spark, sf_dir), w=_SPAN_W)


# Arbitrary-length ExactSubstr: min match length (shingle width). The
# fixture plants a 15-word shared passage (3 variants) at the START of
# even docs and the END of odd docs, so repeats occur at UNALIGNED token
# offsets and each occurrence spans 6 consecutive shingles that must
# stitch into ONE 15-token maximal run.
_ESUB_K = 10
_ESUB_PASSAGE_SQL = (
    "'shared repeated passage alpha bravo charlie delta echo foxtrot golf "
    "hotel india variant' || cast(doc_id % 3 as varchar) || ' kilo lima'"
)


# The full d13 referee SQL lives in a module constant so d15 (the
# per-source duplication AUDIT over the same dedup) can reuse it verbatim
# as a nested CTE — one source of truth for the ExactSubstr semantics.
_D13_SQL = f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN {_ESUB_PASSAGE_SQL} || ' ' || coalesce(text, '')
                  ELSE coalesce(text, '') || ' ' || {_ESUB_PASSAGE_SQL} END
               AS t
      FROM documents
    ),
    wd AS (SELECT doc_id, {O.toks('t')} AS w FROM d),
    g AS (SELECT doc_id, u.i AS start,
                 {O.h64("array_to_string(list_slice(w, u.i, u.i + " + str(_ESUB_K - 1) + "), ' ')")} AS gh
          FROM wd, unnest(range(1, len(w) - {_ESUB_K} + 2)) AS u(i)),
    r AS (SELECT doc_id, start,
                 row_number() OVER (PARTITION BY gh ORDER BY doc_id, start) AS rn
          FROM g),
    l AS (SELECT doc_id, start FROM r WHERE rn > 1),
    b AS (SELECT doc_id, start,
                 CASE WHEN start > coalesce(max(start + {_ESUB_K}) OVER (
                        PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                      THEN 1 ELSE 0 END AS brk
          FROM l),
    i2 AS (SELECT doc_id, start,
                  sum(brk) OVER (PARTITION BY doc_id ORDER BY start) AS island
           FROM b),
    runs AS (SELECT doc_id, min(start) AS lo, max(start) + {_ESUB_K} AS hi
             FROM i2 GROUP BY doc_id, island),
    rstats AS (SELECT doc_id, cast(count(*) as bigint) AS n_dup_runs,
                      cast(max(hi - lo) as bigint) AS max_run_tokens
               FROM runs GROUP BY doc_id),
    ds AS (SELECT doc_id, list(start) AS dup_starts FROM l GROUP BY doc_id),
    k2 AS (SELECT wd.doc_id, wd.w,
                  list_filter(
                    list_transform(range(1, len(wd.w) + 1),
                      p -> CASE WHEN len(list_filter(
                                     coalesce(ds.dup_starts, []),
                                     s -> p >= s AND p < s + {_ESUB_K})) = 0
                                THEN wd.w[p] END),
                    t -> t IS NOT NULL) AS kept
           FROM wd LEFT JOIN ds USING (doc_id))
    SELECT k2.doc_id,
           coalesce(array_to_string(kept, ' '), '') AS dedup_text,
           cast(len(w) as bigint) AS n_tok_orig,
           cast(len(kept) as bigint) AS n_tok_kept,
           cast(coalesce(n_dup_runs, 0) as bigint) AS n_dup_runs,
           cast(coalesce(max_run_tokens, 0) as bigint) AS max_run_tokens
    FROM k2 LEFT JOIN rstats USING (doc_id)
    """


@register(
    "d13_exact_substr",
    _D13_SQL,
    doc="arbitrary-length ExactSubstr dedup (Lee et al. 2022 suffix-array "
        f"semantics via shingle-chain stitching): duplicated >={_ESUB_K}-"
        "token repeats at ANY offset keep their first corpus-wide "
        "occurrence; overlapping losing shingles stitch into MAXIMAL "
        "duplicate runs (the planted 15-word passage surfaces as one "
        "15-token run, not six window counts). One keep-first shuffle on "
        "60-bit hashes; the oracle stitches with gaps-and-islands SQL",
)
def d13_exact_substr(spark, sf_dir):
    return corpus.exact_substr_dedup(_esub_frame(spark, sf_dir),
                                     min_tokens=_ESUB_K)


def _esub_frame(spark, sf_dir):
    """The shared d13/d15 derived fixture: the 15-word planted passage at
    unaligned offsets (START of even docs, END of odd docs)."""
    passage = F.concat(
        F.lit(
            "shared repeated passage alpha bravo charlie delta echo foxtrot "
            "golf hotel india variant"
        ),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(" kilo lima"),
    )
    base = F.coalesce(F.col("text"), F.lit(""))
    t = F.when(
        F.col("doc_id") % 2 == 0, F.concat(passage, F.lit(" "), base)
    ).otherwise(F.concat(base, F.lit(" "), passage))
    return _docs(spark, sf_dir).select("doc_id", t.alias("text"))


# ===================================================== Gopher quality filter

_GOPHER_STOPS = corpus.GOPHER_STOPWORDS  # single source of truth
# fixture-scaled knobs (docs are 10-99 words of near-stopword-free word
# soup; the paper's min_words=50 / min 2 distinct stopwords would drop the
# whole corpus at the first two rules and mask every later one)
_GOPHER_MIN_WORDS = 20
_GOPHER_MIN_STOPS = 1


def _gopher_oracle() -> str:
    stops = "[" + ",".join(f"'{s}'" for s in _GOPHER_STOPS) + "]"
    return f"""
    WITH rs AS ({_rep_signals_oracle()}),
    m AS (
      SELECT doc_id, coalesce(text,'') AS t, {O.toks('text')} AS w,
             {O.trimmed_lines('text')} AS lines
      FROM documents
    ), m2 AS (
      SELECT doc_id, len(w) AS n_words,
        CASE WHEN len(w) > 0 THEN cast({O.list_char_sum('w')} as double) / len(w)
             ELSE 0.0 END AS mean_wlen,
        CASE WHEN len(w) > 0 THEN
          cast((len(str_split(t, '#')) - 1) + (len(str_split(t, '...')) - 1)
               + (len(str_split(t, '\u2026')) - 1)
               as double) / len(w) ELSE 0.0 END AS symbol_ratio,
        CASE WHEN len(lines) > 0 THEN
          cast(len(list_filter(lines, l -> regexp_matches(l, '^([*•‣▪-]\\s)')))
               as double) / len(lines) ELSE 0.0 END AS bullet_frac,
        CASE WHEN len(lines) > 0 THEN
          cast(len(list_filter(lines, l -> ends_with(l, '...')
                                     OR ends_with(l, '\u2026')))
               as double) / len(lines) ELSE 0.0 END AS ellipsis_frac,
        CASE WHEN len(w) > 0 THEN
          cast(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               as double) / len(w) ELSE 0.0 END AS alpha_frac,
        len(list_intersect(list_transform(w, x -> lower(x)), {stops})) AS n_stop
      FROM m
    )
    SELECT m2.doc_id, cast(m2.n_words as bigint) AS n_words,
      CASE
        WHEN m2.n_words < {_GOPHER_MIN_WORDS} OR m2.n_words > 100000
          THEN 'gopher_word_count'
        WHEN m2.mean_wlen < 3.0 OR m2.mean_wlen > 10.0
          THEN 'gopher_mean_word_length'
        WHEN m2.symbol_ratio > 0.1 THEN 'gopher_symbol_ratio'
        WHEN m2.bullet_frac > 0.9 OR m2.ellipsis_frac > 0.3
          THEN 'gopher_bullet_ellipsis'
        WHEN m2.alpha_frac < 0.8 THEN 'gopher_alpha_words'
        WHEN m2.n_stop < {_GOPHER_MIN_STOPS} THEN 'gopher_stopwords'
        WHEN rs.dup_line_frac > 0.3 THEN 'gopher_dup_lines'
        WHEN rs.top2gram_char_frac > 0.2 OR rs.top3gram_char_frac > 0.18
          THEN 'gopher_top_ngram'
        WHEN rs.dup5gram_char_frac > 0.15 OR rs.dup10gram_char_frac > 0.10
          THEN 'gopher_dup_ngram'
      END AS gopher_drop_reason
    FROM m2 JOIN rs ON rs.doc_id = m2.doc_id
    """


@register(
    "f11_gopher_filter",
    _gopher_oracle(),
    doc="Gopher quality cascade (Rae et al. 2021 Appendix A1) as one "
        "first-match-wins drop_reason: word-count and mean-word-length "
        "bounds, symbol-to-word ratio, bullet/ellipsis line fractions, "
        "alphabetic-word fraction, distinct-stopword minimum, then the "
        "repetition battery (dup lines, top-2/3-gram, dup-5/10-gram char "
        "fractions) reusing repetition_signals; thresholds are the paper's "
        "except a fixture-scaled word-count floor. Shuffle-free per-row "
        "expression tree",
)
def f11_gopher_filter(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions.text_norm import ws_tokens

    out = corpus.gopher_quality_filter(
        _docs(spark, sf_dir),
        min_words=_GOPHER_MIN_WORDS,
        min_distinct_stopwords=_GOPHER_MIN_STOPS,
    )
    n_words = F.size(ws_tokens(F.coalesce(F.col("text"), F.lit("")))).cast("long")
    return out.select("doc_id", n_words.alias("n_words"), "gopher_drop_reason")


@register(
    "corp_tfidf_top3",
    f"""
    WITH t AS (
      SELECT doc_id, unnest({O.toks("lower(text)")}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, cast(count(*) as bigint) AS tf
           FROM t GROUP BY doc_id, term),
    dft AS (SELECT term, cast(count(*) as bigint) AS df_t FROM tf GROUP BY term),
    n AS (SELECT cast(count(*) as bigint) AS n_docs FROM documents),
    s AS (
      SELECT tf.doc_id, tf.term,
             cast(tf as double) *
               (ln((cast(n_docs as double) + 1.0) / (cast(df_t as double) + 1.0))
                + 1.0) AS tfidf
      FROM tf JOIN dft USING (term), n
    )
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, cast(rank as int) AS rank
    FROM (SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term ASC) AS rank
          FROM s)
    WHERE rank <= 3
    """,
    doc="per-doc top-3 keywords by smoothed TF-IDF (sklearn idf formula) — "
        "word-count shuffle + term-frequency join (term table NOT assumed "
        "broadcastable at web scale) + per-doc top-k window; all doubles "
        "are fixed expressions of integer counts, so no rounding hazards",
)
def corp_tfidf_top3(spark, sf_dir):
    return corpus.tfidf_top_terms(_docs(spark, sf_dir), k=3)


_CHUNK_T, _CHUNK_S = 64, 48


@register(
    "corp_chunk_spans",
    f"""
    WITH t AS (
      SELECT doc_id, {O.toks('text')} AS toks FROM documents
    ),
    st AS (
      SELECT doc_id, toks, len(toks) AS n,
             list_filter(
               CASE WHEN len(toks) > 0
                    THEN range(0, len(toks), {_CHUNK_S}) ELSE []::BIGINT[] END,
               s -> s = 0 OR s + {_CHUNK_T - _CHUNK_S} < len(toks)) AS starts
      FROM t
    ),
    e AS (
      SELECT doc_id, toks, n,
             generate_subscripts(starts, 1) - 1 AS chunk_id,
             unnest(starts) AS start_tok
      FROM st
    )
    SELECT doc_id, cast(chunk_id as int) AS chunk_id,
           cast(start_tok as bigint) AS start_tok,
           cast(least(start_tok + {_CHUNK_T}, n) as bigint) AS end_tok,
           array_to_string(toks[start_tok + 1 : start_tok + {_CHUNK_T}], ' ')
             AS chunk_text
    FROM e
    """,
    doc="sliding-window long-document chunking: 64-token windows at stride "
        "48 (16-token overlap), final window clipped, windows adding no new "
        "coverage dropped — map-only explode, zero shuffle; the standard "
        "long-context prep feeding the tokeniser",
)
def corp_chunk_spans(spark, sf_dir):
    return corpus.chunk_spans(
        _docs(spark, sf_dir), chunk_tokens=_CHUNK_T, stride=_CHUNK_S
    )


# ============================================= recipe allocation + gating

@register(
    "f12_source_median_gate",
    """
    WITH r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS cnt
      FROM documents
    ),
    med AS (
      SELECT source, n_chars AS group_median FROM r
      WHERE rn = cast(ceil(cast(cnt as double) / 2.0) as int)
    )
    SELECT r.doc_id, r.source, cast(r.n_chars as bigint) AS n_chars,
           cast(m.group_median as bigint) AS group_median,
           r.n_chars < m.group_median AS below_median
    FROM r JOIN med m ON m.source = r.source
    """,
    doc="adaptive per-source gating at the source's own median (rank-based "
        "LOWER median — an exact group member, never an interpolated "
        "double, so the gate is bit-identical across engines). Production "
        "gates on quality_score; the referee uses the n_chars column so "
        "the oracle stays one window deep",
)
def f12_source_median_gate(spark, sf_dir):
    out = corpus.group_median_gate(
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars"),
        value_col="n_chars",
    )
    return out.select(
        "doc_id", "source", F.col("n_chars").cast("long"),
        F.col("group_median").cast("long"), "below_median",
    )


@register(
    "o04_source_quota",
    """
    SELECT doc_id, source, cast(n_chars as bigint) AS n_chars,
           cast(rnk as int) AS group_rank
    FROM (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id) AS rnk
          FROM documents)
    WHERE rnk <= 5
    """,
    doc="quota sampling: top-5 docs per source by n_chars (desc, doc_id "
        "tiebreak) — per-source caps bound any one source's corpus share; "
        "one window shuffle on the group key",
)
def o04_source_quota(spark, sf_dir):
    out = corpus.group_quota_topn(
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars"),
        value_col="n_chars", n=5,
    )
    return out.select(
        "doc_id", "source", F.col("n_chars").cast("long"), "group_rank"
    )


_BUDGET_TOKENS = 100_000


@register(
    "corp_token_budget",
    f"""
    WITH c AS (
      SELECT source,
             cast(sum(len({O.toks('text')})) as bigint) AS available
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, available,
             sqrt(cast(available as double)
                  / cast(sum(available) OVER () as double)) AS scaled
      FROM c
    ),
    d AS (
      SELECT list_sum(list(scaled ORDER BY source)) AS denom FROM w
    ),
    t AS (
      SELECT source, available, scaled / denom AS weight
      FROM w, d
    )
    SELECT source, available,
           round(weight, 6) AS budget_weight,
           cast(round(weight * {_BUDGET_TOKENS}.0, 0) as bigint) AS target_tokens,
           round(least(1.0::double,
                 cast(cast(round(weight * {_BUDGET_TOKENS}.0, 0) as bigint) as double)
                 / cast(available as double)), 6) AS sampling_rate,
           greatest(cast(1 as bigint),
                 (cast(round(weight * {_BUDGET_TOKENS}.0, 0) as bigint)
                  + available - 1) // available) AS epochs
    FROM t
    """,
    doc="training-recipe token-budget allocation: sqrt-temperature shares "
        "of a 100k-token budget per source, with integer-exact sampling "
        "rate (downsample) and epoch count (upsample) — the LLaMA/Dolma "
        "data-mixing shape; one map-side-combinable token sum is the only "
        "corpus-wide work",
)
def corp_token_budget(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions.text_norm import ws_tokens

    d = _docs(spark, sf_dir).select(
        "source",
        F.size(ws_tokens(F.coalesce(F.col("text"), F.lit("")))).alias("n_tok"),
    )
    return corpus.token_budget_allocation(
        d, token_col="n_tok", total_budget=_BUDGET_TOKENS
    ).orderBy("source")


_DSIR_KEEP = 125


def _dsir_oracle() -> str:
    from llm_pretraining_data_pipeline_spark.functions import lm

    vocab = "[" + ",".join(f"'{w}'" for w in lm.LM_VOCAB) + "]"
    logw = (
        f"(CASE WHEN coalesce(list_position({vocab}, tk), 0) > 0 "
        f"THEN -log10(cast(list_position({vocab}, tk) as double) + 1.0) "
        f"- {lm.LOG10_Z!r} ELSE {lm.LOG10_P_OOV!r} END) - {lm.LOG10_P_RAW!r}"
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {O.toks("lower(text)")} AS toks FROM documents
    ), s AS (
      SELECT doc_id, len(toks) AS n,
             coalesce(list_sum(list_transform(toks, tk -> {logw})), 0.0)
               AS log_w
      FROM t
    ), r AS (
      SELECT doc_id, n, log_w,
             row_number() OVER (ORDER BY log_w DESC, doc_id) AS rnk
      FROM s
    )
    SELECT doc_id, cast(n as bigint) AS n_lm_tokens,
           round(log_w, 6) AS log_importance,
           rnk <= {_DSIR_KEEP} AS selected
    FROM r
    """


@register(
    "corp_dsir_select",
    _dsir_oracle(),
    doc="DSIR data selection (Xie et al. 2023): per-doc log importance "
        "weight = sum over tokens of log p_target - log p_raw (Zipf "
        "unigram target vs uniform background; production swaps in "
        "hashed-n-gram feature models, same plan), then keep the "
        "top-weighted quarter of the corpus. Weight computation is a "
        "shuffle-free linear fold. The referee's global row_number is "
        "fixture-scale only — at 100 TB selection finds the k-th weight "
        "via top-k (TakeOrderedAndProject on (weight, id)) or an "
        "approx-quantile cut and broadcast-filters on the threshold, "
        "never a single-partition window",
)
def corp_dsir_select(spark, sf_dir):
    from pyspark.sql import Window as W

    from llm_pretraining_data_pipeline_spark.functions import lm
    from llm_pretraining_data_pipeline_spark.functions.text_norm import ws_tokens

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(ws_tokens(F.lower(F.coalesce(F.col("text"), F.lit(""))))).cast("long").alias("n_lm_tokens"),
        lm.doc_importance_weight("text").alias("log_w"),
    )
    rnk = F.row_number().over(W.partitionBy().orderBy(F.desc("log_w"), F.col("doc_id")))
    return d.select(
        "doc_id", "n_lm_tokens",
        F.round("log_w", 6).alias("log_importance"),
        (rnk <= _DSIR_KEEP).alias("selected"),
    )


# ============================================================== C4 battery
# Raffel et al. 2020 §2.2 (operators/corpus.py: c4_quality_filter /
# c4_span_dedup). The word-soup fixture has no lines, punctuation, or
# repeated sentences, so both queries synthesize sentence-bearing text
# deterministically from doc_id — identical construction on both engines
# (the mm_*/URL derived-fixture pattern). Every line rule, every cascade
# branch, and cross-doc span repetition all have rows exercising them.


def _c4_fixture_lines_spark():
    d = F.col("doc_id")
    l1 = F.concat(
        F.lit("Alpha beta gamma delta epsilon "), (d % 7).cast("string"), F.lit(".")
    )
    l2 = F.lit("short line.")
    l3 = F.lit("No terminal punctuation on this line at all")
    l4 = F.when(
        d % 5 == 0, F.lit("Please enable JavaScript to continue viewing.")
    ).otherwise(F.lit("A perfectly ordinary sentence sits right here."))
    l5 = (
        F.when(d % 11 == 0, F.lit("tiny one."))
        .when(d % 3 == 0, F.lit("Lorem ipsum filler text appears in this sentence."))
        .when(d % 3 == 1, F.lit("Code with braces { appears within this sentence."))
        .otherwise(F.lit("Another clean closing sentence finishes the document."))
    )
    l6 = (
        F.when(d % 11 == 0, F.lit("also small."))
        .when(
            d % 13 == 0,
            F.lit("This sentence regrettably contains badword2 inside."),
        )
        .otherwise(F.lit("A final ordinary sentence concludes everything nicely."))
    )
    return F.concat_ws("\n", l1, l2, l3, l4, l5, l6)


_C4_TEXT_SQL = (
    "'Alpha beta gamma delta epsilon ' || cast(doc_id % 7 as varchar) || '.'"
    " || chr(10) || 'short line.'"
    " || chr(10) || 'No terminal punctuation on this line at all'"
    " || chr(10) || CASE WHEN doc_id % 5 = 0"
    " THEN 'Please enable JavaScript to continue viewing.'"
    " ELSE 'A perfectly ordinary sentence sits right here.' END"
    " || chr(10) || CASE WHEN doc_id % 11 = 0 THEN 'tiny one.'"
    " WHEN doc_id % 3 = 0 THEN 'Lorem ipsum filler text appears in this sentence.'"
    " WHEN doc_id % 3 = 1 THEN 'Code with braces { appears within this sentence.'"
    " ELSE 'Another clean closing sentence finishes the document.' END"
    " || chr(10) || CASE WHEN doc_id % 11 = 0 THEN 'also small.'"
    " WHEN doc_id % 13 = 0 THEN 'This sentence regrettably contains badword2 inside.'"
    " ELSE 'A final ordinary sentence concludes everything nicely.' END"
)

# Explicit whitespace class (repo convention): Java \s and RE2 \s differ
# on \x0B, so the boundary regex is spelled out identically on both engines.
_C4_SENT_SPLIT = (
    "list_filter(list_transform(string_split("
    "regexp_replace({t}, '([.!?])[ \\t\\n\\r\\f]+', '\\1' || chr(1), 'g'),"
    " chr(1)), s -> trim(s)), s -> s <> '')"
)


def _c4_filter_oracle() -> str:
    from llm_pretraining_data_pipeline_spark.operators.corpus import C4_BADWORDS

    bad = "[" + ", ".join(f"'{w}'" for w in C4_BADWORDS) + "]"
    kept = (
        "list_filter(lines, l -> regexp_matches(l, '[.!?\"]$')"
        f" AND len({O.toks('l')}) >= 5"
        " AND NOT contains(lower(l), 'javascript'))"
    )
    sents = _C4_SENT_SPLIT.format(t="tc4")
    has_bad = (
        f"len(list_intersect(list_transform({O.toks('lower(tc4)')},"
        f" w -> regexp_replace(w, '^[^a-z0-9]+|[^a-z0-9]+$', '', 'g')),"
        f" {bad})) > 0"
    )
    return f"""
    WITH u AS (SELECT doc_id, {_C4_TEXT_SQL} AS text FROM documents),
    ln AS (SELECT doc_id,
                  list_filter(list_transform(string_split(text, chr(10)),
                                             l -> trim(l)), l -> l <> '') AS lines
           FROM u),
    c AS (SELECT doc_id, lines, {kept} AS kept FROM ln),
    t AS (SELECT doc_id, cast(len(lines) as bigint) AS n_lines,
                 cast(len(kept) as bigint) AS n_lines_kept,
                 array_to_string(kept, chr(10)) AS tc4
          FROM c)
    SELECT doc_id, n_lines, n_lines_kept,
           CASE WHEN len({sents}) < 3 THEN 'c4_min_sentences'
                WHEN {has_bad} THEN 'c4_bad_word'
                WHEN contains(lower(tc4), 'lorem ipsum') THEN 'c4_lorem_ipsum'
                WHEN contains(tc4, '{{') THEN 'c4_curly_brace'
           END AS c4_drop_reason
    FROM t
    """


@register(
    "f13_c4_filter",
    _c4_filter_oracle(),
    doc="C4 cleanup battery (Raffel et al. 2020 §2.2): line-level retention "
        "(terminal punctuation, ≥5 words, no 'javascript') then the "
        "first-match-wins page cascade (min 3 sentences, bad-word list, "
        "'lorem ipsum', curly brace) over the line-cleaned text — all pure "
        "HOF/regex expressions, shuffle-free. Fixture text synthesized from "
        "doc_id so every rule and cascade branch fires on real rows",
)
def f13_c4_filter(spark, sf_dir):
    u = _docs(spark, sf_dir).select(
        "doc_id", _c4_fixture_lines_spark().alias("text")
    )
    out = corpus.c4_quality_filter(u)
    return out.select("doc_id", "n_lines", "n_lines_kept", "c4_drop_reason")


def _c4_sent_fixture_spark():
    d = F.col("doc_id")
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), (d % 4 + 2).cast("int")),
            lambda k: F.concat(
                F.lit("Shared sentence number "),
                ((d * 7 + k * 5) % 23).cast("string"),
                F.lit(" ends here."),
            ),
        ),
        " ",
    )


_C4_SENTS_SQL = (
    "list_transform(range(0, 3 + doc_id % 4),"
    " k -> 'Shared sentence number '"
    " || cast((doc_id * 7 + k * 5) % 23 as varchar) || ' ends here.')"
)


@register(
    "d11_c4_span_dedup",
    f"""
    WITH d AS (SELECT doc_id, {_C4_SENTS_SQL} AS sents FROM documents),
    sp AS (SELECT doc_id, u.i AS start,
                  sents[u.i + 1] || chr(1) || sents[u.i + 2] || chr(1)
                    || sents[u.i + 3] AS span
           FROM d, unnest(range(0, len(sents) - 2)) AS u(i)),
    l AS (SELECT doc_id, start FROM (
            SELECT doc_id, start,
                   row_number() OVER (PARTITION BY span
                     ORDER BY doc_id, start) AS rn
            FROM sp) WHERE rn > 1),
    marks AS (SELECT DISTINCT doc_id, start + u.j AS pos
              FROM l, unnest(range(0, 3)) AS u(j)),
    sx AS (SELECT doc_id, u.i AS pos, sents[u.i + 1] AS sent
           FROM d, unnest(range(0, len(sents))) AS u(i)),
    kept AS (SELECT s.doc_id, s.pos, s.sent
             FROM sx s ANTI JOIN marks m
               ON m.doc_id = s.doc_id AND m.pos = s.pos),
    r AS (SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS text_dedup,
                 cast(count(*) as bigint) AS n_kept
          FROM kept GROUP BY doc_id),
    o AS (SELECT doc_id, cast(len(sents) as bigint) AS n_sents FROM d)
    SELECT o.doc_id, o.n_sents,
           cast(o.n_sents - coalesce(n_kept, 0) as bigint) AS n_sents_removed,
           coalesce(text_dedup, '') AS text_dedup
    FROM o LEFT JOIN r USING (doc_id)
    """,
    doc="C4 three-sentence span dedup (§2.2: all but one occurrence of any "
        "three-sentence span discarded, corpus-wide keep-first by doc id "
        "and position; member sentences of later occurrences removed, docs "
        "reassembled in order). One window shuffle on span text + narrow "
        "(id, pos) anti-join + per-doc reassembly agg — never all-pairs, "
        "and the window carries (span, id, pos) only. Fixture sentences "
        "drawn from a 23-deep shared pool so spans repeat across docs",
)
def d11_c4_span_dedup(spark, sf_dir):
    u = _docs(spark, sf_dir).select(
        "doc_id", _c4_sent_fixture_spark().alias("text")
    )
    return corpus.c4_span_dedup(u)


# ============================================= weighted sampling + overlap


@register(
    "o05_weighted_sample",
    f"""
    WITH w AS (
      SELECT doc_id,
             least(greatest(cast(n_chars as double) / 400.0 * 0.8, 0.0), 1.0)
               AS accept_p
      FROM documents
    )
    SELECT doc_id, round(accept_p, 6) AS accept_p
    FROM w
    WHERE cast(concat('0x',
               substr(sha256(cast(doc_id as varchar) || ':sample'), 1, 8))
               as bigint) < accept_p * 4294967296.0
    ORDER BY doc_id
    """,
    doc="deterministic per-row weighted (soft) sampling — FineWeb-Edu-style "
        "keep-proportional-to-quality: accept iff the first 32 bits of "
        "sha256(key) fall below p·2^32, p = clamp(weight·scale, 0, 1). No "
        "RNG state: same rows on every run/partitioning/engine, and a "
        "larger scale keeps a strict superset. Pure narrow filter, zero "
        "shuffle. Fixture weight = length proxy n_chars/400",
)
def o05_weighted_sample(spark, sf_dir):
    out = corpus.weighted_sample(
        _docs(spark, sf_dir),
        weight_col=F.col("n_chars").cast("double") / F.lit(400.0),
        rate_scale=0.8,
    )
    return out.select("doc_id", F.round("accept_p", 6).alias("accept_p"))


@register(
    "a14_source_overlap",
    f"""
    WITH t AS (
      SELECT source, unnest({O.word_ngrams(O.toks('text'), 3)}) AS gram
      FROM documents
    ),
    g AS (SELECT DISTINCT source, {O.h64('gram')} AS gh FROM t),
    ns AS (SELECT source, cast(count(*) as bigint) AS n FROM g GROUP BY source),
    p AS (SELECT a.source AS s1, b.source AS s2
          FROM g a JOIN g b ON a.gh = b.gh AND a.source < b.source),
    i AS (SELECT s1, s2, cast(count(*) as bigint) AS inter
          FROM p GROUP BY s1, s2)
    SELECT i.s1, i.s2, i.inter,
           n1.n + n2.n - i.inter AS union_cnt,
           round(cast(i.inter as double)
                 / cast(n1.n + n2.n - i.inter as double), 6) AS jaccard
    FROM i
    JOIN ns n1 ON n1.source = i.s1
    JOIN ns n2 ON n2.source = i.s2
    ORDER BY s1, s2
    """,
    doc="pairwise 3-gram Jaccard between corpus sources (the RefinedWeb "
        "snapshot-redundancy audit): distinct (source, gram-hash), then a "
        "per-hash source SET (bounded by #sources, not corpus size) whose "
        "doc-local double explode yields pairs — no corpus-sized gram "
        "self-join; counts broadcast back. Oracle uses the equivalent "
        "self-join formulation",
)
def a14_source_overlap(spark, sf_dir):
    return corpus.source_overlap(_docs(spark, sf_dir), n=3).orderBy("s1", "s2")


# ================================================= RefinedWeb line rules


def _rw_fixture_spark():
    d = F.col("doc_id")
    l1 = F.concat(
        F.lit("A normal opening line of prose number "),
        (d % 9).cast("string"), F.lit("."),
    )
    l2 = F.when(d % 4 == 0, F.lit("THIS ENTIRE LINE IS SHOUTING")).otherwise(
        F.lit("A second calm line of ordinary text.")
    )
    l3 = F.when(d % 5 == 0, F.lit("1234 5678")).otherwise(
        F.lit("Yet another gentle line of words.")
    )
    l4 = F.when(
        d % 7 == 0, F.concat((d % 90).cast("string"), F.lit(" likes"))
    ).otherwise(F.lit("A closing line finishes things."))
    l5 = F.when(d % 6 == 0, F.lit("Read More")).otherwise(
        F.lit("The final ordinary sentence rests here.")
    )
    return F.concat_ws("\n", l1, l2, l3, l4, l5)


_RW_TEXT_SQL = (
    "'A normal opening line of prose number ' || cast(doc_id % 9 as varchar)"
    " || '.' || chr(10)"
    " || CASE WHEN doc_id % 4 = 0 THEN 'THIS ENTIRE LINE IS SHOUTING'"
    " ELSE 'A second calm line of ordinary text.' END || chr(10)"
    " || CASE WHEN doc_id % 5 = 0 THEN '1234 5678'"
    " ELSE 'Yet another gentle line of words.' END || chr(10)"
    " || CASE WHEN doc_id % 7 = 0 THEN cast(doc_id % 90 as varchar) || ' likes'"
    " ELSE 'A closing line finishes things.' END || chr(10)"
    " || CASE WHEN doc_id % 6 = 0 THEN 'Read More'"
    " ELSE 'The final ordinary sentence rests here.' END"
)

_RW_BAD_SQL = (
    "(len(regexp_replace(l, '[^A-Za-z]', '', 'g')) > 0 AND"
    " cast(len(regexp_replace(l, '[^A-Z]', '', 'g')) as double)"
    " > cast(len(regexp_replace(l, '[^A-Za-z]', '', 'g')) as double) * 0.6)"
    " OR len(regexp_replace(l, '[^A-Za-z]', '', 'g')) = 0"
    " OR regexp_matches(l, '^[0-9]+ (likes?|comments?|shares?|views?)$')"
    " OR regexp_matches(lower(l),"
    " '^(login|log in|sign in|sign up|register|read more|learn more|click here)$')"
)


@register(
    "f14_refinedweb_lines",
    f"""
    WITH u AS (SELECT doc_id, {_RW_TEXT_SQL} AS text FROM documents),
    ln AS (SELECT doc_id,
                  list_filter(list_transform(string_split(text, chr(10)),
                                             x -> trim(x)), x -> x <> '') AS lines
           FROM u),
    c AS (SELECT doc_id, cast(len(lines) as bigint) AS n_lines,
                 cast(len(list_filter(lines, l -> {_RW_BAD_SQL})) as bigint)
                   AS n_lines_removed
          FROM ln)
    SELECT doc_id, n_lines, n_lines_removed,
           CASE WHEN n_lines > 0 AND cast(n_lines_removed as double)
                     > cast(n_lines as double) * 0.05
                THEN 'rw_excess_line_removal' END AS rw_drop_reason
    FROM c
    """,
    doc="RefinedWeb line-wise corrections (Penedo et al. 2023 §3.2/Table 2): "
        "drop mostly-uppercase lines (>60% of letters), letterless lines, "
        "social-counter lines ('3 likes'), and button/footer artifacts; the "
        "whole doc drops when removals exceed 5% of its lines. Shuffle-free "
        "HOF/regex tree, composable ahead of the C4/Gopher batteries. "
        "Fixture lines synthesized from doc_id so every rule fires",
)
def f14_refinedweb_lines(spark, sf_dir):
    u = _docs(spark, sf_dir).select("doc_id", _rw_fixture_spark().alias("text"))
    out = corpus.refinedweb_line_correct(u)
    return out.select("doc_id", "n_lines", "n_lines_removed", "rw_drop_reason")


# ==================================================== corpus snapshot diff


def _diff_new_spark(docs):
    base = docs.filter(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" updated"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = docs.filter(F.col("doc_id") % 19 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("fresh "), F.col("text")).alias("text"),
    )
    return base.unionByName(added)


@register(
    "d12_corpus_diff",
    """
    WITH oldh AS (
      SELECT doc_id, sha256(text) AS old_hash FROM documents
    ),
    newv AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' updated' ELSE text END
               AS text
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, 'fresh ' || text AS text
      FROM documents WHERE doc_id % 19 = 0
    ),
    newh AS (SELECT doc_id, sha256(text) AS new_hash FROM newv)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.old_hash IS NULL THEN 'added'
                WHEN n.new_hash IS NULL THEN 'removed'
                WHEN o.old_hash <> n.new_hash THEN 'changed'
                ELSE 'unchanged' END AS status,
           o.old_hash, n.new_hash
    FROM oldh o FULL OUTER JOIN newh n ON o.doc_id = n.doc_id
    """,
    doc="CDC-style corpus snapshot diff: added/removed/changed/unchanged "
        "between two corpus versions by content hash — each side reduces "
        "to a narrow (id, sha256) projection and meets in ONE full outer "
        "hash join; text never shuffles. Pairs with incremental_dedup to "
        "process only the delta. v2 fixture derives from v1: every 17th "
        "doc removed, every 13th edited, every 19th re-added under a new id",
)
def d12_corpus_diff(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = corpus.corpus_diff(docs, _diff_new_spark(docs))
    return out.select("doc_id", "status", "old_hash", "new_hash")


# ================================================= quality decile report


@register(
    "a15_quality_deciles",
    """
    WITH d AS (
      SELECT source, n_chars,
             ntile(10) OVER (PARTITION BY source
                             ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT source, cast(decile as int) AS decile,
           cast(count(*) as bigint) AS n_docs,
           cast(min(n_chars) as bigint) AS min_chars,
           cast(max(n_chars) as bigint) AS max_chars
    FROM d GROUP BY source, decile
    ORDER BY source, decile
    """,
    doc="per-source quality-decile report (the FineWeb-style 'what does "
        "each quality band look like' audit, with n_chars as the fixture's "
        "quality proxy): ntile(10) windows partition BY SOURCE — never one "
        "global sort — with (proxy, doc_id) ordering so bucket boundaries "
        "are deterministic; then a map-side-combinable groupBy",
)
def a15_quality_deciles(spark, sf_dir):
    from pyspark.sql import Window

    # asc_nulls_last matches DuckDB's ASC default (NULLS LAST); Spark's
    # bare asc sorts nulls FIRST, which would flip decile assignment for
    # any null-n_chars row (n_chars is nullable in the schema)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc_nulls_last(), F.col("doc_id").asc_nulls_last()
    )
    return (
        _docs(spark, sf_dir)
        .select("source", "n_chars", F.ntile(10).over(w).alias("decile"))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("source", "decile")
    )


# ======================================================== hash-based split


def _split_cuts() -> tuple[str, str]:
    """Replicate hash_split's cumulative-float accumulation exactly —
    0.8 + 0.1 is 0.9000000000000001 in IEEE doubles, and the hex literal
    must come from the SAME arithmetic on both engines."""
    from llm_pretraining_data_pipeline_spark.operators.corpus import (
        stratum_threshold_hex,
    )

    cum = 0.0
    cuts = []
    for frac in (0.8, 0.1):
        cum += frac
        cuts.append(stratum_threshold_hex(cum))
    return cuts[0], cuts[1]


_CUT1, _CUT2 = _split_cuts()


@register(
    "o06_hash_split",
    f"""
    WITH s AS (
      SELECT doc_id, source,
             CASE WHEN substr(sha256(cast(doc_id as varchar) || ':split'), 1, 8)
                  < '{_CUT1}' THEN 'train'
                  WHEN substr(sha256(cast(doc_id as varchar) || ':split'), 1, 8)
                  < '{_CUT2}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, source, cast(count(*) as bigint) AS n_docs
    FROM s GROUP BY split, source
    ORDER BY split, source
    """,
    doc="deterministic train/val/test split (0.8/0.1/0.1) by cumulative "
        "sha256 threshold — same row, same split on every run/partitioning/"
        "engine, no RNG state, and resizing a fraction only MOVES the "
        "boundary (train never leaks to test when val shrinks). Pure "
        "narrow projection; thresholds are Python-computed hex literals "
        "embedded on both engines",
)
def o06_hash_split(spark, sf_dir):
    out = corpus.hash_split(_docs(spark, sf_dir))
    return (
        out.groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "source")
    )


# ================================================= readability + Zipf audit

# Sentence-bearing fixture (raw fixture text has no punctuation): three
# overlapping substrings joined as sentences, fourth sentence on every
# doc_id % 4 == 0. Identical construction on both engines.
_READ_FIX_SQL = (
    "substr(coalesce(text, ''), 1, 80) || '. '"
    " || substr(coalesce(text, ''), 40, 80)"
    " || CASE WHEN doc_id % 4 = 0"
    " THEN '. ' || substr(coalesce(text, ''), 80, 60) ELSE '' END || '.'"
)


def _read_fix_spark():
    t = F.coalesce(F.col("text"), F.lit(""))
    return F.concat(
        F.substring(t, 1, 80), F.lit(". "), F.substring(t, 40, 80),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(". "), F.substring(t, 80, 60)),
        ).otherwise(F.lit("")),
        F.lit("."),
    )


@register(
    "p37_readability",
    f"""
    WITH d AS (SELECT doc_id, {_READ_FIX_SQL} AS t FROM documents),
    m AS (SELECT doc_id,
                 cast(len({O.toks('t')}) as bigint) AS n_words,
                 cast(len({_C4_SENT_SPLIT.format(t='t')}) as bigint) AS n_sents,
                 cast(len(regexp_extract_all(lower(t), '[aeiouy]+'))
                      as bigint) AS n_syllables
          FROM d)
    SELECT doc_id, n_words, n_sents, n_syllables,
           CASE WHEN n_words > 0
                THEN round(206.835
                           - 1.015 * (cast(n_words as double)
                                      / cast(greatest(n_sents, 1) as double))
                           - 84.6 * (cast(n_syllables as double)
                                     / cast(n_words as double)), 4)
                ELSE 0.0 END AS fre
    FROM m
    """,
    doc="Flesch Reading Ease over sentence-split text (the readability "
        "bucket educational-quality filters use): words / sentences / "
        "vowel-group syllable heuristic, all shared single definitions "
        "(ws_tokens, split_sentences, [aeiouy]+ runs). Pure per-row "
        "int/int ratios in fixed order — 4dp round is cross-engine safe; "
        "zero shuffle at any scale",
)
def p37_readability(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions import metrics

    d = _docs(spark, sf_dir).select(
        "doc_id", _read_fix_spark().alias("t")
    )
    n_sents = F.size(corpus.split_sentences(F.col("t")))
    return d.select(
        "doc_id",
        F.size(corpus.ws_tokens(F.col("t"))).cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sents"),
        metrics.syllable_count("t").alias("n_syllables"),
        metrics.flesch_reading_ease(F.col("t"), n_sents).alias("fre"),
    )


_ZIPF_K = 100


@register(
    "a16_zipf_slope",
    f"""
    WITH tok AS (SELECT unnest({O.toks('lower(text)')}) AS token
                 FROM documents),
    tf AS (SELECT token, cast(count(*) as bigint) AS cnt
           FROM tok GROUP BY token ORDER BY cnt DESC, token LIMIT {_ZIPF_K}),
    r AS (SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank, cnt
          FROM tf),
    p AS (SELECT rank, ln(cast(rank as double)) AS x,
                 ln(cast(cnt as double)) AS y
          FROM r),
    s AS (SELECT cast(count(*) as double) AS n,
                 list_sum(list(x ORDER BY rank)) AS sx,
                 list_sum(list(y ORDER BY rank)) AS sy,
                 list_sum(list(x * y ORDER BY rank)) AS sxy,
                 list_sum(list(x * x ORDER BY rank)) AS sxx
          FROM p)
    SELECT cast(n as bigint) AS n_tokens,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS zipf_slope,
           round((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n,
                 6) AS zipf_intercept
    FROM s
    """,
    doc="Zipf rank-frequency OLS over the top-100 tokens (corpus-health "
        "audit: natural language sits near slope -1, boilerplate bends "
        "it). One word-count shuffle + TakeOrderedAndProject, regression "
        "over 100 rows with rank-ORDERED folds on both engines; ln drift "
        "absorbed by the 6dp round",
)
def a16_zipf_slope(spark, sf_dir):
    return corpus.zipf_fit(_docs(spark, sf_dir), k=_ZIPF_K)


# ============================================ dup-cluster audit + entropy

# The fixture corpus is duplicate-free, so the d14 fixture plants clusters:
# doc_id % 7 in (0, 1) collapses onto 5 shared texts (identical CASE on
# both engines), everything else keeps its own text.
_D14_TEXT_SQL = (
    "CASE WHEN doc_id % 7 < 2"
    " THEN 'shared cluster text number ' || cast(doc_id % 5 as varchar)"
    " ELSE coalesce(text, '') END"
)


@register(
    "d14_dup_cluster_stats",
    f"""
    WITH d AS (SELECT doc_id, {_D14_TEXT_SQL} AS t FROM documents),
    h AS (SELECT sha256({O.canon_exact('t')}) AS hh FROM d),
    c AS (SELECT hh, cast(count(*) as bigint) AS cluster_size
          FROM h GROUP BY hh)
    SELECT cluster_size,
           cast(count(*) as bigint) AS n_clusters,
           cast(cluster_size * count(*) as bigint) AS n_docs
    FROM c GROUP BY cluster_size ORDER BY cluster_size
    """,
    doc="exact-duplicate cluster-size histogram (the dedup audit run "
        "BEFORE a dedup pass — 2x replication vs 1000x boilerplate decides "
        "skew guards; Lee et al. 2022 report this distribution): sha256 of "
        "the canonical-exact form, two map-side-combinable groupBys on "
        "narrow keys, text never shuffles. Fixture plants 5 shared-text "
        "clusters over ~2/7 of the corpus",
)
def d14_dup_cluster_stats(spark, sf_dir):
    t = F.when(
        F.col("doc_id") % 7 < 2,
        F.concat(
            F.lit("shared cluster text number "),
            (F.col("doc_id") % 5).cast("string"),
        ),
    ).otherwise(F.coalesce(F.col("text"), F.lit("")))
    d = _docs(spark, sf_dir).select("doc_id", t.alias("text"))
    return corpus.dup_cluster_stats(d)


@register(
    "p38_token_entropy",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({O.toks('lower(text)')}) AS token FROM documents
    ),
    tc AS (SELECT doc_id, token, cast(count(*) as bigint) AS c
           FROM tok GROUP BY doc_id, token),
    e AS (SELECT doc_id, cast(sum(c) as bigint) AS n_tokens,
                 list_sum(list(cast(c as double) * log2(cast(c as double))
                               ORDER BY token)) AS s
          FROM tc GROUP BY doc_id)
    SELECT d.doc_id,
           cast(coalesce(e.n_tokens, 0) as bigint) AS n_tokens,
           coalesce(round(log2(cast(e.n_tokens as double))
                          - e.s / cast(e.n_tokens as double), 6), 0.0)
             AS token_entropy
    FROM documents d LEFT JOIN e USING (doc_id)
    """,
    doc="per-document unigram Shannon entropy H = log2(n) - (sum c*log2 c)"
        "/n over lowercase token counts — the information-density quality "
        "signal (low entropy = repetitive spam, catches SCATTERED repeats "
        "the run-length gram fractions miss). One word-count shuffle + "
        "per-doc token-ORDERED fold, 6dp round: bit-stable across "
        "partitionings and engines",
)
def p38_token_entropy(spark, sf_dir):
    return corpus.token_entropy(_docs(spark, sf_dir))


# ================================================ mixture interleave order

_MIX_W = {"src0": 4.0, "src1": 2.0, "src2": 1.0}
_MIX_DEFAULT = 0.5
_MIX_TOPN = 80


def _mix_case() -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN {v!r}" for k, v in sorted(_MIX_W.items())
    )
    return f"CASE source {arms} ELSE {_MIX_DEFAULT!r} END"


@register(
    "o08_mixture_interleave",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY sha256(cast(doc_id as varchar)), doc_id) AS rk
      FROM documents
    ),
    k AS (SELECT doc_id, source,
                 round(cast(rk as double) / {_mix_case()}, 6)
                   AS interleave_key
          FROM r)
    SELECT doc_id, source, interleave_key
    FROM k ORDER BY interleave_key, source, doc_id LIMIT {_MIX_TOPN}
    """,
    doc="deterministic mixture-weighted interleave (stride scheduling / "
        "weighted fair queueing): key = sha-ordered rank within source / "
        "weight, so ascending-key reads converge to the mixture "
        "proportions — the operator that turns mixture WEIGHTS into an "
        "actual training-stream ORDER with no RNG state. One per-source "
        "window shuffle; the head of the stream (top-N by key) is the "
        "refereed contract",
)
def o08_mixture_interleave(spark, sf_dir):
    out = corpus.mixture_interleave(
        _docs(spark, sf_dir).select("doc_id", "source"),
        _MIX_W, default_weight=_MIX_DEFAULT,
    )
    return (
        out.select("doc_id", "source", "interleave_key")
        .orderBy("interleave_key", "source", "doc_id")
        .limit(_MIX_TOPN)
    )


# ============================================= round-8 corpus analytics

@register(
    "d15_dup_token_fraction",
    f"""
    WITH es AS ({_D13_SQL}),
    j AS (SELECT d.source, es.n_tok_orig, es.n_tok_kept, es.n_dup_runs
          FROM es JOIN documents d USING (doc_id))
    SELECT source,
           cast(count(*) as bigint) AS n_docs,
           cast(sum(n_tok_orig) as bigint) AS tok_total,
           cast(sum(n_tok_orig - n_tok_kept) as bigint) AS tok_dup,
           cast(count(*) FILTER (WHERE n_dup_runs > 0) as bigint)
             AS n_docs_with_dups,
           round(cast(sum(n_tok_orig - n_tok_kept) as double)
                 / cast(sum(n_tok_orig) as double), 6) AS dup_token_frac
    FROM j GROUP BY source ORDER BY source
    """,
    doc="per-source duplicated-token fraction — the pre-training "
        "duplication AUDIT over ExactSubstr dedup output (how much of each "
        "source is byte-level repeats; Lee et al. 2022 report exactly this "
        "per-corpus number). Reuses the d13 dedup (same derived fixture, "
        "one keep-first shuffle) plus one narrow groupBy on source; the "
        "oracle nests the d13 referee SQL verbatim as a CTE",
)
def d15_dup_token_fraction(spark, sf_dir):
    es = corpus.exact_substr_dedup(_esub_frame(spark, sf_dir),
                                   min_tokens=_ESUB_K)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    j = es.join(src, "doc_id").select(
        "source", "n_tok_orig", "n_tok_kept", "n_dup_runs"
    )
    dup = F.sum(F.col("n_tok_orig") - F.col("n_tok_kept"))
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok_orig").cast("long").alias("tok_total"),
            dup.cast("long").alias("tok_dup"),
            F.sum((F.col("n_dup_runs") > 0).cast("int")).cast("long")
            .alias("n_docs_with_dups"),
            F.round(
                dup.cast("double") / F.sum("n_tok_orig").cast("double"), 6
            ).alias("dup_token_frac"),
        )
        .orderBy("source")
    )


_KS_SRC_A, _KS_SRC_B = "src3", "src7"


@register(
    "a17_ks_drift",
    f"""
    WITH f AS (SELECT n_chars AS val, source FROM documents
               WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')),
    c AS (SELECT val,
                 sum(CASE WHEN source = '{_KS_SRC_A}' THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN source = '{_KS_SRC_B}' THEN 1 ELSE 0 END) AS cb
          FROM f GROUP BY val),
    cum AS (SELECT val,
                   sum(ca) OVER (ORDER BY val) AS cum_a,
                   sum(cb) OVER (ORDER BY val) AS cum_b,
                   sum(ca) OVER () AS n_a,
                   sum(cb) OVER () AS n_b
            FROM c),
    d AS (SELECT val, n_a, n_b,
                 abs(cum_a * n_b - cum_b * n_a) AS dd FROM cum),
    m AS (SELECT max(dd) AS max_d, max(n_a) AS n_a, max(n_b) AS n_b FROM d)
    SELECT cast(m.n_a as bigint) AS n_a,
           cast(m.n_b as bigint) AS n_b,
           round(cast(m.max_d as double)
                 / (cast(m.n_a as double) * cast(m.n_b as double)), 6)
             AS ks_stat,
           cast((SELECT min(val) FROM d WHERE d.dd = m.max_d) as bigint)
             AS ks_at_value
    FROM m
    """,
    doc="two-sample Kolmogorov-Smirnov drift between two sources' document-"
        "length distributions — the snapshot-drift audit gating "
        "recalibration when a new crawl dump lands. EXACT integer "
        "arithmetic: KS numerator max|cum_a*n_b - cum_b*n_a| over the "
        "common denominator n_a*n_b, only the final ratio rounded (6dp); "
        "the cumulative window runs over the aggregated distinct-value "
        "frame, never the corpus",
)
def a17_ks_drift(spark, sf_dir):
    return corpus.ks_drift(
        _docs(spark, sf_dir), "n_chars", "source", _KS_SRC_A, _KS_SRC_B
    )


# gram-novelty fixture: snapshots from doc parity, plus a planted shared
# passage hitting BOTH snapshots so the novel-gram rate is strictly
# inside (0, 1) — the referee pins both the novel and the seen side.
_NOV_ANCHOR = "anchor overlap passage sierra tango uniform victor whiskey"
_NOV_N = 3


@register(
    "a18_gram_novelty",
    f"""
    WITH d AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'old' ELSE 'new' END AS snap,
             CASE WHEN doc_id % 4 < 2
                  THEN coalesce(text, '') || ' {_NOV_ANCHOR}'
                  ELSE coalesce(text, '') END AS t
      FROM documents
    ),
    w AS (SELECT snap, {O.toks('t')} AS w FROM d),
    g AS (SELECT DISTINCT snap = 'new' AS is_new,
                 {O.h64('gram')} AS gh
          FROM (SELECT snap, unnest({O.word_ngrams('w', _NOV_N)}) AS gram
                FROM w)),
    fl AS (SELECT gh,
                  max(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS in_old,
                  max(CASE WHEN is_new THEN 1 ELSE 0 END) AS in_new
           FROM g GROUP BY gh)
    SELECT cast(sum(in_old) as bigint) AS n_grams_old,
           cast(sum(in_new) as bigint) AS n_grams_new,
           cast(sum(CASE WHEN in_new = 1 AND in_old = 0 THEN 1 ELSE 0 END)
                as bigint) AS n_novel,
           CASE WHEN sum(in_new) > 0
                THEN round(cast(sum(CASE WHEN in_new = 1 AND in_old = 0
                                         THEN 1 ELSE 0 END) as double)
                           / cast(sum(in_new) as double), 6)
                ELSE 0.0 END AS novelty_rate
    FROM fl
    """,
    doc="directional n-gram novelty of a new snapshot vs the existing "
        "corpus (the 'is this dump worth ingesting' freshness audit; "
        "complement of source_overlap's symmetric Jaccard). One distinct "
        "over (side, 60-bit gram hash) + one groupBy reducing each gram to "
        "two booleans — no gram-keyed join of corpus-sized frames. The "
        "planted anchor passage lands in both snapshots so the rate is "
        "strictly between 0 and 1",
)
def a18_gram_novelty(spark, sf_dir):
    d = F.col("doc_id")
    t = F.when(
        d % 4 < 2,
        F.concat(F.coalesce(F.col("text"), F.lit("")),
                 F.lit(" " + _NOV_ANCHOR)),
    ).otherwise(F.coalesce(F.col("text"), F.lit("")))
    snap = F.when(d % 3 == 0, F.lit("old")).otherwise(F.lit("new"))
    frame = _docs(spark, sf_dir).select(snap.alias("snap"), t.alias("text"))
    return corpus.gram_novelty(frame, "text", "snap", "old", "new", n=_NOV_N)


@register(
    "a19_type_token_stats",
    f"""
    WITH w AS (
      SELECT source, unnest({O.toks('text')}) AS tok FROM documents
    ), a AS (
      SELECT source, cast(count(*) as bigint) AS n_tokens,
             cast(count(DISTINCT tok) as bigint) AS n_types
      FROM w GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           round(cast(n_types as double) / cast(n_tokens as double), 6)
             AS ttr,
           CASE WHEN n_tokens > 1
                THEN round(ln(cast(n_types as double))
                           / ln(cast(n_tokens as double)), 6)
           END AS heaps_exponent
    FROM a
    """,
    doc="per-source vocabulary-growth audit (Heaps 1978): token count, "
        "distinct types, type-token ratio, and the Heaps point exponent "
        "log(V)/log(N) — template spam collapses toward 0, high-entropy "
        "noise toward 1. Exact distinct refereed; the operator's "
        "approx_rsd= HLL valve is the 100 TB path (pytest-covered, no "
        "oracle for an estimate)",
)
def a19_type_token_stats(spark, sf_dir):
    return corpus.type_token_stats(_docs(spark, sf_dir), "text", "source")


_COV_SIZES = (100, 500, 2000)  # fixture vocab ~ a few k types: curve spans it


@register(
    "a20_vocab_coverage",
    f"""
    WITH w AS (
      SELECT unnest({O.toks('text')}) AS tok FROM documents
    ), c AS (
      SELECT tok, cast(count(*) as bigint) AS cnt FROM w GROUP BY tok
    ), r AS (
      SELECT tok, cnt,
             row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
      FROM c
    ), t AS (
      SELECT cast(sum(cnt) as bigint) AS total_tokens,
             cast(count(*) as bigint) AS n_types FROM c
    ), v AS (SELECT unnest({list(_COV_SIZES)}) AS v)
    SELECT cast(v.v as bigint) AS v, t.n_types,
           cast(coalesce(sum(CASE WHEN r.rank <= v.v THEN r.cnt END), 0)
             as bigint) AS covered_tokens,
           t.total_tokens,
           1.0 - cast(coalesce(sum(CASE WHEN r.rank <= v.v THEN r.cnt END), 0)
                      as double)
                 / cast(t.total_tokens as double) AS oov_rate
    FROM v CROSS JOIN t LEFT JOIN r ON r.rank <= v.v
    GROUP BY v.v, t.n_types, t.total_tokens
    """,
    doc="vocabulary-coverage / OOV-rate curve at candidate vocab sizes "
        "(tokenizer-sizing audit): fraction of token occurrences covered "
        "by the top-V types (count desc, token asc). Engine never sorts "
        "the full type table — TakeOrderedAndProject bounds the ranking "
        "to max(V) rows; oov_rate is raw 1 - int/int (engine-exact)",
)
def a20_vocab_coverage(spark, sf_dir):
    return corpus.vocab_coverage(
        _docs(spark, sf_dir), "text", vocab_sizes=_COV_SIZES
    )


# containment fixture: every doc_id%7==2 document gets a derived "quote"
# row (id + 1_000_000) holding its first 10 tokens — full containment from
# the quote side while Jaccard stays far below any dedup threshold.
_CONT_QUOTE_TOKENS = 10
_CONT_THRESHOLD = 0.9


@register(
    "d16_containment_pairs",
    f"""
    WITH base AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    ),
    quotes AS (
      SELECT doc_id + 1000000 AS doc_id,
             array_to_string(list_slice({O.toks('t')}, 1,
                                        {_CONT_QUOTE_TOKENS}), ' ') AS t
      FROM base WHERE doc_id % 7 = 2
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM quotes),
    s AS (SELECT doc_id, list_distinct({O.shingles(O.toks('t'), 3)}) AS sh
          FROM u WHERE len({O.shingles(O.toks('t'), 3)}) > 0),
    e AS (SELECT doc_id, unnest(sh) AS g FROM s),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id),
    j AS (SELECT id_a, id_b,
                 len(list_intersect(sa.sh, sb.sh)) AS inter,
                 len(sa.sh) AS na, len(sb.sh) AS nb
          FROM cand
          JOIN s sa ON sa.doc_id = id_a
          JOIN s sb ON sb.doc_id = id_b)
    SELECT id_a, id_b,
           round(cast(inter as double) / cast(na as double), 6)
             AS containment_a,
           round(cast(inter as double) / cast(nb as double), 6)
             AS containment_b
    FROM j
    WHERE cast(inter as double) / cast(na as double) >= {_CONT_THRESHOLD}
       OR cast(inter as double) / cast(nb as double) >= {_CONT_THRESHOLD}
    """,
    doc="asymmetric n-gram CONTAINMENT pairs (Broder): |A∩B|/|A| and "
        "|A∩B|/|B|, kept when either side reaches 0.9 — the detector for "
        "short documents fully quoted inside long ones, which Jaccard "
        "structurally misses (≈|short|/|long|). Same inverted-index scale "
        "shape as d04; the fixture plants a 10-token quote row per "
        "doc_id%7==2 document",
)
def d16_containment_pairs(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions.text_norm import (
        ws_tokens,
    )
    from llm_pretraining_data_pipeline_spark.operators import dedup as D

    base = _docs(spark, sf_dir).select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    quotes = base.filter(F.col("doc_id") % 7 == 2).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(ws_tokens(F.col("text")), 1, _CONT_QUOTE_TOKENS), " "
        ).alias("text"),
    )
    u = base.unionByName(quotes)
    out = D.ngram_containment_pairs(
        u, "text", shingle_size=3, threshold=_CONT_THRESHOLD
    )
    return out.select(
        "id_a", "id_b",
        F.round("containment_a", 6).alias("containment_a"),
        F.round("containment_b", 6).alias("containment_b"),
    )


# ===================================================== domain link graph

_PR_ITERS = 3
_PR_UNIT = 10**12


def _pagerank_oracle() -> str:
    """Unrolled damped power iteration, exact fixed-point — bit-identical
    to operators/graph.py::pagerank by construction: the same uniform
    init, per-edge floor-divided contributions, uniform dangling-mass
    share, and 15/85 damping split, all in bigint arithmetic."""
    ctes = [
        """links AS (
      SELECT doc_id % 50 AS src, (doc_id * 7 + 13) % 50 AS dst
      FROM documents
      UNION ALL
      SELECT doc_id % 50, (doc_id * 31 + 5) % 50 FROM documents
    )""",
        """edges AS (
      SELECT DISTINCT src, dst FROM links
      WHERE src <> dst AND src % 13 <> 0
    )""",
        """nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges)
    )""",
        "params AS (SELECT count(*) AS n FROM nodes)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        f"""r0 AS (
      SELECT node, {_PR_UNIT} // n AS r FROM nodes CROSS JOIN params
    )""",
    ]
    for i in range(1, _PR_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS (
      SELECT COALESCE(SUM(r), 0) AS dmass FROM r{p}
      WHERE node NOT IN (SELECT src FROM outdeg)
    )"""
        )
        ctes.append(
            f"""i{i} AS (
      SELECT e.dst AS node, SUM(r{p}.r // o.outdeg) AS inflow
      FROM edges e
      JOIN r{p} ON e.src = r{p}.node
      JOIN outdeg o ON e.src = o.src
      GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"""r{i} AS (
      SELECT nodes.node,
             (15 * {_PR_UNIT} // 100) // n
               + 85 * (COALESCE(i{i}.inflow, 0) + dmass // n) // 100 AS r
      FROM nodes CROSS JOIN params CROSS JOIN d{i}
      LEFT JOIN i{i} ON nodes.node = i{i}.node
    )"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"""
    SELECT node AS domain, CAST(r AS bigint) AS rank_e12,
           CAST(r // 1000000 AS bigint) AS rank_micro
    FROM r{_PR_ITERS}"""
    )


@register(
    "corp_domain_pagerank",
    _pagerank_oracle(),
    doc="Damped PageRank over the document host-domain link graph "
        "(operators/graph.py: per-iteration equi-join + groupBy, uniform "
        "dangling-mass redistribution, narrow localCheckpoint lineage "
        "truncation every k iterations) — the domain-authority signal "
        "behind Common Crawl's centrality rankings and RefinedWeb-style "
        "domain gates, computed on a graph orders of magnitude smaller "
        "than the corpus so it feeds the URL stage before any document "
        "byte is read. EXACT fixed-point bigint arithmetic (1e-12 units, "
        "floor division everywhere) makes the power iteration "
        "aggregation-order-independent: the referee unrolls all 3 "
        "iterations in DuckDB and matches bit-for-bit. Edges derive "
        "closed-form from doc_id (2 outlinks per doc, self-loops "
        "dropped, src%13=0 domains made dangling to exercise the "
        "dangling-mass path)",
)
def corp_domain_pagerank(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators.graph import pagerank

    docs = _docs(spark, sf_dir).select("doc_id")
    links = docs.select(
        (F.col("doc_id") % 50).alias("src"),
        ((F.col("doc_id") * 7 + 13) % 50).alias("dst"),
    ).unionByName(
        docs.select(
            (F.col("doc_id") % 50).alias("src"),
            ((F.col("doc_id") * 31 + 5) % 50).alias("dst"),
        )
    )
    edges = links.where(
        (F.col("src") != F.col("dst")) & (F.col("src") % 13 != 0)
    ).distinct()
    pr = pagerank(edges, iterations=_PR_ITERS)
    return pr.select(
        F.col("node").alias("domain"),
        "rank_e12",
        F.expr("rank_e12 div 1000000").alias("rank_micro"),
    )


@register(
    "a21_psi_drift",
    f"""
    WITH f AS (SELECT n_chars // 50 AS bucket, source FROM documents
               WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')),
    c AS (SELECT bucket,
                 sum(CASE WHEN source = '{_KS_SRC_A}' THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN source = '{_KS_SRC_B}' THEN 1 ELSE 0 END) AS cb
          FROM f GROUP BY bucket),
    t AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b, count(*) AS k FROM c),
    terms AS (
      SELECT bucket,
             round((cast(ca + 1 AS double) / cast(n_a + k AS double)
                    - cast(cb + 1 AS double) / cast(n_b + k AS double))
                   * ln((cast(ca + 1 AS double) / cast(n_a + k AS double))
                        / (cast(cb + 1 AS double) / cast(n_b + k AS double))),
                   6) AS v
      FROM c CROSS JOIN t)
    SELECT (SELECT cast(n_a AS bigint) FROM t) AS n_a,
           (SELECT cast(n_b AS bigint) FROM t) AS n_b,
           (SELECT cast(k AS bigint) FROM t) AS n_buckets,
           round(list_sum(list(v ORDER BY bucket)), 6) AS psi
    FROM terms
    """,
    doc="Population Stability Index between two sources' document-length "
        "histograms (operators/corpus.py::psi_drift) — the "
        "model-monitoring companion to a17's KS: directional log-ratio "
        "divergence summed across the whole histogram (PSI<0.1 stable, "
        ">0.25 action). Laplace-smoothed proportions over the UNION "
        "bucket grid keep one-sided buckets finite; exact bigint counts; "
        "each bucket term 6dp-rounded then folded in BUCKET ORDER "
        "(array_sort ordered-fold recipe, mirrored by DuckDB's "
        "list_sum(list(v ORDER BY bucket))) — never an order-unstable "
        "float sum. One map-side-combinable groupBy; the fold sees K "
        "buckets, never the corpus; max_buckets fences unbucketed "
        "columns in-plan like ks_drift's max_grid",
)
def a21_psi_drift(spark, sf_dir):
    buckets = _docs(spark, sf_dir).select(
        "source", F.expr("n_chars div 50").alias("bucket")
    )
    return corpus.psi_drift(
        buckets, "bucket", "source", _KS_SRC_A, _KS_SRC_B
    )


@register(
    "corp_budget_select",
    f"""
    WITH d AS (
      SELECT doc_id,
             {O.alpha_ratio('text')} AS score,
             cast(len({O.toks('text')}) AS bigint) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, score, n_tok,
             coalesce(SUM(n_tok) OVER (
               ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM d
    )
    SELECT doc_id, round(score, 6) AS score, n_tok,
           cum_before < 20000 AS kept
    FROM c
    """,
    doc="global token-budget selection (operators/corpus.py::"
        "budget_select — the FineWeb/DCLM endgame: keep the "
        "highest-scoring documents, in exact (score desc, id) order, "
        "until the cumulative token count reaches the training budget). "
        "A row is kept iff the tokens STRICTLY before it total under "
        "the budget (greedy fill, crossing row included). The referee "
        "is the naive global window cumsum; the engine never runs one — "
        "it quantizes the score into 4096 monotonic bins, aggregates "
        "per-bin token sums (one tiny groupBy through the driver), "
        "keeps/drops whole bins as pure filters, and pays an exact "
        "(raw-score, id)-ordered window ONLY inside the single boundary "
        "bin the budget lands in (~1/4096 of the corpus) — bit-equal "
        "to the window form because token sums are integers and bin "
        "order is monotonic in score. Score = alpha_ratio, tokens = "
        "word count, budget 20k — the boundary lands mid-corpus at "
        "both driver SFs",
)
def corp_budget_select(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions import metrics

    d = _docs(spark, sf_dir).select(
        "doc_id",
        metrics.alpha_ratio("text").alias("score"),
        metrics.n_words("text").cast("long").alias("n_tok"),
    )
    out = corpus.budget_select(
        d, budget=20_000, value_col="score", token_col="n_tok"
    )
    return out.select(
        "doc_id", F.round("score", 6).alias("score"), "n_tok", "kept"
    )


@register(
    "corp_host_prior",
    f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id < 3 THEN 'tiny'
                  ELSE 'h' || CAST(doc_id % 17 AS varchar) END AS host,
             CASE WHEN doc_id < 3 OR (doc_id % 17) % 3 = 0
                  THEN 0.5 * ({O.alpha_ratio('text')})
                  ELSE {O.alpha_ratio('text')} END AS score
      FROM documents
    ),
    q AS (
      SELECT doc_id, host,
             CAST(round(score * 1000000) AS bigint) AS vi
      FROM d
    ),
    s AS (
      SELECT host, CAST(count(*) AS bigint) AS group_n,
             CAST(sum(vi) AS bigint) AS vs
      FROM q GROUP BY 1
    )
    SELECT q.doc_id, q.host, s.group_n,
           round(CAST(vs AS double) / 1000000.0 / group_n, 6)
             AS group_mean,
           (group_n >= 5 AND vs < 500000 * group_n) AS below_prior
    FROM q JOIN s USING (host)
    """,
    doc="host-level quality prior (operators/corpus.py::"
        "group_prior_gate — RefinedWeb/FineWeb-style host filtering: a "
        "consistently-low-quality host condemns its pages wholesale, "
        "but a handful of bad pages must not condemn a host). The gate "
        "is INTEGER-exact: scores quantize to round(v*1e6) and the "
        "verdict is sum(v_int) < tau_int * n in bigint arithmetic, so "
        "it cannot flip with partition count or summation order the "
        "way avg(v) < tau near the threshold can. Fixture: every third "
        "host's scores halved (flagged), a 3-doc 'tiny' host with "
        "halved scores stays unflagged (the min_count=5 evidence "
        "floor), everyone else passes. Scale shape: one map-side-"
        "combinable groupBy over two bigint sums + one join back on "
        "the group key (one row per host — AQE broadcasts it); no "
        "window",
)
def corp_host_prior(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.functions import metrics

    d = F.col("doc_id")
    host = F.when(d < 3, F.lit("tiny")).otherwise(
        F.concat(F.lit("h"), (d % 17).cast("string"))
    )
    alpha = metrics.alpha_ratio("text")
    score = F.when(
        (d < 3) | ((d % 17) % 3 == 0), alpha * 0.5
    ).otherwise(alpha)
    base = _docs(spark, sf_dir).select(
        "doc_id", host.alias("host"), score.alias("score")
    )
    out = corpus.group_prior_gate(
        base, "score", group_col="host", tau=0.5, min_count=5
    )
    return out.select(
        "doc_id", "host", "group_n", "group_mean", "below_prior"
    )


@register(
    "o10_sized_shards",
    f"""
    WITH d AS (
      SELECT doc_id,
             {O.h64('cast(doc_id as varchar)')} % 32 AS lane,
             CAST(octet_length(encode(coalesce(text, ''))) AS bigint)
               AS n_bytes
      FROM documents
    ),
    c AS (
      SELECT doc_id, lane, n_bytes,
             coalesce(SUM(n_bytes) OVER (
               ORDER BY lane, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM d
    )
    SELECT doc_id, n_bytes,
           CAST(cum_before // 65536 AS int) AS shard_id
    FROM c
    """,
    doc="byte-balanced sharding (operators/sharding.py::"
        "assign_shards_sized): the export SLA is shard BYTES, not doc "
        "count — count-based shards skew badly on heavy-tailed "
        "document sizes. Documents lie end-to-end in (hash-lane, id) "
        "order and are cut every 64 KiB of cumulative size; oversize "
        "docs overflow their shard rather than split (splitting is "
        "pack_sequences' job). The referee is the naive global window "
        "cumsum; the engine runs the pack_sequences two-phase shape — "
        "per-lane window cumsum + 32 driver-side lane offsets "
        "broadcast back — bit-equal because byte counts are integers, "
        "never a global ORDER BY window",
)
def o10_sized_shards(spark, sf_dir):
    from llm_pretraining_data_pipeline_spark.operators import sharding

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.octet_length(F.coalesce(F.col("text"), F.lit("")))
        .cast("long")
        .alias("n_bytes"),
    )
    out = sharding.assign_shards_sized(
        d, target_bytes=65536, size_col="n_bytes"
    )
    return out.select("doc_id", "n_bytes", "shard_id")


@register(
    "a24_host_concentration",
    """
    WITH d AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'bighost'
                  ELSE 'h' || CAST(doc_id % 23 AS varchar) END AS host,
             CAST(n_chars AS bigint) AS w
      FROM documents
    ),
    per AS (SELECT host, CAST(sum(w) AS bigint) AS x FROM d GROUP BY 1),
    r AS (
      SELECT x,
             row_number() OVER (ORDER BY x, host) AS i,
             count(*) OVER () AS n,
             sum(x) OVER () AS tot
      FROM per
    )
    SELECT CAST(max(n) AS bigint) AS n_groups,
           CAST(max(tot) AS bigint) AS total,
           round(2.0 * CAST(sum(CAST(i AS hugeint) * x) AS double)
                   / (CAST(max(n) AS double) * CAST(max(tot) AS double))
                 - CAST(max(n) + 1 AS double) / CAST(max(n) AS double),
                 6) AS gini,
           round(CAST(sum(CAST(x AS hugeint) * x) AS double)
                   / (CAST(max(tot) AS double) * CAST(max(tot) AS double)),
                 6) AS hhi,
           round(CAST(max(x) AS double) / CAST(max(tot) AS double), 6)
             AS top1_share,
           round(CAST(sum(CASE WHEN i > n - 10 THEN x ELSE 0 END)
                      AS double)
                   / CAST(max(tot) AS double), 6) AS top10_share
    FROM r
    """,
    doc="corpus-concentration audit (operators/corpus.py::"
        "concentration_stats): Gini, Herfindahl, top-1/top-10 shares "
        "over per-host byte weights — the diversity gate a curator "
        "runs before accepting a crawl (one host owning 40% of the "
        "tokens is a dedup/bias incident waiting to happen). Fixture "
        "plants a 'bighost' holding every third doc over a 23-host "
        "tail. Accumulators are EXACT decimal sums (i·x and x² "
        "overflow bigint at 1e9 hosts × 1e11 weights) cast to double "
        "before one division — order-free, so the result can't wobble "
        "with partitioning (the a21 ordered-fold lesson solved with "
        "exact arithmetic). Scale shape: one groupBy collapses the "
        "corpus; all ranking runs on the one-row-per-host frame",
)
def a24_host_concentration(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        F.when(F.col("doc_id") % 3 == 0, F.lit("bighost"))
        .otherwise(
            F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string"))
        )
        .alias("host"),
        F.col("n_chars").cast("long").alias("w"),
    )
    return corpus.concentration_stats(d, group_col="host", weight_col="w")
