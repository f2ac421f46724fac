"""DuckDB SQL fragment builders mirroring the engine's Catalyst expressions.

Every fragment here is the DuckDB-side twin of a function in
``functions/`` — same integer arithmetic, same regexes (RE2-safe subset),
same operation order, so per-row doubles come out bit-identical and hashes
match exactly. Centralising them keeps the ~45 oracle queries in
``queries.py`` from drifting out of sync character by character.
"""

from __future__ import annotations

MERSENNE_31 = 2_147_483_647

# whitespace tokens of COALESCE(e,'') — matches text_norm.ws_tokens
def toks(e: str) -> str:
    return f"list_filter(str_split_regex(coalesce({e},''), '\\s+'), t -> t <> '')"


def canon_exact(e: str) -> str:
    """duplication.py canonical form: lower → collapse ws → trim; null → ''."""
    return f"coalesce(trim(regexp_replace(lower({e}), '\\s+', ' ', 'g')), '')"


def h64(e: str) -> str:
    return f"cast(concat('0x', substr(md5({e}),1,15)) as bigint)"


def h32(e: str) -> str:
    return f"({h64(e)} % {MERSENNE_31})"


def alpha_ratio(e: str) -> str:
    s = f"coalesce({e},'')"
    return (
        f"case when length({s}) > 0 then "
        f"cast(length(regexp_replace({s}, '[^\\p{{L}}]', '', 'g')) as double)"
        f" / cast(length({s}) as double) else 0.0 end"
    )


def repetition_ratio(e: str) -> str:
    t = toks(e)
    return (
        f"case when len({t}) > 0 then 1.0 - cast(len(list_distinct({t})) as double)"
        f" / cast(len({t}) as double) else 0.0 end"
    )


def stopword_ratio(e: str, stopwords: list[str]) -> str:
    lex = "[" + ",".join(f"'{w}'" for w in stopwords) + "]"
    t = toks(e)
    return (
        f"case when len({t}) > 0 then "
        f"cast(len(list_filter({t}, t -> list_contains({lex}, lower(t)))) as double)"
        f" / cast(len({t}) as double) else 0.0 end"
    )


def regexp_count(e: str, pattern: str) -> str:
    """Non-overlapping match count; pattern must be RE2-safe."""
    return f"cast(len(regexp_extract_all(coalesce({e},''), '{pattern}')) as bigint)"


def word_tokens_ascii(e: str) -> str:
    """toxicity.word_tokens(ascii_only=True): [a-z0-9_]+ runs of lowered text."""
    return f"regexp_extract_all(lower(coalesce({e},'')), '[a-z0-9_]+')"


def lexicon_hits(toks_sql: str, lexicon: list[str]) -> str:
    lex = "[" + ",".join(f"'{w}'" for w in lexicon) + "]"
    return f"len(list_filter({toks_sql}, t -> list_contains({lex}, t)))"


def scaled_score(hits: str, n: str) -> str:
    return f"least(1.0::double, cast({hits} as double) / cast({n} as double) * 5.0::double)"


def shingles(tk: str, n: int = 3) -> str:
    """Token n-gram shingles — twin of hashing.token_shingles."""
    return (
        f"case when len({tk}) >= {n} then "
        f"list_transform(range(1, len({tk}) - {n - 2}), "
        f"i -> array_to_string(list_slice({tk}, i, i + {n - 1}), ' ')) "
        f"when len({tk}) > 0 then [array_to_string({tk}, ' ')] "
        f"else [] end"
    )


def minhash_signature(sh: str, a: list[int], b: list[int]) -> str:
    """Twin of hashing.minhash_signature (same coefficient lists)."""
    a_sql = "[" + ",".join(str(x) for x in a) + "]"
    b_sql = "[" + ",".join(str(x) for x in b) + "]"
    return (
        f"list_transform(range(1, {len(a) + 1}), j -> list_min(list_transform({sh}, "
        f"s -> ({a_sql}[j] * {h32('s')} + {b_sql}[j]) % {MERSENNE_31})))"
    )


def length_score(tc: str, min_pref: int = 20, max_pref: int = 1000) -> str:
    """Twin of scoring.length_score (scoring_and_mixture.py:69-82)."""
    max_cap = max_pref * 4
    span = float(max_cap - max_pref)
    return (
        f"case when {tc} <= 0 then 0.0 "
        f"when {tc} < {min_pref} then cast({tc} as double) / cast({min_pref} as double) "
        f"when {tc} > {max_pref} then greatest(0.0::double, "
        f"1.0::double - cast(least({tc}, {max_cap}) - {max_pref} as double) / {span}) "
        f"else 1.0 end"
    )


def dot_double(a: str, b: str) -> str:
    """Twin of similarity.dot on double arrays: zip product then linear sum."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> cast({a}[i] as double) * cast({b}[i] as double)))"
    )


def norm_double(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> cast(x as double) * cast(x as double))))"


def cosine_double(a: str, b: str) -> str:
    return (
        f"case when {norm_double(a)} * {norm_double(b)} > 0 then "
        f"{dot_double(a, b)} / ({norm_double(a)} * {norm_double(b)}) else 0.0 end"
    )


def word_ngrams(w: str, n: int) -> str:
    """Twin of operators/corpus.ngrams: space-joined word n-grams, [] if short.

    DuckDB range(1, len-n+2) is already [] when len < n, matching the
    Spark-side CaseWhen guard.
    """
    return (
        f"list_transform(range(1, len({w}) - {n} + 2), "
        f"i -> array_to_string(list_slice({w}, i, i + {n - 1}), ' '))"
    )


def list_char_sum(lst: str) -> str:
    """Sum of element lengths of a varchar list, 0 for empty (bigint)."""
    return (
        f"coalesce(cast(list_aggregate(list_transform({lst}, "
        f"x -> cast(length(x) as bigint)), 'sum') as bigint), 0)"
    )


def trimmed_lines(e: str) -> str:
    """Twin of corpus.repetition_signals' line split: trim, drop empties."""
    return (
        f"list_filter(list_transform(str_split(coalesce({e},''), chr(10)), "
        f"l -> trim(l)), l -> l <> '')"
    )


def l2sq_double(a: str, b: str) -> str:
    """Twin of similarity.l2sq on double arrays: element-wise squared diff,
    linear sum (same fold order as F.aggregate)."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> (cast({a}[i] as double) - cast({b}[i] as double)) * "
        f"(cast({a}[i] as double) - cast({b}[i] as double))))"
    )
