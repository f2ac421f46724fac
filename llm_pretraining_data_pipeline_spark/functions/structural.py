"""Structural cleanup: HTML strip, boilerplate line removal, repeat collapse.

Reference: deep_clean_and_pii.py:77-205. The reference mutates module-global
debug counters inside these functions (an explicit anti-pattern for a
distributed engine, SURVEY.md §2.5 A10); the equivalent observability here is
the ``cleanup_stats`` aggregate built from ``changed``-style expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.text_norm import _col

# Verbatim patterns from deep_clean_and_pii.py:78-87; the reference matches
# each against the lowercased line, so a single (?i) alternation is exact.
BOILERPLATE_PATTERNS = [
    r"cookie(s)? policy",
    r"accept( all)? cookies",
    r"privacy policy",
    r"terms of service",
    r"all rights reserved",
    r"sign up for our newsletter",
    r"subscribe to our newsletter",
    r"contact us",
]
BOILERPLATE_COMBINED = "(" + "|".join(BOILERPLATE_PATTERNS) + ")"

LINE_BREAK = "\\r\\n|\\r|\\n"


def strip_html(c: Column | str) -> Column:
    """Delete ``<[^>]+>`` tag spans, replacing with a space; null passthrough."""
    return F.regexp_replace(_col(c).cast("string"), "<[^>]+>", " ")


def remove_boilerplate_lines(c: Column | str) -> Column:
    """Drop lines matching any boilerplate pattern (case-insensitive), rejoin
    with newline, trim — all via array HOFs, no UDF."""
    s = _col(c).cast("string")
    lines = F.split(s, LINE_BREAK)
    kept = F.filter(lines, lambda l: ~F.lower(l).rlike(BOILERPLATE_COMBINED))
    return F.trim(F.array_join(kept, "\n"))


def normalize_repeated_chars(c: Column | str) -> Column:
    """Collapse ≥3 repeated punctuation to 2; any char ≥4 in a row to 3.

    Java regex supports the backreferences the reference uses
    (deep_clean_and_pii.py:163-165); these two patterns are therefore pure
    JVM expressions (note: NOT RE2-expressible — the oracle uses a
    pre-computed fixture for this operator, SURVEY.md §7 trap list).
    """
    s = _col(c).cast("string")
    s = F.regexp_replace(s, "([!?.,])\\1{2,}", "$1$1")
    return F.regexp_replace(s, "(.)\\1{3,}", "$1$1$1")


def structural_cleanup(c: Column | str) -> Column:
    """strip_html → remove_boilerplate_lines → normalize_repeated_chars."""
    return normalize_repeated_chars(remove_boilerplate_lines(strip_html(c)))


# HTML named character references decoded by ``decode_html_entities``:
# the HTML4 core set plus the names that dominate real web text (the full
# HTML5 table is ~2,200 names — extend here as needed). Case-sensitive
# per spec (``&Eacute;`` ≠ ``&eacute;``). ``amp`` needs no special
# ordering: the decoder is a single forward pass, so decoded output is
# never rescanned (``&amp;amp;`` → ``&amp;``, the HTML5 result).
_NAMED_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": "\u00a0", "copy": "©", "reg": "®",
    "trade": "™", "deg": "°", "plusmn": "±",
    "middot": "·", "hellip": "…", "mdash": "—",
    "ndash": "–", "lsquo": "‘", "rsquo": "’",
    "ldquo": "“", "rdquo": "”", "laquo": "«",
    "raquo": "»", "sect": "§", "para": "¶",
    "micro": "µ", "times": "×", "divide": "÷",
    "frac12": "½", "frac14": "¼", "frac34": "¾",
    "sup1": "¹", "sup2": "²", "sup3": "³",
    "agrave": "à", "aacute": "á", "auml": "ä",
    "ccedil": "ç", "egrave": "è", "eacute": "é",
    "euml": "ë", "iacute": "í", "ntilde": "ñ",
    "oacute": "ó", "ouml": "ö", "uacute": "ú",
    "uuml": "ü", "szlig": "ß", "Aacute": "Á",
    "Eacute": "É", "Ouml": "Ö", "Uuml": "Ü",
    "euro": "€", "pound": "£", "cent": "¢",
    "yen": "¥", "curren": "¤", "bull": "•",
    "dagger": "†", "Dagger": "‡", "permil": "‰",
    "prime": "′", "Prime": "″", "minus": "−",
    "shy": "\u00ad", "iexcl": "¡", "iquest": "¿",
}

# An entity token at the start of a split part: decimal (&#65;), hex
# (&#x41; / &#X41;), or a named reference. Semicolon REQUIRED — the
# HTML5 "missing-semicolon" legacy compatibility table is not modeled.
# HTML5 puts NO digit-count limit on numeric references (zero-padded
# '&#000000065;' is real web text); the bounds below only protect the
# bigint cast/conv (18 decimal / 15 hex digits stay in range), and
# anything longer passes through literally.
_ENTITY_TOKEN_RE = (
    r"^&(#[0-9]{1,18}|#[xX][0-9A-Fa-f]{1,15}|[A-Za-z][A-Za-z0-9]{1,31});"
)


def _utf8_char(cp: Column) -> Column:
    """Codepoint (bigint) → its character, by arithmetic UTF-8 byte
    assembly (shift/mod → two-digit hex per byte → unhex → decode).
    Spark's ``chr()`` truncates to ``n % 256`` so it cannot express
    codepoints above U+00FF; this can. Invalid codepoints (0, UTF-16
    surrogates, > U+10FFFF) yield U+FFFD per the HTML5
    numeric-character-reference rules (the Windows-1252 remapping of the
    C1 range 0x80-0x9F is NOT modeled — those decode as-is)."""
    valid = (
        (cp >= 1) & (cp <= 0x10FFFF) & ~((cp >= 0xD800) & (cp <= 0xDFFF))
    )
    p = F.when(valid, cp).otherwise(F.lit(0xFFFD))

    def h2(n: Column) -> Column:
        return F.lpad(F.hex(n), 2, "0")

    lo6 = 128 + (p % 64)
    hx = (
        F.when(p < 0x80, h2(p))
        .when(p < 0x800, F.concat(h2(192 + F.shiftright(p, 6)), h2(lo6)))
        .when(
            p < 0x10000,
            F.concat(
                h2(224 + F.shiftright(p, 12)),
                h2(128 + (F.shiftright(p, 6) % 64)),
                h2(lo6),
            ),
        )
        .otherwise(
            F.concat(
                h2(240 + F.shiftright(p, 18)),
                h2(128 + (F.shiftright(p, 12) % 64)),
                h2(128 + (F.shiftright(p, 6) % 64)),
                h2(lo6),
            )
        )
    )
    return F.decode(F.unhex(hx), "UTF-8")


def decode_html_entities(c: Column | str) -> Column:
    """Decode HTML character references — named (``&amp;``), decimal
    (``&#233;``) and hex (``&#xE9;`` / ``&#XE9;``) — in ONE forward pass,
    the HTML5 tokenizer semantics: decoded output is never rescanned, so
    double-escaped text un-escapes exactly one level (``&amp;amp;`` →
    ``&amp;``, ``&amp;#65;`` → ``&#65;``). Unknown names and bare ``&``
    pass through literally; invalid numeric codepoints become U+FFFD.

    The reference's own strip_html (deep_clean_and_pii.py:92-116) deletes
    tags but leaves entity literals in the text, poisoning alpha ratios,
    tokenization, and dedup keys on real entity-dense web HTML — this is
    the curation-side fix (VERDICT r10 missing-item 1).

    Pure Catalyst: split the text before each ``&`` (zero-width
    lookahead, so nothing is consumed), decode each part's leading entity
    token via a foldable literal map (named) or arithmetic UTF-8 assembly
    (numeric), and rejoin. Zero shuffle, zero Python in the hot path;
    interpreted-HOF rules apply — callers that reference the result more
    than once should bind it behind a generator barrier the way
    ``plans/web_curation.py`` does."""
    s = _col(c).cast("string")
    named_map = F.create_map(
        *[
            F.lit(x)
            for kv in sorted(_NAMED_ENTITIES.items())
            for x in kv
        ]
    )

    def _decode_part(p: Column) -> Column:
        tok = F.regexp_extract(p, _ENTITY_TOKEN_RE, 1)
        rest = F.substring(p, F.length(tok) + 3, F.lit(2147483647))
        is_hex = tok.rlike("^#[xX]")
        cp = F.when(
            is_hex, F.conv(F.substring(tok, 3, 15), 16, 10).cast("bigint")
        ).otherwise(
            F.substring(tok, 2, 18).cast("bigint")
        )
        named = F.try_element_at(named_map, tok)
        return (
            F.when(tok == "", p)
            .when(tok.startswith("#"), F.concat(_utf8_char(cp), rest))
            .when(named.isNotNull(), F.concat(named, rest))
            .otherwise(p)
        )

    return F.array_join(
        F.transform(F.split(s, "(?=&)"), _decode_part), ""
    )


def cleanup_stats(df: DataFrame, raw_col: str, cleaned_col: str) -> DataFrame:
    """Distributed replacement for the reference's global debug counters:
    one aggregation pass computing had_tags / changed counts."""
    raw = F.col(raw_col)
    return df.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.count_if(raw.contains("<") & raw.contains(">")).alias("docs_with_tag_chars"),
        F.count_if(F.col(cleaned_col) != raw).alias("docs_changed"),
    )


# href value up to the closing quote; group 1 = the URL. RE2-safe (no
# lookaround), case-insensitive via inline flag so DuckDB mirrors it.
# The attribute must start the string or follow whitespace (explicit class,
# not \s — Java/RE2 disagree on \x0B), so lookalike attributes ending in
# "href" (data-href=, xlink:href=) and glued-on text never collect. The
# non-capturing prefix keeps the URL as group 1 on both engines.
_HREF_RE = r"""(?i)(?:^|[ \t\n\r\f])href="([^"]+)\""""


def extract_links(c: Column | str) -> Column:
    """All ``href="..."`` URL values in an HTML string, in document order —
    the outlink extraction a web pipeline runs before ``strip_html``
    (URL-frontier seeding, anchor statistics, link-based spam signals).

    Returns array<string> ([] for null/linkless text). Double-quoted hrefs
    only — the dominant serialized form; single-quoted/unquoted variants
    are a regex union away, kept out to stay char-exact with the oracle.
    Pure per-row projection: zero shuffle at any scale.
    """
    return F.regexp_extract_all(
        F.coalesce(_col(c).cast("string"), F.lit("")), F.lit(_HREF_RE), F.lit(1)
    )


# href= must sit at the tag start or after whitespace — a bare [^>]*
# prefix would let the greedy scan land inside data-href=/xlink:href=
# (review finding). The EXPLICIT whitespace class (not \s) is the
# _HREF_RE convention: Java's \s includes \x0B, RE2's does not, and
# the two extractors must agree on which links exist.
_ANCHOR_RE = (
    r"""(?is)<a[ \t\n\r\f](?:[^>]*[ \t\n\r\f])?"""
    r"""href="([^"]+)"[^>]*>(.*?)</a>"""
)


def extract_anchors(c: Column | str) -> Column:
    """Outlinks WITH their anchor text — ``array<struct<href, anchor>>``
    in document order. Anchor text is the web-graph quality signal the
    link-only ``extract_links`` drops: what OTHER pages call a URL
    (the classic anchor-text corpus; search and curation pipelines
    aggregate it per target as an off-page description).

    ``anchor`` is the cleaned inner text: nested tags stripped, all
    whitespace runs (newlines included — anchors wrap) collapsed to one
    space, trimmed. Double-quoted hrefs only, same char-exact contract
    as ``extract_links``. Two aligned ``regexp_extract_all`` passes
    (group 1 / group 2) zipped — the engines agree because the SAME
    pattern produces both lists. Pure per-row projection: zero Python,
    zero shuffle at any scale.
    """
    s = F.coalesce(_col(c).cast("string"), F.lit(""))
    hrefs = F.regexp_extract_all(s, F.lit(_ANCHOR_RE), F.lit(1))
    raw = F.regexp_extract_all(s, F.lit(_ANCHOR_RE), F.lit(2))
    cleaned = F.transform(
        raw,
        lambda x: F.trim(
            F.regexp_replace(
                F.regexp_replace(x, F.lit(r"<[^>]*>"), F.lit("")),
                F.lit(r"\s+"),
                F.lit(" "),
            )
        ),
    )
    return F.zip_with(
        hrefs,
        cleaned,
        lambda h, a: F.struct(h.alias("href"), a.alias("anchor")),
    )


# UTF-8 bytes mis-decoded as Latin-1/cp1252 — the classic web-scrape
# mojibake ftfy repairs (The Pile and friends run exactly this pass).
# Ordered longest-first so a 3-char sequence is never half-consumed by a
# 2-char rule; every entry is the cp1252 rendering of the character's
# UTF-8 bytes. Literal replace (no regex), so both engines are char-exact.
MOJIBAKE_TABLE: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€”", "—"),  # â€” -> —
    ("â€“", "–"),  # â€“ -> –
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã©", "é"),  # Ã© -> é
    ("Ã­", "í"),  # Ã­ -> í
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("ÃŸ", "ß"),  # ÃŸ -> ß
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â°", "°"),  # Â° -> °
    ("Â ", " "),       # Â + nbsp -> space
]


def fix_mojibake(c: Column | str) -> Column:
    """Repair the common UTF-8-decoded-as-Latin-1 sequences (ftfy's core
    fix, table above): an ordered chain of LITERAL replaces — no regex, so
    nothing needs escaping and the DuckDB twin is replace() for replace().
    Null passthrough. Per-row projection, zero shuffle.

    Idempotent on SINGLY-encoded text (the tested contract). DOUBLY-encoded
    sequences ('ÃƒÂ©', 'ÂÂ«' — mojibake of mojibake) repair one layer per
    pass, because a replacement can expose the next layer underneath; run
    to a fixed point for nested damage, exactly as ftfy does.
    """
    out = _col(c).cast("string")
    for bad, good in MOJIBAKE_TABLE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


# content value of a <meta name="robots" ...> tag (either attribute order),
# double-quoted form; group 1 carries the value in each variant. RE2-safe.
# explicit whitespace class: Java \s includes \x0B, RE2's does not — the
# literal class is what actually makes the pattern engine-identical
_WS = "[ \\t\\n\\r\\f]+"
_META_ROBOTS_NC = f'(?i)<meta{_WS}name="robots"{_WS}content="([^"]*)"'
_META_ROBOTS_CN = f'(?i)<meta{_WS}content="([^"]*)"{_WS}name="robots"'


def meta_robots(c: Column | str) -> Column:
    """The content of the page's ``<meta name="robots">`` tag ('' if
    absent), lowercased — both attribute orders accepted. Pair with
    ``has_noindex`` for the opt-out filter an ethical web pipeline runs
    before keeping a page."""
    t = F.coalesce(_col(c).cast("string"), F.lit(""))
    first = F.regexp_extract(t, _META_ROBOTS_NC, 1)
    second = F.regexp_extract(t, _META_ROBOTS_CN, 1)
    return F.lower(F.when(first != "", first).otherwise(second))


def has_noindex(c: Column | str) -> Column:
    """True iff the robots meta contains a 'noindex' or 'none' directive
    (comma-separated token match, not substring)."""
    toks = F.transform(
        F.split(meta_robots(c), ","), lambda x: F.trim(x)
    )
    return F.arrays_overlap(toks, F.array(F.lit("noindex"), F.lit("none")))


# Block-level tags that delimit content blocks for main-content extraction.
_BLOCK_TAG_RE = r"(?i)</?(?:p|div|li|h[1-6]|section|article|td|tr|table|ul|ol)[^>]*>"
# Non-greedy across nested inline markup (<a ...><b>text</b></a>);
# the captured span is tag-stripped and whitespace-normalized before
# measuring, mirroring how the block text itself is measured.
_ANCHOR_TEXT_RE = r"(?is)<a[^>]*>(.*?)</a>"


def extract_main_content(
    c: Column | str,
    min_words: int = 5,
    max_link_density: float = 0.5,
    smooth: bool = False,
) -> Column:
    """jusText/trafilatura-style main-content extraction: split the HTML
    into blocks at block-level tags, classify each block by LENGTH and
    LINK DENSITY, keep the content blocks — the boilerplate-removal step
    real web curation runs between raw HTML and any text filter
    (navigation bars, footers, and button rows are mostly anchor text;
    body paragraphs are long and link-sparse).

    A block survives iff its stripped text has ``>= min_words`` words AND
    its anchor-text characters are ``<= max_link_density`` of its text
    characters. Returns a struct column ``(text, n_blocks, n_kept)`` —
    ``text`` is the kept blocks joined by newline, ``n_blocks`` counts
    non-empty blocks before classification.

    Entirely JVM array-HOF work, zero shuffle; the per-block struct array
    is built ONCE and bound before the filter/count passes reference it
    (the interpreted-HOF no-CSE discipline).

    ``smooth=True`` adds jusText's good-neighbor context pass (Pomikálek
    2011 §3.4, simplified to adjacent blocks): a SHORT block (fewer than
    ``min_words`` words) that passes the link-density gate is reclassified
    as content when BOTH adjacent non-empty blocks are independently good
    — the one-line transition sentence between two body paragraphs
    survives instead of being dropped for length. Opt-in so the default
    output (and its oracle) is unchanged.
    """
    s = F.coalesce(_col(c).cast("string"), F.lit(""))
    # one struct per raw block: stripped text + anchor-text char count
    blocks = F.transform(
        F.split(s, _BLOCK_TAG_RE),
        lambda b: F.struct(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(b, "<[^>]+>", " "), r"\s+", " "
                )
            ).alias("t"),
            F.aggregate(
                F.transform(
                    F.regexp_extract_all(b, F.lit(_ANCHOR_TEXT_RE), 1),
                    lambda a: F.length(
                        F.trim(
                            F.regexp_replace(
                                F.regexp_replace(a, "<[^>]+>", " "),
                                r"\s+",
                                " ",
                            )
                        )
                    ),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("lc"),
        ),
    )
    nonempty = F.filter(blocks, lambda st: F.length(st["t"]) > 0)

    def _ld_ok(st):
        return st["lc"].cast("double") <= F.lit(
            float(max_link_density)
        ) * F.length(st["t"])

    def _long_enough(st):
        return F.size(F.split(st["t"], " ")) >= min_words

    if not smooth:
        kept = F.filter(nonempty, lambda st: _long_enough(st) & _ld_ok(st))
        # let-bind the arrays: transform(array(x), f)[0] evaluates each ONCE
        return F.transform(
            F.arrays_zip(F.array(nonempty), F.array(kept)),
            lambda z: F.struct(
                F.array_join(
                    F.transform(z["1"], lambda st: st["t"]), "\n"
                ).alias("text"),
                F.size(z["0"]).cast("long").alias("n_blocks"),
                F.size(z["1"]).cast("long").alias("n_kept"),
            ),
        )[0]

    # good-neighbor smoothing: keep[i] = good0[i] OR (short-but-link-ok[i]
    # AND good0[i-1] AND good0[i+1]). The neighbor flags come from the
    # base classification only (one pass, no fixpoint — jusText's
    # simplified context rule), built by shifting the good0 array one
    # slot each way with edge padding False. Every derived array lives
    # under a let-bind (transform(array(x), f)[0]) because interpreted
    # HOFs have no common-subexpression elimination.
    def _shift_prev(g):
        return F.concat(
            F.array(F.lit(False)),
            F.slice(g, 1, F.greatest(F.lit(0), F.size(g) - 1)),
        )

    def _shift_next(g):
        return F.concat(
            F.slice(g, 2, F.greatest(F.lit(0), F.size(g) - 1)),
            F.array(F.lit(False)),
        )

    return F.transform(
        F.array(nonempty),
        lambda ne: F.transform(
            F.array(F.transform(ne, lambda st: _ld_ok(st) & _long_enough(st))),
            lambda g: F.transform(
                F.array(
                    F.filter(
                        F.zip_with(
                            ne,
                            F.zip_with(
                                g,
                                F.zip_with(
                                    F.transform(
                                        ne,
                                        lambda st: _ld_ok(st)
                                        & ~_long_enough(st),
                                    ),
                                    F.zip_with(
                                        _shift_prev(g),
                                        _shift_next(g),
                                        lambda p, n: p & n,
                                    ),
                                    lambda s, pn: s & pn,
                                ),
                                lambda good, sm: good | sm,
                            ),
                            lambda st, k: F.when(k, st),
                        ),
                        lambda x: x.isNotNull(),
                    )
                ),
                lambda ka: F.struct(
                    F.array_join(
                        F.transform(ka, lambda st: st["t"]), "\n"
                    ).alias("text"),
                    F.size(ne).cast("long").alias("n_blocks"),
                    F.size(ka).cast("long").alias("n_kept"),
                ),
            )[0],
        )[0],
    )[0]


# Soft-404 phrase battery: the page SAYS it's an error while the HTTP
# status says 200 — a well-studied crawl pathology (Bar-Yossef et al.
# 2004, "Sic transit gloria telae"); CC archives are full of them and
# they poison dedup clusters (thousands of near-identical "not found"
# pages) and quality stats. Matched case-insensitively against the
# EARLY text (title + first lines carry the signal).
SOFT404_PATTERNS = [
    r"page (you requested )?(was |could )?not (be )?found",
    r"404 (error|not found)",
    r"error 404",
    r"no longer (exists|available)",
    r"page (has been|was) (removed|deleted|moved)",
    r"this page (does not|doesn't) exist",
    r"sorry, we (couldn't|could not) find",
]
SOFT404_COMBINED = "(" + "|".join(SOFT404_PATTERNS) + ")"


def soft404_score(
    c: Column | str, prefix_chars: int = 500
) -> Column:
    """Struct ``(soft404_hits, is_soft404)``: how many error-page
    phrases appear in the first ``prefix_chars`` characters, and the
    boolean gate (≥1 hit AND the prefix is at least half the document —
    a long article that merely QUOTES '404 not found' deep in its body
    is not an error page, but a short page leading with one is).

    Composes after the HTTP split: ``status == 200 AND is_soft404`` is
    the crawl-audit predicate. Pure per-row Catalyst (lower + one
    regexp_count over a bounded prefix), zero shuffle.
    """
    s = F.coalesce(_col(c).cast("string"), F.lit(""))
    prefix = F.lower(F.substring(s, 1, prefix_chars))
    hits = F.regexp_count(prefix, F.lit(SOFT404_COMBINED))
    short = F.length(s) <= 2 * prefix_chars
    return F.struct(
        hits.cast("int").alias("soft404_hits"),
        ((hits > 0) & short).alias("is_soft404"),
    )
