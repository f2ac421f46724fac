"""URL normalisation and domain operators (C4 / RefinedWeb-style).

Web-scale pretraining corpora filter and deduplicate at the URL level before
ever touching document text: RefinedWeb (Penedo et al. 2023, §3.1) runs URL
dedup + a domain blocklist as its first stage, and C4 (Raffel et al. 2020,
§2.2) filters source URLs against a banned-domain list. These operators are
the Spark-side equivalents. The reference pipeline has no URL stage (its
ingest keeps ``url`` as an opaque provenance string, ingest.py:131) — this is
§2.9 scale surface, not reference parity.

Design constraints:
  * Pure Catalyst expressions (regex + array HOFs) — no UDF, fully
    codegen-fused, and mirrorable in DuckDB for the oracle referees
    (p27/d10/a13). Patterns are RE2-safe (no backreferences/lookaround) so
    Java regex and DuckDB's RE2 agree.
  * Deterministic: same string in, same string out; no DNS, no punycode,
    no PSL lookup (the registrable-domain helper is the last-two-labels
    approximation — a real deployment swaps in the public-suffix list as a
    broadcast join, same plan shape).

At 100 TB every helper here is a narrow per-row projection (no shuffle);
``url_dedup`` induces exactly one hash shuffle on the 64-hex url key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions.text_norm import _col

# Tracking query parameters stripped by normalize_url (the common
# click-provenance params that fragment otherwise-identical URLs).
# Case-insensitive: query param NAMES arrive in any case, and a
# case-sensitive match would both let UTM_SOURCE= through and break
# normalize_url's idempotence (the param would survive pass 1 but be
# stripped after the lowercasing on pass 2).
TRACKING_PARAM_RE = "(?i)^(utm_[^=]*|gclid|fbclid)="


def normalize_url(c: Column | str) -> Column:
    """Canonical URL for dedup/grouping.

    Steps (each mirrored literally in the DuckDB oracle):
      1. trim surrounding whitespace;
      2. drop the fragment (``#...`` — never sent to servers);
      3. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``) by
         splitting the query on ``&`` and filtering — rebuilding avoids the
         dangling-separator mess of in-place regex deletion;
      4. strip trailing ``/`` from the PATH (applied to the pre-query base,
         so a ``/`` at the end of a query value survives — ``?next=/`` is
         data, not path);
      5. lowercase (scheme and host are case-insensitive; corpus URL dedup
         conventionally folds the path too).
    """
    t = F.trim(_col(c).cast("string"))
    # Fragment is stripped FIRST, then base/query are parsed from the
    # pre-fragment text. Extracting the query from the full string would
    # match a '?' sitting after the '#' (SPA hash routes like
    # 'page#/route?x=1') and resurrect fragment data as a real query.
    pre = F.regexp_extract(t, r"^[^#]*", 0)
    base = F.regexp_replace(F.regexp_extract(pre, r"^[^?]*", 0), r"/+$", "")
    query = F.regexp_extract(pre, r"\?(.*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    rebuilt = F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)
    return F.lower(rebuilt)


def url_domain(c: Column | str, strip_www: bool = True) -> Column:
    """Hostname of a URL: text in the authority after any ``userinfo@``
    and before the first ``/ ? # :`` (port dropped), lowercased, with a
    leading ``www.`` removed by default. Userinfo MUST be skipped — and
    greedily up to the LAST ``@`` in the authority (WHATWG semantics), or a
    banned-domain filter is evaded by ``https://a@b@blocked.com/`` (a
    single-@ skip would read the host as ``b``). Scheme-less inputs yield
    '' (null-safe: null → '')."""
    host = F.lower(
        F.regexp_extract(
            F.trim(F.coalesce(_col(c).cast("string"), F.lit(""))),
            r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#:@]+)",
            1,
        )
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def registrable_domain(host: Column | str) -> Column:
    """Last-two-labels approximation of the registrable domain
    (``cdn.src1.example.com`` → ``example.com``). Good enough for grouping
    synthetic corpora; production swaps in the public-suffix list as a
    broadcast join (same plan shape, still no shuffle on the fact side)."""
    return F.regexp_extract(_col(host), r"[^.]+\.[^.]+$", 0)


def domain_is_blocked(host: Column | str, blocklist: list[str]) -> Column:
    """True iff ``host`` equals a blocked domain or is a subdomain of one.

    The blocklist is compiled into a literal OR-chain of equality/suffix
    predicates — for real blocklists (10k+ entries) use a broadcast join
    against a blocklist table on ``registrable_domain`` instead; this
    literal form is for small embedded lists and oracle parity.
    """
    h = _col(host)
    pred = F.lit(False)
    for d in blocklist:
        dl = d.lower()
        pred = pred | (h == dl) | h.endswith("." + dl)
    return pred


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """URL-level keep-first dedup (RefinedWeb §3.1 runs this BEFORE any
    content processing — it prunes refetches of the same page without
    reading a byte of text).

    Adds ``url_norm``, ``is_dup_url``, ``dup_of_url`` (the keeper's id, own
    type preserved, null for keepers). One hash shuffle on the normalised
    URL; at 100 TB run it on the (id, url) projection and join the verdict
    back, exactly like ``exact_dedup(..., narrow_shuffle=True)`` — URLs are
    short, so the wide-frame window is usually fine too.

    Rows with a null or empty URL get per-row solo group keys (the
    ``exact_dedup`` pattern): "no URL" is absence of evidence, not a shared
    identity, so URL-less docs are never marked dups of each other — and
    the otherwise-giant null window partition disappears.
    """
    from pyspark.sql import Window

    order_col = order_col or (
        "row_order" if "row_order" in df.columns else id_col
    )
    out = df.withColumn("url_norm", normalize_url(url_col))
    # Both branches carry a distinct prefix: unlike exact_dedup (whose
    # group key is a sha256 hex string that cannot contain \x00), url_norm
    # is raw text, so a crafted URL equal to the solo sentinel could
    # otherwise collide into a null-URL doc's window group.
    group = F.when(
        F.col("url_norm").isNull() | (F.col("url_norm") == ""),
        F.concat(F.lit("\x00solo\x00"), F.col(id_col).cast("string")),
    ).otherwise(F.concat(F.lit("\x01url\x01"), F.col("url_norm")))
    out = out.withColumn("_url_group", group)
    w = Window.partitionBy("_url_group").orderBy(F.col(order_col))
    rn = F.row_number().over(w)
    keeper = F.first(F.col(id_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        out.withColumn("is_dup_url", rn > 1)
        .withColumn(
            "dup_of_url", F.when(rn > 1, keeper).otherwise(F.lit(None))
        )
        .drop("_url_group")
    )


def url_quality_filter(
    df: DataFrame,
    url_col: str = "url",
    blocklist: list[str] | None = None,
    bad_tlds: tuple[str, ...] = ("click", "top", "loan"),
    max_url_len: int = 256,
    max_digits: int = 12,
) -> DataFrame:
    """FineWeb/C4-style URL-level quality filter, run BEFORE any document
    text is read (the cheapest drop in the whole pipeline — RefinedWeb
    §3.1 and FineWeb both gate on URL signals first):

      1. ``url_missing``         — null/whitespace-only URL;
      2. ``url_blocked_domain``  — domain on the blocklist (exact or
         subdomain suffix; production uses a broadcast blocklist join,
         see ``domain_is_blocked``);
      3. ``url_bad_tld``         — registrable TLD on the spam-heavy list;
      4. ``url_too_long``        — raw URL longer than ``max_url_len``
         (session-id / tracking monsters);
      5. ``url_excess_digits``   — more than ``max_digits`` digit chars in
         the whole URL (calendar pages, session ids, auto-generated spam).

    First-match-wins via the engine's shared ``first_match_expr``
    combinator — ONE chained CaseWhen projection, zero shuffle, codegen'd;
    later rules are not evaluated for rows an earlier rule dropped. Adds
    ``url_drop_reason`` (null = keep) and ``url_keep``.
    """
    from llm_pretraining_data_pipeline_spark.operators.rules import (
        first_match_expr,
    )

    u = _col(url_col)
    trimmed = F.trim(F.coalesce(u, F.lit("")))
    dom = url_domain(u)
    tld = F.regexp_extract(dom, r"[^.]+$", 0)
    n_digits = F.length(F.regexp_replace(trimmed, r"[^0-9]", ""))
    rules = [
        ("url_missing", trimmed == ""),
        ("url_blocked_domain", domain_is_blocked(dom, list(blocklist or []))),
        ("url_bad_tld", tld.isin([t.lower() for t in bad_tlds])),
        ("url_too_long", F.length(trimmed) > max_url_len),
        ("url_excess_digits", n_digits > max_digits),
    ]
    reason = first_match_expr(rules)
    return df.withColumn("url_drop_reason", reason).withColumn(
        "url_keep", reason.isNull()
    )


# ---------------------------------------------------------------- robots.txt


def parse_robots(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt → ``(domain, prefix)`` Disallow rules for ``User-agent: *``.

    The crawl-politeness gate every responsible corpus build runs: a
    document fetched from a path its host disallows is dropped before it
    enters the corpus (C4 respected robots at crawl time; re-filtering at
    curation time catches policy changes). Implements the classic subset
    of REP (RFC 9309): ``User-agent`` lines open a group (consecutive UA
    lines share one group, per spec), ``Disallow`` lines contribute path
    prefixes, ``#`` comments and blank/empty-prefix Disallows are ignored,
    and only groups naming ``*`` apply. Allow-PRECEDENCE and wildcards
    are out of scope (documented; a swap-in point for a full matcher) —
    but every ``key: value`` rule line (Allow, Crawl-delay, Sitemap, …)
    still participates in GROUP SEGMENTATION: a UA line following any
    non-UA rule line opens a new group, per spec. Dropping those lines
    before segmentation would merge ``User-agent: *`` / ``Allow: /`` /
    ``User-agent: GPTBot`` / ``Disallow: /`` (the ubiquitous
    block-AI-bots shape) into ONE group and wrongly blanket-ban the
    domain for ``*``.

    Entirely JVM-side: posexplode the line list, a per-domain cumulative
    window assigns group ids (robots files are a few hundred lines — the
    window partitions by domain, never sees the corpus), then one groupBy
    keeps ``*`` groups. Output is the small broadcastable rule frame
    ``robots_gate`` consumes.
    """
    from pyspark.sql import Window

    d = F.col(domain_col)
    lines = robots.select(
        d.alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).select(
        "domain",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    # Keep EVERY key:value rule line for segmentation (Allow/Crawl-delay/
    # Sitemap break UA runs even though only UA/Disallow feed the output).
    lines = lines.select(
        "domain",
        "pos",
        F.lower(F.regexp_extract("line", r"(?i)^([a-z-]+)\s*:", 1))
        .alias("key"),
        F.trim(F.regexp_extract("line", r"(?i)^[a-z-]+\s*:(.*)$", 1))
        .alias("value"),
    ).where(F.col("key") != "")
    w = Window.partitionBy("domain").orderBy("pos")
    is_ua = F.col("key") == "user-agent"
    # a UA line opens a NEW group only if the previous kept line wasn't UA
    opens = is_ua & ~F.coalesce(F.lag(is_ua.cast("boolean")).over(w), F.lit(False))
    grouped = lines.select(
        "domain", "pos", "key", "value",
        F.sum(opens.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("grp"),
    )
    return (
        grouped.groupBy("domain", "grp")
        .agg(
            F.max(
                (is_ua & (F.lower(F.col("value")) == "*")).cast("int")
            ).alias("is_star"),
            F.collect_set(
                F.when(
                    (F.col("key") == "disallow") & (F.col("value") != ""),
                    F.col("value"),
                )
            ).alias("prefixes"),
        )
        .where(F.col("is_star") == 1)
        .select("domain", F.explode("prefixes").alias("prefix"))
        .distinct()
    )


def robots_gate(
    docs: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag documents whose URL path a ``User-agent: *`` Disallow covers.

    ``rules`` is ``parse_robots`` output — per-domain rule sets are tiny,
    so the join broadcasts (rules on the right of the left join: a LEFT
    join can only broadcast its non-preserved side). Emits one row per
    input doc with ``disallowed`` and the LONGEST matching prefix
    (deterministic arg-max via max(struct)); unmatched and rule-less
    domains pass with ``disallowed=false``.
    """
    # Scheme matching must be case-tolerant like url_domain's (an
    # 'HTTPS://…' URL resolving a domain but an empty path would bypass
    # the gate), and a URL with no path component is semantically '/'
    # (so 'Disallow: /' covers the site root).
    raw_path = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$", 1
    )
    base = docs.select(
        id_col,
        F.col(url_col).alias("_url"),
        url_domain(F.col(url_col)).alias("_dom"),
        F.when(
            (url_domain(F.col(url_col)) != "") & (raw_path == ""), F.lit("/")
        ).otherwise(raw_path).alias("_path"),
    )
    joined = base.join(
        F.broadcast(rules),
        (base["_dom"] == rules["domain"])
        & base["_path"].startswith(rules["prefix"]),
        "left",
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.first("_url").alias("url"),
            F.max(
                F.when(
                    F.col("prefix").isNotNull(),
                    F.struct(F.length("prefix").alias("l"), F.col("prefix").alias("p")),
                )
            ).alias("_m"),
        )
        .select(
            id_col,
            "url",
            F.col("_m").isNotNull().alias("disallowed"),
            F.col("_m.p").alias("matched_prefix"),
        )
    )
