"""URL operator tests (functions/urls.py): normalisation edge cases the
derived oracle fixture cannot reach, domain extraction, blocklist
subdomain matching, and URL-dedup keep-first semantics."""

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.functions import urls


def _one(spark, url, expr_fn):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(expr_fn("url").alias("v")).collect()[0].v


class TestNormalizeUrl:
    def test_full_stack(self, spark):
        u = "  HTTPS://WWW.Example.COM/Docs/7?utm_source=Feed&ref=2&utm_medium=Mail#Frag  "
        assert _one(spark, u, urls.normalize_url) == "https://www.example.com/docs/7?ref=2"

    def test_all_params_tracking_drops_query(self, spark):
        u = "http://a.com/x?utm_a=1&gclid=z&fbclid=q"
        assert _one(spark, u, urls.normalize_url) == "http://a.com/x"

    def test_leading_tracking_param_rebuilds_separator(self, spark):
        # in-place regex deletion would leave "http://a.com/x&id=1"; the
        # split-and-rebuild contract restores the '?'
        u = "http://a.com/x?fbclid=ZZ&id=1"
        assert _one(spark, u, urls.normalize_url) == "http://a.com/x?id=1"

    def test_trailing_slashes_stripped(self, spark):
        assert _one(spark, "http://a.com/p///", urls.normalize_url) == "http://a.com/p"

    def test_null_and_empty(self, spark):
        df = spark.createDataFrame([(None,), ("",)], "url string")
        vals = [r.v for r in df.select(urls.normalize_url("url").alias("v")).collect()]
        assert vals == [None, ""] or vals == ["", ""]  # null-in propagates or folds

    def test_utm_not_stripped_from_path(self, spark):
        # only QUERY params are filtered; a path segment that merely looks
        # like one must survive
        u = "http://a.com/utm_source=decoy/page"
        assert _one(spark, u, urls.normalize_url) == "http://a.com/utm_source=decoy/page"


class TestUrlDomain:
    def test_strips_www_and_port(self, spark):
        assert _one(spark, "https://WWW.Sub.Example.com:8443/x", urls.url_domain) == "sub.example.com"

    def test_keeps_non_www_subdomain(self, spark):
        assert _one(spark, "https://cdn.example.com/x", urls.url_domain) == "cdn.example.com"

    def test_schemeless_is_empty(self, spark):
        assert _one(spark, "example.com/x", urls.url_domain) == ""

    def test_registrable_domain(self, spark):
        df = spark.createDataFrame([("cdn.src1.example.com",), ("example.com",), ("localhost",)], "h string")
        vals = [r.v for r in df.select(urls.registrable_domain("h").alias("v")).collect()]
        assert vals == ["example.com", "example.com", ""]


class TestBlocklist:
    def test_exact_subdomain_and_miss(self, spark):
        df = spark.createDataFrame(
            [("bad.org",), ("cdn.bad.org",), ("notbad.org",), ("bad.org.evil.com",)],
            "h string",
        )
        out = [
            r.v
            for r in df.select(
                urls.domain_is_blocked("h", ["bad.org"]).alias("v")
            ).collect()
        ]
        # exact hit, subdomain hit, no substring false-positive, no
        # prefix-spoof hit
        assert out == [True, True, False, False]


class TestUrlDedup:
    def test_keep_first_across_variants(self, spark):
        df = spark.createDataFrame(
            [
                (1, "http://A.com/x?utm_a=1"),
                (2, "http://a.com/x/"),
                (3, "http://a.com/y"),
            ],
            "doc_id long, url string",
        )
        out = {r.doc_id: r for r in urls.url_dedup(df).collect()}
        assert not out[1].is_dup_url and out[1].dup_of_url is None
        assert out[2].is_dup_url and out[2].dup_of_url == 1  # id type preserved
        assert not out[3].is_dup_url
        assert out[1].url_norm == out[2].url_norm == "http://a.com/x"


class TestReviewHardening:
    """Regressions from the round-5 code review."""

    def test_userinfo_cannot_evade_blocklist(self, spark):
        # https://x@blocked.com must yield host 'blocked.com', not 'x'
        assert _one(spark, "https://x@spam.example.org/p", urls.url_domain) == "spam.example.org"
        assert _one(spark, "https://u:pw@Spam.Example.org:443/p", urls.url_domain) == "spam.example.org"
        df = spark.createDataFrame([("https://anything@bad.org/",)], "url string")
        blocked = df.select(
            urls.domain_is_blocked(urls.url_domain("url"), ["bad.org"]).alias("b")
        ).collect()[0].b
        assert blocked

    def test_trailing_slash_in_query_value_survives(self, spark):
        # '/' at the end of a query VALUE is data, not path
        assert (
            _one(spark, "http://a.com/p?next=/x/", urls.normalize_url)
            == "http://a.com/p?next=/x/"
        )
        # while a path trailing slash is still stripped even with a query
        assert (
            _one(spark, "http://a.com/p/?id=1", urls.normalize_url)
            == "http://a.com/p?id=1"
        )

    def test_uppercase_tracking_params_stripped_and_idempotent(self, spark):
        u = "http://A.com/x?UTM_Source=Feed&id=1&FBCLID=z"
        once = _one(spark, u, urls.normalize_url)
        assert once == "http://a.com/x?id=1"
        assert _one(spark, once, urls.normalize_url) == once

    def test_normalize_idempotent_fuzz(self, spark):
        # idempotence over a grab-bag of shapes: normalize(normalize(u)) ==
        # normalize(u)
        cases = [
            "HTTPS://WWW.Ex.COM/A/B/?utm_a=1&x=2#f",
            "http://a.com///",
            "a.com/x?gclid=1",
            "http://u:p@H.com:80/p/?q=/v/",
            "",
            "   http://b.io/x?UTM_z=9   ",
        ]
        df = spark.createDataFrame([(c,) for c in cases], "url string")
        from pyspark.sql import functions as F

        rows = df.select(
            urls.normalize_url("url").alias("once"),
            urls.normalize_url(urls.normalize_url("url")).alias("twice"),
        ).collect()
        for r in rows:
            assert r.once == r.twice, r


class TestHypothesisFuzz:
    def test_normalize_idempotent_on_random_urls(self, spark):
        """Property: normalize_url is idempotent on arbitrary URL-shaped
        strings (hypothesis-generated corpus, evaluated in ONE Spark job)."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        scheme = st.sampled_from(["http", "HTTPS", "ftp"])
        host = st.from_regex(r"[A-Za-z0-9.-]{1,12}", fullmatch=True)
        path = st.from_regex(r"(/[A-Za-z0-9_.~%-]{0,8}){0,3}/?", fullmatch=True)
        key = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,6}", fullmatch=True)
        val = st.from_regex(r"[A-Za-z0-9/%.-]{0,6}", fullmatch=True)
        param = st.builds(lambda k, v: f"{k}={v}", key, val)
        query = st.lists(param, max_size=3).map(
            lambda ps: ("?" + "&".join(ps)) if ps else ""
        )
        frag = st.sampled_from(["", "#x", "#Sec-2"])
        url = st.builds(
            lambda s, h, p, q, f: f"{s}://{h}{p}{q}{f}", scheme, host, path, query, frag
        )

        cases = []

        @settings(max_examples=60, deadline=None,
                  suppress_health_check=list(HealthCheck))
        @given(url)
        def collect(u):
            cases.append(u)

        collect()
        df = spark.createDataFrame([(c,) for c in cases], "url string")
        rows = df.select(
            "url",
            urls.normalize_url("url").alias("once"),
            urls.normalize_url(urls.normalize_url("url")).alias("twice"),
        ).collect()
        bad = [(r.url, r.once, r.twice) for r in rows if r.once != r.twice]
        assert not bad, bad[:5]

    def test_double_at_cannot_evade_blocklist(self, spark):
        # WHATWG: the LAST '@' delimits userinfo — a@b@evil.com's host is
        # evil.com, and a single-@ skip would wrongly read 'b'
        assert _one(spark, "https://a@b@evil.com/x", urls.url_domain) == "evil.com"


class TestRound6Hardening:
    """Regressions from the round-5 ADVICE review."""

    def test_spa_hash_route_query_not_resurrected(self, spark):
        # A '?' AFTER '#' belongs to the fragment (SPA hash routing) and must
        # vanish with it — extracting the query from the full string would
        # rebuild 'https://a.com/page?x=1' out of fragment data
        assert (
            _one(spark, "https://a.com/page#/route?x=1", urls.normalize_url)
            == "https://a.com/page"
        )
        # real query BEFORE the fragment still survives intact
        assert (
            _one(spark, "https://a.com/page?x=1#/route?y=2", urls.normalize_url)
            == "https://a.com/page?x=1"
        )
        # and idempotence holds on the fragment-only shape
        once = _one(spark, "http://b.com/p/#frag?utm_a=1", urls.normalize_url)
        assert once == "http://b.com/p"
        assert _one(spark, once, urls.normalize_url) == once

    def test_url_dedup_null_and_empty_urls_never_dup(self, spark):
        # URL-less docs must not collapse into one giant window group and be
        # marked duplicates of whichever happened to sort first
        df = spark.createDataFrame(
            [
                (1, None),
                (2, ""),
                (3, "   "),
                (4, None),
                (5, "http://a.com/x"),
                (6, "http://A.com/x/"),
            ],
            "doc_id long, url string",
        )
        out = {r.doc_id: r for r in urls.url_dedup(df).collect()}
        for i in (1, 2, 3, 4):
            assert not out[i].is_dup_url, out[i]
            assert out[i].dup_of_url is None
        assert not out[5].is_dup_url
        assert out[6].is_dup_url and out[6].dup_of_url == 5
        assert "_url_group" not in urls.url_dedup(df).columns


class TestSoloSentinelCollision:
    def test_crafted_url_cannot_join_a_null_url_group(self, spark):
        # a URL whose normalized text equals the solo sentinel of doc 42
        crafted = "\x00solo\x0042"
        df = spark.createDataFrame(
            [(42, None), (7, crafted)], "doc_id long, url string"
        )
        out = {r.doc_id: r for r in urls.url_dedup(df).collect()}
        assert not out[42].is_dup_url and out[42].dup_of_url is None
        assert not out[7].is_dup_url and out[7].dup_of_url is None


class TestUrlQualityFilter:
    """Round 8: FineWeb-style URL-level quality cascade — every rule
    class fires, first-match-wins, clean URLs pass."""

    def test_every_rule_and_order(self, spark):
        from llm_pretraining_data_pipeline_spark.functions.urls import (
            url_quality_filter,
        )

        rows = [
            (1, None),
            (2, "   "),
            (3, "https://spam.bad.example/x"),
            (4, "https://sub.spam.bad.example/y"),        # subdomain suffix
            (5, "https://win-big.click/offer"),
            (6, "https://ok.example.org/" + "x" * 300),
            (7, "https://cal.example.org/2024/11/30/9876543210123"),
            (8, "https://ok.example.org/article-42"),      # clean
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = {
            r.doc_id: (r.url_drop_reason, r.url_keep)
            for r in url_quality_filter(
                df, blocklist=["spam.bad.example"],
                bad_tlds=("click",), max_url_len=256, max_digits=12,
            ).collect()
        }
        assert out[1] == ("url_missing", False)
        assert out[2] == ("url_missing", False)
        assert out[3] == ("url_blocked_domain", False)
        assert out[4] == ("url_blocked_domain", False)
        assert out[5] == ("url_bad_tld", False)
        assert out[6] == ("url_too_long", False)
        assert out[7] == ("url_excess_digits", False)
        assert out[8] == (None, True)

    def test_first_match_wins_blocked_beats_length(self, spark):
        from llm_pretraining_data_pipeline_spark.functions.urls import (
            url_quality_filter,
        )

        # blocked domain AND over-long AND digit-heavy: rule 2 labels it
        url = "https://spam.bad.example/" + "9" * 300
        df = spark.createDataFrame([(1, url)], "doc_id long, url string")
        row = url_quality_filter(
            df, blocklist=["spam.bad.example"], max_url_len=256
        ).collect()[0]
        assert row.url_drop_reason == "url_blocked_domain"

    def test_zero_shuffle_plan(self, spark):
        from llm_pretraining_data_pipeline_spark.functions.urls import (
            url_quality_filter,
        )

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("https://d"), F.col("id"), F.lit(".org/p")).alias("url"),
        )
        plan = (
            url_quality_filter(df, blocklist=["x.org"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # pure projection, no shuffle


class TestRobots:
    """parse_robots / robots_gate (functions/urls.py)."""

    ROBOTS = "\n".join([
        "# top comment",
        "User-agent: googlebot",
        "Disallow: /google-only",
        "",
        "USER-AGENT: bingbot   # trailing comment",
        "User-agent: *",
        "Disallow:",
        "disallow: /private",
        "Disallow: /tmp",
    ])

    def _rules(self, spark, txt=None):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame(
            [("a.example", txt or self.ROBOTS)], "domain string, robots_txt string"
        )
        out = urls.parse_robots(df).collect()
        return sorted((r["rule"], r["pattern"]) for r in out)

    def test_star_group_only(self, spark):
        # googlebot-only rule must not leak; empty Disallow ignored;
        # consecutive UA lines (bingbot + *) share one group per RFC 9309
        assert self._rules(spark) == [
            ("disallow", "/private"), ("disallow", "/tmp")
        ]

    def test_no_star_group_yields_no_rules(self, spark):
        txt = "User-agent: googlebot\nDisallow: /x"
        assert self._rules(spark, txt) == []

    def test_case_insensitive_keys_and_ua(self, spark):
        txt = "user-AGENT: *\nDISALLOW: /Upper"
        # pattern case preserved
        assert self._rules(spark, txt) == [("disallow", "/Upper")]

    def test_allow_lines_collected(self, spark):
        txt = "User-agent: *\nDisallow: /\nAllow: /public/\nAllow:"
        # empty Allow ignored (matches nothing per RFC 9309 §2.2.2)
        assert self._rules(spark, txt) == [
            ("allow", "/public/"), ("disallow", "/")
        ]

    def test_gate_longest_prefix_and_passthrough(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        rules = spark.createDataFrame(
            [("a.example", "/p"), ("a.example", "/priv"), ("b.example", "/x")],
            "domain string, prefix string",
        )
        docs = spark.createDataFrame(
            [
                (1, "https://a.example/private/1"),   # matches /p AND /priv
                (2, "https://a.example/pub"),          # matches /p only
                (3, "https://a.example/ok"),           # no match
                (4, "https://norules.example/priv"),   # rule-less domain
            ],
            "doc_id long, url string",
        )
        out = {r["doc_id"]: r for r in urls.robots_gate(docs, rules).collect()}
        assert out[1]["disallowed"] and out[1]["matched_prefix"] == "/priv"
        assert out[2]["disallowed"] and out[2]["matched_prefix"] == "/p"
        assert not out[3]["disallowed"] and out[3]["matched_prefix"] is None
        assert not out[4]["disallowed"]

    def test_gate_plan_broadcasts_rules(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        rules = spark.createDataFrame(
            [("a.example", "/p")], "domain string, prefix string"
        )
        docs = spark.createDataFrame(
            [(1, "https://a.example/p")], "doc_id long, url string"
        )
        plan = (
            urls.robots_gate(docs, rules)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


class TestRobotsReviewFixes:
    """Round-9 review findings: group segmentation + path extraction."""

    def test_allow_line_breaks_ua_run(self, spark):
        # The ubiquitous allow-everyone/block-AI-bots shape: the Allow line
        # terminates the '*' UA run, so GPTBot's Disallow must NOT leak
        # into the '*' group (pre-fix it blanket-banned the domain).
        from llm_pretraining_data_pipeline_spark.functions import urls
        txt = "User-agent: *\nAllow: /\nUser-agent: GPTBot\nDisallow: /"
        df = spark.createDataFrame(
            [("a.example", txt)], "domain string, robots_txt string"
        )
        out = [(r["rule"], r["pattern"]) for r in urls.parse_robots(df).collect()]
        assert out == [("allow", "/")]  # GPTBot's Disallow must not leak

    def test_crawl_delay_breaks_ua_run(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        txt = (
            "User-agent: googlebot\nCrawl-delay: 10\n"
            "User-agent: *\nDisallow: /private"
        )
        df = spark.createDataFrame(
            [("a.example", txt)], "domain string, robots_txt string"
        )
        out = [(r["rule"], r["pattern"]) for r in urls.parse_robots(df).collect()]
        assert out == [("disallow", "/private")]  # star group separate

    def test_gate_fragment_excluded_from_matching(self, spark):
        # RFC 9309 matches path + query only; the fragment must neither
        # satisfy a wildcard rule nor leak in as path text on '#/' URLs.
        from llm_pretraining_data_pipeline_spark.functions import urls
        rules = spark.createDataFrame(
            [("a.example", "disallow", "/*.pdf$"),
             ("a.example", "disallow", "/private")],
            "domain string, rule string, pattern string",
        )
        docs = spark.createDataFrame(
            [
                (1, "https://a.example/pub/1#x.pdf"),    # frag-only .pdf
                (2, "https://a.example/doc.pdf#sec2"),    # real .pdf + frag
                (3, "https://a.example#/private/x"),      # frag-only path
            ],
            "doc_id long, url string",
        )
        out = {r["doc_id"]: r for r in urls.robots_gate(docs, rules).collect()}
        assert not out[1]["disallowed"]
        assert out[2]["disallowed"] and out[2]["matched_prefix"] == "/*.pdf$"
        assert not out[3]["disallowed"]

    def test_gate_uppercase_scheme_and_rootless_url(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        rules = spark.createDataFrame(
            [("a.example", "/private"), ("b.example", "/")],
            "domain string, prefix string",
        )
        docs = spark.createDataFrame(
            [
                (1, "HTTPS://a.example/private/x"),  # case-tolerant scheme
                (2, "https://b.example"),            # no path == '/'
            ],
            "doc_id long, url string",
        )
        out = {r["doc_id"]: r for r in urls.robots_gate(docs, rules).collect()}
        assert out[1]["disallowed"] and out[1]["matched_prefix"] == "/private"
        assert out[2]["disallowed"] and out[2]["matched_prefix"] == "/"


class TestRobotsRfc9309:
    """Round-10: full RFC 9309 §2.2.2 matching — Allow precedence,
    longest-match-wins, * / trailing-$ wildcards, match-only shuffle."""

    RULES_SCHEMA = "domain string, rule string, pattern string"

    def _gate(self, spark, rules_rows, docs_rows):
        from llm_pretraining_data_pipeline_spark.functions import urls
        rules = spark.createDataFrame(rules_rows, self.RULES_SCHEMA)
        docs = spark.createDataFrame(docs_rows, "doc_id long, url string")
        return {r["doc_id"]: r for r in urls.robots_gate(docs, rules).collect()}

    def test_allow_overrides_shorter_disallow(self, spark):
        out = self._gate(
            spark,
            [("a.example", "disallow", "/"),
             ("a.example", "allow", "/public/")],
            [(1, "https://a.example/public/page"),
             (2, "https://a.example/private/page"),
             (3, "https://a.example/")],
        )
        assert not out[1]["disallowed"] and out[1]["matched_prefix"] is None
        assert out[2]["disallowed"] and out[2]["matched_prefix"] == "/"
        assert out[3]["disallowed"]

    def test_longer_disallow_overrides_allow(self, spark):
        out = self._gate(
            spark,
            [("a.example", "allow", "/docs/"),
             ("a.example", "disallow", "/docs/internal/")],
            [(1, "https://a.example/docs/guide"),
             (2, "https://a.example/docs/internal/x")],
        )
        assert not out[1]["disallowed"]
        assert out[2]["disallowed"]
        assert out[2]["matched_prefix"] == "/docs/internal/"

    def test_tie_length_allow_wins(self, spark):
        out = self._gate(
            spark,
            [("a.example", "disallow", "/p"),
             ("a.example", "allow", "/q")],
            # craft a tie: both patterns len 2; only one can match a path,
            # so force the tie via identical patterns instead
            [(1, "https://a.example/p/x")],
        )
        assert out[1]["disallowed"]
        out = self._gate(
            spark,
            [("a.example", "disallow", "/p"),
             ("a.example", "allow", "/p")],
            [(1, "https://a.example/p/x")],
        )
        assert not out[1]["disallowed"]  # equal length → allow wins

    def test_star_wildcard_and_end_anchor(self, spark):
        out = self._gate(
            spark,
            [("a.example", "disallow", "/*.php$"),
             ("a.example", "disallow", "/tmp/*/draft")],
            [(1, "https://a.example/index.php"),
             (2, "https://a.example/index.php?x=1"),   # $ ⇒ not at end
             (3, "https://a.example/tmp/a/draft"),
             (4, "https://a.example/tmp/draft"),        # * needs a segment?
             (5, "https://a.example/x.phpx")],
        )
        assert out[1]["disallowed"]
        assert not out[2]["disallowed"]
        assert out[3]["disallowed"]
        # '*' matches ANY run of octets including empty: '/tmp//draft'
        # would match; '/tmp/draft' lacks the second '/' so it does not
        assert not out[4]["disallowed"]
        assert not out[5]["disallowed"]

    def test_regex_metachars_in_patterns_are_literal(self, spark):
        out = self._gate(
            spark,
            [("a.example", "disallow", "/a+b(c)")],
            [(1, "https://a.example/a+b(c)/x"),
             (2, "https://a.example/aab_c_/x")],
        )
        assert out[1]["disallowed"]
        assert not out[2]["disallowed"]

    def test_query_participates_in_matching(self, spark):
        out = self._gate(
            spark,
            [("a.example", "disallow", "/*?session=")],
            [(1, "https://a.example/page?session=abc"),
             (2, "https://a.example/page")],
        )
        assert out[1]["disallowed"]
        assert not out[2]["disallowed"]

    def test_query_only_url_keeps_its_query(self, spark):
        # ADVICE r10: 'https://host?session=x' has an empty path component;
        # RFC 9309 matches path+query, i.e. '/?session=x' — the query must
        # survive extraction (and the implied '/' must be prefixed) so
        # query-targeting rules can hit it. A bare authority is still '/'.
        out = self._gate(
            spark,
            [("a.example", "disallow", "/*?session="),
             ("b.example", "disallow", "/")],
            [(1, "https://a.example?session=abc"),
             (2, "https://a.example"),
             (3, "https://b.example?x=1")],
        )
        assert out[1]["disallowed"]
        assert out[1]["matched_prefix"] == "/*?session="
        assert not out[2]["disallowed"]
        assert out[3]["disallowed"]  # implied '/' still matched

    def test_most_specific_match_ranks_by_octets(self, spark):
        # RFC 9309 §2.2.2 ranks by OCTET count: '/café' is 5 chars but
        # 6 UTF-8 octets, so it must outrank a 5-octet ASCII Allow that
        # also matches — char-count ranking would tie and let Allow win.
        out = self._gate(
            spark,
            [("a.example", "disallow", "/café"),
             ("a.example", "allow", "/café"[:4])],  # '/caf' 4 octets
            [(1, "https://a.example/café/menu")],
        )
        assert out[1]["disallowed"]
        out = self._gate(
            spark,
            [("a.example", "disallow", "/café"),   # 6 octets
             ("a.example", "allow", "/cafex")],          # 6 octets, tie
            [(1, "https://a.example/café/menu"),
             (2, "https://a.example/cafex/menu")],
        )
        assert out[1]["disallowed"]       # only the disallow matches doc 1
        assert not out[2]["disallowed"]   # allow matches doc 2

    def test_gate_plan_match_only_aggregation(self, spark):
        # Round-10 restructure (VERDICT r9 "what's wrong" 2): the corpus
        # must NOT funnel through a full groupBy — rules broadcast into an
        # inner join, only matches aggregate, verdicts broadcast back.
        from llm_pretraining_data_pipeline_spark.functions import urls
        rules = spark.createDataFrame(
            [("a.example", "disallow", "/p")], self.RULES_SCHEMA
        )
        docs = spark.createDataFrame(
            [(1, "https://a.example/p")], "doc_id long, url string"
        )
        plan = (
            urls.robots_gate(docs, rules)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


class TestPslRegistrableDomain:
    """psl_frame / registrable_domain_psl (functions/urls.py): the real
    public-suffix-list algorithm replacing the two-label approximation."""

    RULES = ["// comment", "", "com", "io", "github.io",
             "uk", "co.uk", "*.ck", "!www.ck"]

    def _run(self, spark, hosts):
        from llm_pretraining_data_pipeline_spark.functions import urls
        psl = urls.psl_frame(spark, self.RULES)
        df = spark.createDataFrame(
            list(enumerate(hosts)), "doc_id long, host string"
        )
        out = urls.registrable_domain_psl(df, psl)
        return {r["doc_id"]: r for r in out.collect()}

    def test_longest_rule_wins(self, spark):
        out = self._run(spark, ["pages.user.github.io", "x.io"])
        assert out[0]["public_suffix"] == "github.io"
        assert out[0]["reg_domain"] == "user.github.io"
        assert out[1]["reg_domain"] == "x.io"

    def test_wildcard_and_exception(self, spark):
        out = self._run(spark, ["a.b.ck", "www.ck", "deep.www.ck"])
        assert out[0]["public_suffix"] == "b.ck"   # *.ck
        assert out[0]["reg_domain"] == "a.b.ck"
        assert out[1]["public_suffix"] == "ck"     # !www.ck exception
        assert out[1]["reg_domain"] == "www.ck"
        # deep.www.ck: exception matches the www.ck TAIL → ps ck,
        # reg www.ck... no: rule labels must suffix-match; !www.ck
        # matches, prevailing exception, ps=ck, reg = last 2 = www.ck
        assert out[2]["reg_domain"] == "www.ck"

    def test_implicit_default_and_suffix_only_hosts(self, spark):
        out = self._run(spark, ["host.unknowntld", "unknowntld", "co.uk"])
        assert out[0]["public_suffix"] == "unknowntld"
        assert out[0]["reg_domain"] == "host.unknowntld"
        assert out[1]["reg_domain"] is None  # host IS the (default) suffix
        assert out[2]["reg_domain"] is None  # host IS a listed suffix

    def test_case_and_null_safety(self, spark):
        out = self._run(spark, ["CDN.Site.CO.UK", None])
        assert out[0]["reg_domain"] == "site.co.uk"
        assert out[1]["reg_domain"] is None

    def test_trailing_dot_fqdn(self, spark):
        # 'example.com.' (FQDN form, routine in crawl data) must not let
        # the empty trailing label become the public suffix
        out = self._run(spark, ["cdn.site.co.uk.", "x.com."])
        assert out[0]["public_suffix"] == "co.uk"
        assert out[0]["reg_domain"] == "site.co.uk"
        assert out[1]["reg_domain"] == "x.com"

    def test_rejects_wildcard_tld_rule(self, spark):
        import pytest as _pytest

        from llm_pretraining_data_pipeline_spark.functions import urls
        with _pytest.raises(ValueError, match="wildcard TLD"):
            urls.psl_frame(spark, ["foo.*"])
        with _pytest.raises(ValueError, match="no rules"):
            urls.psl_frame(spark, ["// only comments"])

    def test_plan_is_two_broadcast_hash_joins(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        psl = urls.psl_frame(spark, self.RULES)
        df = spark.createDataFrame([(1, "a.com")], "doc_id long, host string")
        plan = (
            urls.registrable_domain_psl(df, psl)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("BroadcastHashJoin") == 2
        assert "NestedLoop" not in plan and "SortMergeJoin" not in plan


class TestRobotsDirectives:
    """robots_directives (functions/urls.py): Crawl-delay + Sitemap."""

    def _run(self, spark, rows):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame(rows, "domain string, robots_txt string")
        return {r["domain"]: r for r in urls.robots_directives(df).collect()}

    def test_star_delay_only_and_global_sitemaps(self, spark):
        txt = (
            "User-agent: googlebot\nCrawl-delay: 1\n"
            "Sitemap: https://a/gb.xml\n\n"
            "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x\n"
            "Sitemap: https://a/main.xml\n"
        )
        out = self._run(spark, [("a", txt)])
        assert out["a"]["crawl_delay"] == 2.5  # googlebot's 1 must not leak
        assert list(out["a"]["sitemaps"]) == [
            "https://a/gb.xml", "https://a/main.xml"  # global, sorted
        ]

    def test_max_across_star_groups_and_invalid(self, spark):
        multi = (
            "User-agent: *\nCrawl-delay: 5\n\n"
            "User-agent: *\nCrawl-delay: 3\n"
        )
        bad = "User-agent: *\nCrawl-delay: fast\n"
        mixed = (  # non-numeric in one group must not null the merge
            "User-agent: *\nCrawl-delay: fast\n\n"
            "User-agent: *\nCrawl-delay: 9\n"
        )
        none = "User-agent: googlebot\nCrawl-delay: 9\n"
        out = self._run(
            spark, [("m", multi), ("b", bad), ("x", mixed), ("n", none)]
        )
        # Conservative merge for a politeness directive = the SLOWEST
        # requested delay (MAX), not the fastest (ADVICE r10).
        assert out["m"]["crawl_delay"] == 5.0
        assert out["b"]["crawl_delay"] is None  # try_cast
        assert out["x"]["crawl_delay"] == 9.0   # MAX skips the null
        assert out["n"]["crawl_delay"] is None  # no star group
        assert list(out["n"]["sitemaps"]) == []

    def test_every_input_domain_emits_a_row(self, spark):
        out = self._run(spark, [("empty", "# nothing here")])
        assert out["empty"]["crawl_delay"] is None
        assert list(out["empty"]["sitemaps"]) == []


class TestSurtKey:
    """surt_key (functions/urls.py): the CDX sort/lookup key."""

    def _surt(self, spark, urls_in):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls_in)], "id long, u string"
        )
        out = df.select("id", urls.surt_key("u").alias("s")).collect()
        return [r["s"] for r in sorted(out, key=lambda r: r["id"])]

    def test_canonicalisation(self, spark):
        got = self._surt(spark, [
            "https://www.Example.com:8080/Path/X?b=2&a=1#frag",
            "https://example.com",
            "http://sub.Example.com/A",
            "https://example.com?q=1",      # query-only: implied '/'
            "https://example.com/x?single",
        ])
        assert got == [
            "com,example)/path/x?a=1&b=2",  # scheme/port/www/frag gone,
            "com,example)/",                # host reversed, query sorted
            "com,example,sub)/a",
            "com,example)/?q=1",
            "com,example)/x?single",
        ]

    def test_prefix_covers_domain_family(self, spark):
        # the whole point of SURT ordering: one prefix scan covers a
        # registrable domain and all its subdomains
        got = self._surt(spark, [
            "https://example.com/a",
            "https://cdn.example.com/b",
            "https://examplezzz.com/c",
        ])
        assert got[0].startswith("com,example)")
        assert got[1].startswith("com,example,")
        assert not got[2].startswith("com,example)")
        assert not got[2].startswith("com,example,")

    def test_invalid_inputs_null(self, spark):
        assert self._surt(spark, ["not a url", "", "/relative/only"]) == [
            None, None, None,
        ]

    def test_whitespace_percent_encoded(self, spark):
        # ADVICE r11: a WARC-Target-URI with interior whitespace must
        # not yield a SURT containing it — a CDXJ line is
        # space-delimited, so a spaced key breaks the 3-field parse and
        # the manifest's first/last-key extraction. pywb/urlcanon
        # percent-encode such bytes.
        got = self._surt(spark, [
            "https://example.com/a b?q=x y",
            "https://example.com/tab\there",
            "https://example.com/cr\rlf\nhere",
        ])
        # hex folds lowercase with the rest of the path+query, exactly
        # like pre-encoded escapes in real URLs do under surt_key
        assert got == [
            "com,example)/a%20b?q=x%20y",
            "com,example)/tab%09here",
            "com,example)/cr%0dlf%0ahere",
        ]

    def test_other_control_octets_null_the_key(self, spark):
        # anything the whitespace encoding doesn't cover routes to the
        # '-' sentinel path via a null key — hostile junk, not identity
        got = self._surt(spark, [
            "https://example.com/c\x01tl",
            "https://example.com/d\x7fel",
            "https://example.com/fine",
        ])
        assert got == [None, None, "com,example)/fine"]

    def test_null_passthrough(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame([(1, None)], "id long, u string")
        assert df.select(
            urls.surt_key("u").alias("s")
        ).collect()[0]["s"] is None


class TestParseSitemap:
    """parse_sitemap (functions/urls.py): sitemaps.org XML → frontier."""

    def _run(self, spark, rows):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame(
            rows, "domain string, sitemap_xml string"
        )
        out = urls.parse_sitemap(df).collect()
        by_dom = {}
        for r in out:
            by_dom.setdefault(r["domain"], []).append(r)
        for v in by_dom.values():
            v.sort(key=lambda r: (r["entry_pos"] is None, r["entry_pos"]))
        return by_dom

    def test_urlset_entries_with_optional_fields(self, spark):
        xml = (
            '<?xml version="1.0"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            "<url><loc>https://a/p1</loc><lastmod>2024-01-05</lastmod>"
            "<priority>0.8</priority></url>"
            "<url><loc>https://a/p2</loc><changefreq>daily</changefreq>"
            "</url></urlset>"
        )
        rows = self._run(spark, [("a", xml)])["a"]
        assert len(rows) == 2
        assert rows[0]["loc"] == "https://a/p1"
        assert rows[0]["priority"] == 0.8 and rows[0]["changefreq"] is None
        assert rows[1]["lastmod"] is None and rows[1]["changefreq"] == "daily"
        assert all(not r["is_index"] and r["sm_ok"] for r in rows)

    def test_sitemapindex_children_marked(self, spark):
        xml = ("<sitemapindex><sitemap><loc>https://a/s1.xml</loc>"
               "<lastmod>2024-02-01</lastmod></sitemap>"
               "<sitemap><loc>https://a/s2.xml</loc></sitemap>"
               "</sitemapindex>")
        rows = self._run(spark, [("a", xml)])["a"]
        assert [r["loc"] for r in rows] == [
            "https://a/s1.xml", "https://a/s2.xml"
        ]
        assert all(r["is_index"] and r["sm_ok"] for r in rows)

    def test_broken_empty_and_null_survive_as_data(self, spark):
        rows = self._run(spark, [
            ("bad", "complete garbage <<<"),
            ("trunc", "<urlset><url><loc>x</loc></url>"),
            ("empty", "<urlset></urlset>"),
            ("nul", None),
        ])
        for dom in ("bad", "trunc", "empty", "nul"):
            (r,) = rows[dom]
            assert not r["sm_ok"] and r["loc"] is None
            assert r["entry_pos"] is None

    def test_zero_python_zero_shuffle_plan(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame(
            [("a", "<urlset/>")], "domain string, sitemap_xml string"
        )
        plan = (
            urls.parse_sitemap(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan


class TestResolveUrl:
    """resolve_url (functions/urls.py): RFC 3986 §5 reference resolution."""

    BASE = "https://a.example/dir/sub/page.html?x=1#frag"

    def _res(self, spark, cases):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame(
            [(i, b, h) for i, (b, h) in enumerate(cases)],
            "i long, b string, h string",
        )
        out = df.select("i", urls.resolve_url("b", "h").alias("r")).collect()
        return [r["r"] for r in sorted(out, key=lambda r: r["i"])]

    def test_all_reference_forms(self, spark):
        cases = [
            (self.BASE, "https://b.example/abs"),
            (self.BASE, "//cdn.example/lib.js"),
            (self.BASE, "/root/p?q=2"),
            (self.BASE, "next.html"),
            (self.BASE, "?only=q"),
        ]
        assert self._res(spark, cases) == [
            "https://b.example/abs",
            "https://cdn.example/lib.js",
            "https://a.example/root/p?q=2",
            "https://a.example/dir/sub/next.html",
            "https://a.example/dir/sub/page.html?only=q",
        ]

    def test_dot_segment_removal(self, spark):
        cases = [
            (self.BASE, "../up.html"),
            (self.BASE, "../../../over.html"),   # .. above root clamps
            (self.BASE, "./same.html"),
            (self.BASE, "a/b/../c"),
            (self.BASE, ".."),                   # trailing .. keeps '/'
        ]
        assert self._res(spark, cases) == [
            "https://a.example/dir/up.html",
            "https://a.example/over.html",
            "https://a.example/dir/sub/same.html",
            "https://a.example/dir/sub/a/c",
            "https://a.example/dir/",
        ]

    def test_scheme_qualified_non_hierarchical_pass_through(self, spark):
        # RFC 3986 §5.2.2: ANY reference with a scheme resolves to
        # itself — mailto:/javascript:/tel:/data: must not be glued
        # onto the base path as fabricated frontier URLs (surt_key
        # nulls them downstream, so the frontier drops them cleanly)
        cases = [
            (self.BASE, "mailto:x@y.com"),
            (self.BASE, "javascript:void(0)"),
            (self.BASE, "tel:+1-555-0100"),
            (self.BASE, "data:text/plain;base64,aGk="),
        ]
        assert self._res(spark, cases) == [
            "mailto:x@y.com",
            "javascript:void(0)",
            "tel:+1-555-0100",
            "data:text/plain;base64,aGk=",
        ]

    def test_absolute_targets_also_dot_normalised(self, spark):
        # §5.2.4 applies to every hierarchical target — an absolute or
        # protocol-relative outlink with dot segments must match the
        # index's normalised capture or the anti-join can't eat it
        cases = [
            (self.BASE, "https://b.example/a/../x"),
            (self.BASE, "//b.example/a/./b/../x"),
            (self.BASE, "https://b.example"),
            (self.BASE, "https://b.example?q=1"),
        ]
        assert self._res(spark, cases) == [
            "https://b.example/x",
            "https://b.example/a/x",
            "https://b.example",
            "https://b.example?q=1",
        ]

    def test_fragment_empty_and_invalid_base(self, spark):
        cases = [
            (self.BASE, "#frag"),         # same-document → null
            (self.BASE, ""),
            ("not a url", "p.html"),      # hostless base → null
            ("https://a.example", "p.html"),  # bare-authority base
            (self.BASE, "x.html#sec"),    # result fragment dropped
        ]
        assert self._res(spark, cases) == [
            None, None, None,
            "https://a.example/p.html",
            "https://a.example/dir/sub/x.html",
        ]

    def test_zero_shuffle_plan(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        df = spark.createDataFrame(
            [(self.BASE, "a.html")], "b string, h string"
        )
        plan = (
            df.select(urls.resolve_url("b", "h").alias("r"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Python" not in plan
