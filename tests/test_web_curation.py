"""Composition tests for the end-to-end web-curation plan
(plans/web_curation.py): stage order, first-match-wins reasons across
stages, span/exact dedup on survivors only, and plan shape."""

from pyspark.sql import functions as F

from llm_pretraining_data_pipeline_spark.plans.web_curation import (
    WebCurationConfig,
    curation_summary,
    run_web_curation,
)

GOOD = (
    "The first careful sentence talks about one topic simply.\n"
    "Another entirely different thought follows with its own words.\n"
    "A third distinct idea then closes out this small page.\n"
    "Finally the closing remark offers something new to read."
)


def _cfg():
    return WebCurationConfig(gopher_min_words=10, gopher_min_stopwords=1)


class TestWebCuration:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, url string, text string")
        return {
            r.doc_id: r
            for r in run_web_curation(df, _cfg(), url_col="url").collect()
        }

    def test_every_stage_claims_its_doc(self, spark):
        out = self._run(
            spark,
            [
                (1, "http://a.com/x?utm_a=1", GOOD),
                (2, "http://A.com/x/", "same URL as doc 1 drops before text."),
                (3, "http://a.com/y",
                 "ALL SHOUTING UPPERCASE LINE NUMBER ONE HERE\n"
                 "MORE SHOUTING FOLLOWS ON ANOTHER LINE TOO"),
                (4, "http://a.com/z",
                 "Lorem ipsum dolor sit amet my friend. Second fine sentence "
                 "is right here now. Third one closes the page out."),
                (5, "http://a.com/w", GOOD),  # exact dup of doc 1's text
            ],
        )
        assert out[1].drop_reason is None
        assert out[1].text_curated  # cleaned text present for kept doc
        assert out[2].drop_reason == "url_duplicate"
        assert out[3].drop_reason == "rw_excess_line_removal"
        assert out[4].drop_reason == "c4_lorem_ipsum"
        # doc 5 survives every filter; span dedup strips all its sentences
        # (every 3-span already seen in doc 1) and the terminal empty rule
        # claims it — exact dedup cannot ('' != doc 1's text)
        assert out[5].drop_reason == "empty_after_span_dedup"
        assert out[5].n_sents_removed == 4

    def test_gopher_stage_and_span_dedup(self, spark):
        out = self._run(
            spark,
            [
                (1, "http://a.com/1", GOOD),
                # 3 sentences (passes C4) dominated by one bigram -> gopher
                (2, "http://a.com/2",
                 "Word word word word word word ends right here. "
                 "Second group word word word word appears now. "
                 "Third group word word word word closes out."),
                # shares a 3-sentence span with doc 1 -> sentences removed
                (3, "http://a.com/3",
                 GOOD.replace("\n", " ") + " One extra unique closing thought appears."),
            ],
        )
        assert out[1].drop_reason is None and out[1].n_sents_removed == 0
        assert out[2].drop_reason is not None
        assert out[2].drop_reason.startswith("gopher_")
        assert out[3].drop_reason is None
        assert out[3].n_sents_removed >= 3  # the shared span's sentences

    def test_summary_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "http://a/1", GOOD), (2, "http://a/2", GOOD)],
            "doc_id long, url string, text string",
        )
        rows = {
            r.outcome: r
            for r in curation_summary(
                run_web_curation(df, _cfg(), url_col="url")
            ).collect()
        }
        assert rows["kept"].n_docs == 1
        # with span dedup on, the full dup empties rather than exact-dups
        assert rows["empty_after_span_dedup"].n_docs == 1
        assert rows["kept"].kept_chars > 0

    def test_without_url_and_without_optional_stages(self, spark):
        df = spark.createDataFrame(
            [(1, GOOD), (2, GOOD)], "doc_id long, text string"
        )
        cfg = WebCurationConfig(
            gopher_min_words=10, gopher_min_stopwords=1,
            apply_gopher=False, apply_span_dedup=False,
        )
        out = {r.doc_id: r for r in run_web_curation(df, cfg).collect()}
        assert out[1].drop_reason is None
        assert out[2].drop_reason == "exact_duplicate"
        assert out[1].text_curated == out[1].text_c4

    def test_filter_stages_are_shuffle_free(self, spark):
        """Stages 2-4 (RW + C4 + Gopher) must fuse into a narrow chain —
        exchanges come only from the dedup windows."""
        import contextlib
        import io

        df = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit(GOOD).alias("text")
        )
        cfg = WebCurationConfig(apply_span_dedup=False)
        out = run_web_curation(df, cfg)  # no url stage
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.select("doc_id", "drop_reason").explain("formatted")
        plan = buf.getvalue()
        # exactly the exact-dedup window shuffle; no text-keyed exchange
        assert "hashpartitioning(text" not in plan


class TestReviewFixes:
    def test_multiple_full_dups_all_claimed_by_empty_rule(self, spark):
        # three identical docs: 2 and 3 both span-empty; neither may be
        # marked exact_duplicate of the other empty doc
        df = spark.createDataFrame(
            [(i, f"http://a/{i}", GOOD) for i in (1, 2, 3)],
            "doc_id long, url string, text string",
        )
        out = {
            r.doc_id: r
            for r in run_web_curation(df, _cfg(), url_col="url").collect()
        }
        assert out[1].drop_reason is None
        for i in (2, 3):
            assert out[i].drop_reason == "empty_after_span_dedup", out[i]
            assert out[i].dup_of is None

    def test_rw_counters_not_overwritten_by_c4(self, spark):
        df = spark.createDataFrame(
            [(1, "http://a/1",
              "ALL UPPERCASE SHOUT LINE REMOVED HERE\n" + GOOD)],
            "doc_id long, url string, text string",
        )
        cfg = WebCurationConfig(
            gopher_min_words=10, gopher_min_stopwords=1,
            rw_max_removed_frac=0.5,  # keep the doc despite 1/5 removed
        )
        r = run_web_curation(df, cfg, url_col="url").collect()[0]
        assert r.rw_n_lines == 5 and r.rw_n_lines_removed == 1
        assert r.n_lines == 4  # the C4 stage's own count, over text_rw
        assert r.drop_reason is None


class TestRound9FrontStages:
    """Opt-in robots gate + main-content stages compose into the recipe."""

    def test_robots_and_main_content_stages(self, spark):
        from llm_pretraining_data_pipeline_spark.functions import urls
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig, run_web_curation,
        )
        body = (
            "This is a perfectly normal sentence with many words in it. "
            "Here is another complete sentence that also has enough words. "
            "And a third full sentence keeps the page past the gate."
        )
        page = (
            '<div class="nav"><a href="/">home</a> <a href="/x">about</a>'
            "</div><p>" + body + "</p>"
            '<div class="footer"><a href="/tos">terms</a></div>'
        )
        docs = spark.createDataFrame(
            [
                (1, "https://a.example/private/x", page),  # robots-blocked
                (2, "https://a.example/pub/ok", page),     # kept
                (3, "https://b.example/pub/ok",
                 "<p>Completely different body text lives here with plenty "
                 "of words. It has a second full sentence to pass the "
                 "page gate too. A third one rounds out the document "
                 "nicely as well.</p>"),                      # kept (no rules)
                (4, "https://b.example/nav-only",
                 '<div><a href="/">home</a> <a href="/y">about</a></div>'),
            ],
            "doc_id long, url string, text string",
        )
        rules = urls.parse_robots(
            spark.createDataFrame(
                [("a.example", "User-agent: *\nDisallow: /private")],
                "domain string, robots_txt string",
            )
        )
        out = {
            r["doc_id"]: r
            for r in run_web_curation(
                docs,
                WebCurationConfig(
                    extract_main=True, apply_gopher=False,
                    apply_span_dedup=False, min_sentences=2,
                ),
                url_col="url",
                robots_rules=rules,
            ).collect()
        }
        assert out[1]["drop_reason"] == "robots_disallowed"
        assert out[2]["drop_reason"] is None
        assert out[2]["text_curated"].startswith("This is a perfectly")
        assert "home" not in out[2]["text_curated"]  # nav stripped
        assert out[3]["drop_reason"] is None
        assert out[4]["drop_reason"] == "no_main_content"

    def test_robots_rules_require_url_col(self, spark):
        import pytest

        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            run_web_curation,
        )
        df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
        rules = spark.createDataFrame(
            [("a.example", "/p")], "domain string, prefix string"
        )
        with pytest.raises(ValueError, match="url_col"):
            run_web_curation(df, robots_rules=rules)

    def test_defaults_unchanged(self, spark):
        # flags off: output schema and reasons identical to the pre-round-9
        # recipe (no robots/main-content columns leak in)
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig, run_web_curation,
        )
        df = spark.createDataFrame(
            [(1, "short")], "doc_id long, text string"
        )
        out = run_web_curation(df, WebCurationConfig(apply_gopher=False))
        assert "text_main" not in out.columns
        assert "disallowed" not in out.columns


class TestEntityDecodeStage:
    """Opt-in decode_entities stage (round 11): entity decoding between
    main-content extraction and the text metrics."""

    def test_entities_decoded_before_metrics(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig, run_web_curation,
        )
        body = (
            "Fish &amp; chips &ndash; the classic &pound;5 meal deal. "
            "Another full sentence keeps this page past the C4 gate. "
            "A third sentence rounds out the tiny document nicely."
        )
        page = (
            '<div class="nav"><a href="/">home</a> <a href="/x">menu</a>'
            "</div><p>" + body + "</p>"
        )
        docs = spark.createDataFrame(
            [(1, page)], "doc_id long, text string"
        )
        out = run_web_curation(
            docs,
            WebCurationConfig(
                extract_main=True, decode_entities=True,
                apply_gopher=False, apply_span_dedup=False,
                min_sentences=2,
            ),
        ).collect()[0]
        assert out["drop_reason"] is None
        # decoded characters reach the curated text; no literal survives
        assert "Fish & chips – the classic £5 meal deal." in out["text_curated"]
        assert "&amp;" not in out["text_curated"]
        assert "home" not in out["text_curated"]  # nav still stripped first

    def test_decode_without_extract_main(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig, run_web_curation,
        )
        docs = spark.createDataFrame(
            [(1,
              "Plain text with &amp; and &#233; entities inside it okay. "
              "Second proper sentence keeps the little page alive here. "
              "Third sentence completes the miniature test document.")],
            "doc_id long, text string",
        )
        out = run_web_curation(
            docs,
            WebCurationConfig(
                decode_entities=True, apply_gopher=False,
                apply_span_dedup=False, min_sentences=2,
            ),
        ).collect()[0]
        assert out["drop_reason"] is None
        assert "with & and é entities" in out["text_curated"]

    def test_default_auto_follows_extract_main(self, spark):
        # round-12 decision (A/B in NOTES_r12): decode_entities=None
        # means "on iff extract_main" — entity literals only exist when
        # the input is raw HTML, which is exactly when the block gate
        # runs; pre-cleaned corpora skip the ~25-30% pass
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig, run_web_curation,
        )
        plain = spark.createDataFrame(
            [(1,
              "Plain text with &amp; kept verbatim in this sentence. "
              "Second proper sentence keeps the little page alive here. "
              "Third sentence completes the miniature test document.")],
            "doc_id long, text string",
        )
        out = run_web_curation(
            plain,
            WebCurationConfig(
                apply_gopher=False, apply_span_dedup=False, min_sentences=2,
            ),
        ).collect()[0]
        assert "&amp;" in out["text_curated"]  # auto-off without HTML gate
        page = (
            '<div class="nav"><a href="/">home</a> <a href="/x">m</a>'
            "</div><p>Fish &amp; chips in a first proper sentence here. "
            "Second proper sentence keeps the little page alive here. "
            "Third sentence completes the miniature test document.</p>"
        )
        html = spark.createDataFrame([(1, page)], "doc_id long, text string")
        out = run_web_curation(
            html,
            WebCurationConfig(
                extract_main=True, apply_gopher=False,
                apply_span_dedup=False, min_sentences=2,
            ),
        ).collect()[0]
        assert "Fish & chips" in out["text_curated"]  # auto-on with gate
        # explicit False always wins over the auto rule
        out = run_web_curation(
            html,
            WebCurationConfig(
                extract_main=True, decode_entities=False,
                apply_gopher=False, apply_span_dedup=False, min_sentences=2,
            ),
        ).collect()[0]
        assert "&amp;" in out["text_curated"]


class TestCrawlToCorpus:
    """plans/crawl.py: the composed WARC→HTTP→curation→tokens capstone."""

    def _blobs(self, spark):
        from llm_pretraining_data_pipeline_spark.sources import warc
        body_a = b"The first page has a proper sentence here. And a second one too."
        body_c = b"A third distinct page body lives in this record. It has two sentences."
        body_dup = b"Duplicate body text in a full sentence shape. It repeats verbatim."

        def msg(status, ctype, body):
            return (
                b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype
                + b"\r\nContent-Length: %d\r\n\r\n" % len(body) + body
            )

        rows = [
            # blob 0 holds TWO response records (the real WARC shape):
            # rec 0 is a 404 whose body duplicates files 5/6 — being the
            # smallest rec_id it must NOT claim the exact-dedup slot —
            # and rec 1 is an ordinary kept page.
            (0, warc.encode_warc([
                ("response", "https://a.example/0a", "r0a",
                 msg(b"404 Not Found", b"text/plain", body_dup)),
                ("response", "https://a.example/0b", "r0b",
                 msg(b"200 OK", b"text/plain", body_c)),
            ])),
            (1, warc.encode_warc([("response", "https://a.example/1", "r1",
                                   msg(b"200 OK", b"text/html", body_a))])),
            (2, warc.encode_warc([("response", "https://a.example/2", "r2",
                                   msg(b"404 Not Found", b"text/html", body_a))])),
            (3, warc.encode_warc([("response", "https://a.example/3", "r3",
                                   msg(b"200 OK", b"image/png", b"\x89PNG"))])),
            (4, warc.encode_warc([("response", "https://a.example/4", "r4",
                                   b"NOT AN HTTP MESSAGE")])),
            (5, warc.encode_warc([("response", "https://a.example/5", "r5",
                                   msg(b"200 OK", b"text/plain", body_dup))])),
            (6, warc.encode_warc([("response", "https://a.example/6", "r6",
                                   msg(b"200 OK", b"text/plain", body_dup))])),
        ]
        return spark.createDataFrame(
            [(i, bytearray(b)) for i, b in rows],
            "file_id long, payload binary",
        )

    def _run(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.crawl import (
            CrawlCorpusConfig, run_crawl_to_corpus,
        )
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig,
        )
        return run_crawl_to_corpus(
            self._blobs(spark),
            CrawlCorpusConfig(
                curation=WebCurationConfig(
                    min_sentences=2, apply_gopher=False
                )
            ),
        )

    def test_funnel_reasons_and_tokens(self, spark):
        rows = self._run(spark).collect()
        out = {(r["file_id"], r["rec_index"]): r for r in rows}
        # a two-record blob yields exactly two rows — the composite
        # rec_id must not multiply rows at the dedup join-back
        assert len(rows) == 8 and len(out) == 8
        assert out[(0, 1)]["drop_reason"] is None
        assert out[(0, 1)]["text_curated"].startswith("A third distinct")
        assert out[(1, 0)]["drop_reason"] is None
        assert out[(1, 0)]["n_tokens"] > 0
        assert out[(1, 0)]["text_curated"].startswith("The first page")
        assert out[(2, 0)]["drop_reason"] == "http_status_reject"
        assert out[(3, 0)]["drop_reason"] == "non_text_mime"
        assert out[(4, 0)]["drop_reason"] == "http_unparseable"
        # blob 0's REJECTED duplicate (smallest rec_id) must not claim
        # the exact-dedup slot: file 5 keeps, file 6 is the dup
        assert out[(0, 0)]["drop_reason"] == "http_status_reject"
        assert out[(5, 0)]["drop_reason"] is None
        assert out[(6, 0)]["drop_reason"] == "exact_duplicate"
        assert all(
            out[k]["n_tokens"] == 0
            for k in ((0, 0), (2, 0), (3, 0), (4, 0), (6, 0))
        )

    def test_file_id_packing_bound_enforced(self, spark):
        # ADVICE r11: the rec_id = file_id*2^32 + rec_index packing is
        # overflow-proof for rec_index by construction (a blob is one
        # JVM array, < 2^26 minimal records), but file_id must stay
        # below 2^31 — enforced by an in-plan fence, not assumed.
        import pytest

        from llm_pretraining_data_pipeline_spark.plans.crawl import (
            CrawlCorpusConfig, run_crawl_to_corpus,
        )
        from llm_pretraining_data_pipeline_spark.sources import warc
        blob = warc.encode_warc([
            ("response", "https://a.example/x", "rx",
             b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
             b"Content-Length: 2\r\n\r\nok"),
        ])
        files = spark.createDataFrame(
            [(1 << 31, bytearray(blob))], "file_id long, payload binary"
        )
        # the curation plan's narrow localCheckpoint is eager, so the
        # fence can fire during construction OR at the final action —
        # either way it must surface before any rec_id collides
        with pytest.raises(Exception, match="file_id must be in"):
            run_crawl_to_corpus(files, CrawlCorpusConfig()).collect()

    def test_funnel_summary_shape(self, spark):
        from llm_pretraining_data_pipeline_spark.plans.crawl import (
            crawl_funnel_summary,
        )
        summ = {
            r["outcome"]: r
            for r in crawl_funnel_summary(self._run(spark)).collect()
        }
        assert summ["kept"]["n_docs"] == 3
        assert summ["kept"]["total_tokens"] > 0
        assert summ["http_status_reject"]["n_docs"] == 2
        for k in ("non_text_mime", "http_unparseable", "exact_duplicate"):
            assert summ[k]["n_docs"] == 1 and summ[k]["total_tokens"] == 0


class TestCrawlCharsetAware:
    """CrawlCorpusConfig(charset_aware=True): the WHATWG decode replaces
    the content-sniffing fallback inside the composed funnel."""

    def _run(self, spark, charset_aware):
        from llm_pretraining_data_pipeline_spark.plans.crawl import (
            CrawlCorpusConfig, run_crawl_to_corpus,
        )
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig,
        )
        from llm_pretraining_data_pipeline_spark.sources import warc

        # declared windows-1252 body with 0x93/0x94 smart quotes — the
        # latin-1 fallback decodes them to C1 controls, the WHATWG path
        # to U+201C/U+201D
        body = (b"He said \x93hello there\x94 to the crowd. "
                b"Then everyone went home afterwards.")
        msg = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/plain; charset=windows-1252\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body
        )
        files = spark.createDataFrame(
            [(0, bytearray(warc.encode_warc(
                [("response", "https://a.example/q", "rq", msg)]
            )))],
            "file_id long, payload binary",
        )
        out = run_crawl_to_corpus(
            files,
            CrawlCorpusConfig(
                charset_aware=charset_aware,
                curation=WebCurationConfig(
                    min_sentences=2, apply_gopher=False
                ),
            ),
        ).collect()
        assert len(out) == 1
        return out[0]

    def test_declared_cp1252_decodes_smart_quotes(self, spark):
        row = self._run(spark, charset_aware=True)
        assert row["drop_reason"] is None
        assert "“hello there”" in row["text_curated"]

    def test_default_keeps_sniffing_fallback(self, spark):
        row = self._run(spark, charset_aware=False)
        # latin-1 fallback renders the cp1252 quotes as C1 controls
        assert "\x93hello there\x94" in (row["text_curated"] or "")

    def test_multibyte_flag_decodes_declared_shift_jis(self, spark):
        # charset_multibyte=True (round 13): a correctly-labeled
        # Shift_JIS page survives the funnel with its kana intact
        from llm_pretraining_data_pipeline_spark.plans.crawl import (
            CrawlCorpusConfig, run_crawl_to_corpus,
        )
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig,
        )
        from llm_pretraining_data_pipeline_spark.sources import warc

        text = ("the quick brown fox says こんにちは世界 today. "
                "then everyone went home afterwards.")
        body = text.encode("shift_jis")
        msg = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/plain; charset=x-sjis\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body
        )
        files = spark.createDataFrame(
            [(0, bytearray(warc.encode_warc(
                [("response", "https://a.example/j", "rj", msg)]
            )))],
            "file_id long, payload binary",
        )
        cfg = WebCurationConfig(min_sentences=2, apply_gopher=False)
        on = run_crawl_to_corpus(
            files,
            CrawlCorpusConfig(
                charset_aware=True, charset_multibyte=True, curation=cfg
            ),
        ).collect()[0]
        assert on["drop_reason"] is None
        assert "こんにちは世界" in on["text_curated"]
        # without the flag the label is outside the JVM repertoire and
        # falls to the content chain (bytes are not valid UTF-8 ->
        # cp1252 mojibake), proving the flag is what recovered the text
        off = run_crawl_to_corpus(
            files,
            CrawlCorpusConfig(charset_aware=True, curation=cfg),
        ).collect()[0]
        assert "こんにちは世界" not in (off["text_curated"] or "")


class TestCrawlRevisitResolution:
    """CrawlCorpusConfig(resolve_revisits=True): crawl-time dedup records
    resolved against originals inside the composed funnel."""

    def _run(self, spark, resolve):
        import hashlib

        from llm_pretraining_data_pipeline_spark.plans.crawl import (
            CrawlCorpusConfig, run_crawl_to_corpus,
        )
        from llm_pretraining_data_pipeline_spark.plans.web_curation import (
            WebCurationConfig,
        )
        from llm_pretraining_data_pipeline_spark.sources import warc

        body = (b"A perfectly ordinary page with two sentences. "
                b"It was captured twice by the crawler.")
        msg = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
            b"Content-Length: %d\r\n\r\n" % len(body) + body
        )
        digest = hashlib.sha256(body).hexdigest()
        rows = [
            (0, warc.encode_warc([
                ("response", "https://a.example/p", "orig", msg),
            ])),
            (1, warc.encode_warc([
                # a MIRROR url: url-dedup can't group it, so the
                # exact-duplicate verdict below can only come from the
                # recovered CONTENT
                ("revisit", "https://b.example/mirror", "re", b"",
                 (("WARC-Payload-Digest", f"sha256:{digest}"),)),
                ("revisit", "https://a.example/q", "gone", b"",
                 (("WARC-Payload-Digest", "sha256:" + "0" * 64),)),
            ])),
        ]
        files = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in rows],
            "file_id long, payload binary",
        )
        out = run_crawl_to_corpus(
            files,
            CrawlCorpusConfig(
                resolve_revisits=resolve,
                curation=WebCurationConfig(
                    min_sentences=2, apply_gopher=False
                ),
            ),
        ).collect()
        return {(r["file_id"], r["rec_index"]): r for r in out}

    def test_resolved_revisit_carries_content_and_dedups(self, spark):
        out = self._run(spark, resolve=True)
        assert len(out) == 3
        # the original keeps its slot
        assert out[(0, 0)]["drop_reason"] is None
        # the resolved revisit recovered the ORIGINAL's content — which
        # is exactly why exact dedup (keep-first) now catches it; an
        # unresolved one would read 'revisit_unresolved' instead
        assert out[(1, 0)]["drop_reason"] == "exact_duplicate"
        # digest matching nothing -> the dedicated first-match reason
        assert out[(1, 1)]["drop_reason"] == "revisit_unresolved"

    def test_default_drops_revisits_from_the_funnel(self, spark):
        out = self._run(spark, resolve=False)
        # response-only path: revisit records never enter the funnel
        assert list(out) == [(0, 0)]
        assert out[(0, 0)]["drop_reason"] is None
