"""URL/domain operators (operators/web.py): extraction semantics,
blocklist suffix matching, deterministic per-domain caps."""

import pytest
from pyspark.sql import functions as F

import feature_factory_spark as ff


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "https://www.example.org/en/doc-1"),
        (2, "https://example.org/fr/doc-2?ref=abc"),
        (3, "http://user:pw@sub.tracker.example:8080/x/y?q=1"),
        (4, "https://nottracker.example/path"),
        (5, None),
        (6, "not a url at all"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def test_domain_extractor_components(urls):
    out = ff.DomainExtractor(["url"]).transform(urls)
    got = {r["doc_id"]: (r["url_host"], r["url_domain"], r["url_path"])
           for r in out.collect()}
    assert got[1] == ("www.example.org", "example.org", "/en/doc-1")
    # query stripped from path; port and userinfo stripped from host
    assert got[2] == ("example.org", "example.org", "/fr/doc-2")
    assert got[3] == ("sub.tracker.example", "sub.tracker.example", "/x/y")
    assert got[5] == (None, None, None)


def test_blocklist_suffix_matching_list(urls):
    op = ff.DomainBlocklistFilter("url", ["tracker.example"])
    got = {r["doc_id"]: r["domain_blocked"]
           for r in op.transform(urls).collect()}
    # subdomain matches on dot boundary; 'nottracker.example' must NOT
    assert got[3] is True
    assert got[4] is False
    assert got[1] is False and got[2] is False
    # NULL / malformed URLs are never flagged
    assert got[5] is False and got[6] is False


def test_blocklist_frame_matches_list(spark, urls):
    bl = spark.createDataFrame([("tracker.example",), ("example.org",)],
                               "domain string")
    frame_out = {
        r["doc_id"]: r["domain_blocked"]
        for r in ff.DomainBlocklistFilter("url", bl).transform(urls).collect()
    }
    list_out = {
        r["doc_id"]: r["domain_blocked"]
        for r in ff.DomainBlocklistFilter(
            "url", ["tracker.example", "example.org"]
        ).transform(urls).collect()
    }
    assert frame_out == list_out
    assert frame_out[1] is True and frame_out[2] is True
    assert frame_out[4] is False


def test_blocklist_frame_preserves_duplicates_and_map_columns(spark):
    # r7 ADVICE fix: the frame-blocklist path must not collapse
    # fully-duplicate rows and must tolerate non-groupable (map-typed)
    # payload columns.
    bl = spark.createDataFrame([("blocked.example",)], "domain string")
    rows = [
        ("https://blocked.example/a", {"k": "v"}),
        ("https://blocked.example/a", {"k": "v"}),   # exact duplicate
        ("https://blocked.example/a", {"k": "v"}),   # exact duplicate
        ("https://ok.example/b", {"k": "w"}),
    ]
    df = spark.createDataFrame(rows, "url string, meta map<string,string>")
    out = ff.DomainBlocklistFilter("url", bl).transform(df).collect()
    assert len(out) == 4
    assert sum(r["domain_blocked"] for r in out) == 3
    assert all(r["meta"] is not None for r in out)


def test_blocklist_filter_mode(urls):
    op = ff.DomainBlocklistFilter("url", ["example.org"], mode="filter")
    kept = sorted(r["doc_id"] for r in op.transform(urls).collect())
    assert kept == [3, 4, 5, 6]


def test_blocklist_frame_is_broadcast(spark, urls):
    bl = spark.createDataFrame([("tracker.example",)], "domain string")
    plan = (
        ff.DomainBlocklistFilter("url", bl)
        .transform(urls)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


@pytest.fixture(scope="module")
def many_urls(spark):
    # 3 domains x 20 docs, one domain via www
    rows = [
        (i, f"https://{'www.' if d == 0 else ''}d{d}.example.org/doc/{i}")
        for i in range(60)
        for d in [i % 3]
    ]
    return spark.createDataFrame(rows, "doc_id bigint, url string")


def test_domain_cap_counts_and_determinism(many_urls):
    op = ff.DomainCapSampler("url", "doc_id", max_per_domain=5)
    out1 = sorted(r["doc_id"] for r in op.transform(many_urls).collect())
    out2 = sorted(
        r["doc_id"]
        for r in op.transform(many_urls.repartition(7)).collect()
    )
    assert out1 == out2  # partitioning-independent
    assert len(out1) == 15
    per_domain = (
        ff.DomainExtractor(["url"]).transform(many_urls)
        .where(F.col("doc_id").isin(out1))
        .groupBy("url_domain").count().collect()
    )
    assert {r["count"] for r in per_domain} == {5}


def test_domain_cap_seed_changes_sample(many_urls):
    a = sorted(r["doc_id"] for r in ff.DomainCapSampler(
        "url", "doc_id", 5, seed=0).transform(many_urls).collect())
    b = sorted(r["doc_id"] for r in ff.DomainCapSampler(
        "url", "doc_id", 5, seed=1).transform(many_urls).collect())
    assert a != b


def test_domain_cap_null_domains_exempt(spark):
    # r7 ADVICE fix: rows with NULL/unparseable URLs belong to no
    # domain and must pass through uncapped, not pool into one NULL
    # group that silently drops everything beyond the cap.
    rows = [(i, None) for i in range(10)] + [
        (100 + i, f"https://big.example/doc/{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    out = ff.DomainCapSampler("url", "doc_id", max_per_domain=3).transform(df)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert len([d for d in kept if d < 100]) == 10   # all NULL-url rows kept
    assert len([d for d in kept if d >= 100]) == 3   # real domain capped


def test_domain_cap_precomputed_domain_col(many_urls):
    with_dom = ff.DomainExtractor(["url"]).transform(many_urls)
    via_url = sorted(r["doc_id"] for r in ff.DomainCapSampler(
        "url", "doc_id", 5).transform(many_urls).collect())
    via_col = sorted(r["doc_id"] for r in ff.DomainCapSampler(
        "url", "doc_id", 5, domain_col="url_domain"
    ).transform(with_dom).collect())
    assert via_url == via_col


# -- HtmlTextExtractor --------------------------------------------------


@pytest.fixture(scope="module")
def pages(spark):
    html = (
        '<html><head><title>T</title><style>p{color:red}</style>'
        '<script>if (a < b && c > d) { alert("x"); }</script></head>'
        '<body><h1>Header One</h1><p>First para with &amp; and '
        '&lt;tag&gt; text.</p><p>Second&nbsp;para &amp;lt; stays '
        'literal.</p><!-- hidden --><ul><li>item one</li>'
        '<li>item two</li></ul><a href="/x">a link</a> end</body></html>'
    )
    return spark.createDataFrame(
        [(1, html), (2, "plain text, no markup"), (3, None), (4, "")],
        "doc_id bigint, page string",
    )


def test_html_extraction_rules(pages):
    rows = {r["doc_id"]: r for r in
            ff.HtmlTextExtractor(["page"]).transform(pages).collect()}
    t = rows[1]["page_html_text"]
    # script/style/comment content gone, including the embedded < and &&
    assert "alert" not in t and "color:red" not in t and "hidden" not in t
    # block closers became line breaks; inline tags became spaces
    assert "Header One\nFirst para" in t
    assert "item one\nitem two" in t
    # entities decode in ONE pass: &amp; -> &, but &amp;lt; -> literal &lt;
    assert "with & and <tag> text." in t
    assert "&lt; stays literal." in t
    assert rows[1]["page_tag_count"] > 20
    assert rows[1]["page_link_count"] == 1
    assert 0.0 < rows[1]["page_text_ratio"] < 1.0


def test_html_plain_text_passthrough(pages):
    rows = {r["doc_id"]: r for r in
            ff.HtmlTextExtractor(["page"]).transform(pages).collect()}
    assert rows[2]["page_html_text"] == "plain text, no markup"
    assert rows[2]["page_tag_count"] == 0
    assert rows[2]["page_text_ratio"] == 1.0
    # NULL html -> NULL outputs; empty html -> empty text, ratio 0
    assert rows[3]["page_html_text"] is None
    assert rows[4]["page_html_text"] == ""
    assert rows[4]["page_text_ratio"] == 0.0


def test_html_keep_newlines_off(pages):
    rows = {r["doc_id"]: r for r in
            ff.HtmlTextExtractor(["page"], keep_newlines=False)
            .transform(pages).collect()}
    assert "\n" not in rows[1]["page_html_text"]


def test_html_transform_is_narrow(pages):
    out = ff.HtmlTextExtractor(["page"]).transform(pages)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


# -- UrlCanonicalizer / UrlDeduplicator (r7) ----------------------------


def test_canonicalizer_rules(spark):
    rows = [
        (1, "HTTPS://User:Pw@WWW.Example.ORG:443/A/B/?utm_source=x&b=2&a=1&fbclid=z#frag"),
        (2, "http://example.org:80/"),
        (3, "http://example.org:8080/x/"),
        (4, "https://example.org/a?ref=abc"),
        (5, "https://example.org/a?Z=1&a=2"),
        (6, None),
        (7, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {r["doc_id"]: r["url_canonical"]
           for r in ff.UrlCanonicalizer(["url"]).transform(df).collect()}
    # scheme/host lowercased, userinfo+fragment+default port+tracking
    # params stripped, query sorted, trailing slash folded
    assert got[1] == "https://www.example.org/A/B?a=1&b=2"
    assert got[2] == "http://example.org"
    assert got[3] == "http://example.org:8080/x"   # non-default port kept
    # r8 (ADVICE): bare 'ref' is a FUNCTIONAL param on many sites and
    # is no longer stripped by default...
    assert got[4] == "https://example.org/a?ref=abc"
    assert got[5] == "https://example.org/a?Z=1&a=2"  # byte-order sort
    assert got[6] is None and got[7] is None
    # ...but the aggressive list strips it on opt-in
    from feature_factory_spark.operators.web import (
        TRACKING_PARAM_RE_AGGRESSIVE,
        canonical_url_expr,
    )

    agg = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id",
        canonical_url_expr(
            F.col("url"), tracking_re=TRACKING_PARAM_RE_AGGRESSIVE
        ).alias("c"),
    ).collect()}
    assert agg[4] == "https://example.org/a"


def test_url_dedup_keeps_one_per_canonical(spark):
    # same page under tracking/case/port variants -> one survivor;
    # unparseable URLs pass through
    rows = [
        (1, "https://example.org/page?utm_source=a"),
        (2, "HTTPS://EXAMPLE.ORG:443/page"),
        (3, "https://example.org/page/"),
        (4, "https://example.org/other"),
        (5, "junk"),
        (6, "junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    kept = sorted(r["doc_id"] for r in
                  ff.UrlDeduplicator("url", "doc_id").transform(df).collect())
    assert len([k for k in kept if k <= 3]) == 1   # variants collapsed
    assert 4 in kept and 5 in kept and 6 in kept   # junk exempt
    # deterministic across partitionings
    kept2 = sorted(r["doc_id"] for r in ff.UrlDeduplicator("url", "doc_id")
                   .transform(df.repartition(5)).collect())
    assert kept == kept2


def test_url_dedup_score_col_keeps_best(spark):
    rows = [
        (1, "https://example.org/p", 0.2),
        (2, "https://example.org/p?utm_source=x", 0.9),
        (3, "https://example.org/p/", 0.9),   # tie -> smallest doc_id
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, score double")
    kept = [r["doc_id"] for r in
            ff.UrlDeduplicator("url", "doc_id", score_col="score")
            .transform(df).collect()]
    assert kept == [2]


def test_canonicalizer_is_narrow(spark):
    df = spark.createDataFrame([(1, "https://a.example/x")],
                               "doc_id bigint, url string")
    plan = (ff.UrlCanonicalizer(["url"]).transform(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


# --- MarkdownTextExtractor (r8) --------------------------------------

def test_markdown_extractor_rules(spark):
    md = "\n".join([
        "# Big Title",
        "",
        "Intro with a [link](https://x.org/a) and ![alt words](i.png).",
        "",
        "```",
        "code must vanish",
        "```",
        "",
        "> quoted line",
        "",
        "- item one",
        "- item *two*",
        "3. third",
        "",
        "| a | b |",
        "|---|---|",
        "",
        "snake_case stays. **strong** and `inline kept`.",
    ])
    df = spark.createDataFrame([(1, md), (2, None), (3, "")],
                               "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           ff.MarkdownTextExtractor(["text"]).transform(df).collect()}
    t = out[1]["text_md_text"]
    assert "code must vanish" not in t
    assert "Big Title" in t and "#" not in t
    assert "link" in t and "https://x.org" not in t
    assert "alt words" in t and "i.png" not in t
    assert "inline kept" in t and "`" not in t
    assert "snake_case stays" in t and "*" not in t and "|" not in t
    assert "quoted line" in t and ">" not in t
    assert out[1]["text_code_blocks"] == 1
    assert out[1]["text_link_count"] == 1
    assert out[1]["text_image_count"] == 1
    assert 0.0 < out[1]["text_text_ratio"] < 1.0
    assert out[2]["text_md_text"] is None
    assert out[3]["text_md_text"] == "" and out[3]["text_text_ratio"] == 0.0
    # narrow plan
    plan = (ff.MarkdownTextExtractor(["text"]).transform(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


class TestMetaRobotsFilter:
    def pages(self, spark):
        return spark.createDataFrame(
            [
                (1, '<html><head><meta name="robots" '
                    'content="noindex, follow"></head><body>x</body></html>'),
                (2, "<html><head><META NAME='robots' CONTENT='NONE'>"
                    "</head><body>x</body></html>"),
                (3, '<html><head><meta content="nofollow" name=robots>'
                    '</head><body>x</body></html>'),
                (4, '<html><head><meta name="robots" content="index, '
                    'follow"></head><body>x</body></html>'),
                (5, "<html><body>no meta at all</body></html>"),
                (6, None),
            ],
            "doc_id bigint, page string",
        )

    def test_flag_mode(self, spark):
        out = ff.MetaRobotsFilter("page").transform(self.pages(spark))
        got = {r["doc_id"]: (r["page_robots"], r["page_robots_blocked"])
               for r in out.collect()}
        assert got[1] == ("noindex, follow", True)
        assert got[2] == ("none", True)
        assert got[3] == ("nofollow", False)  # link policy != content
        assert got[4] == ("index, follow", False)
        assert got[5] == (None, False)
        assert got[6] == (None, False)

    def test_filter_mode_and_custom_directives(self, spark):
        kept = ff.MetaRobotsFilter("page", mode="filter").transform(
            self.pages(spark)
        )
        assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4, 5, 6]
        strict = ff.MetaRobotsFilter(
            "page", blocked=("noindex", "none", "nofollow"), mode="filter"
        ).transform(self.pages(spark))
        assert sorted(r["doc_id"] for r in strict.collect()) == [4, 5, 6]

    def test_composes_in_pipeline(self, spark):
        pipe = ff.make_pipeline(
            ("robots", ff.MetaRobotsFilter("page", mode="filter")),
            ("extract", ff.HtmlTextExtractor(["page"])),
        )
        out = pipe.fit(self.pages(spark).where(F.col("page").isNotNull()))
        assert out.count() == 3

    def test_unquoted_multiple_and_prefix_names(self, spark):
        # r11 ADVICE hardening: HTML5 unquoted attribute values must
        # block, directives union across ALL robots tags (a permissive
        # first tag cannot shadow a later noindex), and a name merely
        # prefixed with 'robots' is NOT a robots tag.
        df = spark.createDataFrame(
            [
                (1, "<html><head><meta name=robots content=noindex>"
                    "</head><body>x</body></html>"),
                (2, '<html><head><meta name="robots" content="index">'
                    "<meta name=robots content=noindex>"
                    "</head><body>x</body></html>"),
                (3, '<html><head><meta name="robotsx" content="noindex">'
                    "<meta name=viewport content=width=1>"
                    "</head><body>x</body></html>"),
                (4, "<html><head><meta name = robots content = none >"
                    "</head><body>x</body></html>"),
            ],
            "doc_id bigint, page string",
        )
        got = {r["doc_id"]: (r["page_robots"], r["page_robots_blocked"])
               for r in ff.MetaRobotsFilter("page").transform(df).collect()}
        assert got[1] == ("noindex", True)
        assert got[2] == ("index,noindex", True)
        assert got[3] == (None, False)
        assert got[4] == ("none", True)


class TestRobotsTxtFilter:
    @pytest.fixture(scope="class")
    def robots(self, spark):
        return spark.createDataFrame([
            ("a.com", "User-agent: *\nDisallow: /private/\n"
                      "Allow: /private/ok\n\nUser-agent: evilbot\n"
                      "Disallow: /\n# comment\nSitemap: ignored"),
            ("b.com", "User-agent: gptbot\nUser-agent: *\n"
                      "Disallow: /*.pdf$\n"),
            ("c.com", "User-agent: otherbot\nDisallow: /\n"),
            ("d.com", "User-agent: *\nDisallow:\n"),  # empty = allow all
        ], "domain string, robots_txt string")

    @pytest.fixture(scope="class")
    def urls(self, spark):
        return spark.createDataFrame([
            (1, "http://a.com/private/x"),
            (2, "http://a.com/private/ok/y"),
            (3, "http://a.com/public"),
            (4, "http://b.com/doc.pdf"),
            (5, "http://b.com/doc.pdfx"),
            (6, "http://c.com/anything"),
            (7, "http://nowhere.com/x"),
            (8, "http://d.com/x"),
        ], "doc_id bigint, url string")

    def test_rfc9309_decisions(self, spark, robots, urls):
        from feature_factory_spark.operators.web import RobotsTxtFilter

        op = RobotsTxtFilter("url").fit_robots(robots)
        got = {r["doc_id"]: r["url_robots_blocked"]
               for r in op.transform(urls).collect()}
        assert got == {1: True, 2: False, 3: False, 4: True,
                       5: False, 6: False, 7: False, 8: False}

    def test_specific_agent_group(self, spark, robots, urls):
        from feature_factory_spark.operators.web import RobotsTxtFilter

        op = RobotsTxtFilter("url", agent="evilbot").fit_robots(robots)
        got = {r["doc_id"]: r["url_robots_blocked"]
               for r in op.transform(urls).collect()}
        # evilbot's group Disallow: / blocks everything on a.com; the
        # '*' groups still apply to it too (union of applying groups)
        assert got[1] and got[3]
        assert got[4] and not got[5]

    def test_filter_mode_and_fit_guard(self, spark, robots, urls):
        from feature_factory_spark.operators.web import RobotsTxtFilter

        op = RobotsTxtFilter("url", mode="filter").fit_robots(robots)
        kept = sorted(r["doc_id"] for r in op.transform(urls).collect())
        assert kept == [2, 3, 5, 6, 7, 8]
        with pytest.raises(ff.InvalidParameterError, match="fit_robots"):
            RobotsTxtFilter("url").fit(urls)

    def test_state_roundtrip(self, spark, robots, urls, tmp_path):
        from feature_factory_spark.operators.web import RobotsTxtFilter

        op = RobotsTxtFilter("url").fit_robots(robots)
        path = str(tmp_path / "robots_state")
        op.save_state(path)
        restored = RobotsTxtFilter("url").load_state(path, spark)
        a = sorted(map(tuple, op.transform(urls).collect()))
        b = sorted(map(tuple, restored.transform(urls).collect()))
        assert a == b

    def test_sitemaps_extraction(self, spark):
        from feature_factory_spark.operators.web import (
            robots_sitemaps_expr,
        )

        df = spark.createDataFrame(
            [
                ("User-agent: *\nSitemap: http://a.com/s.xml\n"
                 "Disallow: /x\nSITEMAP: http://a.com/s2.xml # note",),
                ("User-agent: *\nDisallow: /",),
                (None,),
                ("Sitemap:",),  # empty value dropped
            ],
            "txt string",
        )
        got = [r["s"] for r in df.select(
            robots_sitemaps_expr(F.col("txt")).alias("s")
        ).collect()]
        assert got[0] == ["http://a.com/s.xml", "http://a.com/s2.xml"]
        assert got[1] == [] and got[2] == [] and got[3] == []

    def test_crawl_delay_surface(self, spark, urls):
        # r11: Crawl-delay (the Bing/Yandex extension) surfaced per URL
        # when with_crawl_delay=True — min across applying groups,
        # NULL when unset/malformed, never affects blocking
        from feature_factory_spark.operators.web import (
            RobotsTxtFilter, robots_crawl_delay_expr,
        )

        robots = spark.createDataFrame(
            [
                ("a.com", "User-agent: *\nCrawl-delay: 2.5\n"
                          "Disallow: /private/\nAllow: /private/ok"),
                ("b.com", "User-agent: gptbot\nCrawl-delay: 1\n\n"
                          "User-agent: *\nCrawl-delay: 7"),
                ("c.com", "User-agent: otherbot\nCrawl-delay: 3"),
                ("d.com", "User-agent: *\nCrawl-delay: nonsense"),
            ],
            "domain string, robots_txt string",
        )
        op = RobotsTxtFilter("url", with_crawl_delay=True) \
            .fit_robots(robots)
        got = {r["doc_id"]: (r["url_robots_blocked"],
                             r["url_crawl_delay"])
               for r in op.transform(urls).collect()}
        assert got[1] == (True, 2.5)    # a.com, blocking unaffected
        assert got[4][1] == 7.0         # b.com '*' group for agent '*'
        assert got[6][1] is None        # c.com group does not apply
        assert got[7][1] is None        # unknown domain
        # gptbot sees BOTH applying groups on b.com -> min(1, 7)
        g = RobotsTxtFilter("url", agent="gptbot",
                            with_crawl_delay=True).fit_robots(robots)
        ggot = {r["doc_id"]: r["url_crawl_delay"]
                for r in g.transform(urls).collect()}
        assert ggot[4] == 1.0
        # malformed value -> NULL via try_cast
        d = spark.createDataFrame(
            [("x", "User-agent: *\nCrawl-delay: nonsense")],
            "domain string, robots_txt string",
        ).select(robots_crawl_delay_expr(F.col("robots_txt")).alias("d"))
        assert d.collect()[0]["d"] is None
        # default (with_crawl_delay=False) keeps the old contract
        plain = RobotsTxtFilter("url").fit_robots(robots)
        assert "url_crawl_delay" not in plain.transform(urls).columns

    def test_percent_normalization(self, spark):
        # r11: RFC 3986 §6.2.2 normalization on both rule prefixes and
        # probed paths — encoded/decoded unreserved spellings and hex
        # case variants match; %2F never conflates with '/'
        from feature_factory_spark.operators.web import RobotsTxtFilter

        robots = spark.createDataFrame(
            [("e.com", "User-agent: *\nDisallow: /%7euser/\n"
                       "Allow: /%7Euser/pub\nDisallow: /a%2Fb\n"
                       "Disallow: /caf%c3%a9/")],
            "domain string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [
                (1, "http://e.com/~user/secret"),    # decoded ~ blocked
                (2, "http://e.com/%7euser/secret"),  # lower-hex blocked
                (3, "http://e.com/%7Euser/pub/x"),   # Allow wins
                (4, "http://e.com/a%2fb"),           # hex case match
                (5, "http://e.com/a/b"),             # NOT the %2F rule
                (6, "http://e.com/caf%c3%a9/x"),     # non-ASCII upper
            ],
            "doc_id bigint, url string",
        )
        op = RobotsTxtFilter("url").fit_robots(robots)
        got = {r["doc_id"]: r["url_robots_blocked"]
               for r in op.transform(urls).collect()}
        assert got == {1: True, 2: True, 3: False, 4: True,
                       5: False, 6: True}

    def test_pct_normalize_expr_cases(self, spark):
        from feature_factory_spark.operators.web import pct_normalize_expr

        cases = ["/%7euser/", "/a%2fb", "/caf%c3%a9/x", "/%zz",
                 "/100%", "/plain", "", "/%%41"]
        df = spark.createDataFrame([(c,) for c in cases], "s string")
        got = {r["s"]: r["n"] for r in df.select(
            "s", pct_normalize_expr(F.col("s")).alias("n")
        ).collect()}
        assert got == {
            "/%7euser/": "/~user/", "/a%2fb": "/a%2Fb",
            "/caf%c3%a9/x": "/caf%C3%A9/x", "/%zz": "/%zz",
            "/100%": "/100%", "/plain": "/plain", "": "",
            "/%%41": "/%A",
        }

    def test_duplicate_domains_do_not_fan_out(self, spark, robots, urls):
        # r11 ADVICE: redundant robots fetches for one domain (easy in
        # a real crawl, including case variants) must not fan the
        # transform join out and duplicate that domain's URL rows —
        # fit_robots keeps one deterministic body per lowercased domain
        from feature_factory_spark.operators.web import RobotsTxtFilter

        dup = robots.unionByName(robots).unionByName(
            spark.createDataFrame(
                [("A.COM", "User-agent: *\nDisallow: /private/\n"
                           "Allow: /private/ok\n")],
                "domain string, robots_txt string",
            )
        )
        op = RobotsTxtFilter("url").fit_robots(dup)
        out = op.transform(urls)
        assert out.count() == urls.count()
        assert out.select("doc_id").distinct().count() == urls.count()
        got = {r["doc_id"]: r["url_robots_blocked"]
               for r in out.collect()}
        assert got[1] is True and got[2] is False


class TestXRobotsTagFilter:
    def headers(self, spark):
        return spark.createDataFrame(
            [
                (1, "noindex, nofollow"),
                (2, "index, follow"),
                (3, "googlebot: noindex"),     # prefixed: other agents
                (4, "NONE"),
                (5, "unavailable_after: 25 Jun 2010"),
                (6, None),
                (7, "nofollow"),
            ],
            "doc_id bigint, http_x_robots string",
        )

    def test_generic_agent(self, spark):
        out = ff.XRobotsTagFilter("http_x_robots").transform(
            self.headers(spark)
        )
        got = {r["doc_id"]: r["http_x_robots_blocked"]
               for r in out.collect()}
        assert got == {1: True, 2: False, 3: False, 4: True,
                       5: False, 6: False, 7: False}

    def test_named_agent_honors_prefix(self, spark):
        out = ff.XRobotsTagFilter(
            "http_x_robots", agent="googlebot"
        ).transform(self.headers(spark))
        got = {r["doc_id"]: r["http_x_robots_blocked"]
               for r in out.collect()}
        assert got[3] is True      # its prefixed directive applies
        assert got[1] is True      # bare directives still apply
        assert got[5] is False

    def test_filter_mode_and_triad_composition(self, spark):
        kept = ff.XRobotsTagFilter(
            "http_x_robots", mode="filter"
        ).transform(self.headers(spark))
        assert sorted(r["doc_id"] for r in kept.collect()) \
            == [2, 3, 5, 6, 7]
        # narrow plan
        out = ff.XRobotsTagFilter("http_x_robots").transform(
            self.headers(spark)
        )
        assert [f for f in ff.plan_audit(out)
                if f["severity"] == "error"] == []
