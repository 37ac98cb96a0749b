"""RFC 9309 robots.txt interpreter: kernel semantics + Spark gate."""

from karanta_ocr_spark.kernel.robots_mini import is_allowed, parse_robots

WILD = (
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow: /*.pdf$\n"
)


def test_longest_match_allow_override():
    assert is_allowed(WILD, "bot", "/public/x")
    assert not is_allowed(WILD, "bot", "/private/x")
    # the LONGER Allow pattern overrides the shorter Disallow
    assert is_allowed(WILD, "bot", "/private/ok/x")


def test_wildcard_and_anchor():
    assert not is_allowed(WILD, "bot", "/files/doc.pdf")
    # $ anchors: .pdf NOT at the end does not match
    assert is_allowed(WILD, "bot", "/files/doc.pdfs")
    assert is_allowed(WILD, "bot", "/files/doc.pdf/view")


def test_agent_group_selection_longest_prefix():
    txt = (
        "User-agent: kar\nDisallow: /a\n\n"
        "User-agent: karanta\nDisallow: /b\n\n"
        "User-agent: *\nDisallow: /c\n"
    )
    # 'karanta' picks the MOST specific group only: /b blocked, /a /c open
    assert is_allowed(txt, "karanta", "/a/x")
    assert not is_allowed(txt, "karanta", "/b/x")
    assert is_allowed(txt, "karanta", "/c/x")
    # 'karl' matches only 'kar'
    assert not is_allowed(txt, "karl", "/a/x")
    # unknown agent falls back to *
    assert not is_allowed(txt, "other", "/c/x")


def test_consecutive_agent_lines_share_rules():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert not is_allowed(txt, "a", "/x/1")
    assert not is_allowed(txt, "b", "/x/1")
    assert is_allowed(txt, "c", "/x/1")  # no * group -> allowed


def test_allow_wins_equal_length_tie():
    txt = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert is_allowed(txt, "bot", "/dir/page")


def test_empty_disallow_and_missing_robots():
    assert is_allowed("User-agent: *\nDisallow:\n", "bot", "/anything")
    assert is_allowed(None, "bot", "/anything")
    assert is_allowed("", "bot", "/anything")


def test_comments_and_unknown_directives_ignored():
    txt = (
        "# a comment\n"
        "User-agent: *  # trailing\n"
        "Crawl-delay: 10\n"
        "Disallow: /q\n"
        "Sitemap: https://x.example/s.xml\n"
    )
    groups = parse_robots(txt)
    assert len(groups) == 1
    assert not is_allowed(txt, "bot", "/q/1")


def test_spark_robots_gate(spark):
    from karanta_ocr_spark.operators.corpus_filters import robots_txt_gate

    pages = spark.createDataFrame(
        [
            (1, "https://a.example/private/x"),
            (2, "https://a.example/private/ok/x"),
            (3, "https://A.EXAMPLE/files/d.pdf"),  # host case-folded
            (4, "https://b.example/anything"),     # no robots row
            (5, "https://a.example"),              # empty path -> '/'
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.example", WILD)], "host string, robots_txt string"
    )
    out = {r["doc_id"]: r for r in robots_txt_gate(pages, robots).collect()}
    assert not out[1]["allowed"]
    assert out[2]["allowed"]
    assert not out[3]["allowed"] and out[3]["host"] == "a.example"
    assert out[4]["allowed"]
    assert out[5]["allowed"] and out[5]["path"] == "/"


def test_sitemap_urls_and_crawl_delay():
    from karanta_ocr_spark.kernel.robots_mini import crawl_delay, sitemap_urls

    txt = (
        "User-agent: *\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /private\n"
        "Sitemap: https://h.example/sitemap.xml\n"
        "\n"
        "User-agent: mybot\n"
        "Crawl-delay: 1\n"
        "Allow: /\n"
        "\n"
        "Sitemap: https://h.example/news.xml  # trailing comment\n"
    )
    assert sitemap_urls(txt) == [
        "https://h.example/sitemap.xml",
        "https://h.example/news.xml",
    ]
    assert crawl_delay(txt, "mybot/1.0") == 1.0  # specific group wins
    assert crawl_delay(txt, "otherbot") == 2.5
    assert crawl_delay("User-agent: *\nDisallow:\n", "x") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: soon\n", "x") is None
    assert crawl_delay(None, "x") is None
    assert sitemap_urls(None) == []
    # equally-specific merged groups: smallest declared delay wins.
    two = (
        "User-agent: *\nCrawl-delay: 5\nDisallow: /a\n\n"
        "User-agent: *\nCrawl-delay: 3\nDisallow: /b\n"
    )
    assert crawl_delay(two, "anybot") == 3.0


def test_crawl_delay_does_not_change_rule_semantics():
    from karanta_ocr_spark.kernel.robots_mini import is_allowed

    txt = "User-agent: *\nCrawl-delay: 9\nDisallow: /private\n"
    assert not is_allowed(txt, "bot", "/private/x")
    assert is_allowed(txt, "bot", "/public")


def test_robots_crawl_policy_operator(spark):
    from karanta_ocr_spark.operators.corpus_filters import robots_crawl_policy

    rows = [
        ("a.example", "User-agent: *\nCrawl-delay: 2\n"
                      "Sitemap: https://a.example/s.xml\n"),
        ("b.example", "User-agent: *\nDisallow: /x\n"),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    out = {r["host"]: r for r in robots_crawl_policy(df, "bot").collect()}
    assert out["a.example"]["crawl_delay"] == 2.0
    assert out["a.example"]["sitemaps"] == "https://a.example/s.xml"
    assert out["a.example"]["n_sitemaps"] == 1
    assert out["b.example"]["crawl_delay"] is None
    assert out["b.example"]["sitemaps"] is None
    assert out["b.example"]["n_sitemaps"] == 0
