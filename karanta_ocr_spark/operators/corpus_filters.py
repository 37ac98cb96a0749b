"""Web-corpus quality filters in the style of the published Gopher
(Rae et al. 2021, arXiv:2112.11446 — repetition signals) and C4
(Raffel et al. 2020, arXiv:1910.10683 — line-shape heuristics) rules.
These are the filters a training-data pipeline runs right after
extraction and before dedup; they complement the per-document
``functions/text_analysis`` scores.

Scale notes:

* Everything except the top-bigram mode is a per-row Catalyst
  higher-order-function expression — zero shuffles, stays inside
  whole-stage codegen.
* The top-bigram mode (``most frequent 2-gram`` of Gopher's
  repetition family) genuinely needs a count per (doc, bigram); a
  per-row HOF would be O(tokens²) per document, so it runs as
  explode → two-stage aggregate (map-side partial combine) → per-doc
  window rank (count desc, bigram asc). The shuffle key (doc_id,
  bigram) is high-cardinality and skew-free by construction, and the
  window partitions by doc_id so no task sees more than one
  document's bigrams.
* Ties for the top bigram break to the lexicographically smallest —
  deterministic, partition-independent, and reproducible by the
  DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from karanta_ocr_spark.functions.text_analysis import WS, WS_SQL, stopword_ratio

#: Terminal punctuation accepted by the C4 line rule.
_TERMINALS = (".", "!", "?", '"')


def lines_expr(col: Column) -> Column:
    """Trimmed, non-empty lines of *col*."""
    return F.filter(
        F.transform(F.split(col, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def duplicate_line_stats(col: Column) -> tuple[Column, Column, Column]:
    """(n_lines, dup_line_frac, dup_line_char_frac) — Gopher's
    duplicate-line signals. ``dup_line_frac`` is the fraction of line
    occurrences beyond the first of their value;
    ``dup_line_char_frac`` the same weighted by characters. Empty
    documents (no non-blank line) report 0.0 for both."""
    lines = lines_expr(col)
    n = F.size(lines)
    nd = F.size(F.array_distinct(lines))
    chars = F.aggregate(lines, F.lit(0), lambda a, x: a + F.length(x))
    chars_d = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, x: a + F.length(x)
    )
    dup_frac = F.when(n > 0, F.round((n - nd) / n, 6)).otherwise(F.lit(0.0))
    dup_char_frac = F.when(
        chars > 0, F.round((chars - chars_d) / chars, 6)
    ).otherwise(F.lit(0.0))
    return n.cast("bigint"), dup_frac, dup_char_frac


def _bigrams_expr(toks_col: str) -> str:
    """SQL text for the (non-distinct, case-preserving) word-bigram
    array over a PRE-HOISTED token-array column — duplicates matter,
    they are what the mode counts. (Inlining the split() here would
    re-tokenize once per bigram: Catalyst does not CSE across lambda
    boundaries.)"""
    return (
        f"CASE WHEN size({toks_col}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({toks_col}) - 1), "
        f"i -> concat(element_at({toks_col}, i), ' ', element_at({toks_col}, i + 1))) END"
    )


def gopher_repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition profile:

    ``n_lines, dup_line_frac, dup_line_char_frac`` (per-row HOFs, no
    shuffle) plus ``top_bigram`` (most frequent word 2-gram, ties →
    lexicographically smallest) and ``top_bigram_frac`` (characters
    covered by all its occurrences / characters of the trimmed text —
    Gopher's top-2-gram character fraction). Documents with fewer than
    two tokens get a NULL top_bigram/frac."""
    n, dup_frac, dup_char_frac = duplicate_line_stats(F.col(text_col))
    base = df.select(
        F.col(id_col),
        n.alias("n_lines"),
        dup_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_line_char_frac"),
        F.length(F.trim(F.col(text_col))).cast("bigint").alias("_n_chars"),
    )
    bg = df.select(
        F.col(id_col),
        F.expr(f"split(trim({text_col}), '{WS_SQL}+')").alias("_toks"),
    ).select(
        F.col(id_col),
        F.explode(F.expr(_bigrams_expr("_toks"))).alias("bigram"),
    )
    cnt = bg.groupBy(id_col, "bigram").agg(F.count("*").alias("c"))
    # One pass over the counted rows: a per-document window (rank by
    # count desc, bigram asc) instead of a max+join-back — the join
    # formulation recomputed the whole explode+count subtree twice
    # (visible as duplicate HashAggregates in the physical plan).
    w = Window.partitionBy(id_col).orderBy(F.desc("c"), F.asc("bigram"))
    top = (
        cnt.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(id_col),
            F.col("bigram").alias("top_bigram"),
            F.col("c").alias("_top_c"),
        )
    )
    out = base.join(top, on=id_col, how="left")
    frac = F.when(
        F.col("top_bigram").isNotNull() & (F.col("_n_chars") > 0),
        F.round(
            F.col("_top_c") * F.length(F.col("top_bigram")) / F.col("_n_chars"), 6
        ),
    )
    return out.select(
        id_col, "n_lines", "dup_line_frac", "dup_line_char_frac",
        "top_bigram", frac.alias("top_bigram_frac"),
    )


def dedup_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    key: str = "xxhash64",
) -> DataFrame:
    """Corpus-wide repeated-paragraph removal (the RefinedWeb/Dolma
    pass that strips cross-site boilerplate lines): every occurrence
    of a paragraph beyond its FIRST (by (doc, position) order) is
    dropped, and each document's text is rebuilt from its surviving
    paragraphs in original order.

    Returns ``(id, text, n_kept, n_dropped)`` — one row per input row,
    text possibly empty when every paragraph was a repeat.

    Scale shape: posexplode → groupBy a HASH of the paragraph with
    map-side partial aggregation (a hot boilerplate line is ONE group
    — min(struct) not collect), join back on the hash (AQE skew-join
    handles the hot key), one final groupBy on the document id. No
    window over the whole corpus, no driver collect. Grouping/joining
    on the hash rather than the paragraph string keeps the full
    corpus text OUT of the shuffle key and off the winners side
    entirely — at 100 TB the alternative shuffles the corpus twice
    keyed by its own content.

    ``key='xxhash64'`` (default) pairs the 64-bit hash with the
    paragraph length, so a silent first-occurrence miscount needs a
    same-length 64-bit collision; ``key='md5'`` (128-bit) removes even
    that at the cost of a 32-char shuffle key; ``key='text'`` keeps
    the r1 exact-string behavior as spec/fallback."""
    lines = lines_expr(F.col(text_col))
    paras = df.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "para")
    )
    if key == "xxhash64":
        paras = paras.withColumn(
            "_pk", F.struct(F.xxhash64("para"), F.length("para"))
        )
    elif key == "md5":
        paras = paras.withColumn("_pk", F.md5("para"))
    elif key == "text":
        paras = paras.withColumn("_pk", F.col("para"))
    else:
        raise ValueError(f"unknown key: {key!r}")
    first = paras.select("_pk", id_col, "pos").groupBy("_pk").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    kept = (
        paras.join(first, on="_pk")
        .filter(
            (F.col(id_col) == F.col("_first")[id_col])
            & (F.col("pos") == F.col("_first")["pos"])
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                "\n",
            ).alias("_text"),
            F.count("*").alias("_n_kept"),
        )
    )
    base = df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("_n_total"),
    )
    out = base.join(kept, on=id_col, how="left")
    return out.select(
        id_col,
        F.coalesce(F.col("_text"), F.lit("")).alias("text"),
        F.coalesce(F.col("_n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("_n_total") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
    )


def meta_robots_flags(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Robots-meta policy flags — the page-level opt-out a compliant
    crawl pipeline honors before training on a page: ``noindex`` /
    ``nofollow`` from ``<meta name="robots" content="...">`` (both
    attribute orders), plus ``indexable`` (= NOT noindex).

    Honest scope: the HTML meta tag only (the common in-band signal);
    the HTTP ``X-Robots-Tag`` header lives in the WARC record headers
    and would be a column by the time rows reach this operator.
    Per-row Catalyst ``rlike`` over the decoded html — zero shuffle,
    RE2-safe patterns (no lookarounds/backrefs) so an independent SQL
    engine evaluates them identically.

    The content value accepts BOTH attribute forms: quoted
    (``content="noindex, nofollow"`` — value may contain spaces) and
    the legal unquoted form (``content=noindex`` — value runs to the
    next whitespace/``>``). Missing the unquoted form would report an
    opted-out page as indexable, the unsafe direction for a policy
    filter."""
    s = F.decode(F.col(html_col), "UTF-8")

    # Value matcher up to the policy token: a quoted value (spaces
    # allowed inside the quotes) or an unquoted value (no whitespace).
    _VAL = r"(?:[\"'][^\"'>]*|[^\"'> \t]*)"

    def flag(token: str) -> Column:
        name_first = (
            r"(?i)<meta[^>]*name[ \t]*=[ \t]*[\"']?robots[^>]*"
            r"content[ \t]*=[ \t]*" + _VAL + token
        )
        content_first = (
            r"(?i)<meta[^>]*content[ \t]*=[ \t]*" + _VAL + token
            + r"[^>]*name[ \t]*=[ \t]*[\"']?robots"
        )
        return s.rlike(name_first) | s.rlike(content_first)

    noindex = flag("noindex")
    return df.select(
        F.col(id_col),
        noindex.alias("noindex"),
        flag("nofollow").alias("nofollow"),
        (~noindex).alias("indexable"),
    )


def blocklist_filter(
    df: DataFrame,
    blocked_domains: list[str],
    blocked_words: list[str],
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_frac: float = 0.0,
) -> DataFrame:
    """UT1/C4-style blocklist gate — the first policy filter of a web
    pipeline (C4 drops pages containing any "bad word"; RefinedWeb
    drops blocklisted domains before fetch).

    Emits per-doc ``host``, ``blocked_domain`` (host equals a listed
    domain or is a subdomain of one), ``n_blocked_words`` (lowercased
    whitespace tokens found in *blocked_words*), ``blocked_word_frac``
    and ``keep`` (no blocked domain AND word fraction ≤
    *max_word_frac*; the default 0.0 is C4's any-hit-drops rule).

    Scale shape: everything is per-row Catalyst — host via one regexp,
    token membership via an array-literal ``array_contains`` over the
    HOISTED token array (the word list is a plan literal; for
    million-entry lists switch to a broadcast join on the token — this
    operator targets the few-thousand-entry UT1 category lists).
    Zero shuffle."""
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    dom_hit = F.lit(False)
    for d in blocked_domains:
        dl = d.lower()
        dom_hit = dom_hit | (F.col("host") == dl) | F.col("host").endswith("." + dl)
    words = F.array(*[F.lit(w.lower()) for w in blocked_words])
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS + "+")
    out = df.select(
        F.col(id_col), host.alias("host"), toks.alias("_toks")
    ).select(
        id_col,
        "host",
        F.size("_toks").cast("long").alias("_n_toks"),
        F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(words, t)))
        .cast("long")
        .alias("n_blocked_words"),
    )
    frac = F.when(
        F.col("_n_toks") > 0, F.round(F.col("n_blocked_words") / F.col("_n_toks"), 6)
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "host",
        dom_hit.alias("blocked_domain"),
        "n_blocked_words",
        frac.alias("blocked_word_frac"),
        (
            ~dom_hit
            & (frac <= F.lit(max_word_frac))
        ).alias("keep"),
    )


def c4_quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document C4-style line-shape signals — all per-row Catalyst
    (zero shuffle):

    * ``word_count`` — whitespace tokens;
    * ``n_lines`` — trimmed non-empty lines;
    * ``terminal_punct_line_frac`` — fraction of lines ending in
      ``. ! ? "`` (C4 drops lines that don't);
    * ``mean_words_per_line``;
    * ``has_lorem_ipsum`` / ``has_curly_brace`` — C4's page-level
      drop rules;
    * ``c4_keep`` — the hard rules combined (≥5 words, no lorem
      ipsum, no ``{``, at least one line)."""
    col = F.col(text_col)
    lines = lines_expr(col)
    n = F.size(lines)
    toks = F.split(F.trim(col), WS + "+")
    wc = F.size(toks)
    terms = F.array(*[F.lit(t) for t in _TERMINALS])
    n_term = F.size(
        F.filter(lines, lambda x: F.array_contains(terms, F.substring(x, -1, 1)))
    )
    lorem = F.lower(col).contains("lorem ipsum")
    brace = col.contains("{")
    return df.select(
        F.col(id_col),
        wc.cast("bigint").alias("word_count"),
        n.cast("bigint").alias("n_lines"),
        F.when(n > 0, F.round(n_term / n, 6)).otherwise(F.lit(0.0)).alias(
            "terminal_punct_line_frac"
        ),
        F.when(n > 0, F.round(wc / n, 6)).alias("mean_words_per_line"),
        lorem.alias("has_lorem_ipsum"),
        brace.alias("has_curly_brace"),
        ((wc >= 5) & ~lorem & ~brace & (n > 0)).alias("c4_keep"),
    )


def robots_txt_gate(
    df: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    id_col: str = "doc_id",
    robots_host_col: str = "host",
    robots_text_col: str = "robots_txt",
) -> DataFrame:
    """robots.txt compliance gate (RFC 9309) — the third crawl-policy
    leg next to :func:`blocklist_filter` and
    :func:`meta_robots_flags`: join each page to its host's
    robots.txt and evaluate *agent*'s verdict for the page's path via
    ``kernel.robots_mini`` (group selection by longest agent prefix,
    ``*``/``$`` wildcard rules, longest-pattern-wins, allow on ties).

    Returns ``(id_col, host, path, allowed)``. Hosts with no robots
    row are allowed (a 404 robots.txt permits crawling).

    Scale shape: host/path extraction is Catalyst; the robots table
    is one small row per host (broadcast-able — there are ~10^8 hosts
    on the web vs 10^12 pages, and only crawled hosts appear); the
    wildcard longest-match evaluation is genuinely inexpressible in
    Catalyst, so it runs as ONE Arrow-batched pandas UDF with a
    per-worker parse cache keyed by the robots text (hosts repeat
    heavily per partition — pre-repartitioning by host makes the
    cache hit rate ~1)."""
    from pyspark.sql.functions import pandas_udf

    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    raw_path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)

    def verdicts(texts: pd.Series, paths: pd.Series) -> pd.Series:
        from functools import lru_cache

        from karanta_ocr_spark.kernel.robots_mini import (
            _select_rules,
            allowed_by_rules,
            parse_robots,
        )

        @lru_cache(maxsize=4096)
        def rules_for(text: str):
            return _select_rules(parse_robots(text), agent)

        out = []
        for text, p in zip(texts.tolist(), paths.tolist()):
            if text is None or text == "":
                out.append(True)
                continue
            out.append(allowed_by_rules(rules_for(text), p))
        return pd.Series(out, dtype="bool")

    verdict_udf = pandas_udf(verdicts, "boolean")
    pages = df.select(
        F.col(id_col), host.alias("host"), path.alias("path")
    )
    rb = robots.select(
        F.lower(F.col(robots_host_col)).alias("host"),
        F.col(robots_text_col).alias("_robots"),
    )
    return (
        pages.join(F.broadcast(rb), on="host", how="left")
        .withColumn("allowed", verdict_udf(F.col("_robots"), F.col("path")))
        .select(id_col, "host", "path", "allowed")
    )


def host_reputation(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_docs: int = 3,
    max_dup_frac: float = 0.5,
    min_mean_chars: float = 50.0,
    mode: str = "exact",
) -> DataFrame:
    """Per-host corpus reputation profile — the domain-level signal a
    training-data pipeline uses to drop whole low-quality sites
    (template farms, parked domains, scrapers) rather than judging
    every page in isolation.

    Aggregates per host: ``n_docs``, ``n_unique`` distinct text
    fingerprints, ``dup_frac`` (1 - unique/docs: template-farm
    signal), ``mean_chars``, ``mean_stop`` (mean stopword ratio:
    natural-language-ness), and a ``reputable`` verdict from the
    thresholds (enough docs, not dominated by duplicates, not
    near-empty pages).

    *mode*: ``'exact'`` counts distinct md5 fingerprints — the spec
    the DuckDB oracle replays; ``'approx'`` swaps in
    ``approx_count_distinct`` (HyperLogLog++). At 100 TB the exact
    form expands to a two-phase distinct aggregate (shuffle keyed on
    (host, fingerprint) — correct but one extra exchange); the HLL
    sketch keeps the plan at ONE partial agg per host, which is the
    production path, same seam as ``length_percentiles``.

    Scale shape: host extraction is one Catalyst regexp; the
    aggregation is a skew-tolerant partial agg (hot hosts partial-
    aggregate map-side before the exchange; fingerprints are 32-byte
    hashes, never the corpus text).
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"unknown mode: {mode!r}")
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)
    )
    fp = F.md5(F.col(text_col))
    agg = (
        df.select(
            host.alias("host"),
            fp.alias("_fp"),
            F.length(F.col(text_col)).alias("_len"),
            stopword_ratio(F.col(text_col)).alias("_stop"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("_fp")).alias("n_unique")
            if mode == "exact"
            else F.approx_count_distinct(F.col("_fp")).alias("n_unique"),
            F.avg("_len").alias("mean_chars"),
            F.round(F.avg("_stop"), 6).alias("mean_stop"),
        )
    )
    dup = F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6)
    return agg.select(
        "host",
        "n_docs",
        "n_unique",
        dup.alias("dup_frac"),
        F.round("mean_chars", 6).alias("mean_chars"),
        "mean_stop",
        (
            (F.col("n_docs") >= min_docs)
            & (dup <= max_dup_frac)
            & (F.col("mean_chars") >= min_mean_chars)
        ).alias("reputable"),
    )


def robots_crawl_policy(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Per-host crawl policy from robots.txt: the agent's
    ``crawl_delay`` (group-selected exactly like the allow/disallow
    rules; smallest declared value among equally-specific groups) and
    the host's ``Sitemap:`` declarations (group-independent, file
    order, joined with ``|`` so the row stays flat).

    Together with :func:`robots_txt_gate` (page verdicts),
    ``operators/sitemap`` (parsing the declared sitemaps) and
    ``operators/frontier`` (politeness rounds — crawl_delay is the
    seconds-per-round multiplier for a host's schedule) this closes
    the crawl-policy loop. Map-only over the host table (one row per
    host, ~10^8 at web scale — a sliver next to the page table): one
    Arrow-batched pandas UDF with a per-worker parse, no shuffle."""
    from pyspark.sql.functions import pandas_udf

    def policy(texts: pd.Series) -> pd.DataFrame:
        from karanta_ocr_spark.kernel.robots_mini import (
            crawl_delay,
            sitemap_urls,
        )

        delays = []
        maps = []
        for t in texts:
            delays.append(crawl_delay(t, agent))
            maps.append("|".join(sitemap_urls(t)))
        return pd.DataFrame({"crawl_delay": delays, "sitemaps": maps})

    pol = pandas_udf(
        policy, "crawl_delay double, sitemaps string"
    )(F.col(text_col))
    out = robots.withColumn("_p", pol)
    return out.select(
        F.col(host_col).alias("host"),
        F.col("_p.crawl_delay").alias("crawl_delay"),
        F.when(F.col("_p.sitemaps") == "", None)
        .otherwise(F.col("_p.sitemaps"))
        .alias("sitemaps"),
        F.when(
            F.col("_p.sitemaps") == "", F.lit(0)
        ).otherwise(
            F.size(F.split(F.col("_p.sitemaps"), r"\|")) 
        ).cast("bigint").alias("n_sitemaps"),
    )


#: Gopher's stop-word presence list (Rae et al. 2021, §A1.1: "contains
#: at least 2 of the following English words").
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The REST of Gopher's published quality rules (Rae et al. 2021
    A1.1) — the repetition family lives in
    :func:`gopher_repetition_stats`; this adds the shape rules:

    word count in [50, 100k], mean word length in [3, 10], ≥80% of
    words contain a letter, symbol-to-word ratio (``#`` and ``…``)
    ≤ 0.1, ≤90% of lines bullet-started, ≤30% ellipsis-terminated,
    and ≥2 of the 8 listed English stop words. Emits every signal
    plus the combined ``gopher_keep`` verdict.

    All Catalyst HOFs over the token/line arrays — map-only, one
    whole-stage-codegen projection, zero shuffle at any scale. The
    mean-word-length numerator is an INTEGER sum (order-independent),
    so the 6-dp rounding is engine-exact."""
    from karanta_ocr_spark.functions.text_analysis import WS

    col = F.col(text_col)
    toks = F.filter(F.split(F.trim(col), WS + "+"), lambda t: t != "")
    n_words = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_wl = F.when(
        n_words > 0, F.round(tok_chars / n_words, 6)
    )
    alpha = F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}")))
    frac_alpha = F.when(n_words > 0, F.round(alpha / n_words, 6))
    n_sym = (
        F.length(col) - F.length(F.regexp_replace(col, r"[#…]", ""))
    )
    sym_ratio = F.when(n_words > 0, F.round(n_sym / n_words, 6))
    lines = lines_expr(col)
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•‣▪]"))
    )
    ellip = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    )
    frac_bullet = F.when(n_lines > 0, F.round(bullet / n_lines, 6))
    frac_ellip = F.when(n_lines > 0, F.round(ellip / n_lines, 6))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_distinct(
            F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))
        )
    )
    keep = (
        n_words.between(50, 100000)
        & mean_wl.between(3.0, 10.0)
        & (frac_alpha >= 0.8)
        & (sym_ratio <= 0.1)
        & (F.coalesce(frac_bullet, F.lit(0.0)) <= 0.9)
        & (F.coalesce(frac_ellip, F.lit(0.0)) <= 0.3)
        & (n_stop >= 2)
    )
    return df.select(
        id_col,
        n_words.cast("bigint").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        sym_ratio.alias("symbol_word_ratio"),
        frac_bullet.alias("frac_bullet_lines"),
        frac_ellip.alias("frac_ellipsis_lines"),
        n_stop.cast("bigint").alias("n_stopwords_present"),
        F.coalesce(keep, F.lit(False)).alias("gopher_keep"),
    )
