"""Sitemap ingestion — the OTHER half of frontier seeding.

A polite crawler discovers URLs two ways: links found on fetched
pages (``operators/webgraph.extract_links``) and the site-declared
sitemaps of the sitemaps.org protocol (``<urlset>`` of ``<url>``
entries with ``loc``/``lastmod``/``changefreq``/``priority``, or a
``<sitemapindex>`` of child sitemaps). Site-declared priority and
lastmod are exactly the signals the politeness scheduler
(``operators/frontier.schedule_frontier``) wants for ordering a
host's fetch queue.

Spark-first: sitemap XML is regular enough that the entry scan is a
pure Catalyst ``regexp_extract_all`` over ``<url>``/``<sitemap>``
blocks plus per-block group extraction — map-only, zero Python, zero
shuffle, and DuckDB-replayable (RE2-safe: ``(?is)`` + explicit
``[ \\t\\n\\r]`` whitespace classes, no lookarounds; both engines
share leftmost-first non-greedy semantics here). Malformed blocks
(no ``<loc>``) drop out via the non-empty filter. At 100 TB the
sitemap table is a sliver of the crawl, but the same map-only shape
means the parse rides along in the page-scan stage regardless.

Reference parity: karanta-ocr has no crawler (SURVEY §2.1 S5 is out
of engine scope); this seeds the frontier operators that stand in
for that acquisition layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: One <url>…</url> (urlset entry) or <sitemap>…</sitemap> (index
#: entry) block, dot-matches-newline, case-insensitive, non-greedy.
URL_BLOCK_RE = r"(?is)<url[ \t\n\r>].*?</url[ \t\n\r]*>"
INDEX_BLOCK_RE = r"(?is)<sitemap[ \t\n\r>].*?</sitemap[ \t\n\r]*>"

_LOC_RE = r"(?is)<loc[ \t\n\r]*>[ \t\n\r]*([^<]*?)[ \t\n\r]*</loc"
_LASTMOD_RE = r"(?is)<lastmod[ \t\n\r]*>[ \t\n\r]*([^<]*?)[ \t\n\r]*</lastmod"
_PRIORITY_RE = r"(?is)<priority[ \t\n\r]*>[ \t\n\r]*([^<]*?)[ \t\n\r]*</priority"
_CHANGEFREQ_RE = (
    r"(?is)<changefreq[ \t\n\r]*>[ \t\n\r]*([^<]*?)[ \t\n\r]*</changefreq"
)


def _entries(xml: Column, block_re: str, kind: str) -> Column:
    blocks = F.regexp_extract_all(xml, F.lit(block_re), F.lit(0))
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.lit(kind).alias("kind"),
            F.regexp_extract(b, _LOC_RE, 1).alias("loc"),
            F.regexp_extract(b, _LASTMOD_RE, 1).alias("lastmod"),
            F.regexp_extract(b, _CHANGEFREQ_RE, 1).alias("changefreq"),
            F.regexp_extract(b, _PRIORITY_RE, 1).alias("priority_raw"),
        ),
    )


def parse_sitemap_entries(
    df: DataFrame, xml_col: str = "sitemap_xml", src_col: str = "sitemap_url"
) -> DataFrame:
    """Explode every sitemap document into its entries.

    Returns ``(sitemap_url, kind, loc, lastmod, changefreq,
    priority)`` — ``kind`` is ``'url'`` (fetchable page) or
    ``'sitemap'`` (index child to be fetched and parsed in the next
    crawl round). ``priority`` is the protocol's 0.0–1.0 double,
    defaulted to 0.5 exactly as sitemaps.org specifies; unparsable
    values also fall back to 0.5. Entries without a ``<loc>`` are
    dropped."""
    xml = F.col(xml_col)
    if dict(df.dtypes)[xml_col] == "binary":
        xml = F.decode(xml, "UTF-8")
    all_entries = F.concat(
        _entries(xml, URL_BLOCK_RE, "url"),
        _entries(xml, INDEX_BLOCK_RE, "sitemap"),
    )
    out = df.select(
        F.col(src_col).alias("sitemap_url"),
        F.explode(all_entries).alias("e"),
    ).filter(F.col("e.loc") != "")
    prio = F.col("e.priority_raw").try_cast("double")
    return out.select(
        "sitemap_url",
        F.col("e.kind").alias("kind"),
        F.col("e.loc").alias("loc"),
        F.when(F.col("e.lastmod") == "", None)
        .otherwise(F.col("e.lastmod"))
        .alias("lastmod"),
        F.when(F.col("e.changefreq") == "", None)
        .otherwise(F.col("e.changefreq"))
        .alias("changefreq"),
        F.round(F.coalesce(prio, F.lit(0.5)), 6).alias("priority"),
    )


def sitemap_frontier(
    sitemaps: DataFrame,
    per_host: int = 2,
    xml_col: str = "sitemap_xml",
    src_col: str = "sitemap_url",
    **schedule_kwargs,
) -> DataFrame:
    """Parse sitemap documents and feed the page entries straight
    into the politeness scheduler, ordered by site-declared priority
    (index children are frontier work of a different kind and are
    excluded here)."""
    from karanta_ocr_spark.operators.frontier import schedule_frontier

    urls = parse_sitemap_entries(sitemaps, xml_col, src_col).filter(
        F.col("kind") == "url"
    )
    return schedule_frontier(
        urls.select(F.col("loc").alias("url"), "priority"),
        url_col="url",
        priority_col="priority",
        per_host=per_host,
        **schedule_kwargs,
    )
