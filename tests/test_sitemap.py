"""Sitemap parser tests: urlset entries, sitemapindex children,
priority default + bad values, loc-less drops, whitespace/multiline
tolerance, gz-free binary column, and composition into the
politeness scheduler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.sitemap import (
    parse_sitemap_entries,
    sitemap_frontier,
)

SM = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>
      https://a.example/page1
    </loc>
    <lastmod>2025-03-01</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/page2</loc><changefreq>daily</changefreq></url>
  <url><loc>https://a.example/page3</loc><priority>bogus</priority></url>
  <url><priority>0.9</priority></url>
</urlset>"""

IDX = """<sitemapindex>
  <sitemap><loc>https://a.example/sitemap-1.xml</loc>
           <lastmod>2025-01-15</lastmod></sitemap>
  <sitemap><loc>https://a.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def test_urlset_entries(spark):
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", SM)],
        "sitemap_url string, sitemap_xml string",
    )
    rows = {r["loc"]: r for r in parse_sitemap_entries(df).collect()}
    assert set(rows) == {
        "https://a.example/page1",
        "https://a.example/page2",
        "https://a.example/page3",
    }  # loc-less entry dropped
    assert rows["https://a.example/page1"]["lastmod"] == "2025-03-01"
    assert rows["https://a.example/page1"]["priority"] == 0.8
    assert rows["https://a.example/page2"]["changefreq"] == "daily"
    assert rows["https://a.example/page2"]["priority"] == 0.5  # default
    assert rows["https://a.example/page3"]["priority"] == 0.5  # bogus value
    assert all(r["kind"] == "url" for r in rows.values())


def test_sitemapindex_children(spark):
    df = spark.createDataFrame(
        [("https://a.example/sitemap.xml", IDX)],
        "sitemap_url string, sitemap_xml string",
    )
    rows = sorted(
        parse_sitemap_entries(df).collect(), key=lambda r: r["loc"]
    )
    assert [r["kind"] for r in rows] == ["sitemap", "sitemap"]
    assert rows[0]["lastmod"] == "2025-01-15" and rows[1]["lastmod"] is None


def test_binary_column_decodes(spark):
    df = spark.createDataFrame(
        [("https://a.example/s.xml", SM.encode())],
        "sitemap_url string, sitemap_xml binary",
    )
    assert parse_sitemap_entries(df).count() == 3


def test_frontier_composition_orders_by_priority(spark):
    xml = (
        "<urlset>"
        "<url><loc>https://h.example/low</loc><priority>0.1</priority></url>"
        "<url><loc>https://h.example/high</loc><priority>0.9</priority></url>"
        "<url><loc>https://h.example/mid</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("https://h.example/sitemap.xml", xml)],
        "sitemap_url string, sitemap_xml string",
    )
    sched = {
        r["url"]: r["fetch_round"]
        for r in sitemap_frontier(df, per_host=1).collect()
    }
    # priority desc: high (0.9) round 1, mid (default 0.5) round 2,
    # low (0.1) round 3 — one per round at per_host=1.
    assert sched == {
        "https://h.example/high": 1,
        "https://h.example/mid": 2,
        "https://h.example/low": 3,
    }
