"""Web-link-graph operators: extraction/resolution forms, PageRank
invariants, anchor aggregation."""

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.webgraph import (
    anchor_texts,
    extract_links,
    host_link_graph,
    pagerank,
    resolve_href,
)


def _links(spark, rows):
    d = spark.createDataFrame(rows, "url string, html string")
    return extract_links(d)


def test_extract_links_forms(spark):
    out = _links(
        spark,
        [(
            "https://a.example.org/dir/page.html",
            '<a href="https://b.example.org/x">abs</a>'
            "<a href='/root'>rootrel</a>"
            "<a href=//c.example.org/p>protorel</a>"
            '<a href="sub/../other.html">dots</a>'
            '<a href="./here.html">dotslash</a>'
            '<a href="mailto:x@example.org">mail</a>'
            '<a href="javascript:void(0)">js</a>'
            '<a href="#frag">frag</a>'
            '<a href="plain.html#sec">fragmixed</a>',
        )],
    ).collect()
    got = {r["anchor"]: r["link_url"] for r in out}
    assert got == {
        "abs": "https://b.example.org/x",
        "rootrel": "https://a.example.org/root",
        "protorel": "https://c.example.org/p",
        "dots": "https://a.example.org/dir/other.html",
        "dotslash": "https://a.example.org/dir/here.html",
        "fragmixed": "https://a.example.org/dir/plain.html",
    }  # mail/js/frag dropped


def test_extract_links_binary_html_and_dupes(spark):
    d = spark.createDataFrame(
        [("https://a.example.org/", '<a href="/x">one</a><a href="/x">one</a>')],
        "url string, html string",
    ).select("url", F.encode("html", "UTF-8").alias("html"))
    out = extract_links(d).collect()
    assert len(out) == 2  # duplicates preserved (they are edge weight)
    assert all(r["link_url"] == "https://a.example.org/x" for r in out)


def test_resolve_href_origin_only_base(spark):
    d = spark.createDataFrame([("https://a.example.org", "rel.html")], "b string, h string")
    got = d.select(resolve_href(F.col("b"), F.col("h")).alias("r")).first()["r"]
    assert got == "https://a.example.org/rel.html"


def test_host_graph_drops_self_loops(spark):
    links = _links(
        spark,
        [(
            "https://a.example.org/",
            '<a href="/nav">self</a><a href="https://b.example.org/">out</a>',
        )],
    )
    g = {(r["src_host"], r["dst_host"]): r["weight"] for r in host_link_graph(links).collect()}
    assert g == {("a.example.org", "b.example.org"): 1}
    g2 = host_link_graph(links, keep_self_loops=True).count()
    assert g2 == 2


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src_host string, dst_host string, weight long")


def test_pagerank_sums_to_one_with_dangling(spark):
    # b is a sink (no out-edges): its mass must be redistributed.
    e = _edges(spark, [("a", "b", 1), ("c", "a", 1), ("a", "c", 1)])
    pr = pagerank(e, iters=5).collect()
    total = sum(r["rank"] for r in pr)
    assert total == pytest.approx(1.0, abs=1e-9)
    ranks = {r["id"]: r["rank"] for r in pr}
    assert ranks["a"] > ranks["b"]  # a has two in-edges incl. from c


def test_pagerank_symmetric_cycle_is_uniform(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    pr = {r["id"]: r["rank"] for r in pagerank(e, iters=10).collect()}
    for v in pr.values():
        assert v == pytest.approx(1.0 / 3.0, abs=1e-12)


def test_pagerank_weighted_vs_duplicated_edges(spark):
    # weight=2 must equal two parallel unit edges.
    w = pagerank(_edges(spark, [("a", "b", 2), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]), iters=4)
    d = pagerank(
        spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")],
            "src_host string, dst_host string",
        ).groupBy("src_host", "dst_host").agg(F.count(F.lit(1)).alias("weight")),
        iters=4,
    )
    wr = {r["id"]: r["rank"] for r in w.collect()}
    dr = {r["id"]: r["rank"] for r in d.collect()}
    for k in wr:
        assert wr[k] == pytest.approx(dr[k], abs=1e-12)


def test_pagerank_partition_invariance(spark):
    e = _edges(spark, [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "d", 1)])
    r1 = {r["id"]: round(r["rank"], 9) for r in pagerank(e, iters=3).collect()}
    r2 = {r["id"]: round(r["rank"], 9) for r in pagerank(e.repartition(7), iters=3).collect()}
    assert r1 == r2


def test_anchor_texts_argmax_and_hosts(spark):
    links = spark.createDataFrame(
        [
            ("https://a.example.org/1", "https://t.example.org/x", "buy now"),
            ("https://a.example.org/2", "https://t.example.org/x", "site"),
            ("https://b.example.org/1", "https://t.example.org/x", "site"),
            ("https://b.example.org/2", "https://t.example.org/y", ""),
        ],
        "url string, link_url string, anchor string",
    )
    out = {r["link_url"]: r for r in anchor_texts(links).collect()}
    x = out["https://t.example.org/x"]
    assert x["n_links"] == 3 and x["n_src_hosts"] == 2
    assert x["top_anchor"] == "site" and x["top_anchor_count"] == 2
    y = out["https://t.example.org/y"]
    assert y["top_anchor"] == "(none)"  # empty anchor sentinel
    assert anchor_texts(links, min_links=2).count() == 1
