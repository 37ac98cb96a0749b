"""WARC kernel + Spark source: roundtrip, truncation recovery,
hostile input, and the file→records→web_pages→extraction chain."""

from __future__ import annotations

import gzip

import pytest

from karanta_ocr_spark.kernel.warc_mini import (
    WarcError,
    build_warc,
    parse_warc,
)

PAGES = [
    ("https://a.example/1", "2025-01-01T00:00:00Z", b"<html><p>one page</p></html>"),
    ("https://a.example/2", "2025-01-02T12:30:00Z", b"<html>two &amp; x</html>"),
]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip(gz):
    recs = parse_warc(build_warc(PAGES, per_record_gzip=gz))
    assert [(r.url, r.date, r.body) for r in recs] == PAGES
    assert all(r.http_status == 200 and r.rec_type == "response" for r in recs)
    assert all(r.content_type.startswith("text/html") for r in recs)


def test_whole_file_gzip_of_plain_warc():
    plain = build_warc(PAGES, per_record_gzip=False)
    assert len(parse_warc(gzip.compress(plain))) == 2


def test_truncated_gzip_keeps_prefix_members():
    w = build_warc(PAGES)
    recs = parse_warc(w[: len(w) - 20])  # cut inside the final member
    assert recs and recs[0].body == PAGES[0][2]  # first record intact


def test_truncated_plain_keeps_parsed_records():
    plain = build_warc(PAGES, per_record_gzip=False)
    first_len = len(build_warc(PAGES[:1], per_record_gzip=False))
    recs = parse_warc(plain[: first_len + 40])
    assert recs and recs[0].body == PAGES[0][2]


def test_hostile_inputs_fail_typed():
    for bad in (b"garbage data here", b"\x1f\x8bnotgzip"):
        with pytest.raises(WarcError):
            parse_warc(bad)
    assert parse_warc(b"") == []  # empty file: no records, not an error


def test_non_response_records_surface():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"info body\r\n\r\n"
    )
    data = info + build_warc(PAGES[:1], per_record_gzip=False)
    recs = parse_warc(data)
    assert [r.rec_type for r in recs] == ["warcinfo", "response"]
    assert recs[0].http_status is None and recs[0].body == b"info body"


def test_warc_source_to_extraction(spark, tmp_path):
    """Files on disk → binaryFile scan → parse → web_pages →
    run_extraction: the full ingest chain produces the same text the
    direct web_pages path does."""
    from karanta_ocr_spark.pipeline import run_extraction
    from karanta_ocr_spark.sources.warc import (
        read_warc_files,
        warc_records_to_web_pages,
    )
    from karanta_ocr_spark.sources.web_pages import synthetic_web_pages

    web = synthetic_web_pages(spark, n_docs=24, seed=42)
    rows = web.collect()
    # Two segment files, as a crawl would ship.
    for half, name in ((rows[:12], "seg0"), (rows[12:], "seg1")):
        pages = [
            (r["url"], "2025-01-01T00:00:00Z", bytes(r["html"]))
            for r in half
            if r["html"] is not None
        ]
        (tmp_path / f"{name}.warc.gz").write_bytes(build_warc(pages))

    records = read_warc_files(spark, str(tmp_path / "*.warc.gz"))
    assert records.filter("rec_type = 'response'").count() == web.filter(
        "html is not null"
    ).count()
    via_warc = run_extraction(
        spark, warc_records_to_web_pages(records), num_partitions=4
    )
    direct = run_extraction(spark, web, num_partitions=4)
    a = {(r["url"], r["doc_id"], r["text"]) for r in via_warc.collect()}
    b = {(r["url"], r["doc_id"], r["text"]) for r in direct.collect()}
    assert a == b


def test_write_wet_roundtrip(spark, tmp_path):
    from karanta_ocr_spark.kernel.warc_mini import parse_warc
    from karanta_ocr_spark.sources.warc import write_wet

    rows = [
        ("https://a.example/1", "first extracted text"),
        ("https://a.example/2", "second text with unicode: Ge'ez ለ"),
        ("https://a.example/3", None),  # null text -> empty payload
    ]
    df = spark.createDataFrame(rows, "url string, text string").repartition(2)
    out = str(tmp_path / "wet")
    n = write_wet(df, out)
    assert n == 3
    import glob

    got = {}
    for p in sorted(glob.glob(out + "/seg-*.warc.wet.gz")):
        for r in parse_warc(open(p, "rb").read()):
            assert r.rec_type == "conversion"
            got[r.url] = r.body.decode("utf-8")
    assert got == {u: (t or "") for u, t in rows}


def test_write_wet_count_exact_over_stale_directory(spark, tmp_path):
    # Regression (r4 advice): seg files left by a PREVIOUS run into
    # the same directory — including the retired un-counted
    # seg-NNNNN.warc.wet.gz naming and partitions the current run
    # doesn't write — used to be silently counted in (or written
    # over but never tallied). write_wet must clean them up front so
    # the post-action listing is exact for THIS run.
    import glob
    import os

    from karanta_ocr_spark.sources.warc import write_wet

    out = tmp_path / "wet"
    out.mkdir()
    (out / "seg-00000.warc.wet.gz").write_bytes(b"old-naming leftover")
    (out / "seg-00099-n777.warc.wet.gz").write_bytes(b"stale partition")
    (out / ".seg-00001.tmp").write_bytes(b"crashed tmp")
    rows = [("https://a.example/1", "one"), ("https://a.example/2", "two")]
    df = spark.createDataFrame(rows, "url string, text string").repartition(2)
    n = write_wet(df, str(out))
    assert n == 2
    names = sorted(os.path.basename(p) for p in glob.glob(str(out / "*")))
    assert all(gz.startswith("seg-0000") and "-n1." in gz for gz in names)
    assert len(names) == 2


def test_negative_content_length_rejected():
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -40\r\n\r\n")
    with pytest.raises(WarcError, match="negative"):
        parse_warc(rec)
    # after a good record, a negative-length tail just stops the walk
    good = build_warc(PAGES[:1], per_record_gzip=False)
    assert len(parse_warc(good + rec)) == 1


def test_wet_read_back_as_documents(spark, tmp_path):
    from karanta_ocr_spark.sources.warc import (
        read_warc_files,
        wet_records_to_documents,
        write_wet,
    )

    rows = [
        ("https://a.example/1", "first extracted text"),
        ("https://a.example/2", "unicode text ለ"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = str(tmp_path / "wet2")
    write_wet(df, out)
    docs = wet_records_to_documents(read_warc_files(spark, out + "/*.warc.wet.gz"))
    got = {(r["url"], r["text"]) for r in docs.collect()}
    assert got == set(rows)
    assert docs.schema["warc_ts"].dataType.typeName() == "timestamp"


def test_warc_record_spans_tile_and_parse_standalone():
    from karanta_ocr_spark.kernel.warc_mini import warc_record_spans

    pages = [
        (f"https://d.example/{i}", "2025-01-01T00:00:00Z", b"<p>x</p>" * i)
        for i in range(1, 5)
    ]
    for gz in (True, False):
        blob = build_warc(pages, per_record_gzip=gz)
        spans = warc_record_spans(blob)
        assert len(spans) == 4
        assert spans[0][0] == 0
        assert sum(ln for _, ln in spans) == len(blob)  # spans tile
        for (off, ln), (url, _, html) in zip(spans, pages):
            recs = parse_warc(blob[off : off + ln])
            assert len(recs) == 1 and recs[0].url == url and recs[0].body == html


def test_surt_urlkey():
    from karanta_ocr_spark.kernel.warc_mini import surt_urlkey

    assert surt_urlkey("https://docs.example.org/doc/5") == "org,example,docs)/doc/5"
    assert surt_urlkey("http://EX.com") == "com,ex)/"
    assert surt_urlkey("https://u:p@host.net:8443/a?q=1#f") == "net,host)/a?q=1"
    assert surt_urlkey("not a url") == "not a url"


def test_warc_cdx_index_roundtrip(spark):
    from karanta_ocr_spark.sources.warc import warc_cdx_index

    pages = [
        (f"https://cdx.example/p/{i}", "2025-06-07T08:09:10Z", f"<b>{i}</b>".encode())
        for i in range(6)
    ]
    blob = build_warc(pages, per_record_gzip=True)
    df = spark.createDataFrame(
        [("synthetic://seg0", bytearray(blob))], "path string, content binary"
    )
    rows = sorted(warc_cdx_index(df).collect(), key=lambda r: r["offset"])
    assert [r["url"] for r in rows] == [u for u, _, _ in pages]
    assert rows[0]["urlkey"] == "example,cdx)/p/0"
    assert all(r["cdx_ts"] == "20250607080910" for r in rows)
    assert all(r["http_status"] == 200 and r["rec_type"] == "response" for r in rows)
    # offsets/lengths really address the gzip members: re-slice + parse
    for r in rows:
        recs = parse_warc(blob[r["offset"] : r["offset"] + r["length"]])
        assert len(recs) == 1 and recs[0].url == r["url"]


def test_write_wet_empty_input_returns_zero(spark, tmp_path):
    from karanta_ocr_spark.sources.warc import write_wet

    df = spark.createDataFrame([], "url string, text string")
    out = str(tmp_path / "wet_empty")
    assert write_wet(df, out) == 0  # no dir is ever created
