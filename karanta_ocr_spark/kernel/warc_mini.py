"""Minimal WARC reader/writer — pure stdlib, like the sibling
``*_mini`` kernels.

WARC (ISO 28500, the public Common Crawl container) is the format a
web-scale extraction pipeline actually ingests; this module parses
crawl files into ``(url, date, http_status, content_type, body)``
records and writes spec-shaped files for fixtures.

Layout understood/emitted::

    [gzip member per record — the Common Crawl convention — or plain]
    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Date: 2025-01-01T00:00:00Z\r\n
    WARC-Target-URI: https://…\r\n
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: N\r\n
    \r\n
    HTTP/1.1 200 OK\r\n …HTTP headers… \r\n\r\n <body bytes>
    \r\n\r\n

Reader scope (honest): ``response`` records yield parsed HTTP
status/headers/body; other record types (warcinfo, request,
metadata…) are surfaced with ``http_status=None`` and the raw block
as body so callers can count/skip them. Truncated files keep the
records already parsed (crawl cut-offs are data). Per-record gzip,
whole-file gzip, and uncompressed input all parse — ``gzip`` module
multi-member semantics give the first two for free.
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass

_MAX_DECOMPRESSED = 1 << 30  # 1 GiB hostile-input bound per file


class WarcError(ValueError):
    """Unparseable WARC payload."""


@dataclass
class WarcRecord:
    rec_type: str
    url: str | None
    date: str | None  # raw WARC-Date string (ISO 8601)
    http_status: int | None
    content_type: str | None  # HTTP Content-Type (response records)
    body: bytes  # HTTP body for responses, raw block otherwise


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response payload → (status, content_type, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4 :]
    status_line = head.split(b"\r\n", 1)[0].split()
    status = None
    if len(status_line) >= 2 and status_line[1].isdigit():
        status = int(status_line[1])
    hdrs = _parse_headers(head)
    clen = hdrs.get("content-length")
    if clen is not None and clen.isdigit():
        body = body[: int(clen)]
    return status, hdrs.get("content-type"), body


def parse_warc(data: bytes, max_records: int = 100_000) -> list[WarcRecord]:
    """Parse WARC bytes (gzipped — per-record or whole-file — or
    plain) into records. Raises :class:`WarcError` only when the very
    first record is unparseable; later damage keeps what was read."""
    if data[:2] == b"\x1f\x8b":
        # Member-by-member inflate via zlib.decompressobj: unlike
        # gzip.decompress/GzipFile, a TRUNCATED final member (crawl
        # cut-off) yields its partial bytes instead of discarding
        # every member before it.
        import zlib

        out = bytearray()
        buf = data
        while buf[:2] == b"\x1f\x8b" and len(out) < _MAX_DECOMPRESSED:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                out += d.decompress(buf, _MAX_DECOMPRESSED - len(out))
            except zlib.error as e:
                if not out:
                    raise WarcError(f"bad gzip envelope: {e}") from e
                break
            if not d.eof:
                break  # truncated member: keep its partial bytes
            buf = d.unused_data
        if not out:
            raise WarcError("empty/unreadable gzip envelope")
        data = bytes(out)
    records: list[WarcRecord] = []
    i, n = 0, len(data)
    while i < n and len(records) < max_records:
        # Skip inter-record CRLFs.
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            if records:
                break  # damaged tail: keep what we have
            raise WarcError("missing WARC/ version line")
        sep = data.find(b"\r\n\r\n", i)
        if sep < 0:
            break
        hdrs = _parse_headers(data[i:sep])
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            if records:
                break
            raise WarcError("record without Content-Length")
        if clen < 0:
            # A negative length would move the cursor BACKWARD and let
            # a crafted file re-parse the same bytes max_records times.
            if records:
                break
            raise WarcError("negative Content-Length")
        start = sep + 4
        payload = data[start : start + clen]  # clamped if truncated
        rec_type = hdrs.get("warc-type", "unknown")
        if rec_type == "response":
            status, ctype, body = _parse_http(payload)
        else:
            status, ctype, body = None, None, payload
        records.append(
            WarcRecord(
                rec_type=rec_type,
                url=hdrs.get("warc-target-uri"),
                date=hdrs.get("warc-date"),
                http_status=status,
                content_type=ctype,
                body=body,
            )
        )
        i = start + clen
    return records


def build_wet(pages: list[tuple[str, str, str]]) -> bytes:
    """Assemble ``(url, iso_date, extracted_text)`` into a WET file —
    the Common Crawl *conversion* sidecar format (one ``conversion``
    record per page, text/plain payload, per-record gzip). The
    :func:`parse_warc` reader surfaces these as
    ``rec_type='conversion'`` records with the text as ``body``."""
    out = bytearray()
    for idx, (url, date, text) in enumerate(pages):
        body = text.encode("utf-8")
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0001-{idx:012d}>\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"Content-Type: text/plain\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
            + body
            + b"\r\n\r\n"
        )
        out += gzip.compress(bytes(rec), mtime=0)
    return bytes(out)


def build_warc(
    pages: list[tuple[str, str, bytes]],
    per_record_gzip: bool = True,
    content_type: str = "text/html; charset=UTF-8",
) -> bytes:
    """Assemble ``(url, iso_date, html_bytes)`` pages into a WARC file
    of ``response`` records (per-record gzip members by default — the
    Common Crawl convention)."""
    out = bytearray()
    for idx, (url, date, html) in enumerate(pages):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode()
            + b"\r\nContent-Length: "
            + str(len(html)).encode()
            + b"\r\n\r\n"
            + html
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{idx:012d}>\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + f"WARC-Target-URI: {url}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
            + http
            + b"\r\n\r\n"
        )
        if per_record_gzip:
            out += gzip.compress(bytes(rec), mtime=0)
        else:
            out += rec
    return bytes(out)


def warc_record_spans(data: bytes, max_records: int = 100_000) -> list[tuple[int, int]]:
    """Byte spans ``(offset, length)`` of each top-level record unit
    in the ORIGINAL file bytes — the primitive behind a CDX-style URL
    index (the Common Crawl index stores exactly these spans so a
    reader can range-request one record instead of scanning a 1 GB
    segment).

    Per-record-gzip files: one span per gzip member (the CC layout —
    a member holds one record, and the span is what a ranged GET +
    gunzip needs). Plain files: one span per record, ending where the
    next record begins (so spans tile the file after any leading
    CRLFs). Whole-file-gzip input is indexable only as one unit and
    returns a single file-wide span."""
    spans: list[tuple[int, int]] = []
    if data[:2] == b"\x1f\x8b":
        import zlib

        pos = 0
        buf = data
        while buf[:2] == b"\x1f\x8b" and len(spans) < max_records:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                d.decompress(buf, _MAX_DECOMPRESSED)
            except zlib.error:
                break
            if not d.eof:
                # truncated final member (or whole-file gzip, which has
                # exactly one giant member): span covers the rest
                spans.append((pos, len(data) - pos))
                return spans
            consumed = len(buf) - len(d.unused_data)
            spans.append((pos, consumed))
            pos += consumed
            buf = d.unused_data
        return spans
    i, n = 0, len(data)
    while i < n and len(spans) < max_records:
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n or not data.startswith(b"WARC/", i):
            break
        sep = data.find(b"\r\n\r\n", i)
        if sep < 0:
            break
        hdrs = _parse_headers(data[i:sep])
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            break
        if clen < 0:
            break
        end = sep + 4 + clen
        # include the record's trailing CRLF block up to the next
        # record (or EOF) so spans tile the file
        j = end
        while j < n and data[j : j + 2] == b"\r\n":
            j += 2
        spans.append((i, j - i))
        i = j
    return spans


def surt_urlkey(url: str) -> str:
    """SURT-style CDX url key: reversed lowercase host labels joined
    by commas, then ``)`` and the path+query (``org,example,docs)/a``)
    — the Common Crawl index key shape. Non-URL strings come back
    lowercased unchanged."""
    import re as _re

    m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)([^#]*)", url)
    if not m:
        return url.lower()
    host = m.group(1).lower()
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    if ":" in host:
        host = host.rsplit(":", 1)[0]
    path = m.group(2) or "/"
    return ",".join(reversed(host.split("."))) + ")" + path
