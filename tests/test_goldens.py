"""Committed golden fixtures (tests/goldens_v1.jsonl): the kernel's
output for the 96-doc seed-42 corpus, frozen at round 1. Any semantic
drift — Python/unicodedata version changes, refactors, 'harmless'
cleanups — fails here with the exact url. Regenerate ONLY for an
intentional semantics change, and say so in the commit message."""

import hashlib
import json
import os

from karanta_ocr_spark.kernel.assemble import assemble_document
from karanta_ocr_spark.kernel.extract import extract_document

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens_v1.jsonl")


def test_kernel_matches_committed_goldens():
    from karanta_ocr_spark.fixtures.gen import generate_web_pages

    rows = {r["url"]: r for r in generate_web_pages(96, 42)}
    n_checked = 0
    with open(GOLDENS, encoding="utf-8") as f:
        for line in f:
            g = json.loads(line)
            r = rows[g["url"]]
            doc = assemble_document(r["url"], extract_document(r["url"], r["html"]))
            if g.get("dropped"):
                assert doc is None, g["url"]
                continue
            assert doc is not None, g["url"]
            assert doc.doc_id == g["doc_id"], g["url"]
            assert hashlib.sha256(doc.text.encode()).hexdigest() == g["text_sha"], g["url"]
            assert doc.n_pages == g["n_pages"] and doc.n_failed == g["n_failed"], g["url"]
            assert [list(s) for s in doc.spans] == g["spans"], g["url"]
            n_checked += 1
    assert n_checked >= 90
