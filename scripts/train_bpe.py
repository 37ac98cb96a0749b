"""Train the committed char-level BPE merge fixture.

One-time, deterministic: pretokenize the sf0.001 ``documents`` table
with the shared GPT-2-style pretokenizer (``BPE_ISH_RE``, applied via
DuckDB so ``\\p{L}`` works — Python ``re`` lacks it), then run
standard BPE training (Sennrich et al. 2016: repeatedly merge the
most frequent adjacent symbol pair) over the pretoken multiset.
Tie-break is (count DESC, pair lexicographic ASC) so the merge list
is reproducible bit-for-bit from the same corpus.

Writes ``karanta_ocr_spark/fixtures/bpe_merges.txt`` — one merge per
line, ``left<TAB>right``, in rank order. The file is COMMITTED (the
encoder and the DuckDB oracle both read it); re-run this script only
to regenerate it deliberately.

Usage: python scripts/train_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from karanta_ocr_spark.functions.text_analysis import BPE_ISH_RE  # noqa: E402

N_MERGES_DEFAULT = 80


def pretokens(sf_dir: str) -> collections.Counter:
    import duckdb

    con = duckdb.connect()
    pat = BPE_ISH_RE.replace("'", "''")
    rows = con.sql(
        f"""SELECT w, count(*) AS n FROM (
                SELECT unnest(regexp_extract_all(text, '{pat}')) AS w
                FROM read_parquet('{sf_dir}/documents.parquet'))
            GROUP BY w ORDER BY w"""
    ).fetchall()
    return collections.Counter(dict(rows))


def train(words: collections.Counter, n_merges: int) -> list[tuple[str, str]]:
    # Symbol sequences per distinct pretoken, weighted by frequency.
    seqs: dict[str, list[str]] = {w: list(w) for w in words}
    for w in words:
        assert "\x01" not in w, "separator char must not occur in corpus"
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for w, syms in seqs.items():
            n = words[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else N_MERGES_DEFAULT
    words = pretokens(sf_dir)
    merges = train(words, n_merges)
    out = os.path.join(
        os.path.dirname(__file__), "..", "karanta_ocr_spark", "fixtures",
        "bpe_merges.txt",
    )
    with open(out, "w", encoding="utf-8") as f:
        for a, b in merges:
            f.write(f"{a}\t{b}\n")
    print(f"{len(words)} distinct pretokens -> {len(merges)} merges -> {out}")


if __name__ == "__main__":
    main()
