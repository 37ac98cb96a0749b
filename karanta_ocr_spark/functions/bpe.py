"""Merge-aware BPE token counting (judge task #3).

The reference counts tokens with a full learned tokenizer (HF
``AutoTokenizer`` in ``karanta/utils.py``); this module implements the
same merge-aware semantics from scratch: a char-level BPE encoder
(Sennrich et al. 2016 / the released GPT-2 ``bpe()`` algorithm) over
the committed corpus-trained merge fixture
``fixtures/bpe_merges.txt`` (produced by ``scripts/train_bpe.py``,
deterministic). The regex pretokenizer ``BPE_ISH_RE`` remains the
documented no-merges fallback (``bpe_ish_token_count``).

Plan shape at 100 TB: pretokenization stays JVM-side
(``regexp_extract_all`` inside codegen); only the merge loop crosses
to Python, as ONE Arrow-batched pandas UDF over the pretoken arrays,
with a worker-singleton encoder and an ``lru_cache`` over pretokens —
web text repeats pretokens heavily (Zipf), so per-row cost converges
to a dict lookup, exactly like the released GPT-2 encoder's cache.
Zero shuffle, no driver participation.

Determinism / oracle: ranks are unique and every merge's components
exist before any merge that consumes them (true of any trained merge
list), so merging ALL leftmost-first non-overlapping occurrences of
the best pair per iteration (this encoder, = GPT-2) and merging ONE
leftmost best-pair occurrence per step (the DuckDB oracle's recursive
CTE, ``oracle_sql()['bpe_token_stats']``) provably reach the same
final segmentation: a newly created pair can only be consumed by a
LATER-ranked merge, so pending occurrences of the current best pair
stay the best until exhausted. The property is additionally pinned by
``tests/test_html_fast_tokenizer.py``-style parity tests in
``tests/test_bpe.py``.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, functions as F

from karanta_ocr_spark.functions.text_analysis import BPE_ISH_RE

MERGES_PATH = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "bpe_merges.txt"
)


def load_merges(path: str | None = None) -> list[tuple[str, str]]:
    with open(path or MERGES_PATH, encoding="utf-8") as f:
        return [tuple(line.rstrip("\n").split("\t", 1)) for line in f if line.strip("\n")]


class BpeEncoder:
    """Char-level BPE over a rank-ordered merge list."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks: dict[tuple[str, str], int] = {
            pair: i for i, pair in enumerate(merges)
        }
        # lru_cache is per-instance so two encoders with different
        # merge tables never share entries.
        self.encode = lru_cache(maxsize=1 << 16)(self._encode)

    def _encode(self, word: str) -> tuple[str, ...]:
        syms = list(word)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            a, b = self.merges[best]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return tuple(syms)

    def count(self, word: str) -> int:
        return len(self.encode(word))


_ENCODER: BpeEncoder | None = None


def get_encoder() -> BpeEncoder:
    """Worker-singleton encoder over the committed fixture."""
    global _ENCODER
    if _ENCODER is None:
        _ENCODER = BpeEncoder(load_merges())
    return _ENCODER


def pretokenize(col: Column) -> Column:
    """JVM-side GPT-2-style pretokenization (array of pretokens)."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_RE), F.lit(0))


def bpe_token_count_merged(col: Column) -> Column:
    """Merge-aware BPE token count of a text column: JVM pretokenize →
    one Arrow crossing for the cached merge loop."""
    from pyspark.sql.functions import pandas_udf

    def _count(pts: pd.Series) -> pd.Series:
        enc = get_encoder()
        return pts.apply(
            lambda arr: sum(enc.count(w) for w in arr) if arr is not None else 0
        )

    return pandas_udf(_count, "long")(pretokenize(col))
