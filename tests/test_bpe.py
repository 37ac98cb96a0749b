"""Merge-aware BPE tests: pinned string→token-count pairs over the
committed fixture merges, the batch-vs-one-at-a-time equivalence the
DuckDB oracle relies on, and the Spark operator end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from karanta_ocr_spark.functions.bpe import (
    BpeEncoder,
    bpe_token_count_merged,
    get_encoder,
    load_merges,
)


def one_at_a_time_count(word: str, merges: list[tuple[str, str]]) -> int:
    """The DuckDB oracle's algorithm: merge ONE leftmost occurrence of
    the best-ranked pair per step."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pos = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pos = r, i
        if best_rank is None:
            break
        i = best_pos
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return len(syms)


def test_fixture_merges_well_formed():
    """Every merge's components are single chars or products of
    EARLIER merges — the property that makes batch and one-at-a-time
    merging provably equivalent (functions/bpe.py docstring)."""
    merges = load_merges()
    assert len(merges) >= 40
    known = set()
    for a, b in merges:
        assert len(a) == 1 or a in known, f"ill-formed left {a!r}"
        assert len(b) == 1 or b in known, f"ill-formed right {b!r}"
        known.add(a + b)
    # unique ranks by construction (list positions); pairs unique too
    assert len(set(merges)) == len(merges)


def test_pinned_token_counts():
    enc = get_encoder()
    merges = load_merges()
    # Chars with no merges → one token per char; full words in the
    # training corpus merge far below their length.
    for w in ["the", " the", "merge", " stream", "zzz", "a"]:
        n = enc.count(w)
        assert 1 <= n <= len(w)
        assert n == one_at_a_time_count(w, merges), w
    assert enc.count("") == 0
    # Deterministic pin against the committed fixture: these values
    # change ONLY if scripts/train_bpe.py regenerates the merges.
    pinned = {w: one_at_a_time_count(w, merges)
              for w in ["the", " the", " stream", "query"]}
    assert {w: enc.count(w) for w in pinned} == pinned


def test_batch_equals_one_at_a_time_on_random_strings():
    import random

    merges = load_merges()
    enc = BpeEncoder(merges)
    alphabet = sorted({c for pair in merges for c in "".join(pair)})
    rng = random.Random(42)
    for _ in range(300):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        assert enc.count(w) == one_at_a_time_count(w, merges), w


def test_overlapping_pair_leftmost_first():
    # 'aaa' with merge (a,a): leftmost-first gives [aa, a] → 2 tokens
    # in both algorithms (the case that forced pinning leftmost).
    merges = [("a", "a")]
    enc = BpeEncoder(merges)
    assert enc.count("aaa") == 2 == one_at_a_time_count("aaa", merges)
    assert enc.count("aaaa") == 2  # [aa, aa]
    assert enc.count("aaaaa") == 3 == one_at_a_time_count("aaaaa", merges)


def test_spark_operator_counts(spark):
    df = spark.createDataFrame(
        [(1, "the stream value"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            bpe_token_count_merged(F.coalesce(F.col("text"), F.lit(""))).alias("n"),
        ).collect()
    }
    enc = get_encoder()
    expect = enc.count("the") + enc.count(" stream") + enc.count(" value")
    assert out[1] == expect
    assert out[2] == 0 and out[3] == 0
    # merged counts are never more than the char count, never less
    # than the pretoken count
    assert 3 <= out[1] <= len("the stream value")
