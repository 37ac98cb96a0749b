"""Bloom-filter incremental dedup: "is this document new vs an
earlier crawl?" without keeping the earlier crawl around.

At 100 TB the prior corpus is too big to anti-join against every
incremental batch (that join re-shuffles BOTH sides on every run).
The standard architecture — Bloom's original application, and the
already-seen module of web crawlers like Heritrix — is: fold the
prior corpus ONCE into an m-bit Bloom filter, then screen each new
batch against the filter map-side. A membership miss is DEFINITELY
new; a hit is seen-before up to the false-positive rate
p ≈ (1-e^{-kn/m})^k, which for dedup means a small, tunable fraction
of genuinely-new docs is conservatively dropped and NO duplicate ever
slips through.

Spark-first representation: the filter is a DataFrame of
``(word_idx: long, bits: long)`` — m bits packed 32 per row via
``bit_or`` aggregation — not a driver-side bitset. Building it is one
bounded shuffle (≤ m/32 groups regardless of corpus size, with
map-side partial ``bit_or``); screening is k broadcast hash joins of
the filter (m/32 rows × ~12 B: m = 2^28 bits ≈ 100 MiB, still
broadcastable) against the batch — NO batch-side shuffle at all, the
batch stays in its scan partitioning end to end. Beyond broadcast
size, bucket the filter on word_idx once and let the joins
sort-merge.

Determinism: the k probe positions come from md5 (bit-reproducible
across JVM/C/Python — the same engine-neutral choice as
``operators/dedup.lsh_bands``), so the DuckDB oracle can replay the
ENTIRE filter build + screen bit-for-bit, false positives included.

Reference parity: karanta-ocr dedups incremental work driver-side by
listing finished doc ids into a set (`karanta/pipeline.py:1300-1333`
workspace resume scan); the filter is that same "skip what an earlier
run already covered" semantic made sublinear in prior-corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _probe_pos(colname: str, i: int, num_bits: int, seed: int) -> Column:
    """Bloom probe position i for column *colname*: the first 60 bits
    (15 hex chars, so conv() never overflows a signed long) of
    md5("{seed}:{i}:" || value), mod num_bits."""
    return F.expr(
        f"cast(conv(substring(md5(concat('{seed}:{i}:', {colname})), 1, 15),"
        f" 16, 10) as bigint) % {num_bits}"
    )


def bloom_build(
    df: DataFrame,
    col: str = "text",
    num_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Fold ``df[col]`` into a Bloom filter table ``(word_idx,
    bits)``: every value sets its k md5-derived bit positions; bits
    pack 32-per-long via ``bit_or`` (32, not 64: the oracle twin
    replays the same masks, and DuckDB rejects the overflowing
    ``1 << 63``). Only words with at least one set
    bit appear (sparse representation; a missing word_idx means 32
    zero bits). One shuffle, ≤ num_bits/32 groups, partial-aggregated
    map-side."""
    pos = df.select(
        F.explode(
            F.array(*[_probe_pos(col, i, num_bits, seed) for i in range(k)])
        ).alias("_pos")
    )
    return pos.groupBy(
        (F.col("_pos") / 32).cast("bigint").alias("word_idx")
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(_pos % 32 as int))")).alias("bits")
    )


def bloom_screen(
    df: DataFrame,
    bloom: DataFrame,
    col: str = "text",
    num_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Append ``seen_before: boolean`` to *df*: true iff ALL k probe
    bits for ``df[col]`` are set in *bloom* (possibly-seen; false
    positives at the filter's design rate), false iff any bit is
    clear (DEFINITELY new — Bloom filters have no false negatives).

    ONE broadcast carries the whole filter: the sparse (word_idx,
    bits) table folds into a single-row ``map_from_entries`` map and
    cross-joins onto the batch, and every probe becomes a map-side
    ``try_element_at`` lookup (NULL = absent word = 32 zero bits).
    The batch is never shuffled, and — unlike the previous k renamed
    broadcast-join copies — there is exactly one broadcast job and
    one copy of the filter per executor, so a driver GC pause cannot
    serialize k barriers. k, num_bits, seed must match the build.

    Bit semantics are unchanged (same probe positions, same packed
    masks); the DuckDB oracle replay is identical."""
    bloom_row = F.broadcast(
        bloom.agg(
            F.map_from_entries(
                F.collect_list(F.struct("word_idx", "bits"))
            ).alias("_bloom_map")
        )
    )
    out = df.crossJoin(bloom_row)
    hits = []
    for i in range(k):
        out = out.withColumn(f"_p{i}", _probe_pos(col, i, num_bits, seed))
        word = F.expr(f"cast(_p{i} / 32 as bigint)")
        bits = F.try_element_at(F.col("_bloom_map"), word)
        hits.append(
            F.coalesce(
                bits.bitwiseAND(
                    F.expr(f"shiftleft(1L, cast(_p{i} % 32 as int))")
                )
                != 0,
                F.lit(False),
            )
        )
    seen = hits[0]
    for h in hits[1:]:
        seen = seen & h
    out = out.withColumn("seen_before", seen)
    return out.drop("_bloom_map", *[f"_p{i}" for i in range(k)])


def bloom_new_docs(
    batch: DataFrame,
    prior: DataFrame,
    col: str = "text",
    num_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """End-to-end incremental dedup: build the filter from *prior*,
    screen *batch*, return only the definitely-new rows."""
    bloom = bloom_build(prior, col, num_bits, k, seed)
    screened = bloom_screen(batch, bloom, col, num_bits, k, seed)
    return screened.filter(~F.col("seen_before")).drop("seen_before")
