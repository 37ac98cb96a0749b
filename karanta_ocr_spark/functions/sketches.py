"""Mergeable cardinality / frequency sketches, exact-spec and
engine-neutral — the corpus-profiling primitives a 100-TB pipeline
runs before committing to a shuffle strategy (how many distinct hosts?
which tokens are heavy hitters?) without a corpus-wide distinct.

Both sketches here are defined over md5 so every register value is
reproducible bit-for-bit in any engine (the same device as
``operators/bloom.py`` and the seeded-md5 ranks used throughout):

* ``hll_registers`` / ``hll_estimate`` — HyperLogLog (Flajolet et al.
  2007, AofA; the m = 2^b register / leading-zero-rank construction),
  with the standard small-range linear-counting correction. Spark's
  own ``approx_count_distinct`` is HLL++ behind an opaque binary —
  fine in production, but its registers can't be certified by an
  independent engine; this one's can, because the register table IS a
  DataFrame: ``(group, bucket, rank)`` rows.
* ``cms_counters`` / ``cms_lookup`` / ``cms_heavy_hitters`` —
  Count-Min (Cormode & Muthukrishnan 2005, J. Algorithms): depth×width
  counter grid, point estimate = min over rows, one-sided error
  (never underestimates; overestimate ≤ εN with prob 1−δ for
  w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

Scale shape: building either sketch is ONE groupBy over hashed keys
with map-side partial aggregation — the register/counter table is
m or d·w rows per group, orders of magnitude smaller than a distinct.
Merging sketches from two corpus increments is elementwise max (HLL)
or sum (CMS) — a tiny join, which is the whole point: the recurring
weekly-crawl cost is sketch-merge, not corpus-rescan.

Reference scope note: the reference has no sketch machinery; this is
part of the beyond-reference training-data suite (SURVEY.md §2
addenda).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

#: 32-bit hash from the first 8 md5 hex chars — unsigned, engine-neutral.
def _h32(col, salt: str = ""):
    c = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 10,
) -> DataFrame:
    """The HLL register table: one row per (group, bucket) with the
    max leading-zero rank observed. ``bucket`` comes from the first
    8 md5 hex chars mod m; ``rank`` is 1 + leading zeros of the next
    8 hex chars read as a 32-bit word (rank ∈ [1, 33]).

    Cardinality ceiling: the rank word is 32 bits, so estimates are
    reliable to roughly 10^8 distinct values; past that, hash
    saturation makes the sketch UNDERestimate (the classic-HLL
    large-range regime). For all-of-history counters expected to
    exceed ~10^8 per group, either apply the large-range correction
    ``-2^32 · ln(1 - E/2^32)`` to the returned estimate or widen the
    rank domain to 64 bits (more md5 hex chars) — at the cost of
    breaking byte-compatibility with previously persisted register
    state, which is why the 32-bit layout is kept as the default.

    This is the MERGEABLE form: registers of a corpus union are the
    elementwise max of the parts' registers (pytest-pinned).
    """
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    groups = list(group_cols or [])
    v = F.col(value_col)
    bucket = (_h32(v) % m).alias("bucket")
    # rank = leading zeros of the 32-bit word + 1 == 33 - bit_length,
    # computed exactly with integer log2 via comparison ladder-free
    # arithmetic: floor(log2(w)) = length of binary string - 1.
    w = F.conv(F.substring(F.md5(F.concat(F.lit("r:"), v.cast("string"))), 1, 8),
               16, 10).cast("long")
    bitlen = F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.conv(w.cast("string"), 10, 2)))
    rank = (F.lit(33) - bitlen).alias("_rank")
    rows = df.filter(v.isNotNull()).select(*groups, bucket, rank)
    return rows.groupBy(*groups, "bucket").agg(F.max("_rank").alias("rank"))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    b: int = 10,
) -> DataFrame:
    """Cardinality estimate from a register table: the Flajolet
    alpha_m * m^2 / sum(2^-rank) raw estimate with the linear-counting
    small-range correction (E <= 2.5m and empty registers present ->
    m * ln(m / empty)). Returns ``(group..., n_registers, estimate)``.
    """
    m = 1 << b
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    groups = list(group_cols or [])
    agg = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("rank"))).alias("_inv"),
    )
    zeros = F.lit(float(m)) - F.col("n_registers")
    raw = F.lit(alpha * m * m) / (F.col("_inv") + zeros)  # empty regs: 2^-0
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        *groups, "n_registers", F.round(corrected, 2).alias("estimate"))


def hll_merge(a: DataFrame, b_regs: DataFrame,
              group_cols: list[str] | None = None) -> DataFrame:
    """Merge two register tables (elementwise max) — the increment
    path: sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    groups = list(group_cols or [])
    return (
        a.unionByName(b_regs)
        .groupBy(*groups, "bucket")
        .agg(F.max("rank").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def cms_counters(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """The Count-Min counter grid as ``(row, cell, cnt)`` rows — at
    most depth*width of them. Row j hashes with salt ``"{j}:"``.
    One explode (depth rows per input) + one groupBy."""
    if depth < 1 or width < 2:
        raise ValueError("depth >= 1 and width >= 2 required")
    v = F.col(value_col)
    wgt = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.filter(v.isNotNull()).select(
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("row"),
                (_h32(v, salt=f"{j}:") % width).alias("cell"),
            )
            for j in range(depth)
        ])).alias("_rc"),
        wgt.alias("_w"),
    )
    return rows.groupBy(
        F.col("_rc.row").alias("row"), F.col("_rc.cell").alias("cell")
    ).agg(F.sum("_w").cast("long").alias("cnt"))


def cms_lookup(counters: DataFrame, probes: DataFrame, value_col: str,
               depth: int = 4, width: int = 256) -> DataFrame:
    """Point estimates for each probe value: min over the depth rows
    of the counter at that value's cell (missing cell -> 0). Join is
    depth rows per probe against the bounded counter grid (broadcast
    in practice)."""
    v = F.col(value_col)
    keyed = probes.select(
        value_col,
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     (_h32(v, salt=f"{j}:") % width).alias("cell"))
            for j in range(depth)
        ])).alias("_rc"),
    ).select(value_col, F.col("_rc.row").alias("row"),
             F.col("_rc.cell").alias("cell"))
    joined = keyed.join(F.broadcast(counters), on=["row", "cell"], how="left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("estimate"))


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    phi: float = 0.01,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Values whose CMS estimate >= phi * N (N = total observations).
    One-sided: every TRUE heavy hitter is returned (no false
    negatives — the CMS never underestimates); some near-misses may
    ride along (bounded false positives). Returns
    ``(value_col, estimate, n_total)`` sorted by estimate desc."""
    counters = cms_counters(df, value_col, depth=depth, width=width)
    probes = df.filter(F.col(value_col).isNotNull()).select(value_col).distinct()
    est = cms_lookup(counters, probes, value_col, depth=depth, width=width)
    total = df.filter(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("estimate") >= F.lit(phi) * F.col("n_total"))
        .orderBy(F.col("estimate").desc(), F.col(value_col).asc())
    )
