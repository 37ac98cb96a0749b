"""Sampling + allocation operators (reference §2.6: O7/O8/O9, A3, A9).

All deterministic and distributed; the only driver-side step is the
integer largest-remainder fixup, mirroring the reference's own
driver-side fixup (``karanta/data/create_training_docs_azure.py:44-91``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def systematic_sample(
    df: DataFrame, stride: int, phase: int = 0, key_col: str = "doc_id"
) -> DataFrame:
    """O7: interval sampling — keep rows where (key - phase) ≡ 0 mod
    stride (reference stride+random-phase page sampling,
    ``karanta/data/create_training_docs_azure.py:11-41``; phase passed
    explicitly for determinism)."""
    return df.filter(F.pmod(F.col(key_col) - phase, F.lit(stride)) == 0)


def _seeded_rank_key(seed: int, order_col: str, rank: str):
    """Deterministic per-row rank key. ``xxhash64`` (production,
    cheapest) or ``md5`` of ``"seed:id"`` — the same engine-neutral
    construction the dedup/mix operators use, so a DuckDB oracle can
    replay the sample row-for-row."""
    if rank == "xxhash64":
        return F.xxhash64(F.lit(seed), F.col(order_col))
    if rank == "md5":
        return F.md5(
            F.concat_ws(":", F.lit(str(seed)), F.col(order_col).cast("string"))
        )
    raise ValueError(f"unknown rank: {rank!r}")


def seeded_sample_per_group(
    df: DataFrame, group_col: str, k: int, seed: int = 42,
    order_col: str = "doc_id", rank: str = "xxhash64",
) -> DataFrame:
    """O9: k rows per group, chosen by a seeded deterministic hash
    rank (reference random page sample,
    ``karanta/data/create_batch_data_prompts.py:166-169`` — theirs is
    unseeded; we rank by hash(seed, key) so reruns and partition
    layouts can't change the choice). ``rank='md5'`` makes the choice
    reproducible in the DuckDB oracle."""
    w = Window.partitionBy(group_col).orderBy(
        _seeded_rank_key(seed, order_col, rank), F.col(order_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def proportional_allocation(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_budget: int,
    min_per_group: int = 0,
) -> DataFrame:
    """A9: split an integer budget across groups proportionally to
    summed weights, exact-integer via largest-remainder (Hamilton)
    apportionment — reference
    ``karanta/data/create_training_docs_azure.py:44-91``.

    Group sums compute distributed (map-side partial agg); the
    remainder fixup — floor each share, then grant +1 to the largest
    remainders — runs DRIVER-SIDE on the collected one-row-per-group
    totals, the same shape the reference uses. The r2 formulation
    ranked remainders with an unpartitioned ``Window.orderBy``, which
    funnels every group through one task: harmless at folder-like
    cardinalities but a single-task bottleneck at per-domain
    granularity (10^7 groups). The driver fixup is O(G log G) local
    work on (key, int, float) triples — ~100 MB even at 10^7 groups —
    and keeps the cluster out of a global sort entirely; beyond that,
    shard the rank (compute per-shard allocations on shard subtotals).

    Floats follow the exact expression shape of the SQL oracle
    (``(w / gw) * eff`` in float64, remainder ties broken by group
    key ascending), so results are bit-reproducible across engines.

    ``min_per_group`` is granted to every group off the top and the
    REST of the budget is apportioned, so ``sum(allocation) ==
    total_budget`` exactly whenever ``total_budget >= n_groups *
    min_per_group`` (below that the minimum itself overshoots — the
    documented degenerate case).
    """
    import math

    spark = df.sparkSession
    totals = [
        (r[0], r[1])
        for r in df.groupBy(group_col).agg(F.sum(weight_col).alias("w")).collect()
    ]
    out_schema = (
        df.select(F.col(group_col)).schema.add("total_weight", "long").add(
            "allocation", "long"
        )
    )
    if not totals:
        return spark.createDataFrame([], out_schema)
    totals = [(g, w or 0) for g, w in totals]  # all-NULL group → weight 0
    gw = sum(w for _, w in totals)
    eff = max(total_budget - min_per_group * len(totals), 0)
    rows = []
    for g, w in totals:
        # Zero grand total (all-empty corpus slice): apportion evenly
        # instead of dividing by zero — the budget identity
        # sum(allocation) == total_budget still holds.
        raw = (w / gw) * eff if gw > 0 else eff / len(totals)
        fl = math.floor(raw)
        rows.append((g, w, fl, raw - fl))
    leftover = eff - sum(fl for _, _, fl, _ in rows)
    ranked = sorted(range(len(rows)), key=lambda i: (-rows[i][3], rows[i][0]))
    bonus = set(ranked[: int(leftover)])
    return spark.createDataFrame(
        [
            (g, int(w), int(min_per_group + fl + (1 if i in bonus else 0)))
            for i, (g, w, fl, _) in enumerate(rows)
        ],
        out_schema,
    )


def two_phase_coverage_sample(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    total_budget: int,
    base_per_group: int = 1,
    id_col: str = "doc_id",
    seed: int = 42,
    rank: str = "xxhash64",
) -> DataFrame:
    """O8: coverage + proportional two-phase sampling (reference
    ``create_training_docs_azure.py:94-173``): phase 1 guarantees
    ``base_per_group`` rows from every group; phase 2 fills the rest
    of the budget proportionally to group weight. Returns sampled
    rows. ``rank='md5'`` makes both phases DuckDB-replayable."""
    n_groups = df.select(group_col).distinct().count()
    phase1 = seeded_sample_per_group(
        df, group_col, base_per_group, seed, id_col, rank
    )
    remaining_budget = max(total_budget - base_per_group * n_groups, 0)
    if remaining_budget == 0:
        return phase1
    alloc = proportional_allocation(df, group_col, weight_col, remaining_budget)
    rest = df.join(phase1.select(id_col), on=id_col, how="left_anti")
    ranked = rest.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                _seeded_rank_key(seed + 1, id_col, rank), F.col(id_col)
            )
        ),
    )
    phase2 = (
        ranked.join(F.broadcast(alloc.select(group_col, "allocation")), on=group_col)
        .filter(F.col("_rk") <= F.col("allocation"))
        .drop("_rk", "allocation")
    )
    return phase1.unionByName(phase2)


def sampled_avg(
    df: DataFrame, value_col: str, n: int = 100, seed: int = 42,
    rank: str = "xxhash64",
):
    """A3: estimate a mean from a bounded deterministic sample
    (reference samples ≤100 PDFs for avg page count to size work
    groups, ``karanta/pipeline.py:1302-1333``). Returns a 1-row
    DataFrame.

    Uses ``orderBy(...).limit(n)`` — Spark plans that as TakeOrdered
    (per-partition top-n + driver merge of n rows), NOT a global sort;
    a ``Window.orderBy`` with no partitionBy would funnel the whole
    table through one task. ``rank='md5'`` makes the sample (and so
    the estimate) DuckDB-replayable: hash ties can only occur between
    EQUAL values, which are interchangeable under an average, so the
    tie-break-free order is still deterministic in the output."""
    return (
        df.orderBy(_seeded_rank_key(seed, value_col, rank), F.col(value_col))
        .limit(n)
        .agg(F.avg(value_col).alias("avg_" + value_col))
    )


def stratified_split(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    order_col: str = "doc_id",
    seed: int = 42,
    rank: str = "xxhash64",
    mode: str = "exact",
) -> DataFrame:
    """Deterministic stratified train/val/test assignment.

    Appends a ``split`` column so that within every stratum (language,
    source, domain — the axis whose mix must be identical across
    splits) the *fractions* hold. Assignment is by seeded-hash rank,
    never ``rand()``: re-runs, partition layouts, and added columns
    cannot move a document between splits — the property that keeps a
    frozen eval split frozen (decontamination depends on it).

    *mode* ``'exact'`` — the oracle spec: rank rows within the
    stratum by (hash(seed, id), id); split k covers ranks in
    ``(floor(n·c_{k-1}), floor(n·c_k)]`` where c_k are cumulative
    fractions in the dict's insertion order (exact to ±1 row per
    stratum; pure integer boundaries, engine-neutral; the LAST listed
    split absorbs any remainder so every row is assigned). One
    window per stratum.

    *mode* ``'hash'`` — the production path at 100 TB: a pure
    map-side assignment by hash bucket — ``pmod(hash, 10^6)`` against
    cumulative-fraction cutoffs. No window, no shuffle, proportions
    hold in expectation (±binomial noise); per-stratum exactness is
    given up. Same exact-spec/scale-path seam as
    ``lm_score.perplexity_buckets``.
    """
    if mode not in ("exact", "hash"):
        raise ValueError(f"unknown mode: {mode!r}")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    tot = sum(fractions.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {tot}")
    names = list(fractions)
    cums: list[float] = []
    acc = 0.0
    for n in names:
        acc += fractions[n]
        cums.append(acc)
    key = _seeded_rank_key(seed, order_col, rank)
    if mode == "exact":
        w = Window.partitionBy(stratum_col).orderBy(key, F.col(order_col))
        wn = Window.partitionBy(stratum_col)
        ranked = df.withColumn("_rk", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(wn)
        )
        # Build the when-chain from the largest cutoff down so the
        # smallest cutoff is tested first (ascending when-order).
        expr = F.lit(names[-1])
        for n, c in list(zip(names[:-1], cums[:-1]))[::-1]:
            expr = F.when(
                F.col("_rk") <= F.floor(F.col("_n") * F.lit(c)), F.lit(n)
            ).otherwise(expr)
        return ranked.withColumn("split", expr).drop("_rk", "_n")
    buckets = 1_000_000
    if rank == "xxhash64":
        b = F.pmod(F.xxhash64(F.lit(seed), F.col(order_col)), F.lit(buckets))
    else:
        # md5 mode stays engine-neutral even here: the first 6 hex
        # chars as an integer (conv in Spark, from_hex arithmetic in
        # SQL) — so the scale path is ALSO oracle-replayable.
        b = F.pmod(
            F.conv(F.substring(key, 1, 6), 16, 10).cast("long"),
            F.lit(buckets),
        )
    expr = F.lit(names[-1])
    for n, c in list(zip(names[:-1], cums[:-1]))[::-1]:
        expr = F.when(b < F.lit(int(round(c * buckets))), F.lit(n)).otherwise(
            expr
        )
    return df.withColumn("split", expr)
