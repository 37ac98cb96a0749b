"""Dataset mixing (reference S7: HF multi-dataset load/mix,
``karanta/data/utils.py:28-111``): N sources → per-source caps
(fraction or count) → tagged union. Spark-native: ``unionByName`` +
deterministic seeded selection (the reference shuffles with seed=42;
we rank by a seeded hash so the pick is stable under any partition
layout — a plain ``df.sample`` changes with partitioning)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F


@dataclass(frozen=True)
class MixSpec:
    name: str
    df: "DataFrame"
    fraction: float | None = None  # keep this fraction of rows
    count: int | None = None  # or at most this many rows


def mix_datasets(
    specs: list[MixSpec], id_col: str, seed: int = 42, rank: str = "xxhash64"
) -> DataFrame:
    """Union the specs with a ``source`` tag, applying per-spec caps.

    Caps select the globally lowest ``hash(seed, id)`` values —
    deterministic, uniformly random-like, independent of partitioning.
    Selection uses ``orderBy(hash).limit(k)``, which Spark executes as
    per-partition TakeOrdered + a driver merge of k rows — NOT a
    single-partition global sort (a window over a constant key would
    funnel the whole source through one task).

    *rank* picks the hash: ``xxhash64`` (production default, one JVM
    hash per row) or ``md5`` (rank by the hex digest of ``seed:id`` —
    any engine with MD5 reproduces the selection, so the DuckDB oracle
    can verify the mix row-for-row)."""
    if rank not in ("xxhash64", "md5"):
        raise ValueError(f"unknown rank: {rank!r}")
    parts: list[DataFrame] = []
    for spec in specs:
        d = spec.df.withColumn("mix_source", F.lit(spec.name))
        if spec.fraction is not None or spec.count is not None:
            k = (
                spec.count
                if spec.count is not None
                else int(spec.df.count() * spec.fraction)
            )
            if rank == "xxhash64":
                key = F.xxhash64(F.lit(seed), F.col(id_col))
            else:
                key = F.md5(
                    F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
                )
            d = d.orderBy(key, F.col(id_col)).limit(k)
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def temperature_quotas(
    sizes: list[tuple[str, int]], alpha: float, budget: int
) -> list[tuple[str, int]]:
    """Temperature-scaled apportionment of an integer *budget* across
    sources: quota_i from p_i = size_i**alpha / Σ size_j**alpha — the
    multilingual-training rebalancing rule (mC4 / XLM-R style: alpha<1
    flattens the head so low-resource sources are upsampled
    relatively). Integerized by largest-remainder (Hamilton), the same
    exact-float expression shape as
    :func:`~karanta_ocr_spark.operators.sampling.proportional_allocation`
    (``(w / Σw) * budget`` in float64, remainder ties broken by source
    key ascending), then capped at size_i — a source cannot supply
    more rows than it has; the cap is a single pass with no
    redistribution, so ``Σ quota == budget`` holds whenever no source
    is exhausted (the documented degenerate case otherwise).

    Driver-side on one (source, size) pair per source — O(S log S)
    local work; source counts come from a distributed partial agg.
    """
    import math

    if not sizes:
        return []
    ws = [(g, float(n) ** alpha if n > 0 else 0.0) for g, n in sizes]
    tot = sum(w for _, w in ws)
    rows = []
    for g, w in ws:
        raw = (w / tot) * budget if tot > 0 else budget / len(ws)
        fl = math.floor(raw)
        rows.append((g, fl, raw - fl))
    leftover = budget - sum(fl for _, fl, _ in rows)
    ranked = sorted(range(len(rows)), key=lambda i: (-rows[i][2], rows[i][0]))
    bonus = set(ranked[: int(leftover)])
    bysrc = dict((g, n) for g, n in sizes)
    return [
        (g, min(fl + (1 if i in bonus else 0), bysrc[g]))
        for i, (g, fl, _) in enumerate(rows)
    ]


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float,
    budget: int,
    weight_col: str | None = None,
    seed: int = 42,
    rank: str = "xxhash64",
) -> DataFrame:
    """Temperature-based training-mixture sampling over ONE tagged
    corpus: per-source quotas from :func:`temperature_quotas` (sizes
    are row counts, or summed *weight_col* — e.g. chars/tokens — when
    given), then the quota rows of each source selected by lowest
    ``hash(seed, id)`` exactly as :func:`mix_datasets` caps do
    (per-partition TakeOrdered + driver k-row merge per source — no
    global sort, no per-source window funnel; sources are few by
    construction, so the driver loop over them is bounded).

    Returns the selected rows with an integer ``quota`` column so the
    apportionment itself is visible to downstream auditing. *rank* as
    in :func:`mix_datasets`: ``xxhash64`` production, ``md5``
    oracle-replayable.

    Scale shape: one partial agg over the corpus for sizes (S rows to
    the driver), then one TakeOrdered scan per source — each scan
    prunes to its source's partitions when the corpus is written
    partitioned by source (the usual layout for mixture corpora).
    """
    if rank not in ("xxhash64", "md5"):
        raise ValueError(f"unknown rank: {rank!r}")
    # One partial agg fetches size (rows or mass) AND the row count —
    # quota caps are in ROWS even when weighting by a mass column.
    agg = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    ).alias("_sz")
    stats = sorted(
        (r[0], int(r[1] or 0), int(r[2]))
        for r in df.groupBy(source_col)
        .agg(agg, F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    quotas = temperature_quotas([(g, s) for g, s, _ in stats], alpha, budget)
    counts = dict((g, n) for g, _, n in stats)
    quotas = [(g, min(q, counts[g])) for g, q in quotas]
    if rank == "xxhash64":
        key = F.xxhash64(F.lit(seed), F.col(id_col))
    else:
        key = F.md5(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        )
    parts = []
    for g, q in quotas:
        if q <= 0:
            continue
        parts.append(
            df.filter(F.col(source_col) == g)
            .orderBy(key, F.col(id_col))
            .limit(q)
            .withColumn("quota", F.lit(q).cast("long"))
        )
    if not parts:
        return df.withColumn("quota", F.lit(0).cast("long")).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
