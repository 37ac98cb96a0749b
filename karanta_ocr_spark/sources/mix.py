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
