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


def mix_datasets(specs: list[MixSpec], id_col: str, seed: int = 42) -> DataFrame:
    """Union the specs with a ``source`` tag, applying per-spec caps.

    Caps select the lowest ``xxhash64(seed, id)`` ranks — deterministic
    and uniformly random-like, independent of partitioning."""
    parts: list[DataFrame] = []
    for spec in specs:
        d = spec.df.withColumn("mix_source", F.lit(spec.name))
        if spec.fraction is not None or spec.count is not None:
            w = Window.partitionBy("mix_source").orderBy(
                F.xxhash64(F.lit(seed), F.col(id_col)), F.col(id_col)
            )
            d = d.withColumn("_rk", F.row_number().over(w))
            if spec.count is not None:
                d = d.filter(F.col("_rk") <= spec.count)
            else:
                total = spec.df.count()
                d = d.filter(F.col("_rk") <= int(total * spec.fraction))
            d = d.drop("_rk")
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
