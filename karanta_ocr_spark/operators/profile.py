"""Corpus profile statistics.

:func:`length_percentiles` — per-language document-length quantiles,
the distribution profile a corpus report leads with (analog of the
reference's folder/workspace statistics views, e.g.
``karanta/bulk_processing`` job summaries).

Two modes behind one seam, like the dedup operators' hash modes:

* ``mode='exact'`` — Spark's exact ``percentile`` aggregate. It
  collects all values per group, which is fine at fixture scale and
  shares DuckDB ``quantile_cont``'s linear-interpolation definition,
  so it is the ORACLE SPEC the approximate form is judged against.
* ``mode='approx'`` — ``percentile_approx`` (Greenwald-Khanna-style
  single-pass sketch with map-side partial merge). This is the
  100-TB production path: per-group memory is bounded by the sketch
  ``accuracy`` parameter instead of the group's row count, and the
  sketch merges associatively so the aggregation stays fully
  partial/map-side-combined. Guaranteed rank error ≤ 1/accuracy ·
  n rows per group (so accuracy=10000 → ≤0.01% rank error); values
  returned are actual data points, not interpolations, so the two
  modes differ by at most one inter-sample gap at each quantile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PCTS = (0.25, 0.5, 0.9, 0.99)


def length_percentiles(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "lang",
    mode: str = "exact",
    accuracy: int = 10000,
) -> DataFrame:
    """Per-*group_col* count + p25/p50/p90/p99 of *value_col*."""
    arr = ", ".join(f"{p}D" for p in PCTS)
    if mode == "exact":
        pct = F.expr(f"percentile({value_col}, array({arr}))")
    elif mode == "approx":
        pct = F.expr(
            f"percentile_approx({value_col}, array({arr}), {int(accuracy)})"
        ).cast("array<double>")
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.element_at(pct, 1), 4).alias("p25"),
        F.round(F.element_at(pct, 2), 4).alias("p50"),
        F.round(F.element_at(pct, 3), 4).alias("p90"),
        F.round(F.element_at(pct, 4), 4).alias("p99"),
    )
