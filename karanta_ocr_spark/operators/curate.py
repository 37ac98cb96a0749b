"""End-to-end corpus curation: ordered gates, one corpus pass, an
auditable funnel.

Every published training corpus ships a FUNNEL — how many documents
each curation stage dropped (C4 §2.2, Gopher A.1.1, RefinedWeb
table 2, FineWeb's "processing steps" chart). The naive
implementation runs the pipeline stage by stage with a ``count()``
between stages: S actions, S corpus scans. This operator computes
every document's FIRST-FAILING stage in ONE pass and derives the
whole funnel from a single tiny aggregate:

- per-row gates (language allowlist, C4 hard rules, Gopher
  duplicate-line repetition) are Catalyst expressions stacked into
  one ``CASE`` — zero extra scans;
- the exact-dedup stage (keep the min-id holder of each text
  fingerprint) is evaluated ONLY among docs that survived the
  per-row gates — the same order a staged pipeline would apply — via
  one md5-keyed self-aggregation join (text never in the shuffle
  key);
- the funnel itself is a groupBy over the verdict column (≤ S+1
  rows) plus a window cumsum over the FIXED stage ordering — driver
  never loops.

``curate_corpus`` returns (kept rows, verdict rows); ``funnel``
folds verdicts into (stage_idx, stage, n_dropped, n_survivors).

Scale notes (100 TB): the gate pass is map-only and fuses with the
scan; the dedup join shuffles (md5, id) pairs — 24 B/row; AQE
broadcast-joins the canonical side when a filtered corpus is small
enough and handles fingerprint skew (a viral boilerplate text is ONE
hot md5 group — min() partial-aggregates map-side, so skew cost is
bounded before the exchange).

Reference parity: karanta-ocr's pipeline is extraction-only; the
funnel is the downstream curation mandate (brief). The stage list
mirrors the public C4/Gopher rule families implemented in
``operators/corpus_filters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from karanta_ocr_spark.functions.text_analysis import WS
from karanta_ocr_spark.operators.corpus_filters import (
    duplicate_line_stats,
    lines_expr,
)

#: Funnel stage order (fixed — the verdict CASE tests them in this
#: order, so ``first_fail`` is well-defined).
STAGES = ("lang_filter", "quality_filter", "repetition_filter", "exact_dedup")


def curation_verdicts(
    docs: DataFrame,
    allowed_langs: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_words: int = 5,
    max_dup_line_frac: float = 0.3,
) -> DataFrame:
    """Append ``verdict`` — the first failing stage, or ``kept``.

    Gates, in order: ``lang_filter`` (allowlist), ``quality_filter``
    (C4 hard rules: ≥ *min_words* words, no "lorem ipsum", no ``{``,
    ≥1 non-empty line), ``repetition_filter`` (Gopher
    ``dup_line_frac`` > *max_dup_line_frac*), ``exact_dedup``
    (not the min-id holder of the md5(text) group AMONG gate
    survivors — dedup sees the filtered corpus, exactly as a staged
    pipeline would).
    """
    col = F.col(text_col)
    toks = F.split(F.trim(col), WS + "+")
    lines = lines_expr(col)
    lorem = F.lower(col).contains("lorem ipsum")
    brace = col.contains("{")
    # Each gate coalesces NULL → False: a NULL lang/text must FAIL
    # its gate, not skip every when() branch and fall through to
    # "kept" (the unsafe direction for a policy filter).
    lang_ok = F.coalesce(F.col(lang_col).isin(*allowed_langs), F.lit(False))
    quality_ok = F.coalesce(
        (F.size(toks) >= min_words) & ~lorem & ~brace & (F.size(lines) > 0),
        F.lit(False),
    )
    _, dup_frac, _ = duplicate_line_stats(col)
    rep_ok = F.coalesce(dup_frac <= max_dup_line_frac, F.lit(False))
    sig = docs.withColumn("_fp", F.md5(col)).withColumn(
        "_gates_ok", lang_ok & quality_ok & rep_ok
    ).withColumn("_lang_ok", lang_ok).withColumn(
        "_quality_ok", quality_ok
    ).withColumn("_rep_ok", rep_ok)
    # The canonical keeper of each md5 group AMONG gate survivors is a
    # conditional min over the fingerprint partition (optimization r6):
    # one shuffle by _fp and one corpus pass. The previous
    # groupBy-survivors + join-back shape shuffled the corpus by _fp
    # TWICE (once to build the keeper table, once to join it) and
    # recomputed every gate expression on the build side. A text
    # duplicated millions of times makes one hot _fp partition either
    # way (the join probe shuffled by _fp identically), so the window
    # adds no new skew exposure. Only gates_ok rows can reach the
    # exact_dedup branch, and for them the conditional min is
    # non-NULL and equal to the old keeper id.
    keep_id = F.min(F.when(F.col("_gates_ok"), F.col(id_col))).over(
        Window.partitionBy("_fp")
    )
    verdict = (
        F.when(~F.col("_lang_ok"), F.lit("lang_filter"))
        .when(~F.col("_quality_ok"), F.lit("quality_filter"))
        .when(~F.col("_rep_ok"), F.lit("repetition_filter"))
        .when(keep_id != F.col(id_col), F.lit("exact_dedup"))
        .otherwise(F.lit("kept"))
    )
    return (
        sig.withColumn("verdict", verdict)
        .drop("_fp", "_gates_ok", "_lang_ok", "_quality_ok", "_rep_ok")
    )


def funnel(verdicts: DataFrame) -> DataFrame:
    """Fold verdict rows into the published-corpus funnel table:
    ``(stage_idx, stage, n_dropped, n_survivors)`` — survivors AFTER
    each stage, in stage order."""
    idx = F.when(F.col("verdict") == STAGES[0], 1)
    for i, s in enumerate(STAGES[1:], start=2):
        idx = idx.when(F.col("verdict") == s, i)
    # Persisted: ≤ S+1 rows, but referenced by the total aggregate AND
    # the stage join below — uncached, each reference re-runs the full
    # corpus verdict pass (gates + line explode + dedup groupBy).
    counts = verdicts.groupBy(idx.alias("stage_idx")).agg(
        F.count(F.lit(1)).alias("n")
    ).persist()
    # Tiny frame (≤ S+1 rows): the cumsum window is trivially bounded.
    total = counts.agg(F.sum("n").alias("_total"))
    stages = verdicts.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(STAGES)], "stage_idx int, stage string"
    )
    base = (
        stages.join(counts, "stage_idx", "left")
        .withColumn("n_dropped", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(total))
    )
    # Cumulative drops via a triangular broadcast self-join over the
    # ≤ len(STAGES)-row stage table (stage i sums drops of stages ≤ i)
    # — deliberately NOT a window: Spark 4's EliminateWindowPartitions
    # folds ANY constant partition key out of the spec, after which
    # WindowExec warns about the single partition on every plan audit.
    # Over a bounded stage table the triangular join is the same
    # O(S² ≤ 16) work without the noise.
    d = base.select("stage_idx", "n_dropped")
    cum = (
        d.alias("a")
        .join(F.broadcast(d.alias("b")),
              F.col("b.stage_idx") <= F.col("a.stage_idx"))
        .groupBy(F.col("a.stage_idx").alias("stage_idx"))
        .agg(F.sum("b.n_dropped").alias("_cumdrop"))
    )
    out = base.join(F.broadcast(cum), "stage_idx").withColumn(
        "n_survivors", (F.col("_total") - F.col("_cumdrop")).cast("long")
    )
    return out.select("stage_idx", "stage", "n_dropped", "n_survivors")


def curate_corpus(
    docs: DataFrame, allowed_langs: list[str], **gate_kwargs
) -> tuple[DataFrame, DataFrame]:
    """(kept rows, funnel table) in one logical pass."""
    v = curation_verdicts(docs, allowed_langs, **gate_kwargs)
    return v.filter(F.col("verdict") == "kept").drop("verdict"), funnel(v)
