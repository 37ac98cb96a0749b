"""DoReMi-lite domain reweighting (Xie et al. 2023,
arXiv:2305.10429): compute per-domain training-mixture weights from
per-domain excess loss. Full DoReMi trains a proxy model online;
the lite form here takes the repo's corpus-trained bigram-LM
cross-entropy as the loss signal and emits the same
excess-loss-exponential reweighting:

``w(d) ∝ exp(max(L(d) − L_ref, 0) / T)``, normalized over domains,
with ``L_ref`` = corpus-mean cross-entropy (the uniform-baseline
stand-in for the reference model's loss).

Scale shape (10^12 docs, G domains where G is small — hosts are NOT
domains; sources/registries are):

* The loss signal rides :func:`lm_score.bigram_lm_perplexity`
  (already one train pass + one score join).
* Per-doc cross-entropies are quantized to INTEGER micro-units
  before any cross-row aggregation (the repo's fixed-point device),
  so per-domain sums are exact under any partitioning and the DuckDB
  oracle reproduces every mean bit-for-bit.
* The corpus baseline and the softmax normalizer are 1-row
  aggregates of the ≤G-row domain table, broadcast back via
  crossJoin — never a corpus shuffle.

Reference scope note: the reference has no mixture-weighting stage;
part of the beyond-reference training-data suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from karanta_ocr_spark.operators.lm_score import bigram_lm_perplexity

_M = 1_000_000


def domain_reweight(
    docs: DataFrame,
    domain_col: str = "source",
    temperature: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "md5",
) -> DataFrame:
    """Per-domain mixture weights: ``(domain, n_docs, n_scored,
    mean_cross_entropy, excess, weight)``, one row per domain.

    Docs the LM cannot score (< 2 tokens) count in ``n_docs`` but not
    in the loss means. ``temperature`` is DoReMi's smoothing knob:
    T→∞ ≈ uniform, small T concentrates on the hardest domain.
    """
    ppl = bigram_lm_perplexity(
        docs, text_col=text_col, id_col=id_col, hash_mode=hash_mode
    ).select(id_col, "cross_entropy")
    scored = (
        docs.select(F.col(id_col), F.col(domain_col).alias("domain"))
        .join(ppl, on=id_col, how="left")
        .withColumn(
            # exact micro-units of the (already 6-dp-rounded,
            # engine-identical) per-doc cross-entropy
            "_ce_micro",
            F.round(F.col("cross_entropy") * _M).cast("long"),
        )
    )
    # Persisted: the ≤G-row domain table is referenced THREE times in
    # the final plan (the baseline broadcast, the softmax-normalizer
    # broadcast, and the output branch); without the cache each
    # reference re-runs the whole upstream bigram-LM train+score
    # pipeline — measured as a 48-parquet-scan / 108-Exchange physical
    # plan at bench scale (plans/r06/domain_reweight_before.txt).
    # G is small by contract (sources/registries, not hosts), so the
    # cache is a handful of rows. Guide §5: cache only reused frames
    # whose recompute is expensive — this is the textbook case.
    dom = scored.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("_ce_micro").cast("long").alias("n_scored"),
        F.sum("_ce_micro").alias("_sum_micro"),
    ).persist()
    base = dom.agg(
        F.sum("_sum_micro").alias("_tot_micro"),
        F.sum("n_scored").alias("_tot_n"),
    )
    t = float(temperature)
    with_excess = (
        dom.crossJoin(F.broadcast(base))
        .withColumn(
            "mean_cross_entropy",
            F.coalesce(F.col("_sum_micro"), F.lit(0))
            / F.greatest(F.col("n_scored"), F.lit(1))
            / F.lit(float(_M)),
        )
        .withColumn(
            "_ref",
            F.coalesce(F.col("_tot_micro"), F.lit(0))
            / F.greatest(F.col("_tot_n"), F.lit(1))
            / F.lit(float(_M)),
        )
        .withColumn(
            "excess", F.greatest(F.col("mean_cross_entropy") - F.col("_ref"), F.lit(0.0))
        )
        .withColumn("_w_raw", F.exp(F.col("excess") / F.lit(t)))
    )
    norm = with_excess.agg(F.sum("_w_raw").alias("_w_tot"))
    return (
        with_excess.crossJoin(F.broadcast(norm))
        .select(
            "domain",
            "n_docs",
            "n_scored",
            F.round("mean_cross_entropy", 6).alias("mean_cross_entropy"),
            F.round("excess", 6).alias("excess"),
            F.round(F.col("_w_raw") / F.col("_w_tot"), 6).alias("weight"),
        )
    )


def domain_reweight_oracle_sql(
    lm_cte: str, temperature: float = 1.0, table: str = "documents"
) -> str:
    """DuckDB twin: extends the shared LM CTE (must end with
    ``ag(doc_id, n, s)``) with the same micro-quantization, domain
    sums, baseline, and exponential reweighting."""
    t = float(temperature)
    return lm_cte + f"""
        , ce AS (SELECT d.doc_id, d.source AS domain,
                        CASE WHEN ag.n IS NULL THEN NULL
                             ELSE CAST(round(round(-ag.s / ag.n, 6) * {_M})
                                       AS BIGINT) END AS ce_micro
                 FROM {table} d LEFT JOIN ag USING (doc_id)),
        dom AS (SELECT domain,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(count(ce_micro) AS BIGINT) AS n_scored,
                       sum(ce_micro) AS sum_micro
                FROM ce GROUP BY domain),
        base AS (SELECT sum(sum_micro) AS tot_micro, sum(n_scored) AS tot_n
                 FROM dom),
        ex AS (SELECT dom.*, base.*,
                      coalesce(sum_micro, 0) / greatest(n_scored, 1) / {float(_M)}
                          AS mean_ce,
                      greatest(coalesce(sum_micro, 0) / greatest(n_scored, 1)
                                   / {float(_M)}
                               - coalesce(tot_micro, 0) / greatest(tot_n, 1)
                                   / {float(_M)},
                               0.0) AS excess
               FROM dom CROSS JOIN base),
        w AS (SELECT *, exp(excess / {t}) AS w_raw FROM ex),
        nz AS (SELECT sum(w_raw) AS w_tot FROM w)
        SELECT domain, n_docs, n_scored,
               round(mean_ce, 6) AS mean_cross_entropy,
               round(excess, 6) AS excess,
               round(w_raw / nz.w_tot, 6) AS weight
        FROM w CROSS JOIN nz
    """
