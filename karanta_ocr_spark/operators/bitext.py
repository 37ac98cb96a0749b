"""Margin-based bitext mining (Artetxe & Schwenk 2019,
arXiv:1811.01136 — the LASER/CCMatrix mining rule): align documents
across two languages by cosine similarity *relative to* each side's
k-NN neighborhood density, which kills the hubness failure of raw
cosine thresholds. For a multilingual web corpus this is how parallel
training data is mined from comparable crawls.

``margin(x, y) = cos(x, y) / ((avgk(x→TGT) + avgk(y→SRC)) / 2)``

(the "ratio" margin; a pair is mined when its forward-best margin
clears the threshold).

Exactness device: cosines are snapped to integer micro-units
(``round(cos·1e6)`` as bigint) BEFORE any aggregation, so k-NN sums
are exact integer arithmetic and the margin is one floor division —
``margin_micro = 2k·sim_micro·1e6 // (fwd_sum + bwd_sum)`` — making
ranking, thresholding, and the emitted doubles bit-identical between
Spark and the DuckDB oracle (the same fixed-point device as
``operators/train_lr`` and ``functions/ocr_quality``).

Scale shape (10^9 docs per side):

* ``candidates='broadcast'`` (default, oracle-pinned): the TGT side
  broadcasts — right when mining INTO a bounded target pool (one
  language's worth of centroid-reduced candidates). BroadcastNLJ,
  never a CartesianProduct.
* At two big sides, generate candidates with the IVF/LSH machinery
  (``similarity.ivf_topk`` / ``lsh_bucketed_topk``) and feed the
  resulting pair table through :func:`margin_scores` unchanged — the
  margin arithmetic only ever sees (src, tgt, sim_micro) rows. The
  k-NN averages then run over ANN candidates instead of exact
  neighborhoods, which is exactly CCMatrix's production compromise.

Reference scope note: the reference has no mining stage; this is
part of the training-data suite beyond reference parity.

Caching contract: this module ``persist()``s a bounded intermediate
(named at the persist site) that the returned lazy plan still
references — it cannot be unpersisted inside the operator without
re-running the upstream per consumer. Library callers composing many
operators in one session should release it after the final consuming
action (``spark.catalog.clearCache()`` or the frame's own
``unpersist()``); the bench and oracle harnesses do exactly that
between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from karanta_ocr_spark.operators.similarity import cosine_guarded

#: micro-units per 1.0 of cosine/margin
_M = 1_000_000


def _pair_sims_catalyst(
    src: DataFrame, tgt: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Pure-Catalyst twin of :func:`_pair_sims` (the HOF cosine fold);
    kept as the parity reference — pytest pins the numpy kernel
    bit-identical to this formulation."""
    t = tgt.select(
        F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("_tv")
    )
    s = src.select(
        F.col(id_col).alias("src_id"), F.col(vec_col).alias("_sv")
    )
    return s.crossJoin(F.broadcast(t)).select(
        "src_id",
        "tgt_id",
        F.round(cosine_guarded(F.col("_sv"), F.col("_tv")) * _M)
        .cast("long")
        .alias("sim_micro"),
    )


def _pair_sims(
    src: DataFrame, tgt: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """All (src, tgt) pairs with integer micro-cosines; the TGT side
    broadcasts (documented seam — see module docstring).

    Runs as a numpy kernel per Arrow batch (the interpreted HOF fold
    over 10^6 pairs × d elements dominated the whole query wall —
    measured 6×). BIT-IDENTICAL to the Catalyst twin above, not just
    approximately: the dot/norm accumulations loop over the DIMENSION
    axis (``acc += A[:,j] * B[:,j]``), which performs additions in the
    same left-to-right order as both the ``F.aggregate`` fold and
    DuckDB's sequential ``list_dot_product``; each numpy elementwise
    op is one IEEE-754 double op, so every intermediate equals the
    engines' — no BLAS pairwise-sum reassociation (pytest-pinned).
    Rounding emulates the engines' HALF_UP via floor(v+0.5) /
    ceil(v-0.5) on the sign branches."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    import os

    rows = tgt.select(
        F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("_tv")
    ).collect()
    # Bounded-pool contract, ENFORCED: the target side is collected
    # and broadcast, which is only sane for a bounded mining pool.
    # Above the cap, fail fast with the remedy named instead of
    # OOMing the driver/executors mid-broadcast (two-big-sides mining
    # needs the ANN-candidate path documented in the module
    # docstring). spark.driver.maxResultSize still backstops the
    # collect itself.
    cap = int(os.environ.get("SPARK_GRAFT_BITEXT_TGT_CAP", "2000000"))
    if len(rows) > cap:
        raise ValueError(
            f"bitext target pool has {len(rows)} rows, above the "
            f"broadcast cap ({cap}); pre-reduce the target side with "
            "an ANN candidate filter or raise "
            "SPARK_GRAFT_BITEXT_TGT_CAP if the pool genuinely fits "
            "driver+executor memory"
        )
    s = src.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("_sv"))
    schema = StructType([
        StructField("src_id", s.schema["src_id"].dataType),
        StructField("tgt_id", LongType()),
        StructField("sim_micro", LongType()),
    ])
    if not rows:  # empty target pool: zero pairs, like the Catalyst twin
        return src.sparkSession.createDataFrame([], schema)
    tgt_ids = np.asarray([r["tgt_id"] for r in rows], dtype="int64")
    T = np.asarray([list(r["_tv"]) for r in rows], dtype="float64")
    sc = src.sparkSession.sparkContext
    b_ids, b_t = sc.broadcast(tgt_ids), sc.broadcast(T)

    def _seq_dot(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(A.shape[0])
        for j in range(A.shape[-1]):
            acc = acc + A[:, j] * B[:, j]
        return acc

    def gen(batches):
        import pandas as pd

        T_ = b_t.value
        tids = b_ids.value
        m, d = T_.shape
        # Norms clamped at 1e-12 like the Catalyst twin's
        # cosine_guarded and the oracle's greatest(sqrt(...), 1e-12):
        # a zero vector scores 0, never NaN (whose int64 cast is
        # undefined). No-op for nonzero vectors.
        tnorm = np.maximum(np.sqrt(_seq_dot(T_, T_)), 1e-12)
        for pdf in batches:
            if not len(pdf):
                continue
            S = np.asarray([list(v) for v in pdf["_sv"]], dtype="float64")
            snorm = np.maximum(np.sqrt(_seq_dot(S, S)), 1e-12)
            # (n, m) dot built one dimension at a time — same add order
            # as the sequential folds in both engines.
            sim = np.zeros((S.shape[0], m))
            for j in range(d):
                sim = sim + S[:, j][:, None] * T_[None, :, j]
            sim = sim / (snorm[:, None] * tnorm[None, :]) * float(_M)
            micro = np.where(
                sim >= 0, np.floor(sim + 0.5), np.ceil(sim - 0.5)
            ).astype("int64")
            n = S.shape[0]
            yield pd.DataFrame({
                "src_id": np.repeat(pdf["src_id"].to_numpy(), m),
                "tgt_id": np.tile(tids, n),
                "sim_micro": micro.ravel(),
            })

    return s.mapInPandas(gen, schema)


def margin_scores(pairs: DataFrame, k: int = 4) -> DataFrame:
    """Ratio-margin scores over a (src_id, tgt_id, sim_micro) pair
    table: each side's k-NN sum is an exact integer aggregation; the
    margin is one floor division in micro-units."""
    # The pair table feeds THREE consumers (fwd sums, bwd sums, and
    # the margin join): without a persist the upstream pair cosines —
    # the expensive kernel crossJoin — are recomputed once per branch
    # (measured 3× the wall at sf0.1). Values are unaffected; at
    # two-big-sides scale the pair table is ANN-bounded (module
    # docstring) so the cache is candidate-sized, not corpus-sized.
    pairs = pairs.persist()
    # k-NN sums as aggregations, not rank windows (optimization r6):
    # the sum of the k LARGEST sim_micro values is invariant to how a
    # rank window breaks ties at the k boundary (tied values are
    # equal), so each side's neighborhood sum is one groupBy with a
    # per-group top-k slice — no full sort of the pair table per side
    # and no rank filter pass. Per-group state is the group's
    # sim_micro list, bounded by the candidate-generation contract
    # (exact pool mode is pool-capped, ANN mode is candidate-capped).
    topk = F.slice(F.sort_array(F.collect_list("sim_micro"), asc=False), 1, k)
    topk_sum = F.aggregate(topk, F.lit(0).cast("long"), lambda a, x: a + x)
    fwd = pairs.groupBy("src_id").agg(
        topk_sum.alias("fwd_sum"),
        F.least(F.count(F.lit(1)), F.lit(k)).cast("long").alias("fwd_n"),
    )
    bwd = pairs.groupBy("tgt_id").agg(
        topk_sum.alias("bwd_sum"),
        F.least(F.count(F.lit(1)), F.lit(k)).cast("long").alias("bwd_n"),
    )
    return (
        pairs.join(fwd, on="src_id")
        .join(bwd, on="tgt_id")
        .withColumn(
            # margin = 2·sim / (fwd_sum/fwd_n + bwd_sum/bwd_n)
            #        = 2·sim·fwd_n·bwd_n / (fwd_sum·bwd_n + bwd_sum·fwd_n)
            # — all integers; one double division + floor, identical
            # in both engines (numerator < 2^53).
            "margin_micro",
            F.floor(
                F.col("sim_micro")
                * F.lit(2 * _M).cast("long")
                * F.col("fwd_n")
                * F.col("bwd_n")
                / F.greatest(
                    F.col("fwd_sum") * F.col("bwd_n")
                    + F.col("bwd_sum") * F.col("fwd_n"),
                    F.lit(1),
                )
            ).cast("long"),
        )
    )


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.01,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Mined pairs: per src doc, the forward-best tgt by margin
    (ties → lowest tgt_id), kept when the margin clears the
    threshold. Returns ``(src_id, tgt_id, cos_sim, margin)``."""
    pairs = _pair_sims(src, tgt, vec_col, id_col)
    scored = margin_scores(pairs, k=k)
    thr = int(round(margin_threshold * _M))
    # Forward-best per src as a struct-max aggregation (optimization
    # r6): (margin_micro desc, tgt_id asc) is a total order within a
    # src group (tgt_id is unique there), so max of the struct
    # (margin, -tgt, payload...) picks exactly the row the rank-1
    # window picked, without sorting every group.
    best = scored.groupBy("src_id").agg(
        F.max(
            F.struct(
                F.col("margin_micro"),
                (-F.col("tgt_id")).alias("_nt"),
                F.col("tgt_id"),
                F.col("sim_micro"),
            )
        ).alias("_b")
    )
    return (
        best.filter(F.col("_b.margin_micro") >= thr)
        .select(
            "src_id",
            F.col("_b.tgt_id").alias("tgt_id"),
            (F.col("_b.sim_micro") / F.lit(float(_M))).alias("cos_sim"),
            (F.col("_b.margin_micro") / F.lit(float(_M))).alias("margin"),
        )
    )


def bitext_oracle_sql(
    k: int = 4,
    margin_threshold: float = 1.01,
    table: str = "embeddings",
    src_pred: str = "vec_id % 2 = 0",
    tgt_pred: str = "vec_id % 2 = 1",
) -> str:
    """DuckDB twin of :func:`mine_bitext` over the parity-split
    embeddings table: replays micro-cosines, both k-NN integer sums,
    the floor-division margin, and the forward-best selection."""
    thr = int(round(margin_threshold * _M))
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
        s AS (SELECT vec_id AS src_id, v AS sv FROM e WHERE {src_pred}),
        t AS (SELECT vec_id AS tgt_id, v AS tv FROM e WHERE {tgt_pred}),
        p AS (SELECT src_id, tgt_id,
                     CAST(round(list_dot_product(sv, tv)
                          / (greatest(sqrt(list_dot_product(sv, sv)), 1e-12)
                             * greatest(sqrt(list_dot_product(tv, tv)), 1e-12))
                          * {_M}) AS BIGINT) AS sim_micro
              FROM s CROSS JOIN t),
        r AS (SELECT *,
                     row_number() OVER (PARTITION BY src_id
                                        ORDER BY sim_micro DESC, tgt_id) AS rf,
                     row_number() OVER (PARTITION BY tgt_id
                                        ORDER BY sim_micro DESC, src_id) AS rb
              FROM p),
        fwd AS (SELECT src_id, sum(sim_micro) AS fwd_sum, count(*) AS fwd_n
                FROM r WHERE rf <= {k} GROUP BY src_id),
        bwd AS (SELECT tgt_id, sum(sim_micro) AS bwd_sum, count(*) AS bwd_n
                FROM r WHERE rb <= {k} GROUP BY tgt_id),
        m AS (SELECT r.src_id, r.tgt_id, r.sim_micro,
                     CAST(floor(CAST(r.sim_micro * {2 * _M}::BIGINT
                                     * fwd.fwd_n * bwd.bwd_n AS DOUBLE)
                          / greatest(fwd.fwd_sum * bwd.bwd_n
                                     + bwd.bwd_sum * fwd.fwd_n, 1)) AS BIGINT)
                         AS margin_micro
              FROM r JOIN fwd ON r.src_id = fwd.src_id
                     JOIN bwd ON r.tgt_id = bwd.tgt_id),
        best AS (SELECT *, row_number() OVER (PARTITION BY src_id
                                              ORDER BY margin_micro DESC, tgt_id) AS rk
                 FROM m)
        SELECT src_id, tgt_id,
               sim_micro / {float(_M)} AS cos_sim,
               margin_micro / {float(_M)} AS margin
        FROM best WHERE rk = 1 AND margin_micro >= {thr}
    """
