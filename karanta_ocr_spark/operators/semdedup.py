"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster embeddings with a k-means codebook, then
prune near-duplicate *meanings* inside each cluster — pairs whose
cosine similarity exceeds a threshold — keeping the member farthest
from the cluster centroid (the paper's best-performing keep rule:
low-centroid-similarity survivors preserve intra-cluster diversity).

How this differs from :func:`similarity.embedding_near_dup` (LSH
pairs): LSH finds *near-identical* vectors (τ ≈ 0.98 bucket
collisions); SemDeDup works at lower thresholds (τ ≈ 0.95 in the
paper) where LSH recall collapses, by bounding the quadratic pair
search inside k-means cells instead of hash buckets.

Scale shape (10^12 embeddings):

* The codebook is a seeded md5-rank sample of the corpus (one bounded
  ``collect`` of ``n_clusters`` rows — the same device as
  ``similarity.ivf_topk``), optionally Lloyd-refined with
  shuffle-free partial-sum passes (``refine_codebook``).
* Assignment is one numpy matmul per Arrow batch (``mapInPandas``),
  map-only over the corpus.
* The pair search self-joins WITHIN cells only — the SemDeDup design
  point: ``n_clusters`` grows with the corpus (the paper uses 50k for
  LAION) so expected cell size stays bounded and the join never goes
  quadratic in N. Skewed cells are ordinary join skew (AQE skew-join
  or salting on the cell id).
* The verdict rule is NON-recursive, matching the released SemDeDup
  implementation: rank cell members by (centroid_sim ASC, id ASC);
  a member is a duplicate iff ANY earlier-ranked member is within τ —
  earlier members count even if they were themselves dropped. This
  keeps the rule one self-join + one aggregation (no iterative
  greedy-MIS fixpoint) and makes it exactly SQL-replayable.

Determinism: cosines are rounded to 6 dp before ranking/thresholding
and ties break on id, so verdicts are partition-invariant and the
DuckDB oracle (which replays codebook → assignment → rank → pair
verdicts) hash-matches.

Reference scope note: the reference pipeline has no semantic dedup;
this operator is part of the training-data suite the brief adds
beyond reference parity.

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

from pyspark.sql import DataFrame, Window, functions as F

from karanta_ocr_spark.operators.similarity import (
    _assign_centroids,
    cosine_guarded,
    refine_codebook,
)


def _seeded_codebook(
    df: DataFrame, n_clusters: int, vec_col: str, id_col: str, seed: int
) -> list[list[float]]:
    """Deterministic codebook: the *n_clusters* corpus vectors with
    the smallest md5("seed:id") rank (ties on id) — a uniform seeded
    sample that the SQL oracle can reproduce."""
    rank_key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    sample = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(rank_key, F.col(id_col))
        .limit(int(n_clusters))
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in sample]


def semantic_dedup_verdicts(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Per-row SemDeDup verdicts: ``(id_col, cell, centroid_sim,
    keep_rank, is_semantic_dup)``.

    ``kmeans_iters=0`` (the oracle-pinned mode) uses the raw seeded
    codebook; refinement improves cluster quality at the same cost
    structure but moves the centroids off the SQL-replayable grid, so
    the driver query pins the 0-iteration mode and refinement is
    pytest-pinned instead.
    """
    spark = df.sparkSession
    cents = _seeded_codebook(df, n_clusters, vec_col, id_col, seed)
    if kmeans_iters:
        cents = [
            [float(x) for x in c]
            for c in refine_codebook(df, cents, kmeans_iters, vec_col)
        ]

    assigned = _assign_centroids(
        df.select(F.col(id_col), F.col(vec_col)), cents, vec_col, "_cell"
    )
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "_cell int, _cv array<double>",
    )
    ranked = (
        assigned.join(F.broadcast(cent_df), on="_cell")
        .withColumn(
            "centroid_sim",
            F.round(cosine_guarded(F.col(vec_col).cast("array<double>"), F.col("_cv")), 6),
        )
        .drop("_cv")
        .withColumn(
            "keep_rank",
            F.row_number().over(
                # ASC: rank 1 = farthest from the centroid = the
                # paper's preferred survivor.
                Window.partitionBy("_cell").orderBy("centroid_sim", id_col)
            ),
        )
        # Three consumers read this frame (both sides of the intra-cell
        # pair join and the final verdict join) — persist or the
        # centroid-assignment kernel and the rank window run 3×.
        .persist()
    )
    # Intra-cell pair verdicts in a numpy kernel (optimization r6):
    # one grouped pass per cell replaces the JVM self-join, whose
    # zip_with+fold cosine over Σ n_c² pairs was the query's dominant
    # cost. Shuffle bytes halve (the cell's vectors cross once, not as
    # both join sides) and the O(n_c²·d) arithmetic runs as d
    # accumulated outer products — the SAME dimension-ascending add
    # order as the sequential ``aggregate`` folds, so every cosine is
    # bit-identical to the Catalyst expression (the device
    # ``bitext._pair_sims`` pinned first). Cell sizes are bounded by
    # the SemDeDup design point (n_clusters grows with the corpus), so
    # one cell per task is the same contract the pair join ran under.
    tau = float(threshold)
    # round(cos, 6) >= tau  ⟺  cos·10⁶ ≥ tau·10⁶ − 0.5 (HALF_UP). The
    # vectorized compare decides everything at least 1e-6 micro-units
    # from that boundary; straddling entries (measure-zero, but the
    # oracle demands exactness) fall back to decimal HALF_UP on the
    # shortest-repr value — the same quantization Spark's round()
    # applies via BigDecimal.
    bound = tau * 1e6 - 0.5

    def _pair_kernel(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n <= 1:
            return pd.DataFrame({id_col: pdf[id_col].iloc[:0]})
        order = pdf.sort_values("keep_rank").reset_index(drop=True)
        V = np.asarray([list(v) for v in order["_vd"]], dtype="float64")
        d = V.shape[1]
        nrm = np.zeros(n)
        for j in range(d):
            nrm = nrm + V[:, j] * V[:, j]
        nrm = np.maximum(np.sqrt(nrm), 1e-12)
        gram = np.zeros((n, n))
        for j in range(d):
            gram = gram + np.outer(V[:, j], V[:, j])
        cos = gram / (nrm[:, None] * nrm[None, :])
        scaled = cos * 1e6
        ge = scaled >= bound + 1e-6
        unsure = np.abs(scaled - bound) < 1e-6
        if unsure.any():
            from decimal import Decimal, ROUND_HALF_UP

            q6 = Decimal("0.000001")
            tq = Decimal(repr(tau))
            for a_i, b_i in zip(*np.nonzero(unsure)):
                r = Decimal(repr(float(cos[a_i, b_i]))).quantize(
                    q6, ROUND_HALF_UP
                )
                ge[a_i, b_i] = r >= tq
        earlier = np.tril(np.ones((n, n), dtype=bool), k=-1)
        dup = (ge & earlier).any(axis=1)
        return pd.DataFrame({id_col: order[id_col][dup]})

    from pyspark.sql.types import StructType

    dup_ids = (
        ranked.withColumn("_vd", F.col(vec_col).cast("array<double>"))
        .select("_cell", id_col, "_vd", "keep_rank")
        .groupBy("_cell")
        .applyInPandas(_pair_kernel, schema=StructType([ranked.schema[id_col]]))
        .withColumn("is_semantic_dup", F.lit(True))
    )
    return (
        ranked.join(dup_ids, on=id_col, how="left")
        .select(
            id_col,
            F.col("_cell").alias("cell"),
            "centroid_sim",
            "keep_rank",
            F.coalesce("is_semantic_dup", F.lit(False)).alias("is_semantic_dup"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Corpus minus semantic duplicates (all original columns kept)."""
    verdicts = semantic_dedup_verdicts(
        df, n_clusters, threshold, vec_col, id_col, seed, kmeans_iters
    )
    victims = verdicts.filter(F.col("is_semantic_dup")).select(id_col)
    return df.join(victims, on=id_col, how="left_anti")


def semdedup_oracle_sql(
    n_clusters: int = 8,
    threshold: float = 0.95,
    seed: int = 42,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of :func:`semantic_dedup_verdicts` (kmeans_iters=0):
    replays codebook selection, nearest-centroid assignment (argmax
    ties → lowest cell index, numpy argmax parity), the
    farthest-first keep ranking, and the earlier-rank pair rule."""
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
        cb AS (SELECT v AS cv,
                      row_number() OVER (ORDER BY md5('{seed}:' || CAST(vec_id AS VARCHAR)),
                                         vec_id) - 1 AS cidx
               FROM e
               QUALIFY row_number() OVER (ORDER BY md5('{seed}:' || CAST(vec_id AS VARCHAR)),
                                          vec_id) <= {int(n_clusters)}),
        asg AS (SELECT vec_id, v, cidx,
                       round(list_dot_product(v, cv)
                             / (greatest(sqrt(list_dot_product(v, v)), 1e-12)
                                * greatest(sqrt(list_dot_product(cv, cv)), 1e-12)), 6)
                           AS centroid_sim
                FROM (
            SELECT e.vec_id, e.v, cb.cidx, cb.cv,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                       list_dot_product(e.v, cb.cv)
                       / (greatest(sqrt(list_dot_product(e.v, e.v)), 1e-12)
                          * greatest(sqrt(list_dot_product(cb.cv, cb.cv)), 1e-12)) DESC,
                       cb.cidx) AS rk
            FROM e CROSS JOIN cb) WHERE rk = 1),
        rnk AS (SELECT vec_id, v, cidx, centroid_sim,
                       row_number() OVER (PARTITION BY cidx
                                          ORDER BY centroid_sim, vec_id) AS keep_rank
                FROM asg),
        dup AS (SELECT DISTINCT a.vec_id
                FROM rnk a JOIN rnk b
                  ON a.cidx = b.cidx AND b.keep_rank < a.keep_rank
                WHERE round(list_dot_product(a.v, b.v)
                            / (greatest(sqrt(list_dot_product(a.v, a.v)), 1e-12)
                               * greatest(sqrt(list_dot_product(b.v, b.v)), 1e-12)), 6)
                      >= {float(threshold)})
        SELECT r.vec_id, r.cidx AS cell, r.centroid_sim, r.keep_rank,
               (d.vec_id IS NOT NULL) AS is_semantic_dup
        FROM rnk r LEFT JOIN dup d ON r.vec_id = d.vec_id
    """
