"""SemDeDup semantic deduplication: keep rule (farthest-from-centroid
survives), non-recursive earlier-rank semantics, threshold edges,
refinement mode, and partition invariance."""

import math

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_verdicts,
)


def _unit(*coords, dim=8):
    v = [0.0] * dim
    for i, x in enumerate(coords):
        v[i] = float(x)
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _rot(base, eps, j, dim=8):
    """A vector eps-rotated from *base* toward axis j (still unit)."""
    v = list(base)
    v[j] += eps
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture()
def clustered(spark):
    # Two tight families near orthogonal axes + one singleton.
    a = _unit(1)
    b = _unit(0, 1)
    rows = [
        (0, a),
        (1, _rot(a, 0.01, 2)),   # ~0.99995 cos to a
        (2, _rot(a, 0.02, 3)),   # ~0.9998 cos to a
        (3, b),
        (4, _rot(b, 0.015, 4)),
        (5, _unit(0, 0, 0, 0, 0, 1)),  # singleton direction
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_dup_families_collapse_to_one_survivor(clustered):
    out = semantic_dedup(clustered, n_clusters=3, threshold=0.995)
    kept = sorted(r["vec_id"] for r in out.collect())
    v = {
        r["vec_id"]: r
        for r in semantic_dedup_verdicts(
            clustered, n_clusters=3, threshold=0.995
        ).collect()
    }
    # Each family keeps exactly one member per cell; the singleton
    # always survives.
    assert 5 in kept
    by_cell = {}
    for r in v.values():
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        survivors = [m for m in members if not m["is_semantic_dup"]]
        assert len(survivors) >= 1
        # Rank-1 (farthest from centroid) is never a duplicate.
        rank1 = min(members, key=lambda m: m["keep_rank"])
        assert not rank1["is_semantic_dup"]


def test_survivor_is_farthest_from_centroid(spark):
    # One cell, two near-identical vectors: the one with the LOWER
    # centroid similarity must survive (paper's keep rule).
    a = _unit(1)
    rows = [(0, a), (1, _rot(a, 0.01, 2))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = {
        r["vec_id"]: r
        for r in semantic_dedup_verdicts(df, n_clusters=1, threshold=0.99).collect()
    }
    dup = [i for i, r in v.items() if r["is_semantic_dup"]]
    keep = [i for i, r in v.items() if not r["is_semantic_dup"]]
    assert len(dup) == 1 and len(keep) == 1
    assert v[keep[0]]["centroid_sim"] <= v[dup[0]]["centroid_sim"]
    assert v[keep[0]]["keep_rank"] == 1


def test_non_recursive_chain_semantics(spark):
    """A~B and B~C but A!~C: with keep order A < B < C, B is a dup
    (vs A) and C is a dup iff it is within τ of ANY earlier member —
    including the dropped B. SemDeDup's released implementation does
    not re-check against survivors only; pin that."""
    a = _unit(1)
    b = _rot(a, 0.06, 2)  # cos(a,b) ~ 0.9982
    c = _rot(b, 0.06, 3)  # cos(b,c) ~ 0.9982, cos(a,c) ~ 0.9964
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id long, embedding array<double>"
    )
    v = semantic_dedup_verdicts(df, n_clusters=1, threshold=0.998)
    rows = {r["vec_id"]: r for r in v.collect()}
    ranks = sorted(rows.values(), key=lambda r: r["keep_rank"])
    dups = {r["vec_id"] for r in rows.values() if r["is_semantic_dup"]}
    first = ranks[0]["vec_id"]
    assert first not in dups
    # Exactly the members within τ of an earlier-ranked member are
    # dups — compute expectation directly from the rank order.
    import itertools

    def cos(x, y):
        return sum(p * q for p, q in zip(x, y))

    vecs = {0: a, 1: b, 2: c}
    expected = set()
    order = [r["vec_id"] for r in ranks]
    for i, j in itertools.combinations(range(3), 2):
        if round(cos(vecs[order[i]], vecs[order[j]]), 6) >= 0.998:
            expected.add(order[j])
    assert dups == expected
    assert len(dups) >= 1  # the chain actually exercised the rule


def test_threshold_above_one_drops_nothing(clustered):
    out = semantic_dedup(clustered, n_clusters=3, threshold=1.01)
    assert out.count() == clustered.count()


def test_partition_invariance(clustered):
    a = semantic_dedup_verdicts(
        clustered.repartition(1), n_clusters=3, threshold=0.995
    ).orderBy("vec_id").collect()
    b = semantic_dedup_verdicts(
        clustered.repartition(7), n_clusters=3, threshold=0.995
    ).orderBy("vec_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_kmeans_refinement_mode_runs_and_dedups(clustered):
    out = semantic_dedup(clustered, n_clusters=3, threshold=0.995, kmeans_iters=2)
    assert 0 < out.count() < clustered.count()


def test_dedup_output_equals_verdict_filter(clustered):
    verdicts = semantic_dedup_verdicts(clustered, n_clusters=3, threshold=0.995)
    keep_ids = {
        r["vec_id"] for r in verdicts.filter(~F.col("is_semantic_dup")).collect()
    }
    out_ids = {
        r["vec_id"]
        for r in semantic_dedup(clustered, n_clusters=3, threshold=0.995).collect()
    }
    assert out_ids == keep_ids


def test_semantic_dedup_zero_vector_is_not_nan_dup(spark):
    # A zero embedding must score centroid_sim 0.0 (oracle's clamp)
    # and must NOT be marked duplicate via Spark's NaN>=threshold
    # ordering quirk.
    from karanta_ocr_spark.operators.semdedup import semantic_dedup_verdicts

    rows = [(i, [float((i * 3 + j) % 5 - 2) for j in range(8)]) for i in range(12)]
    rows.append((99, [0.0] * 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           semantic_dedup_verdicts(df, n_clusters=3).collect()}
    z = out[99]
    assert z["centroid_sim"] == 0.0
    assert z["is_semantic_dup"] is False


def test_pair_kernel_matches_catalyst_join(spark):
    # The r6 numpy pair kernel must reproduce the JVM formulation
    # bit-for-bit: same dimension-ascending add order as the
    # zip_with+aggregate fold, same HALF_UP 6-dp threshold decision.
    import random

    from pyspark.sql import functions as F

    from karanta_ocr_spark.operators.semdedup import semantic_dedup_verdicts
    from karanta_ocr_spark.operators.similarity import cosine_guarded

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(16)])
        for i in range(120)
    ]
    # seed some exact duplicates and near-duplicates
    for i in range(0, 30, 3):
        rows[i + 1] = (i + 1, rows[i][1])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semantic_dedup_verdicts(df, n_clusters=4, threshold=0.9, seed=3)

    ranked = got.select("vec_id", "cell", "keep_rank")
    vecs = df
    a = ranked.join(vecs, "vec_id").select(
        F.col("cell"), F.col("vec_id").alias("_ida"),
        F.col("embedding").alias("_va"), F.col("keep_rank").alias("_ra"))
    b = ranked.join(vecs, "vec_id").select(
        F.col("cell"), F.col("vec_id").alias("_idb"),
        F.col("embedding").alias("_vb"), F.col("keep_rank").alias("_rb"))
    jvm_dups = {
        r["_ida"]
        for r in a.join(b, on="cell")
        .filter(F.col("_rb") < F.col("_ra"))
        .filter(F.round(cosine_guarded(F.col("_va"), F.col("_vb")), 6)
                >= 0.9)
        .select("_ida").distinct().collect()
    }
    kernel_dups = {
        r["vec_id"] for r in got.filter("is_semantic_dup").collect()
    }
    assert kernel_dups == jvm_dups and len(kernel_dups) > 0
