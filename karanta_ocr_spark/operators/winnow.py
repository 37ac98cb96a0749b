"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm): select, from each document's
rolling k-gram hash sequence, the minimum hash of every w-hash window
(rightmost occurrence on ties). The guarantee the selection buys:
any match of length ≥ w + k − 1 between two documents shares at
least one selected fingerprint, while only ~2/(w+1) of positions are
kept — the local, position-robust fingerprint family that
whole-document hashing (``doc_fingerprints``) and shingle MinHash
both lack (winnowing survives PREPENDED/APPENDED content byte-for-
byte because selections are made in local windows).

Exact spec (engine-neutral): k-gram i = the lowercased char slice
``text[i : i+k]``; its hash = the first 8 md5 hex chars as a 32-bit
int (the repo's standard md5-derived primitive); window j covers
hashes j..j+w-1; the selection is (position, hash) of the RIGHTMOST
minimum; consecutive windows re-selecting the same position collapse
(set semantics), per the paper.

Scale shape: everything is per-document Catalyst HOF arrays — one
map-only pass, zero shuffle; the exploded (fp, doc_id, pos) table
feeds an ordinary groupBy-on-fp join for cross-document overlap, the
same bucket-join shape as the other dedup families.

Reference scope note: the reference has no fingerprint machinery;
part of the beyond-reference training-data suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hash_expr(gram: str) -> str:
    return f"cast(conv(substring(md5({gram}), 1, 8), 16, 10) as bigint)"


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per selected fingerprint: ``(id_col, pos, fp)`` where
    *pos* is the 0-based k-gram position and *fp* the 32-bit hash.
    Documents shorter than k chars emit one fingerprint of their
    whole (padded-by-truncation) text; shorter than k+w-1 emit the
    min of what they have (window clamped to the available hashes) —
    both edge rules keep every non-empty doc represented."""
    if k < 1 or w < 1:
        raise ValueError("k >= 1 and w >= 1 required")
    # NULL text must behave like "" (the Python twin's `text or ""`):
    # a NULL gram hash would empty the rightmost-min filter and
    # element_at(..., -1) throws under ANSI mode on an empty array.
    t = f"lower(coalesce({text_col}, ''))"
    grams = (
        f"transform(sequence(1, greatest(length({t}) - {k - 1}, 1)), "
        f"i -> substring({t}, i, {k}))"
    )
    hs = f"transform({grams}, g -> {_hash_expr('g')})"
    out = docs.select(F.col(id_col), F.expr(hs).alias("_hs"))
    # windows: j = 0 .. max(n-w, 0); slice clamps at the array end for
    # the short-doc edge rule.
    win = (
        "transform(sequence(0, greatest(size(_hs) - {w}, 0)), "
        "j -> slice(_hs, j + 1, {w}))"
    ).format(w=w)
    sel = (
        "transform({win}, s -> named_struct("
        "'off', element_at(filter(sequence(1, size(s)), "
        "p -> element_at(s, p) = array_min(s)), -1), "
        "'fp', array_min(s)))"
    ).format(win=win)
    # back to absolute positions, then set semantics
    fps = (
        "array_distinct(transform(sequence(1, size(_sel)), "
        "j -> named_struct('pos', j - 1 + element_at(_sel, j).off - 1, "
        "'fp', element_at(_sel, j).fp)))"
    )
    return (
        out.withColumn("_sel", F.expr(sel))
        .select(id_col, F.explode(F.expr(fps)).alias("_f"))
        .select(
            id_col,
            F.col("_f.pos").cast("long").alias("pos"),
            F.col("_f.fp").alias("fp"),
        )
    )


def winnow_overlap_pairs(
    fps: DataFrame, id_col: str = "doc_id", min_shared: int = 2
) -> DataFrame:
    """Cross-document candidate pairs by shared fingerprints:
    ``(id_a, id_b, n_shared)`` with id_a < id_b — the MOSS report
    join. Fingerprint-bucketed (groupBy fp), never all-pairs; hot
    boilerplate fingerprints are ordinary join skew (AQE)."""
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("fp").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


def winnow_python(text: str, k: int = 5, w: int = 4) -> set[tuple[int, int]]:
    """Independent Python twin of :func:`winnow_fingerprints` for one
    document — the pytest parity reference."""
    import hashlib

    t = (text or "").lower()
    n_grams = max(len(t) - k + 1, 1)
    hs = [
        int(hashlib.md5(t[i: i + k].encode()).hexdigest()[:8], 16)
        for i in range(n_grams)
    ]
    sel: set[tuple[int, int]] = set()
    for j in range(max(len(hs) - w, 0) + 1):
        window = hs[j: j + w]
        m = min(window)
        off = max(i for i, h in enumerate(window) if h == m)
        sel.add((j + off, m))
    return sel
