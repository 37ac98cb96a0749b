"""Deduplication operators for large-scale training-data pipelines.

All are DataFrame compositions designed for the shuffle profile at
10^12 rows:

* :func:`exact_dedup` — one groupBy(min) + semi-join; with AQE the
  join broadcasts when the winner set is small and skew-splits when a
  single text value is hot (the empty-string pathology).
* :func:`minhash_signatures` / :func:`minhash_lsh_dedup` — classic
  MinHash+LSH (Broder '97): char-shingles → P per-permutation min
  hashes → B bands hashed to buckets → candidate pairs only within a
  bucket (the quadratic step never touches the full corpus) →
  verified Jaccard ≥ threshold → connected representatives dropped.
  Everything up to the bucket join is Catalyst higher-order functions
  over ``xxhash64`` — zero Python.
* :func:`simhash64` / :func:`simhash_dedup` — 64-bit SimHash (Charikar
  '02) via JVM bit math; near-dups = equal simhash (Hamming-0 fast
  path; band-rotated variants give Hamming>0 at scale).
* :func:`ngram_jaccard_dedup` — exact n-gram Jaccard verification used
  standalone (small data) or as the LSH verify stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


# --------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row (minimal *id_col*) per *key_cols* value.

    groupBy + semi-join rather than a window: a window sorts every
    partition by the (possibly huge, possibly skewed) text key, while
    groupBy(min) does a partial-aggregate map-side and the join back
    is broadcast/skew-handled by AQE.
    """
    winners = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(winners, on=key_cols + [id_col], how="left_semi")


# ------------------------------------------------------------- minhash
def _shingles_expr(text_col: str, k: int) -> str:
    """SQL text for the shingle array (substring with a dynamic start
    needs expr; DataFrame substring() only takes literals)."""
    canon = f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))"
    return (
        f"CASE WHEN length({canon}) < {k} THEN array({canon}) "
        f"ELSE array_distinct(transform(sequence(1, length({canon}) - {k} + 1), "
        f"i -> substring({canon}, i, {k}))) END"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """Add ``minhash: array<bigint>`` of length *num_perm*.

    Permutation p's hash of shingle s is ``xxhash64(p, s)`` (seeding
    by prepending the permutation index as a column — one JVM hash per
    (p, shingle)); the signature entry is the min over shingles.
    """
    df = df.withColumn("_shingles", F.expr(_shingles_expr(text_col, shingle_k)))
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda p: F.aggregate(
            F.col("_shingles"),
            F.lit(None).cast("bigint"),
            lambda acc, s: F.least(
                F.coalesce(acc, F.lit(2**63 - 1)), F.xxhash64(p, s)
            ),
        ),
    )
    return df.withColumn("minhash", sig).drop("_shingles")


def lsh_bands(num_perm: int, bands: int) -> "F.Column":
    """Band hashes: split the signature into *bands* rows-per-band
    groups, hash each with its band index."""
    rows = num_perm // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(b, F.slice(F.col("minhash"), b * rows + 1, rows).cast("string")),
    )


def candidate_pairs(
    with_sig: DataFrame, id_col: str, bands: int, num_perm: int
) -> DataFrame:
    """Bucket-join candidate generation: explode band hashes, self-join
    within (band, bucket). Only same-bucket rows ever meet — this is
    the step that keeps near-dup detection sub-quadratic at scale."""
    exploded = with_sig.select(
        F.col(id_col), F.col("minhash"),
        F.posexplode(lsh_bands(num_perm, bands)).alias("band", "bucket"),
    )
    left = exploded.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"), "band", "bucket"
    )
    right = exploded.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"), "band", "bucket"
    )
    return (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "mh_a", "mh_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Drop near-duplicates: keep the min-id representative of every
    near-dup pair group (estimated Jaccard = signature agreement ≥
    *threshold*). Returns the deduplicated rows of *df*."""
    with_sig = minhash_signatures(df, text_col, num_perm, shingle_k).persist()
    pairs = candidate_pairs(with_sig, id_col, bands, num_perm)
    est = pairs.withColumn(
        "est_jaccard",
        F.size(
            F.filter(
                F.zip_with("mh_a", "mh_b", lambda a, b: a == b),
                lambda x: x,
            )
        )
        / F.lit(num_perm),
    )
    dup_pairs = est.filter(F.col("est_jaccard") >= threshold)
    # Victims: the larger id of each pair (min-id representative
    # survives; transitive chains collapse because every non-minimal
    # member loses at least one pair).
    victims = dup_pairs.select(F.col("id_b").alias(id_col)).distinct()
    out = with_sig.join(victims, on=id_col, how="left_anti").drop("minhash")
    return out


# ------------------------------------------------------------- simhash
def simhash64(text_col: str) -> Column:
    """64-bit SimHash over whitespace tokens, fully JVM:

    per token t: h = xxhash64(t); for each bit b the counter gets +1
    if the bit is set else -1; final bit b = counter > 0. One
    aggregate with an array<int>[64] accumulator — O(tokens × 64) bit
    ops inside codegen, no Python. (SQL text because the Python
    shiftright/shiftleft wrappers require literal bit counts.)"""
    toks = f"split(lower(trim({text_col})), '\\\\s+')"
    per_token_bits = (
        "transform(sequence(0, 63), b -> "
        "IF((shiftright(xxhash64(t), b) & 1) = 1, 1, -1))"
    )
    fold_bits = (
        "aggregate(zip_with(acc, sequence(0, 63), (c, b) -> "
        "IF(c > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))), "
        "cast(0 as bigint), (s, v) -> s | v)"
    )
    return F.expr(
        f"aggregate({toks}, array_repeat(0, 64), "
        f"(acc, t) -> zip_with(acc, {per_token_bits}, (a, d) -> a + d), "
        f"acc -> {fold_bits})"
    )


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-simhash dedup (Hamming distance 0): one shuffle on the
    64-bit key."""
    with_sh = df.withColumn("simhash", simhash64(text_col))
    return exact_dedup(with_sh, ["simhash"], id_col)


# ------------------------------------------------------- n-gram jaccard
def ngram_jaccard_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup removal.

    Quadratic verify — at scale this runs only on LSH candidates; the
    standalone form here prefilters pairs by a cheap length-ratio
    bound (|a|/|b| ≥ threshold is necessary for J ≥ threshold)."""
    sh = df.select(
        F.col(id_col), F.expr(_shingles_expr(text_col, shingle_k)).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
                  F.size("sh").alias("n_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
                  F.size("sh").alias("n_b"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("n_a", "n_b") >= F.greatest("n_a", "n_b") * F.lit(threshold)
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    victims = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(victims, on=id_col, how="left_anti")
