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
    is broadcast/skew-handled by AQE. The final dropDuplicates keeps
    the contract even when physically duplicate (key, id) rows exist
    (e.g. a shard ingested twice) — the semi-join alone would keep
    both copies.
    """
    winners = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(winners, on=key_cols + [id_col], how="left_semi").dropDuplicates(
        key_cols + [id_col]
    )


# ------------------------------------------------------------- minhash
def _shingles_expr(text_col: str, k: int, unit: str = "word") -> str:
    """SQL text for the distinct k-shingle array.

    ``unit='word'`` (default): k-word shingles — the web-scale choice
    (RefinedWeb/Gopher style): ~6× fewer elements per document than
    char shingles, which matters because higher-order-function lambdas
    are interpreted (per-element overhead dominates the stage).
    ``unit='char'``: classic k-char shingles for short/CJK-ish text.
    """
    if unit == "word":
        toks = f"split(lower(trim({text_col})), '\\\\s+')"
        return (
            f"CASE WHEN size({toks}) < {k} THEN array(array_join({toks}, ' ')) "
            f"ELSE array_distinct(transform(sequence(1, size({toks}) - {k} + 1), "
            f"i -> array_join(slice({toks}, i, {k}), ' '))) END"
        )
    canon = f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))"
    return (
        f"CASE WHEN length({canon}) < {k} THEN array({canon}) "
        f"ELSE array_distinct(transform(sequence(1, length({canon}) - {k} + 1), "
        f"i -> substring({canon}, i, {k}))) END"
    )


#: 31-bit prime for the (a*h+b) mod p permutation family — the same
#: construction Spark MLlib's MinHashLSH uses publicly.
_MINHASH_PRIME = 2038074743


def _perm_coeffs(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs, a odd and nonzero — plain Python
    ints baked into the plan as literals."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MINHASH_PRIME) | 1, rng.randrange(0, _MINHASH_PRIME))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
    shingle_unit: str = "word",
) -> DataFrame:
    """Add ``minhash: array<bigint>`` of length *num_perm*.

    One ``xxhash64`` per shingle (masked to 31 bits), then each
    permutation p applies ``(a_p*h + b_p) mod prime`` and takes the
    array min. Products stay < 2^62, so the math is ANSI-overflow-safe
    and the whole signature is ~num_perm fused array ops in codegen —
    no per-permutation string hashing.
    """
    coeffs = _perm_coeffs(num_perm, seed)
    df = df.withColumn("_shingles", F.expr(_shingles_expr(text_col, shingle_k, shingle_unit)))
    df = df.withColumn(
        "_sh_hashes",
        F.expr("transform(_shingles, s -> xxhash64(s) & 2147483647)"),
    )
    sig = F.array(
        *[
            F.array_min(
                F.expr(f"transform(_sh_hashes, h -> pmod({a} * h + {b}, {_MINHASH_PRIME}))")
            )
            for a, b in coeffs
        ]
    )
    return df.withColumn("minhash", sig).drop("_shingles", "_sh_hashes")


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
    shingle_k: int = 3,
    threshold: float = 0.8,
    shingle_unit: str = "word",
) -> DataFrame:
    """Drop near-duplicates: keep the min-id representative of every
    near-dup pair group (estimated Jaccard = signature agreement ≥
    *threshold*). Returns the deduplicated rows of *df*."""
    with_sig = minhash_signatures(
        df, text_col, num_perm, shingle_k, shingle_unit=shingle_unit
    ).persist()
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
    # member loses at least one pair). localCheckpoint materializes the
    # (small) victim set and truncates its lineage so the cached
    # signatures can be released immediately — without it every call
    # leaked a full corpus+signature cache for the application life.
    victims = (
        dup_pairs.select(F.col("id_b").alias(id_col)).distinct().localCheckpoint()
    )
    with_sig.unpersist()
    return df.join(victims, on=id_col, how="left_anti")


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
    shingle_k: int = 3,
    threshold: float = 0.8,
    shingle_unit: str = "word",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup removal.

    Quadratic verify — at scale this runs only on LSH candidates; the
    standalone form here prefilters pairs by a cheap length-ratio
    bound (|a|/|b| ≥ threshold is necessary for J ≥ threshold)."""
    sh = df.select(
        F.col(id_col), F.expr(_shingles_expr(text_col, shingle_k, shingle_unit)).alias("sh")
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
