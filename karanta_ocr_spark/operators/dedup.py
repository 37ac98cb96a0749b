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
  '02); Hamming-0 fast path over one shuffle.
* :func:`simhash_dedup_banded` — Hamming ≤ k near-dups via the Manku
  WWW'07 pigeonhole band trick: k+1 bit slices, equi-join per slice,
  ``bit_count(xor)`` verify.
* :func:`ngram_jaccard_dedup` — exact n-gram Jaccard verify over LSH
  candidate pairs (all-pairs cross join only behind ``small_data``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from karanta_ocr_spark.functions.text_analysis import WS_SQL


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
def _shingle_base_sql(text_col: str, unit: str) -> str:
    """The tokenization/canonicalization to HOIST into a column before
    building shingles: Catalyst does not common-subexpression-
    eliminate across lambda boundaries, so inlining this into the
    transform lambda re-tokenizes once PER SHINGLE — O(tokens²) per
    document (measured 4-5× on the LM operator's identical shape)."""
    if unit == "word":
        return f"split(lower(trim({text_col})), '{WS_SQL}+')"
    return f"lower(regexp_replace(trim({text_col}), '{WS_SQL}+', ' '))"


def _shingles_from_base(base_col: str, k: int, unit: str = "word") -> str:
    """Distinct k-shingle array over a PRE-HOISTED base column
    (token array for ``unit='word'``, canonical string for
    ``unit='char'``)."""
    if unit == "word":
        return (
            f"CASE WHEN size({base_col}) < {k} THEN array(array_join({base_col}, ' ')) "
            f"ELSE array_distinct(transform(sequence(1, size({base_col}) - {k} + 1), "
            f"i -> array_join(slice({base_col}, i, {k}), ' '))) END"
        )
    return (
        f"CASE WHEN length({base_col}) < {k} THEN array({base_col}) "
        f"ELSE array_distinct(transform(sequence(1, length({base_col}) - {k} + 1), "
        f"i -> substring({base_col}, i, {k}))) END"
    )


def _shingles_expr(text_col: str, k: int, unit: str = "word") -> str:
    """SQL text for the distinct k-shingle array straight off the text
    column — the SPEC formulation (one expression, matches the DuckDB
    oracle's CTE shape). Plan-building callers should hoist
    ``_shingle_base_sql`` into a column and use
    ``_shingles_from_base`` instead (see its docstring for why).

    ``unit='word'`` (default): k-word shingles — the web-scale choice
    (RefinedWeb/Gopher style): ~6× fewer elements per document than
    char shingles, which matters because higher-order-function lambdas
    are interpreted (per-element overhead dominates the stage).
    ``unit='char'``: classic k-char shingles for short/CJK-ish text.
    """
    return _shingles_from_base(_shingle_base_sql(text_col, unit), k, unit)


#: 31-bit prime for the (a*h+b) mod p permutation family — the same
#: construction Spark MLlib's MinHashLSH uses publicly.
_MINHASH_PRIME = 2038074743


def _shingle_hash_expr(base_hash: str) -> str:
    """Per-shingle 31-bit base hash as SQL text over binding ``s``.

    ``xxhash64`` keeps hashing JVM-side — one JVM hash per shingle,
    no string churn. ``md5`` is bit-reproducible in any
    engine with an MD5 builtin (first 8 hex chars → int, masked to 31
    bits), which is what lets the full MinHash/LSH dedup pipeline be
    verified end-to-end against an independent SQL oracle (DuckDB) —
    same algorithm, swappable hash primitive."""
    if base_hash == "xxhash64":
        return "xxhash64(s) & 2147483647"
    if base_hash == "md5":
        return "cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) & 2147483647"
    raise ValueError(f"unknown base_hash: {base_hash!r}")


def _token_hash_expr(base_hash: str) -> str:
    """Per-token 64-bit base hash as SQL text over binding ``t`` (for
    SimHash). md5 mode assembles the first 8 md5 bytes from two 32-bit
    halves (``conv`` of 16 hex chars can exceed signed int64; the
    shift/or is pure bit math, no overflow check)."""
    if base_hash == "xxhash64":
        return "xxhash64(t)"
    if base_hash == "md5":
        return (
            "(shiftleft(cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint), 32)"
            " | cast(conv(substring(md5(t), 9, 8), 16, 10) as bigint))"
        )
    raise ValueError(f"unknown base_hash: {base_hash!r}")


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
    use_numpy: bool = True,
    base_hash: str = "md5",
    emit_bands: int | None = None,
) -> DataFrame:
    """Add ``minhash: array<bigint>`` of length *num_perm* (and, with
    ``emit_bands=B``, a ``_bands: array<bigint>`` of B LSH bucket ids).

    One base hash per shingle (masked to 31 bits); each permutation p
    then applies ``(a_p*h + b_p) mod prime`` and takes the min.
    Products stay < 2^62, so the math is ANSI-overflow-safe and exact
    in int64 either way.

    Path selection:

    * ``use_numpy=False`` — the pure-Catalyst spec formulation
      (shingle expr → JVM hash → HOF permutation fold), bit-identical
      reference for the parity tests.
    * xxhash64 + numpy — shingle + hash stay JVM-side (xxhash64 has
      no stdlib twin), only the permutation fold crosses into numpy.
      Kept as the JVM-side spec mode; measured SLOWER end-to-end than
      the fused path (6.0 s vs 1.9 s full dedup at sf0.1, local[32])
      because pandas materializes a Python object per shingle-hash
      array element at the Arrow boundary.
    * md5 + numpy (production default) — the FUSED path: raw text
      crosses Arrow once and
      tokenize → shingle → md5 → permutation fold → band buckets all
      run inside the batch. Shipping shingle string arrays through
      Arrow was 3.5 s of the 4.1 s signature stage at sf0.1 (pandas
      materializes a Python string object per shingle); the text
      itself is ~3× smaller and stays a flat column. Tokenization
      replicates the Catalyst expression exactly: ``strip(' ')`` =
      SQL ``trim``, ``str.lower()``, and the shared ``[ \\t-\\r]+``
      whitespace class (``re`` and Java agree on it, unlike ``\\s``).
      Case-mapping caveat: Python/DuckDB lower() use the simple
      Unicode mapping while the JVM's is locale-free FULL mapping —
      they differ on Greek final sigma, so the fused path agrees with
      the ORACLE there and the Catalyst spec path differs; parity
      fixtures avoid the divergent code points.

    Band buckets (``emit_bands``) are the md5-mode :func:`lsh_bands`
    values computed in the same pass — ``int(md5("b:v1,…,vr")[:15],
    16)`` — so candidate generation needs no JVM md5/concat per band.
    """
    coeffs = _perm_coeffs(num_perm, seed)
    hash_in_python = use_numpy and base_hash == "md5"
    if emit_bands is not None and not hash_in_python:
        raise ValueError("emit_bands requires the md5+numpy fused path")
    if not hash_in_python:
        df = df.withColumn(
            "_shbase", F.expr(_shingle_base_sql(text_col, shingle_unit))
        ).withColumn(
            "_shingles",
            F.expr(_shingles_from_base("_shbase", shingle_k, shingle_unit)),
        ).drop("_shbase")
        df = df.withColumn(
            "_sh_hashes",
            F.expr(f"transform(_shingles, s -> {_shingle_hash_expr(base_hash)})"),
        ).drop("_shingles")
    if not use_numpy:
        sig = F.array(
            *[
                F.array_min(
                    F.expr(f"transform(_sh_hashes, h -> pmod({a} * h + {b}, {_MINHASH_PRIME}))")
                )
                for a, b in coeffs
            ]
        )
        return df.withColumn("minhash", sig).drop("_sh_hashes")

    import numpy as np

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    if shingle_unit not in ("word", "char"):
        raise ValueError(f"unknown shingle_unit: {shingle_unit!r}")
    A = np.asarray([a for a, _ in coeffs], dtype=np.int64)[:, None]
    B = np.asarray([b for _, b in coeffs], dtype=np.int64)[:, None]
    feed_col = text_col if hash_in_python else "_sh_hashes"
    out_fields = [f for f in df.schema.fields if f.name != "_sh_hashes"]
    schema = StructType(out_fields + [StructField("minhash", ArrayType(LongType()))])
    if emit_bands is not None:
        schema = schema.add(StructField("_bands", ArrayType(LongType())))
    rows_per_band = num_perm // emit_bands if emit_bands else 0

    #: bound the (num_perm × chunk_tokens) int64 working set per step
    #: (~64 MB at num_perm=64) — independent of Arrow batch sizing.
    chunk_tokens = 1 << 17

    def run(batches):
        import hashlib
        import re

        ws_re = re.compile(r"[ \t-\r]+")

        def h31(arr):
            return np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
                    & 0x7FFFFFFF
                    for s in arr
                ),
                dtype=np.int64,
                count=len(arr),
            )

        def shingle_hashes(txt):
            # Twin of _shingles_expr + _shingle_hash_expr('md5'):
            # trim(' ') → lower → [ \t-\r]+ split → k-grams (the
            # whole token list as ONE shingle when shorter than k).
            # No distinct: duplicate shingles cannot change a min.
            if shingle_unit == "word":
                toks = ws_re.split(txt.strip(" ").lower())
                if len(toks) < shingle_k:
                    return h31([" ".join(toks)])
                return h31(
                    [
                        " ".join(toks[i : i + shingle_k])
                        for i in range(len(toks) - shingle_k + 1)
                    ]
                )
            canon = ws_re.sub(" ", txt.strip(" ")).lower()
            if len(canon) < shingle_k:
                return h31([canon])
            return h31(
                [canon[i : i + shingle_k] for i in range(len(canon) - shingle_k + 1)]
            )

        for pdf in batches:
            if not len(pdf):
                pdf = pdf.copy()
                if not hash_in_python:
                    pdf = pdf.drop(columns=["_sh_hashes"])
                pdf["minhash"] = []
                if emit_bands is not None:
                    pdf["_bands"] = []
                yield pdf
                continue
            # NULL text → NULL shingle array; the pure-Catalyst
            # formulation then yields an array of num_perm nulls
            # (array_min over a null array per permutation) — match it.
            if hash_in_python:
                arrs = [
                    None if v is None else shingle_hashes(v) for v in pdf[feed_col]
                ]
            else:
                arrs = [
                    None if v is None else np.asarray(v, dtype=np.int64)
                    for v in pdf[feed_col]
                ]
            null_sig = [None] * num_perm
            sigs: list = [null_sig] * len(arrs)
            i = 0
            while i < len(arrs):
                j = i
                tok = 0
                group: list[int] = []
                while j < len(arrs) and (tok == 0 or tok < chunk_tokens):
                    if arrs[j] is not None and len(arrs[j]):
                        group.append(j)
                        tok += len(arrs[j])
                    j += 1
                if group:
                    flat = np.concatenate([arrs[g] for g in group])
                    # (num_perm × tokens); products < 2^62, exact.
                    perm = (A * flat[None, :] + B) % _MINHASH_PRIME
                    lens = np.asarray([len(arrs[g]) for g in group])
                    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    mins = np.minimum.reduceat(perm, offsets, axis=1)
                    for col, g in enumerate(group):
                        sigs[g] = mins[:, col].tolist()
                i = j
            pdf = pdf.copy()
            if not hash_in_python:
                pdf = pdf.drop(columns=["_sh_hashes"])
            pdf["minhash"] = sigs
            if emit_bands is not None:
                bands_out = []
                for sig in sigs:
                    if sig and sig[0] is None:
                        bands_out.append(None)
                        continue
                    bands_out.append(
                        [
                            int(
                                hashlib.md5(
                                    (
                                        f"{b}:"
                                        + ",".join(
                                            str(v)
                                            for v in sig[
                                                b * rows_per_band : (b + 1)
                                                * rows_per_band
                                            ]
                                        )
                                    ).encode()
                                ).hexdigest()[:15],
                                16,
                            )
                            for b in range(emit_bands)
                        ]
                    )
                pdf["_bands"] = bands_out
            yield pdf

    return df.mapInPandas(run, schema=schema)


def lsh_bands(num_perm: int, bands: int, base_hash: str = "xxhash64") -> "F.Column":
    """Band hashes: split the signature into *bands* rows-per-band
    groups, hash each with its band index.

    md5 mode renders the slice as ``band:v1,v2,…`` (engine-neutral,
    unlike a raw array→string cast) and takes the first 15 md5 hex
    chars as a 60-bit positive bucket id — reproducible in the DuckDB
    oracle."""
    rows = num_perm // bands
    if base_hash == "xxhash64":
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(b, F.slice(F.col("minhash"), b * rows + 1, rows).cast("string")),
        )
    if base_hash != "md5":
        raise ValueError(f"unknown base_hash: {base_hash!r}")

    def band_bucket(b: Column) -> Column:
        slice_csv = F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("minhash"), b * rows + 1, F.lit(rows)),
                lambda x: x.cast("string"),
            ),
        )
        digest = F.md5(F.concat_ws(":", b.cast("string"), slice_csv))
        return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint")

    return F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), band_bucket)


def candidate_pairs(
    with_sig: DataFrame, id_col: str, bands: int, num_perm: int,
    bucket_cap: int = 64,
    base_hash: str = "xxhash64",
    bands_col: str | None = None,
    dedupe_pairs: bool = True,
) -> DataFrame:
    """Bucket-join candidate generation: explode band hashes, self-join
    within (band, bucket). Only same-bucket rows ever meet — this is
    the step that keeps near-dup detection sub-quadratic at scale.

    Hot buckets (boilerplate-identical or empty docs all landing in one
    bucket) would make the self-join quadratic in the bucket size:
    1k identical docs → 500k pairs PER BAND. Buckets over *bucket_cap*
    therefore switch to star linking — every member pairs with the
    bucket's min-id anchor only (O(n) pairs), which still collapses
    identical/near-identical groups transitively because each
    non-anchor member loses its pair against the anchor. The recall
    trade (a pair similar to each other but not to the anchor) only
    applies inside oversized buckets, where all-pairs was never viable.

    ``bands_col`` names a precomputed per-band bucket array (the fused
    signature path emits one) — the explode then reads it directly
    instead of re-hashing band slices JVM-side.
    """
    band_src = (
        F.col(bands_col)
        if bands_col is not None
        else lsh_bands(num_perm, bands, base_hash)
    )
    exploded = with_sig.select(
        F.col(id_col), F.col("minhash"),
        F.posexplode(band_src).alias("band", "bucket"),
    )
    anchors = exploded.groupBy("band", "bucket").agg(
        F.min(id_col).alias("_anchor_id"),
        F.min_by("minhash", F.col(id_col)).alias("_anchor_mh"),
        F.count("*").alias("_bn"),
    )
    sized = exploded.join(anchors, on=["band", "bucket"])
    small = sized.filter(F.col("_bn") <= bucket_cap)
    left = small.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"), "band", "bucket"
    )
    right = small.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"), "band", "bucket"
    )
    pairs_small = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "mh_a", "mh_b")
    )
    pairs_big = (
        sized.filter(F.col("_bn") > bucket_cap)
        .filter(F.col(id_col) != F.col("_anchor_id"))
        .select(
            F.col("_anchor_id").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.col("_anchor_mh").alias("mh_a"),
            F.col("minhash").alias("mh_b"),
        )
    )
    pairs = pairs_small.unionByName(pairs_big)
    # dedupe_pairs=False skips the pair-level shuffle: a pair sharing
    # several bands is then emitted once per band, which is the right
    # trade when the verify is a cheap per-row expression and the
    # victim set is distinct-ed downstream (minhash est-Jaccard).
    # Keep True when each pair feeds an expensive verify (the n-gram
    # exact-Jaccard join) — there the dedup shuffle pays for itself.
    return pairs.dropDuplicates(["id_a", "id_b"]) if dedupe_pairs else pairs


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    shingle_unit: str = "word",
    base_hash: str = "md5",
) -> DataFrame:
    """Drop near-duplicates: keep the min-id representative of every
    near-dup pair group (estimated Jaccard = signature agreement ≥
    *threshold*). Returns the deduplicated rows of *df*.

    ``base_hash='md5'`` (the default) runs the FUSED signature path
    AND makes every hash primitive (shingle hash, band bucket)
    MD5-derived, so the whole pipeline is reproducible in an
    independent SQL engine — the DuckDB oracle in
    ``__spark_entry__.oracle_sql()['minhash_dedup']`` replays it
    end-to-end. It is also the measured-fastest mode (1.9 s vs 6.0 s
    for xxhash64 at sf0.1, local[32]: the fused path avoids shipping
    per-shingle hash arrays through Arrow, which dominates — the hash
    primitive itself is noise). ``'xxhash64'`` keeps signature
    hashing JVM-side as the spec/parity mode."""
    fused = base_hash == "md5"
    with_sig = minhash_signatures(
        df, text_col, num_perm, shingle_k, shingle_unit=shingle_unit,
        base_hash=base_hash, emit_bands=bands if fused else None,
    ).persist()
    pairs = candidate_pairs(
        with_sig, id_col, bands, num_perm, base_hash=base_hash,
        bands_col="_bands" if fused else None, dedupe_pairs=False,
    )
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


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    shingle_unit: str = "word",
    seed: int = 42,
) -> DataFrame:
    """The persisted-index half of INCREMENTAL near-dup: signatures +
    exploded band buckets ``(id, minhash, band, bucket)`` for the
    existing corpus. In production this table is written ONCE (e.g.
    partitioned/bucketed by ``(band, bucket)``) and each crawl
    increment probes it — the 100 TB corpus is never re-signatured,
    which is the entire point: per-increment cost is proportional to
    the INCREMENT, not the corpus."""
    sigs = minhash_signatures(
        df.select(id_col, text_col), text_col, num_perm, shingle_k,
        seed=seed, shingle_unit=shingle_unit, base_hash="md5",
        emit_bands=bands,
    )
    return sigs.select(
        F.col(id_col).alias("index_id"),
        F.col("minhash").alias("index_mh"),
        F.posexplode("_bands").alias("band", "bucket"),
    )


def minhash_dedup_against_index(
    new_df: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.8,
    shingle_unit: str = "word",
    seed: int = 42,
) -> DataFrame:
    """Incremental near-dup: flag each NEW document that
    near-duplicates the EXISTING corpus (per :func:`minhash_index`,
    same seed/params — signatures are only comparable within one
    parameterization).

    Returns one row per *new_df* row: ``(id_col, n_index_matches,
    is_dup)`` — ``n_index_matches`` = distinct index docs whose
    estimated Jaccard (signature agreement) ≥ *threshold*;
    ``is_dup`` = any match. Callers drop ``is_dup`` rows and append
    the survivors' signatures to the index, closing the loop.

    Scale shape: the new batch signatures in one fused Arrow pass,
    explodes to (band, bucket) and equi-joins the index — with the
    index bucketed on (band, bucket) only the increment shuffles.
    Band-collision candidates are verified on the full signature;
    the same-pair-from-multiple-bands duplication is collapsed AFTER
    the cheap verify (distinct on matched ids), never before (a
    pre-verify distinct would shuffle signature arrays)."""
    nsig = minhash_signatures(
        new_df.select(id_col, text_col), text_col, num_perm, shingle_k,
        seed=seed, shingle_unit=shingle_unit, base_hash="md5",
        emit_bands=bands,
    )
    probes = nsig.select(
        F.col(id_col), F.col("minhash"),
        F.posexplode("_bands").alias("band", "bucket"),
    )
    agree = F.size(
        F.filter(
            F.zip_with("minhash", "index_mh", lambda a, b: a == b),
            lambda x: x,
        )
    )
    matches = (
        probes.join(index, on=["band", "bucket"])
        .withColumn("_agree", agree)
        .filter(F.col("_agree") / F.lit(num_perm) >= threshold)
        .select(id_col, "index_id")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_index_matches"))
    )
    return (
        new_df.select(id_col)
        .join(matches, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_index_matches", F.lit(0).cast("long")).alias(
                "n_index_matches"
            ),
            (F.coalesce("n_index_matches", F.lit(0)) > 0).alias("is_dup"),
        )
    )


# ------------------------------------------------------------- simhash
def simhash64(text_col: str, base_hash: str = "xxhash64") -> Column:
    """64-bit SimHash over whitespace tokens, fully JVM:

    per token t: h = base_hash(t); for each bit b the counter gets +1
    if the bit is set else -1; final bit b = counter > 0. One
    aggregate with an array<int>[64] accumulator — O(tokens × 64) bit
    ops inside codegen, no Python. (SQL text because the Python
    shiftright/shiftleft wrappers require literal bit counts.)
    ``base_hash='md5'`` makes the signature reproducible in the DuckDB
    oracle; ``(h >> b) & 1`` extracts bit b correctly for either mode
    even though shiftright sign-extends (the mask keeps only bit 0)."""
    toks = f"split(lower(trim({text_col})), '{WS_SQL}+')"
    per_token_bits = (
        "transform(sequence(0, 63), b -> "
        f"IF((shiftright({_token_hash_expr(base_hash)}, b) & 1) = 1, 1, -1))"
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


def with_simhash64(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "simhash",
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Append the 64-bit SimHash, numerically identical to
    :func:`simhash64` but ~an order of magnitude cheaper per byte:
    token hashing stays JVM-side (one ``xxhash64`` per token), while
    the O(tokens × 64) ±1 bit-count accumulation — interpreted HOF
    lambdas in the Catalyst variant, the whole cost of the 8 s r01
    ``simhash_dedup`` headline — runs as one vectorized numpy
    ``reduceat`` per Arrow batch."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    toks = f"split(lower(trim({text_col})), '{WS_SQL}+')"
    # md5 mode hashes tokens inside the Arrow batch (hashlib) instead
    # of the JVM Md5/Conv expression pair — identical bits (first 8
    # md5 bytes big-endian), pinned by the Catalyst parity test.
    hash_in_python = base_hash == "md5"
    if hash_in_python:
        hashed = df.withColumn("_tok_h", F.expr(toks))
    else:
        hashed = df.withColumn(
            "_tok_h", F.expr(f"transform({toks}, t -> {_token_hash_expr(base_hash)})")
        )
    schema = StructType(list(hashed.schema.fields) + [StructField(out_col, LongType())])
    shifts = np.arange(64, dtype=np.uint64)

    #: bound the (chunk_tokens × 64) int8 bit-matrix working set per
    #: step (~8 MB) — independent of Arrow batch sizing, so a batch of
    #: long documents cannot balloon worker memory.
    chunk_tokens = 1 << 17

    def run(batches):
        import hashlib

        import pandas as pd

        def h64(arr):
            return np.fromiter(
                (
                    int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                    for t in arr
                ),
                dtype=np.uint64,
                count=len(arr),
            ).view(np.int64)

        for pdf in batches:
            n = len(pdf)
            if not n:
                pdf[out_col] = pd.Series([], dtype="int64")
                yield pdf
                continue
            # NULL text → NULL token array (Catalyst) → NULL simhash,
            # matching the pure-Catalyst simhash64 formulation.
            if hash_in_python:
                arrs = [None if v is None else h64(v) for v in pdf["_tok_h"]]
            else:
                arrs = [
                    None if v is None else np.asarray(v, dtype=np.int64)
                    for v in pdf["_tok_h"]
                ]
            out: list = [None] * n
            i = 0
            while i < n:
                j = i
                tok = 0
                group: list[int] = []
                while j < n and (tok == 0 or tok < chunk_tokens):
                    if arrs[j] is not None and len(arrs[j]):
                        group.append(j)
                        tok += len(arrs[j])
                    j += 1
                if group:
                    flat = np.concatenate([arrs[g] for g in group]).astype(np.uint64)
                    # bit matrix (tokens × 64); int8 bits, int32 sums
                    bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int8)
                    lens = np.asarray([len(arrs[g]) for g in group])
                    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    ones = np.add.reduceat(bits, offsets, axis=0, dtype=np.int32)
                    # sum of ±1 contributions = 2*ones - n_tokens
                    counts = 2 * ones - lens[:, None]
                    sig = ((counts > 0).astype(np.uint64) << shifts).sum(
                        axis=1, dtype=np.uint64
                    ).astype(np.int64)
                    for col, g in enumerate(group):
                        out[g] = int(sig[col])
                i = j
            pdf[out_col] = pd.array(out, dtype="Int64")
            yield pdf

    return hashed.mapInPandas(run, schema=schema).drop("_tok_h")


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Exact-simhash dedup (Hamming distance 0): one shuffle on the
    64-bit key."""
    with_sh = with_simhash64(df, text_col, "simhash", base_hash=base_hash)
    return exact_dedup(with_sh, ["simhash"], id_col)


def simhash_dedup_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    bucket_cap: int = 256,
    base_hash: str = "xxhash64",
) -> DataFrame:
    """Near-dup removal at Hamming distance ≤ *max_hamming* (Manku et
    al., WWW'07): split the 64-bit simhash into *bands* equal bit
    slices — a pair within Hamming ≤ bands-1 shares at least one exact
    slice (pigeonhole), so candidates come from *bands* equi-joins on
    (band, slice) instead of an all-pairs scan — then verify exact
    Hamming distance with ``bit_count(xor)``. Requires
    ``max_hamming < bands``; hot slices (e.g. all-zero simhash of empty
    docs) are star-linked past *bucket_cap* like the MinHash path."""
    if max_hamming >= bands:
        raise ValueError("pigeonhole requires max_hamming < bands")
    width = 64 // bands
    mask = (1 << width) - 1
    with_sh = with_simhash64(df, text_col, "simhash", base_hash=base_hash).persist()
    slices = F.array(
        *[
            (F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)))
            for b in range(bands)
        ]
    )
    exploded = with_sh.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(slices).alias("band", "slice"),
    )
    anchors = exploded.groupBy("band", "slice").agg(
        F.min(id_col).alias("_anchor_id"),
        F.min_by("simhash", F.col(id_col)).alias("_anchor_sh"),
        F.count("*").alias("_bn"),
    )
    sized = exploded.join(anchors, on=["band", "slice"])
    small = sized.filter(F.col("_bn") <= bucket_cap)
    pairs_small = (
        small.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                     "band", "slice")
        .join(
            small.select(F.col(id_col).alias("id_b"),
                         F.col("simhash").alias("sh_b"), "band", "slice"),
            on=["band", "slice"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
    )
    pairs_big = (
        sized.filter(F.col("_bn") > bucket_cap)
        .filter(F.col(id_col) != F.col("_anchor_id"))
        .select(
            F.col("_anchor_id").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.col("_anchor_sh").alias("sh_a"),
            F.col("simhash").alias("sh_b"),
        )
    )
    pairs = pairs_small.unionByName(pairs_big).dropDuplicates(["id_a", "id_b"])
    dup = pairs.filter(
        F.bit_count(F.expr("sh_a ^ sh_b")) <= max_hamming
    )
    victims = dup.select(F.col("id_b").alias(id_col)).distinct().localCheckpoint()
    with_sh.unpersist()
    return df.join(victims, on=id_col, how="left_anti")


# ------------------------------------------------------- n-gram jaccard
def ngram_jaccard_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    shingle_unit: str = "word",
    small_data: bool = False,
    num_perm: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup removal.

    Default path: MinHash-LSH candidate generation (sub-quadratic —
    with rows-per-band = num_perm/bands = 2 a J ≥ 0.8 pair is a
    candidate with probability 1-(1-J²)^32 ≈ 1-10⁻⁶) followed by the
    EXACT Jaccard verify on candidate pairs only, so the answer is
    exact up to LSH recall. The all-pairs cross join — O(n²) rows
    shuffled, fatal beyond toy inputs — must be requested explicitly
    via ``small_data=True``."""
    sh = df.select(
        F.col(id_col),
        F.expr(_shingle_base_sql(text_col, shingle_unit)).alias("_shbase"),
    ).select(
        F.col(id_col),
        F.expr(_shingles_from_base("_shbase", shingle_k, shingle_unit)).alias("sh"),
    )
    if small_data:
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
        )
    else:
        with_sig = minhash_signatures(
            df, text_col, num_perm, shingle_k, shingle_unit=shingle_unit
        ).persist()
        cand = candidate_pairs(with_sig, id_col, bands, num_perm).select(
            "id_a", "id_b"
        )
        pairs = (
            cand.join(
                sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")),
                on="id_a",
            )
            .join(
                sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")),
                on="id_b",
            )
            .filter(
                F.least(F.size("sh_a"), F.size("sh_b"))
                >= F.greatest(F.size("sh_a"), F.size("sh_b")) * F.lit(threshold)
            )
        )
    pairs = pairs.withColumn(
        "jaccard",
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
    ).filter(F.col("jaccard") >= threshold)
    victims = pairs.select(F.col("id_b").alias(id_col)).distinct().localCheckpoint()
    if not small_data:
        with_sig.unpersist()
    return df.join(victims, on=id_col, how="left_anti")


def minhash_estimator_report(
    df: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    base_hash: str = "md5",
) -> "DataFrame":
    """Calibration report for the MinHash Jaccard estimator —
    "measure, don't guess" applied to the dedup threshold itself.

    For every LSH candidate pair: the estimated Jaccard (signature
    agreement / num_perm) AND the exact Jaccard over the distinct
    shingle sets, folded into a per-estimate-bucket table
    ``(est_bucket, n_pairs, avg_est, avg_exact, avg_abs_err)``.
    This is how a pipeline owner picks ``threshold`` and ``num_perm``
    from DATA: the report shows directly how tight the estimator is
    at the operating point (theory: std-err ≈ sqrt(J(1-J)/num_perm)).

    Scale shape: candidate pairs only (never all-pairs); the exact
    side joins the pair list back to the per-doc shingle arrays by id
    — at full corpus scale run it on a seeded sample, the estimator's
    error is distribution-free. md5 mode end-to-end, so the DuckDB
    oracle replays signatures, banding, pairing AND the exact
    Jaccard."""
    fused = base_hash == "md5"
    with_sig = minhash_signatures(
        df, text_col, num_perm, shingle_k,
        base_hash=base_hash, emit_bands=bands if fused else None,
    ).persist()
    pairs = candidate_pairs(
        with_sig, id_col, bands, num_perm, base_hash=base_hash,
        bands_col="_bands" if fused else None, dedupe_pairs=True,
    )
    est = (
        F.size(
            F.filter(F.zip_with("mh_a", "mh_b", lambda a, b: a == b),
                     lambda x: x)
        )
        / F.lit(num_perm)
    )
    sh = df.select(
        F.col(id_col).alias("_sid"),
        F.expr(_shingles_expr(text_col, shingle_k)).alias("_sh"),
    )
    j = (
        pairs.withColumn("est_jaccard", est)
        .join(sh.select(F.col("_sid").alias("id_a"),
                        F.col("_sh").alias("_sha")), "id_a")
        .join(sh.select(F.col("_sid").alias("id_b"),
                        F.col("_sh").alias("_shb")), "id_b")
        .withColumn(
            "exact_jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
    )
    bucket = F.floor(F.col("est_jaccard") * 10) / 10
    return (
        j.groupBy(bucket.alias("est_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("est_jaccard"), 6).alias("avg_est"),
            F.round(F.avg("exact_jaccard"), 6).alias("avg_exact"),
            F.round(
                F.avg(F.abs(F.col("est_jaccard") - F.col("exact_jaccard"))), 6
            ).alias("avg_abs_err"),
        )
    )
