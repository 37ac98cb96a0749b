"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force cosine top-k against one query
  vector. The dot product is a single ``zip_with``+``aggregate`` pair
  (JVM, codegen); top-k is ``orderBy(...).limit(k)`` which Spark
  executes as per-partition TakeOrdered + driver merge — no global
  sort materialization.
* :func:`cosine_topk_per_probe` — many probes at once: broadcast the
  (small) probe set, one shuffle for the per-probe window top-k.
* :func:`lsh_bucketed_topk` — the scale path: random-hyperplane LSH
  (sign bits of dot products with H seeded pseudo-random planes →
  bucket id). Probes search only their bucket (plus optional
  multi-probe neighbors at Hamming distance 1). At 10^12 vectors the
  bucket join replaces the full scan; recall is tunable via H.

Hyperplanes are generated from a seed with a splitmix-style integer
mix — deterministic across runs/partitions, no stored model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_guarded(a: Column, b: Column) -> Column:
    """Cosine with both norms clamped at 1e-12 — an all-zero vector
    scores 0.0 instead of NaN. Use WHEREVER the DuckDB oracle twin
    writes ``greatest(sqrt(...), 1e-12)`` (semdedup, bitext): the
    unguarded form diverges from those oracles on zero vectors, and
    Spark's NaN-is-greatest ordering would silently pass
    ``NaN >= threshold`` filters. For nonzero vectors the clamp is a
    no-op, so values are unchanged on any real embedding corpus."""
    return dot(a, b) / (
        F.greatest(l2_norm(a), F.lit(1e-12))
        * F.greatest(l2_norm(b), F.lit(1e-12))
    )


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k by cosine similarity to *query*."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    # Deterministic tie-break on id.
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def cosine_topk_per_probe(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Top-k corpus neighbors for every probe row. Probes broadcast
    (they are the small side by construction)."""
    p = probes.select(
        F.col(probe_id), F.col(vec_col).alias("_probe_vec")
    )
    joined = corpus.crossJoin(F.broadcast(p)).select(
        probe_id,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_probe_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


# ------------------------------------------------------ hyperplane LSH
def _mix_expr(seed: int, h: int, d: int) -> str:
    """Deterministic pseudo-random plane coefficient in [-1, 1] for
    (hyperplane h, dimension d): Spark's built-in hash (Murmur3) of
    the literals, normalized. Constant-folded by Catalyst (literals
    only), ANSI-safe, identical on every executor."""
    return f"(cast(hash({seed}, {h}, {d}) as double) / 2147483648.0)"


def _plane_matrix(spark, num_planes: int, dim: int, seed: int):
    """The num_planes×dim plane coefficients, materialized once on the
    driver by letting Catalyst constant-fold the same literal hash
    expressions the r01 SQL variant inlined per row — so buckets are
    bit-identical to that version, but the per-row work moves to one
    numpy matmul per Arrow batch instead of a dim×planes-term
    expression tree (which at dim=64/12 planes already produced
    >1.7 MiB task binaries, and at dim=768 would not plan at all)."""
    import numpy as np

    coeffs = []
    # Chunk the constant-fold select: one array() of ~4096 literals per
    # query keeps the driver-side plan small even at dim=768×32 planes.
    flat = [
        _mix_expr(seed, h, d) for h in range(num_planes) for d in range(dim)
    ]
    for i in range(0, len(flat), 4096):
        row = spark.range(1).select(
            F.expr("array(" + ",".join(flat[i : i + 4096]) + ")").alias("c")
        ).first()
        coeffs.extend(row["c"])
    return np.asarray(coeffs, dtype="float64").reshape(num_planes, dim)


def _md5_plane_matrix(num_planes: int, dim: int, seed: int):
    """Engine-neutral plane coefficients: ``coeff[h, d] = (u - 2³¹) /
    2³¹`` with ``u`` the first 8 md5 hex chars of ``"seed:h:d"`` as an
    int. Every step is exact in float64 (integer < 2³², division by a
    power of two), so any engine with an MD5 builtin reproduces the
    buckets bit-for-bit — the DuckDB oracle recomputes the same matrix
    in SQL (see ``oracle_sql()['ann_lsh_topk']``). No SparkSession
    needed (plain hashlib), unlike the murmur3 constant-fold path."""
    import hashlib

    import numpy as np

    m = np.empty((num_planes, dim), dtype="float64")
    for h in range(num_planes):
        for d in range(dim):
            u = int(hashlib.md5(f"{seed}:{h}:{d}".encode()).hexdigest()[:8], 16)
            m[h, d] = (u - 2**31) / 2**31
    return m


def with_hyperplane_bucket(
    df: DataFrame,
    vec_col: str,
    out_col: str = "_bucket",
    num_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    plane_hash: str = "murmur3",
) -> DataFrame:
    """Append the LSH bucket id column: bit h = sign(v · plane_h).
    Projection runs as a numpy matmul inside ``mapInPandas`` (Arrow
    batches); planes ship to executors as a tiny broadcast ndarray,
    not as an expression tree. ``plane_hash='md5'`` derives the plane
    coefficients from MD5 instead of Spark's murmur3 ``hash()`` so an
    independent SQL engine can replay the bucketing (same recall
    characteristics — both are uniform pseudo-random planes).

    Oracle-parity caveat (accepted, documented): the plane MATRIX is
    bit-exact across engines, but the projection sign compares a
    numpy/BLAS matmul against the oracle's sequential sum — they can
    differ by ~1 ulp, so a vector within ~1e-15 of orthogonal to a
    plane could bucket differently per engine. For continuous
    embeddings the probability is ~1e-15 per (vector, plane); the
    driver gate at sf0.01 runs 500×8 such comparisons per round."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    if plane_hash == "murmur3":
        planes = _plane_matrix(df.sparkSession, num_planes, dim, seed)
    elif plane_hash == "md5":
        planes = _md5_plane_matrix(num_planes, dim, seed)
    else:
        raise ValueError(f"unknown plane_hash: {plane_hash!r}")
    weights = (1 << np.arange(num_planes)).astype("int64")
    schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                pdf[out_col] = pd.Series([], dtype="int64")
                yield pdf
                continue
            # NULL / wrong-dim embeddings get a NULL bucket (the r1
            # SQL formulation also yielded NULL) instead of crashing
            # the stack() over a ragged list.
            out: list = [None] * n
            idx = [
                i
                for i, v in enumerate(pdf[vec_col])
                if v is not None and len(v) == dim
            ]
            if idx:
                vecs = np.array(
                    [np.asarray(pdf[vec_col].iloc[i], dtype="float64") for i in idx]
                )
                proj = vecs @ planes.T  # n × num_planes
                buckets = (proj > 0).astype("int64") @ weights
                for k, i in enumerate(idx):
                    out[i] = int(buckets[k])
            pdf[out_col] = pd.array(out, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, schema=schema)


def lsh_bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id: str = "probe_id",
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    plane_hash: str = "murmur3",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate per-probe top-k: compare only within the probe's
    LSH bucket. The bucket column is computed identically on both
    sides (same seed), so this is one equi-join + windowed top-k.

    ``multiprobe=True`` additionally searches the ``num_planes``
    Hamming-distance-1 neighbor buckets (flip one sign bit — the
    classic multi-probe LSH of Lv et al., VLDB 2007): a near neighbor
    that lands just on the other side of ONE hyperplane is recovered
    without doubling the plane count. Cost shape at scale: the PROBE
    side fans out ×(num_planes+1) before the equi-join — the corpus
    side (the big one) is untouched, and each corpus vector still
    joins at most once per probe because the probe's expanded bucket
    list is distinct (XOR with distinct single bits), so no candidate
    dedup step is needed."""
    c = with_hyperplane_bucket(
        corpus, vec_col, "_bucket", num_planes, dim, seed, plane_hash
    )
    p = with_hyperplane_bucket(
        probes, vec_col, "_bucket", num_planes, dim, seed, plane_hash
    ).select(probe_id, F.col(vec_col).alias("_probe_vec"), "_bucket")
    if multiprobe:
        expanded = F.array(
            F.col("_bucket"),
            *[
                F.col("_bucket").bitwiseXOR(F.lit(1 << h))
                for h in range(num_planes)
            ],
        )
        p = p.select(
            probe_id,
            "_probe_vec",
            F.explode(expanded).alias("_bucket"),
        )
    joined = c.join(p, on="_bucket").select(
        probe_id,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_probe_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def _assign_centroids(df: DataFrame, centroids, vec_col: str, out_col: str) -> DataFrame:
    """Nearest-centroid assignment via a numpy-vectorized Arrow batch
    (one matmul per batch — the K×dim argmin is the one step that
    shouldn't be a Catalyst expression tree)."""
    import numpy as np

    from pyspark.sql.types import IntegerType, StructField, StructType

    c = np.asarray(centroids, dtype="float64")
    c_norm = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    schema = StructType(list(df.schema.fields) + [StructField(out_col, IntegerType())])

    def run(batches):
        import pandas as pd

        for pdf in batches:
            vecs = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if len(vecs):
                v_norm = vecs / np.maximum(
                    np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
                )
                pdf[out_col] = np.argmax(v_norm @ c_norm.T, axis=1).astype("int32")
            else:
                pdf[out_col] = pd.Series([], dtype="int32")
            yield pdf

    return df.mapInPandas(run, schema=schema)


def refine_codebook(
    corpus: DataFrame,
    centroids,
    iters: int = 2,
    vec_col: str = "embedding",
):
    """Lloyd (k-means) refinement of an IVF codebook: per iteration,
    nearest-centroid assignment runs as the usual numpy matmul per
    Arrow batch, each PARTITION reduces to K partial (count, sum)
    rows inside the same ``mapInPandas`` pass, and the driver combines
    the tiny (partitions × K) partial set into new means. One corpus
    pass per iteration, no shuffle at all — the only materialization
    is K rows per partition. At 10^12 vectors run the refinement on a
    seeded sample of the corpus; the assignment cost structure is
    identical.

    Determinism: partials are summed on the driver in sorted order,
    so centroid floats don't depend on which partition's result
    arrives first. Empty cells keep their previous centroid."""
    import numpy as np

    import pandas as pd  # noqa: F401  (worker-side import sanity)

    cents = np.asarray(centroids, dtype="float64").copy()
    K, dim = cents.shape
    for _ in range(int(iters)):
        assigned = _assign_centroids(
            corpus.select(vec_col), cents, vec_col, "_cell"
        )

        def partials(batches):
            import pandas as pd

            sums = np.zeros((K, dim), dtype="float64")
            counts = np.zeros(K, dtype="int64")
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.array(
                    [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
                )
                cells = pdf["_cell"].to_numpy()
                np.add.at(sums, cells, vecs)
                counts += np.bincount(cells, minlength=K)
            yield pd.DataFrame(
                {
                    "cell": list(range(K)),
                    "n": counts.tolist(),
                    "s": [sums[c].tolist() for c in range(K)],
                }
            )

        rows = assigned.mapInPandas(
            partials, "cell int, n long, s array<double>"
        ).collect()
        sums = np.zeros((K, dim), dtype="float64")
        counts = np.zeros(K, dtype="int64")
        for r in sorted(rows, key=lambda r: (r["cell"], r["n"], tuple(r["s"]))):
            sums[r["cell"]] += np.asarray(r["s"], dtype="float64")
            counts[r["cell"]] += r["n"]
        for c in range(K):
            if counts[c] > 0:
                cents[c] = sums[c] / counts[c]
    return cents


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id: str = "probe_id",
    seed: int = 42,
    codebook_rank: str = "xxhash64",
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-style approximate top-k: a deterministic centroid codebook
    (seeded hash-rank sample of the corpus — one tiny collect —
    optionally Lloyd-refined with ``kmeans_iters`` passes of
    :func:`refine_codebook`), nearest-centroid assignment on both
    sides, then per-probe search within the probe's inverted list
    only. One equi-join on the centroid id replaces the full scan —
    the IVF recall/speed trade at 10^12 vectors. The driver-contract
    oracle pins the ``kmeans_iters=0`` codebook (SQL-replayable);
    refined recall is pinned by pytest against brute force.

    ``codebook_rank='md5_id'`` picks the codebook by the MD5 of
    ``"seed:id"`` (tie-broken by id) instead of xxhash64 of the vector
    rendering — same uniform sample, but reproducible in the DuckDB
    oracle, which replays codebook → assignment → inverted-list top-k
    end-to-end."""
    if codebook_rank == "xxhash64":
        rank_key = F.xxhash64(F.lit(seed), F.col(vec_col).cast("string"))
    elif codebook_rank == "md5_id":
        rank_key = F.md5(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        )
    else:
        raise ValueError(f"unknown codebook_rank: {codebook_rank!r}")
    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(rank_key, F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    centroids = [list(r[vec_col]) for r in sample]
    if kmeans_iters:
        centroids = refine_codebook(corpus, centroids, kmeans_iters, vec_col)

    c_assigned = _assign_centroids(corpus, centroids, vec_col, "_cell")
    p_assigned = _assign_centroids(
        probes.select(probe_id, vec_col), centroids, vec_col, "_cell"
    ).select(probe_id, F.col(vec_col).alias("_probe_vec"), "_cell")

    joined = c_assigned.join(p_assigned, on="_cell").select(
        probe_id,
        id_col,
        F.round(cosine(F.col(vec_col), F.col("_probe_vec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def refine_pq_codebook(
    corpus: DataFrame,
    codebook,
    m: int,
    iters: int = 1,
    vec_col: str = "embedding",
):
    """Per-subspace Lloyd refinement of a PQ codebook — the PQ twin of
    :func:`refine_codebook`: per iteration one corpus pass assigns
    every sub-vector to its nearest sub-centroid (numpy, rounded
    distances like the encoder) and reduces to (m × n_codes) partial
    (count, sum) rows per partition inside the same ``mapInPandas``;
    the driver combines the tiny partial set in sorted order (so
    centroid floats don't depend on partition arrival) into new
    per-subspace means. Empty cells keep their previous sub-centroid.
    No shuffle; at 10^12 vectors refine on a seeded sample."""
    import numpy as np

    cb = np.asarray(codebook, dtype="float64").copy()
    n_codes, dim = cb.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    for _ in range(int(iters)):
        cb_cur = cb.copy()

        def partials(batches):
            import pandas as pd

            sums = np.zeros((m, n_codes, sub), dtype="float64")
            counts = np.zeros((m, n_codes), dtype="int64")
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(
                    [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
                )
                for s in range(m):
                    xs = X[:, s * sub : (s + 1) * sub]
                    d = np.round(
                        ((xs[:, None, :] - cb_cur[None, :, s * sub : (s + 1) * sub])
                         ** 2).sum(-1),
                        6,
                    )
                    code = np.argmin(d, axis=1)
                    np.add.at(sums[s], code, xs)
                    counts[s] += np.bincount(code, minlength=n_codes)
            yield pd.DataFrame(
                {
                    "s": [s for s in range(m) for _ in range(n_codes)],
                    "code": [c for _ in range(m) for c in range(n_codes)],
                    "n": counts.reshape(-1).tolist(),
                    "sm": [
                        sums[s, c].tolist()
                        for s in range(m)
                        for c in range(n_codes)
                    ],
                }
            )

        rows = corpus.select(vec_col).mapInPandas(
            partials, "s int, code int, n long, sm array<double>"
        ).collect()
        sums = np.zeros((m, n_codes, sub), dtype="float64")
        counts = np.zeros((m, n_codes), dtype="int64")
        for r in sorted(rows, key=lambda r: (r["s"], r["code"], r["n"], tuple(r["sm"]))):
            sums[r["s"], r["code"]] += np.asarray(r["sm"], dtype="float64")
            counts[r["s"], r["code"]] += r["n"]
        for s in range(m):
            for c in range(n_codes):
                if counts[s, c] > 0:
                    cb[c, s * sub : (s + 1) * sub] = sums[s, c] / counts[s, c]
    return cb


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id: str = "probe_id",
    seed: int = 42,
    codebook_rank: str = "xxhash64",
    kmeans_iters: int = 0,
) -> DataFrame:
    """Product-quantization approximate top-k (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search") — the memory
    side of the canonical IVF-PQ architecture at 10^12 vectors: each
    vector is stored as *m* sub-space code bytes (here dim/m-dim
    sub-vectors quantized against an *n_codes*-entry per-subspace
    codebook), and search is asymmetric distance computation (ADC):
    the probe precomputes an (m × n_codes) distance table, and each
    corpus vector costs m table lookups instead of dim multiplies.

    Returns ``(probe_id, id_col, approx_dist)`` — squared-L2 ADC
    distance (ascending = nearest), rounded to 6 dp with an id
    tie-break so ranking is deterministic and engine-reproducible.

    Determinism/oracle notes: the codebook is a seeded hash-rank
    sample of the corpus (one tiny collect, like :func:`ivf_topk`);
    per-subspace encode takes argmin over distances ROUNDED to 6 dp
    with a first-index tie-break, so float summation-order ulps
    (numpy pairwise vs an ordered SQL fold) cannot flip a code.
    ``codebook_rank='md5_id'`` makes the whole chain — codebook →
    encode → distance table → ADC sum → top-k — replayable by the
    DuckDB oracle.

    Scale shape: encode is one numpy pass per Arrow batch over the
    corpus (in production the codes column is written once and
    reused); the probe side is a tiny broadcast of distance-table
    arrays; ADC is a per-row Catalyst fold over m lookups — zero
    shuffle before the per-probe top-k window.
    """
    import numpy as np

    if codebook_rank == "xxhash64":
        rank_key = F.xxhash64(F.lit(seed), F.col(vec_col).cast("string"))
    elif codebook_rank == "md5_id":
        rank_key = F.md5(
            F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
        )
    else:
        raise ValueError(f"unknown codebook_rank: {codebook_rank!r}")
    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(rank_key, F.col(id_col))
        .limit(n_codes)
        .collect()
    )
    cb = np.asarray([list(r[vec_col]) for r in sample], dtype="float64")
    dim = cb.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    if kmeans_iters:
        # Per-subspace Lloyd refinement (pytest-pinned; the oracle
        # replays the kmeans_iters=0 codebook, like ivf_topk).
        cb = refine_pq_codebook(corpus, cb, m, kmeans_iters, vec_col)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            codes = []
            for v in pdf[vec_col]:
                x = np.asarray(v, dtype="float64")
                row = []
                for s in range(m):
                    d = np.round(
                        ((x[s * sub : (s + 1) * sub] - cb[:, s * sub : (s + 1) * sub])
                         ** 2).sum(axis=1),
                        6,
                    )
                    row.append(int(np.argmin(d)))  # first-index tie-break
                codes.append(row)
            out = pdf[[c for c in pdf.columns if c != vec_col]].copy()
            out["_codes"] = codes
            yield out

    enc_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in corpus.select(id_col).schema.fields
    ) + ", _codes array<int>"
    encoded = corpus.select(id_col, vec_col).mapInPandas(encode, enc_schema)

    def probe_tables(batches):
        import pandas as pd

        for pdf in batches:
            tabs = []
            for v in pdf[vec_col]:
                x = np.asarray(v, dtype="float64")
                tabs.append(
                    [
                        np.round(
                            ((x[s * sub : (s + 1) * sub]
                              - cb[:, s * sub : (s + 1) * sub]) ** 2).sum(axis=1),
                            6,
                        ).tolist()
                        for s in range(m)
                    ]
                )
            out = pdf[[c for c in pdf.columns if c != vec_col]].copy()
            out["_dtab"] = tabs
            yield out

    pt_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in probes.select(probe_id).schema.fields
    ) + ", _dtab array<array<double>>"
    ptab = probes.select(probe_id, vec_col).mapInPandas(probe_tables, pt_schema)

    # ADC: fixed-order left-associative fold over the m lookups (the
    # table entries are already on the 1e-6 grid, so the sum is
    # engine-reproducible).
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0).cast("double"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("_dtab"), s + 1),
            F.element_at(F.col("_codes"), s + 1) + 1,
        ),
    )
    joined = encoded.crossJoin(F.broadcast(ptab)).select(
        probe_id, id_col, F.round(adc, 6).alias("approx_dist")
    )
    w = Window.partitionBy(probe_id).orderBy("approx_dist", F.col(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id: str = "probe_id",
    seed: int = 42,
    codebook_rank: str = "xxhash64",
    kmeans_iters: int = 0,
    rerank: int = 0,
) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. 2011 §IV) — the composition of
    :func:`ivf_topk` routing and :func:`pq_topk` compression that is
    the actual 10^12-vector architecture: a coarse codebook routes
    each vector to an inverted list, the RESIDUAL ``v − centroid`` is
    product-quantized to m code bytes, and a probe searches only its
    list via asymmetric distance computation on its own residual. At
    scale the corpus is stored as (cell, m bytes) per vector — ~100×
    smaller than raw float32 — and search touches one list instead of
    the full scan.

    Plan shape: TWO tiny collects (coarse + PQ codebook samples, both
    bounded by n_centroids/n_codes rows); ONE fused ``mapInPandas``
    pass over the corpus doing assign→residual→encode (a single Arrow
    crossing — the codes column would be written once and reused in
    production); the probe side is a tiny assign+distance-table map;
    then one equi-join on the cell id and a per-probe top-k window.
    Zero corpus shuffle before the window.

    Determinism/oracle: same discipline as :func:`pq_topk` — coarse
    assignment by normalized-dot argmax (first-index ties), PQ encode
    by argmin over squared-L2 distances ROUNDED to 6 dp (first-index
    ties), ADC sum of pre-rounded table entries. The PQ codebook is
    the residual set of an md5/xxhash-rank sample ranked with
    ``seed+1`` (coarse uses ``seed``), so the DuckDB oracle replays
    coarse codebook → assignment → residuals → PQ codebook → encode →
    distance tables → ADC → top-k end-to-end
    (``oracle_sql()['ann_ivfpq_topk']``).

    ``kmeans_iters`` Lloyd-refines the PQ codebook in residual space
    (one fused assign+subtract pass feeds :func:`refine_pq_codebook`);
    ``rerank=R`` switches on IVFADC+R (paper §V): the top R·k ADC
    candidates per probe are re-ranked by EXACT cosine via one hash
    join that reads R·k·|probes| vectors — not the corpus — restoring
    plain-IVF recall; output then matches
    :func:`cosine_topk_per_probe` (``cos_sim`` instead of
    ``approx_dist``). The oracle pins ``kmeans_iters=0, rerank=0``;
    both upgrades are pinned by recall pytest."""
    import numpy as np

    def _rank_key(s: int):
        if codebook_rank == "xxhash64":
            return F.xxhash64(F.lit(s), F.col(vec_col).cast("string"))
        if codebook_rank == "md5_id":
            return F.md5(
                F.concat_ws(":", F.lit(str(s)), F.col(id_col).cast("string"))
            )
        raise ValueError(f"unknown codebook_rank: {codebook_rank!r}")

    coarse_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(_rank_key(seed), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    cents = np.asarray([list(r[vec_col]) for r in coarse_rows], dtype="float64")
    dim = cents.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    c_norm = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    def assign(X: "np.ndarray") -> "np.ndarray":
        v_norm = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return np.argmax(v_norm @ c_norm.T, axis=1)

    # PQ codebook: residuals of a second hash-rank sample (seed+1).
    pq_rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(_rank_key(seed + 1), F.col(id_col))
        .limit(n_codes)
        .collect()
    )
    pq_raw = np.asarray([list(r[vec_col]) for r in pq_rows], dtype="float64")
    cb = pq_raw - cents[assign(pq_raw)]  # residual codebook, n_codes × dim

    if kmeans_iters:
        # Lloyd-refine the PQ codebook IN RESIDUAL SPACE (the space
        # it quantizes): materialize the residual column with one
        # fused assign+subtract pass, then reuse the per-subspace
        # refiner. Oracle pins kmeans_iters=0 (like ivf_topk/pq_topk);
        # refined recall is pinned by pytest against brute force.
        def residualize(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf):
                    X = np.array(
                        [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
                    )
                    res = (X - cents[assign(X)]).tolist()
                else:
                    res = []
                yield pd.DataFrame({"_res": res})

        residuals = corpus.select(vec_col).mapInPandas(
            residualize, "_res array<double>"
        )
        cb = refine_pq_codebook(residuals, cb, m, kmeans_iters, vec_col="_res")

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            ids, cells, codes = [], [], []
            if len(pdf):
                X = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
                cell = assign(X)
                R = X - cents[cell]
                for i in range(len(pdf)):
                    row = []
                    for s in range(m):
                        d = np.round(
                            ((R[i, s * sub : (s + 1) * sub]
                              - cb[:, s * sub : (s + 1) * sub]) ** 2).sum(axis=1),
                            6,
                        )
                        row.append(int(np.argmin(d)))  # first-index tie-break
                    codes.append(row)
                ids = pdf[id_col].tolist()
                cells = cell.astype("int32").tolist()
            yield pd.DataFrame({id_col: ids, "_cell": cells, "_codes": codes})

    id_type = corpus.schema[id_col].dataType.simpleString()
    encoded = corpus.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} {id_type}, _cell int, _codes array<int>"
    )

    def probe_tables(batches):
        import pandas as pd

        for pdf in batches:
            pids, cells, tabs = [], [], []
            if len(pdf):
                X = np.array([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
                cell = assign(X)
                R = X - cents[cell]
                for i in range(len(pdf)):
                    tabs.append(
                        [
                            np.round(
                                ((R[i, s * sub : (s + 1) * sub]
                                  - cb[:, s * sub : (s + 1) * sub]) ** 2).sum(axis=1),
                                6,
                            ).tolist()
                            for s in range(m)
                        ]
                    )
                pids = pdf[probe_id].tolist()
                cells = cell.astype("int32").tolist()
            yield pd.DataFrame({probe_id: pids, "_cell": cells, "_dtab": tabs})

    pid_type = probes.schema[probe_id].dataType.simpleString()
    ptab = probes.select(probe_id, vec_col).mapInPandas(
        probe_tables, f"{probe_id} {pid_type}, _cell int, _dtab array<array<double>>"
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0).cast("double"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("_dtab"), s + 1),
            F.element_at(F.col("_codes"), s + 1) + 1,
        ),
    )
    joined = encoded.join(F.broadcast(ptab), on="_cell").select(
        probe_id, id_col, F.round(adc, 6).alias("approx_dist")
    )
    w = Window.partitionBy(probe_id).orderBy("approx_dist", F.col(id_col))
    if not rerank:
        return (
            joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("rank")
        )
    # IVFADC+R (§V of the paper): keep the top rerank·k ADC
    # candidates per probe, fetch their TRUE vectors (one hash join —
    # at scale this reads rerank·k·|probes| rows, not the corpus) and
    # re-rank exactly by cosine. Output matches cosine_topk_per_probe
    # (probe_id, id, cos_sim) so recall equals exact in-cell ranking
    # whenever the true neighbors survive the ADC cut.
    cand = (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(rerank) * k)
        .select(probe_id, id_col)
    )
    pvec = probes.select(probe_id, F.col(vec_col).alias("_probe_vec"))
    exact = (
        cand.join(corpus.select(id_col, vec_col), on=id_col)
        .join(F.broadcast(pvec), on=probe_id)
        .select(
            probe_id,
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_probe_vec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w2 = Window.partitionBy(probe_id).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.98,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    plane_hash: str = "murmur3",
) -> DataFrame:
    """Embedding-cosine near-duplicate removal: LSH-bucket self-join,
    verify cosine ≥ threshold, drop the larger id of each pair."""
    c = with_hyperplane_bucket(df, vec_col, "_bucket", num_planes, dim, seed, plane_hash)
    a = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "_bucket")
    b = c.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "_bucket")
    dups = (
        a.join(b, on="_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos_sim") >= threshold)
    )
    victims = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(victims, on=id_col, how="left_anti")
