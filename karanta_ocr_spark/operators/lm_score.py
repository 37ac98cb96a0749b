"""Corpus-trained bigram language-model quality scoring — the CCNet
shape (Wenzek et al. 2020, arXiv:1911.00359): score each document by
its perplexity under a language model, then filter/bucket on the
score. CCNet uses a pretrained KenLM; no model ships in this
container, so the model here is trained ON THE CORPUS ITSELF in the
same job — an add-one-smoothed token bigram LM. That is itself a
standard corpus-quality signal: boilerplate and templated spam sit at
low perplexity, lorem-ipsum-like noise at high perplexity.

Model: ``P(w_i | w_{i-1}) = (B(w_{i-1}, w_i) + a) / (C(w_{i-1}) + a*V)``
where ``B`` is the corpus bigram count, ``C`` counts the context
token's occurrences AS a context (all but each doc's final token — so
the conditional normalizes exactly), ``V`` is corpus vocabulary size,
and ``a`` is the smoothing constant. Per doc: cross-entropy
``H = -mean(ln P)`` over its bigram positions, perplexity ``e^H``.

Scale shape (10^12 docs):

* Token/bigram extraction is Catalyst HOF arrays — no Python.
* Training is ONE groupBy over (context, bigram) hashes with map-side
  partial aggregation; the context totals are then derived from that
  aggregated table (``C(w1) = Σ_w2 B(w1, w2)``) instead of a second
  pass over the corpus, and both counts ride a single corpus-sized
  join keyed on the bigram hash (corpus text never becomes a shuffle
  key; AQE handles hot boilerplate bigrams).
* V is a 1-row aggregate, broadcast.
* The per-doc log-prob sum folds LEFT-ASSOCIATIVELY over the
  position-sorted array (collect_list is doc-bounded, never
  corpus-wide) — bit-reproducible across partitionings, and replayed
  by the DuckDB oracle with the same fold (``list_reduce`` over an
  ORDER BY pos list).

Reference scope note: the reference has no LM scoring stage; this is
part of the beyond-reference training-data suite.

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

from karanta_ocr_spark.functions.text_analysis import WS_SQL


def bigram_lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document bigram-LM perplexity under the corpus-trained
    model described above.

    Returns ``(id_col, n_bigrams, cross_entropy, perplexity)`` — one
    row per input doc; docs with fewer than 2 tokens report
    ``n_bigrams = 0`` and NULL entropy/perplexity.

    ``hash_mode`` picks the join key for the count joins:
    ``'xxhash64'`` (production, 8-byte keys) or ``'md5'``
    (engine-neutral, lets the SQL oracle replay the joins — the
    PROBABILITIES are identical either way, only the shuffle key
    representation changes).
    """
    if hash_mode == "xxhash64":
        def key(c):  # 8-byte shuffle key
            return F.xxhash64(c)
    elif hash_mode == "md5":
        def key(c):
            return F.md5(c)
    else:
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")

    toks_sql = f"split(lower(trim({text_col})), '{WS_SQL}+')"
    # The token array is hoisted into a column FIRST: inlining the
    # split() into every element_at of the transform lambda would
    # re-tokenize per element (Catalyst does not CSE across lambda
    # boundaries) — O(tokens²) string work per document.
    bigrams_sql = (
        "CASE WHEN size(_toks) < 2 THEN "
        "cast(array() as array<struct<pos:int,w1:string,bg:string>>) "
        "ELSE transform(sequence(1, size(_toks) - 1), "
        "i -> named_struct('pos', i - 1, 'w1', element_at(_toks, i), "
        "'bg', concat(element_at(_toks, i), ' ', "
        "element_at(_toks, i + 1)))) END"
    )
    pos_bg = docs.select(
        F.col(id_col), F.expr(toks_sql).alias("_toks")
    ).select(
        F.col(id_col), F.explode(F.expr(bigrams_sql)).alias("e")
    ).select(
        id_col,
        F.col("e.pos").alias("pos"),
        key(F.col("e.w1")).alias("_ck"),
        key(F.col("e.bg")).alias("_bk"),
    )
    # Training: every exploded row is one bigram occurrence AND one
    # context occurrence of its w1, so one (ck, bk) count yields the
    # bigram counts directly and the context counts by re-aggregation
    # of the (small) counts table — the corpus is aggregated once and
    # joined once, not three times.
    bg_counts = pos_bg.groupBy("_ck", "_bk").agg(F.count(F.lit(1)).alias("_bn"))
    ctx_counts = bg_counts.groupBy("_ck").agg(F.sum("_bn").alias("_cn"))
    counts = bg_counts.join(ctx_counts, on="_ck").select("_bk", "_bn", "_cn")
    vocab = docs.select(
        F.explode(F.expr(toks_sql)).alias("tok")
    ).agg(F.countDistinct("tok").alias("_v"))

    scored = (
        pos_bg.join(counts, on="_bk")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            "pos",
            (
                F.log((F.col("_bn") + F.lit(alpha)))
                - F.log(F.col("_cn") + F.lit(alpha) * F.col("_v"))
            ).alias("logp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "logp"))),
                lambda s: s["logp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sum_logp"),
    )
    base = docs.select(F.col(id_col))
    out = base.join(agg, on=id_col, how="left")
    h = -F.col("_sum_logp") / F.col("_n")
    return out.select(
        id_col,
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(h, 6).alias("cross_entropy"),
        F.round(F.exp(h), 4).alias("perplexity"),
    )


def perplexity_buckets(
    scored: DataFrame,
    group_col: str = "lang",
    ppl_col: str = "perplexity",
    id_col: str = "doc_id",
    mode: str = "exact",
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing of LM perplexities.

    CCNet (Wenzek et al., 2020) splits each language's documents into
    perplexity terciles — ``head`` (lowest perplexity: cleanest),
    ``middle``, ``tail`` — and trains on head+middle. This operator
    appends that ``bucket`` column per *group_col*; rows with NULL
    perplexity (docs under 2 tokens) become ``unscored``.

    *mode* ``'exact'`` — the oracle spec: within each group, rank by
    (perplexity asc, id asc) and assign tercile
    ``floor(3·(rank-1)/n)`` (balanced to ±1; pure integer arithmetic,
    engine-neutral). The rank window partitions by group — fine for
    per-language groups at test scale, but ONE language's documents
    form one window partition.

    *mode* ``'approx'`` — the production path at 100 TB: per-group
    ``percentile_approx`` 1/3 and 2/3 cutoffs (one partial agg, a
    GK-sketch per group) broadcast back as thresholds — no window,
    map-side bucket assignment, boundary rows may land one bucket off
    (sketch error; pytest-bounded). Same exact-spec/scale-path seam
    as ``profile.length_percentiles``.
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"unknown mode: {mode!r}")
    labels = F.array(F.lit("head"), F.lit("middle"), F.lit("tail"))
    has = scored.filter(F.col(ppl_col).isNotNull())
    nulls = scored.filter(F.col(ppl_col).isNull()).withColumn(
        "bucket", F.lit("unscored")
    )
    if mode == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy(
            F.col(ppl_col).asc(), F.col(id_col).asc()
        )
        wn = Window.partitionBy(group_col)
        ranked = has.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(wn)
        )
        idx = F.floor((3.0 * (F.col("_rn") - 1)) / F.col("_n")).cast("int")
        out = ranked.withColumn(
            "bucket", F.element_at(labels, F.least(idx, F.lit(2)) + 1)
        ).drop("_rn", "_n")
    else:
        th = has.groupBy(group_col).agg(
            F.percentile_approx(
                F.col(ppl_col), F.array(F.lit(1.0 / 3.0), F.lit(2.0 / 3.0))
            ).alias("_th")
        )
        out = has.join(F.broadcast(th), group_col).withColumn(
            "bucket",
            F.when(F.col(ppl_col) <= F.col("_th")[0], F.lit("head"))
            .when(F.col(ppl_col) <= F.col("_th")[1], F.lit("middle"))
            .otherwise(F.lit("tail")),
        ).drop("_th")
    return out.unionByName(nulls)


def stupid_backoff_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
) -> DataFrame:
    """Held-out trigram scoring under a corpus-trained stupid-backoff
    LM — the distributed n-gram LM of Brants et al. 2007 ("Large
    Language Models in Machine Translation", EMNLP; their eq. 5 with
    the recommended lambda = 0.4).

    The corpus is split deterministically by md5(doc_id) parity into a
    TRAIN half (counts) and a SCORE half (held-out documents) — so the
    backoff ladder is genuinely exercised: a held-out trigram may be
    unseen in training, falling to the bigram, unigram, or OOV rung.
    Score of position (w1 w2 w3):

    * ``c(w1 w2 w3) > 0``      → ``c(w1w2w3) / c(w1w2)``
    * elif ``c(w2 w3) > 0``    → ``0.4 * c(w2w3) / c(w2)``
    * else                     → ``0.4^2 * (c(w3)+1) / (N+V)``

    where N = train token count, V = train vocabulary size; the last
    rung is add-one smoothed so OOV words score finitely (Brants et
    al. leave OOV to the serving layer; additive floor documented
    here as the deviation). Counts are RAW n-gram frequencies (no
    normalization pass — the paper's point: stupid backoff needs no
    discounting statistics, which is what makes it trainable on
    trillions of tokens in one MapReduce-style pass).

    Returns one row per SCORE-half document:
    ``(id_col, n_trigrams, hits_tri, hits_bi, hits_uni,
    sb_logscore, sb_score)`` — hits_* count which rung each position
    resolved at (hits_uni includes OOV), sb_logscore is the
    left-associative position-ordered mean of ln S (round 6),
    sb_score = exp(mean) (round 6). Docs under 3 tokens report
    n_trigrams = 0 and NULL scores.

    Scale shape (the paper's own architecture, re-expressed in
    Catalyst):

    * Training is ONE corpus pass: per doc, all 1/2/3-grams emitted
      from one hoisted token array (three transform() HOFs concat'd),
      ONE explode, ONE groupBy on the md5 gram key with map-side
      partial aggregation. N and V derive from the aggregated counts
      table (sum / count over ord=1 rows), never a second corpus scan.
    * Lookup is the paper's batched shape: each score position emits
      its five needed keys (trigram, two bigrams, two unigrams) in
      LONG format, joined ONCE against the unified counts table on
      the gram hash — one shuffle join instead of five, then a
      doc_id+pos pivot (max-when over five tagged slots) that runs
      map-side after the join's exchange. Hot stop-grams skew the
      probe side; AQE skew-join splits them.
    * The per-doc fold is position-sorted and left-associative
      (collect_list bounded by doc length), bit-reproducible across
      partitionings — replayed exactly by the DuckDB oracle.
    """
    from karanta_ocr_spark.functions.text_analysis import WS_SQL

    toks_sql = f"split(lower(trim({text_col})), '{WS_SQL}+')"
    is_train = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10)
        .cast("long") % 2 == 0
    )
    base = docs.select(F.col(id_col), F.expr(toks_sql).alias("_toks"),
                       is_train.alias("_train"))

    # --- training: one explode over all orders, one groupBy ---------
    grams_sql = (
        "concat("
        "  transform(_toks, t -> concat('1:', t)),"
        "  CASE WHEN size(_toks) < 2 THEN array() ELSE"
        "    transform(sequence(1, size(_toks) - 1), i ->"
        "      concat('2:', element_at(_toks, i), ' ',"
        "             element_at(_toks, i + 1))) END,"
        "  CASE WHEN size(_toks) < 3 THEN array() ELSE"
        "    transform(sequence(1, size(_toks) - 2), i ->"
        "      concat('3:', element_at(_toks, i), ' ',"
        "             element_at(_toks, i + 1), ' ',"
        "             element_at(_toks, i + 2))) END)"
    )
    train_grams = base.filter(F.col("_train")).select(
        F.explode(F.expr(grams_sql)).alias("_g")
    ).select(
        F.substring("_g", 1, 1).cast("int").alias("_ord"),
        F.md5(F.col("_g")).alias("_k"),
    )
    # Persisted: two consumers (the nv aggregate and the lookup join)
    # would otherwise each re-run the corpus-sized explode+groupBy.
    # The cached table is gram-count-sized, not corpus-sized.
    counts = train_grams.groupBy("_ord", "_k").agg(
        F.count(F.lit(1)).alias("_cnt")).persist()
    # N (train tokens) and V (train vocab) from the counts table —
    # ord=1 rows are one-per-distinct-token with their frequencies.
    nv = counts.filter(F.col("_ord") == 1).agg(
        F.sum("_cnt").alias("_nn"), F.count(F.lit(1)).alias("_vv"))

    # --- scoring: long-format batched lookup (one join) -------------
    pos_sql = (
        "CASE WHEN size(_toks) < 3 THEN "
        "cast(array() as array<struct<pos:int,w1:string,w2:string,w3:string>>) "
        "ELSE transform(sequence(1, size(_toks) - 2), i -> named_struct("
        "'pos', i - 1, 'w1', element_at(_toks, i), "
        "'w2', element_at(_toks, i + 1), 'w3', element_at(_toks, i + 2))) END"
    )
    pos = base.filter(~F.col("_train")).select(
        F.col(id_col), F.explode(F.expr(pos_sql)).alias("e")
    ).select(
        id_col, F.col("e.pos").alias("pos"),
        F.col("e.w1").alias("_w1"), F.col("e.w2").alias("_w2"),
        F.col("e.w3").alias("_w3"),
    )
    # The F.concat key builders keep the md5 inputs byte-identical to
    # the training emission above.
    c = F.concat
    lit = F.lit
    key3 = F.md5(c(lit("3:"), F.col("_w1"), lit(" "), F.col("_w2"),
                   lit(" "), F.col("_w3")))
    key2c = F.md5(c(lit("2:"), F.col("_w1"), lit(" "), F.col("_w2")))
    key2 = F.md5(c(lit("2:"), F.col("_w2"), lit(" "), F.col("_w3")))
    key1c = F.md5(c(lit("1:"), F.col("_w2")))
    key1 = F.md5(c(lit("1:"), F.col("_w3")))
    slots = pos.select(
        id_col, "pos",
        F.explode(F.array(
            F.struct(lit("t3").alias("slot"), key3.alias("_k")),
            F.struct(lit("b_ctx").alias("slot"), key2c.alias("_k")),
            F.struct(lit("b").alias("slot"), key2.alias("_k")),
            F.struct(lit("u_ctx").alias("slot"), key1c.alias("_k")),
            F.struct(lit("u").alias("slot"), key1.alias("_k")),
        )).alias("_s"),
    ).select(id_col, "pos", F.col("_s.slot").alias("_slot"),
             F.col("_s._k").alias("_k"))
    looked = slots.join(counts.select("_k", "_cnt"), on="_k", how="left")
    piv = looked.groupBy(id_col, "pos").agg(
        F.max(F.when(F.col("_slot") == "t3", F.col("_cnt"))).alias("c3"),
        F.max(F.when(F.col("_slot") == "b_ctx", F.col("_cnt"))).alias("c2c"),
        F.max(F.when(F.col("_slot") == "b", F.col("_cnt"))).alias("c2"),
        F.max(F.when(F.col("_slot") == "u_ctx", F.col("_cnt"))).alias("c1c"),
        F.max(F.when(F.col("_slot") == "u", F.col("_cnt"))).alias("c1"),
    )
    lb = F.log(F.lit(backoff))
    piv = piv.crossJoin(F.broadcast(nv))
    logp = (
        F.when(F.col("c3").isNotNull(),
               F.log(F.col("c3")) - F.log(F.col("c2c")))
        .when(F.col("c2").isNotNull(),
              lb + F.log(F.col("c2")) - F.log(F.col("c1c")))
        .otherwise(lb + lb + F.log(F.coalesce(F.col("c1"), F.lit(0)) + 1.0)
                   - F.log(F.col("_nn") + F.col("_vv")))
    )
    rung = (
        F.when(F.col("c3").isNotNull(), F.lit("tri"))
        .when(F.col("c2").isNotNull(), F.lit("bi"))
        .otherwise(F.lit("uni"))
    )
    scored = piv.select(id_col, "pos", logp.alias("logp"),
                        rung.alias("rung"))
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum((F.col("rung") == "tri").cast("long")).alias("hits_tri"),
        F.sum((F.col("rung") == "bi").cast("long")).alias("hits_bi"),
        F.sum((F.col("rung") == "uni").cast("long")).alias("hits_uni"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "logp"))),
                lambda s: s["logp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sum"),
    )
    held = base.filter(~F.col("_train")).select(F.col(id_col))
    out = held.join(agg, on=id_col, how="left")
    mean = F.col("_sum") / F.col("_n")
    return out.select(
        id_col,
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_trigrams"),
        F.coalesce(F.col("hits_tri"), F.lit(0)).cast("long").alias("hits_tri"),
        F.coalesce(F.col("hits_bi"), F.lit(0)).cast("long").alias("hits_bi"),
        F.coalesce(F.col("hits_uni"), F.lit(0)).cast("long").alias("hits_uni"),
        F.round(mean, 6).alias("sb_logscore"),
        F.round(F.exp(mean), 6).alias("sb_score"),
    )
