"""Benchmark decontamination — flag training documents that contain
any token n-gram from a held-out evaluation set (the GPT-3 /
Gopher-style 13-gram overlap check; Brown et al. 2020 §C, Rae et al.
2021 appendix). A training-data pipeline runs this right before
publishing a corpus so eval answers don't leak into training text.

Scale shape (10^12 training docs × ~10^7 eval n-grams):

* The eval side is SMALL by construction (benchmarks are thousands of
  documents) — its distinct n-gram hashes are built once and
  broadcast, so the training side is a single broadcast-hash-join
  probe: zero shuffle of the corpus, no Python.
* The training side's n-grams are a Catalyst higher-order-function
  array (same ``transform(sequence(...))`` shape as the MinHash
  shingler) — exploded lazily, hashed JVM-side, and column-pruned so
  only (id, ngram_hash) rows flow into the probe.
* Counting uses the exploded DISTINCT n-grams per doc, so a repeated
  contaminated n-gram counts once — the number reported is "how many
  distinct eval n-grams appear in this doc".
* ``hash_mode='xxhash64'`` (default) keeps the probe key 8 bytes;
  ``'md5'`` makes the whole check replayable by an engine-neutral SQL
  oracle. ``'text'`` joins on the raw n-gram string (spec mode).

Reference scope note: the reference pipeline has no decontamination
stage; this operator is part of the training-data suite the brief
adds beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from karanta_ocr_spark.functions.text_analysis import WS_SQL


def _toks_sql(text_col: str) -> str:
    return f"split(lower(trim({text_col})), '{WS_SQL}+')"


def _ngrams_expr(toks_col: str, n: int) -> str:
    """SQL text for the DISTINCT word n-gram array over a PRE-HOISTED
    token-array column (Catalyst does not common-subexpression-
    eliminate across lambda boundaries, so inlining the split() here
    would re-tokenize once per n-gram — O(tokens²) per doc; hoisting
    it into a column first was measured 4-5× on the sibling LM
    operator). Documents shorter than *n* tokens yield an empty array
    (they cannot contain an n-gram, unlike the shingler which falls
    back to the whole text)."""
    return (
        f"CASE WHEN size({toks_col}) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(1, size({toks_col}) - {n} + 1), "
        f"i -> array_join(slice({toks_col}, i, {n}), ' '))) END"
    )


def _key_col(mode: str):
    if mode == "xxhash64":
        return F.xxhash64("ngram")
    if mode == "md5":
        return F.md5("ngram")
    if mode == "text":
        return F.col("ngram")
    raise ValueError(f"unknown hash_mode: {mode!r}")


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str = "text",
    hash_mode: str = "xxhash64",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Mark every row of *docs* with its eval-set n-gram overlap.

    Returns one row per input doc: ``(id_col, n_contaminated_ngrams,
    contaminated)`` where ``n_contaminated_ngrams`` counts the
    DISTINCT eval n-grams found in the doc and ``contaminated`` is
    true when that count is nonzero.

    *broadcast_eval* should stay True whenever the eval set is
    benchmark-sized (it always is); set False only if the eval
    n-gram set genuinely exceeds executor memory, which falls back to
    a shuffle hash join on the hash key.
    """
    ev = (
        eval_df.select(F.expr(_toks_sql(eval_text_col)).alias("_toks"))
        .select(F.explode(F.expr(_ngrams_expr("_toks", n))).alias("ngram"))
        .select(_key_col(hash_mode).alias("_nk"))
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    doc_ngrams = (
        docs.select(F.col(id_col), F.expr(_toks_sql(text_col)).alias("_toks"))
        .select(F.col(id_col), F.explode(F.expr(_ngrams_expr("_toks", n))).alias("ngram"))
        .select(id_col, _key_col(hash_mode).alias("_nk"))
    )
    hits = (
        doc_ngrams.join(ev, on="_nk", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated_ngrams"))
    )
    base = docs.select(id_col)
    out = base.join(hits, on=id_col, how="left")
    return out.select(
        id_col,
        F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0))
        .cast("long")
        .alias("n_contaminated_ngrams"),
        (F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)) > 0).alias(
            "contaminated"
        ),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    window: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring deduplication with REWRITE (the full Lee et al.
    2021 ExactSubstr semantics, windowed variant): corpus-duplicated
    *window*-token windows keep their globally-FIRST occurrence (by
    (doc, position) order, like ``dedup_paragraphs``); every token
    covered only by non-first duplicate occurrences is dropped, and
    each document's text is rebuilt from its surviving tokens in
    order.

    Returns ``(id_col, text, n_tokens, n_dropped)`` — one row per
    input row; a token survives unless some duplicated window covers
    it at a non-first occurrence and no first occurrence covers it.
    The rebuilt text is the LOWERCASED single-space token stream (the
    operator's unit is the token, not the byte — matching the
    windowed/tokenized variant of the algorithm, and keeping the
    match semantics identical to :func:`duplicate_span_stats`).

    Scale shape: same as :func:`duplicate_span_stats` (window HOF →
    hash groupBy with min(struct) first-occurrence selection →
    join-back on the hash — corpus text never a shuffle key) plus one
    groupBy per doc to rebuild the text from kept (pos, token) pairs;
    coverage explodes are bounded by the constant *window*."""
    toks_sql = _toks_sql(text_col)
    wins = (
        f"CASE WHEN size(_toks) < {window} THEN array() "
        f"ELSE transform(sequence(1, size(_toks) - {window} + 1), "
        f"i -> array_join(slice(_toks, i, {window}), ' ')) END"
    )
    base = docs.select(F.col(id_col), F.expr(toks_sql).alias("_toks"))
    per_pos = base.select(
        F.col(id_col), F.posexplode(F.expr(wins)).alias("pos", "ngram")
    ).select(id_col, "pos", _key_col(hash_mode).alias("_nk"))
    stats = per_pos.groupBy("_nk").agg(
        F.count(F.lit(1)).alias("_occ"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"),
    )
    dup_occ = per_pos.join(
        stats.filter(F.col("_occ") >= min_occurrences), on="_nk"
    ).withColumn(
        "_is_first",
        (F.col(id_col) == F.col("_first")[id_col])
        & (F.col("pos") == F.col("_first")["pos"]),
    )
    covered = dup_occ.select(
        F.col(id_col),
        "_is_first",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
        ).alias("tok_idx"),
    )
    # A token drops iff covered by some non-first occurrence and no
    # first occurrence covers it.
    verdict = covered.groupBy(id_col, "tok_idx").agg(
        F.max(F.when(F.col("_is_first"), 1).otherwise(0)).alias("_kept_cov"),
        F.max(F.when(~F.col("_is_first"), 1).otherwise(0)).alias("_dup_cov"),
    )
    dropped = verdict.filter(
        (F.col("_dup_cov") == 1) & (F.col("_kept_cov") == 0)
    ).select(id_col, "tok_idx")
    toks_pos = base.select(
        F.col(id_col), F.posexplode("_toks").alias("tok_idx", "tok")
    )
    kept = (
        toks_pos.join(dropped, on=[id_col, "tok_idx"], how="left_anti")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("tok_idx", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("_text"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    out = base.select(
        F.col(id_col), F.size("_toks").cast("long").alias("n_tokens")
    ).join(kept, on=id_col, how="left")
    return out.select(
        id_col,
        F.coalesce(F.col("_text"), F.lit("")).alias("text"),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


def duplicate_span_stats(
    docs: DataFrame,
    window: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring duplication profile (the windowed variant of
    Lee et al. 2021's ExactSubstr dedup, arXiv:2107.06499): slide a
    *window*-token window over every document, find windows whose
    text occurs at least *min_occurrences* times in the WHOLE corpus,
    and report how much of each document those duplicated windows
    cover.

    Returns ``(id_col, n_tokens, n_dup_windows, dup_token_frac)``:
    ``n_dup_windows`` counts this doc's window positions whose window
    is corpus-duplicated; ``dup_token_frac`` is the fraction of the
    doc's tokens covered by the union of those [pos, pos+window)
    intervals. Docs shorter than *window* tokens report 0/0.0.

    Scale shape: windows are a Catalyst HOF array (no Python);
    occurrence counting is one groupBy on the window hash with
    map-side partial aggregation (a boilerplate window is ONE group);
    the join back is on the hash — corpus text never becomes a
    shuffle key (same lesson as ``dedup_paragraphs``). Coverage is
    computed by exploding each duplicated position into its ≤window
    covered token indices and counting distinct (doc, index) — the
    explode factor is bounded by the constant *window*, and the
    count-distinct aggregates partially map-side.
    """
    toks = _toks_sql(text_col)
    wins = (
        f"CASE WHEN size(_toks) < {window} THEN array() "
        f"ELSE transform(sequence(1, size(_toks) - {window} + 1), "
        f"i -> array_join(slice(_toks, i, {window}), ' ')) END"
    )
    per_pos = docs.select(
        F.col(id_col), F.expr(toks).alias("_toks")
    ).select(F.col(id_col), F.posexplode(F.expr(wins)).alias("pos", "ngram"))
    keyed = per_pos.select(id_col, "pos", _key_col(hash_mode).alias("_nk"))
    dup_keys = (
        keyed.groupBy("_nk")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") >= min_occurrences)
        .select("_nk")
    )
    dup_pos = keyed.join(dup_keys, on="_nk", how="left_semi")
    covered = (
        dup_pos.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(window - 1))
            ).alias("tok_idx"),
        )
        .groupBy(id_col)
        .agg(F.countDistinct("tok_idx").cast("long").alias("_n_covered"))
    )
    n_dup = dup_pos.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_dup_windows")
    )
    base = docs.select(
        F.col(id_col), F.size(F.expr(toks)).cast("long").alias("n_tokens")
    )
    out = base.join(n_dup, on=id_col, how="left").join(covered, on=id_col, how="left")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("_n_dup_windows"), F.lit(0))
        .cast("long")
        .alias("n_dup_windows"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce(F.col("_n_covered"), F.lit(0)) / F.col("n_tokens"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
    )
