"""Distributed BPE merge learning (r5) — the tokenizer-TRAINING side
of the repo's BPE story (``functions/bpe.py`` encodes with a
committed merge list; ``scripts/train_bpe.py`` trains it scalar-side
one-time). This operator runs Sennrich et al. 2016 over a corpus
with Spark doing the data-sized work, so the pipeline can learn a
tokenizer from the same 100-TB corpus it curates:

1. **One corpus pass** (the only data-sized stage): JVM pretokenize →
   ``groupBy(word)`` count. Everything after runs on the DISTINCT
   pretoken table — Zipf-bounded (~100M rows at web scale, ~10⁴ at
   test scale), never the corpus.
2. **Per merge round**: explode adjacent symbol pairs of each
   distinct word (weighted by word count) → one small aggregation →
   argmax with the deterministic tie-break (count DESC, pair
   lexicographic ASC — byte order, identical in Spark and DuckDB) —
   a 1-row collect, same adjudication as the IVF centroids.
3. **Merge application** is a map-only JVM fold (``aggregate`` over
   the symbol array) — no Python crossing; state advances via
   ``localCheckpoint`` to truncate the iterative lineage, the same
   device as ``operators/graph.connected_components``.

Fold == scan equivalence (why the lambda is correct): the reference
scalar trainer applies a merge with a left-to-right scan consuming
two symbols at a time (leftmost non-overlapping). The fold instead
decides when it SEES the right symbol: merge iff the accumulator's
last element equals ``a`` and the current element equals ``b``.
These agree because a merged element ``a+b`` can never re-trigger
the same rule as its left side within the round — that would require
``a+b == a``, i.e. an empty ``b``. So after any merge the
accumulator tail is inert exactly like the scan's consumed cursor
(pytest pins equivalence against ``scripts/train_bpe.train`` on the
corpus and on adversarial repeats like ``aaaa``).

The DuckDB oracle replays every round: the same pair explosion and
argmax per round, the same fold — Spark's ``aggregate`` takes an
explicit init (the first symbol), while DuckDB's ``reduce`` has no
init value, so it folds over singleton lists (``[s]``), whose ``||``
concatenation keeps the accumulator a flat VARCHAR[]; both express
the identical leftmost merge. DuckDB slice bounds are INCLUSIVE —
dropping the accumulator's last element is ``acc[:-2]``, not
``[:-1]`` (a ``[:-1]`` silently keeps it and the round re-merges the
same pair forever; regression-tested).

Reference parity: karanta-ocr consumes pretrained tokenizers
(``karanta/utils.py`` AutoTokenizer loads); training one from the
extracted corpus is part of this repo's training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from karanta_ocr_spark.functions.bpe import pretokenize

#: Default number of merges learned by the query (kept small so the
#: unrolled oracle stays readable; the operator takes any M).
N_MERGES = 6


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass: (w, n) distinct-pretoken counts."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return (
        docs.select(F.explode(pretokenize(t)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def _apply_merge_expr(a: str, b: str) -> str:
    """JVM fold applying merge (a, b) leftmost non-overlapping to the
    ``syms`` column — list-of-lists shape for DuckDB parity (see
    module docstring)."""

    def q(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    return (
        "aggregate(slice(syms, 2, size(syms) - 1), "
        "array(syms[0]), "
        f"(acc, x) -> CASE WHEN element_at(acc, -1) = {q(a)} AND x = {q(b)} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({q(a + b)})) "
        "ELSE concat(acc, array(x)) END)"
    )


def bpe_learn(
    docs: DataFrame, n_merges: int = N_MERGES, text_col: str = "text"
) -> DataFrame:
    """Learn *n_merges* BPE merges from the corpus. Returns a
    DataFrame ``(rank, left, right, pair_count)`` in merge order
    (rank 1 = first/most frequent merge). Stops early if the corpus
    runs out of adjacent pairs."""
    spark = docs.sparkSession
    state = (
        word_counts(docs, text_col)
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        )
        .filter(F.length("w") > 0)
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        pairs = (
            state.filter(F.size("syms") > 1)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> array(element_at(syms, i), element_at(syms, i + 1)))"
                    )
                ).alias("pr"),
            )
            .select(
                F.col("pr")[0].alias("a"), F.col("pr")[1].alias("b"), "n"
            )
            .groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, cnt))
        state = state.withColumn(
            "syms",
            F.when(
                F.size("syms") < 2, F.col("syms")
            ).otherwise(F.expr(_apply_merge_expr(a, b))),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges or [], "rank int, left string, right string, pair_count bigint"
    )


def bpe_learn_oracle_sql(
    n_merges: int = N_MERGES, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`bpe_learn`: the same pretoken counts,
    then *n_merges* unrolled rounds of (pair explosion → argmax with
    the byte-order tie-break → fold-apply via ``reduce`` over
    singleton lists)."""
    from karanta_ocr_spark.functions.text_analysis import BPE_ISH_RE

    pat = BPE_ISH_RE.replace("'", "''")
    parts = [
        f"""pt AS (SELECT unnest(regexp_extract_all(coalesce(text, ''), '{pat}')) AS w
               FROM {table})""",
        """wc AS (SELECT w, count(*) AS n FROM pt WHERE length(w) > 0 GROUP BY w)""",
        """w0 AS (SELECT w, n,
                    list_transform(range(1, length(w) + 1), i -> w[i]) AS syms
             FROM wc)""",
    ]
    for r in range(1, int(n_merges) + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""p{r} AS (SELECT pr[1] AS a, pr[2] AS b, CAST(sum(n) AS BIGINT) AS cnt
                 FROM (SELECT n, unnest(list_transform(range(1, len(syms)),
                                    i -> [syms[i], syms[i+1]])) AS pr
                       FROM {prev} WHERE len(syms) > 1)
                 GROUP BY 1, 2)"""
        )
        parts.append(
            f"""b{r} AS (SELECT a, b, cnt FROM p{r}
                 ORDER BY cnt DESC, a, b LIMIT 1)"""
        )
        parts.append(
            f"""w{r} AS (SELECT w, n,
                    CASE WHEN len(syms) < 2 THEN syms
                         ELSE reduce(
                              list_transform(syms, s -> [s]),
                              (acc, x) -> CASE WHEN acc[-1] = b{r}.a
                                                AND x[1] = b{r}.b
                                          -- DuckDB slice bounds are INCLUSIVE:
                                          -- [:-2] drops the last element
                                          THEN acc[:-2] || [b{r}.a || b{r}.b]
                                          ELSE acc || x END)
                    END AS syms
                 FROM {prev} CROSS JOIN b{r})"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, a AS left, b AS right, cnt AS pair_count FROM b{r}"
        for r in range(1, int(n_merges) + 1)
    )
    return "WITH " + ",\n".join(parts) + "\nSELECT * FROM (" + sel + ") ORDER BY rank"
