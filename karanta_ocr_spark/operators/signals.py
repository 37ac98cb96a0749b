"""Document-level corpus signals beyond the per-row filters:
paragraph-granular code-switching statistics and the compression-
ratio quality signal.

Code-switching matters specifically for the corpus this engine
targets: African-language web text routinely interleaves an African
language with English/French INSIDE one page (forum posts, news sites
with English boilerplate, bilingual government pages). A document-
level language ID then either mislabels the page or throws it away;
the per-paragraph mixture profile below is what a curation pipeline
needs to (a) keep genuinely bilingual pages, (b) split them, or (c)
route them to bitext mining (``operators/bitext``).

The compression-ratio signal is the classic one-number text-quality
probe (used alongside Gopher/C4 rules in published pipelines):
highly templated/repetitive text compresses far below normal prose,
while random gibberish/binary-ish content barely compresses at all.
zlib at a FIXED level makes the byte length deterministic for a given
input, so verdicts are stable across partitionings and reruns.

Scale shape: code-switch stats are pure Catalyst (explode paragraphs
→ two bounded groupBys; the per-doc language list is ≤ the number of
language codes, so the entropy fold is a tiny HOF). Compression runs
as one Arrow-batched pandas UDF (zlib is C-speed; the crossing is the
usual vectorized seam, never per-row Python in a join/agg path).

Reference scope note: the reference has neither signal; part of the
beyond-reference training-data suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from karanta_ocr_spark.functions.text_analysis import lang_id_heuristic


def code_switch_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    minority_share: float = 0.1,
) -> DataFrame:
    """Per-document paragraph-language mixture profile:
    ``(id_col, n_paragraphs, n_langs, dominant_lang, dominant_share,
    lang_entropy, is_code_switched)``.

    Paragraphs are newline-separated non-blank runs; each gets the
    JVM heuristic LID (``lang_id_heuristic`` — script ranges +
    weighted diacritic markers). ``lang_entropy`` is the Shannon
    entropy (nats) of the paragraph-language distribution;
    ``is_code_switched`` = at least two languages with the minority
    share ≥ *minority_share*. Docs with no non-blank paragraph report
    0/0/'none'/NULL shares.

    Determinism: dominant ties break on the lexicographically
    smallest code; the entropy fold runs over the lang-sorted count
    list.
    """
    paras = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"filter(split({text_col}, '\\n+'), "
                "p -> length(trim(p)) > 0)"
            )
        ).alias("_para"),
    ).select(id_col, lang_id_heuristic(F.col("_para")).alias("_lang"))
    per_lang = paras.groupBy(id_col, "_lang").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    agg = per_lang.groupBy(id_col).agg(
        F.sum("_n").alias("_tot"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.array_sort(F.collect_list(F.struct("_lang", "_n"))).alias("_ls"),
    )
    # dominant = (max count, then lexicographically smallest lang):
    # max count per doc, then min lang among rows at that count.
    top = (
        per_lang.alias("x")
        .join(
            per_lang.groupBy(id_col).agg(F.max("_n").alias("_mx")).alias("m"),
            on=id_col,
        )
        .filter(F.col("_n") == F.col("_mx"))
        .groupBy(id_col)
        .agg(F.min("_lang").alias("dominant_lang"), F.max("_n").alias("_dn"))
    )
    ent = F.aggregate(
        F.transform(F.col("_ls"), lambda s: s["_n"].cast("double") / F.col("_tot")),
        F.lit(0.0),
        lambda acc, p: acc - p * F.log(p),
    )
    out = (
        agg.join(top, on=id_col)
        .select(
            id_col,
            F.col("_tot").cast("long").alias("n_paragraphs"),
            "n_langs",
            "dominant_lang",
            F.round(F.col("_dn") / F.col("_tot"), 6).alias("dominant_share"),
            F.round(ent, 6).alias("lang_entropy"),
            (
                (F.col("n_langs") >= 2)
                & (F.col("_dn") / F.col("_tot") <= 1.0 - minority_share)
            ).alias("is_code_switched"),
        )
    )
    base = docs.select(F.col(id_col))
    return base.join(out, on=id_col, how="left").select(
        id_col,
        F.coalesce("n_paragraphs", F.lit(0)).cast("long").alias("n_paragraphs"),
        F.coalesce("n_langs", F.lit(0)).cast("long").alias("n_langs"),
        F.coalesce("dominant_lang", F.lit("none")).alias("dominant_lang"),
        "dominant_share",
        "lang_entropy",
        F.coalesce("is_code_switched", F.lit(False)).alias("is_code_switched"),
    )


def compression_signals(
    docs: DataFrame,
    text_col: str = "text",
    level: int = 6,
    repetitive_below: float = 0.25,
    gibberish_above: float = 0.95,
) -> DataFrame:
    """Append ``compressed_ratio`` (zlib-level-*level* bytes / utf-8
    bytes, round 6; NULL for empty text) and a ``compression_verdict``
    of 'repetitive' (ratio < *repetitive_below*), 'gibberish'
    (> *gibberish_above*), else 'normal'. Ratios can exceed 1.0 on
    tiny inputs (header overhead) — they read as 'gibberish', which is
    the right call for sub-header-sized fragments."""
    from pyspark.sql.functions import pandas_udf

    def _ratio_fn(texts):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return texts.apply(one)

    # explicit wrap (not the type-hint form): this module uses
    # `from __future__ import annotations`, which stringizes hints
    # and breaks pyspark's signature inference
    _ratio = pandas_udf(_ratio_fn, "double")
    ratio = F.round(_ratio(F.col(text_col)), 6)
    out = docs.withColumn("compressed_ratio", ratio)
    verdict = (
        F.when(F.col("compressed_ratio").isNull(), F.lit("empty"))
        .when(F.col("compressed_ratio") < repetitive_below, F.lit("repetitive"))
        .when(F.col("compressed_ratio") > gibberish_above, F.lit("gibberish"))
        .otherwise(F.lit("normal"))
    )
    return out.withColumn("compression_verdict", verdict)
