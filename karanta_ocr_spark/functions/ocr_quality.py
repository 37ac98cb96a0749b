"""OCR-artifact detection — post-OCR quality signals for a corpus
whose documents came through an OCR/extraction pipeline (the
reference is an OCR system for African-language documents:
``/root/reference/karanta/pipeline.py`` produces model-extracted text
whose classic failure modes are exactly these artifacts).

Signals (each a pure-Catalyst Column; all patterns RE2-safe so the
DuckDB oracle replays them verbatim):

* ``replacement_count`` — U+FFFD count: upstream decode failures.
* ``isolated_diacritic_count`` — combining marks (U+0300–036F) at
  text start or after whitespace: OCR splitting tone marks off their
  base letters, the signature failure for Yoruba/Igbo dot-below and
  tone-marked vowels (post-extraction text is NFC, so a combining
  mark can only legitimately follow a letter the composition table
  couldn't fuse — a *space* before one is always an artifact).
* ``broken_hyphen_count`` — ``letter- lowercase`` sequences: line-
  break dehyphenation that kept the hyphen ("exam- ple").
* ``consonant_run_count`` — runs of ≥5 ASCII consonants ("rnmcl"):
  character-soup misrecognition.
* ``single_letter_token_frac`` — fraction of tokens that are one
  letter: fragmented words (prose baseline is near zero outside
  "a"/"I").
* ``mixed_alnum_token_frac`` — tokens mixing letters and digits
  ("l1ke", "0f"): digit/letter confusion.
* ``ocr_artifact_score`` — fixed weighted combination (char-level
  counts per 100 chars + token-level fractions); ``ocr_garbled``
  verdict at the documented threshold. The score is defined in
  INTEGER MICRO-UNITS (floor-divided) and only then divided by 1e6 —
  the same fixed-point device as ``operators/train_lr`` — so Spark
  and the DuckDB oracle produce bit-identical doubles instead of
  meeting at a round-half tie on the 6th decimal.

Scale: every signal is a regexp/HOF length identity — map-only,
zero shuffle, whole-stage codegen at 100 TB. The per-doc report
aggregates nothing; corpus-level rates are one partial agg on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from karanta_ocr_spark.functions.text_analysis import WS, WS_DUCK, tokens

#: Combining diacritical marks block, as literal codepoints so the
#: identical pattern string works in Java regex and RE2.
COMBINING = "̀-ͯ"

#: Pattern constants shared verbatim by the Spark plan and the DuckDB
#: oracle builder (the ``{ws}`` slot differs per engine, nothing else).
ISOLATED_DIACRITIC_PAT = "(^|{ws})[" + COMBINING + "]"
BROKEN_HYPHEN_PAT = "[A-Za-z]-{ws}[a-z]"
CONSONANT_RUN_PAT = "[bcdfghjklmnpqrstvwxzBCDFGHJKLMNPQRSTVWXZ]{{5,}}"
SINGLE_LETTER_TOKEN_PAT = "^[A-Za-z]$"
LETTER_PAT = "[A-Za-z]"
DIGIT_PAT = "[0-9]"

#: score >= this → ``ocr_garbled`` (tuned on the fixture corpus: clean
#: prose scores < 0.3, any synthetic artifact family clears 1.0).
GARBLED_THRESHOLD = 1.0


def replacement_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, "�", ""))


def isolated_diacritic_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(ISOLATED_DIACRITIC_PAT.format(ws=WS)))


def broken_hyphen_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(BROKEN_HYPHEN_PAT.format(ws=WS)))


def consonant_run_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(CONSONANT_RUN_PAT.format()))


def _token_frac(toks: Column, pred) -> Column:
    n = F.size(toks)
    return F.when(
        n > 0, F.round(F.size(F.filter(toks, pred)) / n.cast("double"), 6)
    ).otherwise(F.lit(0.0))


def single_letter_token_frac(col: Column) -> Column:
    return _token_frac(tokens(col), lambda t: t.rlike(SINGLE_LETTER_TOKEN_PAT))


def mixed_alnum_token_frac(col: Column) -> Column:
    return _token_frac(
        tokens(col), lambda t: t.rlike(LETTER_PAT) & t.rlike(DIGIT_PAT)
    )


def ocr_artifact_report(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document OCR-artifact report. One map-only pass."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    rep = replacement_count(t)
    iso = isolated_diacritic_count(t)
    hyp = broken_hyphen_count(t)
    run = consonant_run_count(t)
    slf = single_letter_token_frac(t)
    maf = mixed_alnum_token_frac(t)
    toks = tokens(t)
    slf_cnt = F.size(F.filter(toks, lambda x: x.rlike(SINGLE_LETTER_TOKEN_PAT)))
    maf_cnt = F.size(
        F.filter(toks, lambda x: x.rlike(LETTER_PAT) & x.rlike(DIGIT_PAT))
    )
    ntoks = F.greatest(F.size(toks), F.lit(1)).cast("long")
    nchars = F.greatest(F.length(t), F.lit(1)).cast("long")
    # Integer micro-units: floor-divided weighted terms, summed as
    # bigints, divided by 1e6 once at the end — values stay < 2^53 so
    # both engines compute the identical double.
    k = (rep * 2 + iso * 2 + hyp + run).cast("long")
    micro = (
        F.floor(k * F.lit(100000000).cast("long") / nchars)
        + F.floor(slf_cnt.cast("long") * F.lit(500000) / ntoks)
        + F.floor(maf_cnt.cast("long") * F.lit(1000000) / ntoks)
    )
    score = micro / F.lit(1000000.0)
    return docs.select(
        F.col(id_col),
        rep.cast("long").alias("replacement_count"),
        iso.cast("long").alias("isolated_diacritic_count"),
        hyp.cast("long").alias("broken_hyphen_count"),
        run.cast("long").alias("consonant_run_count"),
        slf.alias("single_letter_token_frac"),
        maf.alias("mixed_alnum_token_frac"),
        score.alias("ocr_artifact_score"),
        (score >= F.lit(GARBLED_THRESHOLD)).alias("ocr_garbled"),
    )


def ocr_artifact_oracle_sql(
    table: str = "documents", text_expr: str = "coalesce(text, '')"
) -> str:
    """DuckDB twin of :func:`ocr_artifact_report` over *text_expr*
    (callers substitute the same synthesized variant corpus they feed
    the Spark side)."""
    iso = ISOLATED_DIACRITIC_PAT.format(ws=WS_DUCK).replace("'", "''")
    hyp = BROKEN_HYPHEN_PAT.format(ws=WS_DUCK).replace("'", "''")
    run = CONSONANT_RUN_PAT.format().replace("'", "''")
    return f"""
        WITH base AS (SELECT doc_id, {text_expr} AS t FROM {table}),
        feat AS (SELECT doc_id, t,
                        length(t) - length(replace(t, chr(65533), ''))
                            AS replacement_count,
                        len(regexp_extract_all(t, '{iso}')) AS isolated_diacritic_count,
                        len(regexp_extract_all(t, '{hyp}')) AS broken_hyphen_count,
                        len(regexp_extract_all(t, '{run}')) AS consonant_run_count,
                        -- exact Spark split() parity: trim-then-split,
                        -- NO empty-token filter (empty text → [''],
                        -- matching Spark's [""] — both engines then
                        -- compute 0/1 = 0.0 for the fractions)
                        regexp_split_to_array(trim(t), '{WS_DUCK}+') AS toks
                 FROM base),
        cnt AS (SELECT *,
                       len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]$')))
                           AS slf_cnt,
                       len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')
                                              AND regexp_matches(x, '[0-9]')))
                           AS maf_cnt,
                       greatest(len(toks), 1) AS ntoks,
                       greatest(length(t), 1) AS nchars
                FROM feat),
        fr AS (SELECT *,
                      CASE WHEN len(toks) > 0 THEN round(
                          slf_cnt / CAST(len(toks) AS DOUBLE), 6) ELSE 0.0 END
                          AS single_letter_token_frac,
                      CASE WHEN len(toks) > 0 THEN round(
                          maf_cnt / CAST(len(toks) AS DOUBLE), 6) ELSE 0.0 END
                          AS mixed_alnum_token_frac
               FROM cnt),
        sc AS (SELECT *,
                      -- integer micro-units (floor division), exactly
                      -- the Spark plan's fixed-point arithmetic
                      (floor((replacement_count * 2 + isolated_diacritic_count * 2
                              + broken_hyphen_count + consonant_run_count)
                             * 100000000 / CAST(nchars AS DOUBLE))
                       + floor(slf_cnt * 500000 / CAST(ntoks AS DOUBLE))
                       + floor(maf_cnt * 1000000 / CAST(ntoks AS DOUBLE)))
                          / 1000000.0 AS ocr_artifact_score
               FROM fr)
        SELECT doc_id,
               CAST(replacement_count AS BIGINT) AS replacement_count,
               CAST(isolated_diacritic_count AS BIGINT) AS isolated_diacritic_count,
               CAST(broken_hyphen_count AS BIGINT) AS broken_hyphen_count,
               CAST(consonant_run_count AS BIGINT) AS consonant_run_count,
               single_letter_token_frac, mixed_alnum_token_frac,
               ocr_artifact_score,
               (ocr_artifact_score >= {GARBLED_THRESHOLD}) AS ocr_garbled
        FROM sc
    """
