"""Language-ID heuristic quality over the fixture corpus: script-range
detection must be exact for non-Latin scripts; Latin langs may fall
back to diacritic guesses or 'und' (documented limitation)."""

from pyspark.sql import functions as F

from karanta_ocr_spark.functions.text_analysis import lang_id_heuristic
from karanta_ocr_spark.pipeline import run_extraction
from karanta_ocr_spark.sources.web_pages import synthetic_web_pages

SCRIPT_LANGS = {"amh", "nqo", "vai", "ara"}


def test_script_langs_detected_exactly(spark):
    web = synthetic_web_pages(spark, n_docs=96, seed=42)
    docs = run_extraction(spark, web, num_partitions=4)
    got = docs.select(
        "url", "lang", lang_id_heuristic(F.col("text")).alias("guess")
    ).collect()
    script_rows = [r for r in got if r["lang"] in SCRIPT_LANGS]
    assert script_rows, "corpus must include script-language docs"
    wrong = [
        (r["url"], r["lang"], r["guess"])
        for r in script_rows
        if r["guess"] != r["lang"]
    ]
    assert not wrong, wrong


def test_yoruba_diacritics_detected(spark):
    web = synthetic_web_pages(spark, n_docs=96, seed=42)
    docs = run_extraction(spark, web, num_partitions=4)
    yor = docs.filter(F.col("lang") == "yor").select(
        lang_id_heuristic(F.col("text")).alias("guess")
    ).collect()
    if yor:  # Yoruba diacritic markers present in every fixture doc
        assert all(r["guess"] == "yor" for r in yor)
