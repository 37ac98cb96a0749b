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


def test_french_not_shadowed_by_yoruba(spark):
    # Plain French accents are a subset of Yoruba tone-marked vowels;
    # the scored markers must classify French as fra (VERDICT r01 wart).
    rows = [
        (0, "le château était déjà fermé, la fenêtre donnait sur la forêt"),
        (1, "ọmọ mi fẹ́ràn oúnjẹ aládùn àti ẹja ṣíṣè"),
        (2, "ụmụ anyị na-aṅụ mmiri ọhụrụ n'ụtụtụ"),
        (3, "plain ascii text with no diacritics at all"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r["i"]: r["g"] for r in
           df.select("i", lang_id_heuristic(F.col("text")).alias("g")).collect()}
    assert got == {0: "fra", 1: "yor", 2: "igb", 3: "und"}
