"""Text-analysis column expressions for training-data pipelines.

All JVM-side Catalyst expressions (no Python UDFs): token counting,
quality scoring, document fingerprinting, and a character-range
language-ID heuristic. Each is a function Column → Column so they
compose into any plan and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A small multilingual stopword list (English + French + Swahili +
# Hausa function words) — enough signal for quality scoring.
STOPWORDS = [
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "for",
    "le", "la", "les", "de", "et", "un", "une", "du",
    "ya", "wa", "na", "kwa", "ni", "za",
    "da", "ta", "ba", "ka", "su",
]


def tokens(col: Column) -> Column:
    """Whitespace tokens (trimmed; no empty tokens)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return hits / F.size(toks)


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.size(toks)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    stripped = F.regexp_replace(col, r"[!-/:-@\[-`{-~]", "")
    return (F.length(col) - F.length(stripped)) / F.length(col)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: rewarded for stopword
    presence and sane token lengths, penalized for punctuation
    density. Deterministic, fully JVM."""
    sw = stopword_ratio(col)
    atl = avg_token_len(col)
    pr = punct_ratio(col)
    length_ok = F.when((atl >= 2.5) & (atl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_term = F.least(sw * 3.0, F.lit(1.0))
    return F.round((0.5 * sw_term + 0.5 * length_ok) * (1.0 - F.least(pr * 2.0, F.lit(1.0))), 6)


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint over whitespace-canonicalized lowercase text
    (md5 so a DuckDB oracle can reproduce it)."""
    canon = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.md5(canon)


def fingerprint_xxh(col: Column) -> Column:
    """64-bit fingerprint for shuffle keys (xxhash64 — faster, JVM)."""
    canon = F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))
    return F.xxhash64(canon)


# Unicode script ranges for the African-language scripts the corpus
# targets (public Unicode block boundaries).
_SCRIPT_RANGES = [
    ("amh", r"[ሀ-፿]"),   # Ethiopic (Ge'ez)
    ("nqo", r"[߀-߿]"),   # N'Ko
    ("vai", r"[ꔀ-꘿]"),   # Vai
    ("ara", r"[؀-ۿ]"),   # Arabic
]

_LATIN_MARKERS = [
    ("yor", r"[ẹọṣàáèéìíòóùú̀́]"),  # Yoruba diacritics
    ("igb", r"[ụịọṅẹ]"),
    ("fra", r"[àâçéèêëîïôûù]"),
]


def lang_id_heuristic(col: Column) -> Column:
    """Script/character-range language ID. Returns the first matching
    script code, a Latin-diacritic guess, else 'und'. Deterministic
    priority order; pure regexp (JVM)."""
    # Build from lowest to highest priority: the last .when wrapped
    # (= first list entry) wins.
    expr = F.lit("und")
    for code, pat in reversed(_SCRIPT_RANGES + _LATIN_MARKERS):
        expr = F.when(col.rlike(pat), F.lit(code)).otherwise(expr)
    return expr
