"""Text-analysis column expressions for training-data pipelines.

All JVM-side Catalyst expressions (no Python UDFs): token counting,
quality scoring, document fingerprinting, and a character-range
language-ID heuristic. Each is a function Column → Column so they
compose into any plan and stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Explicit whitespace class shared by every oracle-checked pattern.
#: Java's ``\s`` is ``[ \t\n\x0B\f\r]`` but RE2's ``\s`` is only
#: ``[\t\n\f\r ]`` — a document containing a vertical tab (U+000B)
#: would tokenize differently between Spark and the DuckDB oracle if
#: the patterns said ``\s``. ``[ \t-\r]`` (space + the 0x09–0x0D
#: range) spells out Java's set and means the same thing in both
#: engines. Three spellings for the three quoting layers:
#: ``WS`` goes straight to a Java-regex API (F.split/regexp_replace),
#: ``WS_SQL`` is embedded in Spark SQL text (one unescape pass),
#: ``WS_DUCK`` is embedded in DuckDB SQL text (no unescape pass).
WS = r"[ \t-\r]"
WS_SQL = r"[ \\t-\\r]"
WS_DUCK = r"[ \t-\r]"

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
    return F.split(F.trim(col), WS + "+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


#: GPT-2-style pretokenizer pattern (public, from the released
#: encoder), restricted to RE2-compatible constructs so the DuckDB
#: oracle counts identically: the original's trailing-whitespace
#: lookahead ``\s+(?!\S)`` is dropped (RE2 has no lookarounds) — for
#: counting purposes a run of spaces is one token either way.
#: Alternation order matters (leftmost-first in both engines).
#: Whitespace is the explicit ``WS`` class, not ``\s`` (VT caveat above).
BPE_ISH_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^ \t-\r\p{L}\p{N}]+"
    r"|" + WS + "+"
)


def bpe_ish_token_count(col: Column) -> Column:
    """Subword-ish token count: how a BPE pretokenizer would segment
    the text before merges — the budget number an LLM-training
    pipeline actually wants (whitespace tokens undercount CJK/agglutinative
    text and punctuation-heavy web text)."""
    return F.regexp_count(col, F.lit(BPE_ISH_RE))


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
    canon = F.lower(F.regexp_replace(F.trim(col), WS + "+", " "))
    return F.md5(canon)


def fingerprint_xxh(col: Column) -> Column:
    """64-bit fingerprint for shuffle keys (xxhash64 — faster, JVM)."""
    canon = F.lower(F.regexp_replace(F.trim(col), WS + "+", " "))
    return F.xxhash64(canon)


# Unicode script ranges for the African-language scripts the corpus
# targets (public Unicode block boundaries).
_SCRIPT_RANGES = [
    ("amh", r"[ሀ-፿]"),   # Ethiopic (Ge'ez)
    ("nqo", r"[߀-߿]"),   # N'Ko
    ("vai", r"[ꔀ-꘿]"),   # Vai
    ("ara", r"[؀-ۿ]"),   # Arabic
]

# Latin-script languages are disambiguated by WEIGHTED marker counts,
# not first-match priority: plain French accents (à é è ù) are a
# subset of Yoruba's tone-marked vowels, so a priority list made every
# French text 'yor' (r01 wart). Strong markers are characters
# (near-)exclusive to the language; weak markers are shared-but-
# suggestive and only tip the scale.
_LATIN_SCORED = [
    # (code, strong pattern ×3, weak pattern ×1)
    ("yor", r"[ẹọṣ]", r"[áíóúàèìòù̀́]"),   # dot-below + tone-marked vowels
    ("igb", r"[ụịṅ]", r"[ẹọ́̀]"),           # dot-below u/i + n-dot
    ("fra", r"[âçêëîïôûœ]", r"[àéèù]"),    # circumflex/cedilla/diaeresis
]


def lang_id_heuristic(col: Column) -> Column:
    """Script/character-range language ID, fully JVM.

    Non-Latin scripts (Ge'ez, N'Ko, Vai, Arabic) are exact block-range
    matches in priority order. Latin-script candidates score
    ``3×strong + 1×weak`` marker occurrences; the highest score wins
    (ties broken by list order), zero everywhere → 'und'."""
    scores = [
        (code, F.regexp_count(col, F.lit(strong)) * 3 + F.regexp_count(col, F.lit(weak)))
        for code, strong, weak in _LATIN_SCORED
    ]
    best = F.greatest(*[s for _, s in scores])
    latin = F.lit("und")
    # Wrap lowest→highest priority so the FIRST list entry wins ties.
    for code, s in reversed(scores):
        latin = F.when((best > 0) & (s == best), F.lit(code)).otherwise(latin)
    expr = latin
    for code, pat in reversed(_SCRIPT_RANGES):
        expr = F.when(col.rlike(pat), F.lit(code)).otherwise(expr)
    return expr


# Per-block character-count classes for script composition profiling
# (public Unicode block boundaries; all BMP, so Spark's and DuckDB's
# codepoint `length` agree). "latin" spans ASCII letters, Latin-1
# letters (÷ and × excluded), Latin Extended-A/B + IPA, and Latin
# Extended Additional — the block carrying Yoruba/Igbo dot-below and
# tone-marked vowels. Combining marks (U+0300–036F) intentionally
# count as "other": post-extraction text is NFC, so a high combining-
# mark count is a normalization-drift signal, not script signal.
SCRIPT_COUNT_CLASSES = [
    ("latin", "[A-Za-zÀ-ÖØ-öø-ʯḀ-ỿ]"),
    ("ethiopic", "[ሀ-፿]"),   # Ge'ez syllabary + supplement
    ("nko", "[߀-߿]"),        # N'Ko
    ("vai", "[ꔀ-꘿]"),        # Vai syllabary
    ("arabic", "[؀-ۿ]"),     # Arabic + supplement (Ajami)
]


def char_class_count(col: Column, char_class: str) -> Column:
    """Codepoints of *col* inside regex *char_class* — via the
    length-difference identity (`regexp_replace` strips the class),
    which DuckDB reproduces verbatim with the ``g`` flag."""
    return F.length(col) - F.length(F.regexp_replace(col, char_class, ""))


def dominant_script(counts: list[tuple[str, Column]]) -> Column:
    """Name of the largest count (ties: first list entry wins), or
    ``'none'`` when every count is zero — same shape as the
    `lang_id_heuristic` tie-break so the DuckDB CASE chain matches."""
    best = F.greatest(*[c for _, c in counts])
    expr = F.lit("none")
    for name, c in reversed(counts):
        expr = F.when((best > 0) & (c == best), F.lit(name)).otherwise(expr)
    return expr


def class_entropy(counts: list[Column], total: Column) -> Column:
    """Shannon entropy (nats) of the character-class distribution —
    the gibberish/mojibake scalar on top of the script profile: clean
    monolingual prose concentrates its mass in one script class plus
    space (low-to-mid entropy, stable per language), while mojibake
    and binary-spray pages smear mass across classes (entropy toward
    ln(k)) and all-one-class junk (digit walls, base64 runs counted
    as 'other') collapses toward 0. Sum order is the caller's fixed
    class order, left to right — the DuckDB oracle adds its terms in
    the same order, so the doubles match bit for bit. NULL for empty
    text."""
    s = None
    for c in counts:
        frac = c / total
        term = F.when(c > 0, -frac * F.log(frac)).otherwise(F.lit(0.0))
        s = term if s is None else s + term
    return F.when(total > 0, F.round(s, 6))
