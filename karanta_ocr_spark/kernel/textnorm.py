"""Text normalization: mojibake repair + Unicode NFC + element cleanup.

Reference semantics: ``karanta/prompts/anchor.py:201-228`` —
``_cleanup_element_text`` applies ``ftfy.fix_text`` (which repairs
mojibake and NFC-normalizes), strips, escapes ``[ ] \\n \\r \\t``, and
caps at 250 chars with a head ``...`` tail split on word boundaries
(``_cap_split_string``, ``anchor.py:201-211``).

ftfy is not available in this environment, so :func:`fix_text` is a
deterministic stdlib reimplementation of the two ftfy behaviors the
corpus exercises: (1) undo latin-1/cp1252 mojibake (UTF-8 bytes
mis-decoded as a single-byte codepage) by round-tripping while the
result strictly improves, and (2) ``unicodedata.normalize("NFC", s)``
— critical for Ge'ez, N'Ko, Vai and Latin-with-diacritics text where
NFD variants must collapse to identical bytes.
"""

from __future__ import annotations

import re
import unicodedata

# A mojibake bigram is a lead char of a UTF-8 sequence mis-decoded as
# latin-1/cp1252 (U+00C2..U+00F4 region: \xc3, \xc2, \xe1.. lead bytes)
# followed by a char from the latin-1 upper half or the cp1252
# punctuation block. Built programmatically to avoid regex-range bugs.
_LEADS = "".join(chr(c) for c in range(0xC0, 0xF5))
_CP1252_PUNCT = "".join(
    chr(c)
    for c in (
        0x20AC, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021, 0x02C6,
        0x2030, 0x0160, 0x2039, 0x0152, 0x017D, 0x2018, 0x2019, 0x201C,
        0x201D, 0x2022, 0x2013, 0x2014, 0x02DC, 0x2122, 0x0161, 0x203A,
        0x0153, 0x017E, 0x0178,
    )
)
_FOLLOW = "".join(chr(c) for c in range(0x80, 0x100)) + _CP1252_PUNCT
_MOJIBAKE_HINT = re.compile("[%s][%s]" % (re.escape(_LEADS), re.escape(_FOLLOW)))


def _badness(s: str) -> int:
    """Count of mojibake-indicator bigrams in *s* (lower is better)."""
    return len(_MOJIBAKE_HINT.findall(s))


def _try_round_trip(s: str, encoding: str) -> str | None:
    try:
        return s.encode(encoding, "strict").decode("utf-8", "strict")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return None


def fix_text(s: str, max_passes: int = 3) -> str:
    """Deterministic mojibake repair + NFC normalization.

    Stand-in for ``ftfy.fix_text`` (``karanta/prompts/anchor.py:221``).
    Repairs apply only when they strictly reduce the mojibake badness
    score, so clean text is left alone; repeated passes unwind
    doubly-encoded text. Always finishes with NFC.
    """
    if not s:
        return s
    if s.isascii():
        # Mojibake lead/follow chars and NFC-unstable sequences are
        # all non-ASCII, so ASCII text is a fixed point of both
        # repairs; one C-speed scan replaces the findall + normalize.
        return s
    cur = s
    for _ in range(max_passes):
        bad = _badness(cur)
        if bad == 0:
            break
        improved = None
        for enc in ("cp1252", "latin-1"):
            cand = _try_round_trip(cur, enc)
            if cand is not None and _badness(cand) < bad:
                improved = cand
                break
        if improved is None:
            break
        cur = improved
    return unicodedata.normalize("NFC", cur)


def cap_split_string(text: str, max_length: int) -> str:
    """Reference ``_cap_split_string`` (``karanta/prompts/anchor.py:201-211``),
    byte-identical: head/tail of ``max_length//2 - 3`` chars, split on
    word boundaries, joined with ``" ... "``."""
    if len(text) <= max_length:
        return text

    head_length = max_length // 2 - 3
    tail_length = head_length

    head = text[:head_length].rsplit(" ", 1)[0] or text[:head_length]
    tail = text[-tail_length:].split(" ", 1)[-1] or text[-tail_length:]

    return f"{head} ... {tail}"


_ELEMENT_REPLACEMENTS = {"[": "\\[", "]": "\\]", "\n": "\\n", "\r": "\\r", "\t": "\\t"}
_ELEMENT_PATTERN = re.compile("|".join(re.escape(k) for k in _ELEMENT_REPLACEMENTS))
MAX_TEXT_ELEMENT_LENGTH = 250


def clean_element_text(element_text: str) -> str:
    """Reference ``_cleanup_element_text`` (``karanta/prompts/anchor.py:214-228``):
    fix_text → strip → escape ``[ ] \\n \\r \\t`` → 250-char cap-split."""
    element_text = fix_text(element_text).strip()
    element_text = _ELEMENT_PATTERN.sub(
        lambda m: _ELEMENT_REPLACEMENTS[m.group(0)], element_text
    )
    return cap_split_string(element_text, MAX_TEXT_ELEMENT_LENGTH)


_WS_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n{3,}")


def normalize_block_text(s: str) -> str:
    """Whitespace canonicalization for HTML block text: collapse
    horizontal whitespace runs, strip line edges, collapse 3+ newlines
    to 2, then mojibake-repair + NFC. Deterministic."""
    # Identity guard: block text arriving from the flattener is
    # already space-collapsed, so the three substitution passes below
    # are usually no-ops. Chained `in` checks are C-speed scans; the
    # regex alternation they replace walked clean text at interpreter
    # speed (profiled at ~20% of the extraction kernel).
    if not (
        "\n" in s
        or "  " in s
        or "\t" in s
        or "\r" in s
        or "\f" in s
        or "\v" in s
    ):
        return fix_text(s.strip(" "))
    ascii_ws = " \t\r\f\v\n"
    s = _WS_RUN.sub(" ", s)
    s = "\n".join(line.strip(ascii_ws) for line in s.split("\n"))
    s = _NL_RUN.sub("\n\n", s).strip(ascii_ws)
    return fix_text(s)
