"""PII scrubbing and URL canonicalization — the two row-level
hygiene passes a web-corpus pipeline runs between extraction and
dedup (the reference stores raw urls and emits Dolma-shaped docs;
Dolma's public toolkit applies exactly this email/phone/IP masking).

All pure Catalyst ``regexp_replace``/string expressions — zero Python,
zero shuffle. Patterns deliberately avoid constructs RE2 lacks
(``\\b``, lookarounds) so the DuckDB oracle applies the IDENTICAL
regex semantics (leftmost-first greedy match behaves the same for
these patterns in Java regex and RE2). Whitespace, where needed, is
the explicit ``[ \\t-\\r]`` class from ``functions.text_analysis.WS``
— NOT ``\\s``, whose membership differs between the engines (Java
includes U+000B vertical tab, RE2 does not).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: RE2- and java.util.regex-compatible patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: Valid-octet IPv4 with consumed-character boundaries: RE2 has no
#: \b/lookarounds, so the boundary is a captured non-digit-non-dot
#: character (or string edge) on each side, re-inserted by the
#: replacement. This rejects 300.400.500.600 (octets > 255) and stops
#: '1.2.3.4567' from being half-eaten into '|||IP|||7'. Limitation
#: (same in both engines, so oracle-safe): two IPs separated by a
#: single character share the boundary char and only the first masks.
_IPV4_OCT = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
IPV4_RE = rf"(?:^|([^\d.])){_IPV4_OCT}(?:\.{_IPV4_OCT}){{3}}(?:$|([^\d.]))"
#: Phone shapes, not bare digit runs: either +countrycode with 2-4
#: separated groups, or the NANP 3-3-4 form with required separators.
#: Deliberately does NOT match dates (2021-08-16), ISBNs
#: (978-0-306-40615-7), or spaced numbers (1 000 000) — an earlier
#: any-8+-digit-run pattern masked all of those.
#: Both edges carry the consumed-boundary guard (like IPV4_RE): the
#: left one stops the NANP alternative matching INSIDE longer digit
#: runs (1234-567-8901 → ``1|||PHONE|||``), the right one stops the
#: NANP alternative half-eating runs that EXTEND past ten digits
#: (555-123-45678 → ``|||PHONE|||8``). Known residual (same in both
#: engines, so oracle-safe): the INTERNATIONAL alternative's greedy
#: ``(?:[ .-]?\\d{2,4}){2,4}`` can still backtrack to end at an
#: internal separator of a longer digit run ('+12 345 678 901234567'
#: → '|||PHONE||| 901234567') — fully fixing that needs a lookahead,
#: which RE2 lacks. Because each match consumes its boundary chars,
#: adjacent phones separated by one char need the second scrub pass
#: in :func:`scrub_pii`.
PHONE_RE = (
    r"(?:^|([^\d]))"
    r"(?:\+\d{1,3}(?:[ .-]?\d{2,4}){2,4}"
    r"|\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4})"
    r"(?:$|([^\d]))"
)

EMAIL_TOKEN = "|||EMAIL|||"
IP_TOKEN = "|||IP|||"
PHONE_TOKEN = "|||PHONE|||"


def count_matches(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern))


def scrub_pii(col: Column) -> Column:
    """Mask emails, then IPv4 addresses, then phone numbers (order
    matters: emails can contain digit runs, IPs would otherwise be
    eaten by the phone pattern). The IP and phone replacements
    re-insert their captured boundary characters ($1/$2; unmatched at
    string edges → empty).

    The phone pattern runs TWICE: each match consumes its single
    boundary character, so in 'call 555-123-4567,555-987-6543' the
    first pass eats the comma and leaves the second number unmasked —
    the standard fix for consumed-boundary guards in lookaround-free
    (RE2-safe) patterns is a second pass, which catches any number
    whose left boundary was consumed by a previous match. Two passes
    reach a fixed point: a pass only rewrites digit runs into
    non-digit tokens, so pass 2 can only fire where pass 1 consumed a
    boundary, and pass 3 would find nothing new."""
    out = F.regexp_replace(col, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, "$1" + IP_TOKEN + "$2")
    out = F.regexp_replace(out, PHONE_RE, "$1" + PHONE_TOKEN + "$2")
    out = F.regexp_replace(out, PHONE_RE, "$1" + PHONE_TOKEN + "$2")
    return out


def canonicalize_url(col: Column) -> Column:
    """Conservative URL canonicalization for url-level dedup:

    1. drop the ``#fragment``;
    2. lowercase the ``scheme://authority`` part (path/query keep
       case — they are case-sensitive on most servers);
    3. drop default ports ``:80``/``:443``;
    4. drop ``utm_*`` tracking params in three deterministic steps —
       non-first params (``&utm_…``), a first param with a follower
       (``?utm_…&`` → ``?``), a lone param (``?utm_…$`` → ``""``) —
       so ``?utm_x=1&real=1`` correctly becomes ``?real=1``;
    5. strip one trailing ``/``.

    Pure regexp steps with identical Java/RE2 semantics."""
    u = F.regexp_replace(col, r"#.*", "")
    # Lowercase scheme+authority: split at the first '/' after '://'.
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    tail = F.substring(u, F.length(head) + F.lit(1), F.length(u))
    u = F.when(head != "", F.concat(F.lower(head), tail)).otherwise(u)
    # Default ports are scheme-specific: :80 is only default for
    # http, :443 only for https (http://host:443 is a DIFFERENT
    # origin and must not be conflated).
    u = F.regexp_replace(u, r"^(http://[^/:]+):80(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:]+):443(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"&utm_[A-Za-z0-9_]*=[^&#]*", "")
    u = F.regexp_replace(u, r"\?utm_[A-Za-z0-9_]*=[^&#]*&", "?")
    u = F.regexp_replace(u, r"\?utm_[A-Za-z0-9_]*=[^&#]*$", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"(.)/$", r"$1")
    return u


#: Card-shaped digit runs: 13-19 digits, optionally separated by
#: SINGLE spaces or dashes (the common 4-4-4-4 print format), with
#: consumed-boundary guards on both edges like IPV4_RE/PHONE_RE.
#: Shape alone is NOT enough to mask (13-19 digit ids are everywhere)
#: — candidates must also pass the Luhn mod-10 check, which a plain
#: regexp_replace cannot express; see scrub_cards.
CARD_RE = (
    r"(?:^|([^\d]))"
    r"(\d(?:[ -]?\d){12,18})"
    r"(?:$|([^\d]))"
)

CARD_TOKEN = "|||CARD|||"


def _luhn_valid(c: Column) -> Column:
    """Luhn mod-10 validity of the digit string inside candidate
    column *c* (optional single separators allowed). Pure Catalyst
    HOFs: extract digits, fold from the RIGHT doubling every second
    digit. The DuckDB twin lives in the pii_cards oracle."""
    digs = F.regexp_extract_all(c, F.lit("[0-9]"), F.lit(0))
    n = F.size(digs)

    def digit_at(i: Column) -> Column:
        return F.element_at(digs, (n - i + F.lit(1)).cast("int")).cast("int")

    def contrib(acc: Column, i: Column) -> Column:
        d = digit_at(i)
        doubled = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        return acc + F.when(i % 2 == 0, doubled).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), n), F.lit(0), contrib)
    return n.between(13, 19) & (total % 10 == 0)


def scrub_cards(col: Column) -> Column:
    """Mask card-shaped digit runs that PASS the Luhn check.

    Conditional masking needs two phases (regexp_replace cannot call
    Luhn): (1) regexp_extract_all the card-SHAPED candidates, keep
    the Luhn-valid ones; (2) left-fold plain replace() over the
    validated strings. Both phases are Catalyst HOFs — map-only, no
    Python, no shuffle.

    Compose BEFORE :func:`scrub_pii` when using both: the phone
    pattern would otherwise eat the middle of a spaced card number
    first. Caveat (documented, identical in the oracle): replace()
    masks every occurrence of a validated substring, including a
    (vanishingly unlikely) appearance inside a longer digit run
    elsewhere in the same document."""
    cands = F.regexp_extract_all(col, F.lit(CARD_RE), F.lit(2))
    valid = F.filter(cands, _luhn_valid)
    return F.aggregate(
        valid, col, lambda acc, c: F.replace(acc, c, F.lit(CARD_TOKEN))
    )


def count_valid_cards(col: Column) -> Column:
    """Number of distinct Luhn-valid card-shaped candidates."""
    cands = F.regexp_extract_all(col, F.lit(CARD_RE), F.lit(2))
    return F.size(
        F.array_distinct(F.filter(cands, _luhn_valid))
    ).cast("bigint")


def url_shape_features(col: Column) -> Column:
    """URL-shape quality features as one struct — the URL-level
    signals web-corpus filters act on before reading a byte of the
    page (RefinedWeb/C4 style: deep paths and parameter-heavy or
    digit-heavy URLs correlate with templated/SEO/calendar junk):

    ``host``, ``path_depth`` (non-empty segments), ``path_len``,
    ``n_params`` (query k=v pairs), ``digit_frac`` of the path
    (round 6; NULL for an empty path), ``is_homepage``.

    Pure Catalyst regexes (RE2-safe), zero shuffle — composes into
    the page scan like the other hygiene passes."""
    host = F.lower(
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    path = F.regexp_extract(
        col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(col, r"\?([^#]*)", 1)
    seg_count = F.size(
        F.filter(F.split(path, "/"), lambda s: s != "")
    )
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    path_digits = F.length(path) - F.length(
        F.regexp_replace(path, r"[0-9]", "")
    )
    return F.struct(
        host.alias("host"),
        seg_count.cast("bigint").alias("path_depth"),
        F.length(path).cast("bigint").alias("path_len"),
        n_params.cast("bigint").alias("n_params"),
        F.round(
            path_digits / F.nullif(F.length(path).cast("double"), F.lit(0.0)),
            6,
        ).alias("digit_frac"),
        ((path == "") | (path == "/")).alias("is_homepage"),
    )
