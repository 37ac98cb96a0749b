"""Deterministic Common-Crawl-style ``web_pages`` corpus generator.

Shape per ``BASELINE.json`` ``input_hint`` / ``FIXTURES.md §1``:
``(url string, warc_ts timestamp, html binary, text string, lang
string)``. Seed-fixed (default 42), no external data.

Covers the corpus features the kernel must handle:
* Zipf-skewed domain pool (a few hot domains → skew/salting tests);
* labeled HTML blocks: nav/header/footer/aside boilerplate with high
  link density vs. ``<article>`` main paragraphs — in Yoruba
  (Latin+diacritics), Hausa, Igbo, Swahili, Amharic (Ge'ez), N'Ko,
  Vai, English, French, Arabic;
* NFD-encoded diacritic words (must NFC-collapse byte-identically);
* mojibake spans (UTF-8 mis-decoded as latin-1) that
  ``kernel.textnorm.fix_text`` must repair;
* a PDF tail (~10%): multi-page, two-column, overlapping-image,
  >100-image quirk page, corrupt bytes (error-rate drop);
* size-skew tail: a few blobs 50×+ the median (size-bucket tests).

Each row also carries test-only hints (``_expect_present`` /
``_expect_absent`` / ``_kind``) consumed by the property tests
(FIXTURES.md §4 shapes); the Spark input schema drops them.
"""

from __future__ import annotations

import datetime as dt
import random
import unicodedata

from karanta_ocr_spark.fixtures.pdf_gen import ImageSpec, PageSpec, TextRun, build_pdf

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)

DOMAINS = [  # Zipf weights applied below; index 0 is the hot domain
    "news.example-ng.com", "habari.example-tz.org", "zena.example-et.net",
    "iroyin.example-ng.org", "manding.example-gn.com", "vai.example-lr.org",
    "actualites.example-sn.com", "akhbar.example-ma.net",
    "paper.example-ke.org", "archive.example-gh.com",
]
ZIPF_W = [1.0 / (i + 1) for i in range(len(DOMAINS))]

WORDS = {
    "yor": "ọjọ́ dáadáa àárọ̀ ìròyìn àgbáyé èdè aláyé ọmọ orílẹ̀-èdè gbogbo ènìyàn kaabo".split(),
    "hau": "ina kwana barka da zuwa labarai duniya harshen jama'a kasa sabon rahoto".split(),
    "igb": "ndeewo ụtụtụ ọma akụkọ ụwa asụsụ obodo ndị mmadụ ozi ọhụrụ nke".split(),
    "swa": "habari za asubuhi karibu dunia lugha taarifa watu nchi mpya leo sana".split(),
    "amh": "ሰላም እንኳን ደህና መጡ ዜና ኢትዮጵያ ቋንቋ መረጃ ሕዝብ አገር አዲስ ዛሬ".split(),
    "nqo": "ߒߞߏ ߞߊ߲ ߞߎ߲ߠߊߛߌ߮ ߘߐߝߐ ߖߌ߬ߦߊ ߞߌ߬ߓߊ߯ߙߏ ߡߊ߲߬ߘߋ߲ ߞߊ߬ߙߊ߲".split(),
    "vai": "ꕉꕜꕮ ꔔꘋ ꖸ ꔰ ꗋꘋ ꕮꕨ ꔵꔒ ꕢꕌ ꕘꕞ ꗏꗒ".split(),
    "eng": "today report world language people country news daily update public story".split(),
    "fra": "aujourd'hui rapport monde langue peuple pays nouvelles quotidien mise à jour".split(),
    "ara": "اليوم تقرير العالم لغة الناس بلد أخبار يومي تحديث قصة".split(),
}
LANGS = list(WORDS)

NAV_LABELS = ["Home", "News", "Politics", "Sports", "Culture", "Contact", "About"]


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    words = WORDS[lang]
    return " ".join(rng.choice(words) for _ in range(n))


def _paragraph(rng: random.Random, lang: str) -> str:
    return ". ".join(_sentence(rng, lang, rng.randint(6, 12)) for _ in range(rng.randint(2, 4))) + "."


def _mojibake(s: str) -> str:
    """UTF-8 bytes mis-decoded as latin-1 — what fix_text must undo."""
    return s.encode("utf-8").decode("latin-1")


def _build_html(rng: random.Random, domain: str, lang: str, big: bool):
    headline = _sentence(rng, lang, rng.randint(4, 7))
    n_paras = rng.randint(3, 6) * (50 if big else 1)
    paras = [_paragraph(rng, lang) for _ in range(n_paras)]
    # expected extracted text per paragraph (differs from the raw HTML
    # form for entity/inline-markup cases below)
    expected_paras = list(paras)

    # One NFD paragraph (diacritic langs) — must NFC-collapse.
    if lang in ("yor", "fra") and not big:
        paras[0] = unicodedata.normalize("NFD", paras[0])
    # One mojibake paragraph — must repair. Only non-ASCII text mangles.
    moji_src = None
    if lang in ("yor", "fra", "amh", "nqo", "vai", "ara") and rng.random() < 0.5 and not big:
        moji_src = _paragraph(rng, lang)
        paras.append(_mojibake(moji_src))

    caption = _sentence(rng, lang, 2)  # short block kept by near-good rule

    # Messy-web features (entities, comments, CDATA-ish script, inline
    # markup, unclosed tags) that must not perturb extraction.
    messy = rng.random() < 0.4 and not big
    if messy:
        ent_word = _sentence(rng, lang, 3)
        tail = (
            "text with entity éclat plus bold nested styling inline "
            "that still reads as one paragraph of the article body"
        )
        paras.insert(
            1,
            f"{ent_word} &amp; more &lt;tagged&gt; "
            + tail.replace("bold nested styling", "<b>bold <i>nested</b> styling</i>")
            .replace("éclat", "&#233;clat"),
        )
        expected_paras.insert(1, f"{ent_word} & more <tagged> {tail}")
    nav = " ".join(f'<a href="/{label.lower()}">{label}</a>' for label in NAV_LABELS)
    related = "".join(
        f'<li><a href="/r/{i}">{_sentence(rng, lang, 3)}</a></li>' for i in range(5)
    )
    footer_note = f"© 2025 {domain} — All rights reserved"

    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    comment = "<!-- rendered by synthcms; do not index -->"
    html = f"""<!DOCTYPE html>
<html lang="{lang}"><head><title>{headline} — {domain}</title>
<style>body {{ font: 16px serif }}</style>
<script>//<![CDATA[
var tracker = "{domain}"; trackPage(1 < 2 && 3 > 2);
//]]></script>
</head><body>
{comment}
<header><div class="branding">{domain.upper()} PORTAL</div>
<nav>{nav}</nav></header>
<div id="content">
<article>
<h1>{headline}</h1>
{body_paras}
<p>{caption}</p>
</article>
<aside><h3>Related</h3><ul>{related}</ul></aside>
</div>
<footer><p>{footer_note} <a href="/privacy">Privacy</a> <a href="/terms">Terms</a></p></footer>
</body></html>"""

    expect_present = [unicodedata.normalize("NFC", headline)] + [
        unicodedata.normalize("NFC", p) for p in expected_paras[:2]
    ]
    if moji_src is not None:
        expect_present.append(unicodedata.normalize("NFC", moji_src))
    expect_absent = ["PORTAL", "All rights reserved", "Privacy", "Related"]
    raw_text = unicodedata.normalize("NFC", headline + "\n" + "\n".join(paras))
    return html, raw_text, expect_present, expect_absent


def _build_pdf_doc(rng: random.Random, kind: str, lang: str) -> bytes:
    def lines(n: int, x: float, w: int = 6) -> list[str]:
        return [_sentence(rng, lang, w) for _ in range(n)]

    if kind == "pdf_multi":  # 3 single-column pages
        pages = []
        for _ in range(3):
            runs = [
                TextRun(t, 72.0, 720.0 - 20.0 * i)
                for i, t in enumerate(lines(rng.randint(4, 8), 72.0))
            ]
            pages.append(PageSpec(runs=runs))
        return build_pdf(pages, compress=rng.random() < 0.5)
    if kind == "pdf_twocol":  # one two-column page
        left = [TextRun(t, 60.0, 700.0 - 22.0 * i) for i, t in enumerate(lines(5, 60.0))]
        right = [TextRun(t, 330.0, 700.0 - 22.0 * i) for i, t in enumerate(lines(5, 330.0))]
        return build_pdf([PageSpec(runs=left + right)])
    if kind == "pdf_images":  # overlapping images + text
        runs = [TextRun(t, 72.0, 700.0 - 20.0 * i) for i, t in enumerate(lines(3, 72.0))]
        imgs = [
            ImageSpec(100, 100, 80, 60),
            ImageSpec(150, 130, 80, 60),  # overlaps the first → merged
            ImageSpec(400, 500, 50, 50),  # isolated
        ]
        return build_pdf([PageSpec(runs=runs, images=imgs)])
    if kind == "pdf_quirk101":  # >100 images → anchor "" (merge quirk)
        imgs = [ImageSpec(10 + 5 * i, 10 + 3 * i, 4, 4) for i in range(101)]
        runs = [TextRun(t, 72.0, 700.0 - 20.0 * i) for i, t in enumerate(lines(3, 72.0))]
        return build_pdf([PageSpec(runs=runs, images=imgs)])
    if kind == "pdf_corrupt":
        return b"%PDF-1.4\nthis is not a real pdf body" + bytes(rng.getrandbits(8) for _ in range(64))
    raise ValueError(kind)


PDF_KINDS = ["pdf_multi", "pdf_twocol", "pdf_images", "pdf_quirk101", "pdf_corrupt"]


def generate_web_pages(n_docs: int = 64, seed: int = 42) -> list[dict]:
    """Generate *n_docs* corpus rows. Deterministic in (n_docs, seed)."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for i in range(n_docs):
        domain = rng.choices(DOMAINS, weights=ZIPF_W)[0]
        lang = rng.choice(LANGS)
        is_pdf = i % 10 == 9  # stable ~10% PDF tail
        big = (not is_pdf) and i % 23 == 7  # size-skew tail
        url = f"https://{domain}/{lang}/{i:06d}.{'pdf' if is_pdf else 'html'}"
        warc_ts = EPOCH + dt.timedelta(hours=i)
        if is_pdf:
            kind = PDF_KINDS[(i // 10) % len(PDF_KINDS)]
            payload = _build_pdf_doc(rng, kind, lang)
            rows.append(
                dict(url=url, warc_ts=warc_ts, html=payload, text="", lang=lang,
                     _kind=kind, _expect_present=[], _expect_absent=[])
            )
        else:
            html, raw_text, present, absent = _build_html(rng, domain, lang, big)
            rows.append(
                dict(url=url, warc_ts=warc_ts, html=html.encode("utf-8"),
                     text=raw_text, lang=lang, _kind="html_big" if big else "html",
                     _expect_present=present, _expect_absent=absent)
            )
    return rows


def corpus_pandas(n_docs: int = 64, seed: int = 42):
    """The corpus as a pandas DataFrame with exactly the input_hint
    schema (hints dropped) — ready for ``spark.createDataFrame``."""
    import pandas as pd

    rows = generate_web_pages(n_docs, seed)
    return pd.DataFrame(
        [
            {k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")}
            for r in rows
        ]
    )
