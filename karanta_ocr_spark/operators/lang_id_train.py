"""Trained character-n-gram language ID (r5, judge task #5).

The heuristic LID (``functions/text_analysis.lang_id_heuristic``) is
script ranges + weighted diacritic markers — no training. Production
web pipelines (CCNet's fastText lid.176, langid.py) instead use a
trained character-n-gram classifier. This module composes two pieces
the repo already trusts into exactly that:

* hashed n-gram features (the DSIR device,
  ``operators/importance.py`` — here CHARACTER trigrams, the unit
  public LID models use, md5-bucketed so DuckDB replays the hashing);
* the exact fixed-point logistic-regression trainer
  (``operators/train_lr.fit_logreg`` — quantized integer gradient
  sums make the fitted trajectory partition-invariant and
  oracle-replayable term for term).

Shape: one-vs-rest — one binary LR per language over the per-document
trigram-bucket frequency vector; prediction is the argmax of the
linear scores (monotone in the sigmoid, so no exp at predict time),
ties broken by class order. Scale: feature extraction is pure
Catalyst (one pass, zero shuffle); each training iteration is one
map-side-combined corpus aggregation producing d+1 scalars; scoring
is map-only with the K weight vectors folded in as plan literals —
the same 100-TB posture as ``quality_lr_train``.

The deterministic fixture corpus synthesizes labeled text from
``doc_id`` (class = ``doc_id % K``, words drawn from per-language
lists by modular arithmetic) so the DuckDB oracle can rebuild the
identical corpus — the established pattern for this repo's
derived-column queries (e.g. ``host_reputation``). The word lists
carry the Latin-diacritic confusable pairs the heuristic struggles
with (French accents ⊂ Yoruba tone-vowels; Igbo dot-below) plus
plain-ASCII English.

Reference parity: karanta-ocr loads fitted classifiers for scoring
(``karanta/utils.py`` AutoTokenizer/classifier loads); training the
model over the extracted corpus is the downstream mandate this repo
adds, now including the language-ID model a curation pipeline gates
on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from karanta_ocr_spark.operators.train_lr import QUANT, _dot_expr

#: (code, 16 words) per class — class k is ``doc_id % len(LID_LANGS)``.
#: Diacritics chosen so yor/igb/fra collide on weak markers (the
#: heuristic's hard case) while their trigram distributions differ.
LID_LANGS = [
    ("eng", ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dogs", "while", "river", "stone", "light", "house",
             "green", "water", "night"]),
    ("fra", ["château", "déjà", "fenêtre", "forêt", "être", "garçon",
             "août", "île", "très", "près", "après", "même", "tête",
             "hôtel", "cœur", "noël"]),
    ("yor", ["ọmọ", "fẹ́ràn", "oúnjẹ", "aládùn", "ẹja", "ṣíṣè",
             "báwo", "àárọ̀", "ilé", "omi", "ọjà", "ṣùgbọ́n", "dára",
             "kékeré", "àgbà", "ọ̀rẹ́"]),
    ("igb", ["ụmụ", "anyị", "aṅụ", "mmiri", "ọhụrụ", "ụtụtụ",
             "nwoke", "nwaanyị", "chọrọ", "ụlọ", "akwụkwọ", "ịhụ",
             "ndị", "ọzọ", "ihe", "ụbọchị"]),
]

#: Words per synthesized document.
DOC_WORDS = 12
#: Hashed trigram feature buckets (d=8 keeps the unrolled oracle SQL
#: tractable while the diacritic trigrams still separate the classes).
NUM_BUCKETS = 8
#: Hash-domain seed/tag (distinct from DSIR's '42:u:').
SEED_TAG = "7:g:"
ITERS = 4
LR = 2.0

FEATURE_COLS = [f"f{b}" for b in range(NUM_BUCKETS)]


def _sql_quote(w: str) -> str:
    return "'" + w.replace("'", "''") + "'"


def _word_pick(engine: str, words: list[str]) -> str:
    """Engine-specific SQL: the j-th synthesized word of a doc —
    ``words[(doc_id*7 + j*5) % 16]`` (identical arithmetic both
    engines; arrays are 1-indexed in both)."""
    lit = ", ".join(_sql_quote(w) for w in words)
    idx = f"(doc_id * 7 + j * 5) % {len(words)}"
    if engine == "spark":
        return (
            f"array_join(transform(sequence(0, {DOC_WORDS - 1}), "
            f"j -> element_at(array({lit}), cast({idx} as int) + 1)), ' ')"
        )
    return (
        f"array_to_string(list_transform(range(0, {DOC_WORDS}), "
        f"j -> ([{lit}])[({idx}) + 1]), ' ')"
    )


def _synth_text_sql(engine: str) -> str:
    """CASE over ``doc_id % K`` building the labeled fixture text."""
    k = len(LID_LANGS)
    branches = [
        f"WHEN doc_id % {k} = {i} THEN {_word_pick(engine, words)}"
        for i, (_, words) in enumerate(LID_LANGS)
    ]
    return "CASE " + " ".join(branches) + " END"


def _synth_lang_sql() -> str:
    k = len(LID_LANGS)
    branches = [
        f"WHEN doc_id % {k} = {i} THEN '{code}'"
        for i, (code, _) in enumerate(LID_LANGS)
    ]
    return "CASE " + " ".join(branches) + " END"


def synth_labeled_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_true, text) — deterministic labeled corpus."""
    return docs.select(
        "doc_id",
        F.expr(_synth_lang_sql()).alias("lang_true"),
        F.expr(_synth_text_sql("spark")).alias("text"),
    )


def _bucket_sql(engine: str, tri_expr: str) -> str:
    if engine == "spark":
        return (
            f"cast(conv(substring(md5(concat('{SEED_TAG}', {tri_expr})), "
            f"1, 15), 16, 10) as bigint) % {NUM_BUCKETS}"
        )
    return (
        f"('0x' || substr(md5('{SEED_TAG}' || {tri_expr}), 1, 15))::BIGINT "
        f"% {NUM_BUCKETS}"
    )


def _feature_sqls_duckdb(text_expr: str = "text") -> list[str]:
    """d DuckDB expressions: relative frequency of each trigram
    bucket. Trigram i = substr(lower(text), i, 3) for i in 1..len-2
    (docs shorter than 3 chars contribute a single truncated gram, so
    the denominator is never 0). Values match the Spark features
    exactly: integer count / integer length in IEEE double."""
    t = f"lower({text_expr})"
    grams = (
        f"list_transform(range(1, greatest(length({t}) - 2, 1) + 1), "
        f"i -> substr({t}, i, 3))"
    )
    bk = _bucket_sql("duckdb", "g")
    buckets = f"list_transform({grams}, g -> {bk})"
    return [
        f"CAST(len(list_filter({buckets}, b -> b = {b})) AS DOUBLE) "
        f"/ CAST(len({buckets}) AS DOUBLE)"
        for b in range(NUM_BUCKETS)
    ]


def trigram_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append f0..f{d-1} hashed-trigram frequency features. The md5
    bucket array is materialized ONCE per row in its own projection
    (not re-derived per feature — d× the hashing would dominate the
    pass), then each frequency column reads it."""
    t = f"lower({text_col})"
    grams = (
        f"transform(sequence(1, greatest(length({t}) - 2, 1)), "
        f"i -> substring({t}, i, 3))"
    )
    bk = _bucket_sql("spark", "g")
    out = df.withColumn("_bkts", F.expr(f"transform({grams}, g -> {bk})"))
    for b, name in enumerate(FEATURE_COLS):
        out = out.withColumn(
            name,
            F.expr(
                f"cast(size(filter(_bkts, b -> b = {b})) as double) "
                f"/ cast(size(_bkts) as double)"
            ),
        )
    return out.drop("_bkts")


def train_lang_id(
    train: DataFrame,
    label_col: str = "lang_true",
    iters: int = ITERS,
    lr: float = LR,
) -> dict[str, list[float]]:
    """One-vs-rest: fit one exact fixed-point LR per class. Returns
    ``{code: [w_1..w_d, intercept]}`` — K·(d+1) doubles of driver-side
    model parameters (same adjudication as the IVF centroids).

    All K classes' gradient sums ride ONE aggregation per iteration:
    the per-class steps are independent given the shared corpus, so
    batching them cuts K·iters sequential jobs (+K counts) down to
    iters jobs (+1 count) — each a map-side-combined partial agg of
    K·(d+1) exact fixed-point sums. The per-class arithmetic (the
    quantized gradient expression, the NULL-label semantics of
    ``label = code``) is byte-identical to the per-class
    :func:`fit_logreg` path, so the weight trajectories — and the
    unrolled DuckDB oracle replay — are unchanged."""
    codes = [code for code, _ in LID_LANGS]
    n = train.count()
    d = len(FEATURE_COLS)
    xs = list(FEATURE_COLS) + ["1"]  # intercept pseudo-feature
    ws: dict[str, list[float]] = {c: [0.0] * (d + 1) for c in codes}
    for _ in range(int(iters)):
        aggs = []
        for ci, c in enumerate(codes):
            z = _dot_expr(FEATURE_COLS, ws[c])
            sig = f"(1.0D / (1.0D + exp(-({z}))))"
            y = f"cast(cast(({label_col} = '{c}') as int) as double)"
            aggs.extend(
                F.sum(
                    F.expr(
                        f"cast(round(({sig} - {y}) * {x} * {QUANT})"
                        f" as bigint)"
                    )
                ).alias(f"g{ci}_{j}")
                for j, x in enumerate(xs)
            )
        row = train.agg(*aggs).collect()[0]
        for ci, c in enumerate(codes):
            ws[c] = [
                ws[c][j] - lr * ((row[f"g{ci}_{j}"] or 0) / QUANT) / n
                for j in range(d + 1)
            ]
    return ws


def predict_lang(
    df: DataFrame, models: dict[str, list[float]]
) -> DataFrame:
    """Append ``lang_pred`` = argmax_k of the linear score w_k·x
    (monotone in the sigmoid; ties → first class in LID_LANGS order).
    Map-only: the K weight vectors enter the plan as literals."""
    zs = [
        (code, F.expr(_dot_expr(FEATURE_COLS, models[code])))
        for code, _ in LID_LANGS
    ]
    best = F.greatest(*[z for _, z in zs])
    pred = F.lit("und")
    for code, z in reversed(zs):
        pred = F.when(z == best, F.lit(code)).otherwise(pred)
    return df.withColumn("lang_pred", pred)


def lang_id_trained(docs: DataFrame) -> DataFrame:
    """The full query: synth labeled corpus → features → train on the
    ``doc_id % 5 != 0`` split → score EVERY doc → per-doc verdict
    ``(doc_id, lang_true, lang_pred, is_holdout, correct)``."""
    corpus = trigram_features(synth_labeled_corpus(docs))
    # The trainer runs K·iters (+K count) aggregations over this
    # frame; without a persist every one of them re-synthesizes the
    # corpus and re-hashes every trigram (md5 ×3 chars/row ×16 jobs —
    # measured ~5× the query wall at sf0.1). The cache holds d+2
    # doubles per row, not text. Values are unchanged — the gradient
    # trajectory is the same fixed-point sequence either way.
    train = corpus.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id", "lang_true", *FEATURE_COLS
    ).persist()
    # Size-adaptive coalesce of the iteration table (guide §2): every
    # gradient aggregation pays per-partition task overhead on this
    # cached d+2-double frame; a narrow merge sizes it to the data
    # (1 task at bench scale, full parallelism at production row
    # counts). train_lang_id's own count() is served by the cache.
    import math
    import os

    rows_per_task = int(
        os.environ.get("SPARK_GRAFT_GRAPH_ROWS_PER_TASK", "250000")
    )
    n_rows = train.count()
    npart = max(
        1,
        min(
            train.sparkSession.sparkContext.defaultParallelism,
            math.ceil(n_rows / rows_per_task),
        ),
    )
    fit_frame = train
    if npart < train.rdd.getNumPartitions():
        fit_frame = train.coalesce(npart)
    models = train_lang_id(fit_frame)
    train.unpersist()  # scoring reads `corpus`; the cache is dead here
    scored = predict_lang(corpus, models)
    return scored.select(
        "doc_id",
        "lang_true",
        "lang_pred",
        (F.col("doc_id") % 5 == 0).alias("is_holdout"),
        (F.col("lang_pred") == F.col("lang_true")).alias("correct"),
    )


def lang_id_oracle_sql() -> str:
    """DuckDB SQL replaying corpus synthesis, feature hashing, every
    quantized gradient step of all K one-vs-rest trainings, and the
    argmax — the same unrolled-CTE device as
    ``train_lr.logreg_oracle_sql``, generalized to K classes."""
    d = NUM_BUCKETS
    feats = _feature_sqls_duckdb()
    fsel = ", ".join(f"{e} AS f{b}" for b, e in enumerate(feats))
    parts = [
        f"corpus AS (SELECT doc_id, {_synth_lang_sql()} AS lang_true, "
        f"{_synth_text_sql('duckdb')} AS text FROM documents)",
        f"base AS (SELECT doc_id, lang_true, {fsel} FROM corpus)",
        "tr AS (SELECT * FROM base WHERE doc_id % 5 <> 0)",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tr)",
    ]
    names = [f"c{j}" for j in range(d)] + ["b"]
    zero = ", ".join(f"0.0 AS {nm}" for nm in names)
    for ci, (code, _) in enumerate(LID_LANGS):
        parts.append(f"w{ci}_0 AS (SELECT {zero})")
        y = f"CASE WHEN tr.lang_true = '{code}' THEN 1.0 ELSE 0.0 END"
        for i in range(ITERS):
            z = "w.b"
            for j in range(d):
                z = f"({z} + (w.c{j} * tr.f{j}))"
            sig = f"(1.0 / (1.0 + exp(-({z}))))"
            xs = [f"tr.f{j}" for j in range(d)] + ["1"]
            gsel = ", ".join(
                f"sum(CAST(round(({sig} - {y}) * {x} * {QUANT}) "
                f"AS BIGINT)) AS g{j}"
                for j, x in enumerate(xs)
            )
            upd = ", ".join(
                f"w.{nm} - {float(LR)!r} * ((g.g{j} / {QUANT}.0) / n.n) "
                f"AS {nm}"
                for j, nm in enumerate(names)
            )
            parts.append(
                f"g{ci}_{i} AS (SELECT {gsel} FROM tr CROSS JOIN w{ci}_{i} w)"
            )
            parts.append(
                f"w{ci}_{i + 1} AS (SELECT {upd} FROM w{ci}_{i} w "
                f"CROSS JOIN g{ci}_{i} g CROSS JOIN n)"
            )
    zs = []
    for ci in range(len(LID_LANGS)):
        z = f"w{ci}.b"
        for j in range(d):
            z = f"({z} + (w{ci}.c{j} * base.f{j}))"
        zs.append(z)
    best = f"greatest({', '.join(zs)})"
    pred = "'und'"
    for ci, (code, _) in reversed(list(enumerate(LID_LANGS))):
        pred = f"CASE WHEN {zs[ci]} = {best} THEN '{code}' ELSE {pred} END"
    joins = " ".join(
        f"CROSS JOIN w{ci}_{ITERS} w{ci}" for ci in range(len(LID_LANGS))
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT base.doc_id, base.lang_true, {pred} AS lang_pred, "
        + "base.doc_id % 5 = 0 AS is_holdout, "
        + f"({pred}) = base.lang_true AS correct "
        + f"FROM base {joins}"
    )
