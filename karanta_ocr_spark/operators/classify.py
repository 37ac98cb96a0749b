"""Model-scoring operator — the Spark-native analog of the
reference's process-singleton image classifier
(``reference/karanta/inference/image_classifier.py:8-54``: a
module-level ``transformers.pipeline(...)`` loaded ONCE per process,
then per-image batch predict returning ``{'label': 'segment' |
'no_segment', 'score': float}``).

Spark's public seam for exactly that pattern is
``pyspark.ml.functions.predict_batch_udf``: ``make_predict_fn`` runs
once per Python worker process (the model object is cached across
Arrow batches and across tasks scheduled on that worker), and the
predict function receives whole numpy batches — the same
load-once / score-batched shape as the reference, distributed.

Torch/transformers are not in this container, so the model is a
deterministic logistic regression whose weights derive from
``md5("seed:w:d")`` — the same engine-neutral construction the LSH
plane matrix uses (``operators/similarity.py``) — which keeps the
operator's output verifiable end-to-end by the DuckDB oracle
(``oracle_sql()['classifier_scores']`` replays weights → dot product
→ sigmoid → label) while exercising the REAL ``predict_batch_udf``
machinery. A production model (HF pipeline, ONNX session, …) swaps
into :func:`load_model` behind the identical seam.

Bit-reproducibility: the score accumulates ``b + x0*w0 + x1*w1 + …``
LEFT-TO-RIGHT in float64 (one fused vector op per term, not a
``dot``), matching SQL's left-associative ``+`` exactly, so the
pre-round score is bit-identical to the oracle's; ``exp`` may differ
by ~1 ulp between libms, absorbed by the round-to-6dp both sides
emit. The label threshold ``score >= 0.5`` is exactly ``z >= 0``
(sigmoid is exact at 0), so labels cannot disagree across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType

#: Reference classifier labels (image_classifier.py:46-54).
POSITIVE_LABEL = "segment"
NEGATIVE_LABEL = "no_segment"

#: Process-wide model cache — the predict_batch_udf contract already
#: caches per-worker, this guards direct load_model() callers too and
#: lets tests assert the load-once behavior.
_MODEL_CACHE: dict = {}
_LOAD_COUNTS: dict = {}


def md5_logistic_weights(n_features: int, seed: int = 42):
    """(weights[n_features], bias) — each coefficient is
    ``(u - 2^31) / 2^31`` with ``u`` the first 8 md5 hex chars of
    ``"seed:w:d"`` (bias: ``"seed:b"``) as an int. Every step exact in
    float64, so any engine with an MD5 builtin reproduces the model
    bit-for-bit."""
    import hashlib

    import numpy as np

    def coeff(key: str) -> float:
        u = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        return (u - 2**31) / 2**31

    w = np.asarray(
        [coeff(f"{seed}:w:{d}") for d in range(n_features)], dtype="float64"
    )
    return w, coeff(f"{seed}:b")


class _LogisticModel:
    """Deterministic stand-in for the reference's HF pipeline object:
    holds weights, scores float64 batches. ``predict`` returns the
    sigmoid score of the positive class."""

    def __init__(self, n_features: int, seed: int):
        self.w, self.b = md5_logistic_weights(n_features, seed)

    def predict(self, X):
        import numpy as np

        # Left-to-right accumulation — see module docstring.
        z = np.full(X.shape[0], self.b, dtype="float64")
        for d in range(self.w.shape[0]):
            z = z + X[:, d] * self.w[d]
        with np.errstate(over="ignore"):
            return 1.0 / (1.0 + np.exp(-z))


def load_model(n_features: int, seed: int = 42) -> _LogisticModel:
    """Process-singleton model load (the reference's module-level
    ``_classifier_pipeline``): repeated calls return the SAME object;
    ``_LOAD_COUNTS`` records how many real loads happened."""
    key = (n_features, seed)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = _LogisticModel(n_features, seed)
        _LOAD_COUNTS[key] = _LOAD_COUNTS.get(key, 0) + 1
    return _MODEL_CACHE[key]


def classify_features(
    df: DataFrame,
    feature_cols: list[str],
    seed: int = 42,
    threshold: float = 0.5,
    score_col: str = "score",
    label_col: str = "label",
    batch_size: int = 1024,
) -> DataFrame:
    """Append ``score`` (positive-class probability) and ``label``
    (``segment``/``no_segment``, reference labels) columns scored by
    the worker-singleton model over *feature_cols*.

    The scoring path is ``predict_batch_udf`` — model loaded once per
    Python worker, features shipped as Arrow-batched numpy arrays —
    i.e. the distributed version of the reference's
    ``predict_layout`` (image_classifier.py:43-54). Scale shape: a
    pure map operator, zero shuffle; batch_size bounds worker memory
    independent of partition size."""
    from pyspark.ml.functions import predict_batch_udf

    n_features = len(feature_cols)

    def make_predict_fn():
        import numpy as np

        model = load_model(n_features, seed)

        def predict(X):
            return model.predict(np.asarray(X, dtype="float64"))

        return predict

    # Tensor-input form: the features ship as ONE array column and the
    # predict fn receives a (batch × n_features) ndarray — the same
    # batch shape the reference's pipeline(images, batch_size=...) sees.
    score_udf = predict_batch_udf(
        make_predict_fn,
        return_type=DoubleType(),
        batch_size=batch_size,
        input_tensor_shapes=[[n_features]],
    )
    scored = df.withColumn(
        score_col,
        score_udf(F.array(*[F.col(c).cast("double") for c in feature_cols])),
    )
    return scored.withColumn(
        label_col,
        F.when(F.col(score_col) >= threshold, F.lit(POSITIVE_LABEL)).otherwise(
            F.lit(NEGATIVE_LABEL)
        ),
    )


def image_stats_features(
    df: DataFrame,
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Per-image feature columns from decoded grayscale pixel bytes
    (the output of ``multimodal.decode_images`` → ``grayscale_images``):
    normalized mean / std / aspect ratio / horizontal-gradient energy.
    One numpy pass per Arrow batch, no shuffle — the feature-extract
    stage in front of :func:`classify_features`, mirroring how the
    reference feeds decoded PIL images into its classifier."""
    import numpy as np

    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [f for f in df.schema.fields]
        + [
            StructField("f_mean", DoubleType()),
            StructField("f_std", DoubleType()),
            StructField("f_aspect", DoubleType()),
            StructField("f_edge", DoubleType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            means, stds, aspects, edges = [], [], [], []
            for px, w, h in zip(pdf[pixels_col], pdf[width_col], pdf[height_col]):
                if px is None or not w or not h or len(px) != w * h:
                    means.append(None); stds.append(None)
                    aspects.append(None); edges.append(None)
                    continue
                a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w)
                f = a.astype("float64") / 255.0
                means.append(float(f.mean()))
                stds.append(float(f.std()))
                aspects.append(float(w) / float(h))
                edges.append(
                    float(np.abs(np.diff(f, axis=1)).mean()) if w > 1 else 0.0
                )
            pdf = pdf.copy()
            pdf["f_mean"] = pd.array(means, dtype="float64")
            pdf["f_std"] = pd.array(stds, dtype="float64")
            pdf["f_aspect"] = pd.array(aspects, dtype="float64")
            pdf["f_edge"] = pd.array(edges, dtype="float64")
            yield pdf

    return df.mapInPandas(run, schema=schema)


def classify_images(
    decoded: DataFrame, seed: int = 42, threshold: float = 0.5
) -> DataFrame:
    """The full reference-shaped image-classification operator:
    decoded pixels → stats features → worker-singleton batch scoring.
    Returns the input rows plus ``score`` and ``label``."""
    feats = image_stats_features(decoded)
    return classify_features(
        feats, ["f_mean", "f_std", "f_aspect", "f_edge"], seed, threshold
    )


def calibration_report(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label_true",
    bins: int = 10,
) -> DataFrame:
    """Reliability table for a probabilistic quality classifier —
    the check a curation pipeline runs before TRUSTING a model score
    as a keep/drop probability (Guo et al. 2017's reliability-diagram
    table, as data): per score bin, ``(bin, n, mean_score,
    frac_positive, gap)`` plus the corpus expected calibration error
    (ECE = Σ n_b/N · |gap_b|) repeated per row for one-pass reads.

    One groupBy over ≤ *bins* groups; the ECE fold is a broadcast of
    the ≤ bins-row aggregate — map-side everything, the usual shape.
    Scores exactly 1.0 land in the top bin (least(floor(s·B), B−1)).
    """
    if bins < 1:
        raise ValueError("bins >= 1 required")
    b = F.least(
        F.floor(F.col(score_col) * bins).cast("int"), F.lit(bins - 1)
    )
    per = (
        scored.filter(F.col(score_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(F.col(score_col)).alias("_ms"),
            F.avg(F.col(label_col).cast("double")).alias("_fp"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("_n_total"),
        F.sum(F.abs(F.col("_ms") - F.col("_fp")) * F.col("n")).alias("_werr"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            F.round(F.col("_ms"), 6).alias("mean_score"),
            F.round(F.col("_fp"), 6).alias("frac_positive"),
            F.round(F.col("_ms") - F.col("_fp"), 6).alias("gap"),
            F.round(F.col("_werr") / F.col("_n_total"), 6).alias("ece"),
        )
        .orderBy("bin")
    )
