"""End-to-end tokenized training export (r5, judge task #6) — the
last missing hop between the curated corpus and a trainer's data
loader: merge-aware BPE token ids (``functions/bpe.py``), a seeded
global shuffle, GPT-style concat-and-split packing
(``operators/packing.py``), and fixed-length binary shard files a
loader can mmap.

Reference parity: karanta-ocr stops at markdown/JSONL sinks
(``karanta/utils.py`` writers); the tokenized-shard export is the
downstream training-pipeline mandate this repo adds.

Determinism and the oracle seam
-------------------------------
* **Shuffle rank** is ``md5('shuf:<seed>:' || doc_id)`` — a pure
  column expression both engines compute identically, so the global
  order (``rank_hex`` then ``doc_id`` as the collision tie-break) is
  SQL-replayable.
* **Placement** (``global_start``/``seq_id``/``seq_pos``/
  ``shard_id``) is integer arithmetic over an int64-exact prefix
  sum, bit-identical to DuckDB's flat window cumsum.
* **Token ids** come from a vocab derived purely from the committed
  merge fixture (base chars sorted, then one id per merge, in merge
  order) — no corpus pass, so the mapping is stable across workers,
  rounds, and streaming increments. Symbols outside the vocab (a
  char the merges never saw) map to ``<unk>`` id 0.

Scale posture (the 100-TB story)
--------------------------------
The global prefix sum over the *shuffled* order cannot bucket by
``doc_id`` ranges (the shuffle destroys locality), so buckets come
from the rank's own leading hex digits: ``16^bucket_chars`` buckets,
each holding ~N/16^c docs — md5 is uniform, so no skew by
construction. One tiny aggregation yields per-bucket token totals
(16^c rows, collected and prefix-summed driver-side — 65k rows at
``c=4``), broadcast back, and the intra-bucket running sum runs
under a window PARTITIONED BY bucket: every window partition stays
bounded at any corpus size. This is the same two-level device as
``packing.global_offsets``, re-keyed for hash order.

The shard sink never concentrates the stream: docs explode into
(shard, slice) pieces — a doc touches ``⌈n/(S·L)⌉ + 1`` shards at
most — the pieces hash-partition by ``shard_id``, and each shard
group assembles exactly ``S·L`` int32 tokens (8 MiB at the 2048×1024
defaults) inside ``applyInPandas``. Counts are exact under task
retries via the ``write_wet`` device (count embedded in the file
name, ``os.replace`` per partition, post-action listing).
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from karanta_ocr_spark.functions.bpe import (
    BpeEncoder,
    get_encoder,
    load_merges,
    pretokenize,
)

#: Default packing geometry. Tests/bench shrink these; the defaults
#: are the production shape (2048-token sequences, 1024 seqs/shard =
#: 8 MiB int32 shards).
SEQ_LEN = 2048
SHARD_SEQS = 1024
SHUFFLE_SEED = 42
#: Leading rank-hex digits used as prefix-sum buckets (16^c buckets).
BUCKET_CHARS = 2

UNK_ID = 0


def build_vocab(merges: list[tuple[str, str]] | None = None) -> dict[str, int]:
    """Symbol → id, derived ONLY from the merge list: id 0 = <unk>,
    then the sorted base characters, then one id per merge (the
    concatenated symbol), in merge order — the standard BPE vocab
    construction, with no corpus dependence."""
    merges = load_merges() if merges is None else merges
    vocab: dict[str, int] = {"<unk>": UNK_ID}
    for c in sorted({c for a, b in merges for c in a + b}):
        vocab[c] = len(vocab)
    for a, b in merges:
        s = a + b
        if s not in vocab:
            vocab[s] = len(vocab)
    return vocab


_VOCAB: dict[str, int] | None = None


def get_vocab() -> dict[str, int]:
    """Worker-singleton vocab over the committed merge fixture."""
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = build_vocab()
    return _VOCAB


def encode_ids(text: str, enc: BpeEncoder, vocab: dict[str, int]) -> list[int]:
    """Scalar twin of the ``token_ids`` column (used by tests and the
    shard round-trip check)."""
    import regex  # stdlib `re` lacks \p{L}; `regex` matches Java's
                  # leftmost-first alternation, same as Spark's engine

    from karanta_ocr_spark.functions.text_analysis import BPE_ISH_RE

    out: list[int] = []
    for w in regex.findall(BPE_ISH_RE, text or ""):
        out.extend(vocab.get(s, UNK_ID) for s in enc.encode(w))
    return out


def token_ids(col) -> F.Column:
    """Merge-aware BPE token ids of a text column: JVM pretokenize →
    one Arrow crossing running the cached merge loop + vocab lookup
    (the id-emitting sibling of ``bpe_token_count_merged``)."""
    from pyspark.sql.functions import pandas_udf

    def _ids(pts: pd.Series) -> pd.Series:
        enc = get_encoder()
        vocab = get_vocab()
        def one(arr) -> list[int]:
            if arr is None:  # Arrow hands pretoken lists as ndarrays
                return []
            return [vocab.get(s, UNK_ID) for w in arr for s in enc.encode(w)]

        return pts.apply(one)

    return pandas_udf(_ids, "array<int>")(pretokenize(col))


def shuffle_rank(doc_id_col, seed: int = SHUFFLE_SEED) -> F.Column:
    """Seeded global shuffle rank: md5 of 'shuf:<seed>:<doc_id>'."""
    return F.md5(
        F.concat_ws("", F.lit(f"shuf:{seed}:"), doc_id_col.cast("string"))
    )


def training_placement(
    docs: DataFrame,
    token_count_col: str = "n_tokens",
    seq_len: int = SEQ_LEN,
    shard_seqs: int = SHARD_SEQS,
    seed: int = SHUFFLE_SEED,
    bucket_chars: int = BUCKET_CHARS,
) -> DataFrame:
    """Assign every doc its place in the shuffled packed token stream.

    Input: (doc_id, *token_count_col*). Output adds ``rank_hex``,
    ``global_start`` (exclusive prefix sum of token counts in
    (rank_hex, doc_id) order), ``seq_id``, ``seq_pos`` and
    ``shard_id`` (the sequence / shard the doc STARTS in).

    Two-level scan keyed on the rank's leading hex digits — see the
    module docstring for why this holds at 100 TB.
    """
    spark = docs.sparkSession
    L, S = int(seq_len), int(shard_seqs)
    ranked = docs.withColumn(
        "rank_hex", shuffle_rank(F.col("doc_id"), seed)
    ).withColumn(
        "_bucket",
        F.conv(F.substring("rank_hex", 1, int(bucket_chars)), 16, 10).cast(
            "long"
        ),
    )
    totals = (
        ranked.groupBy("_bucket")
        .agg(F.sum(F.col(token_count_col).cast("long")).alias("_btot"))
        .orderBy("_bucket")
        .collect()
    )
    rows, acc = [], 0
    for r in totals:
        rows.append((int(r["_bucket"]), acc))
        acc += int(r["_btot"] or 0)
    pref = spark.createDataFrame(
        rows or [(0, 0)], "_bucket long, _bucket_start long"
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy("rank_hex", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = F.coalesce(
        F.sum(F.col(token_count_col).cast("long")).over(w),
        F.lit(0).cast("long"),
    )
    out = (
        ranked.join(F.broadcast(pref), on="_bucket")
        .withColumn(
            "global_start", (F.col("_bucket_start") + intra).cast("long")
        )
        .drop("_bucket", "_bucket_start")
    )
    return (
        out.withColumn(
            "seq_id", F.floor(F.col("global_start") / L).cast("long")
        )
        .withColumn("seq_pos", (F.col("global_start") % L).cast("long"))
        .withColumn(
            "shard_id", F.floor(F.col("seq_id") / S).cast("long")
        )
    )


def write_token_shards(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    seq_len: int = SEQ_LEN,
    shard_seqs: int = SHARD_SEQS,
    seed: int = SHUFFLE_SEED,
    bucket_chars: int = BUCKET_CHARS,
) -> int:
    """Tokenize, shuffle, pack, and write fixed-length int32-LE shard
    files (``shard-NNNNN-nK.bin``; every shard but the stream's last
    holds exactly ``seq_len·shard_seqs`` tokens — the last is
    truncated, never padded, so the concatenation of all shards IS
    the packed stream). Returns the exact total token count, exact
    under task retries (count-in-name + ``os.replace`` + post-action
    listing, the ``write_wet`` device)."""
    import glob
    import re

    L, S = int(seq_len), int(shard_seqs)
    span = L * S  # tokens per shard

    os.makedirs(out_dir, exist_ok=True)
    # Post-action listing is only exact when every shard file in the
    # directory belongs to THIS run.
    for stale in glob.glob(os.path.join(out_dir, "shard-*.bin")):
        os.remove(stale)
    for stale in glob.glob(os.path.join(out_dir, ".shard-*.tmp")):
        os.remove(stale)

    # Persist the tokenized frame: the BPE Arrow UDF is the export's
    # dominant cost and TWO jobs consume it — training_placement's
    # eager bucket-totals collect, then the shard-write job itself.
    with_ids = docs.select(
        "doc_id", token_ids(F.col(text_col)).alias("ids")
    ).withColumn("n_tokens", F.size("ids").cast("long")).persist()
    placed = training_placement(
        with_ids, "n_tokens", L, S, seed, bucket_chars
    ).filter(F.col("n_tokens") > 0)

    # Explode each doc into its per-shard slices. A doc occupying
    # stream positions [g, g+n) touches shards floor(g/span) ..
    # floor((g+n-1)/span) — sequence() is tiny (a doc rarely spans
    # >2 shards at production spans of 2M tokens).
    g = F.col("global_start")
    n = F.col("n_tokens")
    pieces = (
        placed.withColumn(
            "piece_shard",
            F.explode(
                F.sequence(
                    F.floor(g / span).cast("long"),
                    F.floor((g + n - 1) / span).cast("long"),
                )
            ),
        )
        .withColumn("_lo", F.greatest(g, F.col("piece_shard") * span))
        .withColumn("_hi", F.least(g + n, (F.col("piece_shard") + 1) * span))
        .select(
            F.col("piece_shard").alias("shard_id"),
            (F.col("_lo") - F.col("piece_shard") * span).alias("start_in_shard"),
            # slice() is 1-indexed
            F.slice(
                F.col("ids"),
                (F.col("_lo") - g + 1).cast("int"),
                (F.col("_hi") - F.col("_lo")).cast("int"),
            ).alias("ids"),
        )
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        sid = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values("start_in_shard")
        flat = np.concatenate(
            [np.asarray(x, dtype="<i4") for x in pdf["ids"]]
        )
        name = f"shard-{sid:05d}-n{len(flat)}.bin"
        # Attempt-unique tmp name: under speculative execution or a
        # concurrent retry, two attempts of this shard must never
        # write the same tmp path (os.replace of a file another
        # attempt is still writing tears the shard). uuid4 + pid makes
        # each attempt's staging file private; the final os.replace
        # stays atomic, last completed attempt wins.
        tmp = os.path.join(
            out_dir,
            f".shard-{sid:05d}-{os.getpid()}-{uuid.uuid4().hex[:8]}.tmp",
        )
        with open(tmp, "wb") as f:
            f.write(flat.tobytes())
        # A retry of this shard's task replaces the prior attempt's
        # file (removing any prior-count name first) — last write
        # wins, the listing never double-counts.
        for prior in glob.glob(
            os.path.join(out_dir, f"shard-{sid:05d}-n*.bin")
        ):
            os.remove(prior)
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame({"shard_id": [sid], "n_tokens": [len(flat)]})

    (
        pieces.groupBy("shard_id")  # the groupBy IS the shuffle — no
        # explicit repartition in front of it (that would be a second)
        .applyInPandas(assemble, "shard_id long, n_tokens long")
        .count()  # the action; per-shard counts come from the listing
    )
    with_ids.unpersist()

    total = 0
    # \d{5,}: %05d widens past 99,999 shards (~200B tokens at the
    # production span), so the count pattern must not assume 5 digits.
    pat = re.compile(r"shard-\d{5,}-n(\d+)\.bin$")
    for p in glob.glob(os.path.join(out_dir, "shard-*-n*.bin")):
        m = pat.search(os.path.basename(p))
        if m:
            total += int(m.group(1))
    return total


def read_token_shards(out_dir: str) -> list[int]:
    """Concatenate all shards back into the packed stream (test/
    loader helper — production loaders mmap shards directly)."""
    import glob
    import numpy as np

    def sid(path: str) -> int:
        # numeric shard order: lexicographic sorting misorders once
        # %05d widens to 6 digits (shard-100000 < shard-99999 as text)
        return int(os.path.basename(path).split("-")[1])

    stream: list[int] = []
    for p in sorted(glob.glob(os.path.join(out_dir, "shard-*-n*.bin")), key=sid):
        stream.extend(np.fromfile(p, dtype="<i4").tolist())
    return stream
