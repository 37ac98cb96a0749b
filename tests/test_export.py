"""Tokenized training export: shard round-trip, fixed-length
invariant, scalar/Spark tokenizer parity, and placement
partition-invariance (r5, judge task #6)."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.functions.bpe import get_encoder
from karanta_ocr_spark.operators.export import (
    build_vocab,
    encode_ids,
    get_vocab,
    read_token_shards,
    token_ids,
    training_placement,
    write_token_shards,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "customer order value data query join table scan",
    "le château était déjà fermé, la fenêtre donnait sur la forêt",
    "ọmọ mi fẹ́ràn oúnjẹ aládùn àti ẹja ṣíṣè",
    "short",
    "",  # zero tokens: must occupy no stream space
    "numbers 123 456 and punctuation!?; mixed-case Words Here",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
]


def _rank(doc_id: int, seed: int = 42) -> str:
    return hashlib.md5(f"shuf:{seed}:{doc_id}".encode()).hexdigest()


def test_token_ids_column_matches_scalar_twin(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["ids"]
        for r in df.select("doc_id", token_ids(F.col("text")).alias("ids")).collect()
    }
    enc, vocab = get_encoder(), get_vocab()
    for i, t in enumerate(TEXTS):
        assert got[i] == encode_ids(t, enc, vocab), t


def test_vocab_is_merge_derived_and_stable():
    v1, v2 = build_vocab(), build_vocab()
    assert v1 == v2
    assert v1["<unk>"] == 0
    # every merged symbol present, ids contiguous
    assert sorted(v1.values()) == list(range(len(v1)))


def test_shard_roundtrip_equals_packed_stream(spark, tmp_path):
    """Concat of shards == the packed stream (seeded-shuffle order),
    and every shard but the last is exactly seq_len*shard_seqs
    tokens — the fixed-length contract a loader mmaps against."""
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    # stale files from a "previous run" must not pollute the count
    os.makedirs(out)
    with open(os.path.join(out, "shard-00099-n777.bin"), "wb") as f:
        f.write(b"stale")
    L, S = 8, 4  # span = 32 tokens/shard -> several shards
    total = write_token_shards(docs, out, seq_len=L, shard_seqs=S)

    enc, vocab = get_encoder(), get_vocab()
    by_doc = {i: encode_ids(t, enc, vocab) for i, t in enumerate(TEXTS)}
    order = sorted(by_doc, key=lambda i: (_rank(i), i))
    expected = [tok for i in order for tok in by_doc[i]]

    assert total == len(expected) > 0
    got = read_token_shards(out)
    assert got == expected

    sizes = [
        int(os.path.basename(p).split("-n")[1].split(".")[0])
        for p in sorted(glob.glob(os.path.join(out, "shard-*-n*.bin")))
    ]
    assert all(s == L * S for s in sizes[:-1])
    assert 0 < sizes[-1] <= L * S
    assert sum(sizes) == total


def test_placement_partition_invariant(spark):
    """global_start (and everything derived from it) must be
    bit-identical under any input partitioning — the property the
    DuckDB flat-cumsum oracle relies on."""
    base = (
        spark.range(0, 300)
        .withColumnRenamed("id", "doc_id")
        .withColumn("n_tokens", (F.col("doc_id") * 7 % 13 + 1).cast("long"))
    )
    cols = ("doc_id", "global_start", "seq_id", "seq_pos", "shard_id")

    def run(df):
        placed = training_placement(df, "n_tokens", seq_len=16, shard_seqs=4)
        return sorted(tuple(r[c] for c in cols) for r in placed.collect())

    assert run(base.repartition(1)) == run(base.repartition(13))


def test_zero_token_docs_occupy_no_stream_space(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, ""), (2, None), (3, "again")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "z")
    total = write_token_shards(docs, out, seq_len=4, shard_seqs=2)
    enc, vocab = get_encoder(), get_vocab()
    expected_n = len(encode_ids("hello world", enc, vocab)) + len(
        encode_ids("again", enc, vocab)
    )
    assert total == expected_n
    assert len(read_token_shards(out)) == expected_n


def test_read_token_shards_numeric_order_and_wide_ids(tmp_path):
    # %05d widens past 99,999 shards: the reader must order shards
    # numerically (lexicographic puts shard-100000 before shard-99999)
    # and the count pattern must accept >5-digit ids.
    import numpy as np
    import re

    from karanta_ocr_spark.operators.export import read_token_shards

    d = str(tmp_path)
    np.asarray([1, 2], dtype="<i4").tofile(f"{d}/shard-99999-n2.bin")
    np.asarray([3, 4], dtype="<i4").tofile(f"{d}/shard-100000-n2.bin")
    assert read_token_shards(d) == [1, 2, 3, 4]
    pat = re.compile(r"shard-\d{5,}-n(\d+)\.bin$")
    assert pat.search("shard-100000-n2.bin")
