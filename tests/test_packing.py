"""Sequence packing / scale-safe global prefix sums."""

from pyspark.sql import Window, functions as F

from karanta_ocr_spark.operators.packing import global_offsets, pack_sequences


def test_two_level_scan_matches_naive_window(spark):
    rows = [(i * 3 + (i % 5), (i * 7) % 40 + 1) for i in range(200)]  # sparse ids
    df = spark.createDataFrame(rows, "doc_id long, n long")
    scaled = {
        r["doc_id"]: r["global_start"]
        for r in global_offsets(df, "n", bucket_size=16).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r["doc_id"]: r["g"]
        for r in df.withColumn(
            "g", F.coalesce(F.sum("n").over(w), F.lit(0))
        ).collect()
    }
    assert scaled == naive  # int-exact, any bucketing


def test_partition_invariance(spark):
    rows = [(i, (i % 9) + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    a = {(r["doc_id"], r["global_start"])
         for r in global_offsets(df, "n", bucket_size=7).collect()}
    b = {(r["doc_id"], r["global_start"])
         for r in global_offsets(df.repartition(13), "n", bucket_size=7).collect()}
    assert a == b


def test_pack_sequences_arithmetic(spark):
    # L=10; docs of 4,9,3,12,0 tokens at ids 0..4:
    # starts 0,4,13,16,28; doc1 straddles seq0/seq1, doc3 spans 16..27
    # (seq1..seq2), the 0-token doc occupies nothing.
    rows = [(0, 4), (1, 9), (2, 3), (3, 12), (4, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {r["doc_id"]: (r["global_start"], r["seq_id"], r["seq_pos"], r["n_seqs"])
           for r in pack_sequences(df, "n", max_tokens=10, bucket_size=2).collect()}
    assert got == {
        0: (0, 0, 0, 1),
        1: (4, 0, 4, 2),   # tokens 4..12 -> seqs 0 and 1
        2: (13, 1, 3, 1),
        3: (16, 1, 6, 2),  # tokens 16..27 -> seqs 1 and 2
        4: (28, 2, 8, 0),  # zero tokens -> spans nothing
    }
