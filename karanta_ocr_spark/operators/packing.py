"""Training-sequence packing — the last hop before tokens hit a
trainer: concatenate documents in a deterministic global order and
split the stream into fixed-length sequences (the GPT-style
concat-and-split packing; docs may straddle sequence boundaries, the
standard trade against padding waste).

The core primitive is a GLOBAL prefix sum of per-document token
counts — the textbook antipattern is a single-partition window
(``Window.orderBy(id)`` with no partitionBy shuffles the corpus into
ONE task). This implementation is the scale-safe two-level scan:

1. rows bucket by a range expression on the order key;
2. one tiny aggregation produces per-bucket token sums (B rows);
3. the driver prefix-sums the B bucket totals (broadcast back);
4. a window PARTITIONED BY bucket (bounded partitions) adds the
   intra-bucket running sum.

All sums are int64-exact, so the result is bit-identical to the
naive single-partition formulation (pytest-pinned) and to the DuckDB
oracle's flat window cumsum — while every shuffle partition stays
bounded by the bucket size at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_offsets(
    df: DataFrame,
    value_col: str,
    order_col: str = "doc_id",
    bucket_size: int = 4096,
) -> DataFrame:
    """Append ``global_start`` = sum of *value_col* over all rows with
    a smaller *order_col* (dense global prefix sum, exclusive)."""
    spark = df.sparkSession
    b = df.withColumn(
        "_bucket", F.floor(F.col(order_col) / F.lit(int(bucket_size)))
    )
    totals = (
        b.groupBy("_bucket")
        .agg(F.sum(F.col(value_col).cast("long")).alias("_btot"))
        .orderBy("_bucket")
        .collect()
    )
    rows, acc = [], 0
    for r in totals:
        rows.append((int(r["_bucket"]), acc))
        acc += int(r["_btot"] or 0)
    # Prefix table ships back as a BROADCAST JOIN, not a literal
    # expression: with bucket_size ~ sqrt(N) the table has ~sqrt(N)
    # rows (10^6 at 10^12 docs — collectible and broadcastable),
    # while every window partition below stays bucket_size-bounded.
    pref = spark.createDataFrame(
        rows or [(0, 0)], "_bucket long, _bucket_start long"
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = F.coalesce(
        F.sum(F.col(value_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    return (
        b.join(F.broadcast(pref), on="_bucket")
        .withColumn(
            "global_start", (F.col("_bucket_start") + intra).cast("long")
        )
        .drop("_bucket", "_bucket_start")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str = "doc_id",
    max_tokens: int = 2048,
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns the input plus ``global_start`` (exclusive prefix sum of
    tokens in *order_col* order), ``seq_id`` (the fixed-length
    sequence the doc STARTS in), ``seq_pos`` (offset inside it) and
    ``n_seqs`` (how many sequences the doc spans — >1 when it
    straddles boundaries). Zero-token docs occupy no stream space
    (``n_seqs=0``)."""
    L = int(max_tokens)
    out = global_offsets(df, token_col, order_col, bucket_size)
    tokens = F.col(token_col).cast("long")
    end = F.col("global_start") + tokens  # exclusive
    return (
        out.withColumn("seq_id", F.floor(F.col("global_start") / L).cast("long"))
        .withColumn("seq_pos", (F.col("global_start") % L).cast("long"))
        .withColumn(
            "n_seqs",
            F.when(tokens <= 0, F.lit(0).cast("long")).otherwise(
                (F.floor((end - 1) / L) - F.floor(F.col("global_start") / L) + 1)
                .cast("long")
            ),
        )
    )
