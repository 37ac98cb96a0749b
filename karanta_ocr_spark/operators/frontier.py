"""Crawl-frontier scheduling: politeness-bounded fetch rounds.

A Common-Crawl-style fetcher cannot just fan a frontier out to 1000
executors — politeness (RFC 9309 §2.5 crawl-delay culture) caps how
many fetches may hit ONE host per scheduling round. The scheduler
turns an unordered frontier into deterministic round/wave
assignments such that:

- no host appears more than ``per_host`` times in any round
  (politeness invariant, pytest-pinned);
- within a host, higher-priority URLs go first (priority desc, then
  URL asc for determinism);
- rounds interleave hosts by WAVE (every host's first fetch is wave
  1, second fetch wave 2, …): executors that drain a round in
  (wave, host) order naturally spread requests across hosts instead
  of hammering one.

Spark shape: ONE ``row_number`` window partitioned by host (the
politeness rank); ``fetch_round`` and ``wave`` are arithmetic on that
rank — fully JVM, no joins, no driver state, and replayable in any
SQL engine.

Scale notes (10¹²-URL frontier): the host window's partition is one
host's pending URLs — the same key the fetcher must serialize on
anyway, so it is not an artificial bottleneck, and ``max_rounds``
truncates a mega-host's tail in the same pass. The optional
``dense_slot`` mode adds a 1..K numbering WITHIN each round
(ordered wave, host, url) via a per-round window — the
oracle-checked spec at test scale, but that window's partition is
the whole round (≤ per_host × n_hosts rows), so at full-crawl scale
you run ``dense_slot=False`` and dispatch on the (wave, host) sort
key directly — the same exact-spec/scale-path seam as
``profile.length_percentiles``.

Reference parity: karanta-ocr's task queue (SQLite ledger,
``karanta/pipeline.py`` worker pool) serializes per-document work;
host-level politeness is the web-crawl analog of that ledger,
re-expressed as window ranks (brief: training-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from karanta_ocr_spark.operators.webgraph import host_expr


def schedule_frontier(
    frontier: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    per_host: int = 2,
    max_rounds: int | None = None,
    dense_slot: bool = True,
) -> DataFrame:
    """Assign ``(host, fetch_round, wave[, slot])`` per frontier URL.

    ``fetch_round`` is 1-based: URL k (1-based politeness rank within
    its host, ordered priority desc, url asc) lands in round
    ``ceil(k / per_host)``; ``wave = k - (round-1)*per_host`` is its
    1..per_host sequence within the round. With ``dense_slot`` the
    round's rows are additionally numbered 1..K in (wave, host, url)
    order — the deterministic dispatch order (see module docstring
    for the scale trade-off).
    """
    if per_host < 1:
        raise ValueError("per_host must be >= 1")
    pr = F.col(priority_col).desc() if priority_col else F.lit(0).asc()
    host_w = Window.partitionBy("host").orderBy(pr, F.col(url_col).asc())
    ranked = frontier.withColumn(
        "host", host_expr(F.col(url_col))
    ).withColumn("_hrank", F.row_number().over(host_w))
    rounds = ranked.withColumn(
        "fetch_round",
        F.ceil(F.col("_hrank") / F.lit(float(per_host))).cast("long"),
    ).withColumn(
        "wave",
        (F.col("_hrank") - (F.col("fetch_round") - 1) * per_host).cast(
            "long"
        ),
    )
    if max_rounds is not None:
        rounds = rounds.filter(F.col("fetch_round") <= max_rounds)
    if dense_slot:
        slot_w = Window.partitionBy("fetch_round").orderBy(
            F.col("wave").asc(), F.col("host").asc(), F.col(url_col).asc()
        )
        rounds = rounds.withColumn(
            "slot", F.row_number().over(slot_w).cast("long")
        )
    return rounds.drop("_hrank")
