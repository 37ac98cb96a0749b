"""Custom stateful streaming operator (``applyInPandasWithState``).

The batch pipeline quarantines permanently-failing urls by counting
failure rows across runs (``resume.filter_known_failures``); on a
continuous crawl the same signal is better kept as ONLINE per-domain
state: how many documents a domain has produced, how many failed, and
the current consecutive-failure streak — a streak ≥ threshold means
the fetcher/extractor is systematically broken for that domain
(robots change, WAF, template shift) and the domain should be
quarantined *now*, not at the next batch boundary.

This is exactly the shape Spark's arbitrary-stateful API exists for:
``groupBy(domain).applyInPandasWithState`` holds one tiny state row
per domain, each micro-batch folds its rows in Arrow batches, and a
processing-time timeout evicts domains that stopped appearing (so at
web scale the state store holds only currently-active domains, not
every domain ever crawled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATS_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("docs", LongType()),
        StructField("failed", LongType()),
        StructField("fail_streak", IntegerType()),
        StructField("quarantined", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("docs", LongType()),
        StructField("failed", LongType()),
        StructField("fail_streak", IntegerType()),
    ]
)


def running_domain_health(
    docs: DataFrame,
    streak_threshold: int = 3,
    idle_timeout_ms: int = 30 * 60 * 1000,
    url_col: str = "url",
    ok_col: str = "ok",
) -> DataFrame:
    """Per-domain running extraction health over a STREAMING frame.

    Emits one row per domain per micro-batch in which the domain
    appeared: cumulative ``docs``/``failed``, the current consecutive-
    failure ``fail_streak`` (order within a batch follows url sort for
    determinism), and ``quarantined`` once the streak reaches
    *streak_threshold*. Domains idle longer than *idle_timeout_ms* are
    evicted from the state store (bounded state at crawl scale).
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            docs_n, failed_n, streak = state.get
        else:
            docs_n, failed_n, streak = 0, 0, 0
        for pdf in pdfs:
            # Deterministic fold order regardless of Arrow batch layout.
            pdf = pdf.sort_values(url_col)
            oks = pdf[ok_col].tolist()
            docs_n += len(oks)
            failed_n += sum(0 if b else 1 for b in oks)
            for b in oks:
                streak = 0 if b else streak + 1
        state.update((docs_n, failed_n, streak))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "domain": [key[0]],
                "docs": [docs_n],
                "failed": [failed_n],
                "fail_streak": [streak],
                "quarantined": [streak >= streak_threshold],
            }
        )

    with_domain = docs.withColumn(
        "_domain",
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1),
    )
    return with_domain.groupBy("_domain").applyInPandasWithState(
        update,
        outputStructType=STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


_EVENT_STATE_SCHEMA = StructType(
    [
        StructField("docs", LongType()),
        StructField("failed", LongType()),
        StructField("fail_streak", IntegerType()),
        StructField("last_event_ms", LongType()),
    ]
)


def running_domain_health_event_time(
    docs: DataFrame,
    streak_threshold: int = 3,
    watermark_delay: str = "10 minutes",
    idle_ttl_ms: int = 30 * 60 * 1000,
    ts_col: str = "ts",
    url_col: str = "url",
    ok_col: str = "ok",
) -> DataFrame:
    """Event-time variant of :func:`running_domain_health`: rows carry
    an event timestamp, the stream declares a watermark of
    *watermark_delay*, and rows older than the current watermark are
    DROPPED before the state fold — so a replayed or delayed crawl
    shard cannot retroactively flip a domain's streak. Unlike
    aggregations, ``applyInPandasWithState`` does NOT filter late
    input automatically (Spark hands the watermark to the function
    and leaves the policy to it), so the fold filters on
    ``state.getCurrentWatermarkMs()`` explicitly — deterministic
    given the watermark, which itself advances deterministically per
    committed micro-batch. Within a batch the fold orders by (event
    time, url), making the streak deterministic under out-of-order
    arrival WITHIN the allowed lateness.

    Eviction is event-time too: a domain times out *idle_ttl_ms* of
    EVENT time after its newest row (clamped above the current
    watermark, which Spark requires), so state size tracks the
    watermark frontier rather than wall-clock processing pace —
    replaying a day of history does not mass-evict live domains the
    way a processing-time timeout would."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            docs_n, failed_n, streak, last_ms = state.get
        else:
            docs_n, failed_n, streak, last_ms = 0, 0, 0, 0
        wm_ms = state.getCurrentWatermarkMs()
        # CONCATENATE the Arrow chunks before the one batch-wide sort:
        # a hot domain's rows can span several chunks with interleaved
        # timestamps, and sorting each chunk independently would fold
        # the streak in chunk order, not (event time, url) order —
        # breaking the determinism guarantee below.
        kept = []
        for pdf in pdfs:
            if len(pdf) and wm_ms > 0:
                ev_ms = (
                    pdf[ts_col].values.astype("datetime64[ns]").astype("int64")
                    // 1_000_000
                )
                pdf = pdf[ev_ms >= wm_ms]  # late beyond watermark: drop
            if len(pdf):
                kept.append(pdf)
        if not kept and not state.exists:
            # Every row was late and there is no prior state: emitting
            # would CREATE state for a group that contributed nothing.
            return
        if kept:
            batch = pd.concat(kept).sort_values([ts_col, url_col])
            oks = batch[ok_col].tolist()
            docs_n += len(oks)
            failed_n += sum(0 if b else 1 for b in oks)
            for b in oks:
                streak = 0 if b else streak + 1
            # pandas .value is ns-since-epoch (UTC) for both naive and
            # tz-aware timestamps — no local-zone round trip.
            last_ms = max(last_ms, int(batch[ts_col].max().value // 1_000_000))
        state.update((docs_n, failed_n, streak, last_ms))
        state.setTimeoutTimestamp(
            max(last_ms + idle_ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                "domain": [key[0]],
                "docs": [docs_n],
                "failed": [failed_n],
                "fail_streak": [streak],
                "quarantined": [streak >= streak_threshold],
            }
        )

    with_domain = docs.withWatermark(ts_col, watermark_delay).withColumn(
        "_domain",
        F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1),
    )
    return with_domain.groupBy("_domain").applyInPandasWithState(
        update,
        outputStructType=STATS_SCHEMA,
        stateStructType=_EVENT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
