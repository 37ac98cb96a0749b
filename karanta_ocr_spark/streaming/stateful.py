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
