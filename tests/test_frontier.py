"""Crawl-frontier politeness scheduler invariants."""

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.frontier import schedule_frontier


def _frontier(spark, n_per_host=5, hosts=("a", "b", "c")):
    rows = [
        (f"https://{h}.example.org/p/{i}", i % 3)
        for h in hosts
        for i in range(n_per_host)
    ]
    return spark.createDataFrame(rows, "url string, priority int")


def test_politeness_cap_and_wave(spark):
    out = schedule_frontier(
        _frontier(spark), priority_col="priority", per_host=2
    ).collect()
    per_round_host = {}
    for r in out:
        per_round_host.setdefault((r["fetch_round"], r["host"]), 0)
        per_round_host[(r["fetch_round"], r["host"])] += 1
        assert 1 <= r["wave"] <= 2
    assert max(per_round_host.values()) <= 2  # politeness invariant
    # 5 URLs/host at per_host=2 → 3 rounds, last round has 1/host.
    assert max(r["fetch_round"] for r in out) == 3


def test_priority_orders_within_host(spark):
    out = schedule_frontier(
        _frontier(spark, hosts=("a",)), priority_col="priority", per_host=1
    ).collect()
    by_round = sorted(out, key=lambda r: r["fetch_round"])
    prios = [r["priority"] for r in by_round]
    assert prios == sorted(prios, reverse=True)


def test_slot_interleaves_hosts(spark):
    out = schedule_frontier(
        _frontier(spark, n_per_host=2), per_host=2
    ).collect()
    r1 = sorted(
        (r for r in out if r["fetch_round"] == 1), key=lambda r: r["slot"]
    )
    # Slots are dense 1..K and wave-1 fetches of ALL hosts precede
    # any wave-2 fetch.
    assert [r["slot"] for r in r1] == list(range(1, len(r1) + 1))
    waves = [r["wave"] for r in r1]
    assert waves == sorted(waves)
    first_wave_hosts = [r["host"] for r in r1 if r["wave"] == 1]
    assert len(set(first_wave_hosts)) == 3


def test_max_rounds_truncates_and_scale_mode(spark):
    out = schedule_frontier(
        _frontier(spark), per_host=1, max_rounds=2, dense_slot=False
    )
    rows = out.collect()
    assert max(r["fetch_round"] for r in rows) == 2
    assert len(rows) == 6  # 2 rounds x 3 hosts x 1
    assert "slot" not in out.columns  # scale mode: no per-round window


def test_partition_invariance(spark):
    f = _frontier(spark)
    a = {(r["url"], r["fetch_round"], r["slot"])
         for r in schedule_frontier(f, priority_col="priority").collect()}
    b = {(r["url"], r["fetch_round"], r["slot"])
         for r in schedule_frontier(
             f.repartition(13), priority_col="priority").collect()}
    assert a == b


def test_per_host_validation(spark):
    with pytest.raises(ValueError):
        schedule_frontier(_frontier(spark), per_host=0)
