"""HyperLogLog / Count-Min sketches: estimate accuracy against exact
counts, the mergeability contracts (HLL: elementwise max == sketch of
union; CMS: never underestimates), and partition invariance — the
properties that make the sketches safe to run incrementally over
weekly crawl increments."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.functions.sketches import (
    cms_counters,
    cms_heavy_hitters,
    cms_lookup,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def hosts(spark):
    # 600 distinct hosts, zipf-ish repetition
    rows = []
    for i in range(600):
        reps = 1 + (3 if i % 7 == 0 else 0) + (10 if i % 97 == 0 else 0)
        rows += [(f"host-{i}.example",)] * reps
    return spark.createDataFrame(rows, "host string")


def test_hll_estimate_within_error(spark, hosts):
    b = 10  # m=1024 -> std err ~1.04/32 = 3.25%
    regs = hll_registers(hosts, "host", b=b)
    est = hll_estimate(regs, b=b).collect()[0]["estimate"]
    assert est == pytest.approx(600, rel=0.12)  # ~3.7 sigma


def test_hll_register_values_match_python(spark):
    # Pin the md5 register spec against an independent Python twin.
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    regs = {(r["bucket"], r["rank"]) for r in hll_registers(df, "v", b=4).collect()}
    expect = {}
    for v in ("a", "b", "c"):
        bucket = int(hashlib.md5(v.encode()).hexdigest()[:8], 16) % 16
        w = int(hashlib.md5(f"r:{v}".encode()).hexdigest()[:8], 16)
        rank = 33 - w.bit_length()
        expect[bucket] = max(expect.get(bucket, 0), rank)
    assert regs == set(expect.items())


def test_hll_merge_equals_union(spark, hosts):
    a = hosts.filter(F.substring("host", 6, 1).isin("1", "2", "3"))
    b_df = hosts.subtract(a)
    merged = hll_merge(hll_registers(a, "host", b=8),
                       hll_registers(b_df, "host", b=8))
    direct = hll_registers(hosts, "host", b=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect()))


def test_hll_grouped_and_partition_invariant(spark):
    rows = [("en", f"h{i}") for i in range(300)] + [
        ("fr", f"h{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "lang string, host string")
    out = {
        r["lang"]: r["estimate"]
        for r in hll_estimate(
            hll_registers(df, "host", group_cols=["lang"], b=10),
            group_cols=["lang"], b=10,
        ).collect()
    }
    assert out["en"] == pytest.approx(300, rel=0.15)
    assert out["fr"] == pytest.approx(40, rel=0.2)
    out2 = {
        r["lang"]: r["estimate"]
        for r in hll_estimate(
            hll_registers(df.repartition(13), "host",
                          group_cols=["lang"], b=10),
            group_cols=["lang"], b=10,
        ).collect()
    }
    assert out == out2


def test_cms_never_underestimates_and_tight_when_sparse(spark):
    rows = [("the",)] * 50 + [("of",)] * 20 + [(f"rare{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "tok string")
    counters = cms_counters(df, "tok", depth=4, width=256)
    probes = df.select("tok").distinct()
    est = {r["tok"]: r["estimate"]
           for r in cms_lookup(counters, probes, "tok",
                               depth=4, width=256).collect()}
    true = {"the": 50, "of": 20}
    for t, n in true.items():
        assert est[t] >= n  # one-sided guarantee
        assert est[t] <= n + 30  # eps*N slack at this width is tiny
    # 100 items over 4x256 cells: collisions are rare; most rare
    # tokens should be exact
    exact = sum(1 for i in range(30) if est[f"rare{i}"] == 1)
    assert exact >= 25


def test_cms_heavy_hitters_finds_all_true_hitters(spark):
    rows = (
        [("click",)] * 120 + [("here",)] * 80 + [("buy",)] * 40
        + [(f"tail{i}",) for i in range(160)]
    )
    df = spark.createDataFrame(rows, "tok string")
    hh = cms_heavy_hitters(df, "tok", phi=0.05)  # N=400 -> cutoff 20
    got = [r["tok"] for r in hh.collect()]
    for t in ("click", "here", "buy"):
        assert t in got  # no false negatives, the CMS contract
    assert got[0] == "click"  # sorted by estimate desc


def test_cms_counters_weighted(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "tok string, w long")
    counters = cms_counters(df, "tok", depth=2, width=64, weight_col="w")
    est = {r["tok"]: r["estimate"]
           for r in cms_lookup(counters, df.select("tok").distinct(), "tok",
                               depth=2, width=64).collect()}
    assert est["a"] == 12 and est["b"] >= 1
