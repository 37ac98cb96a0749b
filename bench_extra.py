"""Extra measurement harness for optimization work (guide §1).

NOT part of the frozen driver contract — ``bench.py`` stays the
measured artifact. This tool exists so each query can be isolated,
timed against the noop sink, and its ``explain("formatted")`` plan
captured to ``plans/r06/``.

Usage:
    python bench_extra.py time  <query> [<query> ...] [--iters 3]
    python bench_extra.py explain <query> [...] --suffix before
    python bench_extra.py all-plans --suffix before

``time`` prints one JSON line per query: all iteration times plus the
best.  ``explain`` writes ``plans/r06/<query>_<suffix>.txt``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "explain", "all-plans"])
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r06"))
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from bench import make_session, warmup

    import __spark_entry__ as entrymod

    spark = make_session(args.cores)
    qs = entrymod.queries()
    names = args.queries
    if args.mode == "all-plans":
        names = list(qs.keys())
    os.makedirs(args.out, exist_ok=True)

    if args.mode in ("explain", "all-plans"):
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
                  f"{plan.count('BatchEvalPython')} BatchEvalPython)",
                  file=sys.stderr)
        spark.stop()
        return

    warmup(spark)
    for name in names:
        if os.path.isdir(WARM_DIR):
            try:
                qs[name](spark, WARM_DIR).write.format("noop").mode(
                    "overwrite").save()
            except Exception:
                pass
        spark.catalog.clearCache()
        times = []
        for _ in range(args.iters):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(json.dumps({"query": name, "all_sec": times,
                          "best_sec": min(times)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
