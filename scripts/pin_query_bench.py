"""Taskset-pinned, quiet-window-gated timing of ONE registry query —
the same methodology as bench.py's N-vs-4N scaling samples (pin the
CPU set, wait for co-tenants to quiet, best-of-k), applied to a
single query so a suspected host-noise wobble can be confirmed or
refuted on the record (r3 VERDICT task #5: simhash_dedup 1.95 s →
2.21 s).

Usage:
    python scripts/pin_query_bench.py simhash_dedup [--cores 32]
        [--iters 4] [--sf /root/testdata/sf0.1]

Prints one JSON line: {"query", "cores", "sf", "all_sec", "best_sec",
"external_busy_at_start", "loadavg_at_start"}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def child(query: str, cores: int, iters: int, sf_dir: str) -> None:
    from bench import make_session

    import __spark_entry__ as entrymod

    spark = make_session(cores)
    qs = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        qs[query](spark, warm_dir).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        qs[query](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    print(json.dumps({"all_sec": times}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()

    if args.child:
        child(args.query, args.cores, args.iters, args.sf)
        return

    from bench import wait_for_quiet

    ext_busy = round(wait_for_quiet(args.cores), 3)
    load1 = round(os.getloadavg()[0], 2)
    cmd = [
        "taskset", "-c", f"0-{args.cores - 1}", sys.executable,
        os.path.abspath(__file__), args.query, "--child",
        "--cores", str(args.cores), "--iters", str(args.iters),
        "--sf", args.sf,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    result = None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            result = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    if result is None:
        raise RuntimeError(f"child produced no JSON: {out.stderr[-2000:]}")
    result.update(
        {
            "query": args.query,
            "cores": args.cores,
            "sf": args.sf,
            "best_sec": min(result["all_sec"]),
            "external_busy_at_start": ext_busy,
            "loadavg_at_start": load1,
        }
    )
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
