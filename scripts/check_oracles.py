"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at sf0.01, compare row count + sorted-column value content
(order-insensitive). Exit non-zero on any mismatch."""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

_args = [a for a in sys.argv[1:] if not a.startswith("--only")]
ONLY = None
for _a in sys.argv[1:]:
    if _a.startswith("--only="):
        ONLY = set(_a.split("=", 1)[1].split(","))
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        except Exception:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if ONLY is not None and name not in ONLY:
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        dt = time.time() - t0
        # drop intra-query persisted frames before the next query
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(srows):7d} rows   ({dt:.1f}s)")
            continue
        orows = con.execute(oracles[name]).fetchall()
        ocols = [d[0] for d in con.description]
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWCOUNT spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            status.append(f"COLS spark={sorted(scols)} duck={sorted(ocols)}")
        if not status:
            a = canon([tuple(r) for r in srows], scols)
            b = canon(orows, ocols)
            if a != b:
                n_bad = sum(x != y for x, y in zip(a, b))
                status.append(f"VALUES {n_bad}/{len(a)} rows differ")
                for x, y in list(zip(a, b))[:200]:
                    if x != y:
                        print(f"      spark: {x[:160]}")
                        print(f"      duck : {y[:160]}")
                        break
        if status:
            failed.append(name)
            print(f"  {name:24s} FAIL  {'; '.join(status)}   ({dt:.1f}s)")
        else:
            print(f"  {name:24s} OK    {len(srows):7d} rows   ({dt:.1f}s)")

    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries pass"
          f" ({len(oracles)} oracle-checked)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
