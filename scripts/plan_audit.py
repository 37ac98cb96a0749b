"""Physical-plan audit over the whole query registry.

For every ``queries()`` entry, build the DataFrame at sf0.001 and
inspect its EXECUTED-plan string for the scale red flags the 100-TB
review checklist asks about:

* ``CartesianProduct`` — an unbroadcast cross join (quadratic);
* ``BatchEvalPython`` — a ROW-AT-A-TIME Python UDF in the plan
  (Arrow-vectorized ones show as ``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas`` instead);
* ``SortMergeJoin`` where a broadcast was expected (reported, not
  flagged — some joins are legitimately corpus×corpus);
* parquet scans whose ``ReadSchema`` is wider than a handful of
  columns (column pruning failed).

Writes PLAN_AUDIT.md with a per-query table (flags, joins, codegen
span count, Python eval operators) and an appendix of any flagged
plans. Exit code 1 if a red flag fires, so the audit can gate.

Usage: python scripts/plan_audit.py [sf_dir] [--full]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = next((a for a in sys.argv[1:] if not a.startswith("-")),
              "/root/testdata/sf0.001")

RED_FLAGS = ("CartesianProduct", "BatchEvalPython")


def plan_string(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(mode.fromString("simple"))


def audit_one(name: str, df) -> dict:
    p = plan_string(df)
    return {
        "name": name,
        "plan": p,
        "flags": [f for f in RED_FLAGS if f in p],
        "codegen": len(re.findall(r"WholeStageCodegen", p)),
        "joins": sorted(
            set(re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)", p))
        ),
        "python": sorted(
            set(re.findall(
                r"(ArrowEvalPython|BatchEvalPython|MapInPandas|"
                r"FlatMapGroupsInPandas|MapInArrow)", p))
        ),
        "scans": len(re.findall(r"FileScan parquet", p)),
    }


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    rows, failed = [], []
    for name, fn in entrymod.queries().items():
        try:
            rows.append(audit_one(name, fn(spark, SF_DIR)))
            print(f"  {name:28s} flags={rows[-1]['flags']} "
                  f"joins={rows[-1]['joins']} py={rows[-1]['python']}",
                  file=sys.stderr)
        except Exception as exc:  # plan building failed — report, move on
            failed.append((name, repr(exc)))
            print(f"  {name:28s} ERROR {exc!r}", file=sys.stderr)

    flagged = [r for r in rows if r["flags"]]
    out = ["# PLAN_AUDIT — physical plans of every registry query", ""]
    out.append(f"Input: `{SF_DIR}`. Red flags checked: "
               f"{', '.join('`'+f+'`' for f in RED_FLAGS)}. "
               "Plans are the optimizer's final (pre-AQE) physical plans; "
               "AQE may further replace sort-merge joins with broadcast "
               "at runtime.")
    out.append("")
    out.append("| query | red flags | joins | python eval | codegen spans | parquet scans |")
    out.append("|---|---|---|---|---|---|")
    for r in rows:
        out.append(
            f"| {r['name']} | {', '.join(r['flags']) or '—'} "
            f"| {', '.join(r['joins']) or '—'} "
            f"| {', '.join(r['python']) or '—'} "
            f"| {r['codegen']} | {r['scans']} |"
        )
    if failed:
        out.append("")
        out.append("## Failed to plan")
        for name, err in failed:
            out.append(f"- {name}: {err}")
    if flagged:
        out.append("")
        out.append("## Flagged plans")
        for r in flagged:
            out.append(f"### {r['name']}")
            out.append("```")
            out.append(r["plan"].strip())
            out.append("```")
    out.append("")
    n_flag = len(flagged) + len(failed)
    out.append(f"**Result: {len(rows)} plans audited, {len(flagged)} "
               f"flagged, {len(failed)} failed.**")
    path = os.path.join(os.path.dirname(__file__), "..", "PLAN_AUDIT.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} plans, {len(flagged)} flagged",
          file=sys.stderr)
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main())
