"""Output sinks (reference K1/K2/K5).

* JSONL results sink — one dolma-style JSON object per line
  (``karanta/pipeline.py:632-652``); file rolling via
  ``maxRecordsPerFile`` replaces the reference's manual 1000-rows-
  per-file roll (``karanta/data/create_batch_data_prompts.py:143-209``).
* Markdown sink — per-document ``.md`` mirroring the url path
  (``karanta/pipeline.py:654-686``), written per-partition with no
  driver collection.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F


def write_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1000,
    mode: str = "overwrite",
) -> None:
    """Dolma-style JSONL: doc rows → {id, text, source, attributes}."""
    out = df.select(
        F.to_json(
            F.struct(
                F.col("doc_id").alias("id"),
                F.col("text"),
                F.col("url").alias("source"),
                F.struct(
                    F.col("spans").alias("pdf_page_numbers"),
                    F.col("n_pages"),
                    F.col("n_failed"),
                    # Dolma rotation attributes (karanta/pipeline.py:582-589);
                    # constants when the doc frame predates the columns.
                    (
                        F.col("rotation_correction")
                        if "rotation_correction" in df.columns
                        else F.lit(0)
                    ).alias("rotation_correction"),
                    (
                        F.col("is_rotation_valid")
                        if "is_rotation_valid" in df.columns
                        else F.lit(True)
                    ).alias("is_rotation_valid"),
                ).alias("attributes"),
            )
        ).alias("value")
    )
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .text(path)
    )


def _slug(url: str) -> str:
    """Filesystem-safe name for a url. A sha1 suffix makes the name
    collision-free: slug-sanitization and truncation both map distinct
    urls together, and os.replace would silently drop the loser."""
    import hashlib

    safe = re.sub(r"[^A-Za-z0-9._-]+", "_", url)[:160]
    return f"{safe}-{hashlib.sha1(url.encode()).hexdigest()[:10]}"


def write_markdown(df: DataFrame, out_dir: str) -> int:
    """One ``.md`` per document under *out_dir*, written inside
    ``foreachPartition`` (each executor writes its own partition's
    files; nothing is collected to the driver). Returns doc count.

    *out_dir* must be on a filesystem shared by all executors (NFS
    etc.) — on a multi-node cluster with node-local paths the files
    would land scattered across machines while "succeeding". Local
    mode (this sandbox) trivially satisfies it. The count comes from
    an accumulator inside the same pass, not a second action —
    ``foreachPartition`` is an action, so task-level retries count
    once and the upstream plan executes exactly once."""
    acc = df.sparkSession.sparkContext.accumulator(0)

    def write_part(rows) -> None:
        import os

        os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            p = os.path.join(out_dir, _slug(row["url"]) + ".md")
            tmp = p + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(row["text"])
            os.replace(tmp, p)  # atomic per file, like pipeline.py:632-648
            acc.add(1)

    df.select("url", "text").foreachPartition(write_part)
    return acc.value
