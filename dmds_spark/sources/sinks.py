"""Export sinks: the write side of a training-data pipeline.

``tokens_shard_plan`` (queries/llm_extra6.py) PLANS an even export;
``export_sharded`` executes it: exactly ``shards`` hash-bucketed
files, optionally sorted within each file, plus a driver-written
manifest the downstream loader can trust without listing the
filesystem.

Scale notes (100 TB):
- ``repartition(shards, key)`` is ONE hash shuffle; each reduce task
  writes exactly one file, so file count — and with an even key, file
  size — is controlled up front instead of discovered after the
  write (the small-files problem `World.compact` exists to undo).
- ``sortWithinPartitions`` rides the same shuffle's sort machinery —
  no extra exchange — and gives every file internally sorted row
  groups (range-prunable on read, the same trick the World writer
  uses for dim0).
- The manifest pass is a per-file count over the just-written
  parquet: row counts come from footer metadata, so it reads no data
  pages. The manifest itself is one tiny JSON written by the driver
  (#shards entries, never rows).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_sharded(
    df: DataFrame,
    path: str,
    shards: int,
    shard_key: str,
    sort_cols: list[str] | None = None,
) -> list[dict]:
    """Write ``df`` as exactly ``shards`` hash-bucketed parquet files
    under ``path`` and a ``_manifest.json`` beside them; returns the
    manifest (one {file, rows} entry per output file, file-name
    ordered)."""
    out = df.repartition(shards, F.col(shard_key))
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(path)

    spark = df.sparkSession
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    manifest = sorted(
        (
            {"file": os.path.basename(r["file"]), "rows": int(r["rows"])}
            for r in per_file
        ),
        key=lambda e: e["file"],
    )
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(
            {"shards": shards, "shard_key": shard_key, "files": manifest},
            fh,
            indent=1,
        )
    return manifest
