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


WDS_RESULT_SCHEMA = (
    "shard long, file string, samples long, n_bytes long"
)


def export_webdataset(
    df: DataFrame,
    path: str,
    shards: int,
    key_col: str,
    content_cols: dict[str, str],
    key_width: int = 12,
) -> list[dict]:
    """Write ``df`` as WebDataset-style tar shards — the sequential-
    read sample format LLM training loaders consume: ``shards`` files
    ``shard-00000.tar ...``, each holding one member
    ``<key>.<ext>`` per (row, extension), all members of a sample
    adjacent, samples sorted by key within the shard.

    ``content_cols`` maps tar extension -> source column; string
    columns are utf-8 encoded, binary columns written as-is — so a
    (text, image-bytes, metadata-json) multimodal sample is
    ``{"txt": "text", "jpg": "content", "json": "meta"}``.

    Determinism and layout:
    - shard assignment is ``xxhash64(key) pmod shards`` — stable
      across runs, partitionings, and cluster sizes (same contract as
      operators/sampling.py);
    - tar members carry zeroed mtime/uid/gid and sorted sample order,
      so a re-export is BYTE-IDENTICAL (pinned in tests) — shard
      files can be content-hashed for integrity manifests;
    - each shard is written by exactly one task
      (``groupBy(shard).applyInPandas``), to ``<name>.tmp`` then
      ``os.replace`` — a crashed export leaves tmp garbage, never a
      torn ``.tar`` a loader would read.

    Scale: one hash shuffle on the shard id; pick ``shards`` so a
    shard is the usual 100 MB–1 GB webdataset unit (a whole shard is
    materialized in its writer task — that is the format's own design
    point: shards ARE the streaming-read unit, so they are sized to
    fit). Returns the manifest entries (also written to
    ``_manifest.json``)."""
    import pandas as pd

    if not content_cols:
        raise ValueError("content_cols must be non-empty")
    os.makedirs(path, exist_ok=True)
    exts = list(content_cols)
    sel = df.select(
        F.col(key_col).alias("__key"),
        *[F.col(c).alias(f"__c_{e}") for e, c in content_cols.items()],
    ).withColumn(
        "__shard", F.pmod(F.xxhash64(F.col("__key")), F.lit(shards))
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import tarfile

        shard = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values("__key", kind="mergesort")
        dup = pdf["__key"].duplicated()
        if dup.any():
            # duplicate sample keys would write colliding tar member
            # names — a loader silently keeps one and drops the rest;
            # fail loudly instead (dedup upstream, or derive a unique
            # key)
            raise ValueError(
                "export_webdataset: duplicate sample keys in shard "
                f"{shard} (first: {pdf['__key'][dup].iloc[0]!r}); "
                "keys must be unique"
            )
        name = f"shard-{shard:05d}.tar"
        tmp = os.path.join(path, name + ".tmp")
        n = 0
        with tarfile.open(tmp, "w") as tar:
            for _, row in pdf.iterrows():
                k = row["__key"]
                base = (
                    f"{int(k):0{key_width}d}"
                    if isinstance(k, (int,)) or hasattr(k, "__int__")
                    else str(k)
                )
                for e in exts:
                    v = row[f"__c_{e}"]
                    if v is None:
                        continue
                    data = (
                        v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    )
                    info = tarfile.TarInfo(f"{base}.{e}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
                n += 1
        os.replace(tmp, os.path.join(path, name))
        return pd.DataFrame(
            [{
                "shard": shard,
                "file": name,
                "samples": n,
                "n_bytes": os.path.getsize(os.path.join(path, name)),
            }]
        )

    rows = (
        sel.groupBy("__shard")
        .applyInPandas(write_shard, WDS_RESULT_SCHEMA)
        .collect()
    )
    manifest = sorted(
        (
            {
                "shard": int(r["shard"]),
                "file": r["file"],
                "samples": int(r["samples"]),
                "bytes": int(r["n_bytes"]),
            }
            for r in rows
        ),
        key=lambda e: e["shard"],
    )
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(
            {
                "format": "webdataset",
                "shards": shards,
                "key_col": key_col,
                "extensions": exts,
                "files": manifest,
            },
            fh,
            indent=1,
        )
    return manifest


def read_webdataset(
    spark,
    path: str,
    extensions: list[str] | None = None,
    text_exts: tuple[str, ...] = (),
) -> DataFrame:
    """Read WebDataset tar shards back into a DataFrame: one row per
    sample key, one column per extension (``bytes``; extensions named
    in ``text_exts`` decode to string) — the loader side of
    ``export_webdataset``, so Spark jobs can consume shard archives
    produced here or by any webdataset-convention writer.

    ``extensions`` defaults to the ``_manifest.json`` the exporter
    wrote (a DataFrame needs a static schema; a foreign archive
    without a manifest must pass them explicitly).

    Scale shape: one binaryFile scan — each task parses whole shard
    tars in memory (shards are sized to be the streaming-read unit,
    the format's own contract) through an Arrow ``mapInPandas``; no
    driver-side file walks, no per-member FS round trips."""
    import json as _json

    from pyspark.sql import types as T

    if extensions is None:
        with open(os.path.join(path, "_manifest.json")) as fh:
            extensions = _json.load(fh)["extensions"]
    exts = list(extensions)
    schema = T.StructType(
        [T.StructField("key", T.StringType())]
        + [
            T.StructField(
                e, T.StringType() if e in text_exts else T.BinaryType()
            )
            for e in exts
        ]
    )

    def parse(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    samples: dict[str, dict] = {}
                    for m in tar.getmembers():
                        if "." not in m.name:
                            continue
                        base, ext = m.name.rsplit(".", 1)
                        if ext not in exts:
                            continue
                        data = tar.extractfile(m).read()
                        samples.setdefault(base, {})[ext] = data
                    for base, d in samples.items():
                        row = {"key": base}
                        for e in exts:
                            v = d.get(e)
                            if v is not None and e in text_exts:
                                v = v.decode("utf-8")
                            row[e] = v
                        rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(path)
        .select("content")
        .mapInPandas(parse, schema)
    )
