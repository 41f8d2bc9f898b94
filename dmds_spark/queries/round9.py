"""Round-9 queries: driver-checked evidence for the full-u64 dimension
path (DimSpec(u64=True) -> DECIMAL(20,0) dim columns, exact div chunk
routing — closing the last documented domain divergence with the
reference, src/range.rs:129 u64::MAX domains), plus the PII redaction
REWRITE (the counts pass, text_pii_counts, has been driver-green since
round 6; this is the rewrite it sizes).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dmds_spark.queries import register

# 2^63: one past LongType — every id in the world lives beyond it
_U63 = "9223372036854775808"


def _scratch(sf_dir: str, kind: str) -> str:
    from dmds_spark.core.scratch import scratch_dir

    return scratch_dir(kind, sf_dir)


@register(
    "dmds_u64_snapshot",
    f"""
    SELECT CAST({_U63} + doc_id * 1024 AS VARCHAR) AS id_str,
           CAST(CASE WHEN doc_id < 50
                     THEN (doc_id % 1024 + 512) % 1024
                     ELSE doc_id % 1024 END AS BIGINT) AS t,
           n_chars
    FROM documents
    WHERE doc_id <= 4000 AND NOT (doc_id >= 100 AND doc_id < 200)
    """,
)
def dmds_u64_snapshot(spark, sf_dir):
    """The dmds_crud_snapshot write path on a FULL-u64 world: every id
    sits past 2^63 (DECIMAL(20,0) dim column, DimSpec(u64=True)), the
    relocation moves t-chunks, the delete removes a u64 id range, and
    the final read is a range select whose bounds don't fit a long —
    so decimal planner literals, exact div chunk routing, and decimal
    partition pruning are all on the driver-checked path. DuckDB's
    HUGEINT arithmetic states the same end-state declaratively; ids
    are emitted as digit strings per the exactness contract (both
    engines print the same 19-20 digits; doubles would drift).

    Reference parity: dims are u64 to u64::MAX (src/range.rs:129);
    this closes SURVEY §7's documented [0, 2^63) restriction."""
    from dmds_spark.core.dims import DimSpec, WorldSpec
    from dmds_spark.world import World

    spec = WorldSpec(
        dims=(
            # 2^20 chunks of 8192 ids starting at 2^63; physical
            # factors bound the dir count as usual
            DimSpec("id", 2**63, 2**63 + 2**33 - 1, 8192, u64=True),
            DimSpec("t", 0, 1023, 16),
        )
    )
    world = World(spark, spec, _scratch(sf_dir, "u64_world"))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    id_expr = F.expr(
        f"CAST('{_U63}' AS DECIMAL(20,0)) + CAST(doc_id AS DECIMAL(20,0)) * 1024"
    ).alias("id")
    base = docs.select(
        id_expr, (F.col("doc_id") % 1024).alias("t"), "n_chars"
    )
    world.upsert(base)
    world.flush()
    # relocation: doc_id < 50 moves to a different t chunk
    moved = docs.filter(F.col("doc_id") < 50).select(
        id_expr,
        ((F.col("doc_id") % 1024 + 512) % 1024).alias("t"),
        "n_chars",
    )
    world.upsert(moved)
    # u64 delete: ids for doc_id 100..199
    world.delete_ids([2**63 + i * 1024 for i in range(100, 200)])
    world.flush()
    # range select with a past-2^63 upper bound (inclusive)
    sel = world.select(0, (2**63, 2**63 + 4000 * 1024))
    return world.read(sel).select(
        F.col("id").cast("string").alias("id_str"), "t", "n_chars"
    )


# ---------------------------------------------------------------------------
# PII redaction rewrite (the counts pass text_pii_counts sizes this)
# ---------------------------------------------------------------------------

# same Java/RE2-identical dialect subset as text_pii_counts
# (llm_extra10._PII_PATTERNS); application ORDER is part of the
# contract — email first so its digits never leak into digit_run
_REDACT_ORDER = [
    ("EMAIL", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"),
    ("PHONEISH", "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"),
    ("DIGIT_RUN", "[0-9]{6,}"),
    ("HEX_TOKEN", "0x[0-9a-fA-F]{8,}"),
]

# deterministic PII injection so EVERY row exercises the rewrite (the
# word-soup corpus itself is nearly hit-free; redaction evidence on an
# all-identity rewrite would be vacuous) — same expression both sides
# up to the string cast's spelling (Spark: STRING, DuckDB: VARCHAR)
_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS {S})"
    " || '@example.com tel 555-010-'"
    " || lpad(CAST(doc_id % 10000 AS {S}), 4, '0')"
    " || ' ref ' || CAST(doc_id * 1234567 AS {S})"
)


def _redact_sql() -> str:
    expr = "t"
    for name, p in _REDACT_ORDER:
        expr = f"regexp_replace({expr}, '{p}', '<{name}>', 'g')"
    aug = _AUG_SQL.format(S="VARCHAR")
    return f"""
    WITH aug AS (SELECT doc_id, {aug} AS t FROM documents)
    SELECT doc_id, {expr} AS redacted FROM aug
    """


@register("text_pii_redact", _redact_sql())
def text_pii_redact(spark, sf_dir):
    """PII redaction as a corpus REWRITE, hash-verified byte-for-byte
    against DuckDB: each pattern class replaces with a typed
    placeholder, applied in a fixed order (email before digit_run so
    an address's digits are consumed by <EMAIL>, never half-redacted).
    Placeholders are letter-only tokens no later pattern can re-match.
    The deterministic augmentation plants an email, a phone-shaped
    number, and a long digit run derived from doc_id in every row, so
    the driver hash certifies the actual rewrite, not a no-op.

    Shape at scale: one projection — regexp_replace chains fuse into a
    single whole-stage-codegen pass over the text column; no shuffle,
    no UDF. This is the production anonymization pass: the counts
    query (text_pii_counts) sizes it, this one ships the rewritten
    corpus."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    red = F.expr(_AUG_SQL.format(S="STRING"))
    for name, p in _REDACT_ORDER:
        red = F.regexp_replace(red, p, f"<{name}>")
    return d.select("doc_id", red.alias("redacted"))


# ---------------------------------------------------------------------------
# WebDataset export, driver-visible
# ---------------------------------------------------------------------------


@register("sink_webdataset_manifest", None)
def sink_webdataset_manifest(spark, sf_dir):
    """Runs the WebDataset tar-shard export end to end on the
    documents table and returns its manifest as rows (shard, samples,
    n_bytes) — deterministic by construction: shard assignment is
    xxhash64 pmod (stable across partitionings) and the tar writer
    zeroes all metadata, so even n_bytes is reproducible run to run
    (byte-identical shards, pinned in tests/test_formats.py).
    Rows-only: xxhash64 has no DuckDB twin. Sink: sources/sinks.py
    export_webdataset."""
    import os

    from pyspark.sql import functions as F  # noqa: F811

    from dmds_spark.sources.sinks import export_webdataset

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    out = _scratch(sf_dir, "wds")
    manifest = export_webdataset(
        docs, out, shards=8, key_col="doc_id",
        content_cols={"txt": "text", "src": "source"},
    )
    return spark.createDataFrame(
        [(e["shard"], e["samples"], e["bytes"]) for e in manifest],
        "shard long, samples long, n_bytes long",
    ).orderBy("shard")


@register(
    "sink_webdataset_roundtrip",
    """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_rt
    FROM documents
    """,
)
def sink_webdataset_roundtrip(spark, sf_dir):
    """Tar-shard round trip as an oracle-checked claim: export the
    corpus to WebDataset shards, read it back through the binaryFile
    + Arrow tar parser, and return each doc's read-back text length —
    hash-compared against DuckDB's view of the ORIGINAL table, so the
    driver certifies the sink+loader pair preserves every document
    (same keys, same content length) through the archive format.
    Sink/loader: sources/sinks.py export_webdataset/read_webdataset;
    byte-identity of the shards themselves is pinned in
    tests/test_formats.py."""
    from dmds_spark.sources.sinks import export_webdataset, read_webdataset

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = _scratch(sf_dir, "wds_rt")
    export_webdataset(
        docs, out, shards=8, key_col="doc_id", content_cols={"txt": "text"}
    )
    back = read_webdataset(spark, out, text_exts=("txt",))
    return back.select(
        F.col("key").cast("long").alias("doc_id"),
        F.length("txt").cast("long").alias("n_chars_rt"),
    )


@register(
    "join_asof_nulls",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purch AS (
      SELECT user_id, ts,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
      FROM (
        SELECT user_id, ts, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT c.event_id, c.user_id, CAST(p.v AS DOUBLE) AS prev_purchase
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof_nulls(spark, sf_dir):
    """join_asof with genuinely NULL right VALUES (every third
    purchase's value nulled deterministically): the nearest right row
    must win and its NULL must SURVIVE the pick — DuckDB's native
    ASOF JOIN keeps the NULL, and the operator's struct pick
    (operators/relational.py asof_join) now matches; the pre-round-9
    per-column ignorenulls pick fell through to a farther non-null
    row, which this driver row would catch as a hash mismatch."""
    from pyspark.sql import Window as W

    from dmds_spark.queries.relational import T
    from dmds_spark.operators.relational import asof_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.when(F.col("event_id") % 3 == 0, F.lit(None))
            .otherwise(F.col("value"))
            .alias("prev_purchase"),
        )
    )
    out = asof_join(
        clicks, purch, on="ts", by=["user_id"],
        right_value_cols=["prev_purchase"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("prev_purchase").cast("double").alias("prev_purchase"),
    )
