"""dmds on-disk chunk-file codec — byte-compatible with the reference.

Format (reference: layout comment src/world.rs:33-47, writer
src/world.rs:96-122, streaming parser src/world/iter.rs:345-465, and
the 4-byte big-endian version header prepended by the FS handler,
tokio-fs/src/lib.rs:89-90 write / :59-63 read):

    [u32 BE data-version]
    repeated items:
      [u64 BE dim_0] ... [u64 BE dim_{N-1}] [u32 BE payload_len] [payload]

Chunk file paths are one directory level per dimension (``root/3/7``)
or flat (``root/3_7``) — ``FsHandle::path``, tokio-fs/src/lib.rs:109-128.

This codec exists for ingest/egress parity: data written by the
reference engine can be bulk-loaded into a Spark ``World`` (and back).
Decoding versioned payloads mirrors the reference's ``Data::decode``
hook (src/lib.rs:41): a registry of per-version decode functions, so
old chunk files carrying an old version number still load.

Scale note: ingest is ``spark.read.format("binaryFile")`` over the
chunk tree + an Arrow ``mapInPandas`` parser — each file decodes where
it lands, nothing flows through the driver.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dmds_spark.core.dims import WorldSpec

U64 = struct.Struct(">Q")
U32 = struct.Struct(">I")


def encode_items(version: int, items: list[tuple[tuple[int, ...], bytes]]) -> bytes:
    """Encode a chunk: version header + item frames
    (reference: Chunk::write_buf src/world.rs:96-122 + version header
    tokio-fs/src/lib.rs:89-90)."""
    out = [U32.pack(version)]
    for dims, payload in items:
        for d in dims:
            out.append(U64.pack(d))
        out.append(U32.pack(len(payload)))
        out.append(payload)
    return b"".join(out)


def decode_items(buf: bytes, ndims: int) -> tuple[int, list[tuple[tuple[int, ...], bytes]]]:
    """Decode a chunk file: returns (version, [(dims, payload), ...]).
    Mirrors the reference's state machine Pre -> Dims -> Len -> Data
    (src/world/iter.rs:352-465), including short-read errors."""
    if len(buf) < 4:
        raise ValueError("chunk shorter than version header")
    version = U32.unpack_from(buf, 0)[0]
    pos = 4
    items = []
    while pos < len(buf):
        need = ndims * 8 + 4
        if pos + need > len(buf):
            raise ValueError(f"short read in item frame at offset {pos}")
        dims = tuple(U64.unpack_from(buf, pos + i * 8)[0] for i in range(ndims))
        plen = U32.unpack_from(buf, pos + ndims * 8)[0]
        pos += need
        if pos + plen > len(buf):
            raise ValueError(f"short read in payload at offset {pos}")
        items.append((dims, buf[pos : pos + plen]))
        pos += plen
    return version, items


def chunk_file_path(root: str, pos: tuple[int, ...], nested: bool = True) -> str:
    """Chunk position -> file path (reference FsHandle::path,
    tokio-fs/src/lib.rs:109-128): nested ``root/3/7`` or flat ``root/3_7``."""
    if nested:
        return os.path.join(root, *[str(p) for p in pos])
    return os.path.join(root, "_".join(str(p) for p in pos))


# Decoder: (version, dims, payload) -> dict of payload columns.
PayloadDecoder = Callable[[int, tuple[int, ...], bytes], dict]


def raw_payload_decoder(version: int, dims: tuple[int, ...], payload: bytes) -> dict:
    """Default decoder: keep the payload opaque (the reference's
    ``[u64; DIMS]`` built-in Data has an empty payload, src/lib.rs:51-73)."""
    return {"payload": payload}


def read_chunk_tree(
    spark: SparkSession,
    root: str,
    spec: WorldSpec,
    decoder: PayloadDecoder = raw_payload_decoder,
    payload_schema: T.StructType | None = None,
) -> DataFrame:
    """Bulk-load a reference chunk tree into a DataFrame:
    binaryFile scan -> distributed frame parse -> versioned decode.
    Columns: dims..., version, + decoder outputs."""
    ndims = spec.ndims
    if payload_schema is None:
        payload_schema = T.StructType([T.StructField("payload", T.BinaryType())])
    # the wire format is u64 LE either way (src/world.rs:96-122); only
    # the COLUMN type differs — u64 dims surface as DECIMAL(20,0)
    # (values past 2^63 don't fit a long), long dims stay LongType
    schema = T.StructType(
        [
            T.StructField(
                d.name, T.DecimalType(20, 0) if d.u64 else T.LongType()
            )
            for d in spec.dims
        ]
        + [T.StructField("version", T.IntegerType())]
        + list(payload_schema.fields)
    )
    dim_names = spec.dim_names()
    from decimal import Decimal

    conv = [
        (lambda v: Decimal(v)) if d.u64 else (lambda v: v) for d in spec.dims
    ]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                version, items = decode_items(bytes(content), ndims)
                for dims, payload in items:
                    row = {n: c(v) for n, c, v in zip(dim_names, conv, dims)}
                    row["version"] = version
                    row.update(decoder(version, dims, payload))
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("content")
    )
    return files.mapInPandas(parse, schema)


def write_chunk_tree(
    df: DataFrame,
    root: str,
    spec: WorldSpec,
    version: int,
    payload_col: str | None = "payload",
    nested: bool = True,
) -> int:
    """Write a DataFrame out as a reference-compatible chunk tree:
    route rows to chunk positions (chunk_pos_of_data,
    src/world.rs:544-551), encode each chunk's items sorted by id (the
    reference's BTreeMap order, src/world.rs:25), one file per chunk.
    Encoding runs executor-side via applyInPandas grouped on the chunk
    position; returns the number of chunk files written."""
    dim_names = spec.dim_names()
    chunk_cols = [f"__c{i}" for i in range(spec.ndims)]
    with_pos = df
    for i, d in enumerate(spec.dims):
        # exact integer div, never double division: floor((v-s)/spacing)
        # over doubles mis-buckets past the 53-bit mantissa, and u64
        # dims (DECIMAL(20,0) columns) don't fit a double at all
        start = (
            f"CAST('{d.start}' AS DECIMAL(20,0))" if d.u64 else f"{d.start}L"
        )
        with_pos = with_pos.withColumn(
            chunk_cols[i],
            F.expr(f"(`{d.name}` - {start}) div {d.spacing}").cast("long"),
        )

    out_schema = T.StructType(
        [T.StructField("path", T.StringType()), T.StructField("n_items", T.LongType())]
    )

    def encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pos = tuple(int(k) for k in key)
        pdf = pdf.sort_values(dim_names[0])
        items = []
        for _, row in pdf.iterrows():
            dims = tuple(int(row[n]) for n in dim_names)
            payload = bytes(row[payload_col]) if payload_col else b""
            items.append((dims, payload))
        buf = encode_items(version, items)
        path = chunk_file_path(root, pos, nested)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(buf)
        return pd.DataFrame([{"path": path, "n_items": len(items)}])

    results = with_pos.groupBy(*chunk_cols).applyInPandas(encode_group, out_schema)
    return results.count()
