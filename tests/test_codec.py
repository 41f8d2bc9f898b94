"""Chunk-file codec tests: byte-level golden frames matching the
reference's on-disk format (src/world.rs:33-47, tokio-fs/src/lib.rs:
89-90) and distributed round-trips through Spark.
"""

import struct

import pytest
from pyspark.sql import functions as F

from dmds_spark.core.dims import DimSpec, WorldSpec
from dmds_spark.sources.codec import (
    chunk_file_path,
    decode_items,
    encode_items,
    read_chunk_tree,
    write_chunk_tree,
)


def spec2d():
    return WorldSpec(
        dims=(DimSpec("dim0", 0, 1023, 64), DimSpec("dim1", 0, 1023, 64))
    )


def test_golden_frame_bytes():
    """Byte-for-byte golden frame: version header, BE u64 dims, BE u32
    payload length, payload (the reference's exact layout)."""
    buf = encode_items(7, [((114, 514), b"xy")])
    expected = (
        struct.pack(">I", 7)
        + struct.pack(">Q", 114)
        + struct.pack(">Q", 514)
        + struct.pack(">I", 2)
        + b"xy"
    )
    assert buf == expected


def test_roundtrip_pure():
    items = [((114, 514), b""), ((10, 39), b"payload")]
    version, decoded = decode_items(encode_items(3, items), 2)
    assert version == 3
    assert decoded == items


def test_short_read_errors():
    buf = encode_items(1, [((1, 2), b"abc")])
    with pytest.raises(ValueError):
        decode_items(buf[:10], 2)  # truncated dims
    with pytest.raises(ValueError):
        decode_items(buf[:-1], 2)  # truncated payload
    with pytest.raises(ValueError):
        decode_items(b"\x00", 2)  # shorter than version header


def test_path_layouts(tmp_path):
    # reference FsHandle::path: nested root/3/7 and flat root/3_7
    assert chunk_file_path("/r", (3, 7), nested=True) == "/r/3/7"
    assert chunk_file_path("/r", (3, 7), nested=False) == "/r/3_7"


def test_spark_roundtrip(spark, tmp_path):
    """DataFrame -> chunk tree -> DataFrame round-trip (the codec's
    buf_save_load analogue, src/tests.rs:71-132), distributed both ways."""
    spec = spec2d()
    rows = [
        {"dim0": i, "dim1": (i * 13) % 1024, "payload": bytes([i % 256, (i * 3) % 256])}
        for i in range(0, 1000, 7)
    ]
    df = spark.createDataFrame(rows)
    root = str(tmp_path / "chunks")
    n_files = write_chunk_tree(df, root, spec, version=4)
    assert n_files > 1  # really split across chunk files

    back = read_chunk_tree(spark, root, spec)
    assert back.filter(F.col("version") != 4).count() == 0
    got = sorted(
        (r["dim0"], r["dim1"], bytes(r["payload"])) for r in back.collect()
    )
    want = sorted((r["dim0"], r["dim1"], r["payload"]) for r in rows)
    assert got == want


def test_versioned_decode(spark, tmp_path):
    """Old chunk files decode through their version's decoder — the
    reference's Data::decode(version, ...) schema-evolution hook
    (src/lib.rs:41)."""
    from pyspark.sql import types as T

    spec = spec2d()
    root = str(tmp_path / "mixed")
    v1 = spark.createDataFrame([{"dim0": 1, "dim1": 1, "payload": b"\x05"}])
    v2 = spark.createDataFrame([{"dim0": 600, "dim1": 600, "payload": b"\x00\x07"}])
    # v1 payload: u8 value; v2 payload: u16 BE value — different chunks
    write_chunk_tree(v1, root, spec, version=1)
    write_chunk_tree(v2, root, spec, version=2)

    def decoder(version, dims, payload):
        if version == 1:
            return {"value": int(payload[0])}
        return {"value": int.from_bytes(payload, "big")}

    out = read_chunk_tree(
        spark, root, spec, decoder,
        T.StructType([T.StructField("value", T.LongType())]),
    )
    got = {(r["dim0"], r["version"]): r["value"] for r in out.collect()}
    assert got == {(1, 1): 5, (600, 2): 7}
