"""Round-trip equality across source formats: parquet -> {csv, json,
orc} -> read-back must reproduce the exact rows and schema, and the
parquet ingest path (convert_to_parquet) must preserve sort order for
row-group pruning."""

import pytest
from pyspark.sql import functions as F

from dmds_spark.sources.formats import convert_to_parquet, read_table, write_table

SF = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_roundtrip(spark, tmp_path, fmt):
    src = spark.read.parquet(f"{SF}/customer.parquet")
    p = str(tmp_path / fmt)
    write_table(src, p, fmt)
    back = read_table(spark, p, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_csv_json_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unsupported"):
        write_table(None, str(tmp_path), "avro")


def test_convert_to_parquet(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/supplier.parquet")
    csv_p, pq_p = str(tmp_path / "c"), str(tmp_path / "p")
    write_table(src, csv_p, "csv")
    n = convert_to_parquet(spark, csv_p, pq_p, "csv", src.schema, sort_by=["s_suppkey"])
    assert n == src.count()
    back = spark.read.parquet(pq_p)
    assert _canon(back) == _canon(src)


class TestExportSharded:
    def test_exact_file_count_and_manifest(self, spark, tmp_path):
        from dmds_spark.sources.sinks import export_sharded

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "export")
        manifest = export_sharded(d, path, 8, "doc_id")
        import glob
        import json

        files = glob.glob(f"{path}/part-*.parquet")
        assert len(files) == 8
        assert len(manifest) == 8
        assert sum(e["rows"] for e in manifest) == d.count()
        on_disk = json.load(open(f"{path}/_manifest.json"))
        assert on_disk["files"] == manifest
        assert on_disk["shard_key"] == "doc_id"
        # round trip: nothing lost or duplicated
        back = spark.read.parquet(path)
        assert back.count() == d.count()
        assert back.select("doc_id").distinct().count() == d.count()

    def test_sort_within_files(self, spark, tmp_path):
        from dmds_spark.sources.sinks import export_sharded

        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        path = str(tmp_path / "export_sorted")
        export_sharded(d, path, 4, "source", sort_cols=["doc_id"])
        import glob

        import pandas as pd

        for f in glob.glob(f"{path}/part-*.parquet"):
            ids = pd.read_parquet(f, columns=["doc_id"])["doc_id"]
            assert ids.is_monotonic_increasing


class TestWebdatasetExport:
    def test_tar_shards_roundtrip_and_determinism(self, spark, tmp_path):
        """Every sample lands in exactly one shard tar with its members
        adjacent and key-sorted; shard assignment is the stable
        xxhash64 pmod; a re-export is byte-identical (zeroed tar
        metadata) so shards can be content-hashed for integrity."""
        import hashlib
        import json as _json
        import tarfile

        from dmds_spark.sources.sinks import export_webdataset

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text", "source")
        path = str(tmp_path / "wds")
        manifest = export_webdataset(
            docs, path, shards=4, key_col="doc_id",
            content_cols={"txt": "text", "src": "source"},
        )
        assert [e["shard"] for e in manifest] == sorted(
            {e["shard"] for e in manifest}
        )
        total = sum(e["samples"] for e in manifest)
        assert total == docs.count()

        # read every tar back: member adjacency, sort order, contents
        want = {
            int(r["doc_id"]): (r["text"], r["source"])
            for r in docs.collect()
        }
        seen = {}
        for e in manifest:
            with tarfile.open(f"{path}/{e['file']}") as tar:
                names = tar.getnames()
                keys = [n.split(".")[0] for n in names]
                assert keys == sorted(keys), "samples must be key-sorted"
                for base in dict.fromkeys(keys):
                    txt = tar.extractfile(f"{base}.txt").read().decode()
                    src = tar.extractfile(f"{base}.src").read().decode()
                    seen[int(base)] = (txt, src)
        assert seen == want

        # byte-identical re-export
        h1 = {
            e["file"]: hashlib.md5(
                open(f"{path}/{e['file']}", "rb").read()
            ).hexdigest()
            for e in manifest
        }
        path2 = str(tmp_path / "wds2")
        export_webdataset(
            docs.repartition(7), path2, shards=4, key_col="doc_id",
            content_cols={"txt": "text", "src": "source"},
        )
        h2 = {
            f: hashlib.md5(open(f"{path2}/{f}", "rb").read()).hexdigest()
            for f in h1
        }
        assert h1 == h2

        m = _json.load(open(f"{path}/_manifest.json"))
        assert m["format"] == "webdataset" and m["shards"] == 4

    def test_binary_and_null_members(self, spark, tmp_path):
        """Binary columns write as-is; a NULL content cell skips that
        member but keeps the sample's other members."""
        import tarfile

        from dmds_spark.sources.sinks import export_webdataset

        rows = [
            (1, "alpha", bytearray(b"\x00\xffPAYLOAD1")),
            (2, None, bytearray(b"\x01raw2")),
            (3, "gamma", None),
        ]
        df = spark.createDataFrame(
            rows, "k long, t string, b binary"
        )
        path = str(tmp_path / "wdsb")
        manifest = export_webdataset(
            df, path, shards=2, key_col="k",
            content_cols={"txt": "t", "bin": "b"},
        )
        assert sum(e["samples"] for e in manifest) == 3
        members = {}
        for e in manifest:
            with tarfile.open(f"{path}/{e['file']}") as tar:
                for n in tar.getnames():
                    members[n] = tar.extractfile(n).read()
        pad = f"{1:012d}"
        assert members[f"{pad}.txt"] == b"alpha"
        assert members[f"{pad}.bin"] == b"\x00\xffPAYLOAD1"
        assert f"{2:012d}.txt" not in members  # NULL member skipped
        assert members[f"{2:012d}.bin"] == b"\x01raw2"
        assert f"{3:012d}.bin" not in members
        assert members[f"{3:012d}.txt"] == b"gamma"

    def test_read_webdataset_roundtrip(self, spark, tmp_path):
        """read_webdataset inverts the export: same samples, text
        extensions decoded, binary pass-through, extensions resolved
        from the manifest."""
        from dmds_spark.sources.sinks import (
            export_webdataset,
            read_webdataset,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text", "source")
        path = str(tmp_path / "wds_rt")
        export_webdataset(
            docs, path, shards=4, key_col="doc_id",
            content_cols={"txt": "text", "src": "source"},
        )
        back = read_webdataset(spark, path, text_exts=("txt", "src"))
        got = {
            int(r["key"]): (r["txt"], r["src"]) for r in back.collect()
        }
        want = {
            int(r["doc_id"]): (r["text"], r["source"])
            for r in docs.collect()
        }
        assert got == want

    def test_edge_payloads_and_duplicate_keys(self, spark, tmp_path):
        """Empty strings/bytes and unicode survive the round trip;
        duplicate sample keys fail loudly (colliding tar member names
        would silently drop samples in any loader)."""
        import pytest as _pytest

        from dmds_spark.sources.sinks import (
            export_webdataset,
            read_webdataset,
        )

        rows = [
            (1, "", bytearray(b"")),
            (2, "café 中文 \U0001f600", bytearray(b"\x00" * 64)),
            (3, "plain", bytearray(b"\xff")),
        ]
        df = spark.createDataFrame(rows, "k long, t string, b binary")
        path = str(tmp_path / "wde")
        export_webdataset(
            df, path, shards=2, key_col="k",
            content_cols={"txt": "t", "bin": "b"},
        )
        back = {
            int(r["key"]): (r["txt"], bytes(r["bin"]))
            for r in read_webdataset(
                spark, path, text_exts=("txt",)
            ).collect()
        }
        assert back == {k: (t, bytes(b)) for k, t, b in rows}

        dupdf = spark.createDataFrame(
            [(7, "a"), (7, "b")], "k long, t string"
        )
        with _pytest.raises(Exception, match="duplicate sample keys"):
            export_webdataset(
                dupdf, str(tmp_path / "wdd"), shards=1, key_col="k",
                content_cols={"txt": "t"},
            )
