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
