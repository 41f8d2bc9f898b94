"""Port of the reference's dimension-math unit tests
(reference: src/range.rs:79-110) plus WorldSpec validation."""

import pytest

from dmds_spark.core.dims import U64_MAX, DimSpec, WorldSpec, normalize_bounds
from dmds_spark.core.errors import ValueOutOfRangeError, WorldSpecError


def dim(start, end, ipc, name="d"):
    return DimSpec(name=name, start=start, end=end, items_per_chunk=ipc)


class TestChunkLocating:
    # reference: src/range.rs:84-93 (chunk_locating)
    def test_chunk_locating(self):
        m = dim(1, 9, 3)
        assert m.chunk_of(1) == 0
        assert m.chunk_of(2) == 0
        assert m.chunk_of(5) == 1
        assert m.chunk_of(9) == 2
        with pytest.raises(ValueOutOfRangeError):
            m.chunk_of(114)

    # reference: src/range.rs:96-99 (invalid_creating — panics)
    def test_invalid_creating(self):
        with pytest.raises(WorldSpecError):
            dim(1, 9, 4)

    # reference: src/range.rs:101-109 (chunks_ranging)
    def test_chunks_ranging(self):
        m = dim(1, 9, 3)
        assert m.chunks_of(slice(2, 7)) == (0, 1)   # 2..7  (excl end)
        assert m.chunks_of((2, 7)) == (0, 2)        # 2..=7
        assert m.chunks_of(slice(None, 7)) == (0, 1)  # ..7
        assert m.chunks_of((5, None)) == (1, 2)     # 5..
        assert m.chunks_of(None) == (0, 2)          # ..

    def test_chunks_len(self):
        assert dim(0, 1023, 8).chunks_len == 128
        assert dim(0, 1023, 16).chunks_len == 64
        assert dim(0, 99, 25).chunks_len == 4


class TestBoundNormalization:
    # reference: src/range.rs:112-132 (Wrapper conversion)
    def test_point(self):
        assert normalize_bounds(42) == (42, 42)

    def test_inclusive(self):
        assert normalize_bounds((3, 9)) == (3, 9)

    def test_half_open(self):
        assert normalize_bounds(slice(3, 9)) == (3, 8)

    def test_unbounded(self):
        assert normalize_bounds(None) == (0, U64_MAX)
        assert normalize_bounds((None, 9)) == (0, 9)
        assert normalize_bounds((3, None)) == (3, U64_MAX)
        assert normalize_bounds(slice(None, 9)) == (0, 8)


class TestWorldSpec:
    def test_canonical_world(self):
        # the canonical test world of src/tests.rs:11-23:
        # dims ..1024 ipc 8 and ..1024 ipc 16
        spec = WorldSpec(dims=(dim(0, 1023, 8, "dim0"), dim(0, 1023, 16, "dim1")))
        assert spec.ndims == 2
        assert spec.partition_cols() == ["c0", "c1"]
        # canonical record [114, 514] (src/tests.rs:25)
        assert spec.chunk_pos_of((114, 514)) == (114 // 8, 514 // 16)

    def test_out_of_range_record(self):
        spec = WorldSpec(dims=(dim(0, 99, 25, "dim0"), dim(0, 99, 25, "dim1")))
        with pytest.raises(ValueOutOfRangeError):
            spec.chunk_pos_of((100, 0))

    def test_duplicate_names(self):
        with pytest.raises(WorldSpecError):
            WorldSpec(dims=(dim(0, 7, 8, "x"), dim(0, 7, 8, "x")))

    def test_long_domain_guard(self):
        with pytest.raises(WorldSpecError):
            WorldSpec(dims=(DimSpec("d", 0, 2**63, 2**63 + 1),))
