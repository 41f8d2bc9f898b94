"""Port of the reference's box/shape algebra tests
(reference: src/world/select.rs:136-191,376-394) plus value-exact
Select AST behavior and documented divergences (SURVEY.md §4.3)."""

import pytest

from dmds_spark.core.dims import DimSpec, WorldSpec
from dmds_spark.core.select import PosBox, Select, Shape


def spec2d(w=100, ipc0=25, ipc1=25):
    return WorldSpec(
        dims=(
            DimSpec("dim0", 0, w - 1, ipc0),
            DimSpec("dim1", 0, w - 1, ipc1),
        )
    )


class TestPosBox:
    # reference: src/world/select.rs:140-147 (creation)
    def test_creation(self):
        b = PosBox((2, 10), (5, 24))
        assert b.start == (2, 10)
        assert b.end == (5, 24)

    # reference: src/world/select.rs:149-161 (contain)
    def test_contains(self):
        b = PosBox((2, 10), (5, 24))
        assert b.contains(PosBox((3, 10), (3, 8)))

    # reference: src/world/select.rs:163-171 (intersect)
    def test_intersect(self):
        b0 = PosBox((0, 1), (10, 11))
        b1 = PosBox((7, 2), (17, 5))
        assert b0.intersect(b1) == PosBox((7, 2), (10, 5))
        # disjoint in dim1 (11 < 12): empty either way
        b3 = PosBox((7, 12), (17, 13))
        assert b0.intersect(b3) is None

    def test_intersect_width1_divergence(self):
        # SURVEY.md §4.3.1: the reference DROPS width-1 overlaps
        # (end <= start test, select.rs:99-103). Correct closed-interval
        # semantics keep them: [0..10]x[1..11] ∩ [7..17]x[11..12] is the
        # width-1 strip [7..10]x[11..11] — the reference returns None.
        b0 = PosBox((0, 1), (10, 11))
        b2 = PosBox((7, 11), (17, 12))
        assert b0.intersect(b2) == PosBox((7, 11), (10, 11))

    # reference: src/world/select.rs:173-181 (add / containment collapse)
    def test_union_collapse(self):
        b0 = PosBox((0, 1), (10, 11))
        b1 = PosBox((1, 3), (10, 4))
        assert Shape.single(b0).union(Shape.single(b1)).boxes == [b0]
        b2 = PosBox((7, 2), (17, 5))
        assert Shape.single(b0).union(Shape.single(b2)).boxes == [b0, b2]

    # reference: src/world/select.rs:183-190 (iter, dim-0-fastest order)
    def test_iter_order(self):
        b = PosBox((1, 1), (2, 2))
        assert list(b.positions()) == [(1, 1), (2, 1), (1, 2), (2, 2)]


class TestShape:
    # reference: src/world/select.rs:376-394 (raw_shape_tests::iter)
    def test_union_iter_dedup(self):
        expected = {(0, 0), (0, 1), (1, 0), (1, 1), (1, 2), (1, 3)}
        shape = Shape([PosBox((0, 0), (1, 1)), PosBox((1, 1), (1, 3))])
        got = shape.positions()
        assert set(got) == expected
        assert len(got) == len(expected)

    def test_intersect_distributes(self):
        # reference: src/world/select.rs:273-291
        shape = Shape([PosBox((0, 0), (3, 3)), PosBox((5, 5), (9, 9))])
        out = shape.intersect_box(PosBox((2, 2), (6, 6)))
        assert out.boxes == [PosBox((2, 2), (3, 3)), PosBox((5, 5), (6, 6))]


class TestSelectAst:
    def test_seed_and_shape(self):
        # 4x4 chunk grid world of src/tests.rs:137-149
        s = Select.dim(spec2d(), 0, (10, 40))
        shape = s.shape()
        assert shape.boxes == [PosBox((0, 0), (1, 3))]

    def test_select_all(self):
        s = Select.all(spec2d())
        assert s.shape().boxes == [PosBox((0, 0), (3, 3))]

    def test_and_intersects(self):
        s = Select.dim(spec2d(), 0, (10, 90)).and_(1, (30, 60))
        assert s.shape().boxes == [PosBox((0, 1), (3, 2))]
        assert s.boxes[0].intervals == ((10, 90), (30, 60))

    def test_and_out_of_range_empties(self):
        # SURVEY.md §4.3.2: reference no-ops; we clamp -> empty
        s = Select.dim(spec2d(), 0, (10, 90)).and_(1, (200, 300))
        assert s.is_empty()
        assert s.shape().is_none()

    def test_plus_unions(self):
        s = Select.dim(spec2d(), 0, (0, 10)).plus(0, (80, 99))
        assert len(s.boxes) == 2
        assert s.shape().boxes == [
            PosBox((0, 0), (0, 3)),
            PosBox((3, 0), (3, 3)),
        ]

    def test_plus_containment_dedup(self):
        s = Select.dim(spec2d(), 0, (0, 50)).plus(0, (10, 20))
        assert len(s.boxes) == 1  # contained box collapsed

    def test_out_of_range_seed_is_empty(self):
        # reference: out-of-range select -> Shape::None (world.rs:313-317)
        s = Select.dim(spec2d(), 0, (200, 300))
        assert s.is_empty()

    def test_hints_accumulate(self):
        s = Select.all(spec2d()).hint(5).hints([7, 9])
        assert s.hint_ids == (5, 7, 9)


class TestPredicateCompile:
    """Compilation to Spark Columns — checked structurally via the
    expression string (needs an active session to build Columns)."""

    def test_value_predicate(self, spark):
        s = Select.dim(spec2d(), 0, (10, 40)).and_(1, (5, 5))
        expr = str(s.to_predicate())
        assert "dim0" in expr and "dim1" in expr

    def test_empty_predicate_is_false(self, spark):
        s = Select.dim(spec2d(), 0, (200, 300))
        assert "false" in str(s.to_predicate()).lower()

    def test_partition_predicate_mentions_chunk_cols(self, spark):
        s = Select.dim(spec2d(), 0, (10, 40))
        expr = str(s.to_partition_predicate())
        assert "c0" in expr and "c1" not in expr

    def test_hint_narrows_partitions(self, spark):
        s = Select.all(spec2d()).hint(99)
        expr = str(s.to_partition_predicate())
        assert "c0" in expr
