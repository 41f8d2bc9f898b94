"""Order-preserving string keys for min_by/max_by tie-breaking.

``min_by(value, key)`` needs a TOTAL order; when the key is built by
concatenating lpad'ed numbers, two hazards corrupt the order silently:
``lpad`` TRUNCATES inputs wider than the pad, and a negative number's
'-' prefix sorts it *above* all digits ('-' < '0' is false in ASCII:
'-' is 0x2D, '0' is 0x30 — so "-5" sorts before "0005", meaning
negatives sort FIRST but among themselves in REVERSED magnitude
order). :func:`sortable_int64` closes both: shift the signed 64-bit
value by 2^63 into [0, 2^64) with exact DECIMAL arithmetic, then pad
to the full 20 digits 2^64-1 needs — nothing can truncate, and
lexicographic order equals numeric order for the entire BIGINT domain.

DuckDB oracle equivalent (HUGEINT is exact):
``lpad(CAST(CAST(x AS HUGEINT) + 9223372036854775808 AS VARCHAR), 20, '0')``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OFFSET = "9223372036854775808"  # 2^63


def sortable_int64(col: Column) -> Column:
    """Fixed-width (20-digit) string whose lexicographic order equals
    the numeric order of ``col`` over the full signed 64-bit range."""
    shifted = col.cast("decimal(20,0)").cast("decimal(21,0)") + F.lit(
        _OFFSET
    ).cast("decimal(21,0)")
    return F.lpad(shifted.cast("decimal(20,0)").cast("string"), 20, "0")
