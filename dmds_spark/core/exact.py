"""Exact fixed-point arithmetic helpers — the no-libm discipline
behind every hash-stable metric in this engine (TF-IDF, rational BM25,
LM scores, quality/evaluation ppm): multiply in DECIMAL(38,0) so no
operand ever overflows long, then one integral ``div``. Both engines
floor identically on non-negative operands (DuckDB ``//``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PPM = 1_000_000


def floor_scaled_div(num_sql: str, den_sql: str, scale: int = PPM) -> Column:
    """``floor(num * scale / den)`` exactly: decimal multiply (no long
    overflow at any corpus scale), integral divide. ``num_sql`` /
    ``den_sql`` are SQL expressions (column names or composites —
    composites are parenthesized here, so ``"tp + fp"`` is safe)."""
    return F.expr(
        f"(CAST(({num_sql}) AS DECIMAL(38,0)) * {scale}) div ({den_sql})"
    )
