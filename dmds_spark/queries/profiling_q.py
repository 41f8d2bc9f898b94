"""Data-profiling queries: column statistics and fixed-bound
histograms — the "what's in this table" pass every pipeline runs
before trusting a new 100 TB drop. One scan each, oracle-checked.

Registered after events_q — queued for a later driver window (see
queries/__init__.py ordering); locally gated by tests/test_oracle.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register

_PROF_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")


@register(
    "profile_column_stats",
    " UNION ALL ".join(
        f"""
    SELECT '{c}' AS col_name,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN(CAST({c} AS VARCHAR)) AS VARCHAR) AS min_str,
           CAST(MAX(CAST({c} AS VARCHAR)) AS VARCHAR) AS max_str
    FROM lineitem
    """
        for c in _PROF_COLS
    ),
)
def profile_column_stats(spark, sf_dir):
    """Per-column profile (null count, distinct count, lexical
    min/max) for a representative column set, in long format. Min/max
    are compared as strings so one query shape covers numeric, string
    and timestamp columns in both engines.

    Scale shape: ONE scan for all profiled columns — every per-column
    aggregate lives in a single ``agg`` (the one-row wide result is
    then unpivoted to long format driver-free via explode of structs).
    The previous shape (one unioned single-column aggregate per column)
    paid #cols full passes over the table — at 100 TB that is the
    whole profiling budget. The multi-column COUNT(DISTINCT)s expand
    to the standard Expand + two-phase aggregate (row multiplication
    before the shuffle, but still one scan and partial aggregation).
    At 100 TB pass ``approx=True`` below: approx_count_distinct
    (HyperLogLog++) collapses the Expand entirely; the exact form here
    keeps the oracle bit-exact — nulls/min/max are exact either way.

    Note: timestamps stringify as '2024-01-01 00:00:00' in both Spark
    (date_format) and DuckDB (CAST AS VARCHAR) for this data (whole
    microseconds absent; see events loader for the ns handling).
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return _profile_stats(li, _PROF_COLS)


def _profile_stats(df, cols, approx: bool = False):
    """Single-scan per-column profile over ``cols``. ``approx=True`` is
    the 100 TB path: HyperLogLog++ distinct counts (no Expand, one
    two-phase aggregate).

    Parallelism floor (guide §2.5 input skew): the exact path's
    multi-distinct expands every row 1+#cols ways and the string
    min/max buffers force SortAggregate — an expensive per-row stage
    that would otherwise run on the scan's partition count (ONE task
    for a test-scale single-file table). The floor is a no-op for
    well-split 100 TB sources."""
    from dmds_spark.operators.parallel import ensure_parallelism

    df = ensure_parallelism(df)

    def str_col(c):
        # match DuckDB CAST(ts AS VARCHAR) for timestamps
        dt = dict(df.dtypes)[c]
        if dt == "timestamp":
            return F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss")
        return F.col(c).cast("string")

    nd = F.approx_count_distinct if approx else F.count_distinct
    cnt_exprs = []
    str_exprs = []
    for c in cols:
        cnt_exprs += [
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"__nn_{c}"),
            nd(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
        ]
        str_exprs += [
            F.min(str_col(c)).alias(f"__mn_{c}"),
            F.max(str_col(c)).alias(f"__mx_{c}"),
        ]
    if approx:
        # HLL path: every buffer is fixed-width, one HashAggregate,
        # one scan — the 100 TB shape, unchanged
        wide = df.agg(*cnt_exprs, *str_exprs)
    else:
        # exact path: string min/max buffers force SortAggregate, and
        # fused with the multi-distinct they forced the WHOLE plan to
        # sort the Expand-multiplied rows ((1+#cols) x corpus) by the
        # 5-col dedup key — measured 5.2 s at sf0.1 for a 600k-row
        # table. Split them out: the distinct+null aggregate becomes
        # HashAggregate over the Expand (fixed-width buffers), and the
        # min/max aggregate sort-aggregates with NO grouping key (no
        # sort at all) over the un-expanded scan. The two 1-row results
        # re-attach by the house scalar crossJoin. Costs one extra
        # column-pruned scan; saves sorting (1+#cols) x corpus rows —
        # the right trade at every scale the exact path is used at
        # (the approx branch above stays the single-scan 100 TB path).
        wide = df.agg(*cnt_exprs).crossJoin(df.agg(*str_exprs))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_str"),
                F.col(f"__mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("__s")).select("__s.*")


HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 500_000.0, 20


@register(
    "profile_price_histogram",
    f"""
    SELECT CAST(FLOOR((o_totalprice - {HIST_LO}) /
                      (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS})) AS BIGINT)
             AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    WHERE o_totalprice >= {HIST_LO} AND o_totalprice < {HIST_HI}
    GROUP BY 1
    """,
)
def profile_price_histogram(spark, sf_dir):
    """Fixed-bound 20-bucket histogram of order totals. Bounds are
    literals (no two-pass min/max): both engines evaluate the same
    IEEE-double bucket expression, so bucket assignment is
    bit-identical even at boundaries.

    Scale shape: single scan, map-side partial aggregate into at most
    HIST_BUCKETS groups — the shuffle carries one row per bucket per
    task. The range filter pushes into the parquet scan."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    width = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = F.floor((F.col("o_totalprice") - HIST_LO) / width).cast("bigint")
    return (
        o.filter(
            (F.col("o_totalprice") >= HIST_LO) & (F.col("o_totalprice") < HIST_HI)
        )
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )
