"""Graph building blocks shared by the analytics queries (wedge
enumeration behind common-neighbor link prediction, triangle counting,
clustering coefficients) — plus the HUB MITIGATION those queries'
docstrings promise at 100 TB, made real here: a deterministic
per-vertex degree cap applied BEFORE any self-join.

Wedge joins fan out as degree^2 of the shared endpoint. On real
bipartite graphs (customers x items, users x pages) the degree
distribution is heavy-tailed, so one hub vertex can dominate the
entire shuffle: a customer with 1e6 edges contributes 5e11 wedges on
its own. The standard mitigation is to cap each shared-endpoint
vertex at its top-k edges (deterministically, so reruns agree),
accept the bounded approximation on hub vertices, and keep exact
results everywhere the degree is below the cap — which on a
heavy-tailed graph is almost everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cap_vertex_degree(
    edges: DataFrame,
    vertex_col: str,
    other_col: str,
    cap: int,
) -> DataFrame:
    """Deterministically keep at most ``cap`` edges per
    ``vertex_col`` vertex: rank edges by the md5 of both endpoints (a
    stable uniform order — NOT the neighbor id order, which would bias
    the kept sample toward low ids) and keep rank <= cap. Exact
    pass-through for every vertex with degree <= cap.

    md5 over "vertex,other", not xxhash64: both engines compute the
    identical lowercase-hex digest (DuckDB ``md5(c || ',' || s)``), so
    the capped edge SAMPLE — not just its statistical properties — is
    oracle-checkable; Spark's xxhash64 has no DuckDB twin. The digest
    is computed once per edge before the window; the uniform-order and
    undercount-only properties are unchanged.

    Shape: one window over the vertex key — fan-in equals that
    vertex's degree, which is exactly the quantity being bounded, and
    the WindowGroupLimit rank pushdown stops materializing a hub's
    edge list beyond the cap."""
    from pyspark.sql import Window as W

    w = W.partitionBy(vertex_col).orderBy(
        F.md5(F.concat_ws(
            ",",
            F.col(vertex_col).cast("string"),
            F.col(other_col).cast("string"),
        )),
        F.col(other_col),  # total order under hash collisions
    )
    return (
        edges.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def wedge_pairs(
    edges: DataFrame,
    vertex_col: str,
    other_col: str,
    degree_cap: int | None = None,
) -> DataFrame:
    """All (other_a < other_b) pairs sharing a ``vertex_col`` endpoint
    — the wedge enumeration behind common-neighbor counting — with the
    optional degree cap applied first. Input must already be
    deduplicated to the edge SET (callers .distinct() after building
    from fact tables).

    Returns (shared, a, b). Per-vertex fan-out is min(degree, cap)^2;
    with a cap the worst-case shuffle is cap^2 x #vertices regardless
    of how skewed the degree distribution is."""
    e = edges.select(
        F.col(vertex_col).alias("shared"), F.col(other_col).alias("a")
    )
    if degree_cap is not None:
        e = cap_vertex_degree(e, "shared", "a", degree_cap)
    t2 = e.select(F.col("shared").alias("shared2"), F.col("a").alias("b"))
    return (
        e.join(
            t2,
            (F.col("shared") == F.col("shared2"))
            & (F.col("a") < F.col("b")),
        )
        .select("shared", "a", "b")
    )


def common_neighbor_counts(
    edges: DataFrame,
    vertex_col: str,
    other_col: str,
    degree_cap: int | None = None,
) -> DataFrame:
    """(a, b, common) — number of shared ``vertex_col`` endpoints per
    (a, b) pair; the link-prediction score table. With ``degree_cap``,
    a LOWER BOUND of the exact count that is exact wherever every
    shared endpoint's degree is below the cap (undercount only —
    capping drops wedges, never invents them)."""
    return (
        wedge_pairs(edges, vertex_col, other_col, degree_cap)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
