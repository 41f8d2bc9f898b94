"""Round-14 queries, batch five: market-basket association rules
(support / confidence / lift — the classic co-purchase miner) and the
chi-square test of independence over a contingency table — two staple
analytics families, exact-ppm integer end to end."""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register

_AR_MINSUP = 20   # baskets: rules below this support are noise
_AR_TOPK = 20


@register(
    "basket_association_rules",
    f"""
    WITH b AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS item
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), n1 AS (
      SELECT item, COUNT(*) AS n FROM b GROUP BY item
    ), tot AS (
      SELECT COUNT(DISTINCT o) AS n_baskets FROM b
    ), pairs AS (
      SELECT a.item AS ante, c.item AS cons, COUNT(*) AS n_ab
      FROM b a JOIN b c ON c.o = a.o AND c.item <> a.item
      GROUP BY a.item, c.item
    ), rules AS (
      -- HUGEINT before the products: n_ab * n_baskets * 1e6 passes
      -- 2^63 at ~3e6 baskets (BIGINT would raise here and silently
      -- wrap on the Spark side); 128-bit integral // stays exact
      SELECT p.ante, p.cons, p.n_ab,
             CAST(p.n_ab AS HUGEINT) * 1000000 // na.n AS confidence_ppm,
             CAST(p.n_ab AS HUGEINT) * t.n_baskets * 1000000
               // (CAST(na.n AS HUGEINT) * nc.n) AS lift_ppm
      FROM pairs p
      JOIN n1 na ON na.item = p.ante
      JOIN n1 nc ON nc.item = p.cons
      CROSS JOIN tot t
      WHERE p.n_ab >= {_AR_MINSUP}
    )
    SELECT ante, cons, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(confidence_ppm AS BIGINT) AS confidence_ppm,
           CAST(lift_ppm AS BIGINT) AS lift_ppm
    FROM rules
    ORDER BY lift_ppm DESC, ante, cons
    LIMIT {_AR_TOPK}
    """,
)
def basket_association_rules(spark, sf_dir):
    """Association-rule mining over order baskets (brand grain):
    directed rules ante -> cons with exact-ppm confidence
    (n_ab / n_ante) and lift (n_ab * N / (n_ante * n_cons)), minimum
    support {_AR_MINSUP} baskets, top-20 by lift — the Apriori
    2-itemset pass (Agrawal & Srikant 1994) expressed as one basket
    self-join. Brand vocabulary bounds the rule space at 25*24 pairs.

    Shape at scale: the dim join is size-gated (part is SF-
    proportional — maybe_broadcast); the basket self-join fans out
    per order by its basket size squared (baskets are small by
    construction — the same bounded-fanout argument as wedge_pairs);
    everything after lives on the bounded item-pair grid. Top-k is
    TakeOrdered. Confidence/lift ride decimal(38,0) exact_floordiv
    (n_ab * n_baskets * 1e6 wraps a long past ~3e6 baskets; DuckDB
    twin uses HUGEINT — counts are non-negative so floor == trunc)."""
    from dmds_spark.core.engine import maybe_broadcast
    from dmds_spark.operators.relational import exact_floordiv

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    b = (
        li.join(maybe_broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n1 = b.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    tot = b.agg(F.countDistinct("o").alias("n_baskets"))
    c = b.select(F.col("o").alias("o2"), F.col("item").alias("cons"))
    pairs = (
        b.join(c, (F.col("o2") == F.col("o")) & (F.col("cons") != F.col("item")))
        .groupBy(F.col("item").alias("ante"), "cons")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _AR_MINSUP)
    )
    na = n1.select(F.col("item").alias("ante"), F.col("n").alias("n_a"))
    nc = n1.select(F.col("item").alias("cons"), F.col("n").alias("n_c"))
    rules = (
        pairs.join(F.broadcast(na), "ante")   # bounded: |brands| rows
        .join(F.broadcast(nc), "cons")
        .crossJoin(F.broadcast(tot))
        .select(
            "ante",
            "cons",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            exact_floordiv(
                F.col("n_ab").cast("decimal(38,0)") * F.lit(1_000_000),
                F.col("n_a"),
            ).cast("bigint").alias("confidence_ppm"),
            exact_floordiv(
                F.col("n_ab").cast("decimal(38,0)")
                * F.col("n_baskets") * F.lit(1_000_000),
                F.col("n_a").cast("decimal(38,0)") * F.col("n_c"),
            ).cast("bigint").alias("lift_ppm"),
        )
    )
    return rules.orderBy(
        F.col("lift_ppm").desc(), "ante", "cons"
    ).limit(_AR_TOPK)


@register(
    "profile_chi2_independence",
    """
    WITH o AS (
      SELECT source, lang, COUNT(*) AS obs
      FROM documents GROUP BY source, lang
    ), r AS (SELECT source, SUM(obs) AS rn FROM o GROUP BY source),
    c AS (SELECT lang, SUM(obs) AS cn FROM o GROUP BY lang),
    t AS (SELECT SUM(obs) AS tn FROM o),
    grid AS (
      SELECT r.source, c.lang, COALESCE(o.obs, 0) AS obs, r.rn, c.cn, t.tn
      FROM r CROSS JOIN c CROSS JOIN t
      LEFT JOIN o ON o.source = r.source AND o.lang = c.lang
    ), cells AS (
      -- HUGEINT, not DECIMAL: DuckDB's // is exact integral division
      -- only for integer types (DECIMAL operands route through
      -- floating division and drift in the last ulp — measured as a
      -- 41-ppm chi2 difference on this very query)
      SELECT (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
             * (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
             * 1000000
             // (CAST(tn AS HUGEINT) * rn * cn) AS chi2_cell_ppm
      FROM grid
    )
    SELECT CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_cols,
           CAST(((SELECT COUNT(*) FROM r) - 1)
                * ((SELECT COUNT(*) FROM c) - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(chi2_cell_ppm AS BIGINT)) AS BIGINT) AS chi2_ppm
    FROM cells
    """,
)
def profile_chi2_independence(spark, sf_dir):
    """Pearson chi-square test of independence over the (source, lang)
    contingency table — the categorical-drift test that complements
    the KS test (profile_ks_drift) for discrete columns. Exact by
    cross-multiplication: each cell contributes
    floor((obs*T - R*C)^2 * 1e6 / (T*R*C)) — the classic
    (O - E)^2 / E with E = R*C/T cleared of fractions by multiplying
    through by T (per-cell floors stated identically in both
    engines), DECIMAL(38,0) so the squared products never overflow.
    Includes zero cells (expected > 0, observed 0 — they contribute).

    Shape at scale: one corpus aggregate to the contingency grid;
    the grid (|sources| x |langs|) and its margins are broadcast-sized
    forever; the statistic is a 1-row rollup."""
    from dmds_spark.operators.relational import exact_floordiv

    from dmds_spark.core.engine import materialize

    # the contingency table (|sources| x |langs| rows) has four
    # consumers (margins, total, the grid join): one corpus aggregate
    o = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("obs"))
        .transform(materialize)
    )
    r = o.groupBy("source").agg(F.sum("obs").alias("rn"))
    c = o.groupBy("lang").agg(F.sum("obs").alias("cn"))
    t = o.agg(F.sum("obs").alias("tn"))
    grid = (
        r.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(t))
        .join(o, ["source", "lang"], "left")
        .select(
            "source", "lang", "rn", "cn", "tn",
            F.coalesce("obs", F.lit(0)).alias("obs"),
        )
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    diff = dec("obs") * F.col("tn") - dec("rn") * F.col("cn")
    cell = exact_floordiv(
        diff * diff * F.lit(1_000_000),
        dec("tn") * F.col("rn") * F.col("cn"),
    ).cast("bigint")
    cells = grid.select(cell.alias("chi2_cell_ppm"))
    nr = r.agg(F.count(F.lit(1)).alias("n_rows"))
    ncl = c.agg(F.count(F.lit(1)).alias("n_cols"))
    return (
        cells.agg(F.sum("chi2_cell_ppm").cast("bigint").alias("chi2_ppm"))
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(ncl))
        .select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_cols").cast("bigint").alias("n_cols"),
            ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
            .cast("bigint").alias("dof"),
            "chi2_ppm",
        )
    )


@register(
    "profile_cramers_v2",
    """
    WITH o AS (
      SELECT source, lang, COUNT(*) AS obs
      FROM documents GROUP BY source, lang
    ), r AS (SELECT source, SUM(obs) AS rn FROM o GROUP BY source),
    c AS (SELECT lang, SUM(obs) AS cn FROM o GROUP BY lang),
    t AS (SELECT SUM(obs) AS tn FROM o),
    grid AS (
      SELECT r.source, c.lang, COALESCE(o.obs, 0) AS obs, r.rn, c.cn, t.tn
      FROM r CROSS JOIN c CROSS JOIN t
      LEFT JOIN o ON o.source = r.source AND o.lang = c.lang
    ), cells AS (
      SELECT (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
             * (CAST(obs AS HUGEINT) * tn - CAST(rn AS HUGEINT) * cn)
             * 1000000
             // (CAST(tn AS HUGEINT) * rn * cn) AS chi2_cell_ppm
      FROM grid
    ), chi AS (
      SELECT SUM(CAST(chi2_cell_ppm AS BIGINT)) AS chi2_ppm FROM cells
    ), dims AS (
      SELECT (SELECT COUNT(*) FROM r) AS nr, (SELECT COUNT(*) FROM c) AS nc
    )
    SELECT CAST(d.nr AS BIGINT) AS n_rows, CAST(d.nc AS BIGINT) AS n_cols,
           CAST(x.chi2_ppm AS BIGINT) AS chi2_ppm,
           CAST(x.chi2_ppm // (t.tn * LEAST(d.nr - 1, d.nc - 1))
                AS BIGINT) AS cramers_v2_ppm
    FROM chi x, dims d, t
    """,
)
def profile_cramers_v2(spark, sf_dir):
    """Cramér's V-squared — the [0,1] effect size that makes chi-square
    statistics comparable across table shapes and corpus sizes
    (Cramér 1946): V^2 = chi2 / (T * min(r-1, c-1)). Emitted squared
    (a sqrt is libm; V^2 orders identically and is the quantity the
    bias-corrected variants start from), exact by floor-dividing the
    already-ppm chi2 by the integer denominator. A drift monitor
    alerts on V^2, not raw chi2 — chi2 grows linearly with T even at
    constant association.

    Shape at scale: identical to profile_chi2_independence (one corpus
    aggregate, broadcast-sized grid) plus two integer scalars."""
    from dmds_spark.core.engine import materialize
    from dmds_spark.operators.relational import exact_floordiv

    o = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("obs"))
        .transform(materialize)
    )
    r = o.groupBy("source").agg(F.sum("obs").alias("rn"))
    c = o.groupBy("lang").agg(F.sum("obs").alias("cn"))
    t = o.agg(F.sum("obs").alias("tn"))
    grid = (
        r.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(t))
        .join(o, ["source", "lang"], "left")
        .select(
            "rn", "cn", "tn", F.coalesce("obs", F.lit(0)).alias("obs")
        )
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    diff = dec("obs") * F.col("tn") - dec("rn") * F.col("cn")
    cell = exact_floordiv(
        diff * diff * F.lit(1_000_000),
        dec("tn") * F.col("rn") * F.col("cn"),
    ).cast("bigint")
    chi = grid.select(cell.alias("x")).agg(
        F.sum("x").cast("bigint").alias("chi2_ppm")
    )
    nr = r.agg(F.count(F.lit(1)).alias("nr"))
    nc = c.agg(F.count(F.lit(1)).alias("nc"))
    return (
        chi.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(t))
        .select(
            F.col("nr").cast("bigint").alias("n_rows"),
            F.col("nc").cast("bigint").alias("n_cols"),
            "chi2_ppm",
            F.expr("chi2_ppm div (tn * LEAST(nr - 1, nc - 1))")
            .cast("bigint").alias("cramers_v2_ppm"),
        )
    )
