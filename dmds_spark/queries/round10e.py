"""Round-10 queries, batch five: entity resolution (blocked
Fellegi–Sunter-style pair scoring with ground truth of record), a
seasonal-naive forecast backtest (the honest baseline every forecast
ships against), and the two negative-mining operators contrastive
embedding training needs (hash-ring random negatives; LSH-bucketed
HARD negatives by exact quantized dot product).

All four oracle-checked: scores and dot products are exact integers,
every rate is one final IEEE division, every top-1 carries a total
order.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dmds_spark.queries import register


# ---------------------------------------------------------------------------
# entity resolution: dirty registry -> blocking -> agreement scoring
# ---------------------------------------------------------------------------

# The customer table is clean, so both engines derive the same DIRTY
# registry: every customer's original record plus, for custkey % 5 = 0,
# a perturbed duplicate (lowercased name, balance shifted by +0.25 — a
# power of two, so the double stays exact). rec_id = custkey*2 (+1 for
# the perturbed twin) keeps ground truth derivable: same entity iff
# rec_id DIV 2 matches.
_DIRTY_DUCK = """
    WITH recs AS (
      SELECT c_custkey * 2 AS rec_id, c_name AS name, c_nationkey AS nat,
             c_acctbal AS acct, c_mktsegment AS seg
      FROM customer
      UNION ALL
      SELECT c_custkey * 2 + 1, lower(c_name), c_nationkey,
             c_acctbal + 0.25, c_mktsegment
      FROM customer WHERE c_custkey % 5 = 0
    ), blocked AS (
      SELECT rec_id, name, nat, acct, seg,
             CAST(regexp_extract(name, '([0-9]+)', 1) AS BIGINT) % 100
               AS blk_digits
      FROM recs
    )
"""

_ER_SCORE = (
    "(CASE WHEN a.name = b.name THEN 2"
    " WHEN lower(a.name) = lower(b.name) THEN 1 ELSE 0 END"
    " + CASE WHEN abs(a.acct - b.acct) < 1.0 THEN 1 ELSE 0 END"
    " + CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END)"
)


@register(
    "entity_resolution_pairs",
    _DIRTY_DUCK
    + f"""
    SELECT a.rec_id AS rec_a, b.rec_id AS rec_b,
           CAST({_ER_SCORE} AS BIGINT) AS score,
           CAST(CASE WHEN a.rec_id // 2 = b.rec_id // 2
                THEN 1 ELSE 0 END AS BIGINT) AS same_entity,
           CAST(CASE WHEN {_ER_SCORE} >= 3 THEN 1 ELSE 0 END AS BIGINT)
             AS predicted_match
    FROM blocked a JOIN blocked b
      ON a.nat = b.nat AND a.blk_digits = b.blk_digits
     AND a.rec_id < b.rec_id
    """,
)
def entity_resolution_pairs(spark, sf_dir):
    """Blocked entity resolution with ground truth of record: block on
    (nation, name-digits mod 100) — duplicates always co-block because
    the perturbation never touches either key — then score every
    in-block pair by field agreement (exact name 2 / case-insensitive
    1, balance within 1.0, segment match) and predict a match at
    score >= 3, the Fellegi–Sunter decision rule with integer weights.
    Emitting (score, same_entity, predicted_match) per pair makes
    precision/recall a downstream GROUP BY, and the blocking recall
    claim auditable (every same_entity pair must appear — the blocking
    key is derived from unperturbed fields).

    Shape at scale: the self-join is a hash join on the FULL blocking
    key (never all-pairs; pair count is sum of block-size-choose-2,
    the classic blocking budget), scoring is a codegen projection.
    Skewed blocks are the known ER failure mode — the digits-mod-100
    component bounds block size by construction here; production
    blocking adds a block-size cap (cap_vertex_degree-style) first."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orig = c.select(
        (F.col("c_custkey") * 2).alias("rec_id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_acctbal").alias("acct"),
        F.col("c_mktsegment").alias("seg"),
    )
    dup = c.filter(F.col("c_custkey") % 5 == 0).select(
        (F.col("c_custkey") * 2 + 1).alias("rec_id"),
        F.lower("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        (F.col("c_acctbal") + 0.25).alias("acct"),
        F.col("c_mktsegment").alias("seg"),
    )
    blocked = orig.unionAll(dup).withColumn(
        "blk_digits",
        F.regexp_extract("name", "([0-9]+)", 1).cast("bigint") % 100,
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    score = F.expr(_ER_SCORE)
    return (
        a.join(
            b,
            (F.col("a.nat") == F.col("b.nat"))
            & (F.col("a.blk_digits") == F.col("b.blk_digits"))
            & (F.col("a.rec_id") < F.col("b.rec_id")),
        )
        .select(
            F.col("a.rec_id").alias("rec_a"),
            F.col("b.rec_id").alias("rec_b"),
            score.cast("bigint").alias("score"),
            (
                F.expr("a.rec_id DIV 2") == F.expr("b.rec_id DIV 2")
            ).cast("bigint").alias("same_entity"),
            (score >= 3).cast("bigint").alias("predicted_match"),
        )
    )


# ---------------------------------------------------------------------------
# seasonal-naive forecast backtest
# ---------------------------------------------------------------------------

_SNAIVE_LAG = 7  # forecast(t) = actual(t - 7 days)


@register(
    "timeseries_backtest_snaive",
    f"""
    WITH bounds AS (
      SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0,
             CAST(MAX(CAST(ts AS DATE)) AS DATE) AS d1
      FROM events
    ), grid AS (
      SELECT e.event_type, CAST(g.d AS DATE) AS day FROM
        (SELECT DISTINCT event_type FROM events) e
        CROSS JOIN (SELECT UNNEST(generate_series(
          (SELECT d0 FROM bounds), (SELECT d1 FROM bounds),
          INTERVAL 1 DAY)) AS d) g
    ), daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), filled AS (
      SELECT g.event_type, g.day, COALESCE(d.n, 0) AS n
      FROM grid g LEFT JOIN daily d
        ON g.event_type = d.event_type AND g.day = d.day
    ), scored AS (
      SELECT event_type, day, n,
             LAG(n, {_SNAIVE_LAG}) OVER (PARTITION BY event_type
                                         ORDER BY day) AS fc
      FROM filled
    )
    SELECT event_type,
           CAST(COUNT(fc) AS BIGINT) AS n_scored,
           CAST(SUM(abs(n - fc)) AS BIGINT) AS sum_abs_err,
           CAST(SUM(CASE WHEN fc IS NOT NULL THEN n END) AS BIGINT)
             AS sum_actual,
           CAST(CAST(SUM(abs(n - fc)) AS DOUBLE) / COUNT(fc) AS DOUBLE)
             AS mae,
           CAST(CASE WHEN SUM(CASE WHEN fc IS NOT NULL THEN n END) > 0
                THEN CAST(SUM(abs(n - fc)) AS DOUBLE)
                     / SUM(CASE WHEN fc IS NOT NULL THEN n END)
                END AS DOUBLE) AS wape
    FROM scored GROUP BY event_type
    """,
)
def timeseries_backtest_snaive(spark, sf_dir):
    """Seasonal-naive backtest: forecast each (event_type, day) count
    with the count {_SNAIVE_LAG} days earlier and report MAE and WAPE
    per type over the dense day grid (missing days count as 0 — a
    forecast baseline that skips quiet days flatters itself). The
    seasonal-naive is THE baseline any forecasting pipeline must beat
    before it earns compute; backtesting it is one window pass, and
    the exact integer error sums make the report oracle-checkable.

    Shape at scale: bounds broadcast; the dense grid is types x days
    (tiny vs the event stream); one daily-count aggregate of the
    stream; one KEYED window (partitioned by type) for the lag. The
    stream is touched once."""
    from dmds_spark.sources.registry import load_events

    e = load_events(spark, sf_dir)
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    filled = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = W.partitionBy("event_type").orderBy("day")
    scored = filled.withColumn("fc", F.lag("n", _SNAIVE_LAG).over(w))
    err = F.sum(F.abs(F.col("n") - F.col("fc")))
    act = F.sum(F.when(F.col("fc").isNotNull(), F.col("n")))
    return scored.groupBy("event_type").agg(
        F.count("fc").cast("bigint").alias("n_scored"),
        err.cast("bigint").alias("sum_abs_err"),
        act.cast("bigint").alias("sum_actual"),
        (err.cast("double") / F.count("fc")).cast("double").alias("mae"),
        F.when(act > 0, err.cast("double") / act)
        .cast("double")
        .alias("wape"),
    )


# ---------------------------------------------------------------------------
# contrastive negative sampling (hash-ring random negatives)
# ---------------------------------------------------------------------------

_NEG_K = 4


@register(
    "sample_contrastive_negatives",
    f"""
    WITH n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
    cand AS (
      SELECT e.vec_id, e.label AS anchor_label, j.j,
             ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || ':' ||
                                 CAST(j.j AS VARCHAR)), 1, 12))::BIGINT
               % (SELECT n_vecs FROM n) AS neg_id
      FROM embeddings e
      CROSS JOIN (SELECT UNNEST(range(0, {_NEG_K})) AS j) j
    )
    SELECT c.vec_id, c.j AS neg_rank, c.neg_id,
           CAST(c.anchor_label AS BIGINT) AS anchor_label,
           CAST(t.label AS BIGINT) AS neg_label
    FROM cand c JOIN embeddings t ON c.neg_id = t.vec_id
    WHERE t.label <> c.anchor_label AND c.neg_id <> c.vec_id
    """,
)
def sample_contrastive_negatives(spark, sf_dir):
    """Deterministic random negatives for contrastive training: each
    anchor draws {_NEG_K} candidates from the hash ring
    (md5(anchor:j) mod corpus size — no RNG, reproducible across
    engines and partitionings, the sampling-family contract) and
    keeps those landing on a DIFFERENT label (rejection-filtered, so
    an anchor keeps ~(1 - 1/n_labels) * {_NEG_K} negatives in
    expectation — the honest budget is emitted, not padded). This is
    the in-batch-negatives replacement when batches are
    hash-sharded: the draw must not depend on partitioning.

    Shape at scale: corpus x {_NEG_K} candidate projection, one hash
    join back to the corpus on neg_id for the label check. The count
    scalar broadcasts; nothing else is global."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()  # bounded scalar: one count for the ring modulus
    js = spark.range(0, _NEG_K).select(F.col("id").alias("j"))
    cand = emb.select("vec_id", F.col("label").alias("anchor_label")).crossJoin(
        F.broadcast(js)
    ).select(
        "vec_id",
        "anchor_label",
        "j",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("vec_id").cast("string"),
                            F.lit(":"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % n
        ).alias("neg_id"),
    )
    t = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
    )
    return (
        cand.join(t, "neg_id")
        .filter(
            (F.col("neg_label") != F.col("anchor_label"))
            & (F.col("neg_id") != F.col("vec_id"))
        )
        .select(
            "vec_id",
            F.col("j").alias("neg_rank"),
            "neg_id",
            F.col("anchor_label").cast("bigint").alias("anchor_label"),
            F.col("neg_label").cast("bigint").alias("neg_label"),
        )
    )


# ---------------------------------------------------------------------------
# hard negatives: LSH-bucketed top-1 by exact quantized dot product
# ---------------------------------------------------------------------------

_HN_BITS = 4      # 16 sign-LSH buckets (production: 12-16 bits)
_HN_SCALE = 1000  # floor(x * 1e3) grid: dot products i64-exact

_HN_SIGN = (
    "(1 - 2 * (('0x' || substr(md5(CAST({b} AS VARCHAR) || ':' ||"
    " CAST({i} AS VARCHAR)), 1, 2))::BIGINT % 2))"
)


@register(
    "similarity_hard_negatives",
    f"""
    WITH q AS (
      SELECT vec_id, label,
             [CAST(floor(CAST(x AS DOUBLE) * {_HN_SCALE}.0) AS BIGINT)
              for x in embedding] AS qv
      FROM embeddings
    ), sigs AS (
      SELECT q.vec_id, b.b,
             list_sum([{_HN_SIGN.format(b='b.b', i='i')} * qv[i]
                       for i in range(1, len(qv) + 1)]) AS s
      FROM q CROSS JOIN (SELECT UNNEST(range(0, {_HN_BITS})) AS b) b
    ), buckets AS (
      SELECT vec_id,
             SUM(CASE WHEN s >= 0 THEN
                   CASE b WHEN 0 THEN 1 WHEN 1 THEN 2
                          WHEN 2 THEN 4 ELSE 8 END
                 ELSE 0 END) AS bucket
      FROM sigs GROUP BY vec_id
    ), keyed AS (
      SELECT q.vec_id, q.label, q.qv, bk.bucket
      FROM q JOIN buckets bk ON q.vec_id = bk.vec_id
    ), pairs AS (
      SELECT a.vec_id, a.label AS anchor_label,
             c.vec_id AS neg_id, c.label AS neg_label,
             list_sum([a.qv[i] * c.qv[i]
                       for i in range(1, len(a.qv) + 1)]) AS dot_q
      FROM keyed a JOIN keyed c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
       AND a.label <> c.label
    ), ranked AS (
      SELECT vec_id, anchor_label, neg_id, neg_label, dot_q,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dot_q DESC, neg_id) AS rn
      FROM pairs
    )
    SELECT vec_id, CAST(anchor_label AS BIGINT) AS anchor_label,
           neg_id, CAST(neg_label AS BIGINT) AS neg_label,
           CAST(dot_q AS BIGINT) AS dot_q
    FROM ranked WHERE rn = 1
    """,
)
def similarity_hard_negatives(spark, sf_dir):
    """HARD negative mining for contrastive training: within each
    sign-LSH bucket ({_HN_BITS} matrix-free random hyperplanes — md5
    parities, same contract as the JL projection), every anchor takes
    the single most-similar differently-labeled vector by EXACT
    quantized dot product (total order: dot desc, neg_id). Hard
    negatives are what make contrastive embeddings sharp; mining them
    corpus-wide without LSH would be the all-pairs matmul this
    bucketing exists to avoid.

    Shape at scale: signature = dims x {_HN_BITS} aggregate; the pair
    generator is an equi-join ON THE BUCKET (explode factor = bucket
    occupancy, never corpus^2); the top-1 is a keyed window. More
    bits at larger corpora hold occupancy flat — the recall/cost knob
    every LSH family here exposes."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.select(
        "vec_id",
        "label",
        F.expr(
            f"transform(embedding, x -> CAST(floor("
            f"CAST(x AS DOUBLE) * {_HN_SCALE}.0) AS BIGINT))"
        ).alias("qv"),
    )
    bs = spark.range(0, _HN_BITS).select(F.col("id").alias("b"))
    sigs = q.crossJoin(F.broadcast(bs)).select(
        "vec_id",
        "b",
        F.expr(
            "aggregate(transform(sequence(1, size(qv)), i ->"
            " (1 - 2*(CAST(conv(substring(md5(CAST(b AS STRING) || ':' ||"
            " CAST(i AS STRING)), 1, 2), 16, 10) AS BIGINT) % 2)) * qv[i-1]),"
            " 0L, (a, v) -> a + v)"
        ).alias("s"),
    )
    buckets = sigs.groupBy("vec_id").agg(
        F.sum(
            F.when(
                F.col("s") >= 0,
                F.expr("CASE b WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END"),
            ).otherwise(0)
        ).alias("bucket")
    )
    keyed = q.join(buckets, "vec_id")
    a = keyed.alias("a")
    c = keyed.alias("c")
    pairs = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") != F.col("c.vec_id"))
        & (F.col("a.label") != F.col("c.label")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.label").alias("anchor_label"),
        F.col("c.vec_id").alias("neg_id"),
        F.col("c.label").alias("neg_label"),
        F.expr(
            "aggregate(zip_with(a.qv, c.qv, (x, y) -> x * y), 0L,"
            " (acc, v) -> acc + v)"
        ).alias("dot_q"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("dot_q").desc(), "neg_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("anchor_label").cast("bigint").alias("anchor_label"),
            "neg_id",
            F.col("neg_label").cast("bigint").alias("neg_label"),
            F.col("dot_q").cast("bigint").alias("dot_q"),
        )
    )
