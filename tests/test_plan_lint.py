"""Plan-construction cost lint (guide §1.2): py4j round trips during
query BUILD are pure driver latency paid before any row is read.
Round 15's 40 s constant-folding misstep was exactly this — a Column
tree assembled node-by-node in a Python loop — and nothing in the
test suite could have caught it. These tests (a) prove the counter
sees a seeded regression and (b) pin a build budget on the query
families that construct the largest expression trees."""

from pyspark.sql import functions as F

from dmds_spark.core.plan_lint import py4j_call_count
from dmds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def test_counter_catches_seeded_loop_built_tree(spark):
    """A 300-node Column tree built in a Python loop must cost
    hundreds of round trips; the same fold as ONE sql-text expression
    must cost a handful. This is the seeded regression the lint
    exists to flag (and the fix it prescribes)."""
    df = spark.range(1)

    def loop_built():
        col = F.lit(0)
        for i in range(300):
            col = col + F.lit(i)
        df.select(col.alias("s"))

    def sql_text():
        df.select(F.expr("+".join(str(i) for i in range(300))).alias("s"))

    n_loop = py4j_call_count(loop_built)
    n_sql = py4j_call_count(sql_text)
    assert n_loop > 300, f"counter missed the loop tree ({n_loop})"
    assert n_sql < n_loop / 5, (n_sql, n_loop)


def test_heavy_builders_stay_under_budget(spark):
    """Build-time py4j budget for the builders with the biggest
    constant-folded expression trees (PQ codebooks as SQL text, the
    64-slot minhash signature, the unrolled pagerank chain). The
    budget (30k calls ~ low hundreds of ms of socket latency) is 10x
    headroom over their measured cost but far below the 40 s
    pathology (~1M calls) the lint guards against."""
    qs = all_queries()
    for name in (
        "similarity_pq_adc_topk",
        "dedup_minhash_pairs",
        "graph_pagerank",
        "q1_pricing_summary",
    ):
        n = py4j_call_count(lambda: qs[name](spark, SF))
        assert n < 30_000, f"{name} builds with {n} py4j calls"
