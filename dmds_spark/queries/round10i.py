"""Round-10 queries, batch nine: SoftDeDup-style duplicate-aware
sampling weights — instead of DELETING near-duplicates (keep-first),
keep every document and down-weight it by its duplicate-cluster size,
so a page crawled 40 times contributes one page's worth of gradient
mass. The soft alternative the hard-dedup family
(dedup_cluster_keep_best et al.) has lacked; pairs with
sample_weighted_quality / tokens_domain_mixture as a sampling-weight
source.

Oracle-checked: the clusters are the same recursive-CTE transitive
closure dedup_cluster_assign certifies, sizes are exact counts, and
the weight is one final IEEE division per doc.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dmds_spark.queries import register
from dmds_spark.queries.llm_dedup import _CLUSTER_SQL


@register(
    "sample_softdedup_weights",
    f"""
    WITH assign AS ({_CLUSTER_SQL})
    SELECT a.doc_id, a.cluster_id,
           CAST(s.n AS BIGINT) AS cluster_size,
           CAST(1.0 / s.n AS DOUBLE) AS weight
    FROM assign a JOIN (
      SELECT cluster_id, COUNT(*) AS n FROM assign GROUP BY cluster_id
    ) s ON a.cluster_id = s.cluster_id
    """,
)
def sample_softdedup_weights(spark, sf_dir):
    """Duplicate-aware sampling weights (the SoftDeDup idea: reweight
    instead of remove): every document gets weight 1/|cluster| where
    clusters are the MinHash near-dup connected components — a
    singleton keeps weight 1.0, a 40-copy template page contributes
    one document's worth of sampling mass spread over its copies.
    Reweighting preserves in-cluster diversity that keep-first
    destroys (the 40 copies may differ in the parts that matter) while
    removing the repetition bias — the knob between "train on
    everything" and hard dedup. Each cluster's total weight is exactly
    1 by construction, so corpus sampling mass = number of distinct
    documents; feed the weight column to sample_weighted_quality-style
    samplers or loss weighting directly.

    Shape at scale: the cluster assignment is the iterative min-label
    propagation (banded candidate pairs only — never all-pairs); the
    size join is self-keyed on cluster_id (AQE co-locates both sides
    on the same exchange). One aggregate + one equi-join on top of the
    assignment the pipeline already computes."""
    from dmds_spark.queries.llm_dedup import dedup_cluster_assign

    assign = dedup_cluster_assign(spark, sf_dir)
    sizes = assign.groupBy("cluster_id").agg(F.count("*").alias("n"))
    return assign.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        F.col("n").cast("bigint").alias("cluster_size"),
        (F.lit(1.0) / F.col("n")).cast("double").alias("weight"),
    )
