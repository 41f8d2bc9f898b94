"""Round-7 batch ten: spectral embedding health — the dominant
principal component by power iteration (rows-only: one Arrow Gram-
partial pass + a driver-side iteration on the d x d matrix; float
partials are partition-order dependent, so no bit-exact oracle — the
loadings are pinned against numpy's dense eigensolver in tests).
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from dmds_spark.queries import register


@register("embedding_pca_power", None)  # float spectral: rows-only
def embedding_pca_power(spark, sf_dir):
    """Dominant principal component of the embedding table — the
    spectral health view behind whitening, anisotropy checks, and
    compression decisions (a top component explaining most variance
    means the embedding space collapsed toward a line — the classic
    anisotropic-embedding failure). Long format: one row per
    dimension with its loading, plus the shared eigenvalue/explained
    ratio (scalar columns per the driver contract).

    Scale shape (operators/similarity.principal_component): ONE Arrow
    scan emits per-task Gram partials (d + d^2 doubles per task),
    O(tasks) partials fold on the driver, and the power iteration
    runs on the tiny d x d covariance — data volume never touches the
    iteration. Sign fixed by the largest-|loading| convention."""
    from dmds_spark.operators.similarity import principal_component

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eigval, v, explained, n = principal_component(emb, "embedding")
    rows = [
        (i, float(x), float(eigval), float(explained), int(n))
        for i, x in enumerate(v)
    ]
    return spark.createDataFrame(
        rows, ["dim", "loading", "eigenvalue", "explained_ratio", "n_vecs"]
    )
