"""Product quantization (PQ) — the memory-compression half of the
classic IVF+PQ ANN stack (the IVF half lives in
operators/incremental_ivf.py): split each vector into M contiguous
subspaces, learn a small per-subspace codebook, and store each vector
as M small codes. Asymmetric-distance (ADC) search then scores a
candidate from a per-query lookup table of (query subvector x
codebook) distances — M table lookups + adds per candidate instead of
a D-dim dot product, the standard billion-scale serving trick
(Jegou et al., "Product Quantization for Nearest Neighbor Search").

EXACT end to end, like embedding_kmeans_assign: coordinates quantize
to the floor(x*1e6)+2^22 integer grid, seeds are the smallest
md5(vec_id) draws via a TakeOrdered top-k (never a corpus-wide
window), ONE Lloyd round refines each subspace codebook with integer
floor-means, and every distance/argmin uses the zero-padded
(dist, code) tie-break — so codebooks, codes, and ADC rankings are
i64-exact and the whole pipeline hash-matches an unrolled DuckDB
restatement.

Scale shape (billions of vectors): subvector explode is a per-row
scan (M rows per vector, arrays of D/M); every assignment joins the
corpus side against a BROADCAST codebook (M*K rows); the M-step is
one (sub, code, dim) hash aggregate; ADC attaches a broadcast M*K
lookup table and reduces with one hash aggregate + TakeOrdered top-k.
The corpus is never shuffled except by the M-step's bounded-key
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

PQ_SCALE = 1_000_000
PQ_OFF = 4_194_304  # +2^22: all grid values positive, so Spark's
#                     truncating `div` and DuckDB's flooring `//`
#                     agree on every mean (same trick as kmeans)
PQ_M = 4            # subspaces
PQ_K = 8            # codes per subspace
PQ_DIM = 64
PQ_SUB = PQ_DIM // PQ_M


def _argmin_key(dist: str = "dist", code: str = "cid"):
    """Zero-padded (dist, code) total-order key: dist <= 16*(2*2^22)^2
    ~ 1.1e15 < 10^20, so the 20-char pad never truncates."""
    return F.concat(
        F.lpad(F.col(dist).cast("string"), 20, "0"),
        F.lpad(F.col(code).cast("string"), 4, "0"),
    )


def quantized(emb: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, qv): the exact integer grid every PQ stage works on."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({vec_col}, x -> CAST(floor("
            f"CAST(x AS DOUBLE) * {PQ_SCALE}.0) AS BIGINT) + {PQ_OFF})"
        ).alias("qv"),
    )


def subvectors(q: DataFrame, dim: int = PQ_DIM) -> DataFrame:
    """(vec_id, sub, sv): M rows per vector, sv = the sub'th D/M-wide
    slice. A per-row explode — no shuffle. ``dim`` must be the actual
    vector width (codebook width and code/ADC slice width must agree —
    a mismatch makes zip_with pad nulls and every distance NULL)."""
    if dim % PQ_M != 0:
        raise ValueError(f"dim={dim} not divisible by PQ_M={PQ_M}")
    sub_w = dim // PQ_M
    return q.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("qv", s * sub_w + 1, sub_w).alias("sv"),
                    )
                    for s in range(PQ_M)
                ]
            )
        ).alias("x"),
    ).select("vec_id", "x.sub", "x.sv")


def _sqdist(a: str = "sv", b: str = "qc"):
    """Exact i64 squared distance between two grid-array columns.
    Built lazily: F.expr needs an active SparkContext, and this module
    is imported by the query registry before any session exists in
    some harnesses (pytest collection). ONE definition — every PQ
    distance (assignment, encoding, the ADC table) must share the
    same exactness contract."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )


def pq_codebooks(q: DataFrame, dim: int = PQ_DIM) -> DataFrame:
    """(sub, cid, qc): per-subspace codebooks — md5-ordered seed
    slices refined by ONE integer-exact Lloyd round. The seed draw is
    TakeOrderedAndProject (per-partition top-K heap); the only window
    renumbers the <= K surviving seed rows. ``dim`` is the vector
    width (threads through to the subvector slicing)."""
    seeds = (
        q.select(
            "vec_id", "qv",
            F.md5(F.col("vec_id").cast("string")).alias("__mk"),
        )
        .orderBy("__mk", "vec_id")
        .limit(PQ_K)
    )
    seed_rows = seeds.select(
        (F.row_number().over(W.orderBy("__mk", "vec_id")) - 1).alias("cid"),
        "qv",
    )
    sseeds = subvectors(
        seed_rows.select(F.col("cid").alias("vec_id"), "qv"), dim=dim
    ).select(F.col("vec_id").alias("cid"), "sub", F.col("sv").alias("qc"))

    subs = subvectors(q, dim=dim)
    d1 = subs.join(F.broadcast(sseeds), "sub").select(
        "vec_id", "sub", "sv", "cid", _sqdist().alias("dist")
    )
    a1 = d1.groupBy("vec_id", "sub").agg(
        F.min_by("cid", _argmin_key()).alias("cid"),
        F.first("sv").alias("sv"),
    )
    m = (
        a1.select("sub", "cid", F.posexplode("sv").alias("dim", "qx"))
        .groupBy("sub", "cid", "dim")
        .agg(F.expr("sum(qx) div count(1)").alias("c2"))
    )
    from dmds_spark.core.engine import materialize

    return (
        m.groupBy("sub", "cid")
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "c2"))).alias("__p")
        )
        .select(
            "sub",
            "cid",
            F.transform(F.col("__p"), lambda p: p["c2"]).alias("qc"),
        )
        # M*K rows, consumed by encode AND the ADC table: pin them so
        # neither consumer re-runs the seed+Lloyd subtree
        .transform(materialize)
    )


def pq_encode(
    q: DataFrame, codebooks: DataFrame, dim: int = PQ_DIM
) -> DataFrame:
    """(vec_id, sub, code): nearest refined codeword per subspace —
    one broadcast join + one argmin aggregate."""
    d2 = subvectors(q, dim=dim).join(F.broadcast(codebooks), "sub").select(
        "vec_id", "sub", "cid", _sqdist().alias("dist")
    )
    return d2.groupBy("vec_id", "sub").agg(
        F.min_by("cid", _argmin_key()).alias("code")
    )


def pq_adc_topk(
    q: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    query_vec_id: int,
    topk: int = 20,
    dim: int = PQ_DIM,
) -> DataFrame:
    """ADC top-k for one query vector already in the corpus: build the
    M*K lookup table of (query subvector, codeword) distances, attach
    it to the codes by broadcast, sum per vector, TakeOrdered top-k
    by (adc_dist, vec_id)."""
    qsub = subvectors(
        q.filter(F.col("vec_id") == query_vec_id), dim=dim
    ).select("sub", F.col("sv").alias("qsv"))
    t = codebooks.join(F.broadcast(qsub), "sub").select(
        "sub",
        F.col("cid").alias("code"),
        _sqdist("qsv", "qc").alias("td"),
    )
    adc = (
        codes.join(F.broadcast(t), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("td").cast("bigint").alias("adc_dist"))
    )
    return adc.orderBy("adc_dist", "vec_id").limit(topk)
