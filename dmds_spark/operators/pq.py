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

import json

from pyspark.sql import Column, DataFrame
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


def _sq_sql(a: str, b: str) -> str:
    """SQL text of the exact i64 squared distance between two grid
    arrays — the string twin of ``_sqdist`` (one exactness contract,
    emitted as text so expressions embedding it per codebook parse in
    ONE py4j call; see ``nearest_code_sql``)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )


def nearest_code_sql(
    books: dict[int, dict[int, list[int]]], s: int, sv_sql: str
) -> str:
    """SQL text of the argmin codeword id for one subvector expression
    against the CONSTANT-FOLDED codewords of subspace ``s``: array_min
    over (dist, index) structs built from ONE ``from_json`` K x sub_w
    matrix literal + ONE ``transform`` — the `_hyperplane_matrix`
    pattern ``kmeans_assign`` documents, taken one step further: the
    whole expression is emitted as SQL TEXT and parsed in one shot,
    because building it through the Column lambda API costs ~0.5 s of
    py4j round trips PER CONSUMER (measured; the per-codeword Literal
    form was worse still — seconds of plan construction). The matrix
    rows follow ascending cid, so least-by-(dist, index) ==
    least-by-(dist, cid) — the same total order as min_by over
    ``_argmin_key`` (distances are non-negative i64) — and a second
    constant array maps the winning index back to its cid (cids can
    be non-contiguous: a Lloyd round drops emptied seeds). Same
    zip_with/left-fold arithmetic as ``_sqdist``."""
    items = sorted(books.get(s, {}).items())
    mat = json.dumps([cw for _c, cw in items])
    cids = json.dumps([int(c) for c, _cw in items])
    return (
        f"element_at(from_json('{cids}', 'array<int>'), "
        f"array_min(transform(from_json('{mat}', 'array<array<bigint>>'), "
        f"(cw, i) -> struct({_sq_sql(sv_sql, 'cw')} AS d, "
        f"CAST(i AS INT) AS i))).i + 1)"
    )


def _codebook_dict(codebooks: DataFrame) -> dict[int, dict[int, list[int]]]:
    """{sub: {cid: codeword}} — M*K rows, driver-side bounded by the
    codebook geometry, never data size. A codebook DataFrame minted by
    :func:`pq_codebooks` carries its rows along (``_dmds_pq_rows``), so
    consumers skip the re-collect job; any other codebook DF (tests,
    the store's persisted pq/v{N}) collects its bounded rows."""
    carried = getattr(codebooks, "_dmds_pq_books", None)
    if carried is not None:
        return carried
    books: dict[int, dict[int, list[int]]] = {}
    for r in codebooks.collect():
        books.setdefault(int(r["sub"]), {})[int(r["cid"])] = [
            int(x) for x in r["qc"]
        ]
    return books


def pq_codebooks(q: DataFrame, dim: int = PQ_DIM) -> DataFrame:
    """(sub, cid, qc): per-subspace codebooks — md5-ordered seed
    slices refined by ONE integer-exact Lloyd round. ``dim`` is the
    vector width (threads through to the subvector slicing).

    EAGER: training runs at DataFrame-construction time (two bounded
    collect() jobs — the seed draw and the M-step), so failures
    surface here, not at the consumer's first action. The returned DF
    carries its bounded rows as a ``_dmds_pq_books`` attribute so
    consumers (:func:`pq_encode`, ADC tables) skip the re-collect;
    transforming/persisting/serializing the DF drops the attribute,
    which only costs the fallback collect in ``_codebook_dict`` —
    results are unchanged.

    Execution shape (optimization round, guide §2.4/§8): the seed draw
    is a TakeOrdered top-K COLLECT (K rows — bounded, the same bounded
    seed collect ``kmeans_assign`` uses); assignment of every
    subvector to its nearest seed is then a pure projection against
    the constant-folded seed codewords — no broadcast join, and no
    groupBy(vec_id, sub) argmin shuffle of the exploded corpus, which
    at 100 TB moved M rows per vector across the cluster; the M-step
    is ONE bounded-key (<= M*K*sub_w = 512 keys) hash aggregate with
    map-side partials whose result is collected (bounded) and
    re-emitted as a LOCAL codebook table. Downstream consumers
    (encode, the ADC table) fold the local rows into their own
    projections, so nothing ever re-runs the training subtree — the
    old localCheckpoint pin has nothing left to pin."""
    if dim % PQ_M != 0:
        raise ValueError(f"dim={dim} not divisible by PQ_M={PQ_M}")
    spark = q.sparkSession
    sub_w = dim // PQ_M
    schema = "sub int, cid int, qc array<bigint>"
    seeds = (
        q.select(
            "qv", F.md5(F.col("vec_id").cast("string")).alias("__mk"),
            "vec_id",
        )
        .orderBy("__mk", "vec_id")
        .limit(PQ_K)
        .collect()
    )
    if not seeds:
        return spark.createDataFrame([], schema)
    books: dict[int, dict[int, list[int]]] = {}
    for cid, row in enumerate(seeds):
        qv = [int(x) for x in row["qv"]]
        for s in range(PQ_M):
            books.setdefault(s, {})[cid] = qv[s * sub_w:(s + 1) * sub_w]
    entries = ", ".join(
        f"struct({s} AS sub, "
        f"{nearest_code_sql(books, s, f'slice(qv, {s * sub_w + 1}, {sub_w})')}"
        f" AS cid, slice(qv, {s * sub_w + 1}, {sub_w}) AS sv)"
        for s in range(PQ_M)
    )
    m = (
        q.select(F.expr(f"explode(array({entries}))").alias("x"))
        .select("x.sub", "x.cid", F.posexplode("x.sv").alias("dim", "qx"))
        .groupBy("sub", "cid", "dim")
        .agg(F.expr("sum(qx) div count(1)").alias("c2"))
        .collect()
    )  # <= M*K*sub_w rows — bounded by the codebook geometry
    byc: dict[tuple[int, int], dict[int, int]] = {}
    for r in m:
        byc.setdefault((int(r["sub"]), int(r["cid"])), {})[
            int(r["dim"])
        ] = int(r["c2"])
    rows = [
        (s, c, [dims[d] for d in range(sub_w)])
        for (s, c), dims in sorted(byc.items())
    ]
    out = spark.createDataFrame(rows, schema)
    # carry the bounded codebook dict on the DF so consumers (encode,
    # ADC tables) skip the re-collect job — see _codebook_dict
    books_out: dict[int, dict[int, list[int]]] = {}
    for s, c, qc in rows:
        books_out.setdefault(s, {})[c] = list(qc)
    out._dmds_pq_books = books_out
    return out


def pq_encode(
    q: DataFrame, codebooks: DataFrame, dim: int = PQ_DIM
) -> DataFrame:
    """(vec_id, sub, code): nearest refined codeword per subspace — a
    pure projection against the constant-folded codebooks (M*K rows,
    bounded collect), exploded to the long grain. No broadcast join
    and no (vec_id, sub) argmin shuffle: encoding is scan work only,
    the same shape the incremental IVF store uses at ingest
    (``_codes_expr``)."""
    if dim % PQ_M != 0:
        raise ValueError(f"dim={dim} not divisible by PQ_M={PQ_M}")
    sub_w = dim // PQ_M
    books = _codebook_dict(codebooks)
    entries = ", ".join(
        f"struct({s} AS sub, "
        f"{nearest_code_sql(books, s, f'slice(qv, {s * sub_w + 1}, {sub_w})')}"
        f" AS code)"
        for s in range(PQ_M)
        if books.get(s)  # inner-join semantics: codebook-less subspaces
        #                  contribute no rows, same as the old join
    )
    if not entries:
        return q.select(
            "vec_id", F.lit(0).alias("sub"), F.lit(0).alias("code")
        ).limit(0)
    return q.select(
        "vec_id", F.expr(f"explode(array({entries}))").alias("x")
    ).select("vec_id", "x.sub", "x.code")


def pq_adc_topk(
    q: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    query_vec_id: int,
    topk: int = 20,
    dim: int = PQ_DIM,
) -> DataFrame:
    """ADC top-k for one query vector already in the corpus: the M*K
    lookup table of (query subvector, codeword) squared distances is
    computed DRIVER-SIDE from the bounded codebooks and the one
    collected query row (exact: Python ints and the i64 fold agree on
    every grid distance — all <= ~1.1e15, far below 2^63), attached
    to the codes by broadcast, summed per vector, TakeOrdered top-k
    by (adc_dist, vec_id). Saves the corpus-scan subtree the old qsub
    side paid just to slice one row."""
    if dim % PQ_M != 0:
        raise ValueError(f"dim={dim} not divisible by PQ_M={PQ_M}")
    sub_w = dim // PQ_M
    books = _codebook_dict(codebooks)
    qrows = (
        q.filter(F.col("vec_id") == query_vec_id).select("qv").collect()
    )  # one row — bounded point lookup
    t_rows = []
    if qrows:
        qv = [int(x) for x in qrows[0]["qv"]]
        t_rows = [
            (s, c,
             sum((qv[s * sub_w + i] - cw[i]) ** 2 for i in range(sub_w)))
            for s in sorted(books)
            for c, cw in sorted(books[s].items())
        ]
    t = q.sparkSession.createDataFrame(
        t_rows, "sub int, code int, td bigint"
    )
    adc = (
        codes.join(F.broadcast(t), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.sum("td").cast("bigint").alias("adc_dist"))
    )
    return adc.orderBy("adc_dist", "vec_id").limit(topk)
