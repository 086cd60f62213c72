"""Similarity search over embedding columns (array<float>).

Two tiers:

- ``cosine_topk`` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, one scan, per-query top-k via a rank
  window partitioned by query id. The corpus is never collected; at
  100 TB the scan is embarrassingly parallel and the shuffle is
  bounded by |queries| × k after AQE.
- ``lsh_topk`` — random-hyperplane LSH: deterministic seeded
  hyperplanes, sign-bit bucket per vector, candidates restricted to
  matching buckets (multi-probe over all bands), then exact re-rank.
  Trades recall for a corpus-partition-pruned candidate set.

Math is built-in higher-order functions (functions/vectors.py) —
JVM-side, no Python UDF in the scan path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_distance, norm
from .scale import ensure_min_partitions


def _pair_cosine(qv: str, cv: str, qn: str, cn: str) -> Column:
    """Cosine from a pair's dot product and the two PREcomputed norms
    (one norm per vector instead of one per pair — the norms of an
    N×M scoring job cost N+M instead of 2·N·M). Same expression shape
    as functions.vectors.cosine, so values are identical."""
    d = F.col(qn) * F.col(cn)
    return F.when(d > 0, dot(qv, cv) / d).otherwise(F.lit(0.0))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cosine_sim). Queries are
    broadcast; ranking ties broken by neighbor id for determinism.
    Norms are computed once per vector, not once per pair."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(vec_col).alias("__qn"),
        )
    )
    c = ensure_min_partitions(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        norm(vec_col).alias("__cn"),
    )
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _pair_cosine("__qv", "__cv", "__qn", "__cn").alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(df: DataFrame, vec_col: str, planes: list[list[float]]) -> DataFrame:
    """Sign-bit bucket id from dot products with fixed hyperplanes —
    pure column arithmetic, computed map-side."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(F.col(vec_col), p) > 0).cast("long")
        bucket = bucket + bit * F.lit(2**i).cast("long")
    return df.withColumn("__bucket", bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket
    are scored. With 2^n_planes buckets the candidate set shrinks
    ~2^n_planes×; recall is tunable via n_planes (fewer planes →
    bigger buckets → higher recall)."""
    planes = _hyperplanes(dim, n_planes, seed)
    qb = lsh_bucket(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(vec_col).alias("__qn"),
        ),
        "__qv",
        planes,
    )
    cb = lsh_bucket(
        ensure_min_partitions(corpus.select(id_col, vec_col)).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            norm(vec_col).alias("__cn"),
        ),
        "__cv",
        planes,
    )
    pairs = F.broadcast(qb).join(cb, "__bucket")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", _pair_cosine("__qv", "__cv", "__qn", "__cn").alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Default path buckets by
    LSH first (near-identical vectors share all sign bits with high
    probability) and verifies exactly; ``exact=True`` forces the
    all-pairs O(n²) check (only sane for dimension-sized tables)."""
    src = ensure_min_partitions(df.select(id_col, vec_col)).select(
        id_col, vec_col, norm(vec_col).alias("__n")
    )
    if exact:
        a = src.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), F.col("__n").alias("__na")
        )
        b = src.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), F.col("__n").alias("__nb")
        )
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        bucketed = lsh_bucket(src, vec_col, _hyperplanes(dim, n_planes, seed))
        a = bucketed.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"),
            F.col("__n").alias("__na"), "__bucket",
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"),
            F.col("__n").alias("__nb"), "__bucket",
        )
        pairs = a.join(b, "__bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", _pair_cosine("__va", "__vb", "__na", "__nb").alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def default_centroids(
    corpus: DataFrame, n_centroids: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the first ``n_centroids``
    corpus vectors by id. Production swaps this for Spark ML KMeans
    cluster centers — the IVF plumbing below is agnostic to where the
    centroid table comes from."""
    return corpus.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    n_centroids: int = 8,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) ANN: every corpus vector is assigned to its
    nearest centroid cell (one broadcast pass — the centroid table is
    tiny), each query probes its ``n_probe`` nearest cells, and only
    vectors in probed cells are exactly re-ranked. The classic
    coarse-quantization alternative to ``lsh_topk``: recall is tuned by
    ``n_probe`` instead of plane count, and cell assignment can reuse
    trained centroids.

    At 100 TB the assignment is embarrassingly parallel (broadcast
    nested-loop against a ≤k-row centroid table), the cell id becomes
    the partition/bucket key for the corpus layout, and the probe join
    is an equi-join on cid — never an all-pairs scan.

    Ties in centroid distance break by centroid id; candidate ranking
    ties break by neighbor id — fully deterministic."""
    if centroids is None:
        centroids = default_centroids(corpus, n_centroids, id_col, vec_col)
    cent = F.broadcast(centroids)

    corp = ensure_min_partitions(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(vec_col).alias("__cn"),
    )
    a_dist = l2_distance("__cvec", "cv")
    wa = Window.partitionBy("neighbor_id").orderBy(a_dist.asc(), F.col("cid").asc())
    assigned = (
        corp.crossJoin(cent)
        .withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") == 1)
        .select("neighbor_id", "__cvec", "__cn", "cid")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col).alias("__qn"),
    )
    q_dist = l2_distance("__qv", "cv")
    wq = Window.partitionBy("query_id").orderBy(q_dist.asc(), F.col("cid").asc())
    probes = (
        q.crossJoin(cent)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "__qn", "cid")
    )

    pairs = F.broadcast(probes).join(assigned, "cid")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _pair_cosine("__qv", "__cvec", "__qn", "__cn").alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
