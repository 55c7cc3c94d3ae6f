"""Vector similarity over the ``embeddings`` table (array<float>).

Beyond-reference surface (SURVEY.md north star): approximate-nearest-
neighbor search and embedding-based near-dup detection.

Design:
- ``cosine``            — pure JVM expression (zip_with + aggregate in
                          DOUBLE); bit-compatible with DuckDB's
                          ``list_cosine_similarity`` on DOUBLE[] since
                          both reduce in index order.
- ``brute_force_topk``  — broadcast the (small) query set against the
                          corpus; per-query top-k via ranked window.
                          Exact baseline; O(|Q| * N) but embarrassingly
                          parallel and shuffle-light (one shuffle on
                          query_id for the window).
- ``lsh_topk``          — random-hyperplane LSH: sign-bit bucket as the
                          blocking key, search within bucket (+ optional
                          multi-probe). The 100 TB path: candidate count
                          per query drops from N to N / 2^bits.
- ``cosine_near_dup_pairs`` — all pairs above a cosine threshold,
                          LSH-blocked.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision, index-order reduction."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is the small side by construction);
    similarity is computed JVM-side; ranking shuffles once on query_id.
    Ties broken by neighbor id for full determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-bit LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = 1 iff dot(vec, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, lit_plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        bucket = bucket.bitwiseOR(bit)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_planes: int = 4,
    probe_hamming: int = 1,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with multi-probe random-hyperplane LSH.

    Each query probes its own bucket plus every bucket within hamming
    distance ``probe_hamming`` (query side explodes into its probe set,
    keeping the corpus join a pure equi-join on the bucket key). With
    ``n_planes=4, probe_hamming=1`` that is 5/16 of the corpus per
    query — a 3x candidate cut that keeps usable recall even on
    near-uniform vectors (where angular LSH is weakest; on real
    clustered embeddings the same setup prunes far harder).

    At 100 TB: bucket is a partition key — corpus pre-bucketed and
    bucket-pruned scans replace the broadcast join entirely.
    """
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    # probe set: all bucket ids within hamming distance of the query's
    probe_masks = [0]
    if probe_hamming >= 1:
        probe_masks += [1 << i for i in range(n_planes)]
    if probe_hamming >= 2:
        probe_masks += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("__b"),
    ).select(
        "query_id",
        "q_vec",
        F.explode(
            F.array(*[F.col("__b").bitwiseXOR(F.lit(m)) for m in probe_masks])
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding-based near-dup).

    Exact all-pairs within the frame — callers block first (LSH bucket
    or label) at scale; kept exact here so the DuckDB oracle can verify
    values.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
