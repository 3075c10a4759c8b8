"""Similarity search over embedding columns (SURVEY §2C C29).

Brute-force cosine top-k is the correctness baseline: broadcast the (small)
query set against the full corpus — linear in corpus size, never a corpus ×
corpus cross join. The scale path is random-hyperplane LSH bucketing: corpus
and queries hash to sign-pattern buckets; only same-bucket (plus probe-adjacent)
pairs are scored.

All arithmetic casts float32 → float64 first and folds in index order, so
DuckDB and Spark agree to well below the 6-decimal oracle rounding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    """Cosine similarity of two array<double> columns via higher-order fns —
    JVM-side, sequential fold (deterministic order)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(embeddings: DataFrame, n_queries: int = 10,
                     k: int = 5) -> DataFrame:
    """C29 baseline: exact top-k cosine neighbors for the first `n_queries`
    vectors. The query side is broadcast; ranking tie-breaks on neighbor id."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    q = emb.filter(F.col("vec_id") < n_queries) \
        .select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"))
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("qvec"), F.col("vec")), 6).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rn")
    )


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """C29c: all pairs above a cosine threshold. Exact form for the oracle —
    the corpus self-join is acceptable at test scale; `lsh_topk` is the
    production path."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
                F.round(_cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _lsh_bucket(vec, planes: list[list[float]]):
    """Sign-pattern bucket id from fixed hyperplanes (deterministic)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(vec, plane, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _fixed_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency in the
    executor path; generated once on the driver and baked into the plan)."""
    state = 42
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def ivf_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
             n_cells: int = 16, n_probe: int = 4) -> DataFrame:
    """C29 scale path #2: IVF (inverted-file) ANN. The corpus partitions into
    `n_cells` Voronoi cells around centroid vectors; a query scores only the
    `n_probe` cells whose centroids are nearest, so the scored fraction is
    ~n_probe/n_cells of the corpus regardless of corpus size.

    Centroids here are the first `n_cells` corpus vectors (deterministic seed
    pick — a production build would run k-means refinement; the partition/
    probe/score plumbing is identical). Cell assignment is dense linear
    algebra — exactly the case where an Arrow-batched numpy matmul beats
    per-element column expressions — so it runs as a vectorized pandas UDF:
    one (batch × dim) @ (dim × n_cells) product per Arrow batch, centroids
    closure-captured (the Spark analog of a broadcast dictionary). The
    corpus shuffles once on cell id at index-build time; queries touch
    n_probe buckets.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    cents = np.array(
        [r["vec"] for r in
         emb.filter(F.col("vec_id") < n_cells).orderBy("vec_id").collect()])
    # argmax of cosine == argmax of dot with L2-normalized centroids
    cnorm_t = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T

    @F.pandas_udf("long")
    def best_cell(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        return pd.Series(np.argmax(m @ cnorm_t, axis=1))

    @F.pandas_udf("array<long>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        order = np.argsort(-(m @ cnorm_t), axis=1, kind="stable")
        return pd.Series(list(order[:, :n_probe]))

    # index build: corpus → (cell, vec); at scale this materializes bucketed
    corpus = emb.select("vec_id", "vec", best_cell(F.col("vec")).alias("cell"))

    # query side: top n_probe cells each, exploded to (query, probe_cell)
    q = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"),
                F.explode(probe_cells(F.col("vec"))).alias("qcell"))
    )

    @F.pandas_udf("double")
    def pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        ma, mb = np.vstack(a.to_numpy()), np.vstack(b.to_numpy())
        dots = np.einsum("ij,ij->i", ma, mb)
        return pd.Series(np.round(
            dots / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)),
            6))

    pairs = corpus.join(F.broadcast(q),
                        (F.col("cell") == F.col("qcell"))
                        & (F.col("vec_id") != F.col("query_id")))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        pair_cosine(F.col("qvec"), F.col("vec")).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rn")
    )


def lsh_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
             n_planes: int = 4, dim: int = 64) -> DataFrame:
    """C29 scale path: random-hyperplane LSH. Corpus and queries bucket by sign
    pattern; only same-bucket pairs are scored, then per-query top-k.

    Approximate (recall < 1) — registered as a rows-only check; pytest measures
    recall against brute_force_topk.
    """
    planes = _fixed_planes(n_planes, dim)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    bucketed = emb.withColumn("bucket", _lsh_bucket(F.col("vec"), planes))
    q = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"),
        F.col("bucket").alias("qbucket"))
    pairs = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        F.round(_cosine(F.col("qvec"), F.col("vec")), 6).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rn")
    )
