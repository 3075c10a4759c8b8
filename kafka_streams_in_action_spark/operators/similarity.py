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


def contrastive_triplets(embeddings: DataFrame,
                         n_anchors: int = 20) -> DataFrame:
    """C29r: contrastive TRIPLET mining — the (anchor, positive, negative)
    generator a contrastive-embedding trainer (SimCSE/InfoNCE-style)
    consumes. For each anchor: the positive is its exact top-1 cosine
    neighbor (broadcast anchors against the corpus — linear, one pass; at
    100 TB the ANN index substitutes via the shared ranking tail), and
    the negative is a DETERMINISTIC pseudo-random corpus pick: h =
    FNV-1a(anchor_id || ':neg') mod n, linear-probed (+1, +2 mod n) past
    collisions with the anchor or positive — two ids can collide with at
    most two of three candidates, so the probe always lands. Every step
    is the engine-portable fold + integer arithmetic, so anchor, positive,
    negative AND both cosines replay bit-for-bit in DuckDB (FULL oracle);
    margin_ok = pos_sim > neg_sim is the trainability property a
    data-quality gate would alert on. vec_ids are contiguous 0..n-1 in
    this corpus (asserted by the oracle join reproducing every row)."""
    from .sampling import fnv32_column

    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    n_df = emb.agg(F.count(F.lit(1)).alias("n"))
    top1 = (brute_force_topk(embeddings, n_queries=n_anchors, k=1)
            .select(F.col("query_id").alias("anchor_id"),
                    F.col("neighbor_id").alias("pos_id"),
                    F.col("cosine_sim").alias("pos_sim")))
    h = F.pmod(fnv32_column(
        F.concat(F.col("anchor_id").cast("string"), F.lit(":neg"))),
        F.col("n"))
    cand = [F.pmod(h + F.lit(j), F.col("n")) for j in range(3)]
    neg = (F.when((cand[0] != F.col("anchor_id"))
                  & (cand[0] != F.col("pos_id")), cand[0])
           .when((cand[1] != F.col("anchor_id"))
                 & (cand[1] != F.col("pos_id")), cand[1])
           .otherwise(cand[2]))
    t = (top1.crossJoin(F.broadcast(n_df))
         .select("anchor_id", "pos_id", "pos_sim", neg.alias("neg_id")))
    with_vecs = (
        emb.select(F.col("vec_id").alias("anchor_id"),
                   F.col("vec").alias("avec"))
        .join(F.broadcast(t), "anchor_id")
        .join(F.broadcast(
            emb.select(F.col("vec_id").alias("neg_id"),
                       F.col("vec").alias("nvec"))
            .join(F.broadcast(t.select("neg_id").distinct()), "neg_id")),
            "neg_id"))
    return with_vecs.select(
        "anchor_id", "pos_id", "pos_sim", "neg_id",
        F.round(_cosine(F.col("avec"), F.col("nvec")), 6).alias("neg_sim"),
        (F.col("pos_sim")
         > F.round(_cosine(F.col("avec"), F.col("nvec")), 6))
        .alias("margin_ok"))


def ann_recall_verdict(approx: DataFrame, exact: DataFrame,
                       min_recall: float) -> DataFrame:
    """Oracle-checkable verdict for an approximate top-k path (the
    c4_approx_* pattern): the approximate answer set joins the in-query
    exact reference, and the single output row carries (a) the exact result
    count — which DuckDB recomputes independently with its own brute-force
    top-k, a real cross-engine check — and (b) verdict booleans the oracle
    emits as literal TRUE: the approximate path returned a full answer set,
    and its recall against exact is above the pinned bound. The exact
    reference is cheap — `n_queries` broadcast vectors against the corpus,
    linear in corpus size — so the verdict adds one corpus pass, never an
    all-pairs structure."""
    hit = exact.select("query_id", "neighbor_id").withColumn("hit", F.lit(1))
    stats = (
        approx.select("query_id", "neighbor_id")
        .join(hit, ["query_id", "neighbor_id"], "left")
        .agg(F.count(F.lit(1)).alias("n_results"),
             F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return stats.crossJoin(n_exact).select(
        "n_exact",
        (F.col("n_results") == F.col("n_exact")).alias("count_ok"),
        (F.col("n_hits") >= F.lit(min_recall) * F.col("n_exact"))
        .alias("recall_ok"),
    )


def lsh_topk_verdict(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                     min_recall: float = 0.55) -> DataFrame:
    """c29_lsh_ann in verdict form: multi-table LSH top-k vs brute force on
    the same queries. min_recall matches the pytest pin (measured 0.72 at
    sf0.01 defaults)."""
    return ann_recall_verdict(
        lsh_topk(embeddings, n_queries=n_queries, k=k),
        brute_force_topk(embeddings, n_queries=n_queries, k=k),
        min_recall)


def ivf_topk_verdict(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
                     min_recall: float = 0.7) -> DataFrame:
    """c29_ivf_ann in verdict form: IVF (4-of-16 probes, Lloyd-refined)
    top-k vs brute force. min_recall matches the pytest pin (measured 0.92
    at sf0.01 defaults)."""
    return ann_recall_verdict(
        ivf_topk(embeddings, n_queries=n_queries, k=k),
        brute_force_topk(embeddings, n_queries=n_queries, k=k),
        min_recall)


def cosine_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.35,
                          n_blocks: int = 8) -> DataFrame:
    """C29c: ALL pairs above a cosine threshold, as a blocked distributed
    matmul (exact — every pair is scored).

    For a permissive threshold like 0.35 there is no sublinear exact method —
    the O(n²) *compute* is intrinsic — but the plan shape matters at scale:
    the corpus splits into `n_blocks` hash blocks, each of the
    n_blocks·(n_blocks+1)/2 block PAIRS becomes one cogroup task, and each
    task scores its |Bi|×|Bj| tile as ONE numpy matmul (BLAS over Arrow
    batches). Replication is ~n_blocks/2 × the embedding table, moved by
    shuffle — no BroadcastNestedLoopJoin over the full corpus, no per-row
    Python. Tune n_blocks ≈ √(desired tasks) as the corpus grows.

    Candidate tiles use an epsilon-padded threshold; survivors (a tiny set)
    are re-scored JVM-side with the engine's sequential fold so the reported
    cosine stays bitwise-deterministic across engines — matmul only decides
    candidacy, where the threshold margin dwarfs summation-order noise.

    For realistic near-dup thresholds (≥0.8) use `cosine_near_dup_lsh`,
    which prunes candidates sub-quadratically at bounded recall.
    """
    spark = embeddings.sparkSession
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    blocked = emb.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)))
    tiles = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "ba int, bb int")
    left = blocked.join(F.broadcast(tiles), F.col("blk") == F.col("ba")) \
        .select("ba", "bb", "vec_id", "vec")
    # distinct column names on the right side — the two cogroup inputs share
    # lineage, and identically-named columns are ambiguous to the analyzer
    right = blocked.join(F.broadcast(tiles), F.col("blk") == F.col("bb")) \
        .select(F.col("ba").alias("rba"), F.col("bb").alias("rbb"),
                F.col("vec_id").alias("rvec_id"), F.col("vec").alias("rvec"))

    def score_tile(key, l, r):
        import numpy as np
        import pandas as pd
        if l.empty or r.empty:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64")})
        A = np.vstack(l["vec"].to_numpy())
        B = np.vstack(r["rvec"].to_numpy())
        A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        # Candidate pad must exceed the final filter's round-to-6 quantum
        # (5e-7) plus matmul summation noise: a pair with true cosine in
        # [threshold - 5e-7, threshold) still rounds UP into the kept set,
        # so excluding it at candidacy would diverge from the oracle. The
        # exact JVM-side rescore prunes the extra false positives.
        ia, ib = np.nonzero(A @ B.T >= threshold - 1e-6)
        va = l["vec_id"].to_numpy()[ia]
        vb = r["rvec_id"].to_numpy()[ib]
        if key[0] == key[1]:          # same-block tile: S is symmetric
            keep = va < vb
            va, vb = va[keep], vb[keep]
        return pd.DataFrame({"vec_a": np.minimum(va, vb),
                             "vec_b": np.maximum(va, vb)})

    cand = (
        left.groupBy("ba", "bb").cogroup(right.groupBy("rba", "rbb"))
        .applyInPandas(score_tile, "vec_a long, vec_b long")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va_vec"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb_vec"))
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b",
                F.round(_cosine(F.col("va_vec"), F.col("vb_vec")), 6)
                .alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_near_dup_lsh(embeddings: DataFrame, threshold: float = 0.35,
                        n_planes: int = 4, n_tables: int = 8,
                        dim: int = 64) -> DataFrame:
    """C29c scale path: near-dup pairs with LSH-pruned candidate generation —
    `n_tables` independent hyperplane sets; a pair is a candidate if it
    collides in ANY table; candidates are verified with the exact JVM-fold
    cosine. Sub-quadratic (per-bucket posting lists only), recall < 1 —
    pinned against the exact blocked form in pytest. The false-negative rate
    falls as (1 - p^b)^L; raise n_tables for higher recall."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    tables = []
    for t in range(n_tables):
        planes = _fixed_planes(n_planes, dim, seed=42 + 101 * t)
        tables.append(F.struct(
            F.lit(t).alias("tbl"),
            _lsh_bucket(F.col("vec"), planes).alias("bucket")))
    bucketed = emb.select(
        "vec_id", F.explode(F.array(*tables)).alias("tb")
    ).select("vec_id", "tb.tbl", "tb.bucket")
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cand = (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va_vec"))
    vb = emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb_vec"))
    return (
        cand.join(va, "vec_a").join(vb, "vec_b")
        .select("vec_a", "vec_b",
                F.round(_cosine(F.col("va_vec"), F.col("vb_vec")), 6)
                .alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def reingest_dup_pairs(embeddings: DataFrame, n_planted: int = 50,
                       id_offset: int = 100000,
                       threshold: float = 0.99) -> DataFrame:
    """C29c in LSH's FAVORABLE regime: duplicate-reingest detection.

    The scenario a 100 TB pipeline actually LSH-dedups: a batch of documents
    is re-ingested under new ids and must be caught against the corpus. Here
    the first `n_planted` vectors re-enter with shifted ids; near-dup =
    cosine ≥ 0.99. At that threshold hyperplane LSH is decisive (identical
    vectors produce identical sign patterns, so every true duplicate
    collides in EVERY table — recall is deterministically 1.0 — while
    random pairs collide in a 256-bucket table ~0.4% of the time), which is
    why this registration carries a full DuckDB oracle, unlike the
    permissive-threshold regime where `cosine_near_dup_pairs`' blocked
    matmul is the right tool (measured at 10×: exact 11 s vs LSH 52 s at
    threshold 0.35 — see SCALE.md)."""
    planted = (embeddings.filter(F.col("vec_id") < n_planted)
               .withColumn("vec_id", F.col("vec_id") + F.lit(id_offset)))
    return cosine_near_dup_lsh(embeddings.union(planted),
                               threshold=threshold,
                               n_planes=8, n_tables=4)


def semdedup_pairs(embeddings: DataFrame, threshold: float = 0.35,
                   n_cells: int = 8, n_assign: int = 2,
                   refine_iters: int = 2) -> DataFrame:
    """C29f: SemDeDup-style semantic dedup (Abbas et al., arXiv:2303.09540):
    k-means-cluster the embedding space, then find near-duplicate pairs ONLY
    within each cluster — the approximation that makes semantic dedup
    tractable at corpus scale, because the quadratic term shrinks from n² to
    Σ|cluster|² and each cluster's tile is one BLAS matmul in one task.

    Each vector lands in its `n_assign` nearest cells (multi-assignment —
    the same trade as IVF's n_probe): pairs split by the single-best-cell
    boundary still meet in a shared second-choice cell. Cost is an
    n_assign× larger index; measured recall at the 0.35 threshold rises
    from ~0.4 (n_assign=1) to ~0.8 (n_assign=2) on the sf0.01 corpus.

    Reuses the IVF index build (deterministic seeds + Lloyd refinement) for
    the clustering, so an engine that maintains an ANN index gets semantic
    dedup almost for free. Same bitwise-determinism contract as
    cosine_near_dup_pairs: the matmul only nominates candidates (epsilon-
    padded), survivors re-score with the JVM sequential fold; pairs that
    co-occur in two shared cells dedupe at candidate granularity (distinct
    on the id pair) before the exact rescore.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    cents = build_ivf_centroids(embeddings, n_cells, refine_iters)
    cnorm_t = (cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)).T

    @F.pandas_udf("array<long>")
    def assign_cells(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())
        order = np.argsort(-(m @ cnorm_t), axis=1, kind="stable")
        return pd.Series(list(order[:, :n_assign]))

    corpus = emb.select(
        "vec_id", "vec", F.explode(assign_cells(F.col("vec"))).alias("cell"))

    def cell_pairs(pdf):
        M = np.vstack(pdf["vec"].to_numpy())
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        ia, ib = np.nonzero(M @ M.T >= threshold - 1e-6)
        va = pdf["vec_id"].to_numpy()[ia]
        vb = pdf["vec_id"].to_numpy()[ib]
        keep = va < vb
        return pd.DataFrame({"vec_a": va[keep], "vec_b": vb[keep]})

    cand = corpus.groupBy("cell").applyInPandas(
        cell_pairs, "vec_a long, vec_b long").distinct()
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("vec").alias("va_vec"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb_vec"))
    return (
        cand.join(a, "vec_a").join(b, "vec_b")
        .select("vec_a", "vec_b",
                F.round(_cosine(F.col("va_vec"), F.col("vb_vec")), 6)
                .alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def semdedup_verdict(embeddings: DataFrame, threshold: float = 0.35,
                     n_cells: int = 8, min_recall: float = 0.5) -> DataFrame:
    """c29_semdedup in oracle-checkable verdict form (the c4_approx_*
    pattern): run the within-cluster path AND the exact all-pairs reference
    over the same corpus, reduce to one hash-matched row.

    - n_exact_pairs — DuckDB recomputes it independently with its own
      all-pairs cosine CTE (real cross-engine signal);
    - precision_ok — every within-cluster pair exists in the exact set with
      an identical rounded cosine (cluster restriction can only DROP pairs,
      never invent them, and both paths end in the same JVM rescore);
    - recall_ok — the cluster restriction retains at least `min_recall` of
      the exact pairs (pytest pins the measured value; the SemDeDup
      trade-off made explicit instead of silent).
    """
    sem = semdedup_pairs(embeddings, threshold=threshold, n_cells=n_cells) \
        .withColumnRenamed("cosine_sim", "c_sem")
    exact = cosine_near_dup_pairs(embeddings, threshold=threshold) \
        .withColumnRenamed("cosine_sim", "c_exact")
    m = sem.join(exact, ["vec_a", "vec_b"], "left")
    stats = m.agg(
        F.count(F.lit(1)).alias("n_sem"),
        F.sum(F.when(F.col("c_exact").isNotNull()
                     & (F.col("c_exact") == F.col("c_sem")), 1)
              .otherwise(0)).alias("n_valid"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    return stats.crossJoin(n_exact).select(
        "n_exact_pairs",
        (F.col("n_valid") == F.col("n_sem")).alias("precision_ok"),
        (F.col("n_sem") >= F.lit(min_recall) * F.col("n_exact_pairs"))
        .alias("recall_ok"),
    )


def random_projection(embeddings: DataFrame, out_dim: int = 8,
                      in_dim: int = 64, seed: int = 1042) -> DataFrame:
    """C29h: Johnson-Lindenstrauss random projection — reduce the embedding
    dimension with a fixed pseudo-random matrix so downstream ANN / dedup
    passes pay out_dim/in_dim of the compute at a bounded distance
    distortion. The standard first stage before clustering or IVF at
    corpus scale (and the cheap alternative to PCA when a data-dependent
    basis isn't worth a training pass).

    The projection matrix comes from the same driver-side LCG as the LSH
    planes (seeded, engine-independent) and is baked into the plan as
    literals — the oracle regenerates the identical matrix from the same
    formula, so this is a FULL-oracle operator, not a verdict form. Each
    output coordinate is a sequential left-to-right fold over zip_with
    (JVM codegen, deterministic order), scaled by 1/sqrt(out_dim); both
    engines run the same IEEE ops in the same order, so values match
    bitwise before the final 6-decimal round. Shuffle-free row-local
    projection: the plan is a scan + project, nothing else.
    """
    planes = _fixed_planes(out_dim, in_dim, seed=seed)
    vec = F.col("embedding").cast("array<double>")
    # uniform(-1,1) weights have variance 1/3, so sqrt(3/k) (not 1/sqrt(k),
    # which is the unit-variance-Gaussian scale) makes E‖y‖² = ‖x‖²
    inv = (3.0 / float(out_dim)) ** 0.5
    cols = [
        F.round(F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(w) for w in row]),
                       lambda x, r: x * r),
            F.lit(0.0), lambda acc, x: acc + x) * F.lit(inv), 6)
        .alias(f"p{j}")
        for j, row in enumerate(planes)]
    return embeddings.select("vec_id", *cols)


def random_projection_sql(out_dim: int = 8, in_dim: int = 64,
                          seed: int = 1042) -> str:
    """DuckDB twin of random_projection: the same LCG matrix inlined as list
    literals, the same sequential fold (list_reduce over a seeded prepend,
    matching _cosine_sql's fold shape), the same final scale + round."""
    planes = _fixed_planes(out_dim, in_dim, seed=seed)
    inv = (3.0 / float(out_dim)) ** 0.5
    cols = []
    for j, row in enumerate(planes):
        lits = "[" + ", ".join(repr(w) for w in row) + "]"
        fold = (f"list_reduce(list_prepend(0.0, "
                f"list_transform(range(1, {in_dim} + 1), "
                f"i -> v[i] * ({lits})[i])), (acc, x) -> acc + x)")
        cols.append(f"round({fold} * {inv!r}, 6) AS p{j}")
    sel = ",\n               ".join(cols)
    return f"""
        WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id,
               {sel}
        FROM emb
        """


def projection_select_sql(out_dim: int = 8, in_dim: int = 64,
                          seed: int = 1042) -> str:
    """The projection column list alone (same LCG matrix / fold / scale as
    random_projection_sql), for embedding into a larger oracle query whose
    source CTE provides (vec_id, v)."""
    planes = _fixed_planes(out_dim, in_dim, seed=seed)
    inv = (3.0 / float(out_dim)) ** 0.5
    cols = []
    for j, row in enumerate(planes):
        lits = "[" + ", ".join(repr(w) for w in row) + "]"
        fold = (f"list_reduce(list_prepend(0.0, "
                f"list_transform(range(1, {in_dim} + 1), "
                f"i -> v[i] * ({lits})[i])), (acc, x) -> acc + x)")
        cols.append(f"round({fold} * {inv!r}, 6) AS p{j}")
    return ",\n               ".join(cols)


def pca_train(embeddings: DataFrame, n_components: int = 8
              ) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """C29i index build: distributed PCA via one Gramian pull.

    A single mapInPandas pass emits per-batch partials (count, Σx, Σxxᵀ) as
    fixed-point int64, so the cross-batch reduce is order-insensitive.
    Note the quantization happens on the float64 BATCH sums (m.sum, m.T@m),
    so the rounded partials — and hence mean/covariance — can shift at the
    last-ulp level if Arrow batch boundaries change; determinism holds
    within the 1e-9/1e-6 quantization tolerance, not bit-exactly under
    repartitioning (per-element pre-quantization would buy that, at the
    cost of an extra pass over every batch); the driver
    reduces the bounded partial set (≤ partitions rows of dim+dim² longs),
    forms the covariance C = Σxxᵀ/n − μμᵀ, and eigendecomposes dim×dim —
    the classic "covariance pull" that scales to any corpus size because
    nothing quadratic in n ever materializes. Components are
    sign-normalized (largest-|coefficient| coordinate positive) so the
    basis is deterministic under eigenvector sign ambiguity.

    Returns (mean, components[k × dim], explained_variance_ratio[k]).
    """
    emb = embeddings.select(F.col("embedding").cast("array<double>").alias("vec"))
    dim = len(emb.first()["vec"])

    def partials(batches):
        for pdf in batches:
            m = np.vstack(pdf["vec"].to_numpy())
            yield pd.DataFrame({
                "n": [m.shape[0]],
                "vsum": [np.rint(m.sum(axis=0) * 1e9)
                         .astype(np.int64).tolist()],
                # Σxxᵀ quantized per-batch: batch sums are exact in float64
                # well below 2^53, and the int64 reduce is associative
                "osum": [np.rint((m.T @ m).ravel() * 1e6)
                         .astype(np.int64).tolist()],
            })

    rows = emb.mapInPandas(
        partials, "n long, vsum array<long>, osum array<long>").collect()
    n = sum(r["n"] for r in rows)
    vsum = np.sum([np.asarray(r["vsum"], dtype=np.int64) for r in rows],
                  axis=0) / 1e9
    osum = np.sum([np.asarray(r["osum"], dtype=np.int64) for r in rows],
                  axis=0).reshape(dim, dim) / 1e6
    mu = vsum / n
    cov = osum / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(len(order)),
                         np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    ratio = evals[order] / evals.sum()
    return mu, comps, ratio


def pca_project_verdict(embeddings: DataFrame, n_components: int = 8,
                        min_var: float = 0.1) -> DataFrame:
    """c29_pca in oracle-checkable verdict form. The eigenbasis is
    data-dependent (no closed form DuckDB could replicate), so the verdict
    row carries the checks that pin the math:

    - n_components / n_rows — structural facts DuckDB re-asserts;
    - orthonormal_ok — WᵀW = I to 1e-9 (driver-side, deterministic);
    - var_ok — the retained eigenvalues capture ≥ min_var of total
      variance (the reason to run PCA at all);
    - recon_ok — a DISTRIBUTED residual pass verifies, on the actual
      corpus, that mean reconstruction error / mean centered norm equals
      1 − captured variance to quantization tolerance — the Pythagorean
      identity the projection must satisfy; this is the check that would
      catch a broken projection, not just a broken eigensolve.

    The numeric components themselves are pinned against numpy PCA in
    pytest (tests/test_quality.py) — same data, exact comparison to
    fixed-point tolerance.
    """
    mu, comps, ratio = pca_train(embeddings, n_components)
    orthonormal_ok = bool(
        np.abs(comps @ comps.T - np.eye(len(comps))).max() < 1e-9)
    captured = float(ratio.sum())
    mu_b, w_b = mu, comps

    @F.pandas_udf("struct<res: double, cen: double>")
    def residuals(vecs: pd.Series) -> pd.DataFrame:
        m = np.vstack(vecs.to_numpy()) - mu_b
        proj = m @ w_b.T
        res = ((m - proj @ w_b) ** 2).sum(axis=1)
        cen = (m ** 2).sum(axis=1)
        return pd.DataFrame({"res": res, "cen": cen})

    emb = embeddings.select(F.col("embedding").cast("array<double>").alias("vec"))
    agg = (emb.select(residuals(F.col("vec")).alias("r"))
           .select(F.floor(F.col("r.res") * 1e6 + 0.5).cast("long").alias("res"),
                   F.floor(F.col("r.cen") * 1e6 + 0.5).cast("long").alias("cen"))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("res").alias("res_sum"), F.sum("cen").alias("cen_sum")))
    return agg.select(
        F.lit(n_components).cast("long").alias("n_components"),
        F.col("n_rows"),
        F.lit(orthonormal_ok).alias("orthonormal_ok"),
        F.lit(captured >= min_var).alias("var_ok"),
        (F.abs(F.lit(1.0) - F.col("res_sum").cast("double")
               / F.col("cen_sum").cast("double") - F.lit(captured))
         < F.lit(1e-3)).alias("recon_ok"),
    )


def quantize_embeddings_int8(embeddings: DataFrame) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the storage
    layout large ANN corpora actually keep vectors in (4× smaller than
    float32, int8-SIMD dot products; the IVF/LSH paths above probe it
    unchanged because argmax survives per-vector scaling).

    Per vector: scale = max|x|/127; q_i = floor(x_i/scale + 0.5) — explicit
    half-up rounding in pure IEEE ops (divide, add, floor), which DuckDB
    executes bitwise-identically, unlike the engines' differing round()
    tie-breaks. Emitted per vector and hash-matched cross-engine: the
    rounded scale, the exact integer checksum of the codes (order-
    insensitive), the max |code|, and a range verdict |q| ≤ 127 (floor of
    127.5 is exactly 127, so a violation means broken scale math). All
    column algebra — one projection, no shuffle, no Python."""
    v = F.col("embedding").cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    base = embeddings.select("vec_id", v.alias("v"), amax.alias("amax"))
    scale = F.col("amax") / F.lit(127.0)
    q = F.when(
        F.col("amax") == 0,
        F.transform(F.col("v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(F.col("v"),
                    lambda x: F.floor(x / scale + F.lit(0.5)).cast("long")))
    qabs_max = F.array_max(F.transform(q, lambda x: F.abs(x)))
    return base.select(
        "vec_id",
        F.round(scale, 6).alias("q_scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x)
        .alias("q_checksum"),
        qabs_max.alias("q_max"),
        (qabs_max <= 127).alias("range_ok"),
    )


def quantized_dedup_reingest(embeddings: DataFrame,
                             n_planted: int = 50) -> DataFrame:
    """C29j: exact dedup in the quantized domain — group vectors by their
    int8 code sequence (the same symmetric quantization as
    quantize_embeddings_int8). Re-ingested duplicate vectors quantize to
    byte-identical codes, so matching on the code string is the cheap
    first dedup pass an int8-serving ANN corpus gets for free: one keyed
    shuffle on a 32-char hash of the codes, no distance computation at
    all. (Near-duplicates that differ below quantization resolution can
    also collide — at int8 that's the desired "same vector for retrieval
    purposes" equivalence.)

    Reingest regime (same as the LSH/MinHash reingest twins): the first
    `n_planted` vectors re-enter with shifted ids; every planted pair must
    land in a ≥2-member group, deterministically — which makes the
    full-oracle group structure non-vacuous on the synthetic corpus."""
    aug = embeddings.select("vec_id", "embedding").unionAll(
        embeddings.filter(F.col("vec_id") < n_planted)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    v = F.col("embedding").cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    base = aug.select("vec_id", v.alias("v"), amax.alias("amax"))
    scale = F.col("amax") / F.lit(127.0)
    q = F.when(
        F.col("amax") == 0,
        F.transform(F.col("v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(F.col("v"),
                    lambda x: F.floor(x / scale + F.lit(0.5)).cast("long")))
    code = F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))))
    return (
        base.select("vec_id", code.alias("code_hash"))
        .groupBy("code_hash")
        .agg(F.min("vec_id").alias("keep_vec_id"),
             F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )


def build_pq_codebooks(embeddings: DataFrame, m: int = 8, k: int = 16,
                       dim: int = 64,
                       refine_iters: int = 1) -> "np.ndarray":
    """C29l index build: product-quantization codebooks — the vector is cut
    into `m` subvectors and each subspace gets its own `k`-centroid
    codebook, so a 64-dim float32 vector stores as m log2(k) = 32 bits
    (64× compression) and a corpus scan reads codes, not floats. This is
    the memory-compressed ANN regime (FAISS's PQ/IVFPQ shape) that
    complements the IVF (cell-pruned) and LSH (bucket-pruned) paths.

    Seeds are the first `k` corpus subvectors per subspace (deterministic,
    same contract as the IVF build), refined with Lloyd iterations run as
    ONE distributed pass for all m subspaces together (the per-batch
    partial-sum pattern of _lloyd_refine, keyed by (subspace, centroid)).
    Returns codebooks[m, k, dim/m].
    """
    sub = dim // m
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    seed_rows = (emb.filter(F.col("vec_id") < k).orderBy("vec_id")
                 .select("vec").collect())
    seeds = np.array([r["vec"] for r in seed_rows])  # k × dim
    # train/encode/scan all operate on L2-normalized vectors so the PQ L2
    # ordering equals the cosine ordering the exact reference uses
    seeds = seeds / np.maximum(
        np.linalg.norm(seeds, axis=1, keepdims=True), 1e-12)
    books = np.stack([seeds[:, j * sub:(j + 1) * sub] for j in range(m)])

    for _ in range(refine_iters):
        books_b = books

        def partials(batches):
            for pdf in batches:
                x = np.vstack(pdf["vec"].to_numpy())          # b × dim
                x = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                out = {"sp": [], "cent": [], "n": [], "vsum": []}
                for j in range(m):
                    xs = x[:, j * sub:(j + 1) * sub]          # b × sub
                    d = ((xs[:, None, :] - books_b[j][None, :, :]) ** 2) \
                        .sum(axis=2)
                    a = np.argmin(d, axis=1)
                    for c in np.unique(a):
                        sel = xs[a == c]
                        out["sp"].append(j)
                        out["cent"].append(int(c))
                        out["n"].append(int(sel.shape[0]))
                        out["vsum"].append(
                            np.rint(sel * 1e9).astype(np.int64)
                            .sum(axis=0).tolist())
                yield pd.DataFrame(out)

        rows = emb.select("vec").mapInPandas(
            partials, "sp long, cent long, n long, vsum array<long>") \
            .collect()
        sums = np.zeros((m, k, sub), dtype=np.int64)
        counts = np.zeros((m, k), dtype=np.int64)
        for r in rows:
            sums[r["sp"], r["cent"]] += np.asarray(r["vsum"], dtype=np.int64)
            counts[r["sp"], r["cent"]] += r["n"]
        nz = counts > 0
        books = books.copy()
        books[nz] = sums[nz] / counts[nz][:, None] / 1e9
    return books


def pq_topk(embeddings: DataFrame, n_queries: int = 10, k_nn: int = 5,
            m: int = 8, k: int = 16, rerank: int = 50,
            codebooks: "np.ndarray | None" = None) -> DataFrame:
    """C29l scale path: asymmetric-distance PQ top-k. Corpus vectors encode
    once to m sub-codes; each query builds an m × k lookup table of exact
    subvector distances, and a corpus row's approximate distance is m
    table lookups — no float math per row at scan time, which is why PQ
    scans beat float scans by the compression factor at memory-bound
    corpus sizes. The ADC shortlist (rerank per query) is then re-scored
    exactly — the production PQ pattern.

    Encode + scan run as Arrow-batched pandas UDFs with the codebooks
    closure-captured (the broadcast-dictionary analog)."""
    books = codebooks if codebooks is not None \
        else build_pq_codebooks(embeddings, m=m, k=k)
    sub = books.shape[2]
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))

    @F.pandas_udf("array<long>")
    def encode(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((x.shape[0], m), dtype=np.int64)
        for j in range(m):
            xs = x[:, j * sub:(j + 1) * sub]
            d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    corpus = emb.select("vec_id", encode(F.col("vec")).alias("codes"))
    q = (emb.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("vec").alias("qvec")))

    @F.pandas_udf("double")
    def adc(qvecs: pd.Series, codes: pd.Series) -> pd.Series:
        qx = np.vstack(qvecs.to_numpy())
        qx = qx / np.maximum(
            np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
        cx = np.vstack(codes.to_numpy()).astype(np.int64)
        out = np.zeros(len(qx))
        for j in range(m):
            qs = qx[:, j * sub:(j + 1) * sub]
            tab = ((qs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out += tab[np.arange(len(qx)), cx[:, j]]
        return pd.Series(out)

    scored = (corpus.join(F.broadcast(q),
                          F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      adc(F.col("qvec"), F.col("codes")).alias("adist")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist"), F.col("neighbor_id"))
    shortlist = (scored.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= rerank)
                 .select("query_id", "neighbor_id"))
    # exact re-rank of the ADC shortlist — the production PQ pattern: the
    # compressed scan cuts the corpus to `rerank` candidates per query
    # (~rerank/n of the data), then float vectors are fetched for the
    # shortlist ONLY and scored exactly. On unstructured (near-random)
    # corpora ADC-only ranking shuffles true neighbors badly (measured
    # recall <0.5 here); with re-rank at 10× k_nn it recovers to ~0.9.
    return _exact_rerank(shortlist, emb, q.select("query_id", "qvec"), k_nn)


def _exact_rerank(shortlist: DataFrame, emb: DataFrame, qvec: DataFrame,
                  k_nn: int) -> DataFrame:
    """Exact cosine re-scoring of a per-query candidate shortlist: float
    vectors are fetched for the shortlist ONLY (a keyed join on vec_id,
    ~rerank/n of the corpus), queries broadcast, final top-k per query.
    Shared tail of the PQ and IVF-PQ scan paths."""
    nvec = emb.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("vec").alias("nvec"))
    rescored = (shortlist.join(nvec, "neighbor_id")
                .join(F.broadcast(qvec), "query_id")
                .select("query_id", "neighbor_id",
                        F.round(_cosine(F.col("qvec"), F.col("nvec")), 6)
                        .alias("cosine_sim")))
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (rescored.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= k_nn)
            .select("query_id", "neighbor_id", "cosine_sim", "rn"))


def ivfpq_topk(embeddings: DataFrame, n_queries: int = 10, k_nn: int = 5,
               n_cells: int = 16, n_probe: int = 4, m: int = 8, k: int = 16,
               rerank: int = 50, refine_iters: int = 2,
               centroids: "np.ndarray | None" = None,
               codebooks: "np.ndarray | None" = None) -> DataFrame:
    """C29n: composed IVF-PQ ANN — the architecture that actually serves
    billion-vector search (FAISS IndexIVFPQ, no-residual variant): the IVF
    coarse quantizer prunes the scan to ~n_probe/n_cells of the corpus,
    and within the probed cells the scan reads m log2(k)-bit PQ codes
    instead of float vectors, so scan cost drops by BOTH factors
    multiplicatively (here 4/16 of the rows × 64× smaller payload ≈ 256×
    less data touched than a float brute force). The ADC shortlist is then
    re-scored exactly on floats fetched for the shortlist only.

    Index build = the two existing bounded builds (Lloyd-refined IVF
    centroids + one-pass PQ codebooks), each collecting only k×dim-scale
    partials. Corpus encode is ONE Arrow-batched pass emitting
    (cell, codes) per vector — at scale this is the bucketed, compressed
    index a reindex job materializes once and every query batch reuses.
    Codebooks are global (shared across cells), not per-residual: on
    L2-normalized corpora the no-residual variant loses little recall and
    keeps the codebook pull a single m×k×sub array.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    cents = centroids if centroids is not None else build_ivf_centroids(
        embeddings, n_cells, refine_iters)
    books = codebooks if codebooks is not None \
        else build_pq_codebooks(embeddings, m=m, k=k)
    sub = books.shape[2]
    # epsilon-guarded norms throughout (a zero vector must yield cell 0 /
    # code 0 / distance 0, never NaN) — same guard as ivf_incremental's
    # best_cell UDF.
    cnorm_t = (cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)).T

    @F.pandas_udf("struct<cell:long, codes:array<long>>")
    def cell_and_codes(vecs: pd.Series) -> pd.DataFrame:
        x = np.vstack(vecs.to_numpy())
        cell = np.argmax(x @ cnorm_t, axis=1)
        xn = x / np.maximum(
            np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((x.shape[0], m), dtype=np.int64)
        for j in range(m):
            xs = xn[:, j * sub:(j + 1) * sub]
            d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d, axis=1)
        return pd.DataFrame({"cell": cell, "codes": list(codes)})

    corpus = (emb.select("vec_id", cell_and_codes(F.col("vec")).alias("cc"))
              .select("vec_id", F.col("cc.cell").alias("cell"),
                      F.col("cc.codes").alias("codes")))

    @F.pandas_udf("array<long>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        x = np.vstack(vecs.to_numpy())
        order = np.argsort(-(x @ cnorm_t), axis=1, kind="stable")
        return pd.Series(list(order[:, :n_probe]))

    q = (emb.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("vec").alias("qvec"),
                 F.explode(probe_cells(F.col("vec"))).alias("qcell")))

    @F.pandas_udf("double")
    def adc(qvecs: pd.Series, codes: pd.Series) -> pd.Series:
        qx = np.vstack(qvecs.to_numpy())
        qx = qx / np.maximum(
            np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
        cx = np.vstack(codes.to_numpy()).astype(np.int64)
        out = np.zeros(len(qx))
        for j in range(m):
            qs = qx[:, j * sub:(j + 1) * sub]
            tab = ((qs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out += tab[np.arange(len(qx)), cx[:, j]]
        return pd.Series(out)

    scored = (corpus.join(F.broadcast(q),
                          (F.col("cell") == F.col("qcell"))
                          & (F.col("vec_id") != F.col("query_id")))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      adc(F.col("qvec"), F.col("codes")).alias("adist")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist"), F.col("neighbor_id"))
    shortlist = (scored.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= rerank)
                 .select("query_id", "neighbor_id"))
    return _exact_rerank(
        shortlist, emb,
        q.select("query_id", "qvec").dropDuplicates(["query_id"]), k_nn)


def ivfpq_topk_verdict(embeddings: DataFrame, n_queries: int = 10,
                       k_nn: int = 5, min_recall: float = 0.6) -> DataFrame:
    """c29_ivfpq_ann in verdict form (the c4_approx_* pattern): composed
    IVF-PQ top-k vs brute force on the same queries; raw recall pinned in
    pytest. See ivfpq_topk for the scan mechanics."""
    return ann_recall_verdict(
        ivfpq_topk(embeddings, n_queries=n_queries, k_nn=k_nn),
        brute_force_topk(embeddings, n_queries=n_queries, k=k_nn),
        min_recall)


def pq_topk_verdict(embeddings: DataFrame, n_queries: int = 10, k_nn: int = 5,
                    m: int = 8, k: int = 16, rerank: int = 50,
                    min_recall: float = 0.5) -> DataFrame:
    """c29_pq_ann in verdict form (the c4_approx_* pattern): the verdict
    row carries the exact brute-force count (DuckDB recomputes it
    independently) and the recall floor; raw recall stays pinned in
    pytest. See pq_topk for the scan mechanics."""
    approx = pq_topk(embeddings, n_queries=n_queries, k_nn=k_nn,
                     m=m, k=k, rerank=rerank) \
        .select("query_id", "neighbor_id")
    exact = brute_force_topk(embeddings, n_queries=n_queries, k=k_nn)
    return ann_recall_verdict(approx, exact, min_recall)


def embedding_outliers(embeddings: DataFrame,
                       z_threshold: float = 2.0) -> DataFrame:
    """C29k: embedding-space outlier filter — flag vectors whose distance
    from the corpus centroid is more than `z_threshold` standard deviations
    above the mean distance. The cheap screen for corrupt/degenerate
    samples (zero vectors, encoding failures, off-manifold junk) a
    training pipeline runs before clustering or dedup.

    Everything is exact and engine-replicable, so this is a FULL-oracle
    operator: the corpus mean comes from micro-quantized integer sums
    (order-insensitive), per-vector distance is the engine's sequential
    fold, and the distance moments quantize the same way. Two scans + two
    1-row reduces — no shuffle wider than a scalar, any corpus size.
    """
    dec = "decimal(38,0)"
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    dim = 64  # declared schema dim (FIXTURES.md); no plan-time job
    # corpus mean per coordinate, exact: Σ floor(x·1e6 + .5) / n
    sums = emb.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.floor(F.element_at("v", i + 1) * 1e6 + F.lit(0.5))
                .cast("long")).alias(f"s{i}") for i in range(dim)])
    mu = sums.select(
        F.array(*[(F.col(f"s{i}").cast("double") / 1e6
                   / F.col("n")) for i in range(dim)]).alias("mu"))
    with_mu = emb.crossJoin(F.broadcast(mu))
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("v"), F.col("mu"), lambda x, m: (x - m) * (x - m)),
        F.lit(0.0), lambda acc, x: acc + x))
    dmicro = F.floor(dist * 1e6 + F.lit(0.5)).cast("long")
    scored = with_mu.select("vec_id", dmicro.alias("dmicro"))
    # distance moments as exact decimal sums (the group_statistics
    # contract: doubles only in the final closed forms)
    mom = scored.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("dmicro").cast(dec)).alias("sd"),
        F.sum((F.col("dmicro") * F.col("dmicro")).cast(dec)).alias("sdd"))
    n, sd = F.col("n"), F.col("sd")
    stats = mom.select(
        (sd.cast("double") / n.cast("double") / 1e6).alias("mean_d"),
        (F.sqrt((n * F.col("sdd") - sd * sd).cast("double"))
         / n.cast("double") / 1e6).alias("std_d"))
    return (
        scored.crossJoin(F.broadcast(stats))
        .select("vec_id",
                (F.col("dmicro").cast("double") / 1e6).alias("dist"),
                F.round((F.col("dmicro").cast("double") / 1e6
                         - F.col("mean_d")) / F.col("std_d"), 6).alias("z"))
        .filter(F.col("z") > z_threshold)
    )


def curate_embeddings(embeddings: DataFrame, n_planted: int = 50,
                      z_threshold: float = 2.0,
                      out_dim: int = 8) -> DataFrame:
    """C29m: composed embedding-curation pipeline — the vector-side twin of
    the text curation pass (C30l), chaining three round-4 operators the
    way an embedding corpus is actually prepared for indexing:

    1. quantized-domain exact dedup (C29j) on the reingest-augmented
       corpus — re-sent duplicates collide on their int8 code string and
       only the lowest vec_id survives;
    2. outlier drop (C29k) — distance-to-centroid z-score over the
       DEDUPED corpus (moments recomputed post-dedup, since duplicates
       bias the centroid);
    3. JL random projection (C29h) of the survivors to `out_dim` dims —
       the compact representation downstream ANN/clustering reads.

    Every stage is engine-replicable arithmetic, so the COMPOSITION
    carries a full oracle — the strongest correctness form a multi-stage
    pipeline can have. Scale shape: stage 1 is one keyed shuffle on a
    32-char hash, stage 2 two scalar-broadcast scans, stage 3 a
    shuffle-free projection."""
    aug = embeddings.select("vec_id", "embedding").unionAll(
        embeddings.filter(F.col("vec_id") < n_planted)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    v = F.col("embedding").cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    base = aug.select("vec_id", "embedding", v.alias("v"),
                      amax.alias("amax"))
    scale = F.col("amax") / F.lit(127.0)
    q = F.when(
        F.col("amax") == 0,
        F.transform(F.col("v"), lambda x: F.lit(0).cast("long")),
    ).otherwise(
        F.transform(F.col("v"),
                    lambda x: F.floor(x / scale + F.lit(0.5)).cast("long")))
    code = F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))))
    hashed = base.select("vec_id", "embedding", code.alias("code_hash"))
    keep = (hashed.groupBy("code_hash")
            .agg(F.min("vec_id").alias("vec_id")))
    deduped = hashed.join(keep, ["code_hash", "vec_id"], "left_semi") \
        .select("vec_id", "embedding")
    survivors = deduped.join(
        embedding_outliers(deduped, z_threshold=z_threshold)
        .select("vec_id"), "vec_id", "left_anti")
    return random_projection(survivors, out_dim=out_dim)


def _lsh_bucket(vec, planes: list[list[float]]):
    """Sign-pattern bucket id from fixed hyperplanes (deterministic)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(vec, plane, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _fixed_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy dependency in the
    executor path; generated once on the driver and baked into the plan).

    Weights span (-1, 1) ZERO-MEAN: the high 32 LCG bits map to [0, 1) and
    then stretch to [-1, 1). An earlier mapping landed every weight in
    [-1, 0), which made the rows strongly correlated (each dominated by a
    -sum(x) component) — fine for the sign-only LSH bucketer but NOT a
    Johnson-Lindenstrauss projection; random_projection shares this matrix,
    so the mapping must be zero-mean for its distance-preservation claim to
    hold."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 32) / float(1 << 32)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _lloyd_refine(emb: DataFrame, cents: "np.ndarray",
                  iters: int) -> "np.ndarray":
    """Lloyd (k-means) centroid refinement as distributed aggregations.

    Each iteration: (1) assign every vector to its nearest centroid with one
    Arrow-batched matmul per batch, (2) emit per-batch PARTIAL sums — the
    map-side combine — as exact fixed-point int64 (1e-9 units, so the final
    reduce is order-insensitive and the refined centroids are bit-identical
    across runs/partitionings), (3) reduce the bounded partial set
    (≤ partitions × n_cells rows — at 1000 executors still ~16k tiny rows,
    the k-means analog of the centroid pull) and recompute means. Empty
    cells keep their previous centroid."""
    n_cells = len(cents)
    for _ in range(iters):
        cn_t = (cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)).T

        def partials(batches):
            for pdf in batches:
                m = np.vstack(pdf["vec"].to_numpy())
                cell = np.argmax(m @ cn_t, axis=1)
                out = {"cell": [], "n": [], "vsum": []}
                for c in np.unique(cell):
                    sub = m[cell == c]
                    out["cell"].append(int(c))
                    out["n"].append(int(sub.shape[0]))
                    out["vsum"].append(
                        np.rint(sub * 1e9).astype(np.int64)
                        .sum(axis=0).tolist())
                yield pd.DataFrame(out)

        rows = emb.select("vec").mapInPandas(
            partials, "cell long, n long, vsum array<long>").collect()
        sums = np.zeros((n_cells, cents.shape[1]), dtype=np.int64)
        counts = np.zeros(n_cells, dtype=np.int64)
        for r in rows:
            sums[r["cell"]] += np.asarray(r["vsum"], dtype=np.int64)
            counts[r["cell"]] += r["n"]
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None] / 1e9
    return cents


def build_ivf_centroids(embeddings: DataFrame, n_cells: int = 16,
                        refine_iters: int = 2) -> "np.ndarray":
    """IVF index build, separated from the probe path: seed centroids from
    the first `n_cells` corpus vectors (deterministic), then `refine_iters`
    Lloyd iterations (see _lloyd_refine). On a cluster this runs ONCE when
    the corpus is (re)indexed and its cost amortizes over every query batch
    — which is why the bench times build and probe separately."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    cents = np.array(
        [r["vec"] for r in
         emb.filter(F.col("vec_id") < n_cells).orderBy("vec_id").collect()])
    if refine_iters:
        cents = _lloyd_refine(emb, cents, refine_iters)
    return cents


def ivf_topk(embeddings: DataFrame, n_queries: int = 10, k: int = 5,
             n_cells: int = 16, n_probe: int = 4,
             refine_iters: int = 2,
             centroids: "np.ndarray | None" = None) -> DataFrame:
    """C29 scale path #2: IVF (inverted-file) ANN. The corpus partitions into
    `n_cells` Voronoi cells around centroid vectors; a query scores only the
    `n_probe` cells whose centroids are nearest, so the scored fraction is
    ~n_probe/n_cells of the corpus regardless of corpus size.

    Centroids seed from the first `n_cells` corpus vectors (deterministic),
    then `refine_iters` Lloyd iterations re-center them as distributed
    fixed-point aggregations (see _lloyd_refine) — balancing cell sizes and
    improving probe recall at the same n_probe. Cell assignment is dense
    linear algebra — exactly the case where an Arrow-batched numpy matmul
    beats per-element column expressions — so it runs as a vectorized pandas
    UDF: one (batch × dim) @ (dim × n_cells) product per Arrow batch,
    centroids closure-captured (the Spark analog of a broadcast dictionary).
    The corpus shuffles once on cell id at index-build time; queries touch
    n_probe buckets.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    cents = centroids if centroids is not None else build_ivf_centroids(
        embeddings, n_cells, refine_iters)
    # argmax of cosine == argmax of dot with L2-normalized centroids
    cnorm_t = (cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)).T

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
            dots / np.maximum(
                np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1),
                1e-12),
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
             n_planes: int = 4, dim: int = 64,
             n_tables: int = 16) -> DataFrame:
    """C29 scale path: multi-table random-hyperplane LSH (OR-amplification).
    Corpus and queries bucket by sign pattern in `n_tables` independent
    plane sets; a corpus vector is a candidate if it collides with the query
    in ANY table. Candidates are deduped before scoring, then per-query
    top-k by true cosine. Per-query work is the union of n_tables posting
    lists (~n_tables/2^n_planes of the corpus in expectation), independent
    of corpus pair count.

    Approximate (recall < 1; raise n_tables for higher recall) — registered
    as a rows-only check; pytest pins recall against brute_force_topk.
    """
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    tables = []
    for t in range(n_tables):
        planes = _fixed_planes(n_planes, dim, seed=42 + 101 * t)
        tables.append(F.struct(
            F.lit(t).alias("tbl"),
            _lsh_bucket(F.col("vec"), planes).alias("bucket")))
    bucketed = emb.select(
        "vec_id", "vec", F.explode(F.array(*tables)).alias("tb")
    ).select("vec_id", "vec", "tb.tbl", "tb.bucket")
    q = bucketed.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("tbl").alias("qtbl"), F.col("bucket").alias("qbucket"))
    cand = (
        bucketed.join(
            F.broadcast(q),
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")))
        .select("query_id", "vec_id")
        .distinct()                       # dedupe before the expensive scoring
    )
    qv = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"))
    scored = (
        cand.join(emb, "vec_id").join(F.broadcast(qv), "query_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.round(_cosine(F.col("qvec"), F.col("vec")), 6)
                .alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rn")
    )


def knn_classify(embeddings: DataFrame, n_queries: int = 10,
                 k: int = 5, ann: bool = False) -> DataFrame:
    """C29o: k-NN majority-vote label assignment — the weak-supervision /
    label-propagation primitive a curation pipeline uses to tag unlabeled
    items from a labeled neighborhood (and, inverted, to flag items whose
    own label disagrees with their neighborhood — label-noise detection).

    The neighbor search is pluggable: exact brute force by default (what
    the full oracle replays), `ann=True` swaps in the composed IVF-PQ
    scan for cluster-scale corpora — same downstream vote, which is the
    point: classification quality degrades only by ANN recall. The vote
    is a keyed count + one row_number window with a DETERMINISTIC
    tie-break (vote count desc, then smallest label), so the result is a
    pure function of the neighbor set and both engines agree exactly.
    """
    topk = (ivfpq_topk(embeddings, n_queries=n_queries, k_nn=k) if ann
            else brute_force_topk(embeddings, n_queries=n_queries, k=k))
    labels = embeddings.select("vec_id", "label")
    votes = (
        topk.join(labels.withColumnRenamed("vec_id", "neighbor_id"),
                  "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label"))
    pred = (votes.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("query_id", F.col("label").alias("predicted_label"),
                    "n_votes"))
    truth = labels.select(F.col("vec_id").alias("query_id"),
                          F.col("label").alias("true_label"))
    return (pred.join(truth, "query_id")
            .select("query_id", "true_label", "predicted_label", "n_votes"))


def ivf_incremental_verdict(embeddings: DataFrame, n_queries: int = 10,
                            k: int = 5, n_cells: int = 16, n_probe: int = 4,
                            min_recall: float = 0.6,
                            max_cell_share: float = 0.35) -> DataFrame:
    """C29p: incremental IVF index MAINTENANCE — the production concern
    every ANN deployment hits: vectors keep arriving, and retraining the
    coarse quantizer on every ingest is a full-corpus job you cannot
    afford daily at 100 TB. The standard discipline (FAISS add() after
    train()): freeze the centroids trained on the existing corpus, assign
    new vectors to their nearest frozen cell, and only retrain when drift
    degrades the index.

    This operator proves the discipline holds end-to-end: centroids train
    on HALF the corpus (even vec_ids — a deterministic stand-in for "the
    data that existed at index-build time"), the odd half is ingested by
    frozen-cell assignment, and the verdict row pins (a) search recall
    over the COMBINED index vs exact brute force on the full corpus —
    quality must survive ingest without retrain — and (b) the drift
    gauge a re-train trigger would watch: no cell's share of the NEW
    batch may exceed `max_cell_share` (mass collapsing into one cell is
    exactly how an unmaintained IVF dies: the probe set stops pruning).

    Scale shape: identical to ivf_topk — one Arrow-batched matmul pass
    assigns cells (centroids closure-captured), the drift gauge is one
    keyed count over (cell), and the exact reference is the linear
    n_queries-broadcast pass. Nothing rebuilds, nothing collects beyond
    the k×dim centroid array."""
    old = embeddings.filter(F.col("vec_id") % 2 == 0)
    cents = build_ivf_centroids(old, n_cells=n_cells)
    cnorm_t = (cents / np.maximum(
        np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)).T

    @F.pandas_udf("long")
    def best_cell(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cnorm_t, axis=1))

    new = embeddings.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    drift = (
        new.select(best_cell("vec").alias("cell"))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n_new"))
        .agg(F.max("n_new").alias("max_cell"),
             F.sum("n_new").alias("n_ingested"))
        .select(((F.col("max_cell").cast("double")
                  / F.col("n_ingested")) <= max_cell_share)
                .alias("drift_ok"))
    )
    quality = ann_recall_verdict(
        ivf_topk(embeddings, n_queries=n_queries, k=k,
                 n_cells=n_cells, n_probe=n_probe, centroids=cents),
        brute_force_topk(embeddings, n_queries=n_queries, k=k),
        min_recall)
    return quality.crossJoin(F.broadcast(drift))


def matryoshka_gate(embeddings: DataFrame, n_queries: int = 10,
                    k: int = 5, dim: int = 32) -> DataFrame:
    """C29s: truncated-dimension retrieval-quality gate (the Matryoshka /
    MRL check): how much of the exact top-k neighborhood survives when
    vectors are truncated to their first `dim` components? MRL-trained
    embeddings put most signal in the prefix, so serving at half
    dimension halves index bytes and ADC cost — IF recall holds. This
    gate measures exactly that before a pipeline flips to truncated
    serving.

    Both rankings are the exact brute-force top-k (rounded-6 cosine,
    neighbor-id tie-break — fully engine-replayable); overlap counts by
    a (query, neighbor) equi-join on the two k-row-per-query lists, so
    queries with zero surviving neighbors still report (left join from
    the full side). Cost: two broadcast-query corpus passes — the ANN
    index substitutes per ranking at scale, the gate's join shape is
    unchanged."""
    full = brute_force_topk(embeddings, n_queries=n_queries, k=k)
    trunc = brute_force_topk(
        embeddings.select(
            "vec_id", F.slice(F.col("embedding"), 1, dim).alias("embedding")),
        n_queries=n_queries, k=k)
    t = trunc.select(F.col("query_id").alias("t_qid"),
                     F.col("neighbor_id").alias("t_nid"))
    return (full.join(t, (full.query_id == t.t_qid)
                      & (full.neighbor_id == t.t_nid), "left")
            .groupBy("query_id")
            .agg(F.count("t_nid").alias("n_overlap"))
            .select("query_id",
                    F.lit(dim).cast("int").alias("dim"),
                    "n_overlap",
                    F.round(F.col("n_overlap").cast("double") / k, 6)
                    .alias("recall_at_k")))


def mmr_rerank(embeddings: DataFrame, n_queries: int = 5,
               n_cand: int = 20, k: int = 5) -> DataFrame:
    """C29t: Maximal Marginal Relevance re-ranking (Carbonell &
    Goldstein, SIGIR '98) — the retrieval-serving step between ANN
    recall and the consumer: from each query's top-`n_cand` cosine
    candidates, greedily select `k` results maximizing

        0.5·relevance − 0.5·max_similarity_to_already_selected

    (λ = 0.5: both scalings are exact binary halvings, and relevance /
    pairwise similarities are the rounded-6 cosine the C29 rows already
    compute engine-exactly — so every score, and therefore every greedy
    argmax with the neighbor-id tie-break, replays bit-identically in
    the oracle's unrolled steps).

    Scale shape: candidate generation is the existing brute-force/ANN
    path; the greedy loop then runs ONLY on the bounded
    (queries × n_cand) candidate frame — each step is one keyed
    anti-join (drop selected), one keyed join against the selected set
    (pairwise sims; ≤ n_cand·k rows per query), one max-aggregate and
    one ranking window, with a localCheckpoint keeping lineage linear.
    Nothing in the loop scales with corpus size."""
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    cands = brute_force_topk(embeddings, n_queries=n_queries, k=n_cand)
    cand = (cands.join(emb, cands.neighbor_id == emb.vec_id)
            .select("query_id", "neighbor_id",
                    F.col("cosine_sim").alias("rel"), "vec")
            .localCheckpoint())

    # Optimization r15: the greedy loop moves only the bounded candidate
    # frame (n_queries × n_cand rows) and the ≤ n_queries·k selected
    # set — run its per-step shuffles/windows at a handful of partitions
    # instead of the ambient width sized for the data-scale candidate
    # generation above (the c38/_min_label_components loop discipline);
    # picks are bit-identical, only task counts change.
    from .graph import _few_shuffle_partitions

    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), "neighbor_id")
    with _few_shuffle_partitions(cand.sparkSession):
        selected = (cand
                    .withColumn("_score", F.lit(0.5) * F.col("rel"))
                    .withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .select("query_id", "neighbor_id", "rel",
                            F.col("_score").alias("mmr_score"),
                            F.lit(1).alias("pick"), "vec")
                    .localCheckpoint())
        for step in range(2, k + 1):
            rem = cand.join(selected.select("query_id", "neighbor_id"),
                            ["query_id", "neighbor_id"], "left_anti")
            sims = (rem.join(selected.select("query_id",
                                             F.col("vec").alias("svec")),
                             "query_id")
                    .withColumn("_sim",
                                F.round(_cosine(F.col("vec"),
                                                F.col("svec")), 6))
                    .groupBy("query_id", "neighbor_id", "rel")
                    .agg(F.max("_sim").alias("_ms")))
            pick = (sims
                    .withColumn("_score", F.lit(0.5) * F.col("rel")
                                - F.lit(0.5) * F.col("_ms"))
                    .withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1))
            pick_v = (pick
                      .join(cand.select("query_id", "neighbor_id", "vec"),
                            ["query_id", "neighbor_id"])
                      .select("query_id", "neighbor_id", "rel",
                              F.col("_score").alias("mmr_score"),
                              F.lit(step).alias("pick"), "vec"))
            selected = selected.unionByName(pick_v).localCheckpoint()
    return selected.select("query_id", "pick", "neighbor_id", "rel",
                           "mmr_score")


def filtered_ann_eval(embeddings: DataFrame, n_queries: int = 10,
                      k: int = 5) -> DataFrame:
    """C29v: filtered vector search — top-k under a metadata predicate
    (neighbors must share the query's label), evaluating PRE-filter
    (restrict candidates, then rank: the correct semantics) against
    POST-filter (global top-k, then drop non-matching: the cheap
    shortcut every naive implementation ships). Post-filter results
    are provably a subset of pre-filter results, so the recall column
    n_post/k is exactly the fraction of the answer the shortcut kept —
    the number that decides whether a vector store needs real filtered
    indexes. Both sides exact here (the oracle replays both); at scale
    the pre-filter side runs per-label IVF partitions (the C29n index
    keyed by label) and this row is its correctness contract.

    Same shared rounded-6 cosine fold and neighbor-id tie-break as
    every C29 ranking, so both rankings replay bit-for-bit."""
    emb = embeddings.select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("vec"))
    q = (emb.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("label").alias("qlabel"),
                 F.col("vec").alias("qvec")))
    pairs = (emb.join(F.broadcast(q),
                      F.col("vec_id") != F.col("query_id"))
             .select("query_id", "qlabel", "label",
                     F.col("vec_id").alias("neighbor_id"),
                     F.round(_cosine(F.col("qvec"), F.col("vec")), 6)
                     .alias("sim")))
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id"))
    pre = (pairs.filter(F.col("label") == F.col("qlabel"))
           .withColumn("rn", F.row_number().over(w_pre))
           .filter(F.col("rn") <= k)
           .groupBy("query_id")
           .agg(F.count(F.lit(1)).alias("n_pre")))
    post = (pairs
            .withColumn("rn", F.row_number().over(w_pre))
            .filter(F.col("rn") <= k)
            .filter(F.col("label") == F.col("qlabel"))
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_post")))
    return (q.select("query_id", "qlabel")
            .join(pre, "query_id", "left")
            .join(post, "query_id", "left")
            .select("query_id", "qlabel",
                    F.coalesce("n_pre", F.lit(0)).cast("long")
                    .alias("n_pre"),
                    F.coalesce("n_post", F.lit(0)).cast("long")
                    .alias("n_post"),
                    (F.coalesce("n_post", F.lit(0)).cast("double")
                     / F.lit(float(k))).alias("post_recall")))


def embedding_profile(embeddings: DataFrame) -> DataFrame:
    """C29w: per-dimension embedding QA profile — the corpus health check
    run BEFORE building any ANN index (c29_ivf/pq): a dimension with
    near-zero variance wastes codebook bits, and a drifted mean breaks
    trained quantizers (the c29_ivf_ingest drift gauge per dimension).
    Exact micro-quantized integer moments (float32 elements cast to
    double are exact, so floor(x·10^6 + 0.5) is engine-identical), one
    mean division at the end.

    Scale: posexplode fans each vector into 64 (dim, q) rows, but the
    map-side partial aggregate collapses them to 64 rows per task before
    the shuffle — exchange volume is O(dims × tasks), not O(vectors)."""
    q = F.floor(F.col("e").cast("double") * 1000000.0 + 0.5).cast("long")
    d = (embeddings.select(F.posexplode("embedding").alias("dim", "e"))
         .select("dim", q.alias("q")))
    agg = d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sum_micro"),
        F.min("q").alias("min_micro"),
        F.max("q").alias("max_micro"))
    return agg.select(
        "dim", "n", "sum_micro", "min_micro", "max_micro",
        (F.col("sum_micro").cast("double") / F.col("n").cast("double"))
        .alias("mean_micro"))


def corpus_diversity(embeddings: DataFrame) -> DataFrame:
    """C29y: exact corpus-level embedding diversity — the mean pairwise
    dot product over ALL n(n−1) ordered pairs, computed WITHOUT forming
    a single pair via the sum identity

        Σ_{i≠j} x_i·x_j = |Σ_i x_i|² − Σ_i |x_i|²

    (the Gram-sum trick behind average-pairwise-similarity dedup gauges
    and DPP/Vendi-style diversity scores: a corpus whose vectors all
    point the same way scores high mean dot = low diversity; SemDeDup
    runs exactly when this gauge says the corpus is redundant). The
    identity turns the O(n²) pair sum into linear work: ONE
    map-side-combinable pass over the exploded components computes the
    per-dim (Σq, Σq², count) triple — 64 rows leave each task — and a
    second agg over that bounded 64-row table folds the scalars. No
    join, no second corpus scan.

    Engine-exact: components are micro-quantized (float32→double is
    exact, so floor(x·1e6 + 0.5) is engine-identical); per-dim sums and
    their squares live in DECIMAL(38,0) (DuckDB HUGEINT) — Sd² reaches
    ~7e20 at the 10× probe scale, past BIGINT; both emitted means are
    ONE string-bridged division of exact integers (micro²-units)."""
    dec = "decimal(38,0)"
    q = F.floor(F.col("e").cast("double") * 1000000.0 + 0.5).cast("long")
    per_dim = (embeddings
               .select(F.posexplode("embedding").alias("dim", "e"))
               .select("dim", q.alias("q"))
               .groupBy("dim")
               .agg(F.sum(F.col("q").cast(dec)).alias("sd"),
                    F.sum(F.col("q").cast(dec) * F.col("q"))
                    .alias("ssq_d"),
                    F.count(F.lit(1)).alias("n_d")))
    folded = per_dim.agg(
        F.sum(F.col("sd") * F.col("sd")).alias("sum_sd2"),
        F.sum("ssq_d").alias("ssq"),
        # every dim appears once per vector IFF the corpus is dense and
        # rectangular — verified below before any dim's count is used
        # as n (a NULL component or ragged embedding drops from sums
        # but would silently skew n and mean_pair_dot otherwise)
        F.max("n_d").alias("n"),
        F.min("n_d").alias("n_min"))
    folded = folded.select(
        "sum_sd2", "ssq",
        F.when(F.col("n_min") == F.col("n"), F.col("n"))
        .otherwise(F.raise_error(F.lit(
            "corpus_diversity: ragged embeddings — per-dim counts "
            "diverge (NULL component or non-uniform dimensionality); "
            "dense fixed-width vectors required"))).alias("n"))
    sb = lambda c: c.cast("string").cast("double")  # noqa: E731
    return folded.select(
        "n",
        sb(F.col("ssq")).alias("sum_sq_norm_micro2"),
        (sb(F.col("ssq")) / F.col("n").cast("double"))
        .alias("mean_sq_norm_micro2"),
        (sb(F.col("sum_sd2") - F.col("ssq"))
         / sb(F.col("n") * (F.col("n") - 1)))
        .alias("mean_pair_dot_micro2"))


def hamming_topk(embeddings: DataFrame, n_queries: int = 10,
                 k: int = 5) -> DataFrame:
    """C29x: 1-bit (sign) binary quantization + exact Hamming top-k —
    the 64×-compression retrieval base modern vector stores ship
    (binary quantization + rerank): each 64-dim vector becomes two
    32-bit sign signatures packed into BIGINTs, and distance is
    popcount(xor) — pure integer ops end-to-end, so the ranking is
    engine-exact with no float anywhere.

    Signature: MSB-first doubling fold acc·2 + [e_i > 0] over dims
    1-32 (hi) and 33-64 (lo) — identical to the oracle's
    Σ bit_i·2^(32−i) closed form. Distance = bit_count(hi⊕hi') +
    bit_count(lo⊕lo').

    Scale shape: signatures are computed in one scan projection (the
    payload vectors never shuffle — 16 bytes per row move instead of
    512); the ≤n_queries query set broadcasts under a non-equi
    self-exclusion (allowlisted BNLJ, the c29_cosine_topk pattern);
    ranking partitions by query_id over distance-sorted candidates. At
    100 TB the same signatures feed a banded-prefix blocking exactly
    like SimHash (C29d) — this row pins the exact-scan baseline."""
    def sig(off: int):
        return F.expr(
            "aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, i) -> "
            "acc * CAST(2 AS BIGINT) + CASE WHEN element_at(vec, i"
            f" + {off}) > CAST(0 AS FLOAT) THEN CAST(1 AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END)")

    sigs = embeddings.select(
        "vec_id", F.col("embedding").alias("vec")) \
        .select("vec_id", sig(0).alias("hi"), sig(32).alias("lo"))
    q = sigs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("hi").alias("qhi"), F.col("lo").alias("qlo"))
    pairs = sigs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (F.bit_count(F.expr("qhi ^ hi"))
         + F.bit_count(F.expr("qlo ^ lo"))).cast("int").alias("hamming"))
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (scored.withColumn("rn", F.row_number().over(w).cast("int"))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "hamming", "rn"))


def centroid_shift(embeddings: DataFrame) -> DataFrame:
    """C29 addendum (round 13): per-subpopulation centroid shift — for
    every label, the exact squared L2 distance between the label's
    centroid and the corpus centroid, in micro²-units. The embedding
    drift gauge a training-data pipeline reads per source/domain/label
    slice: a slice whose centroid sits far from the corpus mean is
    distributionally distinct (stale crawl, domain skew, encoder
    version drift) and gets re-weighted or re-embedded before the mix
    ships (the per-slice companion of C29y's corpus-level diversity).

    The rational identity keeps everything exact: with per-dim sums
    s_ld (label) and s_gd (global) and counts n_l, n_g,

        ‖c_l − c_g‖² = Σ_d (s_ld·n_g − s_gd·n_l)² / (n_l·n_g)²

    — numerator and denominator are exact DECIMAL(38,0)/HUGEINT
    integers (components micro-quantized, the diversity convention; the
    density check below rejects ragged inputs loudly), and the shift is
    ONE string-bridged division. Shape: posexplode → (label, dim)
    map-side-combinable agg (≤|labels|·dims rows leave the scan), a
    broadcast join against the dims-row global fold, a ≤|labels|-row
    report. No pairs, no second corpus scan."""
    dec = "decimal(38,0)"
    q = F.floor(F.col("e").cast("double") * 1000000.0 + 0.5).cast("long")
    per = (embeddings
           .select("label", F.posexplode("embedding").alias("dim", "e"))
           .select("label", "dim", q.alias("q"))
           .groupBy("label", "dim")
           .agg(F.sum(F.col("q").cast(dec)).alias("s_ld"),
                F.count(F.lit(1)).alias("n_d")))
    # density check (the corpus_diversity posture): every dim of every
    # label must count the same vectors, else n is silently wrong
    lbl = (per.groupBy("label")
           .agg(F.max("n_d").alias("n_l"), F.min("n_d").alias("n_l_min")))
    lbl = lbl.select(
        "label",
        F.when(F.col("n_l_min") == F.col("n_l"), F.col("n_l"))
        .otherwise(F.raise_error(F.lit(
            "centroid_shift: ragged embeddings — per-dim counts diverge "
            "within a label; dense fixed-width vectors required")))
        .alias("n_l"))
    glob = (per.groupBy("dim")
            .agg(F.sum("s_ld").alias("s_gd"), F.sum("n_d").alias("n_g")))
    sb = lambda c: c.cast("string").cast("double")  # noqa: E731
    terms = (per.join(F.broadcast(glob), "dim")
             .join(F.broadcast(lbl), "label"))
    diff = (F.col("s_ld") * F.col("n_g").cast(dec)
            - F.col("s_gd") * F.col("n_l").cast(dec))
    folded = (terms.groupBy("label")
              .agg(F.sum(diff * diff).alias("num"),
                   F.max("n_l").alias("n_l"),
                   F.max("n_g").alias("n_g")))
    den = (F.col("n_l").cast(dec) * F.col("n_g").cast(dec)
           * F.col("n_l").cast(dec) * F.col("n_g").cast(dec))
    return folded.select(
        "label",
        F.col("n_l").alias("n_vecs"),
        F.expr("n_l * 1000000 div n_g").alias("share_ppm"),
        (sb(F.col("num")) / sb(den)).alias("shift_micro2"))


#: nDCG@k log-discount weights in exact micro-units, precomputed once in
#: Python (floor(1e6/log2(i+1) + 0.5) for rank i) and inlined as literals
#: on BOTH engines — a spec constant, so no cross-engine libm call sits in
#: the hot path or the oracle.
def _ndcg_weights_micro(k: int) -> list[int]:
    import math
    return [int(math.floor(1_000_000 / math.log2(i + 1) + 0.5))
            for i in range(1, k + 1)]


def ndcg_eval(embeddings: DataFrame, n_queries: int = 10,
              k: int = 10) -> DataFrame:
    """C43a (round 14, second tranche): retrieval-quality evaluation —
    nDCG@k and MRR@k of the int8-quantized cosine ranking against the
    exact float ranking, per query. The eval every retrieval/RAG
    pipeline runs before swapping a cheaper index in: "how much ranking
    quality does the compressed path give up?" (Järvelin & Kekäläinen
    2002 for DCG; binary relevance = membership in the exact top-k, so
    IDCG is the fixed full-relevance prefix and the score is 1.0 iff
    the quantized ranking recovers the exact set in any order at the
    top).

    Exactness: relevance and ranks are integers; per-rank DCG terms are
    the precomputed micro-unit weights (spec constants inlined on both
    engines — no libm in either plan); ndcg is ONE division of exact
    ints; mrr is an exact ppm integer division. The quantized ranking
    itself orders by round(cosine, 6) with neighbor-id tiebreaks, the
    corpus ranking discipline.

    Scale: both rankings are the established broadcast-query shape
    (n_queries rows against the corpus, top-k via keyed window on the
    query id); the eval join is top-k × top-k per query — bounded by
    k², never the corpus."""
    weights = _ndcg_weights_micro(k)
    idcg_micro = sum(weights)
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    dq = F.when(amax == 0,
                F.transform(F.col("v"), lambda x: F.lit(0.0))) \
        .otherwise(F.transform(
            F.col("v"),
            lambda x: F.floor(x / scale + F.lit(0.5)) * scale))
    base = emb.select("vec_id", "v", dq.alias("dq"))
    q = (base.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv"), F.col("dq").alias("qdq")))
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))

    def topk(sim_col, out_name):
        w = Window.partitionBy("query_id").orderBy(
            F.col(out_name).desc(), F.col("neighbor_id"))
        return (pairs.select("query_id",
                             F.col("vec_id").alias("neighbor_id"),
                             F.round(sim_col, 6).alias(out_name))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k))

    exact = topk(_cosine(F.col("qv"), F.col("v")), "sim_exact") \
        .select("query_id", "neighbor_id")
    cand = topk(_cosine(F.col("qdq"), F.col("dq")), "sim_q")
    wmap = F.array(*[F.lit(w) for w in weights])
    scored = (cand.join(exact.withColumn("rel", F.lit(1)),
                        ["query_id", "neighbor_id"], "left")
              .select("query_id", "rn",
                      F.coalesce("rel", F.lit(0)).alias("rel")))
    per_q = (scored.groupBy("query_id")
             .agg(F.sum("rel").cast("long").alias("n_hits"),
                  F.sum(F.when(F.col("rel") == 1,
                               F.element_at(wmap, F.col("rn")))
                        .otherwise(0)).cast("long").alias("dcg_micro"),
                  F.min(F.when(F.col("rel") == 1, F.col("rn")))
                  .cast("int").alias("first_hit_rank")))
    return per_q.select(
        "query_id", "n_hits", "first_hit_rank", "dcg_micro",
        F.coalesce(F.expr("1000000 div first_hit_rank"),
                   F.lit(0).cast("long")).alias("mrr_ppm"),
        (F.col("dcg_micro").cast("double") / F.lit(float(idcg_micro)))
        .alias("ndcg"))


def kappa_quantization_eval(embeddings: DataFrame) -> DataFrame:
    """C43b (round 14): Cohen's-kappa agreement between the
    full-precision nearest-label-centroid classifier and its
    int8-quantized twin — "does compressed storage change labels beyond
    chance?", the companion gate to C43a's ranking eval (Cohen 1960;
    kappa corrects raw agreement for the agreement two raters would
    reach by their marginals alone, so a skewed label mix can't buy a
    free pass). Rater A assigns each vector to the nearest label
    centroid; rater B assigns its int8-dequantized form to the SAME
    centroids.

    Exactness: centroids are string-bridged exact divisions of
    micro-quantized DECIMAL(38,0) sums (the c29_centroid_shift
    machinery), distances are the same sequential fold both engines run
    (the _cosine discipline, ties broken by label), and kappa =
    (n·agree − Σ_k mA_k·mB_k) / (n² − Σ_k mA_k·mB_k) is ONE division of
    exact BIGINTs — emitted as the numerator/denominator pair plus the
    double quotient, so no floor-division sign trap exists for a
    negative kappa.

    Scale: one posexplode agg builds the ≤|labels|·dims centroid table
    (broadcast at ≤|labels| rows); assignment is a bounded-broadcast
    non-equi join scored in column algebra; everything after is
    ≤|labels|-row arithmetic."""
    dec = "decimal(38,0)"

    def sb(col):
        return col.cast("string").cast("double")

    emb = embeddings.select(
        "vec_id", F.col("label").alias("true_label"),
        F.col("embedding").cast("array<double>").alias("v"))
    per = (emb.select("true_label",
                      F.posexplode("v").alias("dim", "x"))
           .select("true_label", "dim",
                   F.floor(F.col("x") * 1_000_000 + F.lit(0.5))
                   .cast("long").alias("q")))
    sums = (per.groupBy("true_label", "dim")
            .agg(F.sum(F.col("q").cast(dec)).alias("s"),
                 F.count(F.lit(1)).alias("n_l")))
    cent = sums.select(
        F.col("true_label").alias("label"), "dim",
        (sb(F.col("s")) / F.col("n_l").cast("double") / F.lit(1e6))
        .alias("c"))
    cent_arr = (cent.groupBy("label")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"]).alias("cvec")))

    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    dq = F.when(amax == 0,
                F.transform(F.col("v"), lambda x: F.lit(0.0))) \
        .otherwise(F.transform(
            F.col("v"),
            lambda x: F.floor(x / scale + F.lit(0.5)) * scale))
    base = emb.select("vec_id", "v", dq.alias("dq"))

    def l2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)

    pairs = base.crossJoin(F.broadcast(cent_arr))
    assigned = (pairs
                .select("vec_id",
                        F.col("label"),
                        l2(F.col("v"), F.col("cvec")).alias("da"),
                        l2(F.col("dq"), F.col("cvec")).alias("db"))
                .groupBy("vec_id")
                .agg(F.min_by("label", F.struct("da", "label"))
                     .alias("a"),
                     F.min_by("label", F.struct("db", "label"))
                     .alias("b"))
                # four consumers below (totals, both marginals, the
                # diagonal) — materialize the bounded (vec_id, a, b)
                # frame once instead of re-running the centroid-scoring
                # crossJoin per consumer (optimization r14, guide §1.2;
                # measured: 68 → 30 Exchanges in the physical plan)
                .localCheckpoint(eager=False))
    tot = assigned.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("long").alias("n_agree"))
    ma = assigned.groupBy(F.col("a").alias("label")) \
        .agg(F.count(F.lit(1)).alias("n_rater_a"))
    mb = assigned.groupBy(F.col("b").alias("label")) \
        .agg(F.count(F.lit(1)).alias("n_rater_b"))
    diag = (assigned.filter(F.col("a") == F.col("b"))
            .groupBy(F.col("a").alias("label"))
            .agg(F.count(F.lit(1)).alias("n_diag")))
    marg = (ma.join(mb, "label", "full_outer")
            .join(diag, "label", "left")
            .select("label",
                    F.coalesce("n_rater_a", F.lit(0).cast("long"))
                    .alias("n_rater_a"),
                    F.coalesce("n_rater_b", F.lit(0).cast("long"))
                    .alias("n_rater_b"),
                    F.coalesce("n_diag", F.lit(0).cast("long"))
                    .alias("n_diag")))
    pe_sum = marg.agg(
        F.sum(F.col("n_rater_a") * F.col("n_rater_b")).alias("pe_s"))
    g = (tot.crossJoin(F.broadcast(pe_sum))
         .select("n_vecs", "n_agree",
                 (F.col("n_vecs") * F.col("n_agree") - F.col("pe_s"))
                 .alias("kappa_num"),
                 (F.col("n_vecs") * F.col("n_vecs") - F.col("pe_s"))
                 .alias("kappa_den")))
    return (marg.crossJoin(F.broadcast(g))
            .select("label", "n_rater_a", "n_rater_b", "n_diag",
                    "n_vecs", "n_agree", "kappa_num", "kappa_den",
                    # pe = 1 (single label both raters) → undefined
                    F.when(F.col("kappa_den") != 0,
                           F.col("kappa_num").cast("double")
                           / F.col("kappa_den").cast("double"))
                    .alias("kappa")))


#: LCM(1..10) — the common denominator that makes every precision@i
#: term (hits_i / i, i ≤ 10) an exact integer after scaling.
_AP_LCM = 2520


def map_eval(embeddings: DataFrame, n_queries: int = 10,
             k: int = 10) -> DataFrame:
    """C43c (round 15): average precision @k of the int8-quantized
    cosine ranking against the exact float ranking, per query — the
    order-sensitive companion to C43a's nDCG (nDCG discounts by log
    rank; AP averages the precision AT each relevant hit, so it
    punishes a single early miss harder — the metric TREC-style
    retrieval evals report as MAP when averaged over queries). Binary
    relevance = membership in the exact top-k, the C43a discipline.

    Exactness: precision@i = hits_i / i with i ≤ k; every term scales
    to an exact integer by the constant LCM(1..k) = 2520 (k = 10), so
    ap_num = Σ rel_i·hits_i·(2520 div i) and ap_den = 2520·k are exact
    BIGINTs and `ap` is ONE terminal division — no libm, no float
    accumulation on either engine. The rankings themselves reuse the
    C43a machinery (round(cos,6), neighbor-id tiebreaks).

    Scale: broadcast-query shape (n_queries rows against the corpus);
    the per-query window runs over ≤k rows; the eval join is bounded
    by k² per query — never the corpus."""
    assert k <= 10, "AP LCM constant covers ranks 1..10"
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    dq = F.when(amax == 0,
                F.transform(F.col("v"), lambda x: F.lit(0.0))) \
        .otherwise(F.transform(
            F.col("v"),
            lambda x: F.floor(x / scale + F.lit(0.5)) * scale))
    base = emb.select("vec_id", "v", dq.alias("dq"))
    q = (base.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("v").alias("qv"), F.col("dq").alias("qdq")))
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))

    def topk(sim_col, out_name):
        w = Window.partitionBy("query_id").orderBy(
            F.col(out_name).desc(), F.col("neighbor_id"))
        return (pairs.select("query_id",
                             F.col("vec_id").alias("neighbor_id"),
                             F.round(sim_col, 6).alias(out_name))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k))

    exact = topk(_cosine(F.col("qv"), F.col("v")), "sim_exact") \
        .select("query_id", "neighbor_id")
    cand = topk(_cosine(F.col("qdq"), F.col("dq")), "sim_q")
    scored = (cand.join(exact.withColumn("rel", F.lit(1)),
                        ["query_id", "neighbor_id"], "left")
              .select("query_id", "rn",
                      F.coalesce("rel", F.lit(0)).alias("rel")))
    wk = Window.partitionBy("query_id").orderBy("rn") \
        .rowsBetween(Window.unboundedPreceding, 0)
    terms = (scored
             .withColumn("hits", F.sum("rel").over(wk))
             .select("query_id", "rel",
                     (F.col("rel") * F.col("hits")
                      * (F.lit(_AP_LCM) / F.col("rn")).cast("long"))
                     .alias("term")))
    per_q = (terms.groupBy("query_id")
             .agg(F.sum("rel").cast("long").alias("n_hits"),
                  F.sum("term").cast("long").alias("ap_num")))
    return per_q.select(
        "query_id", "n_hits", "ap_num",
        F.lit(_AP_LCM * k).cast("long").alias("ap_den"),
        (F.col("ap_num").cast("double") / F.lit(float(_AP_LCM * k)))
        .alias("ap"),
        F.expr(f"n_hits * 1000000 div {k}").alias("p_at_k_ppm"))


def _centroid_scored(embeddings: DataFrame) -> DataFrame:
    """Shared scoring block for the detector-eval rows (C43d AUC, C43e
    calibration): per-label micro-exact centroids (posexplode partial
    sums in DECIMAL(38,0), ≤|labels|·dims rows), then every vector's
    6dp-rounded cosine to every label centroid via a bounded broadcast
    — (label, score, is_pos) with no corpus-sized sort anywhere."""
    dec = "decimal(38,0)"

    def sb(col):
        return col.cast("string").cast("double")

    emb = embeddings.select(
        "vec_id", F.col("label").alias("true_label"),
        F.col("embedding").cast("array<double>").alias("v"))
    per = (emb.select("true_label",
                      F.posexplode("v").alias("dim", "x"))
           .select("true_label", "dim",
                   F.floor(F.col("x") * 1_000_000 + F.lit(0.5))
                   .cast("long").alias("q")))
    sums = (per.groupBy("true_label", "dim")
            .agg(F.sum(F.col("q").cast(dec)).alias("s"),
                 F.count(F.lit(1)).alias("n_l")))
    cent = sums.select(
        F.col("true_label").alias("label"), "dim",
        (sb(F.col("s")) / F.col("n_l").cast("double") / F.lit(1e6))
        .alias("c"))
    cent_arr = (cent.groupBy("label")
                .agg(F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"]).alias("cvec")))

    return (emb.crossJoin(F.broadcast(cent_arr))
            .select(F.col("label"),
                    F.round(_cosine(F.col("v"), F.col("cvec")), 6)
                    .alias("score"),
                    (F.col("true_label") == F.col("label"))
                    .cast("long").alias("is_pos")))


def calibration_eval(embeddings: DataFrame, bins: int = 10) -> DataFrame:
    """C43e (round 16): reliability table of the nearest-centroid
    detector — the CALIBRATION half of the C43 eval family (ranking
    C43a/C43c, agreement C43b, separation C43d): bin every (vector,
    label) score into `bins` equal-width bins over the cosine domain
    [-1, 1] and report, per (label, bin), the support, the positive
    count, the exact score mass, and the positive rate — the table a
    reliability diagram plots and an ECE folds.

    Integer-exact: scores are 6dp-rounded (the corpus discipline), so
    score_micro = round(score·10⁶) is an exact integer; the bin index
    is pure integer arithmetic on the [0, 2·10⁶] shifted value,
    least(bins−1, u·bins // 2·10⁶); the score mass is emitted as its
    exact signed integer NUMERATOR (sum_score_micro — no division, so
    no sign-truncation hazard) and the positive rate as 10⁶·n_pos //
    n, nonnegative integer division identical in both engines.

    Scale: everything after the shared bounded-broadcast scoring block
    is one keyed agg on ≤|labels|·bins cells."""
    scored = _centroid_scored(embeddings)
    u = (scored
         .withColumn("score_micro",
                     F.round(F.col("score") * 1_000_000).cast("long"))
         .withColumn("bin",
                     F.expr(f"least({bins - 1}, "
                            f"((score_micro + 1000000) * {bins}) "
                            f"div 2000000)").cast("int")))
    return (u.groupBy("label", "bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("is_pos").cast("long").alias("n_pos"),
                 F.sum("score_micro").cast("long")
                 .alias("sum_score_micro"))
            .select("label", "bin", "n", "n_pos", "sum_score_micro",
                    F.expr("(1000000 * n_pos) div n")
                    .cast("long").alias("pos_rate_ppm")))


def auc_eval(embeddings: DataFrame) -> DataFrame:
    """C43d (round 15): exact ROC-AUC of the nearest-centroid similarity
    score as a per-label detector — "how well does cosine-to-the-label-
    centroid separate that label from the rest?", the threshold-free
    classifier eval that completes the C43 family (ranking quality
    C43a/C43c, label agreement C43b, detector quality here). AUC is
    computed as the Mann-Whitney U statistic (AUC = P(score_pos >
    score_neg) + ½·P(tie)), never by trapezoid integration — exact and
    engine-identical.

    Exactness and scale share one trick: scores round to 6dp (the
    corpus ranking discipline), so the per-label score HISTOGRAM is
    domain-bounded (≤ 2e6+1 distinct values in [-1, 1]) and U folds
    over it without ever ranking the corpus: with the histogram ordered
    by score, U2 = Σ_s n_pos(s)·(2·Σ_{s'<s} n_neg(s') + n_neg(s)) — the
    2× carries the ½-tie credit as an integer. The cumulative window is
    PARTITIONED by label and runs over the bounded histogram, and
    auc = U2 / (2·n_pos·n_neg) is ONE terminal division, emitted beside
    its exact numerator/denominator pair (the kappa discipline).

    Scale: centroids via one posexplode agg (≤|labels|·dims rows,
    broadcast); scoring is a bounded-broadcast non-equi join in column
    algebra; everything after runs on the bounded histogram."""
    scored = _centroid_scored(embeddings)
    hist = (scored.groupBy("label", "score")
            .agg(F.sum("is_pos").cast("long").alias("n_pos"),
                 F.sum(F.lit(1) - F.col("is_pos")).cast("long")
                 .alias("n_neg")))
    wcum = Window.partitionBy("label").orderBy("score") \
        .rowsBetween(Window.unboundedPreceding, -1)
    u2 = (hist
          .withColumn("neg_below",
                      F.coalesce(F.sum("n_neg").over(wcum),
                                 F.lit(0).cast("long")))
          .groupBy("label")
          .agg(F.sum(F.col("n_pos")
                     * (F.lit(2) * F.col("neg_below") + F.col("n_neg")))
               .cast("long").alias("auc_num"),
               F.sum("n_pos").cast("long").alias("n_pos"),
               F.sum("n_neg").cast("long").alias("n_neg")))
    return u2.select(
        "label", "n_pos", "n_neg", "auc_num",
        (F.lit(2) * F.col("n_pos") * F.col("n_neg")).alias("auc_den"),
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               F.col("auc_num").cast("double")
               / (F.lit(2.0) * F.col("n_pos").cast("double")
                  * F.col("n_neg").cast("double")))
        .alias("auc"))
