"""Tolerance / recall / shape checks for the approximate operators (approx
sketches, LSH/ANN, simhash, multimodal codecs, JSON fn sweep) — the raw
behaviors behind the registered verdict-form queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import (
    dedup, multimodal, relational, scalars, similarity,
)
from kafka_streams_in_action_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_approx_count_distinct_within_2pct(spark, duck):
    exact = duck.execute("SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    approx = (
        load_table(spark, "orders", SF_DIR)
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("a"))
        .collect()[0]["a"]
    )
    assert abs(approx - exact) / exact <= 0.02


def test_approx_quantiles_within_tolerance(spark, duck):
    """C4 approx percentiles: the registered query's in-query rank-window
    verdicts must hold, and the raw GK estimates must independently sit
    within 1% relative error of DuckDB's exact quantile_cont."""
    from kafka_streams_in_action_spark.plans.queries import QUERIES
    from .conftest import SF_DIR

    for r in QUERIES["c4_approx_quantiles"].fn(spark, SF_DIR).collect():
        assert r["p50_ok"] and r["p95_ok"], r

    got = {r["l_returnflag"]: (r["p50"], r["p95"]) for r in (
        load_table(spark, "lineitem", SF_DIR)
        .groupBy("l_returnflag")
        .agg(F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
             F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95"))
        .collect())}
    exact = {r[0]: (r[1], r[2]) for r in duck.execute("""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5),
               quantile_cont(l_extendedprice, 0.95)
        FROM lineitem GROUP BY l_returnflag""").fetchall()}
    assert got.keys() == exact.keys()
    for flag in exact:
        for a, e in zip(got[flag], exact[flag]):
            assert abs(a - e) / e <= 0.01, (flag, a, e)


def test_minhash_lsh_recall_against_exact_jaccard(spark):
    docs = load_table(spark, "documents", SF_DIR)
    exact = {(r["doc_a"], r["doc_b"])
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.1).collect()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in dedup.minhash_lsh_pairs(docs, threshold=0.1).collect()}
    # LSH verifies candidates with exact Jaccard → no false positives
    assert lsh <= exact
    # banding (8 bands × 4 rows) at j≥0.1 gives modest recall; just require
    # it finds a nonempty, correct subset when exact pairs exist
    if exact:
        assert len(lsh) >= max(1, int(0.3 * len(exact)))


def test_simhash_detects_near_duplicate(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(20)
    # append a near-duplicate of doc 0 (one token changed)
    base = docs.filter(F.col("doc_id") == 0).collect()[0]
    words = base["text"].split()
    words[len(words) // 2] = "PERTURBED"
    near = spark.createDataFrame(
        [(100000, " ".join(words), base["lang"], base["source"], base["n_chars"])],
        schema=docs.schema)
    aug = docs.union(near)
    pairs = dedup.simhash_near_pairs(aug, max_hamming=10).collect()
    assert any({r["doc_a"], r["doc_b"]} == {0, 100000} for r in pairs)


def test_cosine_near_dup_lsh_recall_vs_exact(spark):
    """C29c scale path: LSH-pruned near-dup pairs are exactly-verified (no
    false positives) and keep usable recall even at threshold 0.35 — an
    adversarial LSH regime (θ≈69°, per-plane collision ~0.61; measured 0.60
    at defaults). Production thresholds ≥0.8 sit far better on the curve."""
    emb = load_table(spark, "embeddings", SF_DIR)
    exact = {(r["vec_a"], r["vec_b"])
             for r in similarity.cosine_near_dup_pairs(emb).collect()}
    lsh = {(r["vec_a"], r["vec_b"])
           for r in similarity.cosine_near_dup_lsh(emb).collect()}
    assert lsh <= exact
    assert len(lsh & exact) / len(exact) >= 0.45


def test_lsh_ann_recall_vs_brute_force(spark):
    """Multi-table LSH (16 tables × 4 planes) on RANDOM 64-dim vectors — the
    adversarial regime (true neighbors barely closer than the bulk). Recall
    measured 0.72 at sf0.01 defaults; pinned below with the candidate
    fraction logged so the recall/cost trade stays visible."""
    emb = load_table(spark, "embeddings", SF_DIR)
    n = emb.count()
    brute = {(r["query_id"], r["neighbor_id"])
             for r in similarity.brute_force_topk(emb).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in similarity.lsh_topk(emb).collect()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.55, recall
    # every ANN answer must be a real corpus vector scored correctly (subset of
    # per-query candidates ranked by true cosine) — spot-check determinism
    again = {(r["query_id"], r["neighbor_id"])
             for r in similarity.lsh_topk(emb).collect()}
    assert approx == again
    print(f"lsh_topk recall={recall:.3f} over corpus n={n}")


def test_lsh_ann_finds_planted_near_duplicates(spark):
    """The regime LSH is FOR: planted near-duplicates (cos ≈ 0.95+) must
    collide in some table with near-certainty — per-table p⁴ ≈ 0.65, miss
    probability (1−p⁴)^16 ≈ 5e-8 — so recall on true near-dups is ~1.0 while
    each table still prunes to 1/16th of the corpus."""
    import pyspark.sql.functions as SF

    emb = load_table(spark, "embeddings", SF_DIR)
    # plant: copies of queries 0..9 with one coordinate nudged — cosine ≈ 1
    planted = (
        emb.filter(F.col("vec_id") < 10)
        .select((F.col("vec_id") + 1000000).alias("vec_id"),
                F.transform("embedding",
                            lambda x, i: x + F.when(i == 0, F.lit(0.01))
                            .otherwise(F.lit(0.0))).alias("embedding"))
    )
    aug = emb.select("vec_id", SF.col("embedding").cast("array<float>")
                     .alias("embedding")).union(
        planted.select("vec_id", SF.col("embedding").cast("array<float>")
                       .alias("embedding")))
    got = {(r["query_id"], r["neighbor_id"])
           for r in similarity.lsh_topk(aug, n_queries=10, k=1).collect()}
    hits = sum((q, q + 1000000) in got for q in range(10))
    assert hits >= 9, got


def test_ivf_ann_recall_vs_brute_force(spark):
    """IVF probing 4/16 cells after 2 Lloyd refinement iterations; measured
    0.92 at sf0.01. Refinement is exact fixed-point (order-insensitive
    integer partials), so results are reproducible run to run."""
    emb = load_table(spark, "embeddings", SF_DIR)
    brute = {(r["query_id"], r["neighbor_id"])
             for r in similarity.brute_force_topk(emb).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in similarity.ivf_topk(emb).collect()}
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.7, recall
    # deterministic: same centroids, same cells, same answer
    again = {(r["query_id"], r["neighbor_id"])
             for r in similarity.ivf_topk(emb).collect()}
    assert approx == again


def test_ivf_lloyd_refinement_balances_cells(spark):
    """Lloyd refinement must (a) be deterministic and (b) not worsen the
    max/mean cell-size imbalance versus the raw first-k seed — the property
    that keeps probe cost uniform at scale."""
    import numpy as np

    emb = load_table(spark, "embeddings", SF_DIR).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    seed = np.array(
        [r["vec"] for r in
         emb.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()])
    refined1 = similarity._lloyd_refine(emb, seed, 2)
    refined2 = similarity._lloyd_refine(emb, seed, 2)
    assert (refined1 == refined2).all()      # bit-identical across runs

    def imbalance(cents):
        cn = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T
        m = np.array([r["vec"] for r in emb.collect()])
        cells = np.argmax(m @ cn, axis=1)
        counts = np.bincount(cells, minlength=16)
        return counts.max() / counts.mean()

    assert imbalance(refined1) <= imbalance(seed) + 1e-9


def test_reingest_shingle_bound_across_scales(spark):
    """minhash_reingest_pairs' full-oracle parity rests on every document
    having at most 99 distinct 3-gram shingles: two UNEQUAL sets of size
    ≤ 99 have Jaccard ≤ 98/99 < 0.99, so threshold 0.99 forces set
    equality → identical signatures → collision in every band → recall is
    deterministically 1.0. Pin that bound at every testdata scale the
    driver or bench touches, so a future corpus with longer documents
    fails HERE instead of as a silent oracle mismatch."""
    import os

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        docs = load_table(spark, "documents", sf_dir)
        mx = (
            dedup._tokenized(docs)
            .select(F.size(dedup._shingles(F.col("words"))).alias("n"))
            .agg(F.max("n").alias("mx")).collect()[0]["mx"]
        )
        assert mx <= 99, (sf, mx)


def test_simhash_band_schemes_bit_math(spark):
    """The two pigeonhole-complete band schemes must each extract exactly
    their declared bits — verified against a pure-python reconstruction on a
    value that exercises the long sign bit."""
    val = -0x123456789ABCDEF0
    u = val & ((1 << 64) - 1)
    df = spark.range(1).select(F.lit(val).cast("long").alias("h"))
    cont = df.select(*[
        s.alias(f"c{i}") for i, s in enumerate(
            dedup._simhash_band_structs(F.col("h"), "contiguous"))
    ]).collect()[0]
    inter = df.select(*[
        s.alias(f"i{i}") for i, s in enumerate(
            dedup._simhash_band_structs(F.col("h"), "interleaved"))
    ]).collect()[0]
    for i in range(4):
        assert cont[f"c{i}"]["chunk"] == (u >> (16 * i)) & 0xFFFF
        expected = sum(((u >> (4 * r + i)) & 1) << r for r in range(16))
        assert inter[f"i{i}"]["chunk"] == expected


def test_verdict_forms_hold(spark):
    """The four verdict-form registrations must emit all-true verdicts on
    the pytest corpus (the driver checks sf0.01; this pins sf0.001)."""
    emb = load_table(spark, "embeddings", SF_DIR)
    docs = load_table(spark, "documents", SF_DIR)
    row = similarity.lsh_topk_verdict(emb).collect()[0]
    assert row["n_exact"] > 0 and row["count_ok"] and row["recall_ok"], row
    row = similarity.ivf_topk_verdict(emb).collect()[0]
    assert row["count_ok"] and row["recall_ok"], row
    row = dedup.minhash_lsh_verdict(docs).collect()[0]
    assert row["precision_ok"] and row["recall_ok"], row
    row = dedup.simhash_verdict(docs).collect()[0]
    assert row["n_planted_found"] == 20, row
    assert row["blockings_agree"] and row["hamming_ok"], row
    row = similarity.semdedup_verdict(emb).collect()[0]
    assert row["n_exact_pairs"] > 0, row
    assert row["precision_ok"] and row["recall_ok"], row


def test_pq_ann_recall_with_rerank(spark):
    """C29l: PQ ADC shortlist + exact re-rank must stay above the verdict
    floor with margin (measured ≥0.8 at sf0.001, ≥0.7 at sf0.01 with
    m=8, k=16, rerank=50); ADC-only ranking measured <0.5 on this
    unstructured corpus, which is why the re-rank stage exists."""
    emb = load_table(spark, "embeddings", SF_DIR)
    row = similarity.pq_topk_verdict(emb).collect()[0]
    assert row["n_exact"] > 0 and row["count_ok"] and row["recall_ok"], row


def test_ivfpq_recall_and_cell_pruning(spark):
    """C29n: composed IVF-PQ must (a) hold the verdict recall floor with
    margin (measured 0.82 at sf0.01), and (b) actually prune — every
    scored candidate pair must come from a probed cell, checked by
    asserting the candidate count is well under the PQ-only scan's
    (n_queries × corpus) pair count."""
    emb = load_table(spark, "embeddings", SF_DIR)
    row = similarity.ivfpq_topk_verdict(emb).collect()[0]
    assert row["n_exact"] > 0 and row["count_ok"] and row["recall_ok"], row

    # pruning: the probed fraction of the corpus (sum of probed-cell
    # sizes over queries) must stay well under the full n_queries × n
    # scan a PQ-only pass would do. 4-of-16 probes ≈ 25% + skew slack.
    import numpy as np
    cents = similarity.build_ivf_centroids(emb)
    cn_t = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in emb.collect()}
    cell_of = {i: int(np.argmax(v @ cn_t)) for i, v in vecs.items()}
    sizes = {}
    for c in cell_of.values():
        sizes[c] = sizes.get(c, 0) + 1
    probed = 0
    for qid in range(10):
        order = np.argsort(-(vecs[qid] @ cn_t), kind="stable")[:4]
        probed += sum(sizes.get(int(c), 0) for c in order)
    assert probed < 0.5 * 10 * len(vecs), (probed, len(vecs))


def test_pca_matches_numpy(spark):
    """C29i: the distributed Gramian-pull PCA must agree with a single-node
    numpy PCA on the same corpus — mean, captured-variance ratio, and the
    spanned subspace (|W_d · W_nᵀ| = I up to eigenvector sign, compared via
    absolute values) to fixed-point quantization tolerance."""
    import numpy as np
    emb = load_table(spark, "embeddings", SF_DIR)
    mu, comps, ratio = similarity.pca_train(emb, n_components=8)
    X = np.array([r["embedding"] for r in emb.select("embedding").collect()],
                 dtype=np.float64)
    assert np.abs(X.mean(axis=0) - mu).max() < 1e-6
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / len(X)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:8]
    assert abs(ev[order].sum() / ev.sum() - ratio.sum()) < 1e-4
    # same subspace: projections of numpy's basis onto ours are ±1 diagonal
    overlap = np.abs(comps @ evec[:, order])
    assert np.abs(overlap - np.eye(8)).max() < 1e-3, overlap


def test_semdedup_multi_assign_recall(spark):
    """C29f: the n_assign=2 multi-assignment must keep within-cluster recall
    well above the verdict floor (measured 0.76-0.79 across sf0.001/0.01);
    single-assignment measured ~0.4, which is why the default is 2."""
    emb = load_table(spark, "embeddings", SF_DIR)
    sem = similarity.semdedup_pairs(emb, threshold=0.35).count()
    exact = similarity.cosine_near_dup_pairs(emb, threshold=0.35).count()
    assert exact > 0
    assert sem / exact >= 0.6, (sem, exact)


def test_json_fn_sweep_values(spark):
    out = scalars.json_functions(load_table(spark, "events", SF_DIR)) \
        .filter(F.col("event_id") == 0).collect()[0]
    assert out["k_value"] == out["k_struct"]
    assert out["keys"] == ["k"]
    assert out["vals"] == [out["k_value"]]
    assert '"event_type"' in out["as_json"]


def test_bmp_codec_roundtrip_with_row_padding():
    """The BMP encoder/decoder round-trip on a width whose 3-byte rows are
    NOT 4-byte aligned (w=5 → 15-byte rows, 16-byte stride): a decoder that
    ignored padding or bottom-up row order would scramble the pixels."""
    import numpy as np

    payload = multimodal.encode_bmp(7, 30)   # w=(30%29)+4=5, h=(7%13)+3=10
    w, h, rows = multimodal.parse_bmp(payload)
    assert (w, h) == (5, 10)
    expected = ((7 * 31 + np.arange(w * h * 3, dtype=np.int64) * 7) % 256) \
        .astype(np.uint8).reshape(h, w * 3)
    assert (rows == expected).all()


def test_bmp_decoder_rejects_non_bmp():
    import pytest

    with pytest.raises(ValueError):
        multimodal.parse_bmp(b"\x89PNG\r\n\x1a\nnot a bmp at all........")


def test_frame_sample_fanout(spark):
    """1→N decode fan-out over the real VID0 container: every doc emits one
    row per sampled frame, frame means in byte range."""
    media = multimodal.to_video_media(
        load_table(spark, "documents", SF_DIR).limit(5))
    rows = multimodal.frame_sample(media, every_nth=2).collect()
    assert len(rows) >= 5                      # every doc has ≥2 frames
    for r in rows:
        assert r["frame_no"] % 2 == 0
        assert r["frame_no"] < r["n_frames"]
        assert 0 <= r["frame_mean"] <= 255


def test_wav_chunk_walk_stats(spark):
    """The RIFF decoder must find fmt/data via the chunk walk and recompute
    sample count + duration + RMS from the actual PCM bytes."""
    import math

    media = multimodal.to_audio_media(
        load_table(spark, "documents", SF_DIR).limit(3))
    rows = multimodal.audio_stats(media).collect()
    assert len(rows) == 3
    for r in rows:
        assert 50 <= r["n_samples"] < 450
        assert math.isclose(r["duration_s"], r["n_samples"] / 8000)
        assert 0 < r["rms"] < 1024


def test_sampling_and_packing_invariant_under_repartitioning(spark):
    """The c32 ops' core contract: hash-mod splits and packed offsets must be
    IDENTICAL regardless of input partitioning (a cluster re-layout must not
    move any document between train/val/test or shift any pack offset)."""
    from kafka_streams_in_action_spark.operators import sampling

    docs = load_table(spark, "documents", SF_DIR)
    shuffled = docs.repartition(7, F.col("source"))

    base_split = {(r["doc_id"], r["split"])
                  for r in sampling.train_val_test_split(docs).collect()}
    got_split = {(r["doc_id"], r["split"])
                 for r in sampling.train_val_test_split(shuffled).collect()}
    assert base_split == got_split

    base_pack = {(r["doc_id"], r["start_offset"], r["pack_id"])
                 for r in sampling.pack_documents(docs).collect()}
    got_pack = {(r["doc_id"], r["start_offset"], r["pack_id"])
                for r in sampling.pack_documents(shuffled).collect()}
    assert base_pack == got_pack


def test_fixed_planes_are_zero_mean_jl_quality():
    """Regression pin for the r4→r5 JL fix: the LCG plane weights must span
    (-1, 1) roughly zero-mean. An earlier mapping produced all-negative
    weights — rows correlated through a shared -sum(x) component — which
    silently broke random_projection's distance-preservation claim while
    every oracle still matched (the matrix was deterministic on both
    sides). Also checks the money property directly: pairwise distances
    after an 8→64-dim projection stay within a loose JL distortion band."""
    import numpy as np

    planes = np.array(similarity._fixed_planes(8, 64, seed=1042))
    assert planes.min() < -0.5 and planes.max() > 0.5
    assert abs(planes.mean()) < 0.1
    # per-row means individually near zero (the old bug: every row ≈ -0.5)
    assert np.abs(planes.mean(axis=1)).max() < 0.25

    rng = np.random.RandomState(7)
    x = rng.randn(40, 64)
    y = (x @ planes.T) * np.sqrt(3.0 / 8)  # the operator's scale
    dx = np.linalg.norm(x[:, None] - x[None, :], axis=2)
    dy = np.linalg.norm(y[:, None] - y[None, :], axis=2)
    iu = np.triu_indices(40, 1)
    ratio = dy[iu] / dx[iu]
    # k=8 gives loose concentration; the broken matrix fails this wildly
    # (rank-1-dominated rows push the median far off 1 and blow the spread)
    assert 0.7 < np.median(ratio) < 1.3, np.median(ratio)
    assert ratio.std() / ratio.mean() < 0.5, (ratio.mean(), ratio.std())


def test_psi_drift_constant_distribution(spark):
    """r7 advisor regression: an event_type whose baseline values are all
    identical makes the raw bucket width (hi-lo)/bins zero — 0/0 = NaN,
    which Spark's floor→null / null-skipping greatest() used to land in
    the TOP bucket while DuckDB's CAST(floor(NaN)) errors. The width
    floor puts every value of a constant distribution in bucket 0 on
    both engines; PSI for an undrifted constant type is exactly 0."""
    events = spark.createDataFrame(
        [(i, "const", 42.0) for i in range(40)]
        + [(1000 + i, "vary", float(i % 13)) for i in range(40)],
        "event_id long, event_type string, value double")
    rows = {r["event_type"]: r for r in
            relational.psi_drift(events).collect()}
    const = rows["const"]
    assert const["psi"] is not None and const["psi"] == 0.0
    assert const["drifted"] is False
    assert rows["vary"]["psi"] is not None


def test_minhash_clusters_short_doc_clones(spark):
    """r7 advisor regression: documents with fewer than n=3 tokens produce
    zero shingles, so the Jaccard pair graph alone leaves their exact
    clones as singletons while the rep-collapse groups them. The declared
    graph is near-dup edges UNION exact-text-equality edges (the oracle
    unions them too), so short clones MUST share their representative's
    cluster — and distinct short texts must stay singletons."""
    docs = spark.createDataFrame(
        [(0, "hi"), (1, "hi"), (2, "hi"), (3, "yo"),
         (4, "one two three four five"), (5, "one two three four five"),
         (6, "completely different words here")],
        "doc_id long, text string")
    labels = {r["doc_id"]: r["cluster_id"]
              for r in dedup.minhash_clusters(docs).collect()}
    assert labels[0] == labels[1] == labels[2] == 0   # short clones grouped
    assert labels[3] == 3                             # distinct short text
    assert labels[4] == labels[5] == 4                # normal clones
    assert labels[6] == 6
    # the LSH edge source shares the collapse, so the same holds there
    lsh = {r["doc_id"]: r["cluster_id"]
           for r in dedup.minhash_clusters(docs, edge_source="lsh").collect()}
    assert lsh[0] == lsh[1] == lsh[2] == 0 and lsh[3] == 3


def test_minhash_clusters_lsh_refines_exact(spark):
    """c29_minhash_clusters' banded regime: LSH candidate edges are a subset
    of exact-Jaccard edges (candidates are exact-verified), so LSH components
    must REFINE the exact components — never merge across them — and must
    still group a pinned floor of the docs the exact graph groups."""
    from collections import defaultdict

    docs = load_table(spark, "documents", SF_DIR)
    exact = {r["doc_id"]: r["cluster_id"]
             for r in dedup.minhash_clusters(docs).collect()}
    lsh = {r["doc_id"]: r["cluster_id"]
           for r in dedup.minhash_clusters(docs, edge_source="lsh").collect()}
    assert set(exact) == set(lsh)

    members = defaultdict(set)
    for d, c in lsh.items():
        members[c].add(d)
    for c, ms in members.items():
        assert len({exact[m] for m in ms}) == 1, (c, ms)

    def grouped(labels):
        sizes = defaultdict(int)
        for c in labels.values():
            sizes[c] += 1
        return {d for d, c in labels.items() if sizes[c] > 1}

    g_exact, g_lsh = grouped(exact), grouped(lsh)
    if g_exact:
        cov = len(g_exact & g_lsh) / len(g_exact)
        print(f"minhash_clusters lsh coverage={cov:.3f} "
              f"({len(g_exact)} exact-grouped docs)")
        assert cov >= 0.3, cov


def test_boilerplate_removal_cuts_exact_spans(spark):
    """C28g: a 5-gram shared by >= min_df docs is cut from every doc at
    every covering position; everything else survives in original order;
    docs shorter than n are untouched."""
    rows = [
        (1, "x1 x2 AA BB CC DD EE y1 y2"),
        (2, "AA BB CC DD EE z1 z2 z3"),
        (3, "w1 AA BB CC DD EE"),
        (4, "AA BB CC DD unrelated tail words here"),  # 4-gram only: kept
        (5, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           dedup.boilerplate_removal(docs, n=5, min_df=3).collect()}
    assert got[1]["clean_text"] == "x1 x2 y1 y2"
    assert got[2]["clean_text"] == "z1 z2 z3"
    assert got[3]["clean_text"] == "w1"
    assert got[4]["clean_text"] == rows[3][1]
    assert got[5]["clean_text"] == "tiny doc" and got[5]["n_removed"] == 0
    assert got[1]["n_tokens"] == 9 and got[1]["n_removed"] == 5


def test_boilerplate_rebuild_never_shuffles_text(spark):
    """C28g plan: the covered-position build side must broadcast into the
    corpus join so document text stays resident — no sort-merge exchange
    of the token payload."""
    df = dedup.boilerplate_removal(load_table(spark, "documents", SF_DIR))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_knn_classify_ann_form_agrees_with_exact(spark):
    """C29o: the IVF-PQ-backed kNN classifier must produce one prediction
    per query and agree with the exact-kNN form on most queries (ANN
    recall 0.8+ ⇒ vote flips are rare)."""
    emb = load_table(spark, "embeddings", SF_DIR)
    exact = {r["query_id"]: r["predicted_label"]
             for r in similarity.knn_classify(emb).collect()}
    ann = {r["query_id"]: r["predicted_label"]
           for r in similarity.knn_classify(emb, ann=True).collect()}
    assert len(ann) == 10 and len(exact) == 10
    agree = sum(ann[q] == exact[q] for q in exact)
    assert agree >= 6, (agree, exact, ann)


def test_zorder_skipping_payoff(spark):
    """C37: the operator's own benchmark claim — under the 2-D quarter-box
    predicate the Z-order layout scans exactly the matching rows (every
    scanned tile lies inside the box), while the time-linear layout must
    read every time slice the box touches (> 2x the rows). rows_matched
    is layout-invariant."""
    from kafka_streams_in_action_spark.operators import layout

    ev = load_table(spark, "events", SF_DIR)
    rep = {r["layout"]: r for r in layout.skipping_report(ev).collect()}
    lin, z = rep["linear_ts"], rep["zorder"]
    assert lin["rows_matched"] == z["rows_matched"] > 0
    assert z["rows_scanned"] == z["rows_matched"]  # tiles nest in the box
    assert lin["rows_scanned"] > 2 * z["rows_scanned"]
    assert z["files_scanned"] < lin["files_scanned"]


def test_zorder_key_is_shuffle_free(spark):
    """C37 plan: computing Z-values is scan + 1-row bounds broadcast +
    codegen'd integer expressions — no hash shuffle anywhere (the thing
    the top-bits file assignment buys over rank-based assignment)."""
    from kafka_streams_in_action_spark.operators import layout

    df = layout.zorder_key(load_table(spark, "events", SF_DIR))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan


def test_write_zordered_files_are_disjoint_zval_ranges(spark, tmp_path):
    """C37 materialization: repartitionByRange(zval) + in-file sort gives
    parquet files whose zval ranges DON'T overlap — the property that
    lets footer min/max stats prune whole files for any zval interval."""
    from pyspark.sql import functions as F
    from kafka_streams_in_action_spark.operators import layout

    ev = load_table(spark, "events", SF_DIR)
    path = str(tmp_path / "zordered")
    layout.write_zordered(ev, path, n_files=8)
    back = (spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("zval").alias("lo"), F.max("zval").alias("hi"),
                 F.count(F.lit(1)).alias("n")))
    spans = sorted((r["lo"], r["hi"]) for r in back.collect())
    assert sum(1 for _ in spans) >= 2
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans


def test_ivf_incremental_drift_gauge_detects(spark):
    """C29p: the drift gauge must be a real detector — with an absurdly
    tight share bound it reports drift, with the default it passes, and
    the combined-index recall verdict holds with half-trained frozen
    centroids."""
    emb = load_table(spark, "embeddings", SF_DIR)
    ok = similarity.ivf_incremental_verdict(emb).collect()[0]
    assert ok["recall_ok"] and ok["count_ok"] and ok["drift_ok"]
    tight = similarity.ivf_incremental_verdict(
        emb, max_cell_share=0.01).collect()[0]
    assert not tight["drift_ok"]


def test_interleave_sql_n_three_dims_roundtrips(spark):
    """C37: the N-D Morton generator must be invertible — bit i of input
    j sits at bit 3i+j of the z-value — and the 2-D wrapper must emit
    byte-identical SQL to the original two-column form."""
    from kafka_streams_in_action_spark.operators import layout

    assert layout.interleave_sql("a", "b") == layout.interleave_sql_n(
        ["a", "b"])
    df = spark.range(64).selectExpr(
        "id % 4 AS a", "(id DIV 4) % 4 AS b", "(id DIV 16) % 4 AS c")
    z = df.selectExpr(
        "a", "b", "c",
        layout.interleave_sql_n(["a", "b", "c"], bits=2) + " AS z")
    decode = [f"((z >> {3 * i + j}) & 1) << {i}"
              for j in range(3) for i in range(2)]
    back = z.selectExpr(
        "a", "b", "c",
        f"({decode[0]}) | ({decode[1]}) AS a2",
        f"({decode[2]}) | ({decode[3]}) AS b2",
        f"({decode[4]}) | ({decode[5]}) AS c2")
    for r in back.collect():
        assert (r["a"], r["b"], r["c"]) == (r["a2"], r["b2"], r["c2"]), r


def test_compact_parquet_reduces_files_and_preserves_data(spark, tmp_path):
    """Layout ops compose: a fragmented 64-file write compacts to the
    target file count, row-for-row identical, and with order_col the
    rewritten files have disjoint ranges (stats survive compaction)."""
    from pyspark.sql import functions as F
    from kafka_streams_in_action_spark.sources.bucketed import (
        compact_parquet)

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    ev = load_table(spark, "events", SF_DIR).select("event_id", "user_id")
    ev.repartition(64).write.parquet(src)
    rep = compact_parquet(spark, src, dst, target_rows_per_file=300,
                          order_col="event_id")
    assert rep["files_before"] >= 32
    assert rep["files_after"] < rep["files_before"] / 4
    back = spark.read.parquet(dst)
    assert back.count() == rep["n_rows"] == ev.count()
    assert back.exceptAll(ev).count() == 0
    spans = sorted((r["lo"], r["hi"]) for r in back.groupBy(
        F.input_file_name()).agg(F.min("event_id").alias("lo"),
                                 F.max("event_id").alias("hi")).collect())
    for (l1, h1), (l2, _) in zip(spans, spans[1:]):
        assert h1 <= l2


def test_cms_sketch_merges_and_bounds(spark):
    """C4c: the Count-Min sketch must be (a) mergeable — cell-wise SUM of
    per-shard sketches equals the whole-corpus sketch (the property that
    lets 100 TB shard independently and roll up without rescan), and
    (b) sound — every candidate estimate >= its exact count, and within
    the e/width * N error budget on this corpus."""
    from kafka_streams_in_action_spark.operators import relational

    docs = load_table(spark, "documents", SF_DIR)
    out = relational.cms_heavy_hitters(docs).collect()
    assert len(out) > 0
    assert all(r["no_underestimate"] for r in out)
    assert all(r["within_bound"] for r in out)
    assert any(r["est"] > 0 for r in out)

    # mergeability: shard by doc_id parity, sum cells, compare grids
    def grid(d):
        words = (d.select(F.explode(F.split(F.trim("text"), " ")).alias("w"))
                 .filter(F.col("w") != ""))
        from kafka_streams_in_action_spark.operators.sampling import (
            fnv32_column)
        P, W = 2147483647, 512
        A = [1103515245, 998244353, 747796405, 1664525]
        B = [12345, 1013904223, 2531011, 69069]
        wx = words.select(fnv32_column(F.col("w")).alias("x"))
        rc = F.array(*[F.struct(
            F.lit(i).alias("row"),
            F.pmod(F.pmod(F.lit(A[i]) * F.col("x") + F.lit(B[i]),
                          F.lit(P)), F.lit(W)).alias("cell"))
            for i in range(4)])
        return {(r["row"], r["cell"]): r["n"] for r in
                wx.select(F.explode(rc).alias("rc"))
                .groupBy("rc.row", "rc.cell")
                .agg(F.count(F.lit(1)).alias("n")).collect()}

    whole = grid(docs)
    even = grid(docs.filter(F.col("doc_id") % 2 == 0))
    odd = grid(docs.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for g in (even, odd):
        for k, v in g.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_chunking_covers_and_reconstructs(spark):
    """C30n2: every document's chunks cover all its tokens (count =
    floor((n-1)/stride)+1), and stitching the non-overlapping prefixes
    (first `stride` tokens of each chunk, the whole tail chunk)
    reconstructs the original text exactly."""
    from kafka_streams_in_action_spark.operators import text as text_ops

    SIZE, STRIDE = 64, 48
    docs = load_table(spark, "documents", SF_DIR)
    chunks = text_ops.chunk_documents(docs, size=SIZE, stride=STRIDE)
    per_doc = {r["doc_id"]: r["n_chunks"] for r in
               chunks.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_chunks")).collect()}
    truth = {r["doc_id"]: (len(r["text"].strip().split(" ")) - 1) // STRIDE + 1
             for r in docs.select("doc_id", "text").collect()}
    assert per_doc == truth

    rows = chunks.orderBy("doc_id", "chunk_id").collect()
    rebuilt: dict = {}
    last_id: dict = {}
    for r in rows:
        last_id[r["doc_id"]] = r["chunk_id"]
    for r in rows:
        toks = r["chunk"].split(" ")
        keep = toks if r["chunk_id"] == last_id[r["doc_id"]] \
            else toks[:STRIDE]
        rebuilt.setdefault(r["doc_id"], []).extend(keep)
    # chunks 0..last-1 contribute tokens [i*stride, (i+1)*stride); the
    # tail chunk starts at last*stride and, because its length
    # n - last*stride <= stride <= size, contributes exactly the rest —
    # so the stitch equals the original token list verbatim.
    orig = {r["doc_id"]: r["text"].strip().split(" ")
            for r in docs.select("doc_id", "text").collect()}
    assert rebuilt == orig


def test_histogram_quantile_sketch_merges(spark):
    """C4q: the fixed-width histogram is mergeable exactly like the CMS
    grid — per-shard bin counts summed cell-wise equal the whole-corpus
    histogram (bins are computed against GLOBAL min/max, as a rollup
    pipeline would fix them once per epoch) — and both estimates sit
    within tolerance of the exact percentiles."""
    from kafka_streams_in_action_spark.operators import relational

    li = load_table(spark, "lineitem", SF_DIR)
    out = {r["q"]: r for r in relational.histogram_quantiles(li).collect()}
    assert set(out) == {0.5, 0.95}
    assert all(r["within_tol"] for r in out.values())

    x = F.col("l_extendedprice")
    b = li.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).collect()[0]
    lo, hi = b["lo"], b["hi"]

    def grid(d):
        binned = d.select(
            F.least(F.lit(255),
                    F.floor((x - F.lit(lo)) * 256 / F.lit(hi - lo + 1))
                    .cast("long")).alias("bin"))
        return {r["bin"]: r["n"] for r in
                binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
                .collect()}

    whole = grid(li)
    even = grid(li.filter(F.col("l_orderkey") % 2 == 0))
    odd = grid(li.filter(F.col("l_orderkey") % 2 == 1))
    merged: dict = {}
    for g in (even, odd):
        for k, v in g.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_contrastive_triplets_are_valid_and_trainable(spark):
    """C29r: every anchor yields exactly one triplet with three DISTINCT
    ids; positives are the true top-1 neighbors; negatives are
    deterministic (same run twice -> same triplets); and the margin
    property (pos_sim > neg_sim) holds for the overwhelming majority —
    random negatives against top-1 positives."""
    emb = load_table(spark, "embeddings", SF_DIR)
    rows = similarity.contrastive_triplets(emb).collect()
    assert len(rows) == 20
    for r in rows:
        assert len({r["anchor_id"], r["pos_id"], r["neg_id"]}) == 3, r
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in similarity.brute_force_topk(
                emb, n_queries=20, k=1).collect()}
    for r in rows:
        assert top1[r["anchor_id"]] == r["pos_id"], r
    again = similarity.contrastive_triplets(emb).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    assert sum(r["margin_ok"] for r in rows) >= 0.8 * len(rows)


def test_bloom_semi_join_no_false_negatives_across_configs(spark):
    """C6b invariant: whatever (m, k), the bloom filter NEVER loses a true
    match — the verified candidate count must equal the exact semi-join
    count. Tight m (512 bits) forces heavy false positives; the exact
    verify must still reduce them to the truth."""
    from kafka_streams_in_action_spark.operators import joins

    orders = load_table(spark, "orders", SF_DIR)
    customer = load_table(spark, "customer", SF_DIR)
    for m_bits, k in ((512, 2), (1 << 14, 3), (1 << 16, 5)):
        row = joins.bloom_semi_join(
            orders, customer, m_bits=m_bits, k=k).collect()[0]
        assert row.no_false_negatives, (m_bits, k)
        assert row.candidates_bounded, (m_bits, k)
        assert 0 < row.n_matched < row.n_orders


def test_scd2_versions_tile_each_user_timeline(spark):
    """C35c invariant: per user, version ranges are contiguous
    ([from_i+1 == to_i), exactly one open range, versions 1..n dense) —
    the property that makes the C10e point-in-time join land every fact
    in EXACTLY one version."""
    from kafka_streams_in_action_spark.operators import relational

    events = load_table(spark, "events", SF_DIR)
    hist = relational.scd2_history(events).collect()
    by_user: dict = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.version)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        open_ranges = [r for r in rows if r.effective_to_us is None]
        assert len(open_ranges) == 1 and rows[-1].is_current
        for a, b in zip(rows, rows[1:]):
            assert a.effective_to_us == b.effective_from_us, user
            assert a.attr != b.attr  # change capture collapsed equal runs


def test_phash_twins_mostly_recovered_and_no_phantom_exacts(spark):
    """C31g behavior: the re-encoded twins are the planted near-dups — the
    overwhelming majority must be recovered (clamping can flip a few bits
    past the threshold or past a band for a small minority), and every
    reported pair must satisfy the Hamming bound."""
    docs = load_table(spark, "documents", SF_DIR)
    pairs = multimodal.phash_near_dup(docs).collect()
    assert all(p.hamming <= 6 for p in pairs)
    n_twins = docs.filter(F.col("doc_id") % 5 == 0).count()
    found_twins = {p.doc_a for p in pairs
                   if p.doc_b == p.doc_a + 10_000_000}
    assert len(found_twins) >= 0.9 * n_twins


def test_bmp_reencode_roundtrip_arbitrary_pixels():
    """C31g's re-encode path: _encode_bmp_from must round-trip ARBITRARY
    pixel arrays through the real container (row padding + bottom-up
    flip), not just the formula fixtures — every width mod 4 exercised."""
    import numpy as np

    for w, h, seed in [(4, 3, 1), (5, 8, 2), (6, 1, 3), (7, 15, 4),
                       (32, 13, 5), (9, 2, 6)]:
        rng = np.random.default_rng(seed)
        rows = rng.integers(0, 256, size=(h, w * 3), dtype=np.int64) \
            .astype(np.uint8)
        pw, ph, parsed = multimodal.parse_bmp(
            multimodal._encode_bmp_from(w, h, rows))
        assert (pw, ph) == (w, h)
        assert (parsed == rows).all(), (w, h)


def test_pit_join_matches_exactly_one_version_per_fact(spark):
    """C10e invariant: the SCD2 validity ranges partition each user's
    timeline, so the point-in-time join is exactly 1:1 with the fact
    set — no fact dropped (range gap) and no fact duplicated (range
    overlap), the property that makes it leakage-safe."""
    from kafka_streams_in_action_spark.operators import joins

    events = load_table(spark, "events", SF_DIR)
    n_facts = events.filter(F.col("event_type") == "purchase").count()
    out = joins.point_in_time_join(events)
    assert out.count() == n_facts
    assert out.select("event_id").distinct().count() == n_facts
