"""Deduplication operators for the training-data pipeline (SURVEY §2C C28-C29).

Exact dedup      — md5-hash groupBy; one shuffle on the 128-bit hash, never on
                   the document text itself (at 100 TB the hash column is ~3
                   orders of magnitude smaller than the payload).
N-gram Jaccard   — exact near-dup on word-3-gram shingle sets via a shingle
                   inverted-index self-join. Quadratic only within a shingle's
                   posting list, not globally.
MinHash + LSH    — the scale path: 32 minhashes → 8 bands × 4 rows; candidate
                   pairs only where a band collides. Verified against exact
                   Jaccard on the candidates, so false positives cost one check
                   and false negatives are bounded by the banding curve.
SimHash          — 64-bit fingerprint, near-dup = Hamming distance ≤ t on
                   banded prefixes.
Embedding cosine — near-dup above a cosine threshold, brute within LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 2147483647  # 2^31 - 1, fits both engines' signed 64-bit math


def exact_dedup(documents: DataFrame) -> DataFrame:
    """C28: exact dedup on md5(text) — keep the lowest doc_id per hash."""
    return (
        documents
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_kept_documents(documents: DataFrame) -> DataFrame:
    """C28b: the surviving rows — semi-join of documents against the keeper set.
    The semi join broadcasts nothing and shuffles only (hash, doc_id)."""
    keep = exact_dedup(documents).select(F.col("keep_doc_id").alias("doc_id"))
    return (
        documents.join(keep, "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
    )


def dedup_keep_best(documents: DataFrame) -> DataFrame:
    """C28d: normalized-text dedup, keeping the BEST copy per group rather
    than the first — the policy real pipelines want when near-identical
    copies differ in completeness (keep the longest, tie-break lowest id).

    Normalization (lowercase, strip non-alphanumerics, collapse whitespace)
    widens exact dedup to case/punctuation variants; groups key on
    md5(normalized) so only a 32-char hash plus tiny metadata ever
    shuffles, never the text. Keyed window over the hash — no global sort.
    """
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
    hashed = documents.select(
        "doc_id", "n_chars", F.md5(norm).alias("text_hash"))
    w = Window.partitionBy("text_hash").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    return (
        hashed
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(
            Window.partitionBy("text_hash")))
        .filter(F.col("rn") == 1)
        .select("text_hash", F.col("doc_id").alias("keep_doc_id"),
                F.col("n_chars").alias("best_chars"), "n_copies")
    )


def substring_dup_stats(documents: DataFrame, n: int = 5) -> DataFrame:
    """C28e: per-document substring-duplication fraction — the positional
    n-gram form of Lee et al.'s substring dedup signal ("Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): a span
    is duplicated if its n-token shingle occurs in ≥2 distinct documents;
    dup_frac = duplicated positions / total positions. Pipelines threshold
    on it to drop boilerplate-heavy documents.

    Every shuffle keys on xxhash64(shingle tokens) — a FIXED 8 bytes
    regardless of n, computed directly over the token columns (no
    intermediate concatenated string, no cryptographic hash in the hot
    loop; measured 5× faster than md5-string keys at sf0.1). The text
    itself never moves: two keyed apertures — shingle-hash → distinct-doc
    count (one partial-aggregated shuffle), then the position stream
    re-joins the counts (both sides partitioned by the same hash). The
    oracle recomputes duplication over the RAW shingle strings, so a hash
    collision would surface as a mismatch — at 64 bits the collision
    probability stays negligible past 10^8 distinct shingles. dup_frac is
    one IEEE division of two exact counts: bit-identical across engines.
    """
    toks = _tokenized(documents)
    idx = F.when(
        F.size("words") >= n,
        F.sequence(F.lit(1), F.size("words") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.xxhash64(
            *[F.element_at(F.col("words"), i + j) for j in range(n)]))
    pos = toks.select("doc_id", F.explode(grams).alias("g"))
    ndocs = pos.groupBy("g").agg(F.count_distinct("doc_id").alias("nd"))
    return (
        pos.join(ndocs, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_spans"),
             F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
             .alias("n_dup_spans"))
        .select("doc_id", "n_spans", "n_dup_spans",
                (F.col("n_dup_spans").cast("double")
                 / F.col("n_spans").cast("double")).alias("dup_frac"))
    )


def ngram_containment_pairs(documents: DataFrame, threshold: float = 0.6,
                            n: int = 3) -> DataFrame:
    """C28f: asymmetric n-gram CONTAINMENT — |A∩B| / |A| — the signal
    Jaccard misses: a short document wholly embedded in a long one scores
    near 1.0 on containment but low on Jaccard (the union is dominated by
    the long doc), so subset-duplicate detection needs this denominator.
    Emits ordered (contained, container) pairs above `threshold`.

    Same inverted-index plan as the exact Jaccard path (one shuffle keyed
    on the shingle, pair agg on the id pair) — only the final scoring
    formula differs, and it stays one IEEE division of exact counts.
    """
    sets = (
        _tokenized(documents)
        .select("doc_id",
                F.explode(_shingles(F.col("words"), n)).alias("shingle"))
    )
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    a = sets.alias("a")
    b = sets.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("set_size").alias("size_a"))
    return (
        common.join(sa, "doc_a")
        .withColumn("containment",
                    F.round(F.col("n_common")
                            / F.col("size_a").cast("double"), 6))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "n_common", "containment")
    )


def boilerplate_removal(documents: DataFrame, n: int = 5,
                        min_df: int = 3) -> DataFrame:
    """C28g: corpus-level boilerplate SPAN REMOVAL — the C4 cleaning rule
    (Raffel et al., arXiv:1910.10683 §2.2 drop repeated content) applied
    positionally: any word position covered by an n-gram that occurs in
    ≥ min_df distinct documents is cut, and the surviving tokens are
    re-joined into `clean_text` in original order. Unlike the pure
    *signal* operators (substring_dup_stats scores documents; this one
    rewrites them), the output is the cleaned corpus itself — the step a
    training pipeline actually materializes.

    Scale shape: the document text NEVER shuffles. Gram keys are
    xxhash64 over the token columns (fixed 8 bytes); the gram→doc-freq
    aggregation and the covered-position expansion shuffle only
    (hash | doc_id, int) pairs. The per-doc covered-position sets are
    aggregated to one small array row per AFFECTED doc and joined back to
    the full corpus — a build side that is both column-narrow and
    row-sparse, so AQE broadcasts it at every realistic SF and the
    rebuild is a zero-shuffle map over the resident token array
    (two-arg `F.filter` lambda: position index against the covered set).
    A hash collision would fold two distinct grams' doc-freqs together;
    the oracle recomputes over raw gram strings, so any collision
    surfaces as a driver hash-mismatch (same argument as
    substring_dup_stats; ~2^-64 per pair).
    """
    base = (
        _tokenized(documents)
        .select("doc_id", "words", F.size("words").alias("n_tokens"))
    )
    idx = F.when(
        F.col("n_tokens") >= n,
        F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram_keys = F.transform(
        idx, lambda i: F.xxhash64(
            *[F.element_at(F.col("words"), i + j) for j in range(n)]))
    starts = (
        base.select("doc_id", F.posexplode(gram_keys).alias("i", "g"))
        .select("doc_id", (F.col("i") + 1).alias("pos"), "g")
    )
    boiler = (
        starts.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_df)
        .select("g")
    )
    covered = (
        starts.join(boiler, "g")
        .select("doc_id",
                F.explode(F.sequence(F.col("pos"),
                                     F.col("pos") + (n - 1))).alias("cpos"))
        .groupBy("doc_id")
        .agg(F.collect_set("cpos").alias("cov"))
    )
    keep = F.filter(
        "words",
        lambda w, i: ~F.coalesce(F.array_contains("cov", i + 1),
                                 F.lit(False)))
    return (
        base.join(covered, "doc_id", "left")
        .select("doc_id",
                F.concat_ws(" ", keep).alias("clean_text"),
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.coalesce(F.size("cov"), F.lit(0))
                .cast("long").alias("n_removed"))
    )


def _tokenized(documents: DataFrame) -> DataFrame:
    """Materialize the token array ONCE per row before any shingle lambda.

    Passing `split(text)` directly into a higher-order transform re-evaluates
    the split for every element_at inside the lambda (Catalyst does not CSE
    across lambda boundaries) — measured 5× slower at sf0.1. Shingle builders
    therefore take the materialized `words` column, never raw text."""
    return documents.select(
        "doc_id", F.split(F.trim("text"), " ").alias("words"))


def _shingles(words, n: int = 3):
    """Distinct word n-gram shingles from a materialized token-array column.

    Documents with fewer than `n` words yield an empty set (matching the
    oracle's QUALIFY lead(w, n-1) IS NOT NULL): the index range is guarded
    because F.sequence(1, upper) with upper < 1 produces a DESCENDING
    sequence — [1, 0] — and element_at(words, 0) throws, not skips.
    """
    idx = F.when(
        F.size(words) >= n,
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)]))
    return F.array_distinct(grams)


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.4,
                        n: int = 3) -> DataFrame:
    """C29a: exact n-gram Jaccard near-dup pairs above `threshold`.

    Plan: per-doc distinct shingle sets → explode into an inverted index →
    self-join on shingle (the only shuffle, keyed by shingle) → count common
    shingles per pair → Jaccard = |∩| / (|A|+|B|-|∩|).
    """
    # shingle sets + sizes, computed once and reused on both sides
    sets = (
        _tokenized(documents)
        .select("doc_id", F.explode(_shingles(F.col("words"), n)).alias("shingle"))
    )
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))

    a = sets.alias("a")
    b = sets.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common
        .join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn("jaccard",
                    F.round(F.col("n_common")
                            / (F.col("sa.set_size") + F.col("sb.set_size")
                               - F.col("n_common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _hashed_shingles(words, n: int = 3):
    """Distinct word n-gram shingles, pre-hashed to int64 INSIDE the gram
    transform — no 3-gram string is ever materialized. Shingle identity by
    64-bit hash (collision probability ~2^-64 per pair) is the MinHash-side
    representation; the exact-Jaccard path keeps true string shingles for
    oracle parity."""
    idx = F.when(
        F.size(words) >= n,
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.xxhash64(*[F.element_at(words, i + j) for j in range(n)]))
    return F.array_distinct(grams)


def minhash_signatures(documents: DataFrame, num_hashes: int = 32,
                       n: int = 3) -> DataFrame:
    """MinHash signatures: h_i(S) = min over shingles of xxhash64(gram_hash, i).

    Two-level hashing keeps the hot loop fixed-width: each gram hashes ONCE
    (inside the shingle transform, no string concat/allocation), then the
    `num_hashes` family members hash an (int64, int32) pair — ~3× faster than
    re-hashing the gram string per family member at sf0.1. All JVM built-ins,
    fully codegen'd, no Python. Deterministic across runs/partitionings.
    """
    sh = _tokenized(documents).select(
        "doc_id", F.explode(_hashed_shingles(F.col("words"), n)).alias("gh"))
    mins = [
        F.min(F.xxhash64(F.col("gh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_lsh_pairs(documents: DataFrame, num_hashes: int = 32,
                      bands: int = 8, threshold: float = 0.4,
                      n: int = 3) -> DataFrame:
    """C29b scale path: MinHash → LSH banding → candidate pairs → exact-Jaccard
    verification of candidates only.

    At 100 TB the only all-pairs structure is the band-bucket join, whose
    posting lists are tiny for non-dup corpora; everything else is linear.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, num_hashes, n)
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.xxhash64(*[F.col(f"h{bi * rows_per_band + r}")
                              for r in range(rows_per_band)]).alias("bucket"))
        for bi in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Exact-Jaccard verification on the CANDIDATES ONLY: semi-join the corpus
    # down to docs that appear in some candidate pair, then score each pair by
    # array_intersect on the two (distinct) shingle sets. Cost is O(candidates),
    # never the full inverted-index self-join — at 100 TB that global join is
    # exactly what LSH exists to avoid. Values match the exact path bitwise:
    # same |∩| / (|A|+|B|-|∩|) double division, same round(…, 6).
    cand_ids = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        _tokenized(documents.join(cand_ids, "doc_id", "left_semi"))
        .select("doc_id", _shingles(F.col("words"), n).alias("sh"))
    )
    return (
        candidates
        .join(sets.select(F.col("doc_id").alias("doc_a"),
                          F.col("sh").alias("sh_a")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"),
                          F.col("sh").alias("sh_b")), "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard",
                    F.round(F.col("n_common")
                            / (F.size("sh_a") + F.size("sh_b")
                               - F.col("n_common")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_verdict(documents: DataFrame, threshold: float = 0.1,
                        min_recall: float = 0.3, n: int = 3) -> DataFrame:
    """c29_minhash_lsh in oracle-checkable verdict form (the c4_approx_*
    pattern): run the banded-LSH near-dup path AND the exact inverted-index
    Jaccard over the same corpus, and reduce to one row the driver can
    hash-match:

    - n_exact_pairs — the exact near-dup pair count, recomputed
      independently by the DuckDB oracle's shingle CTE (real cross-engine
      signal);
    - precision_ok — every LSH pair exists in the exact set with a BITWISE
      identical jaccard (the candidates-only verification already scores
      with the same |∩|/(|A|+|B|-|∩|) double division, so any drift here is
      a bug, not noise);
    - recall_ok — the banding curve's recall stays above the pytest-pinned
      floor.

    The exact reference doubles the query's cost, which is why the BENCH
    headline times the raw scale path (`minhash_lsh_pairs`) and this form
    exists for the correctness gate."""
    lsh = minhash_lsh_pairs(documents, threshold=threshold, n=n)
    # the exact pair set feeds BOTH the precision join and the
    # n_exact_pairs count — materialize once instead of replaying the
    # inverted-index self-join per consumer (optimization r14, guide §1.2;
    # bounded: near-dup pairs only)
    exact = (ngram_jaccard_pairs(documents, threshold=threshold, n=n)
             .withColumnRenamed("jaccard", "j_exact")
             .localCheckpoint(eager=False))
    m = (lsh.withColumnRenamed("jaccard", "j_lsh")
         .join(exact, ["doc_a", "doc_b"], "left"))
    stats = m.agg(
        F.count(F.lit(1)).alias("n_lsh"),
        F.sum(F.when(F.col("j_exact").isNotNull()
                     & (F.col("j_exact") == F.col("j_lsh")), 1)
              .otherwise(0)).alias("n_valid"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    return stats.crossJoin(n_exact).select(
        "n_exact_pairs",
        (F.col("n_valid") == F.col("n_lsh")).alias("precision_ok"),
        (F.col("n_lsh") >= F.lit(min_recall) * F.col("n_exact_pairs"))
        .alias("recall_ok"),
    )


def minhash_reingest_pairs(documents: DataFrame, n_planted: int = 20,
                           id_offset: int = 100000,
                           threshold: float = 0.99) -> DataFrame:
    """C29b in MinHash-LSH's DETERMINISTIC regime: re-sent duplicate
    detection. The first `n_planted` documents re-enter under new ids;
    identical texts produce identical shingle sets, hence identical MinHash
    signatures, hence collide in EVERY band — recall is exactly 1.0, not a
    banding-curve probability, which is why this registration carries a
    full DuckDB oracle while the general near-dup form (`minhash_lsh_pairs`
    at permissive thresholds) is recall-pinned by pytest instead. Jaccard
    ≥ 0.99 on ~50-shingle sets forces set equality, so no sub-identical
    pair can slip in."""
    planted = (documents.filter(F.col("doc_id") < n_planted)
               .withColumn("doc_id", F.col("doc_id") + F.lit(id_offset)))
    return minhash_lsh_pairs(documents.union(planted), threshold=threshold)


def simhash_fingerprints(documents: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash: per-token 64-bit xxhash64, bit-majority vote → one fingerprint
    per doc. Expressed entirely in higher-order functions (no UDF): for each bit
    position, sum(+1/-1 by bit) and take the sign.
    """
    tokens = documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " "))).alias("token"))
    hashed = tokens.select("doc_id", F.xxhash64("token").alias("h"))
    # per-bit votes: shiftright + parity; aggregated per doc in one pass
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1,
                     F.lit(1)).otherwise(F.lit(-1))).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = hashed.groupBy("doc_id").agg(*votes)
    # Bits 0..62 compose as positive powers of two; bit 63 (the long sign bit)
    # is added as -2^63 — in two's complement that is exactly "only bit 63
    # set" — so all 64 majority votes land in the fingerprint and Hamming /
    # banding see the full 64 bits.
    low = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0))
         * F.lit(1 << i) for i in range(min(bits, 63))),
        start=F.lit(0).cast("long"),
    )
    if bits >= 64:
        top = F.when(F.col("b63") > 0,
                     F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = low + top
    else:
        fingerprint = low
    return per_doc.select("doc_id", fingerprint.alias("simhash"))


def _min_label_components(ids: DataFrame, pairs: DataFrame, id_name: str,
                          max_iter: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation (the
    GraphX/Pregel algorithm on plain DataFrames), shared by the embedding-
    and text-side cluster operators. `ids` is one column named `id_name`;
    `pairs` has columns (src, dst) with ids from the same domain. Every node
    starts as its own label; each round takes the min of its own and its
    neighbors' labels; converged when a round changes nothing. Rounds needed
    = graph diameter (near-dup components are near-cliques, so small); each
    round is one keyed shuffle. localCheckpoint truncates per-round lineage
    so the plan doesn't grow superlinearly — construction runs Spark jobs
    (the declared iterative-algorithm surface, exempt from the no-collect
    plan contract like the ANN index builds)."""
    edges = (
        pairs.select("src", "dst")
        .union(pairs.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
        .localCheckpoint(eager=True)  # score pairs once, not per round
    )
    labels = ids.select(
        id_name, F.col(id_name).alias("cluster_id")).localCheckpoint(True)

    # Optimization r15 (guide §2.2): size the LOOP shuffles to the loop's
    # own frames, not the ambient width tuned for the data-scale edge
    # build (already checkpointed above). Each round shuffles only the
    # label vector and the edge list; at gate scale those are thousands
    # of rows, so 32 ambient partitions just multiply task-launch
    # overhead across ~2 actions/round — interleaved A/B on the
    # exact-edge CC at sf0.1: width 32 = 1.5-2.1 s, width 4 = 1.1-1.3 s
    # per propagation. The width is derived from the materialized
    # row counts (cheap counts over checkpointed frames; this is the
    # declared iterative surface, exempt from the no-collect contract)
    # with the same ~50k rows/partition rule as _parts_for, so a 100 TB
    # corpus grows the loop width back toward the ambient cap instead of
    # pinning a local-mode constant.
    from .graph import _few_shuffle_partitions

    spark = edges.sparkSession
    ambient = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_loop = max(edges.count(), labels.count())
    loop_parts = max(4, min(ambient, int(n_loop // 50_000) + 1))
    with _few_shuffle_partitions(spark, loop_parts):
        for _ in range(max_iter):
            nbr_min = (
                edges.join(labels, edges.src == labels[id_name])
                .groupBy(F.col("dst").alias(id_name))
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            # carry the previous label through the checkpoint so
            # convergence is a filter-count over the materialized frame —
            # not a second keyed join per round (one shuffle saved per
            # iteration)
            stepped = (
                labels.join(nbr_min, id_name, "left")
                .select(id_name, F.col("cluster_id").alias("_prev"),
                        F.least(F.col("cluster_id"),
                                F.coalesce("nbr_min", F.col("cluster_id")))
                        .alias("cluster_id"))
                .localCheckpoint(eager=True)
            )
            changed = stepped.filter(
                F.col("_prev") != F.col("cluster_id")).count()
            labels = stepped.drop("_prev")
            if changed == 0:
                break
    return labels


def minhash_clusters(documents: DataFrame, threshold: float = 0.1,
                     n: int = 3, max_iter: int = 20,
                     edge_source: str = "exact") -> DataFrame:
    """C29q: TEXT-side dedup clusters — connected components of the n-gram
    Jaccard near-dup graph, every document labeled with the smallest doc_id
    in its component. Completes the dedup story to parity with the
    embedding side (near_dup_clusters): the pair list alone can't collapse
    A~B, B~C into one cluster when A~C is below threshold, and a training
    pipeline keeps exactly one representative per component.

    Two edge sources behind the same signature:
    - "exact": the inverted-index exact-Jaccard pair graph
      (ngram_jaccard_pairs) — engine-replicable arithmetic, so the
      registered query carries a FULL oracle (DuckDB recursive CTE over
      its own shingle-join pair graph);
    - "lsh": MinHash-LSH candidate pairs (minhash_lsh_pairs) — the 100 TB
      path, linear outside banded posting-list joins. LSH edges are a
      subset of exact edges (candidates are exact-verified), so its
      components REFINE the exact components; pytest pins that refinement
      plus a coverage floor, the same split as the pair-level operators
      (full oracle on the replicable regime, pinned recall on the banded
      one).

    The clustered graph is the n-gram near-dup graph UNION exact-text-
    equality edges: exact clones always belong to their representative's
    component, including texts with fewer than n tokens (zero shingles →
    no Jaccard pair, but they are still duplicates a pipeline must
    collapse). Exact duplicates are collapsed to their min-doc_id
    representative BEFORE pair generation (the c28_edit_verify
    rep-collapse discipline): blocked pair generation is quadratic in
    duplicate-cluster size — on the 10× copy-synthesized probe data the
    un-collapsed pair graph grows ~100× (measured 6.26× wall growth;
    2.0× with the collapse). The final labels are PROVABLY identical to
    the full graph's: rep = min doc_id per text, so every clone's id
    exceeds its rep's, hence a component's min doc_id equals the min
    over its representatives — attaching clones to their rep's cluster
    reproduces the full-graph labeling exactly for every token count,
    because the exact-equality edges are precisely the clone↔rep
    relation the collapse replays (the registered FULL oracle computes
    the union graph and hash-matches; the sub-n-token case is pinned by
    test_minhash_clusters_short_doc_clones).
    """
    hashed = documents.withColumn("_h", F.md5("text"))
    rep = hashed.groupBy("_h").agg(F.min("doc_id").alias("rep_id"))
    with_rep = hashed.join(rep, "_h")
    reps = (with_rep.filter(F.col("doc_id") == F.col("rep_id"))
            .select("doc_id", "text"))
    if edge_source == "exact":
        pairs = ngram_jaccard_pairs(reps, threshold=threshold, n=n)
    elif edge_source == "lsh":
        pairs = minhash_lsh_pairs(reps, threshold=threshold, n=n)
    else:
        raise ValueError(f"unknown edge_source {edge_source!r}")
    rep_labels = _min_label_components(
        reps.select("doc_id"),
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")),
        "doc_id", max_iter)
    return (with_rep
            .join(rep_labels.withColumnRenamed("doc_id", "rep_id"),
                  "rep_id")
            .select("doc_id", "cluster_id"))


def minhash_clusters_lsh_verdict(documents: DataFrame,
                                 threshold: float = 0.1, n: int = 3,
                                 min_coverage: float = 0.3) -> DataFrame:
    """C29q driver row for the 100 TB edge source of minhash_clusters:
    run BOTH labelings — exact inverted-index edges and banded MinHash-LSH
    edges — and reduce them to a 1-row verdict the oracle can replay from
    the exact graph alone:

    - n_docs / n_exact_grouped: exact values DuckDB recomputes from its
      own shingle-join recursive-CTE components;
    - refines_ok: every LSH component maps into exactly ONE exact
      component (LSH candidate edges are exact-verified, hence a subset —
      components can only split, never merge across);
    - coverage_ok: of the docs the exact graph groups (non-singleton
      component), at least `min_coverage` are also grouped by the LSH
      labeling — the banded regime's recall floor, same split as the
      pair-level operators.

    All reductions are keyed aggregates over the two label frames plus
    1-row broadcast scalars; nothing is collected. The same per-doc
    refinement/coverage structure is pinned row-by-row in pytest
    (test_minhash_clusters_lsh_refines_exact); this row makes the scale
    path's invariants driver-visible at sf0.01.

    The rep-collapse (see minhash_clusters) is computed ONCE and shared
    by both labelings — the verdict needs both on the same corpus, so
    paying the md5 + min-groupBy twice would be pure overhead."""
    hashed = documents.withColumn("_h", F.md5("text"))
    rep = hashed.groupBy("_h").agg(F.min("doc_id").alias("rep_id"))
    # both frames feed BOTH labelings and every CC iteration —
    # materialize once (bounded: ≤ one row per doc / per distinct text)
    with_rep = (hashed.join(rep, "_h").select("doc_id", "rep_id")
                .localCheckpoint(eager=True))
    reps = (with_rep.filter(F.col("doc_id") == F.col("rep_id"))
            .join(documents, "doc_id").select("doc_id", "text")
            .localCheckpoint(eager=True))

    def labels(edge_source: str, out: str) -> DataFrame:
        pair_fn = (ngram_jaccard_pairs if edge_source == "exact"
                   else minhash_lsh_pairs)
        rl = _min_label_components(
            reps.select("doc_id"),
            pair_fn(reps, threshold=threshold, n=n)
            .select(F.col("doc_a").alias("src"),
                    F.col("doc_b").alias("dst")),
            "doc_id")
        return (with_rep
                .join(rl.withColumnRenamed("doc_id", "rep_id"), "rep_id")
                .select("doc_id", F.col("cluster_id").alias(out)))

    exact = labels("exact", "cluster_id")
    lsh = labels("lsh", "lsh_cluster")
    # `both` feeds FOUR consumers (two size rollups, the doc stats, the
    # refinement max) — materialize the bounded per-doc label frame once
    # instead of re-running both rep-collapse joins per consumer
    # (optimization r14, guide §1.2)
    both = exact.join(lsh, "doc_id").localCheckpoint(eager=False)
    ex_sz = both.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("ex_sz"))
    lsh_sz = (both.groupBy("lsh_cluster")
              .agg(F.count(F.lit(1)).alias("lsh_sz")))
    flagged = both.join(ex_sz, "cluster_id").join(lsh_sz, "lsh_cluster")
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("ex_sz") > 1).cast("long")).alias("n_exact_grouped"),
        F.sum(((F.col("ex_sz") > 1) & (F.col("lsh_sz") > 1)).cast("long"))
         .alias("n_both_grouped"))
    refmax = (both.groupBy("lsh_cluster")
              .agg(F.countDistinct("cluster_id").alias("ne"))
              .agg(F.max("ne").alias("max_exact_per_lsh")))
    return stats.crossJoin(F.broadcast(refmax)).select(
        "n_docs", "n_exact_grouped",
        (F.col("max_exact_per_lsh") <= 1).alias("refines_ok"),
        (F.col("n_both_grouped").cast("double")
         >= F.lit(min_coverage) * F.col("n_exact_grouped").cast("double"))
        .alias("coverage_ok"))


def near_dup_clusters(embeddings: DataFrame, threshold: float = 0.35,
                      max_iter: int = 20) -> DataFrame:
    """C29d: dedup *clusters* — connected components of the near-dup pair
    graph, each vector labeled with the smallest vec_id in its component
    (the canonical representative a dedup pipeline keeps). The step the
    pair list alone doesn't give you: A~B and B~C must collapse to one
    cluster even when A~C is below threshold.

    Iterative min-label propagation (the GraphX/Pregel connected-components
    algorithm on plain DataFrames): every node starts as its own label; each
    round takes the min of its label and its neighbors' labels; converged
    when a round changes nothing. Rounds needed = graph diameter — for
    near-dup graphs that's small (components are near-cliques), and each
    round is one keyed shuffle, fully distributed. localCheckpoint truncates
    the per-round lineage so the plan doesn't grow superlinearly.

    This is the declared iterative-algorithm surface: construction runs
    Spark jobs (exempt from the no-collect plan contract, like the ANN
    index builds); the oracle is a DuckDB recursive CTE over the same
    pair graph.

    Edge generation routes through the blocked-matmul pair scorer
    (similarity.cosine_near_dup_pairs) — shuffle-keyed cogroup tiles, no
    BroadcastNestedLoopJoin over the corpus — so the clustering path keeps
    the exact edge set (hash-matching the recursive-CTE oracle) with a plan
    that survives scale-up.
    """
    from .similarity import cosine_near_dup_pairs

    pairs = cosine_near_dup_pairs(embeddings, threshold)
    return _min_label_components(
        embeddings.select("vec_id"),
        pairs.select(F.col("vec_a").alias("src"),
                     F.col("vec_b").alias("dst")),
        "vec_id", max_iter)


def _simhash_band_structs(simhash, scheme: str):
    """4 × 16-bit band chunks from a 64-bit fingerprint. Both schemes are
    pigeonhole-complete at hamming ≤ 3 (4 disjoint bands, ≤ 3 differing bits
    → some band is identical), but they partition the bits DIFFERENTLY:
    - contiguous: band i = bits [16i, 16i+16)  (one shift+mask per band)
    - interleaved: band i = bits {j : j mod 4 == i}
    Any bug in fingerprint construction, bit extraction, or the bucket join
    shows up as a pair-set disagreement between the two (simhash_verdict)."""
    if scheme == "contiguous":
        return [
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(simhash, i * 16)
                     .bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
            for i in range(4)
        ]
    assert scheme == "interleaved", scheme
    out = []
    for i in range(4):
        chunk = F.lit(0).cast("long")
        for r in range(16):
            chunk = chunk + (
                F.shiftrightunsigned(simhash, 4 * r + i)
                .bitwiseAND(F.lit(1)) * F.lit(1 << r))
        out.append(F.struct(F.lit(i).alias("band"), chunk.alias("chunk")))
    return out


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 3,
                       scheme: str = "contiguous") -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ t between simhashes. Candidate
    generation by 4-band prefix blocking (pigeonhole: ≤3 differing bits over 4
    bands leaves ≥1 identical band), then exact popcount check."""
    fp = simhash_fingerprints(documents)
    bands = fp.select(
        "doc_id", "simhash",
        F.explode(F.array(
            *_simhash_band_structs(F.col("simhash"), scheme))).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.chunk")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("a.simhash").alias("sh_a"),
                F.col("b.doc_id").alias("doc_b"), F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_verdict(documents: DataFrame, max_hamming: int = 3,
                    n_planted: int = 20,
                    id_offset: int = 100000) -> DataFrame:
    """c29_simhash in oracle-checkable verdict form. The fingerprints are
    xxhash64-derived, so DuckDB can't replicate the raw pair set; what IS
    checkable:

    - n_planted_found — `n_planted` exact duplicates are planted under
      shifted ids; identical text → identical fingerprint → hamming 0, so
      EVERY planted pair must surface (deterministic count the oracle emits
      as a literal);
    - blockings_agree — the pair set from contiguous 16-bit bands equals
      the pair set from bit-interleaved bands. Both schemes are pigeonhole-
      complete at hamming ≤ 3, so the sets must be IDENTICAL; they share no
      extraction code, making this a real self-consistency check on the
      fingerprint + banding pipeline;
    - hamming_ok — no emitted pair exceeds the declared distance bound."""
    planted = (documents.filter(F.col("doc_id") < n_planted)
               .withColumn("doc_id", F.col("doc_id") + F.lit(id_offset)))
    aug = documents.union(planted)
    p1 = simhash_near_pairs(aug, max_hamming, scheme="contiguous") \
        .withColumn("in_a", F.lit(1))
    p2 = simhash_near_pairs(aug, max_hamming, scheme="interleaved") \
        .withColumn("in_b", F.lit(1))
    merged = p1.join(p2, ["doc_a", "doc_b", "hamming"], "full_outer")
    stats = merged.agg(
        F.sum(F.when(F.col("in_a").isNull() | F.col("in_b").isNull(), 1)
              .otherwise(0)).alias("n_disagree"),
        F.max("hamming").alias("max_h"),
        F.sum(F.when((F.col("doc_b") == F.col("doc_a") + id_offset)
                     & (F.col("doc_a") < n_planted), 1)
              .otherwise(0)).alias("n_planted_found"))
    return stats.select(
        "n_planted_found",
        (F.col("n_disagree") == 0).alias("blockings_agree"),
        (F.col("max_h") <= max_hamming).alias("hamming_ok"),
    )


def edit_verified_pairs(documents: DataFrame, threshold: float = 0.6,
                        n: int = 3) -> DataFrame:
    """C28h: edit-distance VERIFICATION of candidate duplicate pairs — the
    second stage of the classic block-then-verify fuzzy-dedup pipeline.
    Shingle containment (stage 1, ngram_containment_pairs) is a set
    signal: it ignores token order and multiplicity, so a containment hit
    can still be a very different document. Character-level Levenshtein
    is the order-sensitive ground truth, but it is O(len²) per pair — at
    100 TB it can only ever run on a blocked candidate set, never all
    pairs. This operator is exactly that discipline: candidates from the
    inverted-index containment join (shuffles only shingle keys and id
    pairs), then ONE keyed join per side pulls the two texts together and
    a single JVM `levenshtein` call scores each surviving pair.

    `edit_sim` = 1 − lev / max(len_a, len_b) ∈ [0, 1]: the normalized
    similarity a keep/drop rule thresholds on. Both the distance and the
    normalization replay exactly in DuckDB (FULL oracle) — both engines
    implement classic unit-cost Levenshtein.

    Pipeline-order discipline, load-bearing at scale: candidates are
    generated over the EXACT-DEDUPED representative set (min doc_id per
    md5(text) — the C28 keeper rule), never the raw corpus. Candidate
    pairs are quadratic in duplicate-cluster size, so running the
    blocked join on a corpus that still contains exact copies multiplies
    every cluster's pairs by copies² — the 10× probe measured exactly
    that pathology (50 → 501 k candidates on copy-synthesized data)
    before this guard; with it, copies collapse to one representative,
    inherit its verdicts, and candidate growth tracks corpus growth.
    The collapse shuffles only (md5, doc_id) — never text.
    """
    keep = exact_dedup(documents).select(
        F.col("keep_doc_id").alias("doc_id"))
    # reps feeds THREE consumers (candidate generation + both text pulls);
    # materialize the deduped corpus once instead of re-running the
    # md5-collapse semi-join per consumer (optimization r14, guide §1.2 —
    # at 100 TB this is two saved corpus scans)
    reps = (documents.join(keep, "doc_id", "left_semi")
            .localCheckpoint(eager=False))
    pairs = ngram_containment_pairs(reps, threshold=threshold, n=n)
    ta = reps.select(F.col("doc_id").alias("doc_a"),
                     F.col("text").alias("text_a"))
    tb = reps.select(F.col("doc_id").alias("doc_b"),
                     F.col("text").alias("text_b"))
    return (
        pairs.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("lev_dist", F.levenshtein("text_a", "text_b"))
        .withColumn(
            "edit_sim",
            F.round(1.0 - F.col("lev_dist").cast("double")
                    / F.greatest(F.length("text_a"), F.length("text_b"))
                      .cast("double"), 6))
        .select("doc_a", "doc_b", "containment", "lev_dist", "edit_sim")
    )


def paragraph_dedup(documents: DataFrame, delim: str = " the ") -> DataFrame:
    """C28i: paragraph-granular corpus dedup with document reassembly —
    the CCNet cleaning step (Wenzek et al., arXiv:1911.00359 §3.1: hash
    every paragraph, drop all but the first corpus-wide occurrence,
    rebuild documents from the survivors). Operates between C28 exact
    dedup (whole-document) and C28g boilerplate removal (positional
    n-grams): the unit of dedup is the SEGMENT, and the output is the
    rebuilt corpus. The gate-data documents carry no newline structure,
    so segments split on a fixed delimiter token sequence; the operator
    is generic over `delim` (a real corpus passes "\\n\\n").

    Scale shape: the first-occurrence decision is a groupBy on the
    segment's md5 aggregating min(struct(doc_id, pos)) — a map-side-
    combinable partial agg that shuffles only (hash, doc_id, pos); the
    only segment-text movements are the survivor join (keyed on hash +
    position) and the per-document reassembly groupBy — both linear,
    and text a pipeline must rewrite has to move at least once. A
    segment-hash collision folds two distinct paragraphs; the oracle
    groups by the raw segment string, so any collision surfaces as a
    driver mismatch (same argument as boilerplate_removal).

    Output: (doc_id, n_segs, n_kept, clean_text) — docs whose every
    segment was already seen elsewhere keep a row with clean_text ''.
    """
    segs = (documents
            .select("doc_id",
                    F.posexplode(F.split("text", delim)).alias("pos", "seg"))
            .filter(F.col("seg") != "")
            .withColumn("h", F.md5("seg")))
    firsts = (segs.groupBy("h")
              .agg(F.min(F.struct("doc_id", "pos")).alias("f"))
              .select("h", F.col("f.doc_id").alias("doc_id"),
                      F.col("f.pos").alias("pos")))
    kept = segs.join(firsts, ["h", "doc_id", "pos"], "left_semi")
    per_doc = segs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda x: x.seg),
            delim).alias("clean_text"))
    return (per_doc.join(rebuilt, "doc_id", "left")
            .select("doc_id", "n_segs",
                    F.coalesce("n_kept", F.lit(0).cast("long"))
                    .alias("n_kept"),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text")))


def lsh_recall_curve(documents: DataFrame,
                     thresholds=(0.1, 0.2, 0.4),
                     min_recall: float = 0.3, n: int = 3) -> DataFrame:
    """C29u: banding recall curve — the LSH quality gauge across a
    THRESHOLD SWEEP, one verdict row per operating point, extending the
    single-point c29_minhash_lsh verdict the way c39_blocking extends
    c39_link: before trusting a near-dup threshold in production, read
    its measured recall against the exact pair set. One LSH run at the
    most permissive threshold and one exact inverted-index run supply
    every point (a pair scored at jaccard j serves every t ≤ j), so the
    sweep costs no more than the single verdict.

    Verdict form (engine-hash-dependent candidates, the c4_approx_*
    pattern): n_exact_pairs per threshold is the real cross-engine
    signal (the oracle recomputes it from its own shingle CTE);
    precision_ok asserts every surviving LSH pair carries a BITWISE
    identical exact jaccard; recall_ok asserts the banding curve stays
    above the pytest-pinned floor at every point."""
    t0 = thresholds[0]
    # both pair sets feed TWO consumers below (the recall join and the
    # per-threshold exact counts); without materialization Spark replays
    # the full shingle self-join / banded-LSH pipeline per consumer
    # (optimization r14, guide §1.2 — measured ~2 s of pure recompute at
    # sf0.1). Bounded: near-dup pairs, never the corpus.
    lsh = (minhash_lsh_pairs(documents, threshold=t0, n=n)
           .withColumnRenamed("jaccard", "j_lsh")
           .localCheckpoint(eager=False))
    exact = (ngram_jaccard_pairs(documents, threshold=t0, n=n)
             .withColumnRenamed("jaccard", "j_exact")
             .localCheckpoint(eager=False))
    tcol = F.explode(F.array(*[F.lit(float(t)) for t in thresholds]))
    lsh_t = (lsh.join(exact, ["doc_a", "doc_b"], "left")
             .withColumn("threshold", tcol)
             .filter(F.col("j_lsh") >= F.col("threshold"))
             .groupBy("threshold")
             .agg(F.count(F.lit(1)).alias("n_lsh"),
                  F.sum(F.when(F.col("j_exact").isNotNull()
                               & (F.col("j_exact") == F.col("j_lsh")),
                               1).otherwise(0)).alias("n_valid")))
    exact_t = (exact.withColumn("threshold", tcol)
               .filter(F.col("j_exact") >= F.col("threshold"))
               .groupBy("threshold")
               .agg(F.count(F.lit(1)).alias("n_exact_pairs")))
    return (exact_t.join(lsh_t, "threshold", "left")
            .select("threshold", "n_exact_pairs",
                    (F.coalesce(F.col("n_valid"), F.lit(0))
                     == F.coalesce(F.col("n_lsh"), F.lit(0)))
                    .alias("precision_ok"),
                    (F.coalesce(F.col("n_lsh"), F.lit(0))
                     >= F.lit(min_recall) * F.col("n_exact_pairs"))
                    .alias("recall_ok")))


def shard_overlap_matrix(documents: DataFrame, n_shards: int = 8) -> DataFrame:
    """C28j: cross-shard contamination matrix — after sharding a corpus
    (content-addressed FNV of the key, the c32 split discipline), how many
    distinct document contents appear in more than one shard? The
    dataset-vs-dataset overlap audit run before mixing sources into a
    training corpus (each shard standing in for a source); the pairwise
    grain localizes WHICH pair leaks, where a single global dup-count
    cannot.

    Scale: text never shuffles — only (shard, md5) fingerprint rows; the
    overlap is a hash equi-join on the fingerprint (candidates = docs
    sharing a hash, never all pairs) into a ≤ C(n_shards,2)-row matrix.
    The shard key is the JVM column-algebra FNV fold (exact for the
    all-digit doc_id), not the pandas-UDF byte fold — same value, but
    codegen-side instead of an ArrowEvalPython scan (verdict r9 item 3
    class)."""
    from .sampling import fnv32_column

    sh = F.pmod(fnv32_column(F.col("doc_id").cast("string")),
                F.lit(n_shards)).cast("int")
    h = (documents.select(sh.alias("shard"), F.md5("text").alias("h"))
         .distinct())
    pairs = h.alias("a").join(
        h.alias("b"),
        (F.col("a.h") == F.col("b.h")) &
        (F.col("a.shard") < F.col("b.shard")))
    return (pairs.groupBy(F.col("a.shard").alias("shard_a"),
                          F.col("b.shard").alias("shard_b"))
            .agg(F.countDistinct("a.h").alias("n_shared")))


# --- content-defined chunking (C28k) --------------------------------------

_CDC_WINDOW = 16
_CDC_MOD = 2147483647          # 2^31 − 1 (Mersenne): modmult fits int64
_CDC_BASE = 131
_CDC_MASK = 64                 # boundary when H % 64 == 0 → ~64-char chunks


def _cdc_powers(n: int):
    """(inv^j, B^j) mod M for j < n — shared across a kernel batch."""
    import numpy as np

    inv = pow(_CDC_BASE, _CDC_MOD - 2, _CDC_MOD)          # Fermat inverse
    invp = np.empty(n, dtype=np.int64)
    powp = np.empty(n, dtype=np.int64)
    a, b = 1, 1
    for i in range(n):                                    # O(n) scalar mults
        invp[i], powp[i] = a, b
        a = (a * inv) % _CDC_MOD
        b = (b * _CDC_BASE) % _CDC_MOD
    return invp, powp


def _cdc_boundaries(text: str, invp=None, powp=None):
    """Boundary positions (1-based, inclusive chunk ends) of the pure
    positional CDC rule: position i ≥ W is a boundary iff the polynomial
    hash of the trailing W chars — h = fold((a·B + ord(c)) mod M) — is
    ≡ 0 (mod MASK). Content-defined: the window hash depends only on the
    window's code points, so an insertion re-synchronizes within W chars
    (the shift-resistance exact dedup lacks). Vectorized via prefix
    hashing with precomputed inverse powers; every intermediate is
    bounded to fit int64 exactly, so this equals the 16-step scalar fold
    the oracle runs, bit for bit."""
    import numpy as np

    n = len(text)
    if n < _CDC_WINDOW:
        return []
    if invp is None or len(invp) < n:
        invp, powp = _cdc_powers(n)
    c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.int64)
    term = (c % _CDC_MOD) * invp[:n] % _CDC_MOD           # < 2^31
    q = np.concatenate(([0], np.cumsum(term)))            # exact int64
    s = (q[_CDC_WINDOW:] - q[:-_CDC_WINDOW]) % _CDC_MOD   # Σ c_j·B^{-j}
    # canonicalize: multiply by B^e (e = window end, 0-based) so equal
    # content gives equal hash at any position
    h = s * powp[_CDC_WINDOW - 1:n] % _CDC_MOD
    return (np.flatnonzero(h % _CDC_MASK == 0) + _CDC_WINDOW).tolist()


def cdc_chunk_stats(documents: DataFrame) -> DataFrame:
    """C28k: content-defined chunking + chunk-level dup audit — the
    storage/dedup primitive (LBFS/rsync lineage) that fixed-width
    chunking can't replicate: because boundaries derive from CONTENT
    (a rolling-window hash hitting a mask), inserting one character
    shifts at most the chunk it lands in, so near-identical documents
    still share almost all chunk fingerprints. Per document: chunk
    count and the fraction of its chunks whose content appears in ≥2
    documents (cf. c28_substring_dup's fixed 5-gram spans).

    Scale: chunking runs in the Arrow kernel — document text NEVER
    shuffles; only (doc_id, md5) chunk fingerprints reach the exchange,
    and the dup test is a fingerprint hash-join. The kernel's prefix-
    hash vectorization is exactly congruent to the oracle's per-position
    16-step fold (same modulus, base, and code points)."""
    import hashlib

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            ids, hs = [], []
            maxlen = max((len(str(t)) for t in pdf["text"]), default=0)
            invp, powp = _cdc_powers(max(maxlen, 1))
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                t = str(text)
                bnds = _cdc_boundaries(t, invp, powp)
                starts = [0] + bnds
                ends = bnds + ([len(t)] if (not bnds or bnds[-1] < len(t))
                               else [])
                for s, e in zip(starts, ends):
                    ids.append(int(did))
                    hs.append(hashlib.md5(
                        t[s:e].encode("utf-8")).hexdigest())
            yield pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                                "h": pd.array(hs, dtype="string")})

    chunks = documents.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, h string")
    nd = chunks.groupBy("h").agg(
        F.countDistinct("doc_id").alias("nd"))
    return (chunks.join(nd, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                 .cast("long").alias("n_dup_chunks"))
            .withColumn("dup_frac",
                        F.col("n_dup_chunks").cast("double") /
                        F.col("n_chunks").cast("double")))
