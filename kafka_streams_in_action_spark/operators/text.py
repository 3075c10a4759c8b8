"""Text analysis for the training-data pipeline (SURVEY §2C C30).

Everything except the mapInPandas tokenizer (deliberately exercising the UDTF
surface, C21) is built-in column algebra: split/explode/aggregate are codegen'd
and shuffle only on the explicit group keys (word, doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 2147483647

# Tiny stopword inventories for the language-ID heuristic. The testdata's lang
# labels are synthetic (all docs share one vocabulary), so the operator contract
# is the *heuristic itself*, mirrored exactly in the oracle SQL — not label
# recovery.
EN_STOPWORDS = ("the", "a", "of", "and", "to")


def _words(text_col):
    return F.split(F.trim(text_col), " ")


def word_frequency(documents: DataFrame, min_count: int = 10) -> DataFrame:
    """C30a: corpus word frequency — explode + count, shuffled on the word."""
    return (
        documents
        .select(F.explode(_words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )


def doc_stats(documents: DataFrame) -> DataFrame:
    """C30b: per-document stats — token count, distinct tokens, avg token length,
    char count. One pass, no shuffle (per-row higher-order fns)."""
    words = _words(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        F.round(F.aggregate(words, F.lit(0).cast("long"),
                            lambda acc, w: acc + F.length(w)).cast("double")
                / F.size(words), 6).alias("avg_token_len"),
        F.length("text").alias("n_chars_actual"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """C30c: stopword-ratio language heuristic. ratio = |stopword tokens| /
    |tokens|; guess 'en' above 2%, else 'unknown'."""
    words = _words(F.col("text"))
    stop_hits = F.size(F.filter(
        words, lambda w: F.lower(w).isin(*EN_STOPWORDS)))
    ratio = F.round(stop_hits.cast("double") / F.size(words), 6)
    return documents.select(
        "doc_id", "lang",
        ratio.alias("stopword_ratio"),
        F.when(ratio > 0.02, F.lit("en")).otherwise(F.lit("unknown"))
            .alias("lang_guess"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """C30d: heuristic quality score — length, mean token length, and
    distinct-token diversity folded into [0,1]."""
    words = _words(F.col("text"))
    n_tokens = F.size(words)
    diversity = F.size(F.array_distinct(words)).cast("double") / n_tokens
    length_score = F.least(n_tokens.cast("double") / F.lit(200.0), F.lit(1.0))
    return documents.select(
        "doc_id",
        F.round(diversity, 6).alias("diversity"),
        F.round(length_score, 6).alias("length_score"),
        F.round((diversity + length_score) / 2, 6).alias("quality"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """C30e: token counting — whitespace tokens and a BPE-ish proxy
    ceil(n_chars / 4) (the common chars-per-token heuristic)."""
    return documents.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("ws_tokens"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("bpe_est"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """C30f: rolling polynomial fingerprint over the token stream —
    fold(31·acc + code(w)) mod (2^31-1) with code(w) = 7·len(w) + ord(w[0]).
    Order-sensitive (a permuted doc fingerprints differently), cheap, and
    expressible in both engines as a sequential fold."""
    words = _words(F.col("text"))
    codes = F.transform(
        words, lambda w: F.length(w) * 7 + F.ascii(F.substring(w, 1, 1)))
    fp = F.aggregate(codes, F.lit(0).cast("long"),
                     lambda acc, c: (acc * 31 + c) % HASH_MOD)
    return documents.select("doc_id", fp.alias("fingerprint"))


def tokenize_udtf(documents: DataFrame) -> DataFrame:
    """C21 (UDTF surface): text → token rows via mapInPandas — the engine's
    table-function extension point (reference analog: the RecordProcessor
    interface, pipelining_consumer_client.go:13-16). Arrow-batched; never
    row-at-a-time."""
    import pandas as pd  # noqa: F401 — local import keeps executors lean

    def tokenize(batches):
        for pdf in batches:
            toks = pdf["text"].str.strip().str.split(" ")
            out = pdf[["doc_id"]].copy()
            out["tokens"] = toks
            exploded = out.explode("tokens").rename(columns={"tokens": "token"})
            exploded = exploded[exploded["token"].astype(bool)]
            yield exploded[["doc_id", "token"]]

    return documents.select("doc_id", "text").mapInPandas(
        tokenize, schema="doc_id long, token string")


def tokenize_wordfreq(documents: DataFrame, min_count: int = 10) -> DataFrame:
    """C21 end-to-end: UDTF tokenizer feeding a frequency agg (oracle-matched
    against the pure-SQL split/unnest form)."""
    return (
        tokenize_udtf(documents)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )


def repetition_stats(documents: DataFrame, n: int = 2) -> DataFrame:
    """C30g: Gopher-style repetition filter input — per-doc n-gram repetition.

    top_gram_frac = count(most frequent n-gram) / total n-grams: the signal
    the Gopher/MassiveText quality rules threshold on (docs dominated by one
    repeated phrase are boilerplate). Two keyed shuffles — (doc_id, gram)
    counts then per-doc agg — both on small keys, text never shuffled.
    The fraction is a raw IEEE division of two exact counts (bit-identical
    across engines; never rounded per-row).
    """
    toks = documents.select("doc_id", _words(F.col("text")).alias("w"))
    idx = F.when(
        F.size("w") >= n,
        F.sequence(F.lit(1), F.size("w") - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(F.col("w"), i + j)
                                     for j in range(n)]))
    counts = (
        toks.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(F.sum("c").alias("n_grams"),
             F.count(F.lit(1)).alias("n_distinct_grams"),
             F.max("c").alias("top_gram_count"))
        .select(
            "doc_id", "n_grams", "n_distinct_grams",
            (F.col("top_gram_count").cast("double")
             / F.col("n_grams").cast("double")).alias("top_gram_frac"))
    )


REDACT_PATTERN = r"\b(customer|vector)\b"  # stand-in lexicon; ASCII \b is
#   identical in Java regex (Spark) and RE2 (DuckDB), so both engines scrub
#   the same spans — real deployments swap in their badwords/PII lexicon.


def lexicon_redact(documents: DataFrame) -> DataFrame:
    """C30h: lexicon-based redaction (the badwords/PII-scrub shape): count the
    hits, replace each with a mask token, and emit the scrubbed text's length
    + md5 so the oracle proves byte-identical scrubbing without shipping the
    text. Pure per-row regex in codegen — no shuffle, no UDF."""
    scrubbed = F.regexp_replace(F.col("text"), REDACT_PATTERN, "[X]")
    n_hits = F.size(F.regexp_extract_all("text", F.lit(REDACT_PATTERN), 0))
    return documents.select(
        "doc_id",
        n_hits.alias("n_redacted"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrubbed_md5"),
    )


def decontaminate(documents: DataFrame, benchmark_max_id: int = 20,
                  min_common: int = 3, n: int = 3) -> DataFrame:
    """C30i: benchmark decontamination — find corpus documents that overlap
    an evaluation set by ≥ `min_common` distinct word n-grams (docs with
    doc_id < `benchmark_max_id` stand in for the eval suite).

    The scale shape is what matters: the benchmark's shingle set is tiny
    relative to the corpus, so it BROADCASTS and contamination detection is
    ONE pass over the corpus shingle stream — no corpus self-join, no
    shuffle of corpus text, exactly how a 100 TB pre-training run screens
    against eval suites. Pairs (corpus doc, benchmark doc, overlap count)
    let the pipeline drop or audit."""
    from .dedup import _shingles, _tokenized

    sets = _tokenized(documents).select(
        "doc_id", F.explode(_shingles(F.col("words"), n)).alias("shingle"))
    bench = (sets.filter(F.col("doc_id") < benchmark_max_id)
             .select(F.col("doc_id").alias("bench_id"), "shingle"))
    corpus = sets.filter(F.col("doc_id") >= benchmark_max_id)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def lm_cross_entropy(documents: DataFrame, k: float = 0.5) -> DataFrame:
    """C30j: corpus-trained bigram language model + per-document cross-entropy
    — the CCNet-style "perplexity filter" signal, self-trained on the corpus
    instead of an external LM so the whole thing is one engine-native job.

    Model: bigram counts c2(prev,cur), prefix counts c1(prev), vocabulary
    size V, add-k smoothing. Score: per doc, mean over positions of
    -log2((c2+k)/(c1+k·V)) — low bits = the corpus predicts the document
    well (typical text), high bits = atypical/noisy.

    Scale shape: the model is built from and joined back to the bigram
    stream with shuffles keyed on (prev,cur)/(prev) — never on doc text —
    so both the training agg and the scoring join are plain keyed exchanges
    AQE can size. The vocabulary scalar V broadcasts (1 row). Per-position
    bits quantize to integer micro-units before the per-doc sum (the
    operators/exact.py contract) so partial-agg order and engine log2-ulp
    drift can't perturb the hash-matched result.
    """
    toks = documents.select("doc_id", _words(F.col("text")).alias("w"))
    idx = F.when(F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)) \
        .otherwise(F.array().cast("array<int>"))
    pairs = F.transform(idx, lambda i: F.struct(
        F.element_at(F.col("w"), i).alias("prev"),
        F.element_at(F.col("w"), i + 1).alias("cur")))
    big = (toks.select("doc_id", F.explode(pairs).alias("p"))
           .select("doc_id", "p.prev", "p.cur"))
    c2 = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    c1 = big.groupBy("prev").agg(F.count(F.lit(1)).alias("c1"))
    vocab = big.agg(F.count_distinct("cur").alias("v"))
    bits = -F.log2((F.col("c2") + F.lit(k))
                   / (F.col("c1") + F.lit(k) * F.col("v")))
    micro = F.floor(bits * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        big.join(c2, ["prev", "cur"]).join(c1, ["prev"]).crossJoin(vocab)
        .select("doc_id", micro.alias("micro"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.sum("micro").alias("bits_micro"))
        .select("doc_id", "n_bigrams",
                (F.col("bits_micro").cast("double") / F.lit(1e6)
                 / F.col("n_bigrams")).alias("xent_bits"))
    )


def source_lang_crosstab(documents: DataFrame) -> DataFrame:
    """C30n: source × language crosstab — docs and token counts per
    (source, lang) cell with the cell's share of its source — the
    composition report a multilingual corpus audit starts with. One keyed
    groupBy; shares via a window over the grouped result (rows bounded by
    |sources| × |langs|, never the corpus)."""
    from pyspark.sql import Window

    toks = documents.select(
        "source", "lang",
        F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tok"))
    w = Window.partitionBy("source")
    return (
        toks.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"))
        .select("source", "lang", "n_docs", "n_tokens",
                (F.col("n_docs").cast("double")
                 / F.sum("n_docs").over(w).cast("double"))
                .alias("source_share"))
    )


def chunk_documents(documents: DataFrame, size: int = 64,
                    stride: int = 48) -> DataFrame:
    """C30n2: overlapping token-window chunking — the context-windowing
    pass that turns variable-length documents into fixed-budget training
    sequences (the sliding-window regime HF tokenizers call
    stride/return_overflowing_tokens; overlap = size − stride tokens
    preserves cross-boundary context). One chunk per window start
    0, stride, 2·stride, … < n_tokens; the tail window is shorter, never
    dropped — every token lands in ≥1 chunk.

    Scale shape: split → sequence → explode → slice, all JVM built-ins
    on the resident token array — NO shuffle, no UDF, perfectly
    data-parallel (the per-row fan-out is n/stride chunks). Pairs with
    c32_pack, which then bin-packs these chunks into context budgets.
    FULL oracle: DuckDB replays the same windows with generate_series +
    1-based inclusive list slicing."""
    toks = F.split(F.trim("text"), " ")
    base = documents.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    return (base.select("doc_id", "n", "toks",
                        F.explode(starts).alias("start"))
            .select("doc_id",
                    (F.col("start") / stride).cast("long").alias("chunk_id"),
                    F.least(F.lit(size), F.col("n") - F.col("start"))
                     .cast("long").alias("n_tokens"),
                    F.array_join(
                        F.slice("toks", F.col("start") + 1, size), " ")
                     .alias("chunk")))


def hashed_doc_vectors(documents: DataFrame, k: int = 16) -> DataFrame:
    """C30m: feature-hashing ("hashing trick") document vectors — each word
    hashes to one of `k` signed feature slots, giving every document a
    fixed-width dense vector with NO vocabulary table to build, broadcast,
    or keep consistent across engines/runs. The standard featurizer when
    no neural embedding column exists; its output feeds the corpus's
    embedding operators (cosine near-dup, ANN, clustering) unchanged.

    Both the slot index and the sign come from the engine-portable FNV-1a
    column fold (sampling.fnv32_column), so the vectors are bit-identical
    across engines — a FULL-oracle operator. One explode + one keyed agg on
    (doc_id, slot), then a bounded pivot to the k wide columns (static
    value list — no hidden distinct-collect)."""
    from .sampling import fnv32_column

    toks = (documents
            .select("doc_id", F.explode(_words(F.col("text"))).alias("w"))
            .filter(F.col("w") != ""))
    idx = F.pmod(fnv32_column(F.col("w")), F.lit(k)).cast("int")
    sgn = F.when(
        F.pmod(fnv32_column(F.concat(F.col("w"), F.lit(":sgn"))), F.lit(2))
        == 0, F.lit(1)).otherwise(F.lit(-1))
    g = (toks.select("doc_id", idx.alias("idx"), sgn.alias("sgn"))
         .groupBy("doc_id", "idx").agg(F.sum("sgn").alias("v")))
    wide = (g.groupBy("doc_id").pivot("idx", list(range(k))).agg(F.sum("v")))
    return wide.select(
        "doc_id",
        *[F.coalesce(F.col(str(i)), F.lit(0)).cast("long").alias(f"f{i}")
          for i in range(k)])


def curate_documents_v2(documents: DataFrame, max_dup_frac: float = 0.5,
                        min_xent: float = 4.75, max_xent: float = 5.0,
                        cap: int = 40) -> DataFrame:
    """C30l: second-generation curation pipeline composing the round-4
    signals end-to-end, the way a production pre-training corpus pass
    chains them:

    1. keep-best normalized dedup (C28d) — one survivor per normalized
       text, longest copy wins;
    2. substring-duplication filter (C28e) — drop documents whose
       duplicated-span fraction exceeds `max_dup_frac` (boilerplate);
    3. LM cross-entropy band (C30j) — drop documents the corpus bigram LM
       finds too predictable (template spam, low xent) or too surprising
       (noise, high xent);
    4. per-source caps (C32f) — quality-best `cap` docs per source.

    Scale shape: every stage is a keyed join/window on doc_id / source /
    shingle-hash; the LM model is trained on the FULL corpus (before
    filtering) so stage order can't perturb the scores; survivors carry
    their diagnostic columns so downstream audits don't recompute them.
    """
    from pyspark.sql import Window

    from .dedup import dedup_keep_best, substring_dup_stats

    keep = dedup_keep_best(documents).select(
        F.col("keep_doc_id").alias("doc_id"))
    survivors = documents.join(keep, "doc_id", "left_semi")
    dup = substring_dup_stats(documents).select("doc_id", "dup_frac")
    xent = lm_cross_entropy(documents).select("doc_id", "xent_bits")
    joined = (
        survivors.join(dup, "doc_id", "left").join(xent, "doc_id", "left")
        .filter(F.coalesce(F.col("dup_frac"), F.lit(0.0)) <= max_dup_frac)
        .filter(F.col("xent_bits").between(min_xent, max_xent))
    )
    words = _words(F.col("text"))
    n_tokens = F.size(words)
    diversity = F.size(F.array_distinct(words)).cast("double") / n_tokens
    length_score = F.least(n_tokens.cast("double") / F.lit(200.0), F.lit(1.0))
    quality = F.round((diversity + length_score) / 2, 6)
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id"))
    return (
        joined.select("doc_id", "source", quality.alias("quality"),
                      F.coalesce(F.col("dup_frac"), F.lit(0.0))
                      .alias("dup_frac"), "xent_bits")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= cap)
        .drop("rk")
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """C30k: per-document top-k TF-IDF terms — the classic keyword /
    document-signature extractor (and the cheapest useful doc
    representation for clustering or near-dup triage when no embedding
    column exists).

    tf from the whitespace tokenizer, df over distinct (doc, term), N as a
    1-row broadcast scalar; score = tf·ln(N/df). Scores quantize to integer
    micro-units BEFORE ranking so both engines rank the same order even at
    log-ulp drift, with the term string as the total-order tie-break.

    Scale shape: the df(term) table is |vocab| rows of (string, long) —
    orders of magnitude smaller than the (doc, term) tf table — and term
    frequencies are Zipfian, so hash-joining tf on term would both
    re-shuffle the big side AND skew it onto the hot-term reducers. The
    explicit broadcast removes that shuffle entirely (measured: the 10×
    probe's worst text-family growth came from exactly this exchange);
    the only remaining tf-sized exchanges are the tf aggregation itself
    and the per-doc top-k window, both keyed on doc_id-bearing keys.
    """
    from pyspark.sql import Window

    toks = (documents
            .select("doc_id", F.explode(_words(F.col("text"))).alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term").crossJoin(n)
        .withColumn(
            "tfidf_micro",
            F.floor(F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
                    * F.lit(1e6) + F.lit(0.5)).cast("long")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "rk",
                (F.col("tfidf_micro").cast("double") / F.lit(1e6))
                .alias("tfidf"))
    )


def curate_documents(documents: DataFrame, jaccard_threshold: float = 0.1,
                     min_quality: float = 0.38) -> DataFrame:
    """C28/C29/C30 composed: the end-to-end curation pass a training-data
    pipeline actually runs — near-dup removal (drop the higher doc_id of
    every n-gram-Jaccard pair, keeping each cluster's canonical low id),
    then a quality floor, then per-doc token stats for the survivors.

    One declared query proving the operators compose: the only shuffles are
    the shingle inverted-index join (from ngram_jaccard_pairs) and the
    anti-join on the drop set; the quality/token math stays in per-row
    codegen. At 100 TB the drop set is small relative to the corpus (it's
    the duplicates), so the anti-join broadcasts."""
    from .dedup import ngram_jaccard_pairs

    drop = (ngram_jaccard_pairs(documents, threshold=jaccard_threshold)
            .select(F.col("doc_b").alias("doc_id")).distinct())
    kept = documents.join(drop, "doc_id", "left_anti")
    words = _words(F.col("text"))
    n_tokens = F.size(words)
    diversity = F.size(F.array_distinct(words)).cast("double") / n_tokens
    length_score = F.least(n_tokens.cast("double") / F.lit(200.0), F.lit(1.0))
    quality = F.round((diversity + length_score) / 2, 6)
    return (
        kept.select(
            "doc_id", "source", quality.alias("quality"),
            n_tokens.alias("ws_tokens"),
            F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("bpe_est"))
        .filter(F.col("quality") >= min_quality)
    )


def ngram_novelty(documents: DataFrame, n: int = 3) -> DataFrame:
    """C30o: per-document n-gram novelty — the fraction of a document's
    distinct word n-grams that appear in NO other document. Low-novelty
    docs are template/boilerplate-heavy and get down-weighted or dropped
    in pretraining curation (the per-doc dual of c28_substring_dup's
    corpus-level duplication fraction).

    Plan: distinct shingles per doc (the c29 shingle builder), a
    shingle-keyed doc-frequency aggregate over the inverted index, then
    a join back on shingle and a per-doc reduce — two keyed shuffles,
    text itself never moves after the first projection. Documents too
    short to produce a shingle are maximally novel by definition (1.0:
    nothing repeated)."""
    from .dedup import _shingles, _tokenized

    sets = (_tokenized(documents)
            .select("doc_id",
                    F.explode(_shingles(F.col("words"), n)).alias("sh")))
    df_counts = sets.groupBy("sh").agg(
        F.countDistinct("doc_id").alias("_df"))
    per_doc = (sets.join(df_counts, "sh")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_shingles"),
                    F.sum((F.col("_df") > 1).cast("long"))
                    .alias("n_shared")))
    return (documents.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
                F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
                F.when(F.coalesce("n_shingles", F.lit(0)) == 0, F.lit(1.0))
                .otherwise(F.round(
                    1.0 - F.col("n_shared").cast("double")
                    / F.col("n_shingles").cast("double"), 6))
                .alias("novelty")))


def rake_keywords(documents: DataFrame, stopwords=("the", "a"),
                  top_k: int = 3) -> DataFrame:
    """C30p: RAKE-style keyword/phrase extraction — candidate phrases are
    maximal stopword-free word runs, each word scores degree/frequency
    within its document (degree = summed length of the phrases it occurs
    in, RAKE's co-occurrence measure), and a phrase scores the sum of
    its member-word scores. The unsupervised tagger a corpus-indexing
    pipeline runs before building retrieval or topic indexes.

    Engine-exact scoring: word scores live in integer nano-units
    ((degree·1e9) div freq — pure BIGINT arithmetic) and phrase scores
    are exact integer sums of them, so ranking ties and the rounded
    surface score replay bit-identically. Plan: one posexplode, one
    per-doc window cumsum for phrase segmentation, two keyed aggregates
    and a join back — everything keyed by doc_id, no corpus-wide state.
    Docs whose every word is a stopword yield no phrases and no rows."""
    from pyspark.sql import Window

    words = documents.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower("text")), " "))
        .alias("pos", "w"))
    tagged = words.withColumn("is_stop", F.col("w").isin(*stopwords))
    wp = Window.partitionBy("doc_id").orderBy("pos")
    ph = (tagged
          .withColumn("phrase_id",
                      F.sum(F.col("is_stop").cast("int")).over(wp))
          .filter(~F.col("is_stop"))
          .select("doc_id", "phrase_id", "pos", "w"))
    phrases = ph.groupBy("doc_id", "phrase_id").agg(
        F.concat_ws(" ", F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "w"))),
            lambda s: s["w"])).alias("phrase"),
        F.count(F.lit(1)).alias("plen"))
    wstats = (ph.join(phrases.select("doc_id", "phrase_id", "plen"),
                      ["doc_id", "phrase_id"])
              .groupBy("doc_id", "w")
              .agg(F.count(F.lit(1)).alias("freq"),
                   F.sum("plen").alias("degree")))
    scored = (ph.join(wstats, ["doc_id", "w"])
              .groupBy("doc_id", "phrase_id")
              .agg(F.sum(F.expr("(degree * 1000000000) div freq"))
                   .alias("score_nano")))
    distinct_phrases = (phrases
                        .join(scored, ["doc_id", "phrase_id"])
                        .groupBy("doc_id", "phrase")
                        .agg(F.max("score_nano").alias("score_nano"),
                             F.max("plen").alias("n_words")))
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("score_nano").desc(), "phrase")
    return (distinct_phrases
            .withColumn("rank", F.row_number().over(wr).cast("int"))
            .filter(F.col("rank") <= top_k)
            .select("doc_id", "rank", "phrase", "n_words", "score_nano",
                    F.round(F.col("score_nano").cast("double") / 1e9, 6)
                    .alias("score")))


def collocation_lift(documents: DataFrame, min_pair: int = 5) -> DataFrame:
    """C30o: bigram collocation mining by LIFT — observed bigram rate
    over the rate independence predicts,

        lift(x,y) = (c_xy / c_x·) · (N / c_·y)

    with c_xy the bigram count, c_x· / c_·y the left/right marginal
    occurrence counts, N total bigrams. Lift is the log-free core of
    PMI (PMI = log2(lift)); it stays in exact-rational territory —
    two correctly-rounded IEEE divisions and one multiply in a fixed
    tree — where a cross-engine log would not be bit-stable (same
    reasoning that pinned the Benford expectations as literals).

    Scale shape: bigram assembly is a per-document map (array transform,
    no shuffle); then three count aggregates (pair, left-marginal,
    right-marginal — all map-side combinable) and two keyed joins of the
    pair table against the marginals; N folds in as a 1-row broadcast.
    Only (word, word, count) rows ever shuffle."""
    toks = (documents
            .select(F.split(F.trim("text"), " ").alias("ws"))
            .filter(F.size("ws") >= 2))
    pairs = (toks
             .select(F.explode(F.expr(
                 "transform(sequence(1, size(ws) - 1), "
                 "i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).alias("bg"))
             .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
             .filter((F.col("w1") != "") & (F.col("w2") != "")))
    cxy = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    cx = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("n_left"))
    cy = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("n_right"))
    n = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    return (cxy
            .filter(F.col("n_pair") >= min_pair)
            .join(cx, "w1")
            .join(cy, "w2")
            .crossJoin(F.broadcast(n))
            .select(
                "w1", "w2", "n_pair",
                ((F.col("n_pair").cast("double")
                  / F.col("n_left").cast("double"))
                 * (F.col("n_total").cast("double")
                    / F.col("n_right").cast("double"))).alias("lift")))


def phrase_search(documents: DataFrame,
                  phrase: str = "table scan") -> DataFrame:
    """C30r: exact phrase search over a POSITIONAL inverted index — the
    serving-side IR primitive (quoted-query retrieval): index = one
    (word, doc_id, pos) posting list, a k-word phrase answers as a
    k-way self-join of the k terms' posting lists on
    (doc_id, pos + offset), so cost is bounded by the RAREST term's
    posting list, never a document rescan. Emits per-document hit
    count and first match position.

    Scale shape: the index build is one posexplode projection (no
    shuffle); each join keys on (doc_id, pos±const) — all equi-joins,
    and Catalyst reorders them so the most selective posting list
    drives. Pure integer/string ops, engine-exact."""
    words = phrase.split(" ")
    idx = (documents
           .select("doc_id",
                   F.posexplode(F.split(F.trim("text"), " "))
                   .alias("pos", "w")))
    hits = (idx.filter(F.col("w") == words[0])
            .select("doc_id", F.col("pos").alias("p0")))
    for i, wd in enumerate(words[1:], start=1):
        nxt = (idx.filter(F.col("w") == wd)
               .select(F.col("doc_id").alias("_d"),
                       (F.col("pos") - i).alias("_p")))
        hits = (hits.join(nxt, (hits.doc_id == nxt._d)
                          & (hits.p0 == nxt._p))
                .select("doc_id", "p0"))
    return (hits.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits"),
                 F.min("p0").alias("first_pos")))


def lexical_diversity(documents: DataFrame) -> DataFrame:
    """C30s: corpus lexical-diversity report — vocabulary size, token
    count, type-token ratio, and the hapax-legomena share (fraction of
    vocabulary occurring exactly once): the quick health check that
    separates natural text (hapax share ≈ 0.4-0.6 by Zipf) from
    template spam (near 0) and OCR noise (near 1) before heavier
    quality scoring. Two map-side-combinable aggregates over the word
    frequency table; ratios are single correctly-rounded divisions of
    exact counts. One bounded output row."""
    freq = (documents
            .select(F.explode(F.split(F.trim("text"), " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w").agg(F.count(F.lit(1)).alias("f")))
    return (freq.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("f").alias("n_tokens"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("long")
        .alias("n_hapax"))
        .select("n_vocab", "n_tokens", "n_hapax",
                (F.col("n_vocab").cast("double")
                 / F.col("n_tokens").cast("double")).alias("type_token"),
                (F.col("n_hapax").cast("double")
                 / F.col("n_vocab").cast("double")).alias("hapax_share")))


def token_budget_report(documents: DataFrame) -> DataFrame:
    """C30t: per-source token budget after exact dedup — the capacity
    report a training-data planner reads first: how many documents and
    whitespace tokens each source contributes, how much of it survives
    exact (md5) dedup with first-occurrence-by-id retention, and the
    duplication tax as a ratio. Composes C28's dedup rule with C30's
    token accounting into the planning artifact.

    Counts are exact integers; the two ratios spend one fixed IEEE
    division each. Dedup keys are md5 hashes (text never shuffles
    twice: the hash groupBy is the only text-wide exchange, the
    argmin winner rejoins by doc_id)."""
    toks = F.size(F.split(F.trim("text"), " ")).cast("long")
    base = documents.select("doc_id", "source", toks.alias("n_tok"),
                            F.md5("text").alias("h"))
    kept = (base.groupBy("h")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"))
    kept_rows = base.join(kept, "doc_id", "left_semi")
    before = (base.groupBy("source")
              .agg(F.count(F.lit(1)).alias("docs_before"),
                   F.sum("n_tok").alias("tokens_before")))
    after = (kept_rows.groupBy("source")
             .agg(F.count(F.lit(1)).alias("docs_after"),
                  F.sum("n_tok").alias("tokens_after")))
    return (before.join(after, "source", "left")
            .select("source", "docs_before", "tokens_before",
                    F.coalesce("docs_after", F.lit(0)).cast("long")
                    .alias("docs_after"),
                    F.coalesce("tokens_after", F.lit(0)).cast("long")
                    .alias("tokens_after"),
                    (F.coalesce("docs_after", F.lit(0)).cast("double")
                     / F.col("docs_before").cast("double"))
                    .alias("doc_survival"),
                    (F.coalesce("tokens_after", F.lit(0)).cast("double")
                     / F.col("tokens_before").cast("double"))
                    .alias("token_survival")))


def dup_ngram_coverage(documents: DataFrame, n: int = 8) -> DataFrame:
    """C30u: duplicated n-gram coverage — the fraction of a source's
    n-gram INSTANCES whose n-gram occurs more than once in the whole
    corpus (Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL '22 — their memorization-risk gauge; exact
    substring dedup triggers on precisely these spans). Instance-
    weighted, so one viral boilerplate sentence counts every time it
    appears — the property that makes this stricter than the doc-level
    C28 numbers.

    Scale posture: n-grams leave the document as md5 HASHES only (the
    C29q discipline — text never shuffles), one corpus-wide count per
    hash, one join-back to instances, two integer aggregates. The
    fraction is one correctly-rounded division."""
    toks = F.split(F.trim("text"), " ")
    # Spark's sequence(0, stop) DESCENDS when stop < 0, so short docs
    # must take the empty-array branch (explode then drops them)
    starts = F.when(F.size(toks) >= n,
                    F.sequence(F.lit(0), F.size(toks) - n)) \
        .otherwise(F.array().cast("array<int>"))
    grams = (documents
             .select("doc_id", "source",
                     F.explode(
                         F.transform(
                             starts,
                             lambda i: F.md5(F.concat_ws(
                                 " ", F.slice(toks, i + 1, n)))))
                     .alias("g")))
    # Optimization r14 (guide §2.3 "aggregate before you shuffle" + §1.2):
    # the old shape consumed `grams` twice (corpus-wide freq + the tagged
    # join), re-running the 8-gram explode+md5 per consumer AND shuffling
    # every gram INSTANCE into the join. Partial-aggregate to (g, source,
    # c) first — map-side combine collapses duplicate instances before
    # the exchange — then a corpus-total window over g replaces the
    # instance-level join. Identical aggregates: n_instances = Σc per
    # source, n_duplicated = Σc over grams whose corpus total > 1 (the
    # same instance-weighted rule), one explode pass instead of two.
    per_sg = grams.groupBy("g", "source").agg(
        F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("g")
    tagged = per_sg.withColumn("cnt", F.sum("c").over(w))
    return (tagged.groupBy("source")
            .agg(F.sum("c").alias("n_instances"),
                 F.sum(F.when(F.col("cnt") > 1, F.col("c"))
                       .otherwise(F.lit(0))).alias("n_duplicated"))
            .withColumn("dup_frac",
                        F.col("n_duplicated").cast("double")
                        / F.col("n_instances").cast("double")))


def rrf_fusion(documents: DataFrame, n_queries: int = 5,
               k: int = 5, c: int = 60) -> DataFrame:
    """C30v: reciprocal-rank fusion — merge a unigram-overlap ranking
    and a bigram-overlap ranking into one hybrid result list (the RRF
    rule every hybrid lexical+vector search stack uses; Cormack et al.
    SIGIR '09). Engine-exact: each list's contribution is the INTEGER
    floor(1e9 / (c + rank)) — no float accumulation — and a document
    missing from a list contributes 0, the standard union semantics.
    Candidate sets are bounded by shared-term posting lists (never
    all-pairs); both rankings carry full (count desc, doc) tie-breaks."""
    toks = F.split(F.trim("text"), " ")
    uni = (documents.select(
        "doc_id", F.explode(F.array_distinct(toks)).alias("t")))
    big = (documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(slice(split(trim(text), ' '), 1, "
            "greatest(size(split(trim(text), ' ')) - 1, 0)), "
            "(w, i) -> concat(w, ' ', split(trim(text), ' ')[i + 1]))")))
        .alias("t")))

    def overlap_rank(posting, name):
        qa = posting.select(F.col("doc_id").alias("query_id"),
                            F.col("t").alias("qt")) \
            .filter(F.col("query_id") < n_queries)
        ov = (posting.join(qa, (posting.t == qa.qt)
                           & (posting.doc_id != qa.query_id))
              .groupBy("query_id", "doc_id")
              .agg(F.count(F.lit(1)).alias("n_shared")))
        w = Window.partitionBy("query_id").orderBy(
            F.col("n_shared").desc(), F.col("doc_id"))
        return ov.withColumn(name, F.row_number().over(w)) \
            .select("query_id", "doc_id", name)

    ra = overlap_rank(uni, "r_uni")
    rb = overlap_rank(big, "r_big")
    fused = (ra.join(rb, ["query_id", "doc_id"], "full_outer")
             .withColumn(
                 "rrf_scaled",
                 F.coalesce(F.expr(f"1000000000 div ({c} + r_uni)"),
                            F.lit(0))
                 + F.coalesce(F.expr(f"1000000000 div ({c} + r_big)"),
                              F.lit(0))))
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_scaled").desc(), F.col("doc_id"))
    return (fused.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rrf_scaled",
                    F.col("rank").cast("int").alias("rank")))


def length_quantile_report(documents: DataFrame) -> DataFrame:
    """C30w: EXACT corpus token-length percentiles (p50/p90/p99) without a
    global sort and without approximation — the distribution report every
    context-length / packing decision (c30_chunk, c32_pack,
    c30_token_budget) reads first. approx_percentile drifts under
    re-partitioning; this is the rank-selected (never interpolated)
    discipline, computed at scale through a bounded value histogram:
    token counts group to ≤ max-doc-length distinct values (corpus-size
    independent), the running prefix is a broadcast histogram self-join,
    and each percentile's rank lands in its value run via a tiny range
    join — the same machinery as c34_rfm's quintile boundaries, exposed
    as a report.

    rank(pct) = ceil(pct·n/100) over the ascending token counts."""
    n_tok = F.size(F.split(F.trim(F.col("text")), " ")).cast("long")
    b = documents.select(n_tok.alias("n_tok"))
    hist = b.groupBy("n_tok").agg(F.count(F.lit(1)).alias("_c"))
    pre = (hist.alias("a")
           .join(F.broadcast(hist.alias("bb")),
                 F.col("bb.n_tok") < F.col("a.n_tok"), "left")
           .groupBy(F.col("a.n_tok").alias("n_tok"),
                    F.col("a._c").alias("_c"))
           .agg(F.coalesce(F.sum("bb._c"), F.lit(0)).alias("_pre")))
    pos = (b.agg(F.count(F.lit(1)).alias("n"))
           .select(F.explode(F.array(F.lit(50), F.lit(90), F.lit(99)))
                   .alias("pct"), "n")
           .select("pct", "n",
                   F.expr("CAST((pct * n + 99) div 100 AS LONG)")
                   .alias("rank")))
    return (pre.join(F.broadcast(pos),
                     (F.col("_pre") < F.col("rank")) &
                     (F.col("rank") <= F.col("_pre") + F.col("_c")))
            .select("pct", F.col("n").alias("n_docs"), "rank", "n_tok"))


BM25_QUERIES = (
    (1, ("the", "of")),
    (2, ("and", "to")),
    (3, ("the", "and", "a")),
)


def bm25_topk(documents: DataFrame, k1: float = 1.2, b: float = 0.75,
              top_k: int = 5) -> DataFrame:
    """C30x: BM25 ranked retrieval (Robertson-Sparck Jones / Okapi) over
    posting lists — the lexical-retrieval half of every hybrid RAG
    stack (the C30v RRF row fuses rankings; this row PRODUCES the
    canonical one). Fixed literal query set; per-term score
    idf·tf·(k1+1)/(tf + k1·(1−b + b·dl·N/T)) with the Lucene-style
    non-negative idf ln(1 + (N−df+0.5)/(df+0.5)).

    Engine-exact: every per-(query,doc,term) score is one fixed IEEE
    tree over exact integers (tf, df, dl, N, T) quantized to BIGINT
    micro-units BEFORE the per-doc sum (the lm_xent contract), so
    partial-agg order can't perturb the ranking; ties break on doc_id.

    Scale shape: the query-term table is a literal broadcast; tf rows
    shuffle on (term, doc) — posting-list sized, never corpus×query;
    dl joins by doc_id; N/T/df are 1-row / per-term bounded broadcasts.
    The final ranking window partitions by query_id (bounded), over
    candidate docs only (docs sharing ≥1 query term)."""
    spark = documents.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id int, term string")
    toks = documents.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("w")) \
        .filter(F.col("w") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").alias("total_tokens"))
    tf = (toks.join(F.broadcast(qterms.select("term").distinct()),
                    toks.w == F.col("term"))
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(F.broadcast(df_), "term")
              .join(F.broadcast(qterms), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(corpus)))
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0 - b)
                            + F.lit(b) * F.col("dl") * F.col("n_docs")
                            / F.col("total_tokens")))
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    micro = F.floor(term_score * F.lit(1e6) + F.lit(0.5)).cast("long")
    per_doc = (scored.select("query_id", "doc_id", micro.alias("micro"))
               .groupBy("query_id", "doc_id")
               .agg(F.sum("micro").alias("score_micro"),
                    F.count(F.lit(1)).alias("n_terms_hit")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id"))
    return (per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top_k)
            .select("query_id", "rank", "doc_id", "score_micro",
                    F.col("n_terms_hit").cast("int").alias("n_terms_hit")))


def tokenizer_fertility(documents: DataFrame) -> DataFrame:
    """C30y: tokenizer-fertility report — chars-per-token and
    tokens-per-doc by language, the compression gauge multilingual
    tokenizer work sizes vocabularies with (a language whose text costs
    2× the tokens gets 2× the sequence length for the same content).
    Whitespace tokens here; the contract is the report shape, the
    tokenizer is the pluggable part. Integer sums, two fixed final
    divisions; one 5-group agg — map-side combinable, no window."""
    toks = documents.select(
        "lang",
        F.length("text").alias("n_chars_actual"),
        F.size(F.filter(_words(F.col("text")),
                        lambda w: w != F.lit(""))).alias("n_tokens"))
    return (toks.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.sum("n_chars_actual").alias("total_chars"))
            .select("lang", "n_docs", "total_tokens", "total_chars",
                    (F.col("total_chars").cast("double")
                     / F.col("total_tokens")).alias("chars_per_token"),
                    (F.col("total_tokens").cast("double")
                     / F.col("n_docs")).alias("tokens_per_doc")))


def zipf_fit(documents: DataFrame, top_n: int = 100) -> DataFrame:
    """C30z: Zipf-law fit over the top-N vocabulary — OLS slope of
    ln(freq) on ln(rank); natural text sits near slope −1 (Zipf 1949;
    Piantadosi 2014 review), so a corpus whose slope drifts far from it
    is boilerplate-heavy, deduplication-damaged, or synthetic — a
    one-row corpus-health gauge next to the C30d quality score.

    Engine-exact: ranks come from a TakeOrdered top-N (freq desc, word
    tie-break); ln(rank)/ln(freq) quantize to BIGINT micro-units per
    term (the lm_xent contract), the five OLS sufficient stats are
    integer sums, and slope/intercept are string-bridged divisions.
    Scale: the vocabulary agg is the corpus-scale work (one word
    shuffle); everything after runs on N rows (bounded window,
    allowlisted)."""
    wf = (documents
          .select(F.explode(_words(F.col("text"))).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    top = wf.orderBy(F.col("freq").desc(), F.col("word")).limit(top_n)
    w = Window.orderBy(F.col("freq").desc(), F.col("word"))
    ranked = top.withColumn("r", F.row_number().over(w))
    xm = F.floor(F.log(F.col("r").cast("double")) * F.lit(1e6)
                 + F.lit(0.5)).cast("long")
    ym = F.floor(F.log(F.col("freq").cast("double")) * F.lit(1e6)
                 + F.lit(0.5)).cast("long")
    s = (ranked.select(xm.alias("x"), ym.alias("y"))
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
              F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
              F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
              .alias("sxy"),
              F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
              .alias("sxx")))
    n = F.col("n").cast("decimal(38,0)")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")

    def xd(c):
        return c.cast("string").cast("double")

    slope = xd(num) / xd(den)
    intercept = (xd(F.col("sy")) - slope * xd(F.col("sx"))) \
        / F.lit(1e6) / F.col("n").cast("double")
    return s.select(F.col("n").cast("int").alias("n_terms"),
                    slope.alias("slope"),
                    intercept.alias("intercept"))


# Regex PII lexicon (C30 addendum, round 13). Both patterns are plain
# ASCII character classes with bounded quantifiers — the subset where
# Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte, the same
# dialect discipline as REDACT_PATTERN.
PII_EMAIL = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-555-[0-9]{4}"


def pii_scan(documents: DataFrame) -> DataFrame:
    """C30 addendum (round 13): regex PII detection + scrub — the
    pattern-based complement of C30h's lexicon redaction (real corpora
    run both: a fixed badwords list AND structural detectors for
    emails/phones/ids). The fixture corpus carries no contact strings,
    so deterministic PII is PLANTED first — every 5th document gains an
    email, every 7th a NANP number (35th: both) — which turns the row
    into a prove-it-detects gate: the scan must find exactly the
    planted occurrences and the scrub proof must hash the byte-exact
    scrubbed text.

    Pure per-row regex in whole-stage codegen (no shuffle, no UDF, no
    text ever leaves the row): emits per document the match counts, the
    scrubbed length, and the scrubbed text's md5 — the same
    byte-identical-scrub proof as C30h, so neither engine can fake the
    replacement."""
    email = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.col("text"), F.lit(" contact user"),
                 F.col("doc_id").cast("string"), F.lit("@example.com"))
    ).otherwise(F.col("text"))
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(email, F.lit(" call +1-555-"),
                 F.lpad(F.pmod(F.col("doc_id"), F.lit(10000))
                        .cast("string"), 4, "0"))
    ).otherwise(email)
    d = documents.select("doc_id", "source", planted.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("t"), PII_EMAIL, "[EMAIL]"),
        PII_PHONE, "[PHONE]")
    return d.select(
        "doc_id", "source",
        F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL), 0))
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(PII_PHONE), 0))
        .alias("n_phones"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrubbed_md5"))


def code_detect(documents: DataFrame) -> DataFrame:
    """C30 addendum (round 15): code-vs-prose detection — the cheap
    structural classifier every pretraining pipeline runs before
    routing documents to the code or prose pipeline (symbol density,
    digit density, statement punctuation — the deterministic first
    stage that gates the expensive learned classifier). The fixture
    corpus is prose, so code-shaped text is PLANTED first (every 11th
    document gains a code block with braces/semicolons/assignments,
    the c30_pii prove-it-detects discipline) and the detector must
    fire on exactly the planted rows.

    Features are exact integers from pure per-row string algebra in
    whole-stage codegen (no shuffle, no UDF): character-class counts
    via regexp_replace length deltas, the statement-punctuation count
    via replace, token count by the corpus split discipline. The
    score is an integer ppm blend — 3·symbols + digits + 10·semicolons
    per character — with the decision threshold at 40000 ppm; both
    engines replay the identical arithmetic."""
    code = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(F.col("text"),
                 F.lit(" int f(int x) { int y = x * 31; return y; }")),
    ).otherwise(F.col("text"))
    d = documents.select("doc_id", "source", code.alias("t"))
    n_chars = F.length("t")
    n_sym = n_chars - F.length(
        F.regexp_replace(F.col("t"), "[^a-zA-Z0-9 ]", ""))
    n_digit = n_chars - F.length(
        F.regexp_replace(F.col("t"), "[0-9]", ""))
    n_semi = n_chars - F.length(F.replace(F.col("t"), F.lit(";")))
    n_tokens = F.size(F.split(F.trim(F.col("t")), " "))
    return d.select(
        "doc_id", "source",
        n_chars.cast("long").alias("n_chars"),
        n_sym.cast("long").alias("n_sym"),
        n_digit.cast("long").alias("n_digit"),
        n_semi.cast("long").alias("n_semi"),
        n_tokens.cast("long").alias("n_tokens"),
        F.expr("(3 * (length(t) - length(regexp_replace(t,"
               " '[^a-zA-Z0-9 ]', '')))"
               " + (length(t) - length(regexp_replace(t, '[0-9]', '')))"
               " + 10 * (length(t) - length(replace(t, ';', ''))))"
               " * 1000000 div length(t)").alias("code_score_ppm"),
    ).withColumn("is_code", F.col("code_score_ppm") >= 40000)
