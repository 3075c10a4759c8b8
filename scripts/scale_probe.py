"""Scale probe: synthesize N× testdata (key-shifted copies, multi-row-group
parquet) in /tmp, run a headline-query slice, and print per-query timings as
one JSON line.

Why this exists: the shipped sf0.1 parquet is single-row-group, so every scan
is one task and local[32] measures per-query *overhead*, not *scaling*. The
probe's files are written in many row groups, so scans fan out across cores —
the closest a single machine gets to the 1000-executor question: does wall
time grow ~linearly in data while the plan stays shuffle-parallel?

Usage: python scripts/scale_probe.py [factor] [base_sf_dir]
  factor      data multiplier (default 10 → ~sf1 from sf0.1)
  base_sf_dir default /root/testdata/sf0.1
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import dedup, graph, similarity
from kafka_streams_in_action_spark.plans.queries import QUERIES
from kafka_streams_in_action_spark.session import get_spark
from kafka_streams_in_action_spark.sources.parquet import load_table

# The registered c29_minhash_lsh / c29_ivf_ann are verdict forms (they run
# an in-query exact reference for the correctness gate); the probe times
# the raw scale paths, same as bench.py, so growth factors measure the
# production operators. IVF here INCLUDES the index build (the SCALE.md
# table row is "incl. index build").
#: Shared trade-edge list per sf_dir (verdict r9 item 6 twin of bench's
#: _TRADE_EDGES): built+checkpointed once in the WARM run, so the timed
#: runs of the c38 trade rows measure iteration/scoring growth with the
#: 4-table edge build factored out — the build itself is the superlinear
#: part and is what the un-shared probe history (r7-r9) measured.
_EDGE_CACHE: dict[str, object] = {}


def _trade_edges_cached(spark, sf_dir):
    e = _EDGE_CACHE.get(sf_dir)
    if e is None:
        e = graph.trade_edges(*[
            load_table(spark, n, sf_dir)
            for n in ("customer", "orders", "lineitem", "supplier")
        ]).localCheckpoint()
        _EDGE_CACHE[sf_dir] = e
    return e


def _c38_tabs(spark, sf_dir):
    return [load_table(spark, n, sf_dir)
            for n in ("customer", "orders", "lineitem", "supplier")]


RAW_PATHS = {
    "c29_minhash_lsh": lambda spark, sf_dir: dedup.minhash_lsh_pairs(
        load_table(spark, "documents", sf_dir), threshold=0.1),
    # c38 trade rows: score over the shared prebuilt edge list (the
    # bench accounting); the registered verdict forms still build
    # inline, and SCALE.md records both readings.
    "c38_pagerank": lambda spark, sf_dir: graph.nation_trade_pagerank(
        *_c38_tabs(spark, sf_dir), load_table(spark, "nation", sf_dir),
        edges=_trade_edges_cached(spark, sf_dir)),
    "c38_hits": lambda spark, sf_dir: graph.nation_trade_hits(
        *_c38_tabs(spark, sf_dir), load_table(spark, "nation", sf_dir),
        edges=_trade_edges_cached(spark, sf_dir)),
    "c38_reach": lambda spark, sf_dir: graph.khop_reachability(
        *_c38_tabs(spark, sf_dir), load_table(spark, "nation", sf_dir),
        edges=_trade_edges_cached(spark, sf_dir)),
    "c38_closeness": lambda spark, sf_dir: graph.closeness_centrality(
        *_c38_tabs(spark, sf_dir), load_table(spark, "nation", sf_dir),
        edges=_trade_edges_cached(spark, sf_dir)),
    "c38_assort": lambda spark, sf_dir: graph.degree_assortativity(
        *_c38_tabs(spark, sf_dir),
        edges=_trade_edges_cached(spark, sf_dir)),
    "c29_ivf_ann": lambda spark, sf_dir: similarity.ivf_topk(
        load_table(spark, "embeddings", sf_dir)),
    # PQ timed end-to-end (codebook build + encode + ADC scan + re-rank),
    # same "incl. index build" accounting as the IVF row above.
    "c29_pq_ann": lambda spark, sf_dir: similarity.pq_topk(
        load_table(spark, "embeddings", sf_dir)),
    # r6 verdict item 5: the registered c29_clusters_lsh is a verdict form
    # that runs BOTH the exact recursive-checkable graph and the LSH graph;
    # the probe times the LSH-ONLY path (the 100 TB regime) so the CC
    # loop's own round-over-round growth is tracked without the exact twin.
    "c29_clusters_lsh": lambda spark, sf_dir: dedup.minhash_clusters(
        load_table(spark, "documents", sf_dir), edge_source="lsh"),
}

# CLI args are parsed only when run as a script (the module is also imported
# by tests, which pass base/out/factor to build() explicitly).
FACTOR = 10
BASE = "/root/testdata/sf0.1"
if __name__ == "__main__":
    if len(sys.argv) > 1:
        FACTOR = int(sys.argv[1])
    if len(sys.argv) > 2:
        BASE = sys.argv[2]
OUT = f"/tmp/spark_graft_scale_x{FACTOR}"

# Key columns to shift per copy so join/group cardinalities scale with the
# data instead of multiplying duplicate keys (dims stay fixed, facts grow —
# the same shape a real 100 TB TPC-H has).
SHIFT = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation", "supplier", "part"]

PROBE_QUERIES = [
    "c3_pricing_summary",   # scan + hash agg
    "c7_multiway_join",     # broadcast-dim chain + fact shuffle
    "sql_q3_top_revenue",   # 3-way join + top-k
    "sql_q21_waiting_supplier",  # fact-fact semi/anti self-joins
    "c13_topk_per_group",   # window rank
    "c28_exact_dedup",      # hash dedup
    "c30_repetition",       # per-doc n-gram repetition
    "c29_minhash_lsh",      # LSH near-dedup end-to-end
    "c9_range_window",      # event-time range frame over events
    "c29_ivf_ann",          # IVF ANN incl. index build over embeddings
    "c30_lm_xent",          # bigram-LM model build + scoring joins
    "c28_substring_dup",    # positional-shingle inverted index
    # round-5 widening: the operator families the r4 probe didn't touch
    "c31_decode_image",     # BMP decode fan-out (Arrow-batched mapInPandas)
    "c34_funnel",           # conditional-MIN funnel, keyed shuffles only
    "c34_retention",        # weekly cohort retention (distinct user-weeks)
    "c34_rolling",          # trailing 7-day per-user RANGE window
    "c35_upsert",           # keyed merge (full-outer coalesce)
    "c30_tfidf",            # TF-IDF: doc-freq join + per-doc top terms
    "c29_pq_ann",           # PQ ANN incl. codebook build + ADC + re-rank
    "c22_tumbling_window",  # event-time tumbling aggregation
    "c32_pack",             # 3-level distributed prefix sum (packing)
    # round-5 additions
    "c28_boilerplate",      # shared-span removal, broadcast rebuild
    "c29_ivfpq_ann",        # composed IVF-PQ incl. both index builds
    "c36_interval_join",    # stream-stream interval join (availableNow)
    "c35_upsert_stream",    # incremental MV maintenance (4 micro-batches)
    "c37_skipping",         # Z-order vs linear min/max skipping report
    "c28_edit_verify",      # blocked candidates + Levenshtein verify
    "c36_outer_join",       # left-outer interval join (eviction events)
    # round-6 widening (r5 verdict item 8): previously-unprobed rows
    "c29_knn_label",        # kNN majority vote (exact neighbor search)
    "c33_expectations",     # one-pass data-quality gate + stack unpivot
    "c4_hll_rollup",        # mergeable sketch column + union rollup
    "c31_resize_image",     # multimodal write path (decode→resize→encode)
    "c34_sessionize",       # per-event gap sessionization (lag+cumsum)
    "c29_clusters_lsh",     # CC over LSH candidate edges + refinement
    "c4_cms_topk",          # CMS build (fixed grid) + candidate probe
    "c30_chunk",            # token-window chunking (zero-shuffle)
    "c4_hist_quantiles",    # histogram quantile sketch + exact verdict
    "c29_triplets",         # triplet mining (broadcast anchors, FNV neg)
    "c33_ndv_sketch",       # one-pass multi-column HLL NDV profile
    # round-6 late additions. c31_phash_dedup is deliberately NOT probed:
    # the linear fixture pixel formula makes every same-dims doc pair a
    # constant-shift near-image, so the RESULT SET itself (not the
    # algorithm's overhead) grows quadratically on the copy-synthesized
    # 10x data — a corpus property (like the permissive-threshold exact
    # cosine), not a plan property; on a real crawl near-dup density is
    # ~linear in corpus size and the banding bounds candidates.
    "c35_scd2",             # SCD2 change capture + range stitching
    "c33_drift",            # PSI gate: two agg passes, fixed grid
    "c6_bloom_join",        # bloom build/probe + exact verification
    "c10_pit_join",         # temporal join against derived SCD2 dim
    "c33_fingerprint",      # two map-side agg replicas + FNV kernel
    "c35_diff",             # keyed full-outer snapshot diff
    "c32_group_split",      # group-keyed FNV fold, pure projection
    "c4_sketch_inter",      # two sketch scans + one flags agg
    "c31_shot_detect",      # frame-delta kernel, 1→N fan-out + agg
    "c37_skew_advisor",     # keyed count + 1-row mean broadcast
    "c4_cms_join_card",     # fixed CMS grid + Σcnt² planning estimate
    "c34_cep",              # CEP negation pattern, one keyed window pass
    # round-7 additions (c29_clusters_lsh now times the LSH-ONLY path —
    # see RAW_PATHS — so the CC loop's growth is measured on the scale
    # regime rather than the exact-twin verdict form)
    "c38_pagerank",         # edge build (4-table join) + 10 rank steps
    "c12_ewma",             # trailing-k frame array + JVM fold per row
    "c33_anomaly",          # rolling integer-sum frame, per-type series
    "c34_attribution",      # running conditional first/last per user
    "c30_novelty",          # shingle doc-frequency join-back
    "c32_winsorize",        # per-type rank window + clamp agg
    "c16_resample",         # day-grid explode + ffill (span-bounded)
    "c33_referential",      # four anti-join count edges
    "c33_benford",          # exact-cents digit extraction + 9-group agg
    "c30_rake",             # phrase segmentation + doc-keyed score aggs
    "sql_q20_promo_suppliers",  # nested semi joins + grouped threshold
    # round-8 additions. c39_link is deliberately NOT probed: the 10x
    # data key-shifts c_custkey but keeps name/segment/balance, so every
    # dirty record gains 10 identical clean twins and the candidate set
    # itself grows quadratically — the same copy-synth corpus property
    # that excludes c31_phash_dedup and c38_triangles; real re-entry
    # corpora don't carry 10 byte-identical twins per record, and the
    # banded blocking bounds candidates by block occupancy there.
    "c28_par_dedup",        # segment-hash dedup + doc reassembly
    "c38_reach",            # 4-table edge build + bounded BFS loop
    "c12_holt",             # sequential per-user kernel (key-parallel)
    "c34_throttle",         # one (user, hour) ranking window
    "c33_chisq",            # map-side cell agg + bounded margin windows
    "c30_pmi",              # bigram aggs + marginal joins
    "c32_systematic",       # 3-level prefix sum + grid explode
    "c16_interp",           # day grid + two frame passes
    "c31_vad",              # in-kernel decode + segment runs
    "c7_basket",            # within-basket self-join + marginals
    "c33_gini",             # per-segment rank window + decimal agg
    "c29_mmr",              # corpus-scale scoring + bounded greedy loop
    "c35_merge",            # keyed full-outer + router
    "c34_dwell",            # per-type lag window + rank median
    "c32_temporal_split",   # day histogram + keyed audit agg
    "c31_resample_audio",   # in-kernel decimate + re-encode + verify
    "c32_oversample",       # sequence-explode replication + count
    "c33_cusum",            # two keyed window passes, integer math
    "c30_phrase",           # posting-list equi-joins
    "c34_survival",         # per-user agg + bounded product table
    "c16_ohlc",             # two ranked windows + keyed agg
    "c33_mad",              # two ranked passes per type
    "c12_xcorr",            # day-table lag join + exact stats
    "c30_lexdiv",           # word-frequency agg + 1-row report
    "c38_assort",           # 4-table edge build + degree joins
    # c38_triangles is deliberately NOT probed: its edge list is the
    # exact n-gram Jaccard pair graph, and on the copy-synthesized 10x
    # data (doc text repeats) clone clusters make the PAIR SET itself
    # grow quadratically — the same corpus property that excludes
    # c31_phash_dedup. On a real crawl near-dup density is ~linear and
    # the banded/collapsed regimes (C29q) carry the scale path.
    # round-9 additions
    "c12_drawdown",         # two-frame BIGINT sweep per user
    "c12_crossover",        # day-table rolling sums + lag
    "c12_trend",            # orders⋈customer join + monthly agg
    "c9_overlap",           # delta explode + per-supplier running sum
    "c34_rfm",              # customer rollup + broadcast quintile bounds
    "c35_timetravel",       # cut explode + argmax hash agg
    "c35_forget",           # request-set joins + audit recounts
    "c38_linkpred",         # per-part posting-list pair join
    "c38_kcore",            # bounded edge build + 12 peel rounds
    "c33_ks",               # type-pair cum windows over merged values
    "c16_seasonality",      # (type, day) agg + bounded dow rollup
    "c35_vacuum",           # real version writes + retention delete
    "c39_blocking",         # banded block join + count scalars
    "c16_gaps",             # distinct-day agg + lead window
    "c38_closeness",        # 4-table edge build + all-sources BFS
    "c34_stickiness",       # 30x day explode + two distinct aggs
    "c33_reconcile",        # orderkey fact join + delta agg
    "c32_quota",            # bounded apportionment + per-stratum draw
    "c34_growth",           # (user, week) distinct + per-user lags
    "c30_token_budget",     # md5 groupBy + semi-join rejoin
    "c29_filtered_ann",     # broadcast queries, two rankings
    "c31_exposure",         # Arrow decode kernel, zero shuffle
    "c33_pareto",           # per-customer rollup + segment windows
    "c12_theilsen",         # bounded monthly self-join + rank select
    "c37_formats",          # three linear writes + anti-join checks
    "c30_dup_coverage",     # gram-hash agg + join-back (hashes only)
    "c33_flatline",         # one keyed window + two aggs
    "c34_paths",            # lead windows + TakeOrdered top-k
    "c30_rrf",              # posting-list overlap joins + 2 rankings
    "c34_event_study",      # anchor agg + keyed tag join
    "c35_bitemporal",       # 3-cut explode + argmax hash agg
    "c16_lttb",             # (type, day) agg + bounded kernel
    "c31_clipping",         # Arrow decode kernel, zero shuffle
    "c33_flatline_stream",  # keyed integer state machine, 4 batches
    "c35_merkle",           # two fingerprint aggs + bucket drill
    "c34_streaks",          # distinct-day agg + per-user islands
    # round-10 additions
    "c12_rsi",              # day-table lag + 14-row frame sums
    "c16_vwap",             # (flag, day) agg + bounded running sums
    "c33_order_regressions",  # one user-keyed lag window + agg
    "c34_interarrival",     # one user-keyed lag window + moment agg
    "c33_uniqueness",       # three count-distinct aggs over one scan
    "c34_ltv",              # per-customer min window + cohort grid
    "c32_kfold",            # FNV projection + (fold, lang) agg
    "c30_length_quantiles",  # bounded token-length histogram select
    "c28_shard_overlap",    # md5 fingerprint equi-join matrix
    "c28_cdc_chunks",       # in-kernel chunking; fingerprints shuffle
    "c35_schema_evo",       # two real writes + merged read-back
    "c31_sniff",            # in-kernel encode+sniff, label grid agg
    "c29_emb_profile",      # posexplode + map-side combine to 64 rows
    "c35_partition_evo",    # two partitioned writes + pruned read
    "c12_peaks",            # bounded day table lag/lead
    "c33_freshness",        # one keyed max agg
    "c16_busdays",          # keyed fact-fact join + closed-form count
    "c12_mase",             # bounded day table, two lag horizons
    "c12_bollinger",        # bounded day table, one 20-row frame
    "c35_commutativity",    # three keyed argmax aggs per arm
    "c6_bucketed",          # bucketed ingest writes + exchange-free join
    # round-11 additions
    "c30_bm25",             # posting-list tf join + bounded rank
    "c30_fertility",        # one map-side-combinable language agg
    "c32_temperature",      # corpus count agg + bounded apportionment
    "c33_entropy",          # three count aggs + bounded value tables
    "c33_corr",             # ONE global sufficient-stats agg
    "c12_acf",              # day rollup + one keyed window pass
    "c38_hits",             # 4-table edge build + bounded iteration
    "c29_hamming",          # signature scan + 10-row query broadcast
    "c34_l28",              # (user, day) distinct + 4-row histogram
    "c30_zipf",             # word agg + TakeOrdered + bounded fit
    "c31_letterbox",        # in-kernel encode+mutate+detect, 0 shuffle
    "c16_m4",               # day rollup + keyed bucket agg, no window
    "c12_stl",              # day rollup + one centered keyed window
    "c34_heatmap",          # one bounded-grid agg + broadcast totals
    "c37_pruning",          # real partitioned write + pruned read
    "c6_dpp",               # runtime-pruned star join over real dirs
    "c10_asof_tolerance",   # tolerance-pruned as-of candidate join
    "c33_seasonal_anomaly", # STL pipeline + per-type stats broadcast
    # round-10 (r12 slate) rows
    "c35_cdc",              # one keyed window pass over the op log
    "c35_cdc_stream",       # 4-batch KTable fold + read-side argmax
    "c9_coverage",          # ±1 delta explode + keyed sweep window
    "c12_changepoint",      # day rollup + prefix window + bounded rank
    "c34_markov",           # pair window + bounded 12-step iteration
    "c29_diversity",        # two linear aggs (posexplode map-side)
    "c32_padwaste",         # projection + ≤8-row agg
    "c31_blur",             # in-kernel decode+convolve, 0 shuffle
    "c37_aqe_skew",         # skewed SMJ + global agg (plan verdict)
    "c38_scc",              # 4-table edge build + bounded BFS closure
    "c33_anomaly2",         # (type, day)-bucketed window + carry rows
    "c33_fd",               # four keyed countDistinct aggs
    "c12_seasonal",         # C12q pipeline + 5-row variance agg
    "c32_epoch_shuffle",    # narrow FNV projection, no shuffle
    "c31_snr",              # in-kernel decode+frame+reduce, 0 shuffle
    # round-11 (r13 slate) rows
    "c40_kanon",            # QI-class agg + 5-row segment rollup
    "c40_ldiversity",       # keyed join + two-level distinct agg
    "c40_generalize",       # three bounded grouped passes + 3-row union
    "c30_pii",              # per-row regex scan/scrub, no shuffle
    "c42_target_encode",    # keyed join + two map-side aggs
    "c42_feature_hash",     # word explode + 64-bucket agg
    "c34_bursts",           # (type, day) agg + keyed RANGE window
    "c34_bursts_stream",    # keyed count state twin, 4 batches
    "c9_allen",             # one keyed lead window + 8-row census
    "c38_eccentricity",     # 4-table edge build + bounded BFS w/ dist
    "c37_aqe_coalesce",     # oversized-shuffle coalesce verdict
    "c31_dominant_color",   # in-kernel decode+bincount, 0 shuffle
    "c12_runs",             # bounded day table, two lag passes
    "c16_sla",              # day-bucketed gap windows + bounded cross
    "c29_centroid_shift",   # posexplode agg + bounded label fold
    "c33_jsd",              # one conditional-sum agg + bounded window
    "c42_woe",              # keyed join + bounded agg + 1-row folds
    "c34_absence",          # per-user max agg + 4-row rollup
    "c34_absence_stream",   # last-seen max state twin, 4 batches
    "c12_vratio",           # bounded day table, two lags, one pass
    # round-12 additions (r14 slate)
    "c4_tdigest",           # per-partition digests + bounded merge + audit
    "c13_decay_topk",       # (user, day) agg + TakeOrdered top-k
    "c13_decay_topk_stream",  # keyed counter state twin, 4 batches
    "c35_scd1",             # max_by dedup + full-outer MERGE
    "c40_tcloseness",       # class×band grid EMD, bounded window
    "c42_binning",          # bounded cent-histogram cumsum
    "c42_onehot",           # bounded vocab rank + 1-row total
    "c34_peak",             # 2-rows/event sweep, keyed running sum
    "c34_peak_stream",      # heap-state sweep twin, 4 batches
    "c16_sla_stream",       # 7-BIGINT gap-stats state twin
    "c43_ndcg",             # bounded query-broadcast eval, k^2 join
    "c4_tdigest_stream",    # digest-as-state twin + rank audit
    "c27_ttl_stream",       # TTL eviction state machine, 5 batches
    "c43_kappa",            # centroid classifiers + exact kappa fraction
    "c37_split_tuning",     # one staged write + two planned scans
    # round-13 additions (r15 slate)
    "c24_session_stream",   # session_window merge state, 4 batches
    "c22_tumbling_stream",  # tumbling append-mode twin, 4 batches
    "c23_sliding_stream",   # sliding append-mode twin, 4 batches
    "c6_bloom_index",       # index write/reload + pruned probe
    "c37_zorder_maintain",  # base write + append + bounded OPTIMIZE
    "c35_restore",          # 4 version writes + serving read-back
    "c43_map",              # bounded query-broadcast eval, k^2 join
    "c43_auc",              # centroid scoring + bounded histogram fold
    "c42_scaler",           # one decimal power-sum agg
    "c33_moments",          # one decimal power-sum agg (to x^4)
    "c38_sssp",             # 4-table edge build + bounded relaxation
    "c30_code_detect",      # per-row string algebra, no shuffle
    "c31_tile",             # in-kernel decode + 12-tile sums, 0 shuffle
    # r16 slate (round 14)
    "c36_window_join",      # windowed stream-stream join, keyed state
    "c26_dedup_stream",     # watermarked dedup twin, per-id state
    "c37_codec",            # k+1 linear sample writes + readback aggs
    "c35_clone",            # table write + manifest + audit aggs
    "c21_ols_fit",          # grouped-map Arrow agg, |customers| groups
    "c40_dp_hist",          # one keyed agg + per-cell noise algebra
    "c31_augment",          # in-kernel decode+crop, 0 shuffle
    "c43_calibration",      # centroid scoring + bounded bins fold
    "c35_constraints",      # linear scan -> two filtered writes
    "c40_pseudonymize",     # per-row tokenization + keyed join
    "c43_regression",       # two map-side-combinable aggs
    "c36_left_join_stream",  # outer twin: eviction-path state flush
    "c35_mv_refresh",       # delta partials + |MV keys| merge shuffle
    "c42_imputer",          # histogram median + broadcast transform
    "c37_join_advisor",     # one exact stats agg per build table
    # a14_registry is deliberately NOT probed: it drives constant-size
    # registry metadata (≤|event_type| subjects) — no data-scale path.
    # c32_leakage is deliberately NOT probed: it runs the exact
    # inverted-index pair set (the c38_triangles/c29_recall_curve
    # corpus-property exclusion).
    # c29_recall_curve is deliberately NOT probed: it runs the exact
    # inverted-index pair set (like c38_triangles), which the
    # copy-synth corpus makes quadratic — the LSH scale path is
    # already probed via c29_minhash_lsh.
]


def build(spark, base: str = None, out: str = None,
          factor: int = None) -> None:
    base, out = base or BASE, out or OUT
    factor = factor or FACTOR
    os.makedirs(out, exist_ok=True)
    shift_mod = 10_000_000
    for t in COPY_ONLY:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    for t, keys in SHIFT.items():
        df = load_table(spark, t, base)
        # events.ts: load_table normalizes whatever physical unit the source
        # files carry (nanos-as-int64 or native micros) to TimestampType;
        # writing that back produces a parquet TIMESTAMP column the
        # footer-probing loader reads directly — no manual unit juggling.
        copies = []
        for i in range(factor):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * shift_mod))
            copies.append(c)
        merged = copies[0]
        for c in copies[1:]:
            merged = merged.union(c)
        # many row groups → many scan tasks (the point of the probe);
        # file count ≈ cores so every executor thread gets real work.
        (merged.repartition(32).write.mode("overwrite")
            .option("parquet.block.size", 4 * 1024 * 1024)
            .parquet(f"{out}/_{t}"))
        # load_table expects <table>.parquet as a path; a directory works.
        target = f"{out}/{t}.parquet"
        if os.path.exists(target):
            shutil.rmtree(target, ignore_errors=True)
        os.rename(f"{out}/_{t}", target)


def _time(fn, spark, sf_dir: str) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(2):
        s = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best or 1e9, time.time() - s)
    return round(best, 3)


def main() -> None:
    """Emit a standing SCALE artifact: each probe query timed at the base SF
    AND at FACTOR×, with the growth factor — so a scaling regression (a plan
    that silently went quadratic) fails loudly round over round, not just an
    absolute-time regression at sf0.1. Redirect stdout to SCALE_r{N}.json."""
    spark = get_spark("scale-probe")
    t0 = time.time()
    if not os.path.exists(f"{OUT}/lineitem.parquet"):
        build(spark)
        print(f"# built {OUT} in {time.time()-t0:.1f}s", file=sys.stderr)

    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    import re as _re
    names = [n for n in PROBE_QUERIES
             if only is None or _re.search(only, n)]
    queries = {}
    for name in names:
        fn = RAW_PATHS.get(name) or QUERIES[name].fn
        base_s = _time(fn, spark, BASE)
        big_s = _time(fn, spark, OUT)
        queries[name] = {
            "base": base_s, "scaled": big_s,
            "growth": round(big_s / base_s, 2) if base_s else None,
        }
        print(f"# {name}: base {base_s}s, x{FACTOR} {big_s}s "
              f"(growth {queries[name]['growth']}x)",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "scale_probe_growth",
        "value": round(sum(q["scaled"] for q in queries.values()), 3),
        "unit": "sec", "factor": FACTOR, "base": BASE,
        "max_growth": max(q["growth"] for q in queries.values()),
        "queries": queries,
    }))


if __name__ == "__main__":
    main()
