"""Feature-engineering operators (SURVEY §2 addendum C42, round 13).

The two workhorse categorical encoders every tabular training pipeline
runs before a model sees the data:

- Target (mean) encoding with additive smoothing (Micci-Barreca 2001):
  replace a category by the smoothed mean of the target,
  enc = (Σ_target + m·global_mean) / (n + m). Rare categories shrink
  toward the global mean instead of memorizing noise.
- Feature hashing (Weinberger et al. 2009, "hash trick"): project an
  unbounded token vocabulary into a fixed bucket space with a
  content-addressed hash — no vocabulary build, no dictionary shuffle,
  identical on every executor and every rerun.

Scale notes for 100 TB:
- Target encoding is two map-side-combinable aggregates (global 1-row +
  per-category) joined by a broadcast of the 1-row globals — the fact
  table shuffles once on the category key, nothing else moves.
- Feature hashing is a projection (the FNV fold is JVM column algebra,
  the c32_kfold discipline — no Python in the hot path) followed by one
  bucket-keyed aggregate; bucket cardinality is a constant, so the
  reduce side is trivially bounded and the census output is ≤ buckets
  rows.

Exactness: target sums ride half-up integer cents in DECIMAL(38,0)
(HUGEINT in DuckDB) so the smoothed mean is ONE string-bridged division
of exact integers; the hash is FNV-1a-32 computed by the same fold both
engines run (operators/sampling.fnv32_column ↔ the registry's _FNV_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import fnv32_column

_DEC = "decimal(38,0)"


def _sb(col):
    """String-bridged DECIMAL(38,0)→DOUBLE (the corpus_diversity cast:
    decimal→string→double is exact-input, engine-identical)."""
    return col.cast("string").cast("double")


def target_encode(orders: DataFrame, customer: DataFrame,
                  m: int = 100) -> DataFrame:
    """C42a: smoothed target encoding of the market segment against
    order value — enc = (Σcents + m·global_mean) / (n + m), computed as
    the single exact division (Σcents·N + m·ΣglobalCents) / (N·(n+m))
    so no intermediate mean is ever a rounded double.

    Emits per segment: order count, exact cent sum, the raw and the
    smoothed mean, and the shrinkage weight m/(n+m) in exact ppm — the
    audit columns a feature store keeps beside the encoding."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    fact = (orders.join(F.broadcast(customer),
                        orders.o_custkey == customer.c_custkey)
            .select(F.col("c_mktsegment").alias("segment"),
                    cents.alias("cents")))
    per_seg = (fact.groupBy("segment")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.sum(F.col("cents").cast(_DEC)).alias("sum_cents")))
    glob = fact.agg(F.count(F.lit(1)).alias("g_n"),
                    F.sum(F.col("cents").cast(_DEC)).alias("g_sum"))
    j = per_seg.crossJoin(F.broadcast(glob))
    num = (F.col("sum_cents") * F.col("g_n").cast(_DEC)
           + F.lit(m).cast(_DEC) * F.col("g_sum"))
    den = (F.col("g_n").cast(_DEC)
           * (F.col("n_orders") + F.lit(m)).cast(_DEC))
    return j.select(
        "segment", "n_orders",
        _sb(F.col("sum_cents")).alias("sum_cents"),
        (_sb(F.col("sum_cents"))
         / F.col("n_orders").cast("double")).alias("raw_mean_cents"),
        (_sb(num) / _sb(den)).alias("encoded_mean_cents"),
        F.expr(f"CAST({m} AS BIGINT) * 1000000 div (n_orders + {m})")
        .alias("shrinkage_ppm"))


def feature_hash_census(documents: DataFrame,
                        n_buckets: int = 64) -> DataFrame:
    """C42b: hash-trick bucket census — alphanumeric tokens hash through
    FNV-1a-32 into `n_buckets` buckets; the census reports, per bucket,
    the token mass, the distinct-word (collision) load, and the load in
    exact ppm of the corpus — what you read to size the bucket space
    before committing a hashed-features schema.

    Tokenization is regexp_extract_all('[A-Za-z0-9]+') — pure-ASCII by
    construction, the regime where the column-algebra FNV fold is exact
    (operators/sampling.fnv32_column). Projection + one bucket-keyed
    aggregate; distinct words shuffle as (bucket, word) once."""
    toks = (documents
            .select(F.explode(
                F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), 0))
                .alias("word"))
            .select("word",
                    F.pmod(fnv32_column(F.col("word")),
                           F.lit(n_buckets)).cast("int").alias("bucket")))
    census = (toks.groupBy("bucket")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.countDistinct("word").alias("n_distinct_words")))
    total = census.agg(F.sum("n_tokens").alias("n_total"))
    return (census.crossJoin(F.broadcast(total))
            .select("bucket", "n_tokens",
                    F.col("n_distinct_words").cast("long")
                    .alias("n_distinct_words"),
                    F.expr("n_tokens * 1000000 div n_total")
                    .alias("load_ppm")))


def woe_iv(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """C42c (round 13, second slate): Weight of Evidence + Information
    Value of a categorical predictor (market segment) against a binary
    target (urgent-or-high order priority) — the feature-screening
    pair credit-scoring and tabular-ML pipelines run before committing
    an encoder (|WoE| ranks a bin's separation; IV ≤ 0.02 means drop
    the feature). WoE_bin = ln((good_bin/G)/(bad_bin/B)),
    IV = Σ (good_bin/G − bad_bin/B)·WoE_bin.

    Exactness: the ratios are fixed IEEE trees over exact BIGINT
    counts; each bin's WoE and IV term are micro-quantized BEFORE the
    exact integer IV sum (the c33_entropy discipline), so both engines
    hash-match bitwise. A bin with zero goods or zero bads emits NULL
    WoE and contributes nothing to IV (fail-visible, not fail-infinite;
    smoothing is a caller decision, not a silent default). Shape: one
    keyed join + one bounded agg + two 1-row broadcasts."""
    good = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    fact = (orders.join(F.broadcast(customer),
                        orders.o_custkey == customer.c_custkey)
            .select(F.col("c_mktsegment").alias("segment"),
                    good.alias("good")))
    bins = (fact.groupBy("segment")
            .agg(F.sum(F.when(F.col("good"), 1).otherwise(0))
                 .cast("long").alias("n_good"),
                 F.sum(F.when(F.col("good"), 0).otherwise(1))
                 .cast("long").alias("n_bad")))
    tot = bins.agg(F.sum("n_good").alias("g"), F.sum("n_bad").alias("b"))
    j = bins.crossJoin(F.broadcast(tot))
    pg = F.col("n_good").cast("double") / F.col("g").cast("double")
    pb = F.col("n_bad").cast("double") / F.col("b").cast("double")
    ok = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    woe_micro = F.when(ok, F.floor(F.log(pg / pb) * 1000000.0 + 0.5)
                 .cast("long"))
    scored = j.select(
        "segment", "n_good", "n_bad",
        woe_micro.alias("woe_micro"),
        F.when(ok, F.floor((pg - pb) * F.log(pg / pb) * 1000000.0 + 0.5)
               .cast("long")).otherwise(F.lit(0).cast("long"))
        .alias("iv_micro"))
    iv = scored.agg(F.sum("iv_micro").alias("iv_sum"))
    return (scored.crossJoin(F.broadcast(iv))
            .select("segment", "n_good", "n_bad",
                    (F.col("woe_micro").cast("double") / 1000000.0)
                    .alias("woe"),
                    (F.col("iv_sum").cast("double") / 1000000.0)
                    .alias("iv_total")))


def quantile_binning(customer: DataFrame, n_bins: int = 10) -> DataFrame:
    """C42d (round 14): equal-frequency (quantile) binning of the
    account balance — the discretizer tabular pipelines run before WoE
    scoring, monotonic-binning credit models, or feature crossing.
    Emits one row per bin: row count, exact cent bounds, the exact mean
    (string-bridged division of a DECIMAL(38,0) cent sum), and the bin's
    row share in exact ppm.

    Scale path — NO global sort, NO per-row row_number: the corpus is
    aggregated to its DISTINCT cent values first (bounded by the VALUE
    DOMAIN — acctbal spans ~1.1e6 possible cents — not by the data), a
    window cumsum over that bounded value histogram assigns every
    distinct value its exact rank interval, and the bin index is
      bin(v) = min(n_bins-1, cum_before(v) · n_bins div N)
    — the ntile() boundary rule, computed without ever ordering the
    fact table. Ties (equal cents) land in ONE bin by construction, so
    the result is deterministic under any partitioning; classic ntile
    would split ties across bins by physical order instead. Per-bin
    stats then come from the same value histogram, so the fact table is
    scanned once and shuffled once (on the cent value)."""
    from pyspark.sql import Window

    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    hist = (customer.select(cents.alias("cents"))
            .groupBy("cents")
            .agg(F.count(F.lit(1)).alias("cnt")))
    w = (Window.orderBy("cents")
         .rowsBetween(Window.unboundedPreceding, -1))
    tot = hist.agg(F.sum("cnt").alias("n_total"))
    binned = (hist
              .withColumn("cum_before", F.coalesce(F.sum("cnt").over(w),
                                                   F.lit(0)))
              .crossJoin(F.broadcast(tot))
              .withColumn(
                  "bin",
                  F.least(F.lit(n_bins - 1),
                          F.expr(f"cum_before * {n_bins} div n_total"))
                  .cast("int")))
    return (binned.groupBy("bin")
            .agg(F.sum("cnt").alias("n_rows"),
                 F.min("cents").alias("lo_cents"),
                 F.max("cents").alias("hi_cents"),
                 F.sum((F.col("cents") * F.col("cnt")).cast(_DEC))
                 .alias("s"),
                 F.max("n_total").alias("n_total"))
            .select("bin", "n_rows", "lo_cents", "hi_cents",
                    (_sb(F.col("s")) / F.col("n_rows").cast("double"))
                    .alias("mean_cents"),
                    F.expr("n_rows * 1000000 div n_total")
                    .alias("share_ppm")))


def onehot_vocab(part: DataFrame, top_n: int = 5) -> DataFrame:
    """C42e (round 14): top-N one-hot vocabulary spec with an explicit
    OOV bucket — the dictionary-building half of categorical encoding
    (feature hashing's complement: when the cardinality is LOW enough
    to afford real columns, you pin the vocabulary and route the tail
    to __OOV__). Emits the encoder spec a feature store persists: per
    retained value its column index (frequency rank, ties broken by
    value — deterministic under any partitioning), its row count and
    coverage in exact ppm, plus the single OOV row carrying everything
    else.

    Shape: one map-side-combinable value count (vocabulary cardinality
    is bounded — brands, countries, priorities — so the ranked window
    runs over a dimension-sized frame), then a 1-row total broadcast."""
    from pyspark.sql import Window

    counts = (part.groupBy(F.col("p_brand").alias("value"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    ranked = counts.withColumn(
        "rk", F.row_number().over(
            Window.orderBy(F.col("n_rows").desc(), F.col("value"))))
    vocab = (ranked.filter(F.col("rk") <= top_n)
             .select((F.col("rk") - 1).cast("int").alias("col_index"),
                     "value", "n_rows", F.lit(True).alias("in_vocab")))
    oov = (ranked.filter(F.col("rk") > top_n)
           .agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows"))
           .select(F.lit(top_n).cast("int").alias("col_index"),
                   F.lit("__OOV__").alias("value"), "n_rows",
                   F.lit(False).alias("in_vocab")))
    tot = counts.agg(F.sum("n_rows").alias("n_total"))
    return (vocab.unionByName(oov)
            .crossJoin(F.broadcast(tot))
            .select("col_index", "value", "n_rows", "in_vocab",
                    F.expr("n_rows * 1000000 div n_total")
                    .alias("coverage_ppm")))


def scaler_stats(lineitem: DataFrame) -> DataFrame:
    """C42f (round 15): standard-scaler + min-max-scaler FIT statistics
    per group — the fit/transform split every feature pipeline
    persists: the transform is a per-row projection anywhere (training
    job, serving path, another engine entirely), but only if the FIT
    artifact (mean, variance, min, max per feature per segment) is
    exact and engine-portable. One pass computes all of it per
    (l_returnflag) segment over the extended price.

    Exactness: prices quantize to exact cents; Σx and Σx² accumulate in
    DECIMAL(38,0) — the sum of squared cents reaches ~1e28·rows, far
    past BIGINT (the r11 lesson: cast BEFORE squaring) — and
    mean/variance leave integer space only in the terminal closed forms
    (population variance n·Σx² − (Σx)² over n², computed on
    string-bridged doubles). The z-range columns (min/max standardized
    value, in milli-units) prove the fit artifact actually standardizes
    its own fit data — the sanity check a feature store runs before
    publishing the scaler.

    Scale: ONE map-side-combinable aggregate over the fact table;
    output is |segments| rows. No window, no join, no second pass."""
    dec, sb = _DEC, _sb  # the module's exactness-critical cast idiom

    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)) \
        .cast("long")
    per = (lineitem
           .select(F.col("l_returnflag").alias("segment"),
                   cents.alias("x"))
           .groupBy("segment")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("x").cast(dec)).alias("s1"),
                F.sum((F.col("x").cast(dec) * F.col("x").cast(dec)))
                .alias("s2"),
                F.min("x").alias("min_cents"),
                F.max("x").alias("max_cents")))
    n = F.col("n_rows").cast("double")
    mean = sb(F.col("s1")) / n
    var = (sb(F.col("s2")) * n - sb(F.col("s1")) * sb(F.col("s1"))) \
        / (n * n)
    std = F.sqrt(var)
    def z_milli(col):
        # guard the degenerate constant segment: std = 0 would float to
        # ±Inf and ANSI-error at the long cast (lazy CASE skips it)
        return F.when(var > 0,
                      F.floor((col - mean) / std * 1000 + F.lit(0.5))
                      .cast("long"))

    return per.select(
        "segment", "n_rows", "min_cents", "max_cents",
        mean.alias("mean_cents"),
        var.alias("var_cents2"),
        # z-extremes of the fit data under the fit artifact, milli-z
        z_milli(F.col("min_cents")).alias("zmin_milli"),
        z_milli(F.col("max_cents")).alias("zmax_milli"),
        # min-max scaler range width (the transform's denominator)
        (F.col("max_cents") - F.col("min_cents")).alias("range_cents"))


def regression_eval(orders: DataFrame) -> DataFrame:
    """C43f (round 16, second tranche): regression-metric evaluation —
    MAE and MSE of a persisted baseline predictor, completing the C43
    eval family's metric kinds (ranking C43a/C43c, agreement C43b,
    separation C43d, calibration C43e; this is the REGRESSION gauge a
    feature/model pipeline publishes beside its predictions). The
    predictor is the classic group-mean baseline: per order priority,
    predict the integer-floor mean order total (what a model registry
    stores as the fallback/champion-challenger floor); the metrics are
    what any scorer emits.

    Integer-exact end to end: y = exact cents; pred = Σy div n per
    group (integer floor mean — the persisted artifact); residual =
    y − pred is an exact BIGINT; mae_milli = 1000·Σ|r| div n and
    mse_cents2 = Σr² div n (sums in DECIMAL(38,0) — cast BEFORE
    squaring, the r11 overflow lesson; DuckDB replays in HUGEINT). No
    libm, no float accumulation; one terminal integer division each.

    Scale: two map-side-combinable aggs over the fact table (fit pass,
    score pass) joined on the ≤|priorities| group key — the
    fit/transform split every feature pipeline runs, same shape as
    c42_scaler."""
    dec = _DEC  # the module's exactness-critical decimal type
    y = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long").alias("cents"))
    fit = (y.groupBy("priority")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("cents").cast(dec)).alias("s1")))
    model = fit.select(
        "priority", "n",
        F.expr("CAST(s1 div n AS BIGINT)").alias("pred_cents"))
    scored = (y.join(F.broadcast(model), "priority")
              .withColumn("r", (F.col("cents")
                                - F.col("pred_cents")).cast(dec)))
    return (scored.groupBy("priority")
            .agg(F.max("n").alias("n"),
                 F.max("pred_cents").alias("pred_cents"),
                 F.sum(F.abs(F.col("r"))).alias("sae"),
                 F.sum(F.col("r") * F.col("r")).alias("sse"))
            .select("priority",
                    F.col("n").cast("long").alias("n"),
                    "pred_cents",
                    F.expr("CAST((1000 * sae) div n AS BIGINT)")
                    .alias("mae_milli"),
                    F.expr("CAST(sse div n AS BIGINT)")
                    .alias("mse_cents2")))


def median_impute(events: DataFrame) -> DataFrame:
    """C42g (round 14 session, r17 slate): fit/transform MEDIAN
    imputation — the missing-value step every tabular pipeline runs
    before scaling/encoding (sklearn SimpleImputer(strategy='median'),
    Spark ML Imputer): fit the per-group median on the PRESENT rows,
    transform every missing cell to its group's statistic. Missingness
    is PLANTED deterministically (the c30_pii / c35_constraints
    prove-it-detects discipline): value goes missing where
    md5(event_id) % 7 == 0 — the seeded-augmentation idiom, replayable
    in SQL as ('0x' || substr(md5(k),1,8))::BIGINT.

    Exact, histogram-reduced median (the c43_auc discipline): rather
    than sorting the corpus per key (a 5-key partitioned window over
    every row — the parallelism ceiling c16_sla/c33_anomaly2 document),
    the present rows first reduce to the (event_type, value_milli)
    COUNT histogram; the low median (the (n+1)//2-th smallest, an
    actual observed value — no interpolation, engine-exact) is then a
    cumulative-count threshold over histogram rows, which are bounded
    by the milli-value domain, not the corpus. Spark ML's Imputer fits
    an approxQuantile median; this row is the exact-replay variant the
    oracle can hash.

    Output: per event_type, the fitted statistic + the transform audit
    (present/missing counts, post-impute exact milli sum over ALL
    rows). The transform itself is a broadcast join of the ≤|groups|
    model + coalesce — a projection at any scale.

    Scale: one corpus scan → histogram groupBy (map-side combinable,
    keyed shuffle); window over histogram rows only; one broadcast
    join back. No corpus-sized sort, no Python."""
    from pyspark.sql import Window

    h32 = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
        16, 10).cast("long")
    vm = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    masked = events.select(
        "event_type", "event_id",
        F.when(h32 % 7 == 0, F.lit(None).cast("long"))
        .otherwise(vm).alias("vm"))

    hist = (masked.filter(F.col("vm").isNotNull())
            .groupBy("event_type", "vm")
            .agg(F.count(F.lit(1)).alias("cnt")))
    w_cum = Window.partitionBy("event_type").orderBy("vm")
    w_tot = Window.partitionBy("event_type")
    model = (hist
             .withColumn("cum", F.sum("cnt").over(w_cum))
             .withColumn("tot", F.sum("cnt").over(w_tot))
             .filter(F.col("cum") >= F.expr("(tot + 1) div 2"))
             .groupBy("event_type")
             .agg(F.min("vm").alias("median_milli")))

    return (masked.join(F.broadcast(model), "event_type")
            .groupBy("event_type")
            .agg(F.count("vm").alias("n_present"),
                 (F.count(F.lit(1)) - F.count("vm")).alias("n_missing"),
                 F.max("median_milli").alias("median_milli"),
                 F.sum(F.coalesce(F.col("vm"), F.col("median_milli")))
                 .alias("imputed_sum_milli")))
