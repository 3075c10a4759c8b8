"""Window functions, sort/limit/top-k (SURVEY §2C C11-C13; reference A15).

Window partitioning keys here (customer, user) are high-cardinality, so state
per task stays small at any scale; no global windows without PARTITION BY appear
anywhere (an ORDER BY over everything would single-task at 100 TB).

Global top-k (C13) relies on Spark's TakeOrderedAndProject: per-partition heap
of k, then a k-sized merge on the driver — never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_orders_per_customer(orders: DataFrame) -> DataFrame:
    """C11: row_number/rank/dense_rank per customer by order date."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def distribution_ranks(orders: DataFrame) -> DataFrame:
    """C11b: the distribution ranking family — percent_rank, cume_dist,
    ntile(4). Same partitioning discipline as C11 (keyed by customer, no
    global window). percent_rank/cume_dist are pure functions of (rank,
    partition size); ntile's remainder rule (first `size % n` tiles get the
    extra row) is identical in Spark and DuckDB."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.select(
        "o_custkey", "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


def analytic_frames(orders: DataFrame) -> DataFrame:
    """C12: lag/lead + running sum (unboundedPreceding) + sliding 4-row avg."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
    dec = F.col("o_totalprice").cast("decimal(27,6)")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frame4 = w.rowsBetween(-3, 0)
    return orders.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        # decimal window sums: exact regardless of the engine's frame
        # evaluation order (DuckDB uses a segment tree; Spark streams)
        F.sum(dec).over(run).cast("double").alias("running_total"),
        (F.sum(dec).over(frame4).cast("double")
         / F.count(F.lit(1)).over(frame4)).alias("sliding_avg"),
    )


def top_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """C13a: global ORDER BY ... LIMIT k → TakeOrderedAndProject (no full sort).
    Tie-break on o_orderkey makes the result set deterministic."""
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.col("o_totalprice"))
        .limit(k)
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """C13b: per-group top-k via ranking — one shuffle on the group key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def partition_ordered_records(events: DataFrame) -> DataFrame:
    """A15 (concurrent_record_processor.go:71-90): group records by partition key
    and process in offset order — batchified as row_number over (user) ordered by
    (ts, event_id), i.e. each record's in-partition sequence number."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return events.select(
        "user_id", "event_id",
        F.row_number().over(w).alias("seq"),
    )


def ewma_trailing(events: DataFrame, k: int = 20) -> DataFrame:
    """C12e: per-key exponentially-weighted moving average over the
    trailing `k` observations (half-life smoothing, α = 0.5) — the
    standard feature-engineering smoother for per-entity time series.

    Engine-exact by construction: the decay base is 0.5, so every weight
    is an exact binary power 2^-e, and the weighted terms are quantized
    to integer nano-units BEFORE the sum (floor(x·1e9 / 2^e + 0.5) —
    double multiply, exact power-of-two scaling, exact floor: the only
    float ops involved are ones IEEE-754 defines exactly, the same
    discipline as operators/exact.dsum). The per-row reduction is over a
    bounded k-element frame array (collect_list over a ROWS frame +
    F.aggregate — pure JVM codegen, no Python), so cost is O(k) per row
    and the only shuffle is the window's partition-by-key exchange;
    partitions are per-user, so state stays bounded at any scale."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(k - 1), 0))
    arr = F.collect_list("value").over(w)
    # weight for 0-based frame position i of an m-element frame is
    # 2^-(m-1-i) (newest = heaviest); shift counts are column-valued so
    # the expr form of shiftleft is required (literal-only in the F.* API)
    out = (
        events.select(
            "user_id", "event_id", "ts",
            arr.alias("_arr"))
        .select(
            "user_id", "event_id",
            F.expr("""
              aggregate(
                transform(_arr, (x, i) ->
                  CAST(floor(x * 1e9 / shiftleft(1L, size(_arr) - 1 - i)
                             + 0.5) AS BIGINT)),
                CAST(0 AS BIGINT), (acc, t) -> acc + t)
            """).alias("_num"),
            F.expr("""
              aggregate(
                transform(_arr, (x, i) ->
                  CAST(floor(1e9 / shiftleft(1L, size(_arr) - 1 - i)
                             + 0.5) AS BIGINT)),
                CAST(0 AS BIGINT), (acc, t) -> acc + t)
            """).alias("_den"))
        .select(
            "user_id", "event_id",
            F.round(F.col("_num").cast("double")
                    / F.col("_den").cast("double"), 6).alias("ewma"))
    )
    return out


def rolling_zscore_anomalies(events: DataFrame, window: int = 20,
                             z_thresh: float = 3.0) -> DataFrame:
    """C33h: rolling z-score anomaly detection — flag events whose value
    deviates more than `z_thresh` sample standard deviations from the
    trailing `window`-observation mean of their event_type series.

    Engine-exact: values are quantized to integer milli-units, the frame
    keeps exact integer sums (Σm, Σm²) — both far inside the 2^53 double
    range at any realistic magnitude — and mean/var/z are then derived
    with deterministic IEEE ops (divide, sqrt are correctly rounded).
    Naive two-sum variance is numerically fine HERE because the sums are
    exact integers, not accumulated floats. Rows with an incomplete
    frame (fewer than `window` trailing points) or zero variance are not
    scored. One shuffle (the per-type window exchange); the frame is a
    running segment sum, O(1) amortized per row.

    Scale ceiling + the measured fix (verdict r9 item 8): the 5-value
    event_type key caps window parallelism at |types| tasks — the
    largest probe growth in the ledger (4.22x at 10x). A two-level
    (event_type, day-bucket) variant — each event additionally rides
    the NEXT day's partition as a flagged carry row so boundary frames
    stay complete, emit non-carry only — was A/B'd round 10 with
    IDENTICAL output at sf0.1 and 10x: one-level 0.485 s/1.356 s vs
    two-level 0.503 s/1.022 s (25% faster at 10x, growth 2.80x→2.03x;
    parallelism |types|·|days|). It is NOT swapped in because it is
    only valid when every (type, day) holds ≥ window−1 events (one
    carried day must cover the frame; sparser days silently truncate
    frames). The guarded production form SHIPPED late round 10 as
    rolling_zscore_anomalies_daybucket (registered c33_anomaly2, same
    oracle, density gate + fallback; probe 1.53x vs 4.22x here); this
    one-level form stays registered as the reference semantics. The
    same carry pattern fixes c34_dwell's lag(1) (one carry row per
    boundary)."""
    w = (Window.partitionBy("event_type").orderBy("ts", "event_id")
         .rowsBetween(-(window - 1), 0))
    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    base = events.select(
        "event_type", "event_id", "value", "ts", m.alias("_m"))
    framed = base.select(
        "event_type", "event_id", "value",
        F.col("_m").alias("_mc"),
        F.sum("_m").over(w).alias("_s1"),
        F.sum(F.col("_m") * F.col("_m")).over(w).alias("_s2"),
        F.count(F.lit(1)).over(w).alias("_n"))
    n = F.col("_n").cast("double")
    mean = F.col("_s1").cast("double") / n
    var = (F.col("_s2").cast("double") - F.col("_s1").cast("double")
           * F.col("_s1").cast("double") / n) / (n - 1.0)
    z = (F.col("_mc").cast("double") - mean) / F.sqrt(var)
    return (framed
            .filter((F.col("_n") == window))
            .withColumn("_var", var)
            .filter(F.col("_var") > 0)
            .withColumn("_z", z)
            .filter(F.abs(F.col("_z")) > z_thresh)
            .select("event_type", "event_id", "value",
                    F.round("_z", 6).alias("z")))


def holt_smoothing(events: DataFrame) -> DataFrame:
    """C12f: Holt double-exponential smoothing (level + trend) per user
    series — the forecasting-feature smoother one step past C12e's EWMA:
    where EWMA tracks a level only, Holt carries a trend term, so the
    one-step-ahead forecast (level + trend) anticipates drift.

        l_t = α·x_t + (1-α)(l_{t-1} + b_{t-1})
        b_t = β(l_t - l_{t-1}) + (1-β)·b_{t-1}        (l_1 = x_1, b_1 = 0)

    α = β = 0.5, so every multiply is an EXACT power-of-two scaling and
    each step performs the same correctly-rounded IEEE adds in the same
    order in any engine — the recurrence is bit-exact against the
    oracle's recursive CTE with no float tolerance (same discipline as
    the EWMA/anomaly rows; the bit-exact float audit enforces it).

    A coupled two-term recurrence has no prefix-sum form (unlike the
    frame-array EWMA above), so this is the one legitimately sequential
    batch kernel. Optimization r14 (guide §4.1/§4.5): the per-user
    applyInPandas form paid one Python kernel invocation PER KEY —
    ~10k Arrow-framed calls on 2-3-row groups at sf0.1, with the
    per-call overhead dominating the arithmetic (measured: the same
    machinery with a no-op kernel costs as much as the full query).
    Now ONE MapInPandas kernel per partition walks the
    (user_id, ts, event_id)-sorted rows sequentially, resetting state
    at user boundaries and carrying (level, trend) across Arrow batch
    boundaries — the identical IEEE ops in the identical order, so the
    emitted series is bit-for-bit the applyInPandas result (the
    float-audit discipline), with invocations = partitions, not keys.
    Parallelism = the one keyed exchange (same shuffle bytes); per-row
    cost is the recurrence itself."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        cur_user = None
        lev = trd = 0.0
        started = False
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            users = pdf["user_id"].to_numpy()
            x = pdf["value"].to_numpy()   # float64: IEEE ops are exact
            levs = np.empty(n)
            trds = np.empty(n)
            for i in range(n):
                u = users[i]
                if u != cur_user:
                    cur_user, started = u, False
                if not started:
                    lev, trd, started = x[i], 0.0, True
                else:
                    l_new = 0.5 * x[i] + 0.5 * (lev + trd)
                    trd = 0.5 * (l_new - lev) + 0.5 * trd
                    lev = l_new
                levs[i], trds[i] = lev, trd
            yield pd.DataFrame({
                "user_id": users,
                "event_id": pdf["event_id"].to_numpy(),
                "level": levs, "trend": trds,
                "forecast": levs + trds})

    return (events
            .select("user_id", "event_id", "ts", "value")
            .repartition("user_id")
            .sortWithinPartitions("user_id", "ts", "event_id")
            .mapInPandas(
                kernel,
                "user_id long, event_id long, level double, "
                "trend double, forecast double"))


def equity_drawdown(events: DataFrame) -> DataFrame:
    """C12h: per-user maximum drawdown — running balance (inflow types
    positive, outflow types negative), running peak, and the deepest
    peak-to-trough decline, the risk summary every per-entity value
    series gets (portfolio equity, credit balance, engagement budget).

    Engine-exact with ZERO float ops: flows are quantized to integer
    milli-units, the cumulative/running-max/drawdown chain is pure
    BIGINT window arithmetic, and the final balance is the plain flow
    sum (identical to "last cumulative value" without an argmax). One
    shuffle — the per-user window exchange — and the same exchange
    feeds the groupBy, so Catalyst reuses the partitioning. Scale: per
    key the frame is a running segment sum, O(1) amortized per row;
    parallelism = user cardinality."""
    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    flow = F.when(F.col("event_type").isin("purchase", "signup", "view"),
                  m).otherwise(-m)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    cur = (events
           .select("user_id", "ts", "event_id", flow.alias("_f"))
           .withColumn("_cum", F.sum("_f").over(w))
           .withColumn("_peak", F.max("_cum").over(w))
           .withColumn("_dd", F.col("_peak") - F.col("_cum")))
    return (cur.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("_f").alias("final_milli"),
                 F.max("_peak").alias("peak_milli"),
                 F.max("_dd").alias("max_dd_milli")))


def sma_crossover(events: DataFrame, fast: int = 3,
                  slow: int = 7) -> DataFrame:
    """C12i: moving-average crossover signals on per-type daily volume —
    the classic golden-cross / death-cross detector. A fast (3-day) and
    a slow (7-day) trailing total are compared WITHOUT ever forming a
    mean: sign(SMA_f − SMA_s) = sign(s_f·slow − s_s·fast), an exact
    BIGINT cross-multiplication, so the signal, its sign changes, and
    every emitted column are pure integers — nothing for IEEE rounding
    to perturb. Data-scale work is one (type, day) aggregate; the
    rolling frames and the lag run on the bounded daily table."""
    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    d = (events
         .groupBy("event_type", F.to_date("ts").alias("day"))
         .agg(F.sum(m).alias("t")))
    wf = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-(fast - 1), 0))
    ws = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-(slow - 1), 0))
    framed = (d
              .withColumn("s_fast", F.sum("t").over(wf))
              .withColumn("c_fast", F.count(F.lit(1)).over(wf))
              .withColumn("s_slow", F.sum("t").over(ws))
              .withColumn("c_slow", F.count(F.lit(1)).over(ws))
              .filter((F.col("c_fast") == fast)
                      & (F.col("c_slow") == slow)))
    diff = (F.col("s_fast") * F.lit(slow)
            - F.col("s_slow") * F.lit(fast))
    sgn = (F.when(diff > 0, 1).when(diff < 0, -1).otherwise(0)
           .cast("int"))
    wl = Window.partitionBy("event_type").orderBy("day")
    sig = (framed.withColumn("sign", sgn)
           .withColumn("prev_sign", F.lag("sign").over(wl)))
    return (sig
            .filter(F.col("prev_sign").isNotNull()
                    & (F.col("prev_sign") != F.col("sign")))
            .select("event_type", "day",
                    "prev_sign", "sign",
                    F.when(F.col("sign") > F.col("prev_sign"),
                           F.lit("golden")).otherwise(F.lit("death"))
                    .alias("direction"),
                    F.col("s_fast").alias("s_fast_milli"),
                    F.col("s_slow").alias("s_slow_milli")))


def ols_trend(orders: DataFrame, customer: DataFrame,
              nation: DataFrame) -> DataFrame:
    """C12j: per-nation demand trend — ordinary-least-squares slope and
    intercept of monthly order counts against a month index, the
    one-line "is this segment growing?" regression behind every KPI
    dashboard. Data-scale work is the orders⋈customer key join plus one
    (nation, month) aggregate; the regression runs on the bounded
    monthly table. Engine-exact: the five sufficient statistics AND the
    slope denominator n·Σx²−(Σx)² are exact BIGINT; slope then costs
    exactly one correctly-rounded double division, and the intercept
    reuses slope through one fixed multiply/subtract/divide tree — the
    same discipline as the cross-correlation row, bit-exact against the
    oracle with no tolerance."""
    x = ((F.year("o_orderdate") - F.lit(1995)) * 12
         + F.month("o_orderdate") - 1).cast("long")
    monthly = (orders
               .join(customer, orders.o_custkey == customer.c_custkey)
               .join(F.broadcast(nation),
                     customer.c_nationkey == nation.n_nationkey)
               .groupBy("n_name", x.alias("x"))
               .agg(F.count(F.lit(1)).alias("y")))
    agg = (monthly.groupBy(F.col("n_name").alias("nation"))
           .agg(F.count(F.lit(1)).alias("n_months"),
                F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx")))
    den = (F.col("n_months") * F.col("sxx")
           - F.col("sx") * F.col("sx"))
    nd = F.col("n_months").cast("double")
    slope = ((F.col("n_months") * F.col("sxy")
              - F.col("sx") * F.col("sy")).cast("double")
             / den.cast("double"))
    return (agg.withColumn("_den", den)
            .filter(F.col("_den") > 0)
            .withColumn("slope", slope)
            .withColumn("intercept",
                        (F.col("sy").cast("double")
                         - F.col("slope") * F.col("sx").cast("double"))
                        / nd)
            .select("nation", "n_months", "slope", "intercept"))


def theilsen_trend(orders: DataFrame, customer: DataFrame,
                   nation: DataFrame) -> DataFrame:
    """C12k: Theil–Sen robust trend — the median of all pairwise slopes
    of the monthly demand series, the outlier-immune companion to
    C12j's OLS (one anomalous month moves OLS, not the median slope).
    The pair enumeration is an ordered self-equi-join ON NATION over
    the BOUNDED monthly table (≈80 rows per key → ≈3k pairs), never
    event-scale; the median is RANK-SELECTED (a real pair's slope,
    C32i quantile discipline) with a full deterministic tie-break.
    Each pair's slope is one correctly-rounded division of exact
    integers, identical in any engine."""
    x = ((F.year("o_orderdate") - F.lit(1995)) * 12
         + F.month("o_orderdate") - 1).cast("long")
    monthly = (orders
               .join(customer, orders.o_custkey == customer.c_custkey)
               .join(F.broadcast(nation),
                     customer.c_nationkey == nation.n_nationkey)
               .groupBy(F.col("n_name").alias("nation"), x.alias("x"))
               .agg(F.count(F.lit(1)).alias("y")))
    a = monthly.select("nation", F.col("x").alias("xa"),
                       F.col("y").alias("ya"))
    b = monthly.select(F.col("nation").alias("nation_b"),
                       F.col("x").alias("xb"), F.col("y").alias("yb"))
    pairs = (a.join(b, (a.nation == b.nation_b) & (a.xa < b.xb))
             .select("nation",
                     (F.col("yb") - F.col("ya")).alias("dy"),
                     (F.col("xb") - F.col("xa")).alias("dx"),
                     "xa", "xb"))
    slope = F.col("dy").cast("double") / F.col("dx").cast("double")
    wr = Window.partitionBy("nation").orderBy(
        "slope", "dy", "dx", "xa", "xb")
    wn = Window.partitionBy("nation")
    ranked = (pairs.withColumn("slope", slope)
              .withColumn("rn", F.row_number().over(wr))
              .withColumn("n_pairs", F.count(F.lit(1)).over(wn)))
    med = ranked.filter(F.expr("rn = (n_pairs + 1) div 2"))
    pts = monthly.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_points"))
    return (med.join(pts, "nation")
            .select("nation", "n_points",
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("slope").alias("median_slope")))


def rsi_daily(events: DataFrame, period: int = 14) -> DataFrame:
    """C12l: Relative Strength Index over each event type's daily series —
    the classic momentum oscillator (Wilder 1978), in its SMA form so the
    arithmetic stays a fixed tree: day value = exact milli sum, delta =
    day-over-day difference, gains/losses are integer splits, and
    RSI = 100·Σgain / (Σgain+Σloss) over the trailing `period` deltas —
    BIGINT sums end-to-end, then ONE correctly-rounded division.
    (Wilder's original EWMA smoothing with α=1/14 is not a binary power,
    so the SMA variant is the engine-exact contract; see c12_ewma for
    the α=0.5 exponential discipline.)

    Scale: the frame is the per-(type, day) rollup — bounded by
    #types × calendar span, never event count; windows partition by
    event_type."""
    vm = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(F.sum(vm).alias("vm")))
    w = Window.partitionBy("event_type").orderBy("day")
    d = (day.withColumn("delta", F.col("vm") - F.lag("vm").over(w))
         .filter(F.col("delta").isNotNull()))
    wf = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-(period - 1), 0))
    g = (d.withColumn("gain", F.greatest(F.col("delta"), F.lit(0)))
         .withColumn("loss", F.greatest(-F.col("delta"), F.lit(0)))
         .withColumn("sg", F.sum("gain").over(wf))
         .withColumn("sl", F.sum("loss").over(wf))
         .withColumn("nf", F.count(F.lit(1)).over(wf))
         .filter((F.col("nf") == period) &
                 (F.col("sg") + F.col("sl") > 0)))
    return g.select(
        "event_type", "day", F.col("delta").alias("delta_milli"),
        ((F.lit(100) * F.col("sg")).cast("double") /
         (F.col("sg") + F.col("sl")).cast("double")).alias("rsi"))


def daily_peaks(events: DataFrame) -> DataFrame:
    """C12m: local-extrema detection over each type's daily series — the
    turning-point primitive behind alerting ("traffic peaked Tuesday")
    and the zig-zag downsampler family (cf. c16_lttb, which keeps the
    visual extremes; this names them). A day is a peak iff its exact
    milli sum strictly exceeds BOTH neighbors (series endpoints are
    never peaks), and the reported prominence is the rise over the
    higher neighbor — all BIGINT.

    Scale: one keyed aggregate to the bounded (type, day) grain, one
    lag/lead pass partitioned by type."""
    vm = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(F.sum(vm).alias("vm")))
    w = Window.partitionBy("event_type").orderBy("day")
    d = (day.withColumn("prev", F.lag("vm").over(w))
         .withColumn("nxt", F.lead("vm").over(w))
         .filter(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
         .filter((F.col("vm") > F.col("prev")) &
                 (F.col("vm") > F.col("nxt"))))
    return d.select(
        "event_type", "day", F.col("vm").alias("value_milli"),
        (F.col("vm") - F.greatest("prev", "nxt")).alias("prominence_milli"))


def forecast_error_daily(events: DataFrame, season: int = 7) -> DataFrame:
    """C12n: naive vs seasonal-naive forecast error per event type — the
    MASE-style baseline every forecasting effort is judged against
    (Hyndman & Koehler 2006): if predicting "same as 7 days ago" beats
    "same as yesterday", the series is weekly-seasonal and a model that
    ignores that is worse than no model. Exact BIGINT absolute-error
    sums over the lag-aligned daily series; the two MAE's and their
    ratio are single correctly-rounded divisions.

    Scale: bounded (type, day) grain; one lag window per horizon."""
    vm = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(F.sum(vm).alias("vm")))
    w = Window.partitionBy("event_type").orderBy("day")
    d = (day.withColumn("e1", F.abs(F.col("vm") - F.lag("vm", 1).over(w)))
         .withColumn("es", F.abs(F.col("vm")
                                 - F.lag("vm", season).over(w)))
         .filter(F.col("e1").isNotNull() & F.col("es").isNotNull()))
    g = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("e1").alias("naive_err_milli"),
        F.sum("es").alias("seasonal_err_milli"))
    return g.select(
        "event_type", "n_days", "naive_err_milli", "seasonal_err_milli",
        (F.col("seasonal_err_milli").cast("double")
         / F.col("naive_err_milli").cast("double")).alias("seasonal_ratio"))


def bollinger_breakouts(events: DataFrame, window: int = 10,
                        k: int = 2) -> DataFrame:
    """C12o: Bollinger-band breakout detection over each type's daily
    series — price ±k·σ envelope crossings, the mean-reversion signal
    complementing the RSI momentum row. Zero float thresholds: the
    breakout test |v − mean| > k·σ cross-multiplies to
    (n·v − Σv)²·(n−1) > k²·n·(n·Σv² − (Σv)²), evaluated in
    DECIMAL(38,0) (the c33_gini exact-accumulator discipline — the
    products overflow BIGINT at realistic daily sums, and DuckDB's
    HUGEINT matches decimal exactly), so band membership never depends
    on a sqrt rounding. The reported band mid/σ are fixed IEEE trees
    for the human-readable columns only.

    Scale: bounded (type, day) grain, one 20-row frame pass per type."""
    vm = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(F.sum(vm).alias("vm")))
    wf = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-(window - 1), 0))
    dec = "decimal(38,0)"
    d = (day.withColumn("s1", F.sum("vm").over(wf))
         .withColumn("s2", F.sum(F.col("vm").cast(dec)
                                 * F.col("vm").cast(dec)).over(wf))
         .withColumn("nf", F.count(F.lit(1)).over(wf))
         .filter(F.col("nf") == window))
    n = F.lit(window).cast(dec)
    dev = n * F.col("vm").cast(dec) - F.col("s1").cast(dec)
    varn = n * F.col("s2") \
        - F.col("s1").cast(dec) * F.col("s1").cast(dec)
    lhs = dev * dev * F.lit(window - 1).cast(dec)
    rhs = F.lit(k * k).cast(dec) * n * varn
    above = (dev > 0) & (lhs > rhs)
    below = (dev < 0) & (lhs > rhs)
    nd = F.lit(float(window))
    mean = F.col("s1").cast("double") / nd
    sd = F.sqrt((F.col("s2").cast("double")
                 - F.col("s1").cast("double") * F.col("s1").cast("double")
                 / nd) / (nd - F.lit(1.0)))
    return (d.filter(above | below)
            .select("event_type", "day",
                    F.col("vm").alias("value_milli"),
                    F.round(mean, 6).alias("band_mid_milli"),
                    F.round(sd, 6).alias("band_sd_milli"),
                    F.when(above, "above").otherwise("below")
                    .alias("side")))


ACF_LAGS = (1, 2, 7)


def acf_daily(events: DataFrame, lags: tuple[int, ...] = ACF_LAGS) -> DataFrame:
    """C12p: sample autocorrelation of the per-type daily value series
    at lags 1/2/7 (the persistence / weekly-echo diagnostic read before
    choosing C12f Holt vs C12n seasonal-naive forecasting; Box-Jenkins
    model identification). Row-lag form over the OBSERVED day series
    (the c12_rsi convention — calendar gaps are the C16f row's job).

    r_k = Σ_t (x_t−m)(x_{t+k}−m) / Σ_t (x_t−m)², computed exactly by
    clearing the rational mean m = S/n: multiply through by n² and use
    c_t = n·x_t − S, so r_k = Σ c_t·c_{t+k} / Σ c_t² — all integers.
    The centered term and its products are computed in DECIMAL(38,0)
    end-to-end (operands cast BEFORE the multiply-subtract, the
    corr_matrix discipline — advisor r9: an n·x−S squeezed through
    DECIMAL(18,0) overflows ~9× earlier than BIGINT, far below the
    DECIMAL(38,0) headroom the 100 TB shape needs); DuckDB pairs it
    with HUGEINT. One double division per (type, lag) at the end.

    Scale shape: day rollup = one map-side-combinable agg; (n, S) is a
    per-type broadcast (5 rows); the three leads share ONE keyed window
    pass; the lag fan-out is a literal stack over the per-type agg row
    — no self-join, no grid explode."""
    vm = F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")) \
        .alias("vm")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(vm))
    stats = day.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("vm").alias("s"))
    w = Window.partitionBy("event_type").orderBy("day")
    led = day.select(
        "event_type", "vm",
        *[F.lead("vm", k).over(w).alias(f"v{k}") for k in lags])
    j = led.join(F.broadcast(stats), "event_type")
    dec = "decimal(38,0)"
    nd, s = F.col("n_days").cast(dec), F.col("s").cast(dec)
    c0 = nd * F.col("vm").cast(dec) - s
    aggs = [F.first("n_days").alias("n_days"),
            F.sum(c0 * c0).alias("den")]
    for k in lags:
        ck = nd * F.col(f"v{k}").cast(dec) - s
        aggs.append(F.sum(c0 * ck).alias(f"num{k}"))
        aggs.append(F.count(F.col(f"v{k}")).alias(f"np{k}"))
    per_type = j.groupBy("event_type").agg(*aggs)
    rows = ", ".join(f"{k}, np{k}, num{k}" for k in lags)
    stacked = per_type.selectExpr(
        "event_type", "n_days", "den",
        f"stack({len(lags)}, {rows}) AS (lag, n_pairs, num)")
    # string-bridged decimal→double (see relational.corr_matrix): the
    # native DECIMAL→DOUBLE cast rounds differently from DuckDB's
    # HUGEINT→DOUBLE above 2^53; string→double is correctly rounded in
    # both engines.
    return (stacked
            .filter((F.col("den") > 0) & (F.col("n_pairs") > 0))
            .select("event_type", F.col("lag").cast("int").alias("lag"),
                    "n_days", "n_pairs",
                    (F.col("num").cast("string").cast("double")
                     / F.col("den").cast("string").cast("double"))
                    .alias("acf")))


def stl_decompose(events: DataFrame) -> DataFrame:
    """C12q: STL-lite seasonal decomposition of the per-type daily
    series — trend (centered 7-day moving average), weekday seasonal
    (mean detrended value per day-of-week), residual (the rest), the
    classical additive decomposition (Cleveland et al. 1990's STL with
    one pass and fixed weekly period) that turns "sales moved" into
    "trend moved vs it's just Tuesday".

    Engine-exact by clearing every rational: trend = sum7/7 keeps the
    integer sum7; detrended·7 = 7·vm − sum7 (integer); seasonal's mean
    over n_dow days multiplies through, so residual·7·n_dow =
    n_dow·(7·vm − sum7) − sum_detr7 (integer). The three emitted
    doubles are each ONE division of exact integers. Day-of-week =
    days-since-1900-01-01 (a Monday) mod 7 — immune to the engines'
    dow-numbering split.

    Scale shape: day rollup = one map-side-combinable agg; ONE keyed
    window pass per type for the centered frame; the (type, dow)
    seasonal table is bounded (≤7 rows/type) and broadcasts back.
    Interior days only (full 7-day frame), the standard STL edge
    treatment."""
    vm = F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")) \
        .alias("vm")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(vm))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-3, 3))
    trended = (day
               .withColumn("sum7", F.sum("vm").over(w))
               .withColumn("n7", F.count(F.lit(1)).over(w))
               .filter(F.col("n7") == 7)
               .withColumn("detr7", F.lit(7) * F.col("vm") - F.col("sum7"))
               .withColumn("dow", F.expr(
                   "CAST(datediff(day, DATE '1900-01-01') % 7 AS INT)")))
    seasonal = (trended.groupBy("event_type", "dow")
                .agg(F.sum("detr7").alias("sdetr7"),
                     F.count(F.lit(1)).alias("n_dow")))
    j = trended.join(F.broadcast(seasonal), ["event_type", "dow"])
    return j.select(
        "event_type", "day", "dow", "vm",
        (F.col("sum7").cast("double") / F.lit(7.0)).alias("trend"),
        (F.col("sdetr7").cast("double")
         / (F.lit(7.0) * F.col("n_dow").cast("double"))).alias("seasonal"),
        ((F.col("n_dow") * F.col("detr7") - F.col("sdetr7")).cast("double")
         / (F.lit(7.0) * F.col("n_dow").cast("double"))).alias("residual"))


SEASONAL_Z_SHIFT = (1 << 40) * 1000  # nonneg shift before exact div


def seasonal_anomalies(events: DataFrame) -> DataFrame:
    """C33w: seasonally-adjusted anomaly detection — the payoff of the
    C12q decomposition: z-score the RESIDUAL, not the raw value, so a
    normal busy-Tuesday never trips the alarm and a quiet-Tuesday
    outage does (the C33h rolling z-score's blind spot, demonstrated).

    Everything before the emitted double is exact integer arithmetic:
    the residual in milli·7·n_dow units is the C12q integer numerator
    (n_dow·detr7 − sdetr7); it is shifted nonneg and exact-divided by
    1000 (`div` is truncation-vs-floor-split on negatives — the shift
    sidesteps it while leaving variance and the z decision invariant);
    per-type (n, Σq, Σq²) are DECIMAL(38,0)/HUGEINT sums; the 3σ
    verdict is the cross-multiplied comparison
    (n−1)·(n·q−S)² > 9·n·(n·Σq²−S²) — no sqrt in the decision — and z
    itself is one signed sqrt of string-bridged exact integers.
    Zero-variance series emit NULL z and never alarm.

    Scale shape: the C12q pipeline (one keyed window + bounded
    seasonal broadcast) plus one per-type stats broadcast (5 rows)."""
    # recompute the integer residual numerator directly (stl_decompose
    # emits doubles; the verdict needs the exact integers)
    vm = F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")) \
        .alias("vm")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(vm))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-3, 3))
    trended = (day
               .withColumn("sum7", F.sum("vm").over(w))
               .withColumn("n7", F.count(F.lit(1)).over(w))
               .filter(F.col("n7") == 7)
               .withColumn("detr7", F.lit(7) * F.col("vm") - F.col("sum7"))
               .withColumn("dow", F.expr(
                   "CAST(datediff(day, DATE '1900-01-01') % 7 AS INT)")))
    seasonal = (trended.groupBy("event_type", "dow")
                .agg(F.sum("detr7").alias("sdetr7"),
                     F.count(F.lit(1)).alias("n_dow")))
    res = (trended.join(F.broadcast(seasonal), ["event_type", "dow"])
           .withColumn("res_int",
                       F.col("n_dow") * F.col("detr7") - F.col("sdetr7"))
           .withColumn("q", F.expr(
               f"(res_int + CAST({SEASONAL_Z_SHIFT} AS BIGINT)) div 1000")))
    stats = (res.groupBy("event_type")
             .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
                  F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
                  # cast BEFORE multiplying: q is shift-dominated
                  # (~2^40·… ) so q·q overflows BIGINT
                  F.sum(F.col("q").cast("decimal(38,0)") * F.col("q"))
                  .alias("ss")))
    j = res.join(F.broadcast(stats), "event_type")
    dev = F.col("n") * F.col("q").cast("decimal(38,0)") - F.col("s")
    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")

    def xd(c):
        return c.cast("string").cast("double")

    # the sqrt args are exact decimal integers → string-bridge the cast
    z = (F.when(var_num > 0,
                F.when(dev >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
                * F.sqrt(xd((F.col("n") - 1) * dev * dev))
                / F.sqrt(xd(F.col("n") * var_num)))
         .alias("z"))
    alarm = ((var_num > 0)
             & ((F.col("n") - 1) * dev * dev
                > F.lit(9).cast("decimal(38,0)") * F.col("n") * var_num))
    return (j.select("event_type", "day", "res_int", z,
                     alarm.alias("is_anomaly")))


def change_point(events: DataFrame) -> DataFrame:
    """C12r: exact single change-point per type (binary segmentation,
    one split — the CUSUM-family level-shift locator read after the
    C33l drift alarm fires: WHERE did the mean move?). For the per-type
    daily series x_1..x_n, the split k maximizing the between-segment
    SSE reduction is argmax_k (n·S_k − k·S_n)² / (k·(n−k)) — prefix
    sums clear both segment means, so the score is a ratio of exact
    integers (the acf_daily/corr_matrix DECIMAL(38,0) discipline for
    the centered square) and the ONE division per k is string-bridged
    into an engine-identical double. Ties break to the smallest k, so
    the argmax is deterministic in both engines.

    Scale: day rollup = one map-side-combinable agg; prefix sums ride
    ONE keyed window pass per type over the bounded day axis; the
    argmax is a per-type rank over the same bounded frame."""
    dec = "decimal(38,0)"
    vm = F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")) \
        .alias("vm")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(vm))
    w = Window.partitionBy("event_type").orderBy("day")
    pre = (day
           .withColumn("i", F.row_number().over(w))
           .withColumn("s_i", F.sum("vm").over(
               w.rowsBetween(Window.unboundedPreceding, 0)))
           .withColumn("next_day", F.lead("day").over(w)))
    tot = (day.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_days"),
                F.sum("vm").alias("s_n")))
    k = (pre.join(F.broadcast(tot), "event_type")
         .filter(F.col("i") < F.col("n_days")))
    num = (F.col("n_days").cast(dec) * F.col("s_i")
           - F.col("i").cast(dec) * F.col("s_n"))
    sb = lambda c: c.cast("string").cast("double")  # noqa: E731
    gain = (sb(num * num)
            / (F.col("i") * (F.col("n_days") - F.col("i")))
            .cast("double"))
    scored = k.withColumn("gain", gain)
    wr = Window.partitionBy("event_type").orderBy(
        F.col("gain").desc(), F.col("i"))
    return (scored.withColumn("_r", F.row_number().over(wr))
            .filter(F.col("_r") == 1)
            .select("event_type", "n_days",
                    F.col("i").cast("long").alias("split_k"),
                    F.col("next_day").alias("split_day"),
                    "gain",
                    (sb(F.col("s_i")) / F.col("i").cast("double"))
                    .alias("mean_left_milli"),
                    (sb(F.col("s_n").cast(dec) - F.col("s_i"))
                     / (F.col("n_days") - F.col("i")).cast("double"))
                    .alias("mean_right_milli")))


def rolling_zscore_anomalies_daybucket(events: DataFrame,
                                       window: int = 20,
                                       z_thresh: float = 3.0) -> DataFrame:
    """C33h scale rewrite (verdict r9 item 8, measured round 10): the
    SAME rolling z-score as rolling_zscore_anomalies — identical output,
    SAME oracle — with the window partitioned by (event_type, day)
    instead of event_type alone, lifting parallelism from |types| tasks
    (the ledger's worst probe growth, 4.22×) to |types|·|days|. Boundary
    frames stay complete because every event ALSO rides the next day's
    partition as a flagged carry row (frames read carries; only
    non-carry rows emit). A/B at 10×: 1.356 s → 1.022 s, growth
    2.80×→2.03×, output identical.

    Correctness precondition: a trailing `window`-row frame may span at
    most {current day, previous day}, i.e. every (type, day) must hold
    ≥ window−1 events AND every type's calendar-day axis must be
    contiguous (a fully missing day would leave the first window−1
    events after the gap with no carry rows, so `_n < window` would
    silently drop anomalies the one-level form emits — the
    dwell_stats_bucketed gap-day failure mode). Both are asserted at
    build from the bounded per-day count table (a 1-row pull,
    build-time-job class); sparser or gappy corpora fall back to the
    one-level form instead of silently truncating frames."""
    gate = (events.groupBy("event_type", F.to_date("ts").alias("_d"))
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("event_type")
            .agg(F.min("c").alias("mn"),
                 F.count(F.lit(1)).alias("nd"),
                 (F.datediff(F.max("_d"), F.min("_d")) + 1).alias("span"))
            .agg(F.min("mn").alias("mn"),
                 F.min((F.col("nd") == F.col("span")).cast("int"))
                 .alias("contig")))
    row = gate.collect()[0]  # bounded 1-row density+contiguity gate
    if row["mn"] is None or row["mn"] < window - 1 or row["contig"] == 0:
        return rolling_zscore_anomalies(events, window, z_thresh)

    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    base = events.select("event_type", "event_id", "value", "ts",
                         m.alias("_m"), F.to_date("ts").alias("_day"))
    carry = (base.withColumn("_day", F.date_add("_day", 1))
             .withColumn("_carry", F.lit(1)))
    own = base.withColumn("_carry", F.lit(0))
    u = own.unionByName(carry)
    w = (Window.partitionBy("event_type", "_day")
         .orderBy("ts", "event_id", "_carry")
         .rowsBetween(-(window - 1), 0))
    framed = u.select(
        "event_type", "event_id", "value", "_carry",
        F.col("_m").alias("_mc"),
        F.sum("_m").over(w).alias("_s1"),
        F.sum(F.col("_m") * F.col("_m")).over(w).alias("_s2"),
        F.count(F.lit(1)).over(w).alias("_n"))
    n = F.col("_n").cast("double")
    mean = F.col("_s1").cast("double") / n
    var = (F.col("_s2").cast("double") - F.col("_s1").cast("double")
           * F.col("_s1").cast("double") / n) / (n - 1.0)
    z = (F.col("_mc").cast("double") - mean) / F.sqrt(var)
    return (framed
            .filter(F.col("_carry") == 0)
            .filter(F.col("_n") == window)
            .withColumn("_var", var)
            .filter(F.col("_var") > 0)
            .withColumn("_z", z)
            .filter(F.abs(F.col("_z")) > z_thresh)
            .select("event_type", "event_id", "value",
                    F.round("_z", 6).alias("z")))


def seasonal_strength(events: DataFrame) -> DataFrame:
    """C12s: seasonal-strength gauge — Hyndman & Athanasopoulos' F_s =
    max(0, 1 − Var(residual)/Var(detrended)) on the C12q STL split
    (detrended = seasonal + residual by construction), the one-number
    answer to "does this series actually have a weekly pattern worth
    modeling?" read before choosing C12n seasonal-naive vs C12f Holt.

    Engine-exact: the integer residual/detrended numerators come from
    the C12q clearing; each is divided ONCE (string-bridged, IEEE-
    identical) and micro-quantized per row (floor(x·1e6 + 0.5) — the
    lm_xent quantize-before-sum contract), so the variance sufficient
    stats are exact DECIMAL(38,0)/HUGEINT integer sums and the strength
    is one string-bridged division. Zero detrended variance emits NULL.

    Scale shape: the C12q pipeline (day rollup, one keyed window,
    bounded seasonal broadcast) + one 5-row per-type agg."""
    dec = "decimal(38,0)"
    sb = lambda c: c.cast("string").cast("double")  # noqa: E731
    vm = F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")) \
        .alias("vm")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(vm))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-3, 3))
    trended = (day
               .withColumn("sum7", F.sum("vm").over(w))
               .withColumn("n7", F.count(F.lit(1)).over(w))
               .filter(F.col("n7") == 7)
               .withColumn("detr7",
                           F.lit(7) * F.col("vm") - F.col("sum7"))
               .withColumn("dow", F.expr(
                   "CAST(datediff(day, DATE '1900-01-01') % 7 AS INT)")))
    seasonal = (trended.groupBy("event_type", "dow")
                .agg(F.sum("detr7").alias("sdetr7"),
                     F.count(F.lit(1)).alias("n_dow")))
    j = trended.join(F.broadcast(seasonal), ["event_type", "dow"])
    res = (sb(F.col("n_dow").cast(dec) * F.col("detr7")
              - F.col("sdetr7"))
           / (F.lit(7.0) * F.col("n_dow").cast("double")))
    det = sb(F.col("detr7")) / F.lit(7.0)
    qr = F.floor(res * 1000000.0 + 0.5).cast("long")
    qd = F.floor(det * 1000000.0 + 0.5).cast("long")
    stats = (j.select("event_type", qr.alias("qr"), qd.alias("qd"))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("qr").cast(dec)).alias("sr"),
                  F.sum(F.col("qr").cast(dec) * F.col("qr"))
                  .alias("ssr"),
                  F.sum(F.col("qd").cast(dec)).alias("sd"),
                  F.sum(F.col("qd").cast(dec) * F.col("qd"))
                  .alias("ssd")))
    nn = F.col("n").cast(dec)
    num_r = nn * F.col("ssr") - F.col("sr") * F.col("sr")
    num_d = nn * F.col("ssd") - F.col("sd") * F.col("sd")
    ratio = sb(num_r) / sb(num_d)
    return stats.select(
        "event_type", "n",
        sb(num_r).alias("var_resid_num"),
        sb(num_d).alias("var_detr_num"),
        F.when(num_d > 0,
               F.greatest(F.lit(0.0), F.lit(1.0) - ratio))
        .alias("strength"))


def runs_test(events: DataFrame) -> DataFrame:
    """C12 addendum (round 13): Wald–Wolfowitz runs test on the daily
    value series — per event type, the day-over-day deltas reduce to an
    up/down sign sequence (zero deltas drop, the standard treatment)
    and the number of RUNS of equal signs is compared against its
    randomness expectation E[R] = 1 + 2·n₁·n₂/(n₁+n₂). Too few runs =
    trending/sticky series, too many = oscillating — the independence
    gate a forecasting pipeline applies before trusting i.i.d.-based
    intervals (complements C12's ACF, which measures linear memory;
    runs are distribution-free).

    Exactness: daily sums ride half-up micro-units (BIGINT), signs and
    run boundaries are pure integer comparisons, and E[R] / Var[R] are
    each ONE division of exact integer products, so both engines build
    z from bit-identical doubles (sqrt is correctly rounded IEEE).
    Shape: one bounded (type, day) rollup, two keyed lag passes over
    the ≤|types|·|days| day table, a ≤|types|-row report."""
    vm = F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long")
    daily = (events
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.sum(vm).alias("s")))
    w = Window.partitionBy("event_type").orderBy("day")
    signed = (daily
              .withColumn("delta", F.col("s") - F.lag("s").over(w))
              .filter(F.col("delta").isNotNull() & (F.col("delta") != 0))
              .withColumn("sgn", F.when(F.col("delta") > 0, 1)
                          .otherwise(-1)))
    w2 = Window.partitionBy("event_type").orderBy("day")
    marked = signed.withColumn(
        "chg", F.when(F.lag("sgn").over(w2).isNull()
                      | (F.col("sgn") != F.lag("sgn").over(w2)), 1)
        .otherwise(0))
    g = (marked.groupBy("event_type")
         .agg(F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
              .cast("long").alias("n_up"),
              F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
              .cast("long").alias("n_down"),
              F.sum("chg").cast("long").alias("runs")))
    n1, n2, r = F.col("n_up"), F.col("n_down"), F.col("runs")
    n = n1 + n2
    two_p = 2 * n1 * n2
    exp_r = F.lit(1.0) + two_p.cast("double") / n.cast("double")
    var_num = two_p * (two_p - n)
    var_den = n * n * (n - 1)
    var_r = var_num.cast("double") / var_den.cast("double")
    z = F.when((n1 > 0) & (n2 > 0) & (n > 1) & (var_num > 0),
               (r.cast("double") - exp_r) / F.sqrt(var_r))
    return g.select(
        "event_type", "n_up", "n_down", "runs",
        F.when(n > 0, exp_r).alias("expected_runs"),
        z.alias("runs_z"))


def variance_ratio(events: DataFrame, k: int = 7) -> DataFrame:
    """C12 addendum (round 13, second slate): Lo–MacKinlay variance
    ratio on the daily value series — VR(k) = Var(x_t − x_{t−k}) /
    (k · Var(x_t − x_{t−1})). A random walk reads VR ≈ 1; mean-reverting
    series < 1; trending/momentum series > 1 — the
    difference-before-you-forecast gauge beside C12t's runs test (runs
    asks "are moves independent"; VR asks "does variance scale
    linearly with horizon", which is what differencing assumes).

    Exactness: daily sums ride half-up micro-units; both difference
    series' variance sufficient stats (n, Σd, Σd²) are exact
    DECIMAL(38,0)/HUGEINT integers from ONE keyed window pass (two lags
    share it), each variance is ONE string-bridged division of the
    cleared form (n·Σd² − (Σd)²)/(n·(n−1)), and VR is a single final
    division. Lag-k rows are matched on the day INDEX (datediff), so a
    missing calendar day yields no pair rather than a silently
    misaligned one. Shape: bounded (type, day) rollup + one keyed
    window + a ≤|types|-row report."""
    dec = "decimal(38,0)"
    vm = F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("long")
    daily = (events
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.sum(vm).alias("s"))
             .withColumn("idx", F.datediff(F.col("day"),
                                           F.lit("1970-01-01"))))
    w = Window.partitionBy("event_type").orderBy("idx")
    lagged = (daily
              .withColumn("p1_idx", F.lag("idx", 1).over(w))
              .withColumn("p1", F.lag("s", 1).over(w))
              .withColumn("pk_idx", F.lag("idx", k).over(w))
              .withColumn("pk", F.lag("s", k).over(w)))
    d1 = F.when(F.col("p1_idx") == F.col("idx") - 1,
                F.col("s") - F.col("p1"))
    dk = F.when(F.col("pk_idx") == F.col("idx") - k,
                F.col("s") - F.col("pk"))
    g = (lagged
         .select("event_type", d1.alias("d1"), dk.alias("dk"))
         .groupBy("event_type")
         .agg(F.count("d1").alias("n1"),
              F.sum(F.col("d1").cast(dec)).alias("s1"),
              # cast BEFORE squaring: micro-unit diffs reach ~1e10 at
              # sf0.1, so the square overflows BIGINT long before the
              # decimal sum would
              F.sum(F.col("d1").cast(dec) * F.col("d1")).alias("ss1"),
              F.count("dk").alias("nk"),
              F.sum(F.col("dk").cast(dec)).alias("sk"),
              F.sum(F.col("dk").cast(dec) * F.col("dk")).alias("ssk")))

    def xd(c):
        return c.cast("string").cast("double")

    n1d, nkd = F.col("n1").cast(dec), F.col("nk").cast(dec)
    var1 = F.when(F.col("n1") > 1,
                  xd(n1d * F.col("ss1") - F.col("s1") * F.col("s1"))
                  / xd(n1d * (n1d - 1)))
    vark = F.when(F.col("nk") > 1,
                  xd(nkd * F.col("ssk") - F.col("sk") * F.col("sk"))
                  / xd(nkd * (nkd - 1)))
    return g.select(
        "event_type", "n1", "nk",
        var1.alias("var_1"), vark.alias("var_k"),
        F.when(var1 > 0, vark / (k * var1)).alias("vr"))
