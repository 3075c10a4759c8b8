"""Event-time windowed aggregation — batch forms (SURVEY §2C C22-C27).

These are the *batch oracle* semantics of the streaming operators in
`streaming/`; the streaming tests assert availableNow-mode equivalence against
exactly these shapes (reference precedent: the run-once mode A21,
multi_event_avro_producer_client.go:98-103).

Window state scales with (#keys × #open windows), not with data volume —
watermarks bound the open-window set in the streaming twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .exact import dsum


def tumbling_counts(events: DataFrame) -> DataFrame:
    """C22: 1-hour tumble × event_type. window() start == date_trunc('hour')
    for aligned windows, which the oracle exploits."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """C23: 1-hour window sliding every 15 min. Spark expands each row into
    window_len/slide = 4 windows before the agg (the oracle mirrors that
    expansion with generate_series)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


def session_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """C24: per-user session windows with a 30-min gap, via the built-in
    session_window. The oracle is the classic lag+cumsum sessionization."""
    return (
        events.groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
                       "user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n", "sum_value")
    )


def late_data_filtered_counts(events: DataFrame, delay_minutes: int = 60) -> DataFrame:
    """C25 batch form: drop records older than max(ts) - delay, then tumble.
    This is the declared batch contract for watermark semantics (SURVEY §5.3);
    the streaming twin uses withWatermark and is equivalence-tested."""
    bound = events.agg(
        (F.max("ts") - F.expr(f"INTERVAL {delay_minutes} MINUTES")).alias("cutoff"))
    return (
        events.join(F.broadcast(bound))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )


def dedup_first_event(events: DataFrame) -> DataFrame:
    """C26 batch form: keep the earliest event per (user_id, event_type) —
    the batch twin of dropDuplicatesWithinWatermark. Deterministic tie-break on
    event_id."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts"), F.col("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


def running_user_state(events: DataFrame) -> DataFrame:
    """C27 batch form: per-user running count and running sum over time — the
    reference's offset-tracking state (A16/A17) generalized. Streaming twin:
    transformWithStateInPandas in streaming/stateful.py."""
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts"), F.col("event_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.select(
        "user_id", "event_id",
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.sum(F.col("value").cast("decimal(27,6)")).over(w).cast("double")
            .alias("running_sum"),
    )

def funnel_analysis(events: DataFrame) -> DataFrame:
    """C34: event funnel — per user, the earliest view → first click after
    that view → first purchase after that click, then one corpus row per
    funnel stage with user counts and conversion share. The standard
    product-analytics sequence query, expressed as conditional MIN
    aggregates per user (one keyed shuffle on user_id, no self-joins, no
    window over the event stream) + a bounded 3-row final reduce.

    Stage times are exact timestamps; the strictly-after comparisons make
    the stage chain order-sensitive, which conditional aggregation handles
    in two passes over the per-user group (min view, then min click >
    that, then min purchase > that) — each pass a first-class aggregate,
    so partial aggregation still applies map-side.
    """
    per_user = (
        events.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
             .alias("t_view"))
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .join(per_user, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"), F.first("t_view").alias("t_view"))
    )
    # F.first on t_view is deterministic: t_view is functionally dependent
    # on user_id (one value per group)
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(clicks.select("user_id", "t_click"), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_view = per_user.filter(F.col("t_view").isNotNull()) \
        .agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("1_view").alias("stage"), "n")
    n_click = clicks.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("2_click").alias("stage"), "n")
    n_buy = purchases.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("3_purchase").alias("stage"), "n")
    funnel = n_view.unionAll(n_click).unionAll(n_buy)
    from pyspark.sql import Window
    w = Window.partitionBy()
    return funnel.select(
        "stage", "n",
        F.round(F.col("n").cast("double")
                / F.max("n").over(w).cast("double"), 6).alias("share"))

def funnel_analysis_windowed(events: DataFrame,
                             max_hours: int = 48) -> DataFrame:
    """C34 windowed variant: the same view → click → purchase funnel, but
    each stage must follow its predecessor within `max_hours` — the form
    product analytics actually ships (unbounded funnels inflate conversion
    with coincidental far-future events). Identical plan shape to
    funnel_analysis: conditional MIN aggregates per user, keyed shuffles
    only, bounded 3-row reduce. The within-bound comparisons run on
    unix_micros (integer microseconds) — unix_timestamp truncates to
    whole seconds, which flips membership for events whose sub-second
    offsets straddle the bound; the oracle compares epoch_us the same
    way."""
    from pyspark.sql import Window

    bound_us = max_hours * 3600 * 1_000_000
    per_user = (
        events.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
             .alias("t_view"))
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .join(per_user, "user_id")
        .filter((F.col("ts") > F.col("t_view"))
                & (F.unix_micros("ts")
                   <= F.unix_micros("t_view") + bound_us))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(clicks.select("user_id", "t_click"), "user_id")
        .filter((F.col("ts") > F.col("t_click"))
                & (F.unix_micros("ts")
                   <= F.unix_micros("t_click") + bound_us))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    n_view = per_user.filter(F.col("t_view").isNotNull()) \
        .agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("1_view").alias("stage"), "n")
    n_click = clicks.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("2_click").alias("stage"), "n")
    n_buy = purchases.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("3_purchase").alias("stage"), "n")
    funnel = n_view.unionAll(n_click).unionAll(n_buy)
    w = Window.partitionBy()
    return funnel.select(
        "stage", "n",
        F.round(F.col("n").cast("double")
                / F.max("n").over(w).cast("double"), 6).alias("share"))


def cohort_retention(events: DataFrame) -> DataFrame:
    """C34b: weekly cohort retention — users cohorted by the week of their
    first event; for each (cohort_week, week_offset) the distinct active
    users and the retention share of the cohort. The companion report to
    the funnel: funnel measures conversion depth, retention measures
    return breadth.

    Two keyed aggs (first-activity per user, distinct user-weeks) and one
    join on user_id — every shuffle keyed on user_id or the tiny
    (cohort, offset) pair; output is O(weeks²) rows regardless of corpus
    size. Week offsets are exact integers ((epoch - epoch)/604800 on
    week-truncated timestamps), so the only double is the final share
    division of exact counts."""
    from pyspark.sql import Window

    first = (events.groupBy("user_id")
             .agg(F.date_trunc("week", F.min("ts")).alias("cohort")))
    weeks = (events
             .select("user_id", F.date_trunc("week", "ts").alias("wk"))
             .distinct())
    offset = ((F.unix_timestamp("wk") - F.unix_timestamp("cohort"))
              / 604800).cast("int")
    act = (weeks.join(first, "user_id")
           .groupBy("cohort", offset.alias("week_offset"))
           .agg(F.count(F.lit(1)).alias("n_active")))
    size = Window.partitionBy("cohort")
    return act.select(
        F.to_date("cohort").alias("cohort"), "week_offset", "n_active",
        F.round(F.col("n_active").cast("double")
                / F.max(F.when(F.col("week_offset") == 0,
                               F.col("n_active"))).over(size)
                .cast("double"), 6).alias("retention"))

def transition_matrix(events: DataFrame) -> DataFrame:
    """C34c: per-user event-type transition counts (the Markov-chain view
    of the event stream — the input to next-action prediction and to
    anomalous-session detection). For each user the event sequence is
    ordered by (ts, event_id); each adjacent pair contributes one
    (from_type, to_type) count, and the share normalizes per from_type.

    One keyed window over user_id (lead within the user's own ordered
    stream — partitions bounded by per-user event counts), then a tiny
    (type × type) aggregation; output is O(|event_types|²) regardless of
    corpus size."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events
             .select("user_id", "ts", "event_id", "event_type",
                     F.lead("event_type").over(w).alias("next_type"))
             .filter(F.col("next_type").isNotNull()))
    counts = (pairs.groupBy(F.col("event_type").alias("from_type"),
                            F.col("next_type").alias("to_type"))
              .agg(F.count(F.lit(1)).alias("n")))
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n",
        F.round(F.col("n").cast("double")
                / F.sum("n").over(tot).cast("double"), 6).alias("share"))

def markov_stationary(events: DataFrame,
                      iterations: int = 12) -> DataFrame:
    """C34u: stationary distribution of the event-type Markov chain —
    the long-run share of time the user population spends in each state
    if the C34c transition matrix kept applying (the steady-state view
    next-action prediction and load forecasting read; PageRank is this
    exact computation on a link graph). `iterations` fixed power steps
    of p·P from the uniform start.

    Integer fixed-point end-to-end (the c38_hits discipline): the
    transition matrix quantizes once to ppb row-ratios (one IEEE
    double divide + floor per cell — engine-identical), the state
    vector lives in ppm BIGINTs, each step is Σ (p·ratio) div 1e9 with
    dangling mass redistributed uniformly, renormalized by INTEGER
    division by the vector sum — no float ever forms in the loop, so
    the unrolled oracle replays the recurrence bit-identically.

    Scale shape: the data-scale work is the per-user lead window + the
    (type × type) count agg (same as C34c) — distributed. The power
    iteration then runs ON THE DRIVER over the COLLECTED matrix — a
    documented bounded pull (≤ |event_types|² rows, the ANN-codebook
    class): unlike the c38 graph loops, whose node sets scale with the
    data, this state space is the event-type vocabulary, so 12
    distributed rounds of a ≤|types|²-row frame would be pure
    scheduler overhead at ANY corpus size (measured: the distributed
    loop benched 3.2 s at sf0.1 with 0.96x probe growth — all fixed
    cost; the driver fold removes ~36 bounded-frame jobs)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events
             .select("event_type",
                     F.lead("event_type").over(w).alias("next_type"))
             .filter(F.col("next_type").isNotNull()))
    counts = (pairs.groupBy(F.col("event_type").alias("src"),
                            F.col("next_type").alias("dst"))
              .agg(F.count(F.lit(1)).alias("n")))
    rt = counts.groupBy("src").agg(F.sum("n").alias("out_n"))
    ratio = F.floor(F.col("n").cast("double")
                    / F.col("out_n").cast("double") * 1e9 + 0.5) \
        .cast("long")
    # bounded pulls: the ≤|types|²-row matrix, the ≤|types|-row degree
    # table, and the state vocabulary (collapses the corpus first)
    m = [(r["src"], r["dst"], int(r["ratio_ppb"]))
         for r in (counts.join(rt, "src")
                   .select("src", "dst", ratio.alias("ratio_ppb"))
                   .collect())]
    out_n = {r["src"]: int(r["out_n"]) for r in rt.collect()}
    states = sorted(r[0] for r in
                    events.select("event_type").distinct().collect())
    ns = len(states)
    if ns == 0:
        # an empty chain has no distribution — fail loudly instead of
        # dividing by zero (the hits() degenerate-input posture)
        raise ValueError("markov_stationary needs a non-empty event log")
    if ns > 1_000_000:
        # p0 = 1_000_000 // ns floors to 0 everywhere past 1e6 states,
        # collapsing the ppm mass to an all-zero vector — the state
        # space must be a bounded vocabulary for the driver fold anyway
        raise ValueError(
            f"markov_stationary: {ns} event types exceeds the 1e6-state "
            "ppm resolution (bounded-vocabulary precondition)")
    p = {st: 1_000_000 // ns for st in states}
    for _ in range(iterations):
        contrib = {st: 0 for st in states}
        for a, b, r9 in m:
            contrib[b] += (p[a] * r9) // 1_000_000_000
        dang = sum(p[st] for st in states if st not in out_n)
        praw = {st: contrib[st] + dang // ns for st in states}
        tot = sum(praw.values())
        if tot == 0:
            # all-zero renormalization mass (degenerate quantization)
            # — fail loudly, matching the empty-chain guard above
            raise ValueError(
                "markov_stationary: ppm mass floored to zero during "
                "renormalization (degenerate chain)")
        p = {st: (praw[st] * 1_000_000) // tot for st in states}
    spark = events.sparkSession
    return spark.createDataFrame(
        [(st, p[st], out_n.get(st, 0)) for st in states],
        "event_type string, p_ppm long, out_n long")


def rolling_user_activity(events: DataFrame, days: int = 7) -> DataFrame:
    """C34d: per-user rolling activity — for every event, the count and
    value-sum of the same user's events in the trailing `days` window
    (inclusive). The feature a streaming anomaly detector or engagement
    model reads. One keyed window per user ordered by event-time
    MICROSECONDS with a RANGE frame — no self-join, shuffle keyed on
    user_id only. Ordering by unix_micros (not unix_timestamp, which
    truncates to whole seconds) keeps window membership exact at the
    trailing boundary for sub-second timestamps; the oracle orders by
    epoch_us(ts) with the same integer-microsecond frame. Value sums
    quantize per-row to micro-units inside the frame so the rolling sum
    is order-insensitive and hash-matches the oracle."""
    from pyspark.sql import Window

    w = (Window.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-days * 86400 * 1_000_000, 0))
    micro = F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long")
    return events.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        (F.sum(micro).over(w).cast("double") / 1e6).alias("sum_trailing"))



def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """C34f: per-EVENT sessionization — assign every event its session
    ordinal, the enrichment form of C24's session_window aggregate (the
    aggregate tells you sessions exist; this labels each raw event with
    one, which is what funnel/journey analysis joins against). The
    classic lag + cumulative-sum: an event opens a new session when its
    gap from the user's previous event exceeds `gap_minutes`; the running
    count of openings IS the session ordinal.

    Precision: the gap compares exact integer microseconds (unix_micros —
    the joins.py contract; second-truncation at the gap boundary is the
    c34_rolling bug class ADVICE r4 flagged). Both window passes key on
    user_id — no unpartitioned window, state bounded per user. FULL
    oracle (lag/cumsum replay identically in DuckDB)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    opens = (prev.isNull()
             | ((us - prev) > gap_minutes * 60 * 1_000_000)).cast("long")
    return (
        events.select(
            "event_id", "user_id", "event_type",
            opens.alias("opens_session"),
            F.sum(opens).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
             .alias("session_seq"))
        .select("event_id", "user_id", "event_type", "session_seq",
                (F.col("opens_session") == 1).alias("is_session_start"))
    )


def cep_conversion(events: DataFrame,
                   window_us: int = 3_600_000_000) -> DataFrame:
    """C34g: complex-event-processing pattern with NEGATION — for every
    purchase, did a signup precede it within the window with NO error
    event in between? The negation ("no C between A and B") is what
    separates CEP from the C34 funnel's ordered-MIN shape: a funnel
    counts A→B orderings; CEP must prove the absence of an intervening
    event, which no per-stage MIN can express.

    Single keyed window pass, no self-join: a running error cumsum and
    an IGNORE-NULLS last() carry, onto each row, (a) the latest signup's
    timestamp and (b) the error count AS OF that signup — so
    "errors strictly between signup and purchase" is one subtraction.
    Deterministic (ts, event_id) ordering; one user_id Exchange; state
    per row is two longs, the same plan shape at any scale. The
    streaming twin is applyInPandasWithState with the identical carry —
    the batch form here is the oracle-checkable ground truth."""
    from pyspark.sql import Window

    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    base = events.select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"))
    carried = (base
               .withColumn("ce", F.sum(
                   (F.col("event_type") == "error").cast("long")).over(w))
               .withColumn("sig_ts", F.last(
                   F.when(F.col("event_type") == "signup",
                          F.col("ts_us")), ignorenulls=True).over(w))
               .withColumn("sig_ce", F.last(
                   F.when(F.col("event_type") == "signup",
                          F.col("ce")), ignorenulls=True).over(w)))
    return (carried.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts_us",
                    F.col("sig_ts").alias("signup_ts_us"),
                    (F.col("sig_ts").isNotNull()
                     & (F.col("ts_us") - F.col("sig_ts")
                        <= F.lit(window_us))
                     & (F.col("ce") - F.col("sig_ce") == 0))
                    .alias("converted")))


def touch_attribution(events: DataFrame) -> DataFrame:
    """C34h: first/last-touch revenue attribution — for each purchase,
    the most recent preceding click (last-touch credit) and the first
    view in the user's history (first-touch credit), the two canonical
    attribution models a marketing/analytics pipeline maintains.

    Pure window form: one shuffle on user_id; the conditional
    last/first over an UNBOUNDED PRECEDING .. 1 PRECEDING frame is the
    declarative "scan back for the latest matching event" — no
    self-join, no per-row probe. At scale the frame state is a single
    carried value per window function (Spark keeps running first/last,
    not the frame buffer)."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    enriched = events.select(
        "user_id", "event_id", "event_type", "ts", "value",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.first(view_id, ignorenulls=True).over(w).alias("first_view_id"))
    return (enriched.filter(F.col("event_type") == "purchase")
            .select("user_id",
                    F.col("event_id").alias("purchase_id"),
                    "value", "last_click_id", "first_view_id",
                    F.col("last_click_id").isNotNull().alias("attributed")))


def resample_daily_ffill(events: DataFrame) -> DataFrame:
    """C16b: per-user daily resampling with forward fill — project each
    user's irregular event series onto a regular daily grid (their first
    event day through their last), carrying the day's closing value
    forward across gap days. The time-series regularization step feature
    pipelines run before windowed model features.

    Plan: per-(user, day) closing value via row_number (one window pass),
    per-user day span via min/max agg, grid = sequence() + explode (rows
    generated distributed, proportional to span × users, never collected),
    left join closes onto the grid (keyed shuffle), then
    last(ignorenulls) forward-fill — the grid starts on a day with an
    observation, so no leading nulls exist."""
    day = F.to_date("ts")
    wlast = Window.partitionBy("user_id", "_day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    closes = (events.select("user_id", "ts", "event_id", "value",
                            day.alias("_day"))
              .withColumn("_rn", F.row_number().over(wlast))
              .filter(F.col("_rn") == 1)
              .select("user_id", "_day", F.col("value").alias("_close")))
    span = closes.groupBy("user_id").agg(
        F.min("_day").alias("_d0"), F.max("_day").alias("_d1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("_d0", "_d1")).alias("day"))
    wf = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0))
    return (grid.join(closes,
                      (grid.user_id == closes.user_id)
                      & (grid.day == closes._day), "left")
            .select(grid.user_id, "day", "_close")
            .select("user_id", "day",
                    F.last("_close", ignorenulls=True).over(wf)
                    .alias("value"),
                    F.col("_close").isNotNull().alias("observed")))


def rate_throttle(events: DataFrame, limit: int = 5) -> DataFrame:
    """C34i: per-key rate limiting — admit at most `limit` events per
    (user, clock hour), flag the rest. The ingestion-guard operator a
    streaming pipeline runs ahead of expensive enrichment (quota
    enforcement, abuse damping, per-tenant fairness); the batch form is
    one ranking window per (key, hour) partition — a single keyed
    exchange, state bounded by the partition, engine-exact integer/
    boolean output. Hours ride as epoch micros (UTC session) so the
    streaming twin's state machine reproduces the same keys with pure
    integer math."""
    w = Window.partitionBy(
        "user_id", F.date_trunc("hour", "ts")).orderBy("ts", "event_id")
    return (events
            .select(
                "event_id", "user_id",
                F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
                F.row_number().over(w).alias("seq"))
            .withColumn("admitted", F.col("seq") <= limit))


def resample_daily_interp(events: DataFrame) -> DataFrame:
    """C16c: per-user daily resampling with LINEAR interpolation — the
    gap-fill companion to C16b's forward fill: missing grid days take
    the straight line between the surrounding observed closes,

        v = v_prev + (v_next - v_prev) · Δdays_prev / Δdays_span

    (the estimator feature pipelines prefer when the series is a level,
    not a state). Same distributed plan as C16b (per-day close window,
    sequence-explode grid, keyed join); the fill needs BOTH directions,
    so two frame passes (last-ignorenulls backward, first-ignorenulls
    forward) carry the bracketing (day, value) pairs. The grid is
    bounded by each user's own span, so interior gaps always have both
    brackets. Engine-exact: day distances are exact integers and the
    interpolation is one fixed tree of correctly-rounded IEEE ops —
    bit-exact against the oracle (float audit enforced)."""
    day = F.to_date("ts")
    wlast = Window.partitionBy("user_id", "_day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    closes = (events.select("user_id", "ts", "event_id", "value",
                            day.alias("_day"))
              .withColumn("_rn", F.row_number().over(wlast))
              .filter(F.col("_rn") == 1)
              .select("user_id", "_day", F.col("value").alias("_close")))
    span = closes.groupBy("user_id").agg(
        F.min("_day").alias("_d0"), F.max("_day").alias("_d1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("_d0", "_d1")).alias("day"))
    wb = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(0, Window.unboundedFollowing))
    joined = (grid.join(closes,
                        (grid.user_id == closes.user_id)
                        & (grid.day == closes._day), "left")
              .select(grid.user_id, "day", "_close"))
    prev_v = F.last("_close", ignorenulls=True).over(wb)
    prev_d = F.last(F.when(F.col("_close").isNotNull(), F.col("day")),
                    ignorenulls=True).over(wb)
    next_v = F.first("_close", ignorenulls=True).over(wf)
    next_d = F.first(F.when(F.col("_close").isNotNull(), F.col("day")),
                     ignorenulls=True).over(wf)
    frac = (F.datediff(F.col("day"), F.col("_pd")).cast("double")
            / F.datediff(F.col("_nd"), F.col("_pd")).cast("double"))
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    return (joined
            .select("user_id", "day", "_close",
                    prev_v.alias("_pv"), prev_d.alias("_pd"),
                    next_v.alias("_nv"), next_d.alias("_nd"))
            .select("user_id", "day",
                    F.when(F.col("_close").isNotNull(), F.col("_close"))
                    .otherwise(interp).alias("value"),
                    F.col("_close").isNotNull().alias("observed")))


def dwell_stats(events: DataFrame) -> DataFrame:
    """C34j: inter-arrival (dwell) time distribution per event type —
    the arrival-process audit behind capacity planning and bot
    detection (machine traffic shows collapsed inter-arrival spread).
    Per type: count of gaps, min/max/mean gap, and the MEDIAN as a
    rank-selected data point (the discrete-quantile discipline of
    C32i winsorize — interpolating percentiles are not cross-engine
    bit-stable).

    One keyed window pass computes lag deltas in exact epoch micros;
    the stats are integer aggregates plus one correctly-rounded IEEE
    division for the mean. Two keyed exchanges total (lag window,
    final agg) — both on event_type."""
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (events
            .select("event_type",
                    (F.unix_micros("ts")
                     - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"))
            .filter(F.col("gap_us").isNotNull()))
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    ranked = (gaps
              .withColumn("_rn", F.row_number().over(wr))
              .withColumn("_n", F.count(F.lit(1)).over(
                  Window.partitionBy("event_type"))))
    med = (ranked
           .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
           .select("event_type", F.col("gap_us").alias("median_gap_us")))
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (F.sum("gap_us").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("mean_gap_us"))
    return agg.join(med, "event_type")


def km_survival(events: DataFrame, churn_days: int = 14) -> DataFrame:
    """C34k: Kaplan-Meier survival curve of user lifetime with churn
    censoring — the retention statistic product analytics actually
    reports (KM handles the users still active at observation end,
    which a naive lifetime histogram silently treats as churned).
    Setup: a user's duration is their observed span in days; the churn
    EVENT is a last-seen gap > `churn_days` before the corpus end;
    users active within the horizon are CENSORED.

        S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)

    Scale shape: one keyed per-user aggregate (the data-scale pass),
    then everything operates on the BOUNDED duration table (≤ span in
    days): at-risk counts are one cumulative window, and the product
    folds a collected factor array left-to-right with a JVM aggregate
    lambda — the same sequential-fold discipline as the EWMA row, so
    each factor (one correctly-rounded division and subtraction) and
    the running product are bit-identical to the oracle's list_reduce.
    Output: (dur_days, n_risk, n_events, n_censored, survival)."""
    spans = (events.groupBy("user_id")
             .agg(F.min(F.unix_micros("ts")).alias("first_us"),
                  F.max(F.unix_micros("ts")).alias("last_us")))
    end = events.agg(F.max(F.unix_micros("ts")).alias("end_us"))
    day_us = 86_400_000_000
    per_user = (spans.crossJoin(F.broadcast(end))
                .select(
                    F.expr(f"(last_us - first_us) div {day_us}")
                    .alias("dur_days"),
                    (F.col("end_us") - F.col("last_us")
                     > churn_days * day_us).alias("churned")))
    total = per_user.agg(F.count(F.lit(1)).alias("n_total"))
    tbl = (per_user.groupBy("dur_days")
           .agg(F.sum(F.when(F.col("churned"), 1).otherwise(0))
                .cast("long").alias("n_events"),
                F.sum(F.when(~F.col("churned"), 1).otherwise(0))
                .cast("long").alias("n_censored"))
           .crossJoin(F.broadcast(total)))
    w = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, -1)
    wf = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, 0)
    at_risk = (F.col("n_total")
               - F.coalesce(F.sum(F.col("n_events") + F.col("n_censored"))
                            .over(w), F.lit(0)))
    factor = (F.lit(1.0)
              - F.col("n_events").cast("double")
              / F.col("n_risk").cast("double"))
    return (tbl
            .withColumn("n_risk", at_risk)
            .withColumn("_f", factor)
            .withColumn("_fs", F.collect_list("_f").over(wf))
            .withColumn("survival", F.expr(
                "aggregate(_fs, CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)"))
            .select("dur_days", "n_risk", "n_events", "n_censored",
                    "survival"))


def ohlc_bars(events: DataFrame) -> DataFrame:
    """C16d: OHLC candle bars — resample each user's value series to
    daily open / high / low / close / volume bars, the financial-style
    downsampling every time-series store ships beside ffill (C16b) and
    interpolation (C16c). Open/close select by one ranked window per
    direction over the (ts, event_id) total order (the deterministic
    tie-break every ordered operator here uses — never an arg-min over
    a packed key, which can collide); high/low/volume are plain
    aggregates and the day's turnover uses the dsum fixed-point, so
    the whole bar is engine-exact. One keyed exchange: the windows and
    the final aggregate share the (user, day) partitioning."""
    wa = Window.partitionBy("user_id", "_day").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "_day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    base = (events
            .withColumn("_day", F.to_date("ts"))
            .withColumn("_ra", F.row_number().over(wa))
            .withColumn("_rd", F.row_number().over(wd)))
    return (base
            .groupBy("user_id", F.col("_day").alias("day"))
            .agg(F.max(F.when(F.col("_ra") == 1, F.col("value")))
                 .alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max(F.when(F.col("_rd") == 1, F.col("value")))
                 .alias("close"),
                 F.count(F.lit(1)).alias("volume"),
                 dsum("value").alias("turnover")))


def daily_xcorr(events: DataFrame, max_lag: int = 2) -> DataFrame:
    """C12g: lead-lag cross-correlation between event-type activity
    series — Pearson r of daily milli-unit totals for every ordered
    type pair at lags −max_lag..+max_lag, the lead-lag screen behind
    "does type A's volume anticipate type B's?". Data-scale work is one
    (type, day) aggregate; the lag join and the correlation run on the
    BOUNDED daily table (types × days). Engine-exact: the five
    sufficient statistics are exact BIGINT sums; r then derives through
    one fixed tree of double conversions, multiplies, two correctly-
    rounded sqrts and a division (same discipline as the z-score row).
    Zero-variance alignments are excluded (deterministically) rather
    than emitted as NaN."""
    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    d = (events
         .groupBy("event_type", F.to_date("ts").alias("day"))
         .agg(F.sum(m).alias("x")))
    lags = F.explode(F.array(*[F.lit(i) for i in
                               range(-max_lag, max_lag + 1)]))
    a = (d.select(F.col("event_type").alias("type_a"),
                  F.col("day").alias("day_a"),
                  F.col("x").alias("xa"))
         .withColumn("lag", lags)
         .withColumn("day_b", F.date_add("day_a", F.col("lag"))))
    b = d.select(F.col("event_type").alias("type_b"),
                 F.col("day").alias("day_b"),
                 F.col("x").alias("xb"))
    joined = a.join(b, ["day_b"]).filter(F.col("type_a") < F.col("type_b"))
    agg = (joined.groupBy("type_a", "type_b", "lag")
           .agg(F.count(F.lit(1)).alias("n_days"),
                F.sum("xa").alias("sx"), F.sum("xb").alias("sy"),
                F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
                F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
                F.sum(F.col("xb") * F.col("xb")).alias("syy")))
    nd = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    varx = nd * sxx - sx * sx
    vary = nd * syy - sy * sy
    r = (nd * sxy - sx * sy) / (F.sqrt(varx) * F.sqrt(vary))
    return (agg
            .withColumn("_vx", varx).withColumn("_vy", vary)
            .filter((F.col("_vx") > 0) & (F.col("_vy") > 0))
            .select("type_a", "type_b", "lag", "n_days", r.alias("r")))


def interval_concurrency(lineitem: DataFrame,
                         hold_days: int = 7) -> DataFrame:
    """C9f: interval-overlap concurrency — per supplier, the peak number
    of simultaneously in-flight shipments, where each lineitem occupies
    [l_shipdate, l_shipdate + hold_days). The sweep-line form of the
    resource-counting workload (concurrent sessions, open connections,
    warehouse slots): each interval contributes a +1 delta at its start
    day and a −1 delta at its end day, the per-day net deltas cumulate
    in event order, and the running sum IS the concurrency. The
    half-open end means a shipment ending on day X no longer counts on
    X. Peak day reported is the EARLIEST day attaining the peak.

    Scale posture: intervals never join intervals — the sweep is one
    explode (2 rows per shipment), one (supplier, day) aggregate, and
    one per-supplier ordered window over the bounded day axis; all
    integer arithmetic. Parallelism = supplier cardinality."""
    start = F.to_date("l_shipdate")
    deltas = (lineitem
              .select(F.col("l_suppkey").alias("suppkey"),
                      F.explode(F.array(
                          F.struct(start.alias("day"),
                                   F.lit(1).alias("d")),
                          F.struct(F.date_add(start, hold_days)
                                   .alias("day"),
                                   F.lit(-1).alias("d")))).alias("e"))
              .select("suppkey", "e.day", "e.d"))
    daily = (deltas.groupBy("suppkey", "day")
             .agg(F.sum("d").alias("net"),
                  F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
                  .alias("starts")))
    w = (Window.partitionBy("suppkey").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    wk = Window.partitionBy("suppkey")
    cur = (daily
           .withColumn("conc", F.sum("net").over(w))
           .withColumn("peak", F.max(F.sum("net").over(w)).over(wk)))
    return (cur.filter(F.col("conc") == F.col("peak"))
            .groupBy("suppkey")
            .agg(F.min("day").alias("peak_day"),
                 F.max("peak").alias("peak_concurrency"))
            .join(lineitem.groupBy(F.col("l_suppkey").alias("suppkey"))
                  .agg(F.count(F.lit(1)).alias("n_shipments")),
                  "suppkey")
            .select("suppkey", "n_shipments",
                    "peak_concurrency", "peak_day"))


def interval_coverage(lineitem: DataFrame, hold_days: int = 7) -> DataFrame:
    """C9g: interval-union coverage — per supplier, how many days are
    covered by AT LEAST one in-flight shipment interval
    [l_shipdate, l_shipdate + hold_days), the union-length twin of the
    C9f peak-concurrency sweep (uptime/SLA coverage, machine
    utilization, warehouse occupancy: overlapping intervals must count
    once). Reported beside the span (first start → last end) and the
    exact utilization ratio covered/span.

    Sweep-line, no interval⋈interval join: every interval contributes
    ±1 deltas, the running sum over the per-supplier ordered day axis
    is the concurrency, and a day-gap [day, next_day) adds to the
    covered total exactly when its concurrency is positive. All BIGINT
    day arithmetic; utilization is ONE division of exact integers
    (covered ≤ span ≤ ~2600 days — IEEE-identical everywhere).

    Scale: one explode (2 rows/shipment), one (supplier, day) agg, one
    keyed window pass; parallelism = supplier cardinality, the same
    posture as interval_concurrency above."""
    start = F.to_date("l_shipdate")
    deltas = (lineitem
              .select(F.col("l_suppkey").alias("suppkey"),
                      F.explode(F.array(
                          F.struct(start.alias("day"),
                                   F.lit(1).alias("d")),
                          F.struct(F.date_add(start, hold_days)
                                   .alias("day"),
                                   F.lit(-1).alias("d")))).alias("e"))
              .select("suppkey", "e.day", "e.d"))
    daily = (deltas.groupBy("suppkey", "day")
             .agg(F.sum("d").alias("net")))
    w = (Window.partitionBy("suppkey").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    wl = Window.partitionBy("suppkey").orderBy("day")
    seg = (daily
           .withColumn("conc", F.sum("net").over(w))
           .withColumn("next_day", F.lead("day").over(wl)))
    covered = F.sum(
        F.when(F.col("conc") > 0,
               F.datediff("next_day", "day")).otherwise(0)).cast("long")
    return (seg.groupBy("suppkey")
            .agg(covered.alias("covered_days"),
                 F.datediff(F.max("day"), F.min("day")).cast("long")
                 .alias("span_days"))
            .join(lineitem.groupBy(F.col("l_suppkey").alias("suppkey"))
                  .agg(F.count(F.lit(1)).alias("n_shipments")),
                  "suppkey")
            .select("suppkey", "n_shipments", "covered_days", "span_days",
                    (F.col("covered_days").cast("double")
                     / F.col("span_days").cast("double"))
                    .alias("utilization")))


def dow_seasonality(events: DataFrame) -> DataFrame:
    """C16e: day-of-week seasonality profile — each type's activity
    share per weekday relative to its own average day, the seasonal
    index behind staffing curves and anomaly baselines (an index of
    1.4 on Monday means Mondays run 40% hot). Weekday is computed as
    pure day arithmetic — days-since-1995-01-01 (a Sunday) mod 7 —
    identical in any engine, sidestepping the Sunday-0 vs Sunday-1
    convention split between date libraries.

    Engine-exact: daily totals are exact milli integers; the index
    (dow_sum · n_days) / (dow_days · total_sum) cross-multiplies in
    BIGINT and spends exactly one correctly-rounded double division.
    One (type, day) aggregate is the data-scale work; the dow rollup
    and per-type windows run on the bounded daily table."""
    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    daily = (events
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.sum(m).alias("t")))
    dow = (F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
           % 7).cast("int")
    per_dow = (daily.withColumn("dow", dow)
               .groupBy("event_type", "dow")
               .agg(F.sum("t").alias("dow_total_milli"),
                    F.count(F.lit(1)).alias("n_days")))
    wt = Window.partitionBy("event_type")
    idx = ((F.col("dow_total_milli") * F.col("all_days")).cast("double")
           / (F.col("n_days") * F.col("all_total")).cast("double"))
    return (per_dow
            .withColumn("all_total", F.sum("dow_total_milli").over(wt))
            .withColumn("all_days", F.sum("n_days").over(wt))
            .withColumn("seasonal_index", idx)
            .select("event_type", "dow", "n_days", "dow_total_milli",
                    "seasonal_index"))


def activity_gaps(events: DataFrame) -> DataFrame:
    """C16f: per-(user, type) calendar-gap audit — for each series, how
    many day-gaps its activity has, the longest silence, and the total
    missing days inside its observed span. The data-freshness /
    completeness profile a feeds-monitoring job runs before trusting a
    daily aggregate (a 6-day hole in a "daily" series is a pipeline
    incident, not a quiet week). Pure date arithmetic on the distinct
    observed-day table (one aggregate + one lead window per series);
    the span identity observed + missing = last − first + 1 holds by
    construction and the oracle re-derives both sides."""
    days = (events
            .select("user_id", "event_type",
                    F.to_date("ts").alias("day"))
            .distinct())
    w = Window.partitionBy("user_id", "event_type").orderBy("day")
    gap = F.datediff(F.lead("day").over(w), F.col("day")) - 1
    return (days
            .withColumn("_gap", gap)
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n_days_observed"),
                 F.sum(F.when(F.col("_gap") > 0, 1).otherwise(0))
                 .alias("n_gaps"),
                 F.coalesce(F.max(F.when(F.col("_gap") > 0,
                                         F.col("_gap"))),
                            F.lit(0)).cast("long").alias("max_gap_days"),
                 F.coalesce(F.sum(F.when(F.col("_gap") > 0,
                                         F.col("_gap"))),
                            F.lit(0)).cast("long")
                 .alias("total_missing_days"),
                 F.min("day").alias("first_day"),
                 F.max("day").alias("last_day")))


def dau_mau_stickiness(events: DataFrame, window_days: int = 30) -> DataFrame:
    """C34l: DAU / trailing-MAU stickiness — the engagement ratio every
    product dashboard leads with (what share of the monthly audience
    shows up on a given day). Exact distinct counting at scale without
    a distinct-over-sliding-frame (which no engine supports): each
    (user, day) activity fact is EXPLODED to the ≤`window_days` future
    report days it makes the user active for — a bounded 30× fan-out of
    the already-deduplicated (user, day) table, turning the sliding
    window into a plain equi-group distinct. Report days are limited to
    days with any activity. At extreme user cardinality the drop-in is
    the per-day HLL sketch + 30-day merge (the C4s rollup operator);
    this exact form is the oracle-checkable contract.

    stickiness = dau/mau is the single correctly-rounded division."""
    ud = (events.select("user_id", F.to_date("ts").alias("day"))
          .distinct())
    exploded = (ud.withColumn(
        "report_day",
        F.explode(F.sequence(
            F.col("day"),
            F.date_add(F.col("day"), window_days - 1))))
        .select("user_id", F.col("report_day").alias("day"),
                F.col("day").alias("active_day")))
    observed = ud.select("day").distinct()
    mau = (exploded.join(observed, "day", "left_semi")
           .groupBy("day")
           .agg(F.count_distinct("user_id").alias("mau")))
    dau = ud.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    return (dau.join(mau, "day")
            .select("day", "dau", "mau",
                    (F.col("dau").cast("double")
                     / F.col("mau").cast("double")).alias("stickiness")))


def growth_accounting(events: DataFrame) -> DataFrame:
    """C34m: weekly growth accounting — the new / retained / resurrected
    / dormant user decomposition every growth dashboard is built on
    (DAU's explanatory twin: WHY did the active count move). Weeks are
    epoch-days div 7 (engine-agnostic, no ISO-week convention split).
    Per (user, week): new = first observed week; retained = also active
    the immediately preceding week; resurrected = active, previously
    seen, but absent last week. Dormant is counted on the OTHER side:
    a user active in week w whose next observed week is not w+1 goes
    dormant in w+1 (capped at the corpus's last week, so the final
    boundary never fabricates churn).

    One distinct (user, week) aggregate is the data-scale work; the
    status lags are per-user windows on the weekly table. All counts
    exact integers; FULL oracle."""
    wk = F.floor(F.datediff(F.to_date("ts"),
                            F.lit("1995-01-01").cast("date")) / 7) \
        .cast("long")
    uw = (events.select("user_id", wk.alias("week")).distinct())
    w = Window.partitionBy("user_id").orderBy("week")
    wall = Window.partitionBy()
    flagged = (uw
               .withColumn("prev_week", F.lag("week").over(w))
               .withColumn("next_week", F.lead("week").over(w))
               .withColumn("max_week", F.max("week").over(wall)))
    status = (F.when(F.col("prev_week").isNull(), "new")
              .when(F.col("prev_week") == F.col("week") - 1, "retained")
              .otherwise("resurrected"))
    active = (flagged.groupBy("week")
              .agg(F.sum(F.when(status == "new", 1).otherwise(0))
                   .alias("n_new"),
                   F.sum(F.when(status == "retained", 1).otherwise(0))
                   .alias("n_retained"),
                   F.sum(F.when(status == "resurrected", 1).otherwise(0))
                   .alias("n_resurrected")))
    dormant = (flagged
               .filter((F.col("week") < F.col("max_week"))
                       & (F.col("next_week").isNull()
                          | (F.col("next_week") > F.col("week") + 1)))
               .groupBy((F.col("week") + 1).alias("week"))
               .agg(F.count(F.lit(1)).alias("n_dormant")))
    return (active.join(dormant, "week", "left")
            .select("week", "n_new", "n_retained", "n_resurrected",
                    F.coalesce("n_dormant", F.lit(0)).cast("long")
                    .alias("n_dormant")))


def top_paths(events: DataFrame, depth: int = 3,
              top_k: int = 5) -> DataFrame:
    """C34n: top event paths — the most frequent `depth`-step event-type
    sequences users actually walk (the Sankey/flow view), one step past
    the C34c single-hop transition matrix: a funnel tells you about one
    designed path, this surfaces the emergent ones. Paths come from
    `depth-1` lead windows over each user's event order (no self-join),
    count map-side, global top-k via TakeOrderedAndProject with a full
    path-string tie-break."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = [F.col("event_type")] + [
        F.lead("event_type", i).over(w) for i in range(1, depth)]
    paths = (events
             .select(F.concat_ws(">", *steps).alias("path"),
                     steps[-1].isNotNull().alias("complete"))
             .filter(F.col("complete")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_walks"))
            .orderBy(F.col("n_walks").desc(), F.col("path"))
            .limit(top_k))


def event_study(events: DataFrame, window_days: int = 7) -> DataFrame:
    """C34o: event-study lift — for each user, average daily activity
    value in the `window_days` BEFORE their first purchase vs the same
    window AFTER it (intervention analysis: did converting change
    behavior?), then the per-user lifts aggregated per cohort-week.
    The pre/post windows exclude the purchase day itself. Engine-exact:
    window sums are milli integers, each per-user mean and the final
    lift spend fixed IEEE divisions; users without a purchase or with
    an empty pre-window are excluded deterministically.

    One pass finds first purchases (conditional min — the funnel
    discipline), one broadcast-joinless keyed join tags each event with
    its owner's anchor, two conditional aggregates finish. Parallelism
    = user cardinality."""
    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    anchors = (events
               .groupBy("user_id")
               .agg(F.min(F.when(F.col("event_type") == "purchase",
                                 F.to_date("ts"))).alias("anchor_day"))
               .filter(F.col("anchor_day").isNotNull()))
    tagged = (events
              .select("user_id", F.to_date("ts").alias("day"),
                      m.alias("m"))
              .join(anchors, "user_id")
              .withColumn("offset",
                          F.datediff(F.col("day"), F.col("anchor_day"))))
    per_user = (tagged.groupBy("user_id", "anchor_day")
                .agg(F.sum(F.when((F.col("offset") >= -window_days)
                                  & (F.col("offset") <= -1),
                                  F.col("m")).otherwise(0))
                     .alias("pre_milli"),
                     F.sum(F.when((F.col("offset") >= 1)
                                  & (F.col("offset") <= window_days),
                                  F.col("m")).otherwise(0))
                     .alias("post_milli"),
                     F.sum(F.when((F.col("offset") >= -window_days)
                                  & (F.col("offset") <= -1),
                                  1).otherwise(0)).alias("n_pre"))
                .filter(F.col("pre_milli") > 0))
    wk = F.floor(F.datediff(F.col("anchor_day"),
                            F.lit("1995-01-01").cast("date")) / 7) \
        .cast("long")
    return (per_user.groupBy(wk.alias("anchor_week"))
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("pre_milli").alias("pre_milli"),
                 F.sum("post_milli").alias("post_milli"))
            .withColumn("lift",
                        F.col("post_milli").cast("double")
                        / F.col("pre_milli").cast("double")))


def lttb_downsample(events: DataFrame, k: int = 10) -> DataFrame:
    """C16g: Largest-Triangle-Three-Buckets downsampling (Steinarsson
    2013) — reduce each type's daily series to `k` visually-faithful
    points: first and last always kept, interior points bucketed
    evenly by rank, and each bucket contributes the point forming the
    largest triangle with the PREVIOUS selection and the NEXT bucket's
    average. The standard dashboard downsampler; unlike decimation it
    keeps spikes.

    Engine-exact with zero float ops: x is the integer epoch day, y
    the exact milli total, and the triangle comparison is the area
    CROSS-MULTIPLIED by the next bucket's size m — |(xa·m − sx)(yb −
    ya) − (xa − xb)(sy − m·ya)| — so the average never becomes a
    float. Ties break to the smaller x. The anchor chain makes this
    sequential per key (the Holt discipline): an Arrow applyInPandas
    kernel over the BOUNDED daily table, parallelism = key
    cardinality; the oracle unrolls the same k−2 selections as
    MATERIALIZED CTE steps."""
    import pandas as pd

    m = F.floor(F.col("value") * 1000.0 + 0.5).cast("long")
    daily = (events
             .groupBy("event_type",
                      F.datediff(F.to_date("ts"),
                                 F.lit("1995-01-01").cast("date"))
                      .alias("x"))
             .agg(F.sum(m).alias("y")))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x")
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        n = len(xs)
        if n <= k:
            sel = list(range(n))
        else:
            nb = k - 2
            buckets = [[] for _ in range(nb)]
            for j in range(1, n - 1):       # interior, 0-based
                buckets[(j - 1) * nb // (n - 2)].append(j)
            sel = [0]
            for b in range(nb):
                if b < nb - 1:
                    nxt = buckets[b + 1]
                    mm = len(nxt)
                    sx = sum(xs[j] for j in nxt)
                    sy = sum(ys[j] for j in nxt)
                else:
                    mm, sx, sy = 1, xs[n - 1], ys[n - 1]
                xa, ya = xs[sel[-1]], ys[sel[-1]]
                best, best_area = None, -1
                for j in buckets[b]:
                    area = abs((xa * mm - sx) * (ys[j] - ya)
                               - (xa - xs[j]) * (sy - mm * ya))
                    if area > best_area or (area == best_area
                                            and xs[j] < xs[best]):
                        best, best_area = j, area
                sel.append(best)
            sel.append(n - 1)
        return pd.DataFrame({
            "event_type": pdf["event_type"].iloc[:1].repeat(len(sel))
            .to_numpy(),
            "sel_order": range(1, len(sel) + 1),
            "x_day": [xs[j] for j in sel],
            "y_milli": [ys[j] for j in sel]})

    return (daily.groupBy("event_type")
            .applyInPandas(kernel,
                           "event_type string, sel_order int, "
                           "x_day int, y_milli long"))


def activity_streaks(events: DataFrame) -> DataFrame:
    """C34p: consecutive-day activity streaks per user — longest streak
    ever, the streak ending at the user's last active day, and whether
    that streak was still alive at the corpus's last day (the retention
    mechanic every engagement product surfaces, and the complement of
    C16f's gap audit: gaps measure the silences, streaks the runs).
    Pure gaps-and-islands date arithmetic: consecutive days share
    (day − row_number), one distinct-day aggregate + one window per
    user; all-integer."""
    days = (events.select("user_id", F.to_date("ts").alias("day"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("day")
    runs = (days
            .withColumn("grp", F.date_sub(
                "day", F.row_number().over(w)))
            .groupBy("user_id", "grp")
            .agg(F.count(F.lit(1)).alias("len"),
                 F.max("day").alias("run_end")))
    wall = Window.partitionBy()
    per_user = (runs
                .withColumn("corpus_end", F.max("run_end").over(wall))
                .groupBy("user_id", "corpus_end")
                .agg(F.sum("len").alias("n_active_days"),
                     F.max("len").alias("longest_streak"),
                     F.max_by("len", "run_end").alias("last_streak"),
                     F.max("run_end").alias("last_day")))
    return per_user.select(
        "user_id", "n_active_days", "longest_streak", "last_streak",
        (F.col("last_day") == F.col("corpus_end")).alias("alive_at_end"))


def vwap_daily(lineitem: DataFrame) -> DataFrame:
    """C16h: daily + cumulative volume-weighted average price per return
    flag — the canonical market bar derived from trades (here: line items
    priced at l_extendedprice with l_quantity as volume). Exact integer
    sufficient statistics: Σ(price_milli·qty) and Σqty in BIGINT, then a
    fixed two-division tree (spq/sq/1000) both engines round identically.

    Scale: one keyed aggregate to the (flag, day) grain — bounded by
    3 flags × calendar span — then running sums over that bounded frame,
    partitioned by flag."""
    pm = F.floor(F.col("l_extendedprice") * 1000.0 + 0.5).cast("long")
    qm = F.col("l_quantity").cast("long")
    day = (lineitem.groupBy(F.col("l_returnflag").alias("flag"),
                            F.to_date("l_shipdate").alias("day"))
           .agg(F.sum(pm * qm).alias("spq"), F.sum(qm).alias("sq")))
    w = (Window.partitionBy("flag").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    r = (day.withColumn("cpq", F.sum("spq").over(w))
         .withColumn("cq", F.sum("sq").over(w)))
    return r.select(
        "flag", "day", "spq", "sq",
        (F.col("spq").cast("double") / F.col("sq").cast("double")
         / F.lit(1000.0)).alias("vwap"),
        (F.col("cpq").cast("double") / F.col("cq").cast("double")
         / F.lit(1000.0)).alias("cum_vwap"))


def ingestion_order_audit(events: DataFrame) -> DataFrame:
    """C33r: out-of-order ingestion audit — per user, how often does the
    ingestion sequence (event_id, the append order) disagree with event
    time, and by how much? The per-source lateness profile every
    watermark choice starts from (a stream with max_backstep 40 minutes
    needs a ≥40-minute watermark delay or it drops data — see C25).

    One lag window partitioned by the high-cardinality user key; exact
    integer microsecond backsteps."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    d = (events.select("user_id", "event_id",
                       F.unix_micros("ts").alias("tus"))
         .withColumn("prev", F.lag("tus").over(w))
         .withColumn("back",
                     F.when(F.col("tus") < F.col("prev"),
                            F.col("prev") - F.col("tus"))
                     .otherwise(F.lit(0).cast("long"))))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("back") > 0, 1).otherwise(0)).cast("long")
        .alias("n_regressions"),
        F.max("back").alias("max_backstep_us"))


def interarrival_stats(events: DataFrame) -> DataFrame:
    """C34q: per-user inter-arrival statistics + burstiness — the arrival
    process profile (mean gap, max gap, coefficient of variation) that
    separates steady heartbeats (CV≈0) from bursty humans (CV>1); the
    capacity-planning twin of the c34_dwell duration profile.

    Exactness: gaps are integer microseconds; for the moment stats they
    quantize to whole seconds so Σgap² stays in BIGINT at any activity
    span, then the same fixed (s2 − s1²/n)/(n−1) → sqrt → divide tree as
    the c33 z-score family. One lag window on the user key."""
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    d = (events.select("user_id", F.unix_micros("ts").alias("t"),
                       "event_id")
         .withColumn("gap", F.col("t") - F.lag("t").over(w))
         .filter(F.col("gap").isNotNull()))
    g = d.withColumn("gs", F.expr("gap div 1000000"))
    n = F.count(F.lit(1)).cast("double")
    s1 = F.sum("gs").cast("double")
    s2 = F.sum(F.col("gs") * F.col("gs")).cast("double")
    agg = g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap").alias("max_gap_us"),
        s1.alias("_s1"), s2.alias("_s2"), n.alias("_n"))
    return interarrival_finalize(agg)


def interarrival_finalize(agg: DataFrame) -> DataFrame:
    """The moment→report projection shared by the batch operator and its
    streaming twin: both hand over EXACT integer sufficient statistics
    (cast to double), so computing mean/CV through this one JVM
    expression tree makes the two forms bit-identical."""
    mean = F.col("_s1") / F.col("_n")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n")) \
        / (F.col("_n") - F.lit(1.0))
    cv = F.when((F.col("_n") > 1) & (mean > 0) & (var > 0),
                F.round(F.sqrt(var) / mean, 6))
    return agg.select("user_id", "n_gaps", "max_gap_us",
                      F.round(mean, 6).alias("mean_gap_s"),
                      cv.alias("cv"))


def _weekdays_from_anchor(d: "F.Column") -> "F.Column":
    """Weekdays in [1970-01-05 (a Monday), d] inclusive, closed form —
    no calendar explode, no dow() function (engines disagree on Sunday's
    number; days-since-anchor arithmetic doesn't): with n = days since
    the Monday anchor, full weeks contribute 5 each and the partial week
    contributes min(n mod 7 + 1, 5)."""
    n = F.datediff(d, F.lit("1970-01-05").cast("date"))
    # n is nonnegative for any post-1970 date, so floor-div == div and
    # the double round-trip is exact far beyond any calendar range
    full_weeks = F.floor(n / F.lit(7.0)).cast("long")
    return (full_weeks * 5 + F.least(n % 7 + 1, F.lit(5))).cast("long")


def business_day_latency(orders: DataFrame,
                         lineitem: DataFrame) -> DataFrame:
    """C16i: order→ship latency in BUSINESS days, per order priority —
    the SLA metric ops teams actually publish (a Friday order shipped
    Monday is 1 business day late, not 3). The weekday count over
    (orderdate, shipdate] is a CLOSED FORM over days-since-Monday-anchor
    arithmetic — no per-day explode, so the fact-fact join stays the
    only data-sized operation and it is keyed on l_orderkey.

    Exact: integer day counts, one avg division per group."""
    j = (lineitem.select("l_orderkey",
                         F.to_date("l_shipdate").alias("ship"))
         .join(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                             F.to_date("o_orderdate").alias("odate"),
                             "o_orderpriority"),
               "l_orderkey"))
    bd = (_weekdays_from_anchor(F.col("ship"))
          - _weekdays_from_anchor(F.col("odate"))).alias("busdays")
    g = j.select("o_orderpriority", bd)
    return (g.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum("busdays").alias("sum_busdays"),
                 F.max("busdays").alias("max_busdays"))
            .withColumn("avg_busdays",
                        F.col("sum_busdays").cast("double")
                        / F.col("n_lines").cast("double")))


def l28_histogram(events: DataFrame) -> DataFrame:
    """C34s: L28 engagement histogram — users bucketed by active days
    in the 28 days ending at the corpus max day (1-7 / 8-14 / 15-21 /
    22-28), the power-user curve growth teams read weekly (a
    right-shifted histogram = habit formation; DAU/MAU compresses the
    same signal into one number — the C34l stickiness row).

    Exact integers throughout: the anchor day is a 1-row broadcast
    (allowlisted BNLJ), active days are an exact (user, day) distinct,
    buckets are integer div, and the share is one final division.
    Scale: the distinct and the per-user count shuffle on user_id;
    the histogram is a 4-row agg."""
    end = events.agg(F.max(F.to_date("ts")).alias("d_end"))
    ud = (events.crossJoin(F.broadcast(end))
          .filter(F.datediff(F.col("d_end"), F.to_date("ts")) < 28)
          .select("user_id", F.to_date("ts").alias("day"))
          .distinct())
    per_user = ud.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("active_days"))
    total = per_user.agg(F.count(F.lit(1)).alias("n_total"))
    return (per_user
            .withColumn("bucket",
                        F.expr("CAST((active_days - 1) div 7 AS INT)"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .crossJoin(F.broadcast(total))
            .select("bucket",
                    (F.col("bucket") * 7 + 1).cast("int").alias("days_lo"),
                    ((F.col("bucket") + 1) * 7).cast("int").alias("days_hi"),
                    "n_users",
                    (F.col("n_users").cast("double")
                     / F.col("n_total").cast("double")).alias("share")))


def hour_of_week_heatmap(events: DataFrame) -> DataFrame:
    """C34t: hour-of-week activity heatmap — the (day-of-week × hour)
    count matrix per event type with per-type shares, the seasonality
    fingerprint behind staffing, send-time optimization, and anomaly
    baselines (C33h's rolling z-score assumes it away; this row shows
    it). Day-of-week = days-since-1900-01-01 (a Monday) mod 7 —
    engine-split-proof; one map-side-combinable agg over the bounded
    ≤|types|·168-cell grid; per-type totals broadcast back for the one
    share division."""
    cells = (events.groupBy(
        "event_type",
        F.expr("CAST(datediff(CAST(ts AS DATE), DATE '1900-01-01') "
               "% 7 AS INT)").alias("dow"),
        F.hour("ts").cast("int").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n")))
    totals = cells.groupBy("event_type").agg(
        F.sum("n").alias("n_type"))
    return (cells.join(F.broadcast(totals), "event_type")
            .select("event_type", "dow", "hour", "n",
                    (F.col("n").cast("double")
                     / F.col("n_type").cast("double")).alias("share")))


def dwell_stats_bucketed(events: DataFrame,
                         bucket_us: int = 1_000_000) -> DataFrame:
    """C34j scale rewrite (the c33_anomaly2 discipline applied to the
    ledger's second-worst probe row, 3.70x): SAME output and oracle as
    dwell_stats, with both per-type single-task windows lifted:

    - the lag pass partitions by (event_type, day) with each (type,
      day)'s LAST event carried into the next day's partition (lag(1)
      needs exactly one carry row — cheaper than the z-score's
      window-1 carries), valid when every calendar day in a type's
      span has ≥1 event (gate below; sparser types fall back);
    - the median is two-level: a (type, gap-bucket) histogram (map-side
      combinable) locates the bucket holding the global median rank via
      a cumulative window over BUCKETS (≤ distinct buckets per type,
      not gaps), then only THAT bucket's rows are rank-selected. The
      selected VALUE at a global rank is tie-order-invariant, so the
      bucket-local pick equals the one-level pick exactly.

    Gate: count(distinct day) == span_days + 1 for EVERY type — a
    bounded |types|-row pull; any gap-day falls back to dwell_stats
    (a missing day would strand the carry one partition early and
    silently null a real gap).

    MEASURED, NOT REGISTERED (verdict r9 item 8 resolution for this
    row): round-10 A/B at sf0.001/0.01/0.1/10x — output identical
    everywhere; growth improves 3.74x → 2.19x but ABSOLUTE cost is
    1.4-2x worse through 10x (0.588→1.397 s at sf0.1, 2.201→3.065 s at
    10x): the extra stages (carry build, histogram, cumulative,
    in-bucket rank) cost more than the |types|-task windows save at
    any scale the probe reaches. The one-level dwell_stats stays the
    registered form; this variant is kept equality-tested
    (tests/test_round12.py) as the documented crossover path for a
    corpus whose per-type gap count actually saturates a task."""
    density = (events
               .groupBy("event_type")
               .agg((F.countDistinct(F.to_date("ts"))
                     == F.datediff(F.max(F.to_date("ts")),
                                   F.min(F.to_date("ts"))) + 1)
                    .alias("ok"))
               .agg(F.min("ok").alias("all_ok")))
    if not density.collect()[0][0]:  # bounded 1-row density gate
        return dwell_stats(events)

    base = events.select(
        "event_type", "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.to_date("ts").alias("_day"))
    wd = Window.partitionBy("event_type", "_day").orderBy(
        "ts_us", "event_id")
    last_per_day = (base
                    .withColumn("_rn", F.row_number().over(
                        Window.partitionBy("event_type", "_day")
                        .orderBy(F.col("ts_us").desc(),
                                 F.col("event_id").desc())))
                    .filter(F.col("_rn") == 1).drop("_rn")
                    .withColumn("_day", F.date_add("_day", 1))
                    .withColumn("_carry", F.lit(1)))
    u = (base.withColumn("_carry", F.lit(0))
         .unionByName(last_per_day))
    gaps = (u
            .withColumn("_prev", F.lag("ts_us").over(
                Window.partitionBy("event_type", "_day")
                .orderBy("ts_us", "event_id", "_carry")))
            .filter((F.col("_carry") == 0) & F.col("_prev").isNotNull())
            .select("event_type",
                    (F.col("ts_us") - F.col("_prev")).alias("gap_us")))
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (F.sum("gap_us").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("mean_gap_us"))
    # two-level exact median: histogram over gap buckets, cumulative
    # over the bounded bucket axis, rank-select inside one bucket
    b = (F.col("gap_us") / F.lit(bucket_us)).cast("long")
    hist = (gaps.withColumn("_b", b)
            .groupBy("event_type", "_b")
            .agg(F.count(F.lit(1)).alias("c")))
    wb = (Window.partitionBy("event_type").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = (hist
           .withColumn("cum", F.sum("c").over(wb))
           .join(F.broadcast(
               gaps.groupBy("event_type")
               .agg(((F.count(F.lit(1)) + 1) / 2).cast("long")
                    .alias("r"))), "event_type")
           .filter(F.col("cum") >= F.col("r"))
           .groupBy("event_type")
           .agg(F.min_by(F.struct("_b", "cum", "c"), "_b").alias("t"))
           .select("event_type", F.col("t._b").alias("_b"),
                   (F.col("t.cum") - F.col("t.c")).alias("cum_prev")))
    target = cum.join(F.broadcast(
        gaps.groupBy("event_type")
        .agg(((F.count(F.lit(1)) + 1) / 2).cast("long").alias("r"))),
        "event_type")
    in_bucket = (gaps.withColumn("_b", b)
                 .join(F.broadcast(target), ["event_type", "_b"]))
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    med = (in_bucket
           .withColumn("_rn", F.row_number().over(wr))
           .filter(F.col("_rn") == F.col("r") - F.col("cum_prev"))
           .select("event_type", F.col("gap_us").alias("median_gap_us")))
    return agg.join(med, "event_type")


def bursts_from_daily(daily: DataFrame, window_days: int = 7,
                      ratio_milli: int = 1100) -> DataFrame:
    """C34 addendum (round 13), shared core: burst census over a
    per-(event_type, day) count table — a day is a burst when its count
    exceeds `ratio_milli`/1000 × the trailing `window_days`-day mean
    (Kleinberg-style rate bursts reduced to the exact-integer gate
    cnt·window·1000 > ratio_milli·trail_sum; a day is eligible only
    when all `window_days` trailing calendar days are OBSERVED in the
    input — any missing trailing day makes the row ineligible rather
    than counting as zero, so a day after a gap never gets compared
    against a short or zero-padded mean).

    Input contract: `daily` has (event_type, day DATE, cnt BIGINT), one
    row per observed (type, day). Both the batch operator and the
    streaming twin reduce to this table, so one oracle covers both.

    Shape: one keyed RANGE window over the bounded day index + a
    ≤|types|-row rollup — all integer arithmetic, the max ratio is an
    exact integer division."""
    idx = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (Window.partitionBy("event_type").orderBy(idx)
         .rangeBetween(-window_days, -1))
    scored = (daily
              .withColumn("trail_sum", F.sum("cnt").over(w))
              .withColumn("trail_days", F.count(F.lit(1)).over(w)))
    eligible = F.col("trail_days") == window_days
    # observed daily rows always carry cnt >= 1, so an eligible row's
    # trail_sum is >= window_days — but the shared core is also fed by
    # the streaming twin and future callers, so guard the division
    # instead of trusting the contract (the hits() posture: a 0-count
    # day must never become an ANSI divide-by-zero)
    ratio = F.when(F.col("trail_sum") > 0,
                   F.expr(f"cnt * {window_days} * 1000 div trail_sum"))
    burst = eligible & (F.col("cnt") * window_days * 1000
                        > ratio_milli * F.col("trail_sum"))
    return (scored
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.sum(F.when(eligible, 1).otherwise(0)).cast("long")
                 .alias("n_eligible_days"),
                 F.sum(F.when(burst, 1).otherwise(0)).cast("long")
                 .alias("n_burst_days"),
                 F.max(F.when(eligible, ratio)).alias("max_ratio_milli"),
                 F.min(F.when(burst, F.col("day"))).alias("first_burst_day"),
                 F.max(F.when(burst, F.col("day"))).alias("last_burst_day")))


def burst_detect(events: DataFrame, window_days: int = 7,
                 ratio_milli: int = 1100) -> DataFrame:
    """C34 addendum (round 13): activity-burst detection over the event
    log — the rate-anomaly gauge an ops pipeline reads next to C33's
    value anomalies (a traffic spike is a COUNT burst even when every
    value is normal). One map-side-combinable daily rollup feeds the
    shared census (bursts_from_daily)."""
    daily = (events
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    return bursts_from_daily(daily, window_days, ratio_milli)


def sla_report(events: DataFrame, threshold_s: int = 3600) -> DataFrame:
    """C16 addendum (round 13): gap-derived availability (SLA) report —
    per event type, treat inter-event silences beyond `threshold_s` as
    downtime and report the exact downtime mass plus availability in
    ppm of the observed span. The uptime ledger every ingestion
    pipeline publishes ("was the feed alive?"), computed from the log
    itself rather than a heartbeat table.

    Exact end-to-end: timestamps ride unix MICROSECONDS (BIGINT in both
    engines — Spark unix_micros ↔ DuckDB epoch_us), so gaps, downtime,
    and the single ppm integer division hash-match bitwise.

    Scale shape — the DAY-BUCKETED gap decomposition (the c33_anomaly2
    discipline, but gateless because it is EXACTLY equivalent on any
    input): every consecutive-event gap is either intra-day (a lag
    window partitioned by (type, day) — parallelism |types|·|days|
    instead of the 5-value-key window ceiling the one-level form probed
    at 3.51× growth) or cross-day (first-of-day minus last-of-PREVIOUS-
    OBSERVED-day over the bounded (type, day) rollup — missing calendar
    days fold into one long gap exactly as the flat window sees them).
    Two map-side-combinable aggregates + one broadcast join of the
    bounded per-type day stats; no window ever spans more than one
    (type, day)."""
    thr_us = threshold_s * 1_000_000
    us = F.unix_micros(F.col("ts"))
    base = events.select("event_type", us.alias("us"), "event_id",
                         F.to_date("ts").alias("day"))
    w_day = Window.partitionBy("event_type", "day").orderBy("us",
                                                            "event_id")
    intra = (base
             .withColumn("gap_us", F.col("us") - F.lag("us").over(w_day))
             .filter(F.col("gap_us").isNotNull())
             .select("event_type", "gap_us"))
    days = (base.groupBy("event_type", "day")
            .agg(F.min("us").alias("first_us"),
                 F.max("us").alias("last_us"),
                 F.count(F.lit(1)).alias("n")))
    w_days = Window.partitionBy("event_type").orderBy("day")
    cross = (days
             .withColumn("gap_us", F.col("first_us")
                         - F.lag("last_us").over(w_days))
             .filter(F.col("gap_us").isNotNull())
             .select("event_type", "gap_us"))
    over = F.col("gap_us") > thr_us
    gap_stats = (intra.unionAll(cross)
                 .groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n_gaps"),
                      F.sum(F.when(over, 1).otherwise(0)).cast("long")
                      .alias("n_gaps_over"),
                      F.max("gap_us").alias("max_gap_us"),
                      F.sum(F.when(over, F.col("gap_us") - thr_us)
                            .otherwise(0)).cast("long")
                      .alias("downtime_us")))
    type_stats = (days.groupBy("event_type")
                  .agg(F.sum("n").alias("n_events"),
                       (F.max("last_us") - F.min("first_us"))
                       .alias("span_us")))
    j = (type_stats.join(F.broadcast(gap_stats), "event_type", "left")
         .select("event_type", "n_events",
                 F.coalesce("n_gaps", F.lit(0)).alias("n_gaps"),
                 F.coalesce("n_gaps_over", F.lit(0).cast("long"))
                 .alias("n_gaps_over"),
                 "max_gap_us",
                 F.coalesce("downtime_us", F.lit(0).cast("long"))
                 .alias("downtime_us"),
                 "span_us"))
    return j.select(
        "event_type", "n_events", "n_gaps", "n_gaps_over", "max_gap_us",
        "downtime_us", "span_us",
        # a single-event feed has no span: NULL availability,
        # never an ANSI divide-by-zero (the hits() posture)
        F.when(F.col("span_us") > 0,
               F.expr("(span_us - downtime_us) * 1000000 div span_us"))
        .alias("availability_ppm"))


def absence_histogram(events: DataFrame) -> DataFrame:
    """C34 addendum (round 13, second slate): churn-risk absence
    histogram — users bucketed by days since their LAST event relative
    to the corpus anchor (active ≤3d, cooling 4-7d, at_risk 8-14d,
    churned 15+d), the re-engagement segmentation read beside C34s's
    L28 intensity curve (L28 asks "how often while here"; this asks
    "are they still here"). Anchor = corpus max day (a bounded 1-row
    broadcast, the l28 discipline — replay-only knowledge).

    Exact: one per-user max agg (map-side combinable), integer day
    arithmetic, one ≤4-row bucket rollup, shares by exact ppm
    division."""
    anchor = events.agg(F.max(F.to_date("ts")).alias("d_end"))
    per_user = (events.groupBy("user_id")
                .agg(F.max(F.to_date("ts")).alias("last_day")))
    absent = F.datediff(F.col("d_end"), F.col("last_day"))
    return absence_buckets(per_user.crossJoin(F.broadcast(anchor))
                           .select(absent.alias("absent_days")))


def absence_buckets(absent: DataFrame) -> DataFrame:
    """Shared C34w rollup: a DataFrame with one `absent_days` column per
    user → the bucketed histogram with exact ppm shares. Both the batch
    operator and the streaming twin reduce to this table, so one oracle
    covers both (the bursts_from_daily pattern)."""
    bucketed = absent.select(
        "absent_days",
        F.when(F.col("absent_days") <= 3, "active")
        .when(F.col("absent_days") <= 7, "cooling")
        .when(F.col("absent_days") <= 14, "at_risk")
        .otherwise("churned").alias("bucket"))
    hist = (bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.min("absent_days").alias("min_absent_days"),
                 F.max("absent_days").alias("max_absent_days")))
    total = hist.agg(F.sum("n_users").alias("n_total"))
    return (hist.crossJoin(F.broadcast(total))
            .select("bucket", "n_users",
                    F.col("min_absent_days").cast("int")
                    .alias("min_absent_days"),
                    F.col("max_absent_days").cast("int")
                    .alias("max_absent_days"),
                    F.expr("n_users * 1000000 div n_total")
                    .alias("share_ppm")))


def peak_concurrency(events: DataFrame) -> DataFrame:
    """C34x (round 14): peak concurrency per event type — the classic
    sweep line over intervals (max concurrent sessions, in-flight
    requests, live streams: the capacity number an ops pipeline reads
    before sizing anything). Each event opens a half-open interval
    [ts, ts + dur) whose duration derives deterministically from the
    payload (dur_s = half-up value·100 — centiseconds-as-seconds, the
    exact-integer discipline); every interval contributes a +1 boundary
    at its start and a −1 at its end, and the peak is the max of the
    keyed running sum over boundaries ordered by
    (time, delta, event_id) — delta ascending puts closing −1s before
    opening +1s at the same instant, so touching intervals never
    double-count (half-open semantics).

    Emits per type: interval count, the peak, the instant it is first
    attained (epoch micros), and total busy-seconds. All integers.

    Scale: the boundary table is 2 rows per event and the running sum
    is TWO-LEVEL (the c33_anomaly2/c16_sla day-bucket discipline): a
    local cumsum partitioned by (event_type, calendar day of the
    boundary) plus a carry — the prefix sum of per-day net deltas over
    the bounded |types|·|days| day table, broadcast back — so the
    sort parallelism is |types|·|days| instead of |types| (the one-
    level form probed 4.3× at 10× on this corpus's 5 types; prefix
    sums distribute over the day split, so the rewrite is exact, not
    approximate). A zero-length interval's −1 precedes its own +1
    (transient dip, a peak can never sit there), which is the correct
    half-open reading of an empty interval."""
    start_us = F.unix_micros(F.col("ts"))
    dur_s = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    bounds = (events
              .select("event_type", "event_id",
                      start_us.alias("t"), F.lit(1).alias("delta"),
                      dur_s.alias("dur_s"))
              .unionByName(
                  events.select("event_type", "event_id",
                                (start_us + dur_s * 1_000_000).alias("t"),
                                F.lit(-1).alias("delta"),
                                F.lit(0).cast("long").alias("dur_s")))
              .withColumn("_day", F.expr("t div 86400000000")))
    w_local = (Window.partitionBy("event_type", "_day")
               .orderBy("t", "delta", "event_id")
               .rowsBetween(Window.unboundedPreceding, 0))
    local = bounds.withColumn("lcum", F.sum("delta").over(w_local))
    w_days = (Window.partitionBy("event_type").orderBy("_day")
              .rowsBetween(Window.unboundedPreceding, -1))
    carry = (bounds.groupBy("event_type", "_day")
             .agg(F.sum("delta").alias("net"))
             .withColumn("carry",
                         F.coalesce(F.sum("net").over(w_days), F.lit(0)))
             .select("event_type", "_day", "carry"))
    swept = (local.join(F.broadcast(carry), ["event_type", "_day"])
             .withColumn("cur", F.col("carry") + F.col("lcum")))
    return (swept.groupBy("event_type")
            .agg(F.expr("CAST(count(*) div 2 AS BIGINT)")
                 .alias("n_intervals"),
                 F.max("cur").alias("peak"),
                 F.min_by(F.col("t"), F.struct(
                     (F.lit(0) - F.col("cur")).alias("negc"), F.col("t"),
                     F.col("delta"), F.col("event_id")))
                 .alias("first_peak_us"),
                 F.sum("dur_s").alias("busy_seconds")))


def decayed_topk(events: DataFrame, k: int = 10,
                 half_life_days: int = 7) -> DataFrame:
    """C13 addendum (round 14): top-k users by exponentially decayed
    activity — the trending/leaderboard shape where yesterday's event
    outweighs last month's (recommendation recency, trending hashtags,
    hot-partition detection). Decay is DYADIC by whole half-lives:
    an event `a` days before the corpus anchor weighs
    1e6 >> (a div half_life_days) micro-units — exact integer halving
    both engines compute bit-identically (no pow(), no libm), the
    honest way to pin a decayed score to a full oracle. Ranking breaks
    ties by user_id, so the emitted top-k is deterministic under any
    partitioning.

    Scale: one map-side-combinable (user, day) count, the bounded
    weight map applied in column algebra, a per-user sum, and a global
    top-k that Spark executes as TakeOrdered (per-partition heads + a
    k-row driver merge) — no global sort materializes."""
    daily = (events
             .groupBy("user_id", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    return decayed_topk_from_daily(daily, k, half_life_days)


def decayed_topk_from_daily(daily: DataFrame, k: int = 10,
                            half_life_days: int = 7) -> DataFrame:
    """C13 addendum (round 14), shared core: the decayed-top-k scoring
    over a per-(user_id, day DATE, cnt BIGINT) count table — the weight
    depends only on the day, so the daily counts are the exact
    sufficient statistic and both the batch operator and the streaming
    twin reduce to this table (the bursts_from_daily pattern: one
    oracle covers both). Anchor = the max observed day."""
    anchor = daily.agg(F.max("day").alias("anchor_day"))
    scored = (daily
              .crossJoin(F.broadcast(anchor))
              .select("user_id", "cnt",
                      F.datediff(F.col("anchor_day"), F.col("day"))
                      .alias("age_days"))
              .select("user_id", "cnt",
                      F.expr(f"cnt * (1000000 div shiftleft(1L, "
                             f"least(age_days div {half_life_days}, 62)))")
                      .alias("w")))
    per_user = (scored.groupBy("user_id")
                .agg(F.sum("w").alias("score_micro"),
                     F.sum("cnt").alias("n_events")))
    topk = (per_user
            .orderBy(F.col("score_micro").desc(), F.col("user_id"))
            .limit(k))
    wr = Window.orderBy(F.col("score_micro").desc(), F.col("user_id"))
    return topk.withColumn("rank", F.row_number().over(wr).cast("int"))
