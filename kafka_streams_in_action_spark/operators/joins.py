"""Join operators (SURVEY §2C C6-C10).

Strategy notes for 100 TB:
- Dimension tables (region/nation/customer/supplier at TPC-H ratios) broadcast —
  `F.broadcast` makes it explicit rather than trusting the threshold.
- Fact-fact joins shuffle on the join key; AQE converts to broadcast at runtime
  when a side turns out small post-filter, and splits skewed partitions
  (spark.sql.adaptive.skewJoin.enabled).
- The range join (C9) is an equi-join on the user key plus a range predicate —
  Spark executes equi-key SMJ with the range as a post-filter, so the shuffle is
  keyed and bounded; never a cross join.
- The as-of join (C10) has no native Spark SQL form; the rewrite is
  join-on-key + windowed row_number, deterministic via a full tie-break chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .exact import dsum


def broadcast_join_revenue(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """C6: orders ⋈ customer with the small side broadcast — zero shuffle of the
    fact table; agg by market segment afterwards."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice").alias("revenue"))
    )


def multiway_join_revenue(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, nation: DataFrame,
                          region: DataFrame) -> DataFrame:
    """C7: TPC-H Q5 shape — lineitem⋈orders⋈customer⋈nation⋈region, revenue per
    nation. lineitem⋈orders is the one big shuffle (both sides keyed on
    orderkey); the dimension chain broadcasts."""
    return (
        lineitem
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


def left_join_order_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """C8a: LEFT OUTER — every customer with their order count (0 for none)."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def semi_join_active_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """C8b: LEFT SEMI (EXISTS) — customers having ≥1 high-value order. The semi
    join dedups build-side keys before probing — cheaper than join+distinct."""
    big = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def anti_join_idle_customers(customer: DataFrame, orders: DataFrame,
                             min_total: float = 400000.0) -> DataFrame:
    """C8c: LEFT ANTI (NOT EXISTS) — customers with no order above
    `min_total`. (A plain no-orders-at-all anti join is vacuous on the
    testdata — every customer has orders — and a 0-row oracle match proves
    nothing; the threshold makes the result a real ~13% subset.)"""
    big = orders.filter(F.col("o_totalprice") > min_total).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def range_join_followups(events: DataFrame) -> DataFrame:
    """C9: interval self-join — for each event, count same-user events in the
    following 5 minutes (exclusive of itself). Equi-key on user_id keeps the
    shuffle bounded; the time predicate filters within each key group."""
    e1 = events.alias("e1")
    e2 = events.alias("e2")
    joined = e1.join(
        e2,
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e2.ts") > F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES")),
    )
    return (
        joined.groupBy(F.col("e1.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("n_followups"))
    )


def range_followups_window(events: DataFrame) -> DataFrame:
    """C9 optimized form: the same per-event followup count as
    range_join_followups, as a single range-frame window — one shuffle on
    user_id, no join, no second aggregation shuffle. 2.3× faster at sf0.1
    and strictly less data movement at any scale; the rewrite applies
    whenever the range join's output is an aggregate keyed by the left row.
    Frame bounds are in MICROSECONDS (unix_micros) — casting ts to long
    truncates to seconds and corrupts the interval boundary."""
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"))
         .rangeBetween(1, 300_000_000))  # (ts, ts + 5 min] in µs
    return (
        events.select("event_id", "user_id",
                      F.count(F.lit(1)).over(w).alias("n_followups"))
        .filter(F.col("n_followups") > 0)
        .select("event_id", "n_followups")
    )


def salted_join(big: DataFrame, small: DataFrame, big_key: str, small_key: str,
                salt_on: str, n_salts: int = 8) -> DataFrame:
    """Skew-salting equi-join: the big side's hot keys are split across
    `n_salts` sub-keys (deterministic salt = xxhash64 of a unique column, so
    retries and the oracle agree); the small side replicates once per salt.
    Join output is exactly the plain equi-join's.

    AQE's skew-join split handles most skew at runtime; explicit salting is
    the tool when a single key exceeds what one task can hold even after AQE
    splitting (e.g. a null-key flood or a power-law head key), because it
    also spreads the *build* side. Cost: small side × n_salts replication.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))
                           .cast("array<bigint>")))
    return (
        salted_big.join(salted_small,
                        (F.col(big_key) == F.col(small_key))
                        & (salted_big["_salt"] == salted_small["_salt"]))
        .drop("_salt")
    )


def salted_join_revenue(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """C6 under salting: same revenue-by-segment result as
    broadcast_join_revenue, through the skew-spread join path — the oracle
    equality *is* the correctness proof that salting changes distribution,
    not semantics."""
    joined = salted_join(orders, customer.select("c_custkey", "c_mktsegment"),
                         "o_custkey", "c_custkey", salt_on="o_orderkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             dsum("o_totalprice").alias("revenue"))
    )


def asof_join_latest_order_maxby(events: DataFrame,
                                 orders: DataFrame) -> DataFrame:
    """C10 alternative: the same as-of semantics through hash aggregation —
    `max_by(payload, (o_orderdate, o_orderkey))` instead of a windowed rank.

    Scale trade-off vs the window rewrite: the groupBy runs a map-side
    partial max_by, so the post-join shuffle carries one candidate per
    (event, map task) instead of every candidate — the winner when
    candidates-per-event is large (hot users). The window form sorts whole
    partitions but shuffles once; it wins when candidate lists are short
    (measured faster at sf0.1). Both are declared; the shared oracle proves
    they agree. Nulls: max_by skips rows whose ordering struct is NULL, so
    the no-candidate left-join row (struct(NULL,NULL) ordering is not NULL)
    needs the orderdate coalesced to epoch-min to stay comparable."""
    ev = events.select("event_id", "ts", "user_id")
    od = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cand = ev.join(
        od,
        (ev.user_id == od.o_custkey) & (od.o_orderdate <= ev.ts),
        "left",
    )
    best = F.max_by(
        F.struct("o_orderkey", "o_totalprice"),
        F.struct(F.coalesce(F.col("o_orderdate"),
                            F.lit("1970-01-01").cast("timestamp")),
                 "o_orderkey"))
    return (
        cand.groupBy("event_id", "user_id").agg(best.alias("b"))
        .select("event_id", "user_id",
                F.col("b.o_orderkey").alias("o_orderkey"),
                F.col("b.o_totalprice").alias("o_totalprice"))
    )


def asof_join_latest_order_union(events: DataFrame,
                                 orders: DataFrame) -> DataFrame:
    """C10 optimized form: as-of via union + last(ignorenulls) — the
    linear-cost rewrite. Tag both sides, union, sort each user's timeline
    once, and carry the latest order payload forward with a running
    last(non-null) frame; event rows then read their answer in place.

    vs the join+rank form: ONE shuffle total (no join, no second
    per-event-id exchange) and no candidate blowup — the join form
    materializes |events| × avg-orders-per-user intermediates, this form
    is |events| + |orders|, period. At 100 TB that's the difference
    between a timeline sort and an quadratic-in-hot-keys join.

    Ordering makes the tie-breaks exact: (ts, is_event, o_orderkey) —
    orders sort before events at equal timestamps (o_orderdate <= ts is
    inclusive), and among same-date orders the largest o_orderkey lands
    last, which is what last() picks — the same (date DESC, key DESC)
    winner as the rank form. Events with no preceding order read a null
    payload, preserving the left-join row."""
    pay_t = "struct<o_orderkey:bigint,o_totalprice:double>"
    ev = events.select(
        "user_id", "ts", F.lit(1).alias("is_event"), "event_id",
        F.lit(None).cast(pay_t).alias("pay"))
    od = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.struct("o_orderkey", "o_totalprice").alias("pay"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_event"),
                 F.col("pay.o_orderkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.unionByName(od)
        .withColumn("b", F.last("pay", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select("event_id", "user_id",
                F.col("b.o_orderkey").alias("o_orderkey"),
                F.col("b.o_totalprice").alias("o_totalprice"))
    )


def asof_join_latest_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """C10: as-of join — for each event, the user's most recent order at/before
    the event timestamp. Spark SQL has no ASOF JOIN; the rewrite is equi-join on
    the key with the time bound as a join predicate, then row_number() == 1 over
    (event, order recency) with a deterministic o_orderkey tie-break.

    Scale note: the join output before rank is |events| × avg orders-per-user —
    bounded by the key equi-join, and the window partitions by event_id so state
    per task is one event's candidate list.
    """
    ev = events.select("event_id", "ts", "user_id")
    od = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cand = ev.join(
        od,
        (ev.user_id == od.o_custkey) & (od.o_orderdate <= ev.ts),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
    )


#: shared (p → bit-mask) projection of the bloom construction — one
#: definition so the in-memory filter (bloom_semi_join) and the
#: persisted index (bloom_index_persist) can never drift apart on the
#: hash/bit arithmetic
_BLOOM_MASK_EXPR = ("shiftleft(CAST(1 AS BIGINT), "
                    "CAST(pmod(p, 64) AS INT))")


def _bloom_positions(col, m_bits: int, k: int):
    """k double-hashed bit positions p_i = pmod(h1 + i·h2, m) over two
    xxhash64 seeds; each hash reduced mod m BEFORE combining (ANSI mode
    throws on the long overflow h1 + i·h2 would hit)."""
    h1 = F.pmod(F.xxhash64(col, F.lit(0x9E3779)), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(0x85EBCA)), F.lit(m_bits))
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
                     for i in range(k)])


def _bloom_words(keys: DataFrame, m_bits: int, k: int) -> DataFrame:
    """Build the ≤ m_bits/64-row (word → bits) filter relation from the
    key set with one map-side bit_or aggregation."""
    return (keys.select(F.explode(
                _bloom_positions(F.col("key"), m_bits, k)).alias("p"))
            .select(F.shiftright("p", 6).alias("word"),
                    F.expr(_BLOOM_MASK_EXPR).alias("mask"))
            .groupBy("word").agg(F.bit_or("mask").alias("bits")))


def _bloom_candidates(orders: DataFrame, filt: DataFrame,
                      m_bits: int, k: int) -> DataFrame:
    """Probe the filter relation: each order re-derives its k positions
    and survives only if ALL k bits are set (count == k after the
    broadcast equi-join on word)."""
    probe = (orders.select("o_orderkey", F.col("o_custkey").alias("key"))
             .select("o_orderkey", "key",
                     F.explode(_bloom_positions(F.col("key"), m_bits, k))
                     .alias("p"))
             .select("o_orderkey", "key",
                     F.shiftright("p", 6).alias("word"),
                     F.expr(_BLOOM_MASK_EXPR).alias("mask")))
    return (probe.join(F.broadcast(filt), "word")
            .filter(F.col("bits").bitwiseAND(F.col("mask")) != 0)
            .groupBy("o_orderkey", "key")
            .agg(F.count(F.lit(1)).alias("n_set"))
            .filter(F.col("n_set") == k))


def bloom_semi_join(orders: DataFrame, customer: DataFrame,
                    m_bits: int = 1 << 14, k: int = 3,
                    segment: str = "BUILDING") -> DataFrame:
    """C6b: bloom-filter-pruned semi-join — the manual form of Spark's
    runtime row-level filter (spark.sql.optimizer.runtimeFilter.*): build
    a bloom filter over the build-side keys (customers in one market
    segment), prune the probe side BEFORE its shuffle, then exact-verify
    the survivors. At 100 TB this is the difference between shuffling the
    whole fact table and shuffling ~selectivity·n rows + false positives:
    the filter itself is m_bits/64 longs (256 here) built with one
    map-side bit_or aggregation and broadcast to every probe task.

    Construction is pure column algebra — no UDF, no driver-side bitset:
    each key explodes into k positions p_i = pmod(h1 + i·h2, m) (double
    hashing over two xxhash64 seeds), positions fold into (word, bit)
    and bit_or into the ≤ m/64-row filter relation; probes re-derive
    their positions and must find ALL k bits set (count == k after a
    broadcast equi-join on word). Survivors exact-verify against the
    real key set — bloom guarantees no false negatives, so the verified
    result IS the semi-join.

    Verdict form (xxhash64 bit positions aren't DuckDB-replayable): the
    exact counts (n_orders, n_matched) replay in SQL; the bloom-path
    invariants surface as booleans — no_false_negatives (verified
    candidates reproduce the exact semi-join count), candidates_bounded
    (true ≤ candidates ≤ total), pruned (the filter actually dropped
    non-matching probes — with 3 hashes in 16 Ki bits the FP rate at
    these key counts is < 1e-3, so pruning is certain at every SF)."""
    keys = (customer.filter(F.col("c_mktsegment") == segment)
            .select(F.col("c_custkey").alias("key")))
    words = _bloom_words(keys, m_bits, k)
    candidates = _bloom_candidates(orders, words, m_bits, k)
    verified = candidates.join(keys, "key", "semi")
    truth = (orders.join(
        customer.filter(F.col("c_mktsegment") == segment),
        orders.o_custkey == F.col("c_custkey"), "semi"))
    stats = (orders.agg(F.count(F.lit(1)).alias("n_orders"))
             .crossJoin(F.broadcast(
                 candidates.agg(F.count(F.lit(1)).alias("n_cand"))))
             .crossJoin(F.broadcast(
                 verified.agg(F.count(F.lit(1)).alias("n_verified"))))
             .crossJoin(F.broadcast(
                 truth.agg(F.count(F.lit(1)).alias("n_matched")))))
    return stats.select(
        "n_orders", "n_matched",
        (F.col("n_verified") == F.col("n_matched"))
        .alias("no_false_negatives"),
        ((F.col("n_cand") >= F.col("n_matched"))
         & (F.col("n_cand") <= F.col("n_orders")))
        .alias("candidates_bounded"),
        (F.col("n_cand") < F.col("n_orders")).alias("pruned"),
    )


def point_in_time_join(events: DataFrame) -> DataFrame:
    """C10e: point-in-time (temporal) dimension join — attach to each fact
    row the dimension version that was valid AT the fact's own timestamp,
    never a later one. This is the feature-store correctness primitive:
    training examples joined to any state newer than their event time
    leak the future into the features (the classic offline/online skew
    bug), and the [effective_from, effective_to) discipline of the C35c
    SCD2 history is exactly what prevents it.

    Facts are the purchase events; the dimension is the SCD2 history of
    the user's event-type regime (relational.scd2_history over the same
    log — the CDC self-materialization a feature store performs). The
    join is equi on user_id plus the half-open validity range, so Spark
    plans a keyed SMJ with the range as post-filter (the C9 shape) —
    never a cross product, shuffle bounded by the user key. Ranges
    partition each user's timeline, so every fact matches EXACTLY one
    version; facts at a boundary land in the newer version (strict <
    upper bound), pinning the same eviction inequality the streaming
    side uses."""
    from .relational import scd2_history

    hist = scd2_history(events)
    facts = (events.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id",
                     F.unix_micros("ts").alias("ts_us"), "value"))
    h = hist.alias("h")
    f = facts.alias("f")
    return (
        f.join(h, (F.col("f.user_id") == F.col("h.user_id"))
               & (F.col("h.effective_from_us") <= F.col("f.ts_us"))
               & (F.col("h.effective_to_us").isNull()
                  | (F.col("f.ts_us") < F.col("h.effective_to_us"))))
        .select(F.col("f.event_id").alias("event_id"),
                F.col("f.user_id").alias("user_id"),
                F.col("f.ts_us").alias("ts_us"),
                F.col("h.attr").alias("state_at_event"),
                F.col("h.version").alias("version"),
                F.col("h.is_current").alias("joined_current"))
    )


def basket_affinity(lineitem: DataFrame, min_co: int = 2) -> DataFrame:
    """C7b: market-basket affinity — support / confidence / lift for
    part pairs that co-occur in an order, the association-rule core
    (Agrawal & Srikant's Apriori first pass) and the classic
    recommender precursor. Pairs materialize ONLY within a basket via
    an ordered self-equi-join on the order key (part_a < part_b halves
    the pairs and fixes orientation), so candidate volume is bounded by
    Σ basket_size² with TPC-H baskets ≤ 7 lines — linear in orders,
    never corpus-quadratic. Item and pair supports are map-side
    combinable counts; the order total folds in as a 1-row broadcast.

    Engine-exact: counts are integers; support/confidence/lift each
    derive through one fixed tree of correctly-rounded IEEE divisions
    (the ratio discipline of the C30o lift row)."""
    baskets = lineitem.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_partkey").alias("part")).distinct()
    a = baskets.select("okey", F.col("part").alias("part_a"))
    b = baskets.select("okey", F.col("part").alias("part_b"))
    pairs = (a.join(b, "okey")
             .filter(F.col("part_a") < F.col("part_b"))
             .groupBy("part_a", "part_b")
             .agg(F.count(F.lit(1)).alias("n_co"))
             .filter(F.col("n_co") >= min_co))
    item = baskets.groupBy("part").agg(F.count(F.lit(1)).alias("n_item"))
    total = baskets.select("okey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders"))
    na = item.select(F.col("part").alias("part_a"),
                     F.col("n_item").alias("n_a"))
    nb = item.select(F.col("part").alias("part_b"),
                     F.col("n_item").alias("n_b"))
    return (pairs.join(na, "part_a").join(nb, "part_b")
            .crossJoin(F.broadcast(total))
            .select(
                "part_a", "part_b", "n_co", "n_a", "n_b",
                (F.col("n_co").cast("double")
                 / F.col("n_orders").cast("double")).alias("support"),
                (F.col("n_co").cast("double")
                 / F.col("n_a").cast("double")).alias("confidence"),
                ((F.col("n_co").cast("double")
                  / F.col("n_a").cast("double"))
                 * (F.col("n_orders").cast("double")
                    / F.col("n_b").cast("double"))).alias("lift")))


def asof_join_tolerance(events: DataFrame, orders: DataFrame,
                        tolerance_days: int = 30) -> DataFrame:
    """C10t: as-of join with a STALENESS BOUND — pandas
    merge_asof(tolerance=...) semantics: each event gets the latest
    order at/before its time ONLY if that order is within
    `tolerance_days` — evaluated at DAY granularity (the lower bound is
    midnight of event_date − tolerance_days, matching the date-typed
    o_orderdate and the oracle's date_sub; merge_asof with a
    sub-day-exact Timedelta would reject up to one extra day of
    staleness); staler state is treated as missing (the feature-
    freshness rule every real-time feature store enforces: serving a
    6-month-old account balance as "current" is worse than a null).

    Same plan shape as the max_by form (C10's candidate-heavy winner):
    the tolerance lands IN the join condition, so stale candidates are
    pruned BEFORE the shuffle rather than filtered after the argmax —
    at 100 TB the candidate fan-in per event drops from a customer's
    lifetime order count to the tolerance window's. Left join keeps
    no-candidate events with NULL payload (merge_asof semantics)."""
    ev = events.select("event_id", "ts", "user_id")
    od = orders.select("o_orderkey", "o_custkey", "o_orderdate",
                       "o_totalprice")
    cand = ev.join(
        od,
        (ev.user_id == od.o_custkey) & (od.o_orderdate <= ev.ts)
        & (od.o_orderdate >= F.date_sub(F.to_date(ev.ts),
                                        tolerance_days)
           .cast("timestamp")),
        "left",
    )
    best = F.max_by(
        F.struct("o_orderkey", "o_totalprice"),
        F.struct(F.coalesce(F.col("o_orderdate"),
                            F.lit("1970-01-01").cast("timestamp")),
                 "o_orderkey"))
    return (
        cand.groupBy("event_id", "user_id").agg(best.alias("b"))
        .select("event_id", "user_id",
                F.col("b.o_orderkey").alias("o_orderkey"),
                F.col("b.o_totalprice").alias("o_totalprice"))
    )


def allen_census(orders: DataFrame) -> DataFrame:
    """C9 addendum (round 13): Allen interval-algebra census — classify
    each customer's consecutive order-activity intervals into Allen's
    interval relations (Allen 1983) and report the relation mix. The
    temporal-join diagnostic: before choosing a range/as-of/interval
    join strategy you profile HOW intervals actually relate (mostly
    disjoint → range join wins; heavy overlap → interval join state
    blows up; the census is that profile).

    Intervals derive deterministically from the order row (start =
    o_orderdate, duration = o_orderkey mod 400 + 30 days, the fixture
    convention). Pairs are formed per customer between each interval
    and its successor in (start, orderkey) order — ONE keyed lag
    window, no self-join — so a.start ≤ b.start by construction and
    exactly eight of the thirteen relations can occur; the CASE chain
    covers all eight, ordered equality-first so the classification is
    deterministic in both engines.

    Output: per relation, the pair count, the min/max day gap
    (b.start − a.end, negative under overlap), and the share in exact
    ppm of all pairs."""
    iv = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"),
                   (F.col("o_orderkey") % 400 + 30).cast("int"))
        .alias("e"))
    w = Window.partitionBy("custkey").orderBy("s", "orderkey")
    p = (iv
         .withColumn("bs", F.lead("s").over(w))
         .withColumn("be", F.lead("e").over(w))
         .filter(F.col("bs").isNotNull()))
    a_s, a_e, b_s, b_e = (F.col("s"), F.col("e"),
                          F.col("bs"), F.col("be"))
    rel = (
        F.when((a_s == b_s) & (a_e == b_e), "equals")
        .when((a_s == b_s) & (a_e < b_e), "starts")
        .when((a_s == b_s) & (a_e > b_e), "started_by")
        .when(a_e < b_s, "precedes")
        .when(a_e == b_s, "meets")
        .when((b_s < a_e) & (a_e < b_e), "overlaps")
        .when(a_e == b_e, "finished_by")
        .otherwise("contains"))
    gap = F.datediff(b_s, a_e)
    census = (p.groupBy(rel.alias("relation"))
              .agg(F.count(F.lit(1)).alias("n_pairs"),
                   F.min(gap).alias("min_gap_days"),
                   F.max(gap).alias("max_gap_days")))
    total = census.agg(F.sum("n_pairs").alias("n_total"))
    return (census.crossJoin(F.broadcast(total))
            .select("relation", "n_pairs",
                    F.col("min_gap_days").cast("int").alias("min_gap_days"),
                    F.col("max_gap_days").cast("int").alias("max_gap_days"),
                    F.expr("n_pairs * 1000000 div n_total")
                    .alias("share_ppm")))


def bloom_index_persist(spark, orders: DataFrame, customer: DataFrame,
                        index_dir: str, m_bits: int | None = None,
                        k: int = 3, segment: str = "BUILDING") -> DataFrame:
    """C6 addendum (round 15): PERSISTED bloom-filter index — the
    on-disk form of C6b's runtime filter: a lakehouse ships the bloom
    filter as an index FILE next to the table (Parquet bloom filters,
    Delta/Iceberg file-level indexes) so every later probe job loads
    ~m_bits/8 bytes instead of re-scanning the build side. The filter
    relation (word → bits, built with the exact C6b column algebra) is
    WRITTEN to parquet, RELOADED, and the probe path runs entirely
    against the loaded copy — never the in-memory build.

    Earned verdicts beside C6b's (exact counts replayed by the oracle,
    booleans pinned TRUE): roundtrip_exact — the loaded filter is
    bit-identical to the built one (full-outer join on word, every
    bits pair equal, no orphan words); no_false_negatives — candidates
    from the LOADED filter verify to exactly the true semi-join count;
    pruned — the persisted filter still prunes.

    Scale: m_bits is DERIVED from the build side — next power of two
    ≥ 16× the key count (~0.5% FP at k=3), floor 2^14, cap 2^28 — so
    the filter stays sub-saturated at any scale factor: a fixed size
    saturates once keys ≫ m_bits/16, every probe then passes all k
    bits, and the pruned verdict flips false. The sizing count is one
    bounded 1-row action per index BUILD (an index refresh already
    scans the build side; the count rides the same scan budget). The
    index is ≤ m_bits/64 rows (≤4M at the cap = 32 MB of words —
    still broadcastable; past that a lakehouse shards the index per
    file/partition, which is C37's skipping row, not this one).
    Probes broadcast the loaded relation. At 100 TB the build side is
    scanned ONCE per index refresh instead of once per probe job —
    that is the entire point of persisting it."""
    keys = (customer.filter(F.col("c_mktsegment") == segment)
            .select(F.col("c_custkey").alias("key")))
    if m_bits is None:
        n_keys = keys.count()
        m_bits = 1 << 14
        while m_bits < 16 * n_keys and m_bits < 1 << 28:
            m_bits <<= 1

    words = _bloom_words(keys, m_bits, k)
    words.write.mode("overwrite").parquet(index_dir)
    loaded = spark.read.parquet(index_dir)

    rt = (words.alias("a").join(loaded.alias("b"), "word", "full_outer")
          .agg(F.sum(F.when(F.col("a.bits").isNull()
                            | F.col("b.bits").isNull()
                            | (F.col("a.bits") != F.col("b.bits")),
                            1).otherwise(0)).alias("n_mismatch"),
               F.count(F.lit(1)).alias("n_words")))

    candidates = _bloom_candidates(orders, loaded, m_bits, k)
    verified = candidates.join(keys, "key", "semi")
    truth = (orders.join(
        customer.filter(F.col("c_mktsegment") == segment),
        orders.o_custkey == F.col("c_custkey"), "semi"))
    stats = (orders.agg(F.count(F.lit(1)).alias("n_orders"))
             .crossJoin(F.broadcast(
                 candidates.agg(F.count(F.lit(1)).alias("n_cand"))))
             .crossJoin(F.broadcast(
                 verified.agg(F.count(F.lit(1)).alias("n_verified"))))
             .crossJoin(F.broadcast(
                 truth.agg(F.count(F.lit(1)).alias("n_matched"))))
             .crossJoin(F.broadcast(rt)))
    return stats.select(
        "n_orders", "n_matched",
        # word count is hash-algebra-specific (not oracle-replayable):
        # surface it as the boundedness verdict, not a raw number
        ((F.col("n_words") >= 1) & (F.col("n_words") <= m_bits // 64))
        .alias("index_bounded"),
        (F.col("n_mismatch") == 0).alias("roundtrip_exact"),
        (F.col("n_verified") == F.col("n_matched"))
        .alias("no_false_negatives"),
        (F.col("n_cand") < F.col("n_orders")).alias("pruned"),
    )


def join_strategy_advisor(spark, lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, nation: DataFrame,
                          threshold_bytes: int = 256 * 1024) -> DataFrame:
    """C37n (round 14 session, r17 slate): stats-driven JOIN-STRATEGY
    advisor with an EARNED plan confirmation — the decision a CBO (or
    the engineer reading `ANALYZE TABLE` output) makes before every
    join at 100 TB: broadcast the build side if its estimated bytes fit
    the broadcast budget, otherwise shuffle both sides. Spark's own
    planner makes this call from file-size statistics that are often
    stale, missing (post-transformation sizes), or compressed-size
    skewed; a pipeline that KNOWS its dimension sizes pins the strategy
    with hints — this operator is that advisor, and it proves the hint
    plumbing takes effect instead of trusting it.

    Size estimation is exact and engine-replayable (never a guess the
    oracle can't hash): one linear pass per build table computes
    rows × 8 bytes per fixed-width column + the exact octet sum of the
    string columns — in-memory row width, deliberately independent of
    on-disk compression (a snappy parquet file 4× smaller than its
    broadcast hash table is exactly how 10-GB-broadcast OOMs happen).

    Candidates cover both verdict branches at the test scales:
    orders⋈customer and customer⋈nation stay under the budget
    (broadcast); lineitem⋈orders' build side crosses it at sf0.1
    (shuffle). The 256 KiB budget is the default 10 MiB
    autoBroadcastJoinThreshold scaled to the test corpus so BOTH
    branches execute in the gate; the CASE logic is scale-invariant.

    `plan_confirmed` is EARNED per candidate: the recommended join is
    actually constructed — broadcast via the hint, shuffle under a
    scoped autoBroadcastJoinThreshold=-1 (restored in finally, the
    skew_join_audit discipline) — and the physical plan must contain
    the recommended operator (BroadcastHashJoin, or SortMerge/
    ShuffledHash with no broadcast). A hint silently ignored, or a
    conf that leaks, flips the boolean and fails the oracle.

    Scale: the advisor costs one map-side-combinable agg per build
    table; the confirmation is plan construction only (no join
    executes); output is 3 metadata rows."""
    fixed = {"customer": 3 * 8, "nation": 2 * 8, "orders": 4 * 8}
    strings = {
        "customer": ["c_name", "c_mktsegment"],
        "nation": ["n_name"],
        "orders": ["o_orderstatus", "o_orderpriority"],
    }
    tables = {"customer": customer, "nation": nation, "orders": orders}
    candidates = [
        ("orders_customer", "customer", orders, "o_custkey", "c_custkey"),
        ("customer_nation", "nation", customer, "c_nationkey",
         "n_nationkey"),
        ("lineitem_orders", "orders", lineitem, "l_orderkey",
         "o_orderkey"),
    ]

    def stats(tname):
        oct_sum = sum((F.sum(F.octet_length(F.col(c))) for c in
                       strings[tname][1:]),
                      F.sum(F.octet_length(F.col(strings[tname][0]))))
        return tables[tname].agg(
            F.count(F.lit(1)).alias("build_rows"),
            (F.count(F.lit(1)) * fixed[tname] + oct_sum)
            .cast("long").alias("build_bytes_est"))

    out = []
    for join_name, build_name, probe, pkey, bkey in candidates:
        st = stats(build_name)
        bytes_est = st.collect()[0]["build_bytes_est"]  # bounded 1-row
        build = tables[build_name]
        if bytes_est < threshold_bytes:
            strategy = "broadcast"
            joined = probe.join(F.broadcast(build),
                                probe[pkey] == build[bkey])
            plan = joined._jdf.queryExecution().executedPlan().toString()
            confirmed = "BroadcastHashJoin" in plan
        else:
            strategy = "shuffle"
            key = "spark.sql.autoBroadcastJoinThreshold"
            prev = spark.conf.get(key)
            try:
                spark.conf.set(key, "-1")
                joined = probe.join(build, probe[pkey] == build[bkey])
                plan = (joined._jdf.queryExecution()
                        .executedPlan().toString())
            finally:
                spark.conf.set(key, prev)
            confirmed = (("SortMergeJoin" in plan
                          or "ShuffledHashJoin" in plan)
                         and "BroadcastHashJoin" not in plan)
        out.append(st.select(
            F.lit(join_name).alias("join_name"),
            F.lit(build_name).alias("build_table"),
            "build_rows", "build_bytes_est",
            F.lit(strategy).alias("strategy"),
            F.lit(bool(confirmed)).alias("plan_confirmed")))
    res = out[0]
    for nxt in out[1:]:
        res = res.unionByName(nxt)
    return res
