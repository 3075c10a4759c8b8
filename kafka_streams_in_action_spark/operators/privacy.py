"""Privacy / anonymization audits (SURVEY §2 addendum C40, round 13).

A training-data pipeline that ingests user-derived records has to answer
"can any row be singled out?" BEFORE the data ships to a trainer — the
standard gauges are k-anonymity (Sweeney 2002: every quasi-identifier
combination is shared by ≥ k rows), l-diversity (Machanavajjhala et al.
2007: every QI class carries ≥ l distinct sensitive values, closing the
homogeneity attack k-anonymity misses), and the generalization ladder
(coarsen QIs until the k floor holds; Samarati 2001). All three are pure
relational algebra — group sizes and distinct counts — so they run as
plain hash aggregates that scale exactly like any other groupBy: the QI
tuple shuffles, the payload never does, and every output is a bounded
per-segment summary rather than a per-row disclosure.

Scale notes for 100 TB:
- The QI-class aggregate is map-side combinable (counts), one shuffle on
  the QI tuple; classes are then rolled up to a ≤|segments|-row report —
  no per-class rows leave the job.
- l-diversity's distinct-sensitive count is a two-level agg
  (distinct (QI, sensitive) pairs first, then class sizes) — the
  partial-agg form Spark plans for count(DISTINCT) under a grouping.
- The ladder recomputes the class sizes per level (3 bounded passes);
  coarsening only merges classes, so min class size is provably
  monotone non-decreasing — the emitted verdict is earned from the data
  and doubles as a self-check.

All arithmetic is exact: group sizes are BIGINTs and account-balance
bands come from half-up integer cents, so the DuckDB oracles hash-match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _acct_band(col, cents_per_band: int):
    """Account-balance band from exact half-up cents, floored (NOT
    truncated — negative balances must band downward the same way in
    both engines). |cents| ≤ 1e6 and the band divisor are small ints,
    so the IEEE quotient is exact at every band boundary and
    floor(cents/band) is engine-identical."""
    cents = F.floor(col * 100 + F.lit(0.5)).cast("long")
    return F.floor(cents / F.lit(cents_per_band))


def k_anonymity_audit(customer: DataFrame, k: int = 5) -> DataFrame:
    """C40a: k-anonymity audit over the customer quasi-identifiers
    (nation, market segment, account-balance band of 1000 currency
    units). Emits one row per market segment: class count, the minimum
    class size (the k actually achieved), how many classes and rows sit
    below the contractual k, and the at-risk fraction in exact ppm.

    Two hash aggregates: QI classes (map-side combinable counts, one
    shuffle on the QI tuple), then a ≤|segments|-row rollup."""
    qi = customer.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
        _acct_band(F.col("c_acctbal"), 100_000).cast("long").alias("band"))
    classes = (qi.groupBy("segment", "nationkey", "band")
               .agg(F.count(F.lit(1)).alias("sz")))
    below = F.col("sz") < k
    report = (classes.groupBy("segment")
              .agg(F.count(F.lit(1)).alias("n_classes"),
                   F.min("sz").alias("k_min"),
                   F.sum(F.when(below, 1).otherwise(0)).cast("long")
                   .alias("n_weak_classes"),
                   F.sum(F.when(below, F.col("sz")).otherwise(0))
                   .cast("long").alias("rows_at_risk"),
                   F.sum("sz").alias("n_rows")))
    return report.select(
        "segment", "n_classes", "k_min", "n_weak_classes", "rows_at_risk",
        "n_rows",
        F.expr("rows_at_risk * 1000000 div n_rows").alias("risk_ppm"),
        (F.col("k_min") >= k).alias("k_anonymous"))


def l_diversity_audit(customer: DataFrame, orders: DataFrame,
                      l_floor: int = 3) -> DataFrame:
    """C40b: l-diversity audit — QI class = (nation, market segment)
    over customer⋈orders, sensitive attribute = order priority. A class
    where every member shares one priority leaks the sensitive value
    even at high k (the homogeneity attack); the audit reports, per
    segment, the worst per-class distinct-sensitive count and the row
    mass sitting in classes below the l floor.

    Shape: keyed equi-join (customer side broadcast at dimension
    ratios), then distinct (QI, sensitive) pairs → class rollup →
    segment rollup; all counts exact BIGINT."""
    j = (orders.join(F.broadcast(customer),
                     orders.o_custkey == customer.c_custkey)
         .select(F.col("c_mktsegment").alias("segment"),
                 F.col("c_nationkey").alias("nationkey"),
                 F.col("o_orderpriority").alias("sensitive")))
    per_class = (j.groupBy("segment", "nationkey")
                 .agg(F.countDistinct("sensitive").alias("l_val"),
                      F.count(F.lit(1)).alias("sz")))
    weak = F.col("l_val") < l_floor
    report = (per_class.groupBy("segment")
              .agg(F.count(F.lit(1)).alias("n_classes"),
                   F.min("l_val").alias("l_min"),
                   F.sum(F.when(weak, 1).otherwise(0)).cast("long")
                   .alias("n_weak_classes"),
                   F.sum(F.when(weak, F.col("sz")).otherwise(0))
                   .cast("long").alias("rows_in_weak"),
                   F.sum("sz").alias("n_rows")))
    return report.select(
        "segment", "n_classes", "l_min", "n_weak_classes", "rows_in_weak",
        "n_rows",
        F.expr("rows_in_weak * 1000000 div n_rows").alias("weak_ppm"),
        (F.col("l_min") >= l_floor).alias("l_diverse"))


def generalization_ladder(customer: DataFrame, nation: DataFrame,
                          k: int = 5) -> DataFrame:
    """C40c: the generalization ladder — recompute the k-anonymity floor
    under three successively coarser QI schemes and prove the
    suppression cost falls monotonically:

      level 0: (nation,  segment, 1000-unit balance band)
      level 1: (region,  segment, 5000-unit balance band)
      level 2: (region,  segment)                       — band dropped

    Coarsening merges classes, so min class size is mathematically
    non-decreasing up the ladder; the emitted `monotone` verdict is
    still EARNED from the measured per-level floors (a broken band
    function or a bad join would falsify it loudly).

    Shape: three bounded grouped passes over one projected input (the
    nation→region map broadcasts), then a 3-row union + 1-row verdict
    crossJoin."""
    base = (customer.join(F.broadcast(nation),
                          customer.c_nationkey == nation.n_nationkey)
            .select(F.col("c_mktsegment").alias("segment"),
                    F.col("c_nationkey").alias("nationkey"),
                    F.col("n_regionkey").alias("regionkey"),
                    _acct_band(F.col("c_acctbal"), 100_000).cast("long")
                    .alias("band0"),
                    _acct_band(F.col("c_acctbal"), 500_000).cast("long")
                    .alias("band1")))

    def level(n: int, keys: list[str]) -> DataFrame:
        classes = (base.groupBy(*keys)
                   .agg(F.count(F.lit(1)).alias("sz")))
        return (classes.agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.min("sz").alias("k_min"),
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
            .cast("long").alias("rows_at_risk"))
            .select(F.lit(n).alias("level"), "n_classes", "k_min",
                    "rows_at_risk"))

    ladder = (level(0, ["segment", "nationkey", "band0"])
              .unionAll(level(1, ["segment", "regionkey", "band1"]))
              .unionAll(level(2, ["segment", "regionkey"])))
    verdict = ladder.agg(
        (F.max(F.when(F.col("level") == 1, F.col("k_min")))
         >= F.max(F.when(F.col("level") == 0, F.col("k_min")))).alias("m01"),
        (F.max(F.when(F.col("level") == 2, F.col("k_min")))
         >= F.max(F.when(F.col("level") == 1, F.col("k_min")))).alias("m12"))
    return (ladder.crossJoin(F.broadcast(
        verdict.select((F.col("m01") & F.col("m12")).alias("monotone"))))
        .select("level", "n_classes", "k_min", "rows_at_risk",
                (F.col("k_min") >= k).alias("k_anonymous"), "monotone"))


def t_closeness_audit(customer: DataFrame,
                      t_ppm: int = 200_000) -> DataFrame:
    """C40d (round 14): t-closeness audit (Li, Li & Venkatasubramanian
    2007) — the third rung of the privacy ladder: a QI class can be
    k-anonymous AND l-diverse yet still leak through its sensitive-value
    DISTRIBUTION (the skewness attack: "every account in this class is
    in the top balance band" discloses plenty even with k distinct
    values). t-closeness bounds, per class, the Earth Mover's Distance
    between the class's sensitive distribution and the global one; for
    an ORDERED sensitive attribute the EMD reduces to the normalized
    cumulative-difference sum  D = (1/(m-1))·Σ_i |CumP_i − CumQ_i|.

    QI class = (market segment, nation); ordered sensitive attribute =
    the 1000-unit account-balance band (bounded ordered domain, the
    k-anonymity audit's band function). Emits one row per segment: the
    worst class EMD in exact ppm, how many classes (and how much row
    mass) breach the `t_ppm` contract, and the earned verdict.

    Exactness: EMD is computed over a COMMON denominator —
    |cum_class·N − cum_global·n_class| summed as BIGINTs, then one
    floor-division to ppm with the accumulator in DECIMAL(38,0)
    (HUGEINT in DuckDB) so the ×1e6 scaling cannot overflow at 100×
    data. Zero float ops anywhere.

    Scale: one map-side-combinable (class × band) count agg; the dense
    per-class band grid is bounded by the VALUE DOMAIN (≤ a dozen
    bands), not the data; one window cumsum over ≤ classes·m rows; the
    global band histogram broadcasts at ≤ m rows."""
    from pyspark.sql import Window

    qi = customer.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
        _acct_band(F.col("c_acctbal"), 100_000).cast("long").alias("band"))
    cls_band = (qi.groupBy("segment", "nationkey", "band")
                .agg(F.count(F.lit(1)).alias("cnt")))
    glob = (qi.groupBy("band").agg(F.count(F.lit(1)).alias("g_cnt")))
    m_tot = glob.agg(F.count(F.lit(1)).alias("m"),
                     F.sum("g_cnt").alias("n_total"))
    classes = (cls_band.groupBy("segment", "nationkey")
               .agg(F.sum("cnt").alias("n_class")))
    # dense (class × global-band) grid: a band the class never attains
    # still carries the running cumulative difference into the sum
    grid = (classes.crossJoin(F.broadcast(glob))
            .join(cls_band, ["segment", "nationkey", "band"], "left")
            .select("segment", "nationkey", "band", "n_class", "g_cnt",
                    F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")))
    w = (Window.partitionBy("segment", "nationkey").orderBy("band")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (grid
           .withColumn("cum_c", F.sum("cnt").over(w))
           .withColumn("cum_g", F.sum("g_cnt").over(w)))
    dec = "decimal(38,0)"
    per_class = (cum.crossJoin(F.broadcast(m_tot))
                 .withColumn(
                     "adiff",
                     F.abs(F.col("cum_c") * F.col("n_total")
                           - F.col("cum_g") * F.col("n_class")))
                 .groupBy("segment", "nationkey", "n_class", "m", "n_total")
                 .agg(F.sum(F.col("adiff").cast(dec)).alias("s")))
    # m == 1 → every value identical → every class trivially matches the
    # global distribution (EMD 0); guard the (m-1) divisor (ANSI mode).
    # Integer `div`, NOT decimal `/`: Spark's decimal division rounds
    # HALF_UP at the result scale while DuckDB's `//` truncates — both
    # operands are positive, so div == floor on both engines.
    emd_ppm = F.when(
        F.col("m") > 1,
        F.expr(
            "CAST((s * CAST(1000000 AS DECIMAL(38,0))) div "
            "(CAST(m - 1 AS DECIMAL(38,0))"
            " * CAST(n_class AS DECIMAL(38,0))"
            " * CAST(n_total AS DECIMAL(38,0))) AS BIGINT)")
    ).otherwise(F.lit(0)).cast("long")
    scored = per_class.select("segment", "nationkey", "n_class",
                              emd_ppm.alias("emd_ppm"))
    breach = F.col("emd_ppm") > t_ppm
    return (scored.groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n_classes"),
                 F.max("emd_ppm").alias("t_max_ppm"),
                 F.sum(F.when(breach, 1).otherwise(0)).cast("long")
                 .alias("n_breach_classes"),
                 F.sum(F.when(breach, F.col("n_class")).otherwise(0))
                 .cast("long").alias("rows_in_breach"))
            .select("segment", "n_classes", "t_max_ppm",
                    "n_breach_classes", "rows_in_breach",
                    (F.col("t_max_ppm") <= t_ppm).alias("t_close")))


def dp_noisy_counts(events: DataFrame, noise_bound: int = 3,
                    salt: str = "dp") -> DataFrame:
    """C40e (round 16): differentially-private histogram RELEASE shape —
    the (event_type, day) count table released with per-cell additive
    noise and non-negativity post-processing, the mechanism behind
    every public-stats endpoint over user events. The release contract
    is structural: a sensitivity-1 counting query (each user-event
    contributes to exactly one cell), independent per-cell noise,
    post-processing that never touches the raw data again, and ONLY
    the noisy values leave the operator — true counts are never
    emitted.

    Determinism caveat (stated, not hidden): real DP draws Laplace
    (b = Δ/ε) noise from a CSPRNG; a random release can't be
    driver-hash-checked, so this row substitutes a seeded
    bounded-uniform draw — FNV(cell-key‖salt) mod (2B+1) − B — which
    any engine replays bit-for-bit. The plumbing (cell keying, noise
    addition, clamp) is exactly the production shape; swapping the
    hash for calibrated Laplace is a one-line change that alters no
    plan. B is the noise bound the accountant would derive from ε.

    Scale: one keyed aggregation (map-side combinable) over the fact
    table, then pure per-cell column algebra on the |types|×|days|
    histogram — the release costs one shuffle at any corpus size."""
    from .sampling import fnv32_column

    cells = (events
             .groupBy(F.col("event_type"),
                      F.col("ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    key = F.concat(F.col("event_type"), F.lit("|"),
                   F.date_format("day", "yyyy-MM-dd"),
                   F.lit(":" + salt))
    noise = (F.pmod(fnv32_column(key), F.lit(2 * noise_bound + 1))
             - F.lit(noise_bound))
    # release ONLY the noisy value — emitting the draw (or the true n)
    # beside it would let released_n − noise reconstruct the raw count
    return (cells
            .select("event_type", "day",
                    F.greatest(F.lit(0).cast("long"),
                               (F.col("n") + noise).cast("long"))
                    .alias("released_n"),
                    F.lit(noise_bound).alias("noise_bound")))


def pseudonymize_join(customer: DataFrame, orders: DataFrame,
                      salt: str = "pseud") -> DataFrame:
    """C40f (round 16, second tranche): keyed PSEUDONYMIZATION with
    referential integrity — the de-identification every cross-team
    data share runs before k-anon/l-div auditing even starts: the
    stable identifier (custkey) is replaced by a keyed token
    md5(salt‖key) consistently across BOTH tables, so joins still work
    on tokens while the raw key never leaves the operator. (A real
    deployment uses HMAC with a secret key — md5 with a salt literal
    is the same plumbing with a replayable key, the c40_dp_hist
    determinism contract.)

    The verdict is earned from the tokenized tables themselves: the
    per-segment order counts from the TOKEN join must equal what the
    raw-key join produces (referential integrity survived
    tokenization), and the distinct-token count must equal the
    distinct-key count (no collisions collapsed two customers — md5
    collisions at any realistic cardinality would be a find in
    itself). Neither raw custkeys nor any 1:1-reversible mapping is
    emitted.

    Scale: tokenization is a per-row projection (pushes to the scan);
    the token join shuffles exactly like the key join (token
    cardinality = key cardinality, same skew), which is the point —
    pseudonymization must not change the plan shape."""
    tok_c = customer.select(
        F.md5(F.concat(F.lit(salt + "|"),
                       F.col("c_custkey").cast("string"))).alias("token"),
        "c_mktsegment")
    tok_o = orders.select(
        F.md5(F.concat(F.lit(salt + "|"),
                       F.col("o_custkey").cast("string"))).alias("token"))
    per_seg = (tok_o.join(tok_c, "token")
               .groupBy("c_mktsegment")
               .agg(F.count(F.lit(1)).alias("n_orders"),
                    F.countDistinct("token").alias("n_active_tokens")))
    audit = (customer.agg(
        F.countDistinct("c_custkey").alias("n_keys"))
        .crossJoin(F.broadcast(
            tok_c.agg(F.countDistinct("token").alias("n_tokens")))))
    return (per_seg.crossJoin(F.broadcast(audit))
            .select(F.col("c_mktsegment").alias("segment"),
                    "n_orders", "n_active_tokens",
                    (F.col("n_tokens") == F.col("n_keys"))
                    .alias("token_injective")))
