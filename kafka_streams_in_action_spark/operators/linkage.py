"""Record linkage / entity resolution (SURVEY §2C C39, round-8 family).

The missing step between exact dedup (C28: same bytes) and near-dup
dedup (C29: same content): matching RECORDS that describe the same
entity with corrupted fields — the Fellegi-Sunter match pipeline every
large-scale data-integration job runs (Hernández & Stolfo's sorted-
neighborhood blocking, SIGMOD '95, is the candidate-generation shape
used here). Three stages, each with an explicit scale contract:

1. **Blocking** — candidates come from an EQUI-join on a composite
   block key (nationkey, mktsegment, banded account-balance bucket),
   never an all-pairs product. The balance band is the sorted-
   neighborhood trick: a dirty record explodes to the (at most two)
   buckets its ±tolerance window can reach, so candidate volume is
   bounded by block occupancy, not corpus size.
2. **Verify** — JVM `levenshtein` on the name plus an exact integer
   balance delta, only on blocked candidates (same discipline as
   C28h edit-verify, dedup.py:782).
3. **Assign** — best match per dirty record via one ranking window
   (score = edit distance, then |balance delta|, then key; fully
   deterministic tie-break), the 1:1 assignment step.

The "dirty" side is derived deterministically inside the query (zero-
padding stripped from the name, balance perturbed by a key-dependent
cent offset) — same synthesize-the-twin pattern as the multimodal
codecs — so ground truth is known and the output carries a per-record
`correct` verdict the oracle can replay exactly. All comparisons are
integer/string ops: engine-exact with no float tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Banded-blocking parameters: cent tolerance for a candidate, bucket
# width of the balance band, and the nonneg offset that keeps integer
# division identical across engines for negative balances.
CENT_TOL = 10
BAND_W = 1000
OFFSET = 1_000_000


def _cents(col):
    """Exact integer cents (half-up, pure IEEE double ops)."""
    return F.floor(col * 100.0 + 0.5).cast("long")


def dirty_twin(customer: DataFrame) -> DataFrame:
    """The corrupted re-entry of every third customer record: name loses
    its zero padding, balance drifts by a key-dependent few cents."""
    return (customer
            .filter(F.col("c_custkey") % 3 == 0)
            .select(
                F.col("c_custkey").alias("dirty_id"),
                F.regexp_replace("c_name", "#0+", "#").alias("d_name"),
                F.col("c_nationkey").alias("d_nationkey"),
                F.col("c_mktsegment").alias("d_mktsegment"),
                (_cents(F.col("c_acctbal"))
                 + (F.col("c_custkey") % 7 - 3)).alias("d_cents")))


def link_records(customer: DataFrame, max_edit: int = 9) -> DataFrame:
    """C39a: link the dirty twin back to the clean customer table.

    Returns one row per dirty record that found a match:
    (dirty_id, matched_custkey, edit_dist, cents_diff, correct).
    """
    dirty = dirty_twin(customer)
    clean = customer.select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        _cents(F.col("c_acctbal")).alias("cents"))

    # A dirty record's ±CENT_TOL window touches at most two balance
    # buckets; emit both (array_distinct folds the common same-bucket
    # case) so the join stays a pure equi-join on the composite key.
    lo = F.expr(f"(d_cents - {CENT_TOL} + {OFFSET}) div {BAND_W}")
    hi = F.expr(f"(d_cents + {CENT_TOL} + {OFFSET}) div {BAND_W}")
    probes = dirty.select(
        "*", F.explode(F.array_distinct(F.array(lo, hi))).alias("band"))
    keyed = clean.withColumn(
        "band", F.expr(f"(cents + {OFFSET}) div {BAND_W}"))

    cand = (probes.join(
                keyed,
                (probes.d_nationkey == keyed.c_nationkey)
                & (probes.d_mktsegment == keyed.c_mktsegment)
                & (probes.band == keyed.band))
            .withColumn("cents_diff", F.col("cents") - F.col("d_cents"))
            .filter(F.abs("cents_diff") <= CENT_TOL)
            .withColumn("edit_dist",
                        F.levenshtein("d_name", "c_name"))
            .filter(F.col("edit_dist") <= max_edit))

    best = Window.partitionBy("dirty_id").orderBy(
        "edit_dist", F.abs("cents_diff"), "c_custkey")
    return (cand
            .withColumn("_rn", F.row_number().over(best))
            .filter(F.col("_rn") == 1)
            .select(
                "dirty_id",
                F.col("c_custkey").alias("matched_custkey"),
                "edit_dist",
                "cents_diff",
                (F.col("c_custkey") == F.col("dirty_id")).alias("correct")))


def golden_records(customer: DataFrame, max_edit: int = 9) -> DataFrame:
    """C39b: survivorship — the step after assignment in an entity-
    resolution pipeline: fold each clean record's matched dirty
    observations into ONE golden record. Identity fields survive from
    the clean side; the observed balance survives from the BEST dirty
    observation (best by the assignment's own deterministic ordering:
    edit distance, |cent delta|, dirty id), and the row carries its
    source count and an updated flag. One aggregate over the match
    table plus one keyed left join back to the clean side — the match
    table is already ≤ the dirty cardinality, so survivorship adds no
    data-scale work beyond linkage itself."""
    matches = link_records(customer, max_edit=max_edit)
    clean = customer.select(
        "c_custkey", "c_mktsegment",
        _cents(F.col("c_acctbal")).alias("cents"))
    best = (matches
            .groupBy("matched_custkey")
            .agg(F.count(F.lit(1)).alias("n_dirty"),
                 F.min(F.struct("edit_dist",
                                F.abs("cents_diff").alias("_ad"),
                                "dirty_id", "cents_diff")).alias("_b"))
            .select("matched_custkey", "n_dirty",
                    F.col("_b.cents_diff").alias("best_diff")))
    return (clean
            .join(best, clean.c_custkey == best.matched_custkey, "left")
            .select(
                F.col("c_custkey").alias("custkey"),
                F.col("c_mktsegment").alias("segment"),
                F.col("cents").alias("cents_clean"),
                F.when(F.col("matched_custkey").isNotNull(),
                       F.col("cents") - F.col("best_diff"))
                .otherwise(F.col("cents")).alias("cents_observed"),
                (F.lit(1) + F.coalesce("n_dirty",
                                       F.lit(0).cast("long")))
                .cast("long").alias("n_sources"),
                F.col("matched_custkey").isNotNull().alias("updated")))


def blocking_eval(customer: DataFrame) -> DataFrame:
    """C39c: blocking-quality evaluation — the two standard ER metrics
    for a candidate-generation scheme (Christen, "Data Matching", ch.7):
    pair completeness (what fraction of TRUE matches survive blocking —
    recall of the blocker) and reduction ratio (what fraction of the
    dirty×clean cross product the blocker avoided scoring). The
    go/no-go gauge before trusting c39_link's assignments: a cheap
    blocker with low pair completeness silently loses matches no
    verify stage can recover.

    Candidates are counted at the BLOCKING stage (the composite-key
    equi-join, before the cent/edit verify filters), distinct per
    (dirty, clean) pair. Ground truth is the synthesized twin (true
    match = same custkey). All counts exact; the two ratios spend one
    fixed IEEE tree each. Scale: the same bounded block-occupancy join
    as c39_link plus three 1-row count broadcasts."""
    dirty = dirty_twin(customer)
    clean = customer.select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        _cents(F.col("c_acctbal")).alias("cents"))
    lo = F.expr(f"(d_cents - {CENT_TOL} + {OFFSET}) div {BAND_W}")
    hi = F.expr(f"(d_cents + {CENT_TOL} + {OFFSET}) div {BAND_W}")
    probes = dirty.select(
        "*", F.explode(F.array_distinct(F.array(lo, hi))).alias("band"))
    keyed = clean.withColumn(
        "band", F.expr(f"(cents + {OFFSET}) div {BAND_W}"))
    cand = (probes.join(
                keyed,
                (probes.d_nationkey == keyed.c_nationkey)
                & (probes.d_mktsegment == keyed.c_mktsegment)
                & (probes.band == keyed.band))
            .select("dirty_id", "c_custkey").distinct())
    counts = (cand.agg(F.count(F.lit(1)).alias("n_candidates"),
                       F.sum(F.when(F.col("dirty_id") == F.col("c_custkey"),
                                    1).otherwise(0))
                       .alias("n_true_covered"))
              .crossJoin(dirty.agg(F.count(F.lit(1)).alias("n_dirty")))
              .crossJoin(clean.agg(F.count(F.lit(1)).alias("n_clean"))))
    pc = (F.col("n_true_covered").cast("double")
          / F.col("n_dirty").cast("double"))
    rr = (F.lit(1.0) - F.col("n_candidates").cast("double")
          / (F.col("n_dirty") * F.col("n_clean")).cast("double"))
    return counts.select(
        "n_dirty", "n_clean", "n_candidates", "n_true_covered",
        pc.alias("pair_completeness"), rr.alias("reduction_ratio"))
