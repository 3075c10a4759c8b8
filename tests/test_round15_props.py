"""Round-15 property tests: the retrieval-eval metrics recomputed by
independent brute-force reference implementations on randomized small
inputs (seeded — deterministic across runs), plus the moment formulas
against direct numpy-free computation. These catch the class of
arithmetic error the fixed-example tests in test_round15.py cannot
(tie handling in U, the hits-cumsum in AP, cancellation in m3/m4)."""

from __future__ import annotations

import math
import random

from kafka_streams_in_action_spark.operators import (
    features, relational, similarity,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 6)


def test_auc_matches_pairwise_reference_on_random_data(spark):
    """AUC from the histogram fold == the O(n²) pairwise Mann-Whitney
    count (wins + half ties), for every label, on a seeded random
    corpus with deliberate score ties (coarse coordinates)."""
    rnd = random.Random(13)
    rows = [(i, rnd.choice("abc"),
             [float(rnd.randint(0, 3)), float(rnd.randint(0, 3)) + 0.5])
            for i in range(40)]
    out = {r["label"]: r for r in
           similarity.auc_eval(_emb(spark, rows)).collect()}

    # reference: exact centroids per label, then pairwise U
    by_label: dict = {}
    for _i, lbl, v in rows:
        by_label.setdefault(lbl, []).append(v)
    cents = {}
    for lbl, vs in by_label.items():
        n = len(vs)
        # micro-quantized exact mean, the operator's exactness contract
        cents[lbl] = [
            (sum(math.floor(x[d] * 1e6 + 0.5) for x in vs) / n) / 1e6
            for d in range(2)]
    for lbl, cv in cents.items():
        pos = [_cos(v, cv) for _i, l, v in rows if l == lbl]
        neg = [_cos(v, cv) for _i, l, v in rows if l != lbl]
        u2 = sum(2 * (p > q) + (p == q) for p in pos for q in neg)
        r = out[lbl]
        assert r["auc_num"] == u2, (lbl, r["auc_num"], u2)
        assert r["auc_den"] == 2 * len(pos) * len(neg)
        assert abs(r["auc"] - u2 / (2 * len(pos) * len(neg))) < 1e-12


def test_map_matches_direct_ap_on_random_data(spark):
    """AP from the LCM-scaled fold == the textbook
    (1/k)·Σ rel_i·(hits_i/i) computed directly from independently
    re-derived exact and quantized rankings."""
    rnd = random.Random(7)
    rows = [(i, "x", [rnd.uniform(-1, 1) for _ in range(6)])
            for i in range(25)]
    out = {r["query_id"]: r for r in
           similarity.map_eval(_emb(spark, rows)).collect()}

    vecs = {i: v for i, _l, v in rows}

    def dq(v):
        amax = max(abs(x) for x in v)
        if amax == 0:
            return [0.0] * len(v)
        s = amax / 127.0
        return [math.floor(x / s + 0.5) * s for x in v]

    k = 10
    for q in range(10):
        cands = [i for i in vecs if i != q]

        def topk(f):
            scored = sorted(((-f(i), i) for i in cands))
            return [i for _s, i in scored[:k]]

        exact = set(topk(lambda i: _cos(vecs[q], vecs[i])))
        cand = topk(lambda i: _cos(dq(vecs[q]), dq(vecs[i])))
        hits, ap = 0, 0.0
        for rank, i in enumerate(cand, start=1):
            if i in exact:
                hits += 1
                ap += hits / rank
        ap /= k
        r = out[q]
        assert r["n_hits"] == hits
        assert abs(r["ap"] - ap) < 1e-9, (q, r["ap"], ap)


def test_moments_match_direct_formulas_on_random_data(spark):
    rnd = random.Random(99)
    vals = [round(rnd.uniform(1, 500), 2) for _ in range(60)]
    li = spark.createDataFrame([("A", v) for v in vals],
                               "l_returnflag string, l_extendedprice double")
    r = relational.group_moments(li).collect()[0]
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    m = sum(cents) / n
    m2 = sum((x - m) ** 2 for x in cents) / n
    m3 = sum((x - m) ** 3 for x in cents) / n
    m4 = sum((x - m) ** 4 for x in cents) / n
    assert abs(r["mean_cents"] - m) < 1e-6
    assert abs(r["var_cents2"] - m2) / m2 < 1e-9
    assert abs(r["skewness"] - m3 / m2 ** 1.5) < 1e-6
    assert abs(r["ex_kurtosis"] - (m4 / m2 ** 2 - 3)) < 1e-6


def test_scaler_z_extremes_standardize_on_random_data(spark):
    rnd = random.Random(5)
    vals = [round(rnd.uniform(1, 900), 2) for _ in range(40)]
    li = spark.createDataFrame([("B", v) for v in vals],
                               "l_returnflag string, l_extendedprice double")
    r = features.scaler_stats(li).collect()[0]
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    m = sum(cents) / n
    var = sum((x - m) ** 2 for x in cents) / n
    sd = math.sqrt(var)
    assert r["zmin_milli"] == math.floor((min(cents) - m) / sd * 1000 + 0.5)
    assert r["zmax_milli"] == math.floor((max(cents) - m) / sd * 1000 + 0.5)
    assert r["range_cents"] == max(cents) - min(cents)
