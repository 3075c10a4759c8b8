"""Differential tests for the round-7 engine-exact recurrences: each
operator's integer/IEEE arithmetic is replayed in pure Python on seeded
random inputs and must agree with the Spark output EXACTLY (these are
the same proofs the DuckDB oracles assert, but against an independent
third implementation and on adversarial shapes the fixed testdata
doesn't contain — dangling subgraphs, ties, negative values)."""

from __future__ import annotations

import itertools
import math
import random

from pyspark.sql import functions as F

from kafka_streams_in_action_spark.operators import graph, windows


def _py_pagerank(n_nodes, edges, iterations=10):
    """Independent integer replay of the nano-unit recurrence."""
    out_w = {}
    for s, d, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    ratio = {}
    for s, d, w in edges:
        ratio[(s, d)] = int(math.floor(float(w) * 1e9 / float(out_w[s]) + 0.5))
    base = (graph.NANO * 15 // 100) // n_nodes
    r = {i: graph.NANO // n_nodes for i in range(n_nodes)}
    for _ in range(iterations):
        contrib = {i: 0 for i in range(n_nodes)}
        for (s, d), rp in ratio.items():
            contrib[d] += (r[s] * rp) // graph.NANO
        dang = sum(r[i] for i in range(n_nodes) if i not in out_w)
        r = {i: base + (85 * contrib[i] + 85 * (dang // n_nodes)) // 100
             for i in range(n_nodes)}
    return r


def test_pagerank_matches_python_replay_on_random_graphs(spark):
    rnd = random.Random(42)
    for trial in range(3):
        n = rnd.randint(4, 9)
        all_pairs = [(a, b) for a in range(n) for b in range(n)]
        chosen = rnd.sample(all_pairs, rnd.randint(n, min(3 * n, len(all_pairs))))
        edges = [(s, d, rnd.randint(1, 1000)) for s, d in chosen]
        nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges_df = spark.createDataFrame(edges, "src long, dst long, w long")
        got = {r["node"]: r["rank_nano"]
               for r in graph.pagerank(nodes_df, edges_df).collect()}
        want = _py_pagerank(n, edges)
        assert got == want, (trial, n, edges)


def test_triangles_match_bruteforce_on_random_docs(spark):
    """Random near-dup corpora: Spark's ordered two-join census equals the
    itertools brute force over the same pair set."""
    from kafka_streams_in_action_spark.operators.dedup import (
        ngram_jaccard_pairs)

    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rnd = random.Random(7)
    for trial in range(3):
        docs = [(i, " ".join(rnd.choice(words) for _ in range(8)))
                for i in range(12)]
        docs_df = spark.createDataFrame(docs, "doc_id long, text string")
        pairs = {(r["doc_a"], r["doc_b"]) for r in
                 ngram_jaccard_pairs(docs_df, threshold=0.2).collect()}
        und = pairs | {(b, a) for a, b in pairs}
        nodes = {x for p in pairs for x in p}
        tri = sum(1 for a, b, c in itertools.combinations(sorted(nodes), 3)
                  if (a, b) in und and (b, c) in und and (a, c) in und)
        wedges = 0
        for v in nodes:
            deg = sum(1 for x in nodes if (v, x) in und)
            wedges += deg * (deg - 1) // 2
        row = graph.near_dup_triangles(docs_df, threshold=0.2).collect()[0]
        assert row["n_triangles"] == tri, (trial, pairs)
        assert row["n_wedges"] == wedges
        assert row["n_edges"] == len(pairs)


def test_ewma_matches_python_replay_with_negatives(spark):
    """Integer replay of the trailing-20 binary-weight EWMA, including
    negative values (floor(x+0.5) half-up-toward-+inf on both sides)."""
    rnd = random.Random(3)
    rows = []
    for uid in (1, 2):
        for i in range(40):
            rows.append((uid * 1000 + i, uid,
                         f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}.{uid}",
                         rnd.uniform(-50, 50)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"]: r["ewma"] for r in windows.ewma_trailing(ev).collect()}

    by_user = {}
    for eid, uid, _, v in rows:
        by_user.setdefault(uid, []).append((eid, v))
    for uid, seq in by_user.items():
        vals = []
        for eid, v in seq:  # already in ts order (monotone per user)
            vals.append(v)
            frame = vals[-20:]
            m = len(frame)
            num = sum(int(math.floor(x * 1e9 / (1 << (m - 1 - i)) + 0.5))
                      for i, x in enumerate(frame))
            den = sum(int(math.floor(1e9 / (1 << (m - 1 - i)) + 0.5))
                      for i in range(m))
            want = round(float(num) / float(den), 6)
            assert abs(got[eid] - want) < 5e-7, (uid, eid, got[eid], want)


def test_zscore_matches_python_replay(spark):
    rnd = random.Random(11)
    rows = [(i, "t", f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}",
             rnd.gauss(100.0, 5.0) if i % 37 else 400.0)
            for i in range(120)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_id"]: r["z"]
           for r in windows.rolling_zscore_anomalies(ev).collect()}

    ms = [int(math.floor(v * 1000.0 + 0.5)) for _, _, _, v in rows]
    want = {}
    for idx in range(19, len(ms)):
        frame = ms[idx - 19:idx + 1]
        n = 20.0
        s1, s2 = float(sum(frame)), float(sum(x * x for x in frame))
        var = (s2 - s1 * s1 / n) / (n - 1.0)
        if var > 0:
            z = (float(ms[idx]) - s1 / n) / math.sqrt(var)
            if abs(z) > 3.0:
                want[rows[idx][0]] = round(z, 6)
    assert set(got) == set(want)
    for eid in want:
        assert abs(got[eid] - want[eid]) < 5e-7, (eid, got[eid], want[eid])


def test_benford_digit_extraction_matches_string_reference(spark):
    from kafka_streams_in_action_spark.operators.relational import (
        benford_audit)

    rnd = random.Random(5)
    vals = [round(10 ** rnd.uniform(-1.9, 5), 2) for _ in range(2000)]
    orders = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "o_orderkey long, o_totalprice double")
    got = {r["digit"]: r["n_obs"] for r in benford_audit(orders).collect()}
    want = {}
    for v in vals:
        if v >= 0.01:
            d = int(str(int(math.floor(v * 100.0 + 0.5)))[0])
            want[d] = want.get(d, 0) + 1
    assert got == want
