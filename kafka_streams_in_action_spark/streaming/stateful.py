"""Streaming operators C22-C27 — the event-time layer over a streaming events
DataFrame (from Kafka, rate, or a file source in tests).

Each function's batch oracle lives in operators/event_time.py; the equivalence
tests run these in availableNow mode (the reference's run-once pattern A21)
and assert identical results.

Scale posture: watermarks bound state (open windows / dedup keys / per-user
state) by event-time recency, so state size tracks key-cardinality × window
horizon — not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.exact import dsum


def tumbling_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """C22 streaming twin of event_time.tumbling_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """C23 streaming twin of event_time.sliding_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


def session_counts_stream(events: DataFrame, gap_minutes: int = 30,
                          watermark: str = "10 minutes") -> DataFrame:
    """C24 streaming twin: built-in session_window merges windows in the state
    store as events arrive."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
                 "user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum("value").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n", "sum_value")
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """C26 streaming twin: keyed dedup with state TTL'd by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id", "ts")
    )


def running_user_state_tws(events: DataFrame) -> DataFrame:
    """C27 on the Spark 4 arbitrary-state API (transformWithStateInPandas):
    the same per-user running count/sum as running_user_state_stream, with
    state declared through a StatefulProcessor handle (ValueState) instead of
    the applyInPandasWithState callback. This is the engine's forward path —
    typed state, explicit init/close lifecycle, per-key timers when needed.

    Requires the `protobuf` python package (the TWS state-server protocol) and
    the RocksDB state store provider (set in session.py); in environments
    without protobuf, running_user_state_stream is the supported path.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    class RunningState(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType([
                StructField("n", LongType()),
                StructField("total", DoubleType()),
            ])
            self._state = handle.getValueState("running", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (0, 0.0)
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame({
                "user_id": [key[0]],
                "running_n": [n],
                "running_sum": [round(total, 2)],
            })

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningState(),
            outputStructType="user_id long, running_n long, running_sum double",
            outputMode="Update",
            timeMode="None",
        )
    )


def funnel_state_stream(events: DataFrame) -> DataFrame:
    """C34 streaming twin: the per-user funnel (view → click → purchase) as
    an arbitrary keyed state machine over applyInPandasWithState — the
    streaming analog of funnel_analysis's conditional MIN aggregates. State
    per user = the three stage timestamps; each micro-batch replays its
    rows in event-time order through the monotone transition rules (first
    view, first click strictly after that view, first purchase strictly
    after that click) and emits the user's current stage.

    State is three timestamps per user — bounded by user cardinality, not
    stream length. Cross-batch ordering caveat (same as any stateful
    funnel): a stage event arriving in an EARLIER batch than its
    predecessor stage is not retroactively matched; with availableNow
    replay of a time-ordered log (the reference's run-once pattern A21)
    the result equals the batch funnel exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        t_view, t_click, t_buy = \
            state.get if state.exists else (None, None, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        # The time-ordered walk is monotone first-occurrence, so each
        # stage is a conditional MIN — no per-row loop: the first view
        # is min(view ts); the first qualifying click is min(click ts
        # strictly after that view) because the view time never moves
        # once set; likewise the purchase against the click.
        et, ts = rows["event_type"], rows["ts"]
        if t_view is None:
            v = ts[et == "view"]
            if len(v):
                t_view = v.min()
        if t_view is not None and t_click is None:
            c = ts[(et == "click") & (ts > t_view)]
            if len(c):
                t_click = c.min()
        if t_click is not None and t_buy is None:
            p = ts[(et == "purchase") & (ts > t_click)]
            if len(p):
                t_buy = p.min()
        state.update((t_view, t_click, t_buy))
        stage = (3 if t_buy is not None else
                 2 if t_click is not None else
                 1 if t_view is not None else 0)
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return (
        events.select("user_id", "event_type", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, stage int",
            stateStructType=("t_view timestamp, t_click timestamp, "
                             "t_purchase timestamp"),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def asof_enrich_stream(events: DataFrame, orders: DataFrame) -> DataFrame:
    """C10 streaming column: keyed latest-state as-of enrichment. Two
    streams tag-union into one keyed stateful op; per user the state is the
    latest order seen (its (date, orderkey, price) — the streaming analog of
    the batch union+last timeline walk, with state standing in for the
    running frame across micro-batches.

    Within a batch the per-key walk sorts (ts, is_event, ord_key) exactly
    like the batch form, so availableNow over a bounded source equals
    asof_join_latest_order. Across batches the state keeps only the newest
    order version: an event arriving AFTER a newer order was processed
    (late event) matches only if that order is still at/before its
    timestamp — the processing-time-bounded semantic every latest-value
    cache has; a full event-time as-of under lateness needs versioned state
    + watermark GC (Flink-style temporal join), deliberately out of scope.
    """
    return asof_apply_stream(asof_tag_union(events, orders))


def asof_tag_union(events: DataFrame, orders: DataFrame) -> DataFrame:
    """The tag-union half of asof_enrich_stream, exposed so a replay
    harness can time-slice the MERGED timeline (one file-stream source
    whose batch boundaries respect the handler's (t, is_event, ord_key)
    sort order) instead of slicing the two sources independently."""
    ev = events.select(
        "user_id", F.unix_micros("ts").alias("t"),
        F.lit(1).alias("is_event"), "event_id",
        F.lit(None).cast("long").alias("ord_key"),
        F.lit(None).cast("double").alias("ord_price"))
    od = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.unix_micros("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ord_key"),
        F.col("o_totalprice").alias("ord_price"))
    return ev.unionByName(od)


def asof_apply_stream(tagged: DataFrame) -> DataFrame:
    """The stateful half of asof_enrich_stream: the keyed latest-order
    state machine over the (t, is_event, ord_key)-tagged union."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def enrich(key, pdfs, state):
        import numpy as np
        import pandas as pd
        lt, lk, lp = state.get if state.exists else (None, None, None)
        batch = pd.concat(list(pdfs))
        # Vectorized timeline walk: within the batch, orders sorted by
        # (t, ord_key) form a running-latest that is just "the previous
        # order row" (ascending composite), so each event's match is a
        # searchsorted against the order times — with the carried state
        # winning whenever its (t, key) composite is newer (a late
        # event behind an already-seen newer order stays unmatched only
        # when that state order is after the event, same as the loop).
        # Per-group frames are tiny (a user's rows in one micro-batch),
        # so everything below stays in plain numpy — pandas sorts and
        # mask-indexing would dominate at ~40k group invocations.
        t_all = batch["t"].to_numpy(np.int64)
        ie = batch["is_event"].to_numpy(np.int64)
        om = ie == 0
        em = ~om
        o_t = t_all[om]
        o_k = batch["ord_key"].to_numpy(np.float64)[om].astype(np.int64)
        o_p = batch["ord_price"].to_numpy(np.float64)[om]
        osort = np.lexsort((o_k, o_t))
        o_t, o_k, o_p = o_t[osort], o_k[osort], o_p[osort]
        e_t = t_all[em]
        e_id = batch["event_id"].to_numpy(np.float64)[em].astype(np.int64)
        esort = np.lexsort((e_id, e_t))
        e_t, e_id = e_t[esort], e_id[esort]
        has_state = lt is not None
        st_t = np.int64(lt if has_state else -(2 ** 62))
        st_k = np.int64(lk if has_state else -(2 ** 62))
        j = np.searchsorted(o_t, e_t, side="right")
        jj = np.maximum(j - 1, 0)
        bt = np.where(j > 0, o_t[jj] if len(o_t) else st_t, st_t)
        bk = np.where(j > 0, o_k[jj] if len(o_k) else st_k, st_k)
        bp = np.where(j > 0, o_p[jj] if len(o_p) else 0.0, 0.0)
        use_state = (j == 0) | (st_t > bt) | ((st_t == bt) & (st_k > bk))
        sel_t = np.where(use_state, st_t, bt)
        sel_k = np.where(use_state, st_k, bk)
        sel_p = np.where(use_state, np.float64(lp if has_state else 0.0),
                         bp)
        valid = np.where(use_state, has_state, True)
        hit = valid & (sel_t <= e_t)

        if len(o_t):
            cand = (int(o_t[-1]), int(o_k[-1]), float(o_p[-1]))
            if not has_state or (cand[0], cand[1]) > (lt, lk):
                lt, lk, lp = cand
        if lt is not None:
            state.update((lt, lk, lp))
        okey = pd.Series(sel_k, dtype="Int64")
        okey[~hit] = pd.NA
        yield pd.DataFrame({
            "event_id": pd.array(e_id, dtype="Int64"),
            "user_id": pd.array(np.full(len(e_id), key[0]), dtype="Int64"),
            "o_orderkey": okey,
            # NaN→NA under the masked dtype, so misses stay SQL nulls
            "o_totalprice": pd.array(np.where(hit, sel_p, np.nan),
                                     dtype="Float64"),
        })

    return (
        tagged
        .groupBy("user_id")
        .applyInPandasWithState(
            enrich,
            outputStructType=("event_id long, user_id long, "
                              "o_orderkey long, o_totalprice double"),
            stateStructType="t long, k long, p double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_state_stream(events: DataFrame) -> DataFrame:
    """C27: arbitrary stateful op — per-user running count/sum via
    applyInPandasWithState (the generalization of the reference's offset
    bookkeeping A16/A17: state survives across micro-batches exactly like the
    consumer group's committed offsets).

    Emits one row per user per micro-batch with the state *after* that batch;
    with availableNow + a single batch this equals the batch running-state's
    final row per user.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "running_n": [n],
            "running_sum": [round(total, 2)],
        })

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, running_n long, running_sum double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cep_conversion_stream(events: DataFrame,
                          window_us: int = 3_600_000_000) -> DataFrame:
    """C34g streaming twin: the negation CEP pattern (signup → purchase
    within the window, NO error between) as a keyed state machine over
    applyInPandasWithState — per user the state is exactly the batch
    form's window carry: (latest signup ts, error count AS OF that
    signup, running error count), three longs regardless of stream
    length. Each micro-batch replays its rows in (ts, event_id) order
    through the same transition rules; purchases emit their conversion
    verdict inline (append mode — CEP detections are events, not
    aggregates). With availableNow replay of the time-ordered log the
    output equals operators/event_time.cep_conversion row-for-row
    (pinned in tests/test_streaming.py); the same cross-batch ordering
    caveat as every stateful funnel applies to live out-of-order feeds —
    watermarked reordering buffers are the production hardening."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        sig_ts, sig_ce, ce = \
            state.get if state.exists else (None, None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts_us", "event_id"])
        # Vectorized walk: the running error count is a cumsum; the
        # "latest signup before me" is a running max over signup row
        # indices; a purchase then reads both by index — no per-row
        # Python. A non-error row's inclusive cumsum equals the
        # exclusive one, so purchases read ce at their own position.
        et = rows["event_type"].to_numpy()
        ts = rows["ts_us"].to_numpy(np.int64)
        eid = rows["event_id"].to_numpy(np.int64)
        n = len(rows)
        ce_arr = int(ce) + np.cumsum(et == "error")
        sig_idx = np.maximum.accumulate(
            np.where(et == "signup", np.arange(n), -1))
        buy = np.flatnonzero(et == "purchase")
        bsig = sig_idx[buy]
        has_batch_sig = bsig >= 0
        bj = np.maximum(bsig, 0)
        has_state_sig = sig_ts is not None
        s_ts = np.where(has_batch_sig, ts[bj] if n else 0,
                        np.int64(sig_ts if has_state_sig else 0))
        s_ce = np.where(has_batch_sig, ce_arr[bj] if n else 0,
                        np.int64(sig_ce if has_state_sig else 0))
        s_ok = has_batch_sig | has_state_sig
        conv = (s_ok & (ts[buy] - s_ts <= window_us)
                & (ce_arr[buy] == s_ce))
        sts = pd.Series(s_ts, dtype="Int64")
        sts[~s_ok] = pd.NA
        if n:
            last_sig = int(sig_idx[-1])
            if last_sig >= 0:
                sig_ts, sig_ce = int(ts[last_sig]), int(ce_arr[last_sig])
            ce = int(ce_arr[-1])
        state.update((sig_ts, sig_ce, ce))
        yield pd.DataFrame({
            "event_id": pd.array(eid[buy], dtype="Int64"),
            "user_id": pd.array(np.full(len(buy), key[0]), dtype="Int64"),
            "ts_us": pd.array(ts[buy], dtype="Int64"),
            "signup_ts_us": sts,
            "converted": conv.astype(bool),
        })

    return (
        events.select("event_id", "user_id", "event_type",
                      F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=("event_id long, user_id long, ts_us long, "
                              "signup_ts_us long, converted boolean"),
            stateStructType="sig_ts long, sig_ce long, ce long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def scd2_changes_stream(events: DataFrame) -> DataFrame:
    """C35c streaming twin (incremental change capture): the SCD Type-2
    history maintained from a live change stream. State per user is just
    (last attribute value, versions emitted) — the lag() carry of the
    batch form made explicit — so each micro-batch emits exactly the NEW
    version-open rows its events introduce, in append mode (history rows
    are immutable facts once opened; closing them is a read-side lead()
    — operators/relational.stitch-on-read via stitch_versions — so the
    sink never updates in place, the same append-only discipline a
    warehouse SCD2 loader uses).

    With availableNow replay of a time-ordered log (batches split on
    time boundaries), stitch_versions(stream output) equals the batch
    scd2_history row-for-row — pinned across a REAL 4-batch split in
    tests/test_streaming.py. Same cross-batch ordering caveat as every
    stateful twin for live out-of-order feeds."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        last_type, n_versions = \
            state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts_us", "event_id"])
        # Vectorized run detection: after any non-change row the carry
        # equals that row's type, so "differs from the carry" is just
        # "differs from the previous row" (the first row compares to
        # the carried state) — the same shift trick as the batch lag().
        et = rows["event_type"].to_numpy()
        n = len(rows)
        prev = np.concatenate(([last_type], et[:-1])) if n else et
        change = et != prev
        idx = np.flatnonzero(change)
        versions = int(n_versions) + np.arange(1, len(idx) + 1)
        if n:
            last_type = str(et[-1])
            n_versions = int(n_versions) + len(idx)
        state.update((last_type, n_versions))
        yield pd.DataFrame({
            "user_id": pd.array(np.full(len(idx), key[0]), dtype="Int64"),
            "attr": pd.array(et[idx], dtype="string"),
            "effective_from_us": pd.array(
                rows["ts_us"].to_numpy(np.int64)[idx], dtype="Int64"),
            "version": pd.array(versions, dtype="Int32"),
        })

    return (
        events.select("user_id", "event_id", "event_type",
                      F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=("user_id long, attr string, "
                              "effective_from_us long, version int"),
            stateStructType="last_type string, n_versions int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stitch_versions(changes: DataFrame) -> DataFrame:
    """Read-side range stitching for the append-only SCD2 change log:
    close each version with the next version's start (lead over the
    ≤versions-per-user frame — change rows only, never the event log),
    mark the open range current. stitch(changes_stream) ≡ batch
    scd2_history — the split that lets the streaming sink stay
    append-only."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    return (changes.select(
        "user_id", "attr", "effective_from_us",
        F.lead("effective_from_us").over(w).alias("effective_to_us"),
        "version")
        .withColumn("is_current", F.col("effective_to_us").isNull()))


def zscore_anomaly_stream(events: DataFrame, window: int = 20,
                          z_thresh: float = 3.0) -> DataFrame:
    """C33h streaming twin: rolling z-score anomaly detection as a keyed
    state machine — per event_type the state is the ring of the last
    window-1 milli-quantized values (the exact trailing frame the batch
    operator reads through its ROWS window), so each micro-batch scores
    its events against the same 20-observation integer sums and the
    flagged set equals the batch form row-for-row under time-ordered
    availableNow replay.

    State is (window-1) longs per event_type — bounded by type
    cardinality × window, never by stream length. All arithmetic matches
    the batch operator bit-for-bit: exact integer Σm/Σm², then
    divide/sqrt (correctly-rounded IEEE ops identical in Python floats
    and JVM doubles); the final 6dp rounding happens JVM-side AFTER the
    handler so batch and stream round identically."""
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        ring = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts", "event_id"])
        # Vectorized trailing frames: concat(ring, batch millis), then
        # every length-`window` sliding frame's Σm and Σm² in one shot
        # (per-frame 20-element sums — partials never exceed
        # window·max(m²), so no cumsum overflow) with the identical
        # IEEE expression tree as the scalar loop: int-exact sums →
        # float64 divide/sqrt in the same order.
        vals = rows["value"].to_numpy(np.float64)
        m = np.floor(vals * 1000.0 + 0.5).astype(np.int64)
        arr = np.concatenate((np.asarray(ring, dtype=np.int64), m))
        out = pd.DataFrame({"event_type": pd.array([], dtype="string"),
                            "event_id": pd.array([], dtype="Int64"),
                            "value": pd.array([], dtype="float64"),
                            "z": pd.array([], dtype="float64")})
        if len(arr) >= window:
            frames = np.lib.stride_tricks.sliding_window_view(arr, window)
            s1 = frames.sum(axis=1).astype(np.float64)
            s2 = (frames * frames).sum(axis=1).astype(np.float64)
            n = float(window)
            var = (s2 - s1 * s1 / n) / (n - 1.0)
            # frame ending at batch row i lives at window position
            # len(ring)+i-(window-1); only full frames score
            first_scored = max(window - 1 - len(ring), 0)
            bpos = np.arange(first_scored, len(m))
            fpos = len(ring) + bpos - (window - 1)
            v_, s1_, last = var[fpos], s1[fpos], m[bpos].astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                z = (last - s1_ / n) / np.sqrt(v_)
            keep = (v_ > 0) & (np.abs(z) > z_thresh)
            out = pd.DataFrame({
                "event_type": pd.array(
                    np.full(int(keep.sum()), key[0]), dtype="string"),
                "event_id": pd.array(
                    rows["event_id"].to_numpy(np.int64)[bpos][keep],
                    dtype="Int64"),
                "value": vals[bpos][keep],
                "z": z[keep],
            })
        ring = [int(v) for v in arr[-(window - 1):]]
        state.update((ring,))
        yield out

    scored = (
        events.select("event_type", "event_id", "ts", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=("event_type string, event_id long, "
                              "value double, z double"),
            stateStructType="ring array<bigint>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return scored.withColumn("z", F.round("z", 6))


def rate_throttle_stream(events: DataFrame, limit: int = 5) -> DataFrame:
    """C34i streaming twin: the per-(user, hour) rate cap as a keyed
    state machine. State per user is ONE (hour_us, count) pair — when a
    row's hour matches the open hour the count advances, a new hour
    resets it — so state is O(#keys) regardless of stream length and
    hour rollover is the natural GC (no timers needed under time-ordered
    replay). Arithmetic is integer-only (epoch-micro floor to hour), so
    the admitted set equals the batch ranking window row-for-row; the
    c34_throttle oracle checks both rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        hour0, cnt = state.get if state.exists else (-1, 0)
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts", "event_id"])
        # normalize to ns first: Arrow may hand the column over at ns OR
        # us resolution, and a bare int64 view of datetime64[us] would
        # silently change units
        us = rows["ts"].astype("datetime64[ns]").astype("int64") \
            .to_numpy() // 1000
        hour_us = us - us % 3_600_000_000
        # vectorized within-batch sequence: cumcount inside each
        # contiguous hour run (rows are time-sorted, so equal hours are
        # adjacent), plus the carried-in count if the first run
        # continues the state's open hour
        new_run = np.concatenate(([True], hour_us[1:] != hour_us[:-1]))
        run_id = np.cumsum(new_run)
        idx = np.arange(len(hour_us))
        run_start = idx[new_run][run_id - 1]
        seq = idx - run_start + 1
        if len(hour_us) and hour_us[0] == hour0:
            seq[run_id == 1] += cnt
        if len(hour_us):
            hour0 = int(hour_us[-1])
            cnt = int(seq[-1])
        state.update((hour0, cnt))
        yield pd.DataFrame({
            "event_id": rows["event_id"].to_numpy(),
            "user_id": np.full(len(hour_us), int(key[0]), dtype="int64"),
            "hour_us": hour_us,
            "seq": seq.astype("int32"),
            "admitted": seq <= limit})

    return (events
            .select("user_id", "event_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=("event_id long, user_id long, "
                                  "hour_us long, seq int, "
                                  "admitted boolean"),
                stateStructType="hour_us bigint, cnt bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def holt_stream(events: DataFrame) -> DataFrame:
    """C12f streaming twin: Holt level+trend smoothing as a keyed state
    machine — the state store carries exactly the (level, trend) pair
    (plus an init flag), so each micro-batch continues the recurrence
    where the previous one stopped. The same IEEE op sequence as the
    batch kernel (alpha = beta = 0.5: exact binary scalings + correctly-
    rounded adds) and doubles round-trip the state store losslessly, so
    the emitted series is bit-identical to the batch form under
    time-ordered availableNow replay; the c12_holt oracle checks both."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        lev, trd, started = state.get if state.exists \
            else (0.0, 0.0, False)
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts", "event_id"])
        x = rows["value"].to_numpy()
        n = len(x)
        levs = np.empty(n)
        trds = np.empty(n)
        for i in range(n):
            if not started:
                lev, trd, started = float(x[i]), 0.0, True
            else:
                l_new = 0.5 * x[i] + 0.5 * (lev + trd)
                trd = 0.5 * (l_new - lev) + 0.5 * trd
                lev = l_new
            levs[i], trds[i] = lev, trd
        state.update((float(lev), float(trd), started))
        yield pd.DataFrame({
            "user_id": np.full(n, int(key[0]), dtype="int64"),
            "event_id": rows["event_id"].to_numpy(),
            "level": levs, "trend": trds,
            "forecast": levs + trds})

    return (events
            .select("user_id", "event_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=("user_id long, event_id long, "
                                  "level double, trend double, "
                                  "forecast double"),
                stateStructType=("lev double, trd double, "
                                 "started boolean"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def drawdown_stream(events: DataFrame) -> DataFrame:
    """C12h streaming twin: running balance / running peak as a keyed
    state machine — the state store carries the (cum, peak) BIGINT pair
    so each micro-batch continues the sweep where the previous one
    stopped; every emitted row reports its cumulative balance, the peak
    so far, and the current drawdown. Pure integer arithmetic end to
    end (the batch row's discipline), so the per-event series — and any
    rollup of it — is exactly the batch result under time-ordered
    availableNow replay; the registered query reduces the emitted rows
    with the SAME oracle as the batch row. Handler is fully vectorized
    (cumsum + maximum.accumulate), no per-row Python."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        cum0, peak0, started = state.get if state.exists \
            else (0, 0, False)
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts", "event_id"])
        milli = np.floor(rows["value"].to_numpy() * 1000.0 + 0.5) \
            .astype("int64")
        inflow = rows["event_type"].isin(
            ("purchase", "signup", "view")).to_numpy()
        fl = np.where(inflow, milli, -milli)
        cum = cum0 + np.cumsum(fl)
        peak = np.maximum.accumulate(cum)
        if started:
            peak = np.maximum(peak, peak0)
        if len(cum):
            state.update((int(cum[-1]), int(peak[-1]), True))
        yield pd.DataFrame({
            "user_id": np.full(len(fl), int(key[0]), dtype="int64"),
            "event_id": rows["event_id"].to_numpy(),
            "flow_milli": fl,
            "cum_milli": cum,
            "peak_milli": peak,
            "dd_milli": peak - cum})

    return (events
            .select("user_id", "event_id", "ts", "event_type", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=("user_id long, event_id long, "
                                  "flow_milli long, cum_milli long, "
                                  "peak_milli long, dd_milli long"),
                stateStructType="cum bigint, peak bigint, started boolean",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def flatline_stream(events: DataFrame) -> DataFrame:
    """C33q streaming twin: the stuck-sensor run detector as a keyed
    state machine — the state store carries (last value, current run
    length) per type, so a run that straddles a micro-batch boundary
    keeps counting instead of restarting; each emitted row reports its
    run-start flag and its position in the run, and the registered
    query's rollup reproduces the batch aggregates under the SAME
    oracle. Handler fully vectorized: change flags, segment ids, and
    in-segment positions come from numpy cumsum/arange — no per-row
    Python."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        last_m, run_len, started = state.get if state.exists \
            else (0, 0, False)
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts", "event_id"])
        m = np.floor(rows["value"].to_numpy() * 1000.0 + 0.5) \
            .astype("int64")
        n = len(m)
        if n == 0:
            return
        chg = np.ones(n, dtype="int64")
        chg[1:] = (m[1:] != m[:-1]).astype("int64")
        if started and m[0] == last_m:
            chg[0] = 0
        seg = np.cumsum(chg)                     # run ids within batch
        idx = np.arange(n, dtype="int64")
        # first index of each row's segment
        first_idx = np.maximum.accumulate(np.where(chg == 1, idx, -1))
        pos = idx - np.where(first_idx >= 0, first_idx, 0) + 1
        if started and chg[0] == 0:
            carry_mask = seg == 0                # the continued run
            pos = pos + np.where(carry_mask, run_len, 0)
        state.update((int(m[-1]), int(pos[-1]), True))
        yield pd.DataFrame({
            "event_type": np.full(n, str(key[0]), dtype=object),
            "event_id": rows["event_id"].to_numpy(),
            "run_start": chg.astype("int32"),
            "run_len": pos})

    return (events
            .select("event_type", "event_id", "ts", "value")
            .groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType=("event_type string, event_id long, "
                                  "run_start int, run_len long"),
                stateStructType="last_m bigint, run_len bigint, "
                                "started boolean",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def interarrival_stream(events: DataFrame) -> DataFrame:
    """C34q streaming twin: per-user inter-arrival sufficient statistics
    as a keyed state machine — state is (last event time, gap count,
    Σgap_s, Σgap_s², max gap µs), all exact integers, so the emitted
    moments are the same numbers the batch aggregate produces and the
    read side can run the identical mean/CV expression tree
    (operators/event_time.interarrival_finalize). Each micro-batch
    emits the user's stats AFTER the batch; counts only grow, so the
    read side keeps the max-n emission per user.

    State is five longs per user — bounded by key cardinality. The
    batch's rows sort (ts, event_id) and the carried last_t bridges the
    batch boundary, so availableNow replay of a time-ordered log equals
    the batch operator exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        last_t, n, s1, s2, mx = \
            state.get if state.exists else (None, 0, 0, 0, 0)
        batch = pd.concat(list(pdfs))
        t = batch["t"].to_numpy(np.int64)
        eid = batch["event_id"].to_numpy(np.int64)
        srt = np.lexsort((eid, t))
        t = t[srt]
        seq = t if last_t is None else \
            np.concatenate(([np.int64(last_t)], t))
        gaps = np.diff(seq)
        if len(gaps):
            gs = gaps // 1_000_000
            n = int(n) + len(gaps)
            s1 = int(s1) + int(gs.sum())
            s2 = int(s2) + int((gs * gs).sum())
            mx = max(int(mx), int(gaps.max()))
        if len(t):
            last_t = int(t[-1])
        state.update((last_t, n, s1, s2, mx))
        yield pd.DataFrame({
            "user_id": pd.array([key[0]], dtype="Int64"),
            "n_gaps": pd.array([n], dtype="Int64"),
            "s1": pd.array([s1], dtype="Int64"),
            "s2": pd.array([s2], dtype="Int64"),
            "max_gap_us": pd.array([mx], dtype="Int64"),
        })

    return (
        events.select("user_id", F.unix_micros("ts").alias("t"),
                      "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=("user_id long, n_gaps long, s1 long, "
                              "s2 long, max_gap_us long"),
            stateStructType=("last_t long, n long, s1 long, s2 long, "
                             "mx long"),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def l28_bitmask_stream(rows: DataFrame) -> DataFrame:
    """C34s streaming twin: the per-user active-day SET as ONE BIGINT
    bitmask in the state store — bit i set when the user was active
    `i` days before the pinned anchor (offsets 0..27 are computed
    stream-side before the stateful op, so the handler is pure set
    union). Unlike the other nine twins' numeric sufficient stats,
    this state is a SET compressed to an integer — the
    distinct-within-window pattern (sliding-window distinct users,
    feature flags seen, coupon codes used) with state bounded at 8
    bytes/key no matter how many events arrive.

    Emissions are monotone (bits only turn on), so the read side folds
    all of a user's per-batch emissions with bit_or and gets exactly
    the final state; popcount then equals the batch distinct-day count
    and the histogram passes the SAME oracle as c34_l28."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        (mask0,) = state.get if state.exists else (0,)
        mask = int(mask0)
        batch = pd.concat(list(pdfs))
        offs = batch["day_off"].to_numpy(np.int64)
        if len(offs):
            mask |= int(np.bitwise_or.reduce(np.int64(1) << offs))
        state.update((mask,))
        yield pd.DataFrame({
            "user_id": pd.array([key[0]], dtype="Int64"),
            "mask": pd.array([mask], dtype="Int64")})

    return (rows.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType="user_id long, mask long",
                stateStructType="mask bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def cdc_state_stream(ops: DataFrame) -> DataFrame:
    """C35o streaming twin: the KTable fold as a keyed state machine —
    the LIVE form of changelog materialization, which is the reference's
    own runtime semantic (a consumer tailing a compacted topic maintains
    exactly this per-key last-op state; Kafka Streams' KTable). Input is
    the pre-projected op log (user_id, event_id, ts_us, op, vm); state
    per key is the five-field snapshot (last op, last value, last ts,
    op/delete counters) — constant bytes per key at ANY event volume.
    Each micro-batch folds its ops in (ts_us, event_id) order onto the
    carried state and emits the key's state-so-far snapshot in append
    mode (immutable "state after batch k" facts); n_ops is strictly
    monotone per key, so the read side recovers the FINAL state as the
    per-key argmax by n_ops (the l28 monotone-emission discipline) and
    applies the tombstone filter there. For survivors resurrected ≡
    n_deletes > 0 (an op after the last delete must exist when the last
    op isn't the delete), so the read side derives it exactly.

    Same cross-batch ordering caveat as every stateful twin: replay
    assumes time-sliced batches; a live out-of-order feed needs the
    watermark-sorted front the C25 row carries."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        last_op, last_vm, last_ts, n_ops, n_del = \
            state.get if state.exists else ("", 0, 0, 0, 0)
        rows = pd.concat(list(pdfs), ignore_index=True) \
            .sort_values(["ts_us", "event_id"])
        n = len(rows)
        if n:
            last = rows.iloc[-1]
            last_op = str(last["op"])
            last_vm = int(last["vm"])
            last_ts = int(last["ts_us"])
            n_ops = int(n_ops) + n
            n_del = int(n_del) + int((rows["op"] == "D").sum())
        state.update((last_op, last_vm, last_ts, int(n_ops), int(n_del)))
        yield pd.DataFrame({
            "user_id": pd.array([key[0]], dtype="Int64"),
            "last_op": pd.array([last_op], dtype="string"),
            "last_value_milli": pd.array([last_vm], dtype="Int64"),
            "last_ts_us": pd.array([last_ts], dtype="Int64"),
            "n_ops": pd.array([n_ops], dtype="Int64"),
            "n_deletes": pd.array([n_del], dtype="Int64"),
        })

    return (ops.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=(
                    "user_id long, last_op string, last_value_milli "
                    "long, last_ts_us long, n_ops long, n_deletes long"),
                stateStructType=("last_op string, last_vm long, "
                                 "last_ts long, n_ops long, n_del long"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))


def daily_counts_stream(rows: DataFrame) -> DataFrame:
    """C34 addendum (round 13) streaming twin core: per-(event_type,
    day) event counting as a keyed running counter in the state store —
    the KTable-count shape (the reference's most basic stateful
    consumer: a compacted count per key) keyed on the (type, day) grid
    so a calendar day whose rows straddle micro-batch boundaries
    accumulates across them instead of double-counting. State is ONE
    BIGINT per key; emissions are the cumulative count-so-far, strictly
    monotone, so the read side recovers the final per-day counts as a
    per-key max (the l28 monotone-emission discipline) and feeds the
    SAME burst census + oracle as the batch c34_bursts."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        (cnt0,) = state.get if state.exists else (0,)
        cnt = int(cnt0) + sum(len(pdf) for pdf in pdfs)
        state.update((cnt,))
        yield pd.DataFrame({
            "event_type": [key[0]],
            "day": [key[1]],
            "cnt": pd.array([cnt], dtype="Int64")})

    return (rows.groupBy("event_type", "day")
            .applyInPandasWithState(
                update,
                outputStructType="event_type string, day date, cnt long",
                stateStructType="cnt bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def last_seen_stream(rows: DataFrame) -> DataFrame:
    """C34 addendum (round 13) streaming twin core: per-user LAST-SEEN
    day as a keyed max fold in the state store — the TTL/presence shape
    (session liveness, heartbeat freshness, GDPR inactivity clocks)
    beside l28's set-bitmask and the burst twin's counter. Input rows
    carry (user_id, day_off INT — days since epoch, computed
    stream-side); state is ONE BIGINT max per key; emissions are the
    max-so-far, strictly monotone, so the read side recovers the final
    last-seen day as a per-key max (the l28 discipline) and feeds the
    SAME absence-bucket rollup + oracle as the batch c34_absence."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        (mx0,) = state.get if state.exists else (-1,)
        mx = int(mx0)
        for pdf in pdfs:
            if len(pdf):
                mx = max(mx, int(pdf["day_off"].max()))
        state.update((mx,))
        yield pd.DataFrame({
            "user_id": pd.array([key[0]], dtype="Int64"),
            "day_off": pd.array([mx], dtype="Int64")})

    return (rows.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType="user_id long, day_off long",
                stateStructType="day_off bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def user_daily_counts_stream(rows: DataFrame) -> DataFrame:
    """C13 addendum (round 14) streaming twin core: the per-user DAILY
    ACTIVITY HISTOGRAM as keyed array state — two parallel arrays
    (day offsets, counts) per user, merged batch-vectorized (one pandas
    value_counts per key per batch), feeding the decayed-top-k read
    side (decay weights depend only on the DAY, so per-day counts are
    the exact sufficient statistic for the dyadic-decay score). Keying
    on the USER — not the (user, day) grid — keeps the state-store key
    count at |users| (the grid form costs days× more keys, which the
    10× probe showed dominating wall time in per-key Python overhead);
    the array length is bounded by the corpus day span, not by events.

    Input rows carry (user_id, day_off INT — days since epoch, computed
    stream-side). Emissions are the full histogram-so-far plus its
    strictly monotone total; the read side selects each user's final
    emission with ONE max_by, explodes the bounded arrays, and feeds
    the SAME scoring rollup + oracle as the batch c13_decay_topk."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        if state.exists:
            days0, cnts0 = state.get
            acc = dict(zip(days0, cnts0))
        else:
            acc = {}
        batch = pd.concat(list(pdfs))
        for d, c in batch["day_off"].value_counts().items():
            acc[int(d)] = acc.get(int(d), 0) + int(c)
        days = sorted(acc)
        cnts = [acc[d] for d in days]
        state.update((days, cnts))
        yield pd.DataFrame({
            "user_id": pd.array([key[0]], dtype="Int64"),
            "days": [days],
            "cnts": [cnts],
            "total": pd.array([sum(cnts)], dtype="Int64")})

    return (rows.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=("user_id long, days array<int>, "
                                  "cnts array<long>, total long"),
                stateStructType="days array<int>, cnts array<bigint>",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def _sweep_batch(ends: list, peak: int, peak_t: int, n: int, busy: int,
                 items) -> tuple:
    """Pure heap-sweep kernel shared by peak_concurrency_stream and its
    unit tests: fold one micro-batch of (t, dur_us) interval starts —
    already sorted by (t, event_id) — into the carried state. Lazy pops
    close every interval ending at or before the incoming start
    (half-open: an end AT t closes before the open at t), matching the
    batch sweep's (t, delta, event_id) boundary order exactly."""
    import bisect

    for t, dur in items:
        t, dur = int(t), int(dur)
        # input contract (r12 ADVICE): durations are non-negative — a
        # negative dur would place the batch sweep's −1 boundary BEFORE
        # its own start, a shape the lazy-pop heap cannot replay; fail
        # loudly here instead of as a stream-only hash mismatch
        if dur < 0:
            raise ValueError(f"negative interval duration {dur} at t={t}")
        lo = bisect.bisect_right(ends, t)
        del ends[:lo]
        n += 1
        busy += dur
        # a zero-length interval nets to 0 in the batch sweep (its −1
        # sorts before its own +1 at the same instant), so it never
        # joins the heap and never sets a peak
        if dur > 0:
            bisect.insort(ends, t + dur)
            if len(ends) > peak:
                peak, peak_t = len(ends), t
    return ends, peak, peak_t, n, busy


def peak_concurrency_stream(rows: DataFrame) -> DataFrame:
    """C34x (round 14) streaming twin: the sweep line as KEYED HEAP
    STATE — open interval end-times ride the state store as a sorted
    array, closed ends pop as event time advances, and the peak is
    checked at every interval start (a peak can only be attained at a
    start, so processing starts in time order with lazy pops replays
    the batch sweep exactly, including the half-open close-before-open
    rule at equal instants). A new state SHAPE beside the counters,
    bitmasks, and snapshot structs the other twins carry: the state is
    a bounded PRIORITY QUEUE — bounded by the true concurrency, the
    quantity under measurement, never by event count.

    Input rows carry (event_type, event_id, t epoch-micros, dur_us);
    micro-batches arrive in event-time order (the availableNow time
    slices), and rows are re-sorted by (t, event_id) inside each batch,
    so cross-batch ordering holds end to end. Emissions per batch are
    the running (n_intervals, peak, first_peak_us, busy) — n_intervals
    strictly monotone, so the read side selects each key's final
    emission with ONE max_by and feeds the SAME rollup + oracle as the
    batch c34_peak."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd
        if state.exists:
            ends_b, peak, peak_t, n, busy = state.get
            ends = list(ends_b) if ends_b is not None else []
        else:
            ends, peak, peak_t, n, busy = [], 0, -1, 0, 0
        batch = pd.concat(list(pdfs))
        batch = batch.sort_values(["t", "event_id"], kind="stable")
        ends, peak, peak_t, n, busy = _sweep_batch(
            ends, int(peak), int(peak_t), int(n), int(busy),
            zip(batch["t"].astype("int64"), batch["dur_us"].astype("int64")))
        state.update((ends, peak, peak_t, n, busy))
        yield pd.DataFrame({
            "event_type": [key[0]],
            "n_intervals": pd.array([n], dtype="Int64"),
            "peak": pd.array([peak], dtype="Int64"),
            "first_peak_us": pd.array([peak_t], dtype="Int64"),
            "busy_us": pd.array([busy], dtype="Int64")})

    return (rows.groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType=("event_type string, n_intervals long, "
                                  "peak long, first_peak_us long, "
                                  "busy_us long"),
                stateStructType=("ends array<bigint>, peak bigint, "
                                 "peak_t bigint, n bigint, busy bigint"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def sla_gap_stream(rows: DataFrame) -> DataFrame:
    """C16k (round 14, second tranche) streaming twin core: the
    gap-derived SLA ledger as keyed running stats — per event type the
    state carries (first_us, last_us, n_events, n_gaps, n_gaps_over,
    max_gap_us, downtime_us), seven BIGINTs folded per batch with ONE
    numpy diff over the batch's time-sorted timestamps plus the single
    carried boundary gap (last_us → first-of-batch). Because the
    availableNow slices arrive in event-time order, the carried
    boundary gap makes the stream's gap sequence IDENTICAL to the batch
    operator's sorted consecutive gaps, so the read side selects each
    key's final emission (strictly monotone n_events) and feeds the
    SAME availability rollup + oracle as the batch c16_sla."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    thr_us = 3600 * 1_000_000

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd
        if state.exists:
            first_us, last_us, n, n_gaps, n_over, max_gap, down = \
                (int(v) for v in state.get)
        else:
            first_us, last_us, n = -1, -1, 0
            n_gaps, n_over, max_gap, down = 0, 0, 0, 0
        batch = pd.concat(list(pdfs)).sort_values(["us", "event_id"],
                                                  kind="stable")
        us = batch["us"].to_numpy(np.int64)
        if len(us):
            gaps = np.diff(us)
            if n:  # carried boundary gap from the previous batch
                gaps = np.concatenate(([us[0] - last_us], gaps))
            else:
                first_us = int(us[0])
            n += len(us)
            last_us = int(us[-1])
            if len(gaps):
                n_gaps += len(gaps)
                over = gaps - thr_us
                pos = over > 0
                n_over += int(pos.sum())
                down += int(over[pos].sum())
                max_gap = max(max_gap, int(gaps.max()))
        state.update((first_us, last_us, n, n_gaps, n_over, max_gap,
                      down))
        yield pd.DataFrame({
            "event_type": [key[0]],
            "first_us": pd.array([first_us], dtype="Int64"),
            "last_us": pd.array([last_us], dtype="Int64"),
            "n_events": pd.array([n], dtype="Int64"),
            "n_gaps": pd.array([n_gaps], dtype="Int64"),
            "n_gaps_over": pd.array([n_over], dtype="Int64"),
            "max_gap_us": pd.array([max_gap], dtype="Int64"),
            "downtime_us": pd.array([down], dtype="Int64")})

    return (rows.groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType=("event_type string, first_us long, "
                                  "last_us long, n_events long, "
                                  "n_gaps long, n_gaps_over long, "
                                  "max_gap_us long, downtime_us long"),
                stateStructType=("first_us bigint, last_us bigint, "
                                 "n bigint, n_gaps bigint, "
                                 "n_over bigint, max_gap bigint, "
                                 "down bigint"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def tdigest_stream(rows: DataFrame) -> DataFrame:
    """C4t (round 14, second tranche) streaming twin core: a mergeable
    t-digest PER KEY as the state itself — the state store carries each
    event type's (centroid means, centroid weights) arrays, and every
    micro-batch folds in by the same sort-merge-compress the batch
    operator's partition merge runs (operators/relational.py:
    _tdigest_compress, δ=100). This is the property t-digests exist
    for: closure under merge means the stream's final digest answers
    the same quantile queries as a batch build, within the same rank
    error — certified by the read side's EARNED rank audit against the
    full batch table, not by comparing centroid layouts (which
    legitimately differ with merge order).

    State is ≤δ (double, int64) pairs per key — CONSTANT bytes per key
    regardless of stream length, the sketch-state shape (beside the
    counters, bitmasks, heaps, and snapshot structs of the other
    twins). Emissions carry the digest-so-far plus its strictly
    monotone count; the read side selects each key's final emission
    with ONE max_by."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        from kafka_streams_in_action_spark.operators.relational import (
            _tdigest_compress,
        )
        if state.exists:
            m0, w0 = state.get
            m0 = np.asarray(m0 or [], np.float64)
            w0 = np.asarray(w0 or [], np.int64)
        else:
            m0 = np.empty(0, np.float64)
            w0 = np.empty(0, np.int64)
        batch = pd.concat(list(pdfs))
        x = batch["x"].to_numpy(np.float64)
        m = np.concatenate([m0, x])
        w = np.concatenate([w0, np.ones(x.size, np.int64)])
        order = np.argsort(m, kind="stable")
        mm, ww = _tdigest_compress(m[order], w[order], 100)
        state.update((mm.tolist(), [int(v) for v in ww]))
        yield pd.DataFrame({
            "event_type": [key[0]],
            "means": [mm.tolist()],
            "weights": [[int(v) for v in ww]],
            "n": pd.array([int(ww.sum())], dtype="Int64")})

    return (rows.groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType=("event_type string, "
                                  "means array<double>, "
                                  "weights array<bigint>, n long"),
                stateStructType=("means array<double>, "
                                 "weights array<bigint>"),
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def ttl_presence_stream(rows: DataFrame, ttl_days: int = 2) -> DataFrame:
    """C27t (round 14, second tranche): keyed state with a REAL
    event-time TTL — the state-hygiene primitive a 100 TB streaming job
    lives or dies by: keys that go silent must leave the store, or
    unbounded key churn (users, sessions, request ids) grows state
    without bound. Per user the state is (n_events since state
    creation, last_ms); every data batch re-arms an event-time timeout
    at last_ms + ttl, and when the WATERMARK passes it with no new data
    the handler fires with `state.hasTimedOut`, emits the eviction
    record, and REMOVES the state — a later event recreates the key
    from zero (resurrection), exactly a session store's lifecycle.

    Uses GroupStateTimeout.EventTimeTimeout + withWatermark (the only
    twin exercising the timeout arm of the state API). The availableNow
    replay runs the 4 data batches PLUS a final no-data flush batch;
    the watermark in effect during batch k is the max event time of
    batches < k (delay 0), so evictions are deterministic given the
    deterministic time slices — the registered oracle replays this
    exact state machine (slices, watermarks, firings, resurrections)
    as a bounded recursive CTE over the user × batch grid.

    Timeout timestamps are always re-armed from in-order data, so the
    set timestamp exceeds the current watermark by construction (the
    time slices are globally ordered) — the IllegalArgumentException
    arm of setTimeoutTimestamp is unreachable here."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms = ttl_days * 86_400_000

    def update(key, pdfs, state):
        import pandas as pd
        if state.hasTimedOut:
            n, last_ms = (int(v) for v in state.get)
            state.remove()
            yield pd.DataFrame({
                "user_id": pd.array([key[0]], dtype="Int64"),
                "n_events": pd.array([n], dtype="Int64"),
                "last_ms": pd.array([last_ms], dtype="Int64"),
                "evicted": [True]})
            return
        if state.exists:
            n, last_ms = (int(v) for v in state.get)
        else:
            n, last_ms = 0, -1
        batch = pd.concat(list(pdfs))
        ms = batch["us"].astype("int64") // 1000
        n += len(batch)
        last_ms = max(last_ms, int(ms.max()))
        state.update((n, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
        yield pd.DataFrame({
            "user_id": pd.array([key[0]], dtype="Int64"),
            "n_events": pd.array([n], dtype="Int64"),
            "last_ms": pd.array([last_ms], dtype="Int64"),
            "evicted": [False]})

    return (rows.groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=("user_id long, n_events long, "
                                  "last_ms long, evicted boolean"),
                stateStructType="n bigint, last_ms bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def dedup_ids_stream(events: DataFrame,
                     watermark: str = "1 hour") -> DataFrame:
    """C26 streaming twin (round 16): watermark-bounded streaming
    deduplication via the built-in `dropDuplicatesWithinWatermark` —
    the at-least-once→exactly-once repair every Kafka-fed pipeline
    runs first (the reference replays records on rebalance/retry;
    reference behavior anchor: the consumer's at-least-once delivery,
    golang/chapter_4/sales/sales_consumer_client.go:41-55): the FIRST
    arrival of each event_id passes through and later copies are
    suppressed, with per-id state retained only within the watermark
    horizon — the property that makes streaming dedup viable at all
    (state tracks horizon × arrival rate, not stream length; batch
    dedup of an unbounded stream would need unbounded state).

    Determinism contract for the replay: duplicate copies carry the
    SAME event time as their original (retries do not re-stamp), so
    every copy is within ANY watermark delay of its first arrival and
    is always suppressed — the sink is exactly one row per distinct
    event_id, which is what the batch oracle checks row-for-row."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", "user_id", "event_type", "value"))
