"""Streaming wrapper tests: foreachBatch-driven cycles equal the batch-loop
golden trace; windowed/watermark aggregation over a file stream works."""

from frontier_engine.config import config_for_fixture
from frontier_engine.fixtures import FixtureConfig
from frontier_engine.golden import build_engine, diff_traces, ref_trace, spark_trace
from frontier_engine.refspec import read_fixture_rows, run
from frontier_engine.streaming import run_streaming_cycles, windowed_event_counts


def test_streaming_cycles_match_refspec(spark, tiny_fixture_dir, tmp_path_factory):
    fix = FixtureConfig(n_urls=2000)
    cfg = config_for_fixture(fix)
    work = str(tmp_path_factory.mktemp("engine-stream"))
    eng = build_engine(spark, tiny_fixture_dir, work, cfg)

    results = run_streaming_cycles(eng, n_cycles=2)
    assert [r.cycle for r in results] == [1, 2]

    st = spark_trace(spark, eng.io, range(1, 3))
    pages, seeds, robots = read_fixture_rows(tiny_fixture_dir)
    rt = ref_trace(run(pages, seeds, robots, cfg, cycles=2))
    assert diff_traces(st, rt) == []


def test_windowed_watermark_agg(spark, tmp_path_factory):
    import shutil

    src = str(tmp_path_factory.mktemp("events-src"))
    out = str(tmp_path_factory.mktemp("events-ckpt"))
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.limit(2000).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("winagg")
        .option("checkpointLocation", out)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(120)
    assert finished, "availableNow query did not finish in 120s"
    # append mode emits only watermark-closed windows: every emitted
    # (window, event_type) count must EQUAL the batch aggregation of the
    # same data, and the closed set must be non-trivial (the sf0.001
    # events span weeks, so nearly every 1h window sits past the final
    # 1h watermark). The old assertion here was `count() >= 0` — a
    # tautology that passed with the operator entirely broken.
    from pyspark.sql import functions as F

    batch_rows = {
        (r["start"], r["end"], r["event_type"]): r["n"]
        for r in spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w.start", "w.end", "event_type", "n")
        .collect()
    }
    got = spark.sql("select * from winagg").collect()
    assert len(got) > 0, "no window ever closed — watermark inert"
    for r in got:
        key = (r["start"], r["end"], r["event_type"])
        assert batch_rows.get(key) == r["n"], (key, r["n"])
    # closed windows cover most of the batch windows (all but the
    # final watermark's worth can close)
    assert len(got) >= len(batch_rows) // 2, (len(got), len(batch_rows))
    shutil.rmtree(src, ignore_errors=True)


def test_stateful_host_sessions(spark, tmp_path_factory):
    """applyInPandasWithState sessionization: closed sessions emitted across
    micro-batch boundaries must equal a pure-Python sessionization of the
    full feed (open trailing sessions stay in state)."""
    import os
    from datetime import datetime, timedelta

    from frontier_engine.streaming import sessionize_hosts

    src = str(tmp_path_factory.mktemp("frontier-feed"))
    ckpt = str(tmp_path_factory.mktemp("sessions-ckpt"))
    t0 = datetime(2024, 1, 1)

    # two files -> two micro-batches (maxFilesPerTrigger=1); host 'a' has a
    # session SPANNING the batch boundary (gap 10min < 1h), then a >1h gap
    rows1 = [
        ("a", t0), ("a", t0 + timedelta(minutes=5)),
        ("b", t0), ("b", t0 + timedelta(hours=3)),
    ]
    rows2 = [
        ("a", t0 + timedelta(minutes=15)),            # merges into a's open session
        ("a", t0 + timedelta(hours=5)),               # closes it (gap > 1h)
        ("b", t0 + timedelta(hours=3, minutes=30)),   # continues b's 2nd session
        ("c", t0 + timedelta(hours=1)),
        ("c", t0 + timedelta(hours=4)),               # closes c's 1st session
    ]
    schema = "host string, discovered_ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        os.path.join(src, "f1")
    )
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        os.path.join(src, "f2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = (
        sessionize_hosts(stream, gap_seconds=3600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("host_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["host"], r["session_start"], r["session_end"], r["n_urls"])
        for r in spark.sql("select * from host_sessions").collect()
    )

    # pure-Python twin over the union, dropping open trailing sessions
    feed: dict = {}
    for h, ts in rows1 + rows2:
        feed.setdefault(h, []).append(ts)
    want = []
    for h, tss in feed.items():
        tss.sort()
        start = last = tss[0]
        n = 1
        for t in tss[1:]:
            if (t - last).total_seconds() > 3600:
                want.append((h, start, last, n))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        # trailing session stays open (in state), not emitted
    assert got == sorted(want), (got, sorted(want))
    assert len(got) >= 3  # a, b and c each closed at least one session


def test_fold_sessions_late_event_clamps_state():
    """A late event arriving in a later micro-batch (before the carried
    state's bounds) must not move the open session's `last` BACKWARD —
    that falsely split the session at the next on-time event and emitted a
    regressed session_end. Late events clamp into the open session's
    bounds instead."""
    from frontier_engine.streaming import fold_sessions

    gap = 3600 * 1_000_000  # 1h in micros
    H = 3600 * 1_000_000

    # batch 1: 09:00 and 10:00 -> one open session (9h, 10h, 2)
    closed, st = fold_sessions([9 * H, 10 * H], None, gap)
    assert closed == [] and st == (9 * H, 10 * H, 2)

    # batch 2: LATE event 09:59 — joins the open session, `last` stays 10:00
    closed, st = fold_sessions([9 * H + 59 * 60 * 1_000_000], st, gap)
    assert closed == [] and st == (9 * H, 10 * H, 3)

    # batch 3: 10:59:30 — within 1h of the true last (10:00): session
    # continues (pre-fix, last had regressed to 09:59 and this event
    # falsely closed it with session_end 09:59)
    t4 = 10 * H + 59 * 60 * 1_000_000 + 30 * 1_000_000
    closed, st = fold_sessions([t4], st, gap)
    assert closed == []
    assert st == (9 * H, t4, 4)

    # a late event BEFORE the session start extends the start backward
    closed, st = fold_sessions([9 * H - 30 * 1_000_000], st, gap)
    assert closed == [] and st[0] == 9 * H - 30 * 1_000_000 and st[1] == t4

    # a genuinely out-of-session event still closes it
    t5 = t4 + gap + 1
    closed, st = fold_sessions([t5], st, gap)
    assert closed == [(9 * H - 30 * 1_000_000, t4, 5)]
    assert st == (t5, t5, 1)


def test_fold_sessions_very_late_event_is_own_earlier_session():
    """A late event older than start - gap must NOT merge into the open
    session (event-time gap semantics would treat it as a separate earlier
    session): it is emitted closed immediately, and a RUN of such events
    within gap of each other folds into ONE earlier session. The open
    session is untouched in both cases."""
    from frontier_engine.streaming import fold_sessions

    H = 3600 * 1_000_000
    gap = H

    # open session (9h, 10h, 2)
    closed, st = fold_sessions([9 * H, 10 * H], None, gap)
    assert closed == [] and st == (9 * H, 10 * H, 2)

    # one very-late event at 06:00 (> 1h before 09:00): its own session
    closed, st = fold_sessions([6 * H], st, gap)
    assert closed == [(6 * H, 6 * H, 1)]
    assert st == (9 * H, 10 * H, 2)  # open session untouched

    # a run of very-late events 04:00, 04:30, 05:00 = ONE earlier session;
    # 08:30 (within gap of start) still merges backwards into the open one
    ts = [4 * H, 4 * H + H // 2, 5 * H, 8 * H + H // 2]
    closed, st = fold_sessions(ts, st, gap)
    assert closed == [(4 * H, 5 * H, 3)]
    assert st == (8 * H + H // 2, 10 * H, 3)

    # two very-late CLUSTERS separated by more than gap = two sessions
    closed, st = fold_sessions([1 * H, 3 * H], st, gap)
    assert closed == [(1 * H, 1 * H, 1), (3 * H, 3 * H, 1)]
    assert st == (8 * H + H // 2, 10 * H, 3)


def test_fold_sessions_bridge_event_merges_pending_early_run():
    """A very-late event beyond start - gap plus a SECOND event that
    chains both (within gap of the late event AND of the open start) is
    ONE session under event-time gap semantics: the early run must merge
    into the open session via the bridge, not close separately."""
    from frontier_engine.streaming import fold_sessions

    gap = 10

    # open session (100, 110, 2)
    closed, st = fold_sessions([100, 110], None, gap)
    assert closed == [] and st == (100, 110, 2)

    # 85 is very late (100 - 85 > gap); 92 bridges (92-85 <= gap and
    # 100-92 <= gap): oracle fold of {85, 92, 100, 110} is ONE session
    closed, st = fold_sessions([85, 92], st, gap)
    assert closed == []
    assert st == (85, 110, 4)

    # but only the LAST early run can bridge: a run at 60..65 stays its
    # own session even when 85's run later bridges (65 -> 85 gap > 10)
    closed, st = fold_sessions([200], None, gap)
    assert st == (200, 200, 1)
    closed, st = fold_sessions([160, 165, 185, 192], st, gap)
    assert closed == [(160, 165, 2)]
    assert st == (185, 200, 3)

    # and with no bridge, the pending run still closes (end-of-batch path)
    closed, st = fold_sessions([300], None, gap)
    closed, st = fold_sessions([260, 265], st, gap)
    assert closed == [(260, 265, 2)]
    assert st == (300, 300, 1)

    # pending run also flushes when the open session itself closes
    closed, st = fold_sessions([400], None, gap)
    closed, st = fold_sessions([360, 460], st, gap)
    assert closed == [(360, 360, 1), (400, 400, 1)]
    assert st == (460, 460, 1)


def test_fold_sessions_fuzz_late_batch_exactness():
    """Oracle-equality under lateness confined to the open regime: run a
    first batch, then a second batch whose every event lands strictly
    more than gap after the last session CLOSED by batch 1 (so no event
    belongs to an already-emitted session — the documented exactness
    bound). The two-batch fold must then equal the batch-free oracle over
    the union, bridges included."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from frontier_engine.streaming import fold_sessions

    @settings(max_examples=300, deadline=None)
    @given(
        a=st.lists(st.integers(0, 10**6), min_size=1, max_size=40),
        b=st.lists(st.integers(0, 10**6), min_size=0, max_size=40),
        gap=st.integers(1, 10**5),
    )
    def prop(a, b, gap):
        a = sorted(a)
        c1, state = fold_sessions(a, None, gap)
        floor = (c1[-1][1] + gap + 1) if c1 else 0
        b = sorted(t for t in b if t >= floor)
        c2, state = fold_sessions(b, state, gap)
        closed_all = c1 + c2
        if state is not None:
            closed_all.append(state)
        assert closed_all == _exact_sessions(sorted(a + b), gap)

    prop()


# ---------------------------------------------------------------------------
# fold_sessions fuzz: the fixed-case tests above pin the documented
# behaviors; these pin the semantics over the whole input space.


def _exact_sessions(ts_sorted, gap_us):
    """Batch-free event-time gap sessionization (the semantics
    fold_sessions must reproduce whenever no event arrives late)."""
    out = []
    for t in ts_sorted:
        if out and t - out[-1][1] <= gap_us:
            s, l, n = out[-1]
            out[-1] = (s, max(l, t), n + 1)
        else:
            out.append((t, t, 1))
    return out


def test_fold_sessions_fuzz_in_order_split_invariance():
    """Delivered IN ORDER (no late events), the fold must equal exact
    event-time sessionization regardless of how the stream is cut into
    micro-batches — the batch boundaries are an implementation artifact
    and must never show in the output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from frontier_engine.streaming import fold_sessions

    @settings(max_examples=300, deadline=None)
    @given(
        ts=st.lists(st.integers(0, 10**8), min_size=0, max_size=60),
        gap=st.integers(1, 10**7),
        cuts=st.lists(st.integers(0, 60), max_size=6),
    )
    def prop(ts, gap, cuts):
        ts = sorted(ts)
        bounds = sorted({c for c in cuts if c < len(ts)}) + [len(ts)]
        closed_all, state = [], None
        lo = 0
        for hi in bounds:
            closed, state = fold_sessions(ts[lo:hi], state, gap)
            closed_all.extend(closed)
            lo = hi
        if state is not None:
            closed_all.append(state)
        assert closed_all == _exact_sessions(ts, gap)

    prop()


def test_fold_sessions_fuzz_lateness_invariants():
    """Under ARBITRARY cross-batch lateness (any partition of the events
    into batches, each batch sorted, as applyInPandasWithState delivers
    them) the fold must still: conserve the event count, emit only
    well-formed sessions (start <= last, n >= 1, span <= (n-1)*gap —
    every event chains within gap of its session), and never let an
    event older than start - gap disturb the open session."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from frontier_engine.streaming import fold_sessions

    @settings(max_examples=300, deadline=None)
    @given(
        events=st.lists(
            st.tuples(st.integers(0, 10**8), st.integers(0, 5)),
            min_size=0,
            max_size=60,
        ),
        gap=st.integers(1, 10**7),
    )
    def prop(events, gap):
        batches: dict = {}
        for t, b in events:
            batches.setdefault(b, []).append(t)
        closed_all, state = [], None
        for b in sorted(batches):
            ts = sorted(batches[b])
            prev = state
            closed, state = fold_sessions(ts, state, gap)
            closed_all.extend(closed)
            if prev is not None and all(prev[0] - t > gap for t in ts):
                # every event in this batch predates the open session by
                # more than gap: the open session must be untouched
                assert state == prev
        total = sum(n for _s, _l, n in closed_all)
        if state is not None:
            total += state[2]
        assert total == len(events)
        for s, l, n in closed_all + ([state] if state else []):
            assert s <= l and n >= 1
            assert (n > 1) or (s == l)
            assert l - s <= (n - 1) * gap

    prop()
