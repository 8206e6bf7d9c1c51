"""Structured-Streaming wrapper: the reference's ``run_always`` daemon loop
(container_crawler/__init__.py Crawler.run_always ≈L405 — run_once, sleep
``interval`` minus elapsed, repeat) re-expressed as a streaming query whose
micro-batch trigger drives ``run_cycle`` via ``foreachBatch``.

The frontier tables are the real state (snapshot-committed, resumable), so
the streaming source only provides the heartbeat — a ``rate`` source at one
row per trigger. Stopping and restarting the stream resumes exactly where
the manifests left off, the same crash-safety contract as the batch loop.

Also provides the windowed/watermark streaming aggregation shape over an
events stream (late-data-tolerant lineage rollup) for completeness of the
streaming operator surface.
"""

from __future__ import annotations

import threading


def run_streaming_cycles(
    eng, n_cycles: int, processing_time: str = "0 seconds", timeout_sec: int = 600
):
    """Drive ``n_cycles`` crawl cycles from a streaming heartbeat.

    Returns the list of CycleResult. The heartbeat is a rate-source
    micro-batch; each batch advances the frontier by exactly one committed
    cycle (idempotent: a replayed batch re-runs resume logic, which reads
    latest_cycle() and continues after it)."""
    results = []
    done = threading.Event()

    def one_cycle(batch_df, batch_id):
        if done.is_set():
            return
        cycle = eng.io.latest_cycle() + 1
        results.append(eng.run_cycle(cycle))
        if len(results) >= n_cycles:
            done.set()

    q = (
        eng.spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.trigger(processingTime=processing_time)
        .foreachBatch(one_cycle)
        .start()
    )
    try:
        import time

        t0 = time.time()
        # also break when the query itself dies (a run_cycle exception
        # inside foreachBatch terminates it immediately) — otherwise this
        # loop sleeps out the full timeout before awaitTermination
        # resurfaces the real error
        while (
            not done.is_set()
            and q.isActive
            and time.time() - t0 < timeout_sec
        ):
            time.sleep(0.25)
    finally:
        q.stop()
        q.awaitTermination(30)
    return results


def fold_sessions(ts, state, gap_us):
    """Pure per-host session fold: ``ts`` (sorted epoch-micros of one
    micro-batch), carried ``state`` (start, last, n) or None -> (closed
    sessions [(start, last, n), ...], new state). Module-level so the
    late-event semantics are unit-testable outside a streaming query.

    ts is sorted within a batch, but a LATE event in a later micro-batch
    can land before the carried state's bounds. Three cases:
    - t within [start, last]: joins the open session (n += 1);
    - start - gap_us <= t < start: extends the open session's start
      backwards (gap semantics WOULD have merged them — the distance to
      the session is <= gap);
    - t < start - gap_us: a separate EARLIER session — UNLESS a later
      event in the same batch lands between them and bridges the chain
      (each link <= gap). Such events are folded among THEMSELVES (a run
      of late events within gap of each other is ONE earlier session);
      runs before the last close immediately, and the LAST run stays
      pending: if an in-gap event later pulls the open session's start
      back to within gap of the run's last event, gap semantics make them
      ONE session, so the run merges instead of closing. At most one run
      can ever bridge — the open start never drops below the pending
      run's own start (every remaining t >= original start - gap, which
      exceeds the previous run's last). Exactness bound: like any
      gap-based streaming sessionizer, events arriving after their
      session was already CLOSED and emitted (beyond the retained open
      state) cannot reopen it — including a cross-BATCH bridge, whose
      early side was emitted a batch ago."""
    start, last, n = state if state is not None else (None, 0, 0)
    closed = []
    pend = None  # last early-session run — may yet bridge into the open one
    i = 0
    if start is not None:
        ps = pl = None
        pn = 0
        while i < len(ts) and start - ts[i] > gap_us:
            t = ts[i]
            if ps is None:
                ps = pl = t
                pn = 1
            elif t - pl > gap_us:
                closed.append((ps, pl, pn))
                ps = pl = t
                pn = 1
            else:
                pl = t
                pn += 1
            i += 1
        if ps is not None:
            # start - pl > gap_us HERE, but a later in-gap event can still
            # pull start back to within gap of pl (a bridge) — keep pending
            pend = (ps, pl, pn)
    for t in ts[i:]:
        if start is None:
            start = last = t
            n = 1
        elif t - last > gap_us:
            if pend is not None:
                # the open start is final (ts ascending: no later event can
                # reach back past t) — the pending run never bridged
                closed.append(pend)
                pend = None
            closed.append((start, last, n))
            start = last = t
            n = 1
        else:
            if t > last:
                last = t
            elif t < start:
                start = t
                if pend is not None and start - pend[1] <= gap_us:
                    # bridged: start–t–pend.last now chains within gap
                    start = pend[0]
                    n += pend[2]
                    pend = None
            n += 1
    if pend is not None:
        closed.append(pend)
    return closed, (None if start is None else (start, last, n))


def sessionize_hosts(stream_df, gap_seconds: int = 3600):
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    gap-based per-host discovery sessions over a streaming frontier feed.

    A session is a maximal run of a host's discoveries with inter-arrival
    gaps <= ``gap_seconds``; closed sessions are emitted as
    (host, session_start, session_end, n_urls), the still-open trailing
    session is carried in GroupState across micro-batches (so sessions
    spanning batch boundaries merge — the part ``foreachBatch`` can't do).
    This is the engine's analog of per-container activity bursts in the
    reference's periodic sweeps (Crawler.run_always ≈L405), and the
    "applyInPandasWithState for custom stateful operators" surface the
    north-star brief names.

    Input columns: host STRING, discovered_ts TIMESTAMP.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    out_schema = (
        "host string, session_start timestamp, session_end timestamp, "
        "n_urls long"
    )
    state_schema = "start long, last long, n long"  # epoch micros

    def fn(key, pdfs, state):
        import pandas as pd

        host = key[0]
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(
                (pdf["discovered_ts"].astype("datetime64[us]").astype("int64"))
                .tolist()
            )
        ts.sort()
        closed, new_state = fold_sessions(
            ts, state.get if state.exists else None, gap_us
        )
        if new_state is not None:
            state.update(new_state)
        yield pd.DataFrame(
            {
                "host": [host] * len(closed),
                "session_start": pd.to_datetime(
                    [c[0] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [c[1] for c in closed], unit="us"
                ),
                "n_urls": [c[2] for c in closed],
            }
        )

    return stream_df.groupBy("host").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def windowed_event_counts(events_stream, watermark: str = "1 hour",
                          window: str = "1 hour"):
    """Late-data-tolerant tumbling-window aggregation over a streaming
    events table (watermark on the event-time column): the streaming shape
    of the engine's lineage rollups."""
    from pyspark.sql import functions as F

    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w.start", "w.end", "event_type", "n")
    )
