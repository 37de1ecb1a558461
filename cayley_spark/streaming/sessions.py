"""Sessionization — gap-based event sessions, batch and streaming.

The reference has no streaming surface (SURVEY.md §2.8); this extends
the engine the way a training-data pipeline needs: the same session
semantics as one declarative batch operator (window lag + running
sum — fully SQL-expressible, so the DuckDB oracle can verify it) and
as a custom STATEFUL streaming operator built on
``applyInPandasWithState`` (the Structured Streaming escape hatch for
operators the built-ins can't express).

Session semantics (both paths): events of one key, ordered by event
time, belong to one session while each gap to the previous event is
<= ``gap_seconds``; a larger gap closes the session and opens a new
one.

Scale notes: the batch path is two window functions plus one
aggregation — all hash-partitioned by the key, no driver involvement.
The streaming path keeps O(1) state per key (current session bounds +
count) in the state store; closed sessions are emitted as soon as the
closing event arrives, and Arrow moves each group's batch in one
block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    id_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str | None = None,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Batch sessionization. Returns one row per session:
    (id, session_start, session_end, n_events). ``order_col`` breaks
    ties among equal timestamps deterministically.

    ``bucket_seconds`` selects the TWO-PHASE form — the hot-entity
    scale path (SCALE.md round-13 audit): the default single window
    partitioned by the key serializes every event of one key into one
    sorted task, so a 10^7-event bot key becomes a straggler. With
    ``bucket_seconds`` set, phase 1 sessionizes per (key, time
    bucket) — no task ever holds more than one bucket of one key —
    and phase 2 gap-merges the per-bucket sessions with the same
    lag/running-sum shape over a frame bounded by the key's SESSION
    count (≤ its bucket count for dense keys — exactly the hot-key
    case), not its event count. Results are bit-identical to the
    single-phase form for any bucket size: within-bucket adjacent
    sessions are > gap apart by construction and never re-merge,
    cross-bucket adjacent sessions merge iff the inter-session event
    gap (next start − previous end) is within ``gap_seconds`` — the
    same predicate event-level sessionization applies to those two
    events (pinned by the equivalence property test and the driver
    oracle)."""
    from pyspark.sql.window import Window

    if bucket_seconds is not None:
        return _sessionize_bucketed(
            events, gap_seconds, id_col, ts_col, order_col,
            bucket_seconds,
        )
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(id_col).orderBy(*order)
    dtype = dict(events.dtypes).get(ts_col, "")
    if dtype.startswith("timestamp"):
        # timestamp-typed ts (incl. TIMESTAMP_NTZ, which cannot cast
        # to double): compare the lag difference as an interval —
        # timezone-free, works for both timestamp flavors. Built in
        # MILLISECONDS so fractional gap_seconds (e.g. 0.5) behave
        # identically to the numeric-column branch below.
        gap = F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
        over = gap > F.expr(
            f"INTERVAL {int(round(gap_seconds * 1000))} MILLISECONDS"
        )
    else:
        gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(
            w
        ).cast("double")
        over = gap > gap_seconds
    new_sess = F.when(gap.isNull() | over, F.lit(1)).otherwise(F.lit(0))
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("__sess", sess)
        .groupBy(id_col, "__sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sess")
    )


def _sessionize_bucketed(
    events: DataFrame,
    gap_seconds: float,
    id_col: str,
    ts_col: str,
    order_col: str | None,
    bucket_seconds: float,
) -> DataFrame:
    """Two-phase sessionize (see :func:`sessionize`). Phase 1 runs
    the standard lag + running-sum sessionization partitioned by
    (key, bucket); phase 2 merges adjacent per-bucket sessions whose
    inter-session gap is within ``gap_seconds``. The merge compares
    each session's start against the running MAX of preceding
    session ends (not plain lag), so it stays correct even for
    overlapping inputs — with time-monotone buckets overlaps cannot
    occur, but the max costs nothing and removes the assumption."""
    from pyspark.sql.window import Window

    dtype = dict(events.dtypes).get(ts_col, "")
    is_ts = dtype.startswith("timestamp")
    if is_ts:
        # window() buckets both TIMESTAMP flavors without a cast
        bucket = F.window(
            F.col(ts_col), f"{int(round(bucket_seconds * 1000))} milliseconds"
        ).start
    else:
        bucket = F.floor(
            F.col(ts_col).cast("double") / F.lit(float(bucket_seconds))
        )
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w1 = Window.partitionBy(id_col, "__bkt").orderBy(*order)
    if is_ts:
        gap1 = F.col(ts_col) - F.lag(F.col(ts_col)).over(w1)
        over1 = gap1 > F.expr(
            f"INTERVAL {int(round(gap_seconds * 1000))} MILLISECONDS"
        )
    else:
        gap1 = F.col(ts_col).cast("double") - F.lag(
            F.col(ts_col)
        ).over(w1).cast("double")
        over1 = gap1 > gap_seconds
    new1 = F.when(gap1.isNull() | over1, F.lit(1)).otherwise(F.lit(0))
    sess1 = F.sum(new1).over(
        w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    parts = (
        events.withColumn("__bkt", bucket)
        .withColumn("__sess", sess1)
        .groupBy(id_col, "__bkt", "__sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # phase 2: gap-merge the session rows per key. The frame is one
    # row per (key, bucket, within-bucket session) — for a hot key
    # with dense traffic that is ~one row per bucket, the bounded
    # dimension. Running max of preceding ends + the same
    # new-session/running-sum fold as phase 1.
    w2 = Window.partitionBy(id_col).orderBy(
        "session_start", "session_end"
    )
    prev_end = F.max("session_end").over(
        w2.rowsBetween(Window.unboundedPreceding, -1)
    )
    if is_ts:
        gap2 = F.col("session_start") - prev_end
        over2 = gap2 > F.expr(
            f"INTERVAL {int(round(gap_seconds * 1000))} MILLISECONDS"
        )
    else:
        gap2 = F.col("session_start").cast("double") - prev_end.cast(
            "double"
        )
        over2 = gap2 > gap_seconds
    new2 = F.when(gap2.isNull() | over2, F.lit(1)).otherwise(F.lit(0))
    sess2 = F.sum(new2).over(
        w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.withColumn("__fid", sess2)
        .groupBy(id_col, "__fid")
        .agg(
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("__fid")
    )


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming sessionization over a streaming DataFrame.

    Per-key state holds the OPEN session (start, end, count). Each
    micro-batch folds its events in timestamp order: an event within
    ``gap_seconds`` of the open session extends it (widening either
    bound, so cross-batch out-of-order arrivals within the gap match
    the batch result); a later event closes the session (emitted
    downstream) and opens a new one. Open sessions stay in the state
    store across batches.

    Documented limits vs the batch operator (both inherent to O(1)
    state per key):

    - an event older than ``start - gap_seconds`` of the OPEN session
      still merges into it — batch would emit it as a separate earlier
      session. Already-CLOSED sessions are never reopened either. If
      the source can be later than the open session's span, bound
      disorder upstream with ``withWatermark`` before sessionizing.
    - sessions close only when a later event arrives — EXCEPT when the
      input carries a watermark (``withWatermark`` upstream), in which
      case open-session state also EXPIRES: once the watermark passes
      ``session_end + gap_seconds`` no in-watermark event can extend
      the session, so it is emitted as closed and its state removed
      (event-time timeout). This bounds state size to the number of
      keys active within one watermark horizon — without a watermark,
      state grows with total key cardinality forever, and a final open
      session per key is only emitted by the caller at stream end
      (tests drain state via a terminal batch).
    - an expired key's later event opens a NEW session, exactly like
      the batch operator under the same watermark.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{id_col} long, session_start timestamp, "
        "session_end timestamp, n_events long"
    )
    state_schema = "start timestamp, end timestamp, n long"
    # Event-time timeout requires a watermark on the input; detect it
    # from the analyzed plan so un-watermarked callers keep the
    # documented no-expiry behavior instead of an AnalysisException.
    has_watermark = events.isStreaming and "EventTimeWatermark" in str(
        events._jdf.queryExecution().analyzed()
    )
    gap_ms = int(round(gap_seconds * 1000))
    # applyInPandasWithState hands the workers naive timestamps in the
    # SESSION timezone — capture it at build time so the event-time
    # timeout is right for any session tz (assuming UTC would shift
    # expiry by the tz offset, or crash the query when the computed
    # timeout lands at-or-before the watermark)
    session_tz = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )

    def fold(key, pdf_iter, state):
        import pandas as pd
        from datetime import timezone

        if state.hasTimedOut:
            # watermark passed end + gap: no in-watermark event can
            # extend this session — emit it closed, drop the state
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], start, end, n)],
                columns=[id_col, "session_start", "session_end", "n_events"],
            )
            return

        rows = pd.concat(list(pdf_iter))
        rows = rows.sort_values(ts_col)
        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0
        closed = []
        for t in rows[ts_col]:
            t = t.to_pydatetime() if hasattr(t, "to_pydatetime") else t
            if start is None:
                start = end = t
                n = 1
            elif (t - end).total_seconds() <= gap_seconds:
                # Late/out-of-order cross-batch events: an event can
                # precede the open session's start (earlier batches saw
                # later events); widen BOTH bounds so the emitted
                # session matches the batch result.
                start = min(start, t)
                end = max(end, t)
                n += 1
            else:
                closed.append((key[0], start, end, n))
                start = end = t
                n = 1
        state.update((start, end, n))
        if has_watermark and end is not None:
            # naive timestamps arrive localized to the captured
            # session timezone
            if session_tz[:1] in ("+", "-"):  # fixed-offset form
                from datetime import timedelta

                hh, _, mm = session_tz[1:].partition(":")
                off = timedelta(hours=int(hh), minutes=int(mm or 0))
                tz = timezone(off if session_tz[0] == "+" else -off)
            else:
                try:
                    from zoneinfo import ZoneInfo

                    tz = ZoneInfo(session_tz)
                except Exception:
                    tz = timezone.utc
            end_ms = int(end.replace(tzinfo=tz).timestamp() * 1000)
            state.setTimeoutTimestamp(end_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[id_col, "session_start", "session_end", "n_events"],
            )

    return events.groupBy(id_col).applyInPandasWithState(
        fold,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout
        if has_watermark
        else GroupStateTimeout.NoTimeout,
    )
