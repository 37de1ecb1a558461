"""Streaming as-of join — continuous last-touch enrichment.

The batch operator (``operators/joins.asof_join``) attaches, to each
probe row, its key's nearest-in-time right row. A streaming pipeline
wants the same thing continuously: enrich an event stream against a
quote/dimension-change stream as both arrive (trade-vs-quote,
event-vs-config-version, click-vs-campaign-state). No Spark built-in
expresses it — a stream-stream interval join both multiplies each
probe by its in-interval quote history and FORCES a bounded lookback
(a quote older than the interval can never match, which is not as-of
semantics) — so this is a custom stateful operator on
``applyInPandasWithState``, the repo's streaming escape hatch
(sessionize/neardup discipline).

Semantics (BACKWARD direction only — forward needs future quotes,
which a stream by definition has not seen): per key, state holds the
single latest quote row (ts + attached values). Each micro-batch
merges that key's probe and quote arrivals, sorts by (ts, side) —
the same side ordering the batch operator uses, so ``allow_exact``
behaves identically — and folds: a quote at-or-after the state quote
replaces it; a probe emits with the current quote when the
exact/strict predicate holds, else with NULLs.

State is O(1) per key — ONE quote struct — which is the inherent
minimum for as-of enrichment: unlike sessions or dedup buckets, a
key's latest quote never expires semantically (a quote from last
month still matches today's probe if nothing newer arrived), so
there is no watermark-eviction contract to offer; state size is
bounded by key cardinality, exactly like Spark's own
``dropDuplicates`` without a watermark. Documented stream-order
limits (both inherent to O(1) state, both pinned by tests):

- a probe is matched against quotes that arrived in its OWN
  micro-batch or earlier — a later-arriving earlier quote does not
  retro-match (bound cross-batch disorder upstream with
  ``withWatermark`` before the join);
- a late quote OLDER than the state quote is dropped (the state
  keeps only the latest; an older quote could only matter to an
  earlier probe, which has already been emitted).

Within one micro-batch the sorted fold reproduces batch semantics
exactly: a single-batch run over the whole dataset equals the batch
operator row-for-row (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def asof_join_stream(
    probes: DataFrame,
    quotes: DataFrame,
    on: list[str] | str,
    probe_ts: str = "ts",
    quote_ts: str | None = None,
    quote_cols: list[str] | None = None,
    allow_exact: bool = True,
    suffix: str = "_right",
    expire_after_seconds: float | None = None,
) -> DataFrame:
    """Streaming backward as-of join of two streams on ``on``.

    Output: one row per probe row (append mode), all probe columns
    plus the matched quote's ``quote_ts`` and ``quote_cols`` (names
    suffixed with ``suffix`` only on collision, exactly like the
    batch operator). NULL-ts probes and quotes are handled as in
    batch: a NULL-ts quote never matches, a NULL-ts probe matches
    nothing. Ties among same-(key, ts) quotes resolve to the
    latest-processed one — the batch operator's documented
    "pre-aggregate upstream" precondition applies here too.

    ``expire_after_seconds`` OPTS INTO state eviction for
    key-churning workloads (keys that stop quoting forever — session
    ids, short-lived entities — would otherwise accumulate state at
    key cardinality): once the watermark passes
    ``quote_ts + expire_after_seconds`` the key's state is dropped,
    and a LATER probe for that key gets NULLs — an explicit semantic
    trade (the default keeps the as-of contract exact at
    key-cardinality state; see the module docstring). Requires a
    timestamp-typed time axis and ``withWatermark`` upstream on BOTH
    inputs — raises loudly otherwise rather than silently never
    expiring.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    keys = [on] if isinstance(on, str) else list(on)
    quote_ts = quote_ts or probe_ts
    if quote_cols is None:
        quote_cols = [
            c for c in quotes.columns if c not in keys and c != quote_ts
        ]
    attach = [quote_ts] + [c for c in quote_cols if c != quote_ts]
    out_names = {
        c: (c + suffix if c in probes.columns else c) for c in attach
    }

    # tagged union, mirroring the batch operator's projections —
    # attach columns ride as flat __r{i} fields (Arrow moves flat
    # columns; the state schema needs them typed individually anyway)
    l_side, r_side = (1, 0) if allow_exact else (0, 1)
    lcols = [c for c in probes.columns if c not in keys]
    qtypes = dict(quotes.dtypes)
    ptypes = dict(probes.dtypes)
    # every projected COPY of a watermarked timestamp column must
    # shed its event-time metadata (alias with explicit empty
    # metadata) — otherwise the union carries two event-time columns
    # and Spark rejects the stateful query; the watermark rides on
    # __ts alone
    lt = probes.select(
        *keys,
        F.col(probe_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        *[F.col(c).alias(c, metadata={}) for c in lcols],
        *[
            F.lit(None).cast(qtypes[c]).alias(f"__r{i}")
            for i, c in enumerate(attach)
        ],
    )
    rt = quotes.where(F.col(quote_ts).isNotNull()).select(
        *keys,
        F.col(quote_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(ptypes[c]).alias(c) for c in lcols],
        *[
            F.col(c).alias(f"__r{i}", metadata={})
            for i, c in enumerate(attach)
        ],
    )
    u = lt.unionByName(rt)

    out_fields = [f"{c} {ptypes[c]}" for c in probes.columns] + [
        f"{out_names[c]} {qtypes[c]}" for c in attach
    ]
    out_schema = ", ".join(out_fields)
    state_schema = ", ".join(
        f"__r{i} {qtypes[c]}" for i, c in enumerate(attach)
    )
    out_cols = list(probes.columns) + [out_names[c] for c in attach]
    n_attach = len(attach)
    probe_side = l_side

    expire_ms = None
    session_tz = None
    if expire_after_seconds is not None:
        if not dict(u.dtypes)["__ts"].startswith("timestamp"):
            raise ValueError(
                "expire_after_seconds needs a timestamp-typed time "
                "axis (event-time timeouts are watermark-driven)"
            )
        has_wm = "EventTimeWatermark" in str(
            probes._jdf.queryExecution().analyzed()
        ) and "EventTimeWatermark" in str(
            quotes._jdf.queryExecution().analyzed()
        )
        if not has_wm:
            raise ValueError(
                "expire_after_seconds needs withWatermark on BOTH "
                "input streams — without one the state would silently "
                "never expire"
            )
        expire_ms = int(round(expire_after_seconds * 1000))
        # applyInPandasWithState hands workers naive timestamps in the
        # session timezone (the sessionize discipline) — capture it so
        # the timeout epoch arithmetic is right under any session tz
        session_tz = probes.sparkSession.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
        # validate HERE, on the driver, where a failure is visible:
        # the worker-side fallback below would silently localize to
        # UTC and fire expiry hours off (ADVICE r14) — expiry is
        # opt-in, so an unresolvable zone is a loud precondition
        # failure like the missing-watermark check above
        if session_tz[:1] not in ("+", "-"):
            try:
                from zoneinfo import ZoneInfo

                ZoneInfo(session_tz)
            except Exception:
                raise ValueError(
                    f"asof_join_stream: expire_after_seconds needs the "
                    f"session timezone for timeout epoch arithmetic, but "
                    f"spark.sql.session.timeZone={session_tz!r} is not "
                    f"resolvable by zoneinfo on this driver"
                )
    # positional access inside the fold: pandas itertuples mangles
    # dunder names like __ts, so resolve column positions up front
    cols = u.columns
    i_ts = cols.index("__ts")
    i_side = cols.index("__side")
    i_probe = [cols.index(c) for c in probes.columns]
    i_r = [cols.index(f"__r{i}") for i in range(n_attach)]

    def _epoch_ms(naive_ts):
        # naive timestamps arrive localized to the captured session tz
        from datetime import timedelta, timezone

        if session_tz[:1] in ("+", "-"):  # fixed-offset form
            hh, _, mm = session_tz[1:].partition(":")
            off = timedelta(hours=int(hh), minutes=int(mm or 0))
            tz = timezone(off if session_tz[0] == "+" else -off)
        else:
            try:
                from zoneinfo import ZoneInfo

                tz = ZoneInfo(session_tz)
            except Exception:
                tz = timezone.utc
        return int(naive_ts.replace(tzinfo=tz).timestamp() * 1000)

    def fold(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            # the watermark passed quote_ts + ttl: drop the state —
            # a later probe for this key starts from nothing
            state.remove()
            return

        pdf = pd.concat(list(pdf_iter))
        # stable sort: equal-(ts, side) rows keep arrival order — the
        # batch operator's latest-sorted-duplicate-wins analog
        pdf = pdf.sort_values(
            [cols[i_ts], cols[i_side]], kind="mergesort", na_position="last"
        )
        cur = list(state.get) if state.exists else None
        out = []
        for row in pdf.to_numpy(dtype=object):
            ts = row[i_ts]
            is_null_ts = (
                ts is None
                or ts is pd.NaT
                or (isinstance(ts, float) and ts != ts)
            )
            if row[i_side] != probe_side:
                # quote: replaces state when at-or-after the current
                # one (an older late quote could only matter to an
                # already-emitted probe — documented drop)
                if not is_null_ts and (cur is None or not (ts < cur[0])):
                    cur = [row[j] for j in i_r]
                continue
            # probe: emit with the current quote when it qualifies
            matched = None
            if not is_null_ts and cur is not None:
                qts = cur[0]
                if (qts <= ts) if allow_exact else (qts < ts):
                    matched = cur
            out.append(
                [row[j] for j in i_probe]
                + (matched if matched is not None else [None] * n_attach)
            )
        if cur is not None:
            state.update(tuple(cur))
            if expire_ms is not None:
                ts = cur[0]
                if hasattr(ts, "to_pydatetime"):
                    ts = ts.to_pydatetime()
                # a stale quote + short ttl can compute a timeout at
                # or before the current watermark, which Spark
                # rejects — clamp one ms past it (the key then times
                # out at the next trigger, the intended outcome)
                target = _epoch_ms(ts) + expire_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(target, wm + 1))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return u.groupBy(*keys).applyInPandasWithState(
        fold,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout
        if expire_ms is not None
        else GroupStateTimeout.NoTimeout,
    )
