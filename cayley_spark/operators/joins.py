"""Temporal join operators Spark lacks as built-ins: as-of join and
point-in-interval range join.

The reference engine has no temporal joins (its data model is quads);
a training-data/events pipeline needs both constantly (attribution,
log enrichment, windowed correlation). Neither is expressible as a
plain equi-join, and the naive formulations are scale traps:

- as-of as ``JOIN ... ON l.key = r.key AND r.ts <= l.ts`` + argmax
  multiplies every left row by its full right history before pruning;
- range join as an inequality join compiles to a broadcast
  nested-loop (all-pairs) in Spark.

Both operators here reduce to ONE hash-partitioned shuffle each:

- ``asof_join`` unions the two sides tagged, sorts each key's
  partition once, and takes a running ``last(value, ignorenulls)``
  window — the classic union-merge as-of, O(n log n) per key, no row
  multiplication, no skew beyond the key distribution itself.
- ``range_join`` quantizes time into fixed buckets, explodes each
  interval into the buckets it covers (bounded by
  interval_length/bucket), and equi-joins on the bucket id — interval
  flooding, the standard distributed range-join strategy. The exact
  containment predicate runs as a post-join filter on co-located
  rows.

All arithmetic is integer microseconds (``unix_micros`` + ``pmod``) —
no double rounding at any timestamp magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_US = 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact: bool = True,
    suffix: str = "_right",
    bucket_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the single right row of the same key
    that is nearest in time: the latest right row with
    ``right_ts <= left_ts`` (direction='backward', the default — pandas
    ``merge_asof`` semantics) or the earliest with ``right_ts >=
    left_ts`` ('forward'). ``allow_exact=False`` makes the comparison
    strict. Left rows with no match keep nulls (left-join semantics);
    the output has exactly one row per left row, PROVIDED right has at
    most one row per (key, right_ts) — pre-aggregate ties upstream,
    otherwise the latest-sorted duplicate wins.

    Right's attached columns keep their names, suffixed with
    ``suffix`` only on collision with a left column; the matched right
    timestamp is attached the same way.

    Plan shape: union of the two projected sides → one shuffle on the
    key → per-partition sort → running window. No join node at all.

    ``bucket_seconds`` selects the TWO-PHASE form — the hot-entity
    scale path (SCALE.md round-13 audit, the sessionize discipline):
    the default window partitioned by the key alone serializes every
    row of one key into one sorted task, so a 10^7-row hot entity
    becomes a straggler. With ``bucket_seconds`` set, phase 1 runs the
    same running window per (key, time bucket) — no task ever holds
    more than one bucket of one key — then each bucket's FINAL
    non-null right struct (its carry, extracted by a ``max_by``/
    ``min_by`` riding phase 1's own exchange) flows across buckets
    through a running window over the per-(key, bucket) carry table,
    whose frame is bounded by the key's BUCKET count, not its row
    count; the result is ``coalesce(within-bucket value, incoming
    carry)``. Bit-identical to the single-window form for ANY bucket
    size, both directions, and both ``allow_exact`` settings: buckets
    partition the time axis, so same-timestamp rows always share a
    bucket (exactness is decided entirely by phase 1's side ordering)
    and a carry from another bucket is strictly earlier/later than
    every probe it reaches.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    attach = [right_ts] + [c for c in right_cols if c != right_ts]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")

    # Side ordering at EQUAL timestamps decides exact-match semantics:
    # the running window must see a same-instant right row iff
    # allow_exact. backward scans ascending with a trailing frame, so
    # "right first" includes it; forward scans with a leading frame,
    # so "left first" includes it.
    if direction == "backward":
        r_side, l_side = (0, 1) if allow_exact else (1, 0)
    else:
        l_side, r_side = (0, 1) if allow_exact else (1, 0)

    lcols = [c for c in left.columns if c not in keys]
    rtypes = dict(right.dtypes)
    # ALL attached columns ride in ONE struct picked atomically by the
    # running window: picking each column with its own
    # last/first(ignorenulls) would stitch values from DIFFERENT right
    # rows whenever right data itself contains NULLs in attached
    # columns (ignorenulls must skip only the union's left-side
    # placeholder rows, never a matched row's genuine NULL fields).
    struct_t = (
        "struct<"
        + ",".join(f"_{i}:{rtypes[c]}" for i, c in enumerate(attach))
        + ">"
    )
    lt = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        *[F.col(c).alias(c) for c in lcols],
        F.lit(None).cast(struct_t).alias("__r"),
    )
    # NULL-timestamp right rows can never be "nearest in time" — drop
    # them (NULLS FIRST ordering would otherwise make one act like
    # ts = -infinity and match every backward probe).
    rt = right.where(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(
            *[F.col(c).alias(f"_{i}") for i, c in enumerate(attach)]
        ).alias("__r"),
    )
    u = lt.unionByName(rt)
    backward = direction == "backward"
    if bucket_seconds is None:
        w = Window.partitionBy(*keys).orderBy("__ts", "__side")
        if backward:
            w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
        else:
            w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            u = u.withColumn("__r", F.first("__r", ignorenulls=True).over(w))
    else:
        u = _asof_bucketed(u, keys, backward, bucket_seconds)
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in attach
    }
    u = u.where(F.col("__side") == F.lit(l_side)).drop("__side")
    # a NULL-timestamp LEFT row has no position on the time axis: it
    # must keep left-join NULLs, not match the frame's boundary row
    u = u.withColumn(
        "__r", F.when(F.col("__ts").isNotNull(), F.col("__r"))
    )
    if left_ts not in lcols:  # left_ts was consumed into __ts
        u = u.withColumn(left_ts, F.col("__ts"))
    sel = list(left.columns) + [
        F.col("__r")[f"_{i}"].alias(out_names[c])
        for i, c in enumerate(attach)
    ]
    return u.select(*sel)


def _asof_bucketed(
    u: DataFrame,
    keys: list[str],
    backward: bool,
    bucket_seconds: float,
) -> DataFrame:
    """Two-phase running-window fold for :func:`asof_join` (see its
    docstring). ``u`` is the tagged union carrying ``__ts``/``__side``/
    ``__r``; returns it with ``__r`` replaced by the as-of value.

    Phase 1 runs the standard running last/first per (key, time
    bucket). Each bucket's carry — its FINAL right struct (backward;
    FIRST, forward) — is one ``max_by``/``min_by`` aggregate over the
    RIGHT rows alone (``__r`` is non-null exactly on right rows), so
    the carry branch scans a (keys, ts, side, attach-struct)
    projection with the left columns pruned and never recomputes the
    phase-1 window. The bucket LIST left-joined against it is a
    2-column distinct over the union (buckets holding only left rows
    must still receive an incoming carry). Phase 2's running carry is
    shifted one bucket back (frame ending at -1), so a bucket receives
    only strictly earlier (later, forward) buckets' finals — exactness
    at equal timestamps is therefore decided entirely by phase 1's
    side ordering, because equal timestamps always share a bucket.
    The phase-2 frame is bounded by the key's BUCKET count; the join
    back is an equi-join on (key, bucket) against the (key, bucket)
    partitioning the main path already holds.
    """
    dtype = dict(u.dtypes)["__ts"]
    if dtype.startswith("timestamp"):
        # integer-microsecond bucketing (the range_join discipline).
        # NOT F.window(): the TimeWindowing rule injects an
        # isnotnull(ts) filter that would silently DROP null-ts left
        # rows; unix_micros preserves NULL, handles both TIMESTAMP
        # flavors via the cast, and pmod keeps the alignment exact
        # int64 at any magnitude (a double `/` loses ulps past ±2^53
        # µs from epoch).
        bus = int(round(bucket_seconds * 1_000_000))
        ts_us = F.unix_micros(F.col("__ts").cast("timestamp"))
        bucket = ts_us - F.pmod(ts_us, F.lit(bus))
    else:
        bucket = F.floor(
            F.col("__ts").cast("double") / F.lit(float(bucket_seconds))
        )
    u = u.withColumn("__bkt", bucket)
    w1 = Window.partitionBy(*keys, "__bkt").orderBy("__ts", "__side")
    if backward:
        w1 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        within = F.last("__r", ignorenulls=True).over(w1)
        pick = F.max_by
    else:
        w1 = w1.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        within = F.first("__r", ignorenulls=True).over(w1)
        pick = F.min_by
    carry = (
        u.where(F.col("__r").isNotNull())  # right rows only
        .groupBy(*keys, "__bkt")
        .agg(pick("__r", F.struct("__ts", "__side")).alias("__carry"))
        .select(
            *[F.col(c).alias(f"__ck{i}") for i, c in enumerate(keys)],
            F.col("__bkt").alias("__cbkt"),
            "__carry",
        )
    )
    # NULL-SAFE: window partitioning groups NULL keys into one group
    # (single-window semantics), so both carry joins must match them
    # too — plain equi-joins would silently drop the NULL-key group's
    # carries (and the null-bucket rows, though those are nulled by
    # the caller's null-ts guard regardless)
    ccond = F.col("__bkt").eqNullSafe(F.col("__cbkt"))
    for i, c in enumerate(keys):
        ccond = ccond & F.col(c).eqNullSafe(F.col(f"__ck{i}"))
    bl = (
        u.select(*keys, "__bkt")
        .distinct()
        .join(carry, ccond, "left")
        .drop("__cbkt", *[f"__ck{i}" for i in range(len(keys))])
    )
    order = F.col("__bkt").asc() if backward else F.col("__bkt").desc()
    w2 = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    incoming = bl.select(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(keys)],
        F.col("__bkt").alias("__bkt2"),
        F.last("__carry", ignorenulls=True).over(
            w2
        ).alias("__in"),
    )
    # NULL-SAFE join-back: window partitioning groups NULL keys into
    # one group (single-window semantics), so the carry join must
    # match them too — a plain equi-join would silently drop every
    # NULL-key row's incoming carry. (__bkt is null-safe as well,
    # though null-bucket rows are nulled by the caller's null-ts
    # guard regardless.)
    cond = F.col("__bkt").eqNullSafe(F.col("__bkt2"))
    for i, c in enumerate(keys):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__k{i}"))
    u = u.withColumn("__within", within).join(incoming, cond, "left")
    return (
        u.withColumn(
            "__r", F.coalesce(F.col("__within"), F.col("__in"))
        )
        .drop(
            "__bkt", "__bkt2", "__within", "__in",
            *[f"__k{i}" for i in range(len(keys))],
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 60,
    on: list[str] | None = None,
) -> DataFrame:
    """Inner-join each point to every interval containing it
    (``start <= point_ts < end``), optionally also matching equality
    keys ``on``. Output: all point columns + all interval columns
    (caller guarantees disjoint names apart from ``on``).

    Scale path: each interval explodes into ceil(len/bucket) bucket
    ids, each point into exactly one — the join is a plain equi-join
    on (keys..., bucket), hash-partitioned, never nested-loop. Size
    ``bucket_seconds`` to the typical interval length: the explosion
    factor is interval_length/bucket + 1 per interval; an interval
    that would flood more than 10k buckets fails the job loudly
    (``assert_true``) — widen the bucket rather than flood.
    """
    bus = int(bucket_seconds) * _US
    keys = list(on or [])
    # cast handles TIMESTAMP_NTZ/DATE (unix_micros requires TIMESTAMP);
    # a uniform session-tz shift moves all bucket ids identically, so
    # the containment predicate is unaffected
    _us_of = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    p_us = _us_of(point_ts)
    s_us = _us_of(start_col)
    e_us = _us_of(end_col)
    # bucket id = the bucket's START microsecond (floor-aligned via
    # pmod) — pure int64 arithmetic, NO division: a double `/` loses
    # ulps beyond ±2^53 µs from epoch (~1685–2255) and silently
    # misbuckets; pmod is floor-signed so pre-1970 stamps align too
    p_b = p_us - F.pmod(p_us, F.lit(bus))
    s_b = s_us - F.pmod(s_us, F.lit(bus))
    # end is EXCLUSIVE: an interval ending exactly on a bucket
    # boundary does not cover that bucket
    e_adj = e_us - F.lit(1)
    e_b = e_adj - F.pmod(e_adj, F.lit(bus))
    guard = F.assert_true(
        e_b - s_b <= F.lit(10_000 * bus),
        F.lit(f"range_join: interval exceeds 10000 buckets of {bucket_seconds}s — increase bucket_seconds"),
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.when(
                guard.isNull(),
                F.sequence(s_b, F.greatest(s_b, e_b), F.lit(bus)),
            )
        ),
    )
    pt = points.withColumn("__bucket", p_b)
    out = pt.join(iv, keys + ["__bucket"], "inner").where(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return out.drop("__bucket")
