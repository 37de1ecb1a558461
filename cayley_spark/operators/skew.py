"""Skew-mitigation operators: salted joins and two-phase aggregation.

At 100 TB the failure mode of a keyed shuffle is rarely total volume —
it is ONE hot key pinning one task (a power-law predicate in a graph,
an empty-string content hash, a bot user_id). AQE's skew-join split
handles sort-merge joins it can see; these helpers cover the cases it
can't: broadcastable-but-hot build sides and hot-key aggregations,
with the salt factor under caller control.

Both transformations are RESULT-PRESERVING — the tests assert output
equality with the unsalted plan — so callers can apply them purely on
operational evidence (a straggling task in the Spark UI) without
re-validating semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has hot keys: left rows get a random
    salt in [0, salt), the (small) ``right`` side is replicated once
    per salt value, and the join key becomes (key, salt) — a hot key's
    rows now spread over ``salt`` tasks instead of one.

    ``right`` is replicated ``salt``× — use for dimension-sized right
    sides (the broadcast-join regime, when the hot key makes even a
    broadcast join's post-probe pipeline skewed, or when the right
    side is slightly too big to broadcast). ``how`` supports
    inner/left joins (right-side multiplicities are preserved because
    every right row appears exactly once per salt bucket)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, not {how}")
    l_s = left.withColumn(
        "__salt", (F.rand(seed=0) * salt).cast("int")
    )
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_s.join(r_s, [on, "__salt"], how).drop("__salt")


def salted_count(
    df: DataFrame, keys: list[str] | str, salt: int = 32
) -> DataFrame:
    """Two-phase count aggregation for hot grouping keys: count within
    (keys, salt) first — spreading a hot key over ``salt`` partial
    tasks — then sum the partials per key. Equivalent to
    ``groupBy(keys).count()`` by associativity. (Spark's own partial
    aggregation already does this per input partition; the explicit
    salt phase helps when upstream partitioning is itself skewed, e.g.
    directly after an ingest whose file layout clusters the hot key.)

    Returns (keys..., n)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    s = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = s.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__pn")
    )
    return partial.groupBy(*keys).agg(F.sum("__pn").alias("n"))
