"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md
§2 (prefix ``g_`` = graph operators over the deterministic TPC-H-
derived graph in cayley_spark/graphs/tpch.py, ``q`` = relational
analytics, ``t_``/``d_``/``s_`` = text / dedup / similarity training-
data operators). ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL
over the same parquet views.

Cross-engine determinism rules used throughout:
- graph results are rendered as N-Quads term strings (pure string
  concat both sides);
- double aggregations go through exact DECIMAL sums, cast to double
  at the end (identical bits both engines);
- top-k queries always carry a total tie-break order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from cayley_spark import IRI, Float, Path, String
from cayley_spark import shapes as S
from cayley_spark.graphs.tpch import tpch_graph


#: Per-(session, path) DataFrame memo. spark.read.parquet() re-lists
#: the directory and re-reads the footer schema on EVERY call
#: (~115 ms driver-side at sf0.1) — with ~110 table-reading queries
#: x 2 bench reps that is tens of seconds of pure metadata overhead.
#: Reusing the DataFrame object is plan reuse, not result caching:
#: execution still scans the parquet files every time (exactly what a
#: catalog `spark.table()` reference would do).
_READ_CACHE: dict[tuple[int, str], DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), f"{sf_dir}/{name}.parquet", "raw")
    if key not in _READ_CACHE:
        _READ_CACHE[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _READ_CACHE[key]


def _t_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table destined for CPU-heavy per-row operators
    (shingling, hashing, vector math). The testdata files are single
    row groups, so the scan yields ONE partition and the whole
    operator runs on one core; spread it across the cluster first.
    Gated: at real scale inputs already have >= parallelism splits and
    this is a no-op (no shuffle)."""
    key = (id(spark), f"{sf_dir}/{name}.parquet", "wide")
    if key not in _READ_CACHE:
        df = _t(spark, sf_dir, name)
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
        _READ_CACHE[key] = df
    return _READ_CACHE[key]


# ---------------------------------------------------------------
# graph queries (cayley Path API over the TPC-H-derived graph)
# ---------------------------------------------------------------


def g_in(spark, sf):
    """In-hop (LinksTo/HasA): members of nation 7."""
    g = tpch_graph(spark, sf)
    return Path.start(g, IRI("nation:7")).in_(IRI("in_nation")).values_df()


def g_out2(spark, sf):
    """Two out-hops: regions of BUILDING customers (per-path dups)."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_segment"), String("BUILDING"))
        .out(IRI("in_nation"))
        .out(IRI("in_region"))
        .values_df()
    )


def g_tags(spark, sf):
    """Save/Tag: BUILDING customers with nation + nation name tags."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_segment"), String("BUILDING"))
        .tag("cust")
        .out(IRI("in_nation"))
        .save(IRI("named"), "nname")
        .values_df()
    )


def g_union(spark, sf):
    g = tpch_graph(spark, sf)
    a = Path.start(g).has(IRI("in_segment"), String("AUTOMOBILE"))
    b = Path.start(g).has(IRI("in_segment"), String("MACHINERY"))
    return a.or_(b).values_df()


def g_except(spark, sf):
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_segment"))
        .except_(Path.start(g).has(IRI("in_segment"), String("BUILDING")))
        .values_df()
    )


def g_intersect(spark, sf):
    g = tpch_graph(spark, sf)
    rich = Path.start(g).has_filter(IRI("balance"), S.Comparison("gt", Float(5000.0)))
    return (
        Path.start(g)
        .has(IRI("in_segment"), String("BUILDING"))
        .and_(rich)
        .values_df()
    )


def g_unique(spark, sf):
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_segment"), String("BUILDING"))
        .out(IRI("in_nation"))
        .unique()
        .values_df()
    )


def g_count(spark, sf):
    """Count with path multiplicity: one per contains-edge."""
    g = tpch_graph(spark, sf)
    return Path.start(g).in_(IRI("contains")).count_df()


def g_allnodes(spark, sf):
    """AllNodes scan cardinality."""
    g = tpch_graph(spark, sf)
    return Path.start(g).count_df()


def g_labeled(spark, sf):
    """LabelContext: parts shipped under label <supplier:3>."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .label_context(IRI("supplier:3"))
        .out(IRI("contains"))
        .values_df()
    )


def g_compare(spark, sf):
    """Typed comparison (kind-gated): customers with balance > 5000."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has_filter(IRI("balance"), S.Comparison("gt", Float(5000.0)))
        .values_df()
    )


def g_regex(spark, sf):
    """Regexp value filter: nations named NATION_1*."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_region"))
        .has_filter(IRI("named"), S.Regexp("^NATION_1"))
        .values_df()
    )


def g_order_limit(spark, sf):
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_segment"), String("BUILDING"))
        .order()
        .limit(5)
        .values_df()
    )


def g_skip(spark, sf):
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_segment"), String("BUILDING"))
        .order()
        .skip(3)
        .limit(4)
        .values_df()
    )


def g_optional(spark, sf):
    """SaveOptional: nations with optional successor."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_region"))
        .save_opt(IRI("next"), "nxt")
        .values_df()
    )


def g_both(spark, sf):
    g = tpch_graph(spark, sf)
    return Path.start(g, IRI("nation:7")).both(IRI("in_nation")).values_df()


def g_follow(spark, sf):
    """Follow morphism: nation of each finished (status F) order."""
    g = tpch_graph(spark, sf)
    m = Path.morphism().out(IRI("placed_by")).out(IRI("in_nation"))
    return (
        Path.start(g).has(IRI("status"), String("F")).follow(m).values_df()
    )


def g_followr(spark, sf):
    """FollowReverse: who points into nation 3 via in_nation."""
    g = tpch_graph(spark, sf)
    m = Path.morphism().out(IRI("in_nation"))
    return Path.start(g, IRI("nation:3")).follow_r(m).values_df()


def g_or_short(spark, sf):
    """Short-circuit Or (reference or.go:49-56 NewShortCircuitOr):
    the first branch is non-empty, so the second never contributes —
    a full union would return both segments."""
    g = tpch_graph(spark, sf)
    first = Path.start(g).has(IRI("in_segment"), String("FURNITURE"))
    second = Path.start(g).has(IRI("in_segment"), String("MACHINERY"))
    return first.or_short(second).values_df()


def g_valuefilter(spark, sf):
    """Generic ValueFilter, JVM-expression form (reference
    value_filter.go:24-75): nations whose name ends with '1'."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_region"))
        .has_filter(
            IRI("named"),
            S.ValueFilterFunc(
                expr=lambda c: (c["kind"] == "string")
                & c["str"].endswith("1")
            ),
        )
        .values_df()
    )


def g_valuefilter_fn(spark, sf):
    """Generic ValueFilter, Python-callable form (Arrow-batched pandas
    UDF over rendered terms) — same semantics as g_valuefilter."""
    from cayley_spark.values import String as Str

    g = tpch_graph(spark, sf)
    return (
        Path.start(g)
        .has(IRI("in_region"))
        .has_filter(
            IRI("named"),
            S.ValueFilterFunc(
                fn=lambda v: isinstance(v, Str) and v.s.endswith("1")
            ),
        )
        .values_df()
    )


def g_write_delete(spark, sf):
    """Write path (ApplyDeltas): add an unlabeled + labeled variant of
    the same (s,p,o), delete the unlabeled one — the labeled quad must
    survive (deltas key on all four directions, reference
    graph/log/graphlog.go QuadHash; regression for the round-1 bug
    where delete anti-joined on (s,p,o) only)."""
    g = tpch_graph(spark, sf)
    tmp = String("TEMP_NAME")
    g2 = g.apply_deltas(
        add=[
            (IRI("nation:7"), IRI("named"), tmp),
            (IRI("nation:7"), IRI("named"), tmp, IRI("tempgraph")),
        ]
    ).apply_deltas(delete=[(IRI("nation:7"), IRI("named"), tmp)])
    return Path.start(g2, IRI("nation:7")).out(IRI("named")).values_df()


def g_recursive(spark, sf):
    """FollowRecursive: transitive closure of the nation chain."""
    g = tpch_graph(spark, sf)
    return (
        Path.start(g, IRI("nation:0"))
        .follow_recursive(IRI("next"), depth_tag="depth")
        .values_df()
    )


# ---------------------------------------------------------------
# relational analytics (Spark-first; TPC-H-style)
# ---------------------------------------------------------------


def _dec(col, scale):
    return col.cast(f"decimal(18,{scale})")


def q1(spark, sf):
    li = _t(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"), 2)).cast("double").alias("sum_qty"),
            F.sum(_dec(F.col("l_extendedprice"), 2)).cast("double").alias("sum_base_price"),
            F.sum(_dec(disc_price, 4)).cast("double").alias("sum_disc_price"),
            F.sum(_dec(charge, 6)).cast("double").alias("sum_charge"),
            (F.sum(_dec(F.col("l_quantity"), 2)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec(F.col("l_discount"), 2)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3(spark, sf):
    cust = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders").where(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf, "lineitem").where(F.col("l_shipdate") > "1998-01-01")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_dec(rev, 4)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5(spark, sf):
    """Revenue per nation for ASIA-region customers, TPC-H Q5 shape:
    customer and supplier co-located in the same nation."""
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_dec(rev, 4)).cast("double").alias("revenue"))
    )


def q6(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount"), 4))
            .cast("double")
            .alias("revenue")
        )
    )


def q4(spark, sf):
    """TPC-H Q4 shape (order priority checking): EXISTS → LEFT SEMI
    join, then a small group-by. The testdata has no
    l_commitdate/l_receiptdate, so "late" = shipped more than 90 days
    after the order date (same plan shape, available columns)."""
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).select(F.col("l_orderkey").alias("k")).distinct()
    return (
        orders.where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1996-07-01")
        )
        .join(late, F.col("o_orderkey") == F.col("k"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q14(spark, sf):
    """TPC-H Q14 (promotion effect): conditional aggregation over a
    part join; the ratio is one division of two exact decimal sums."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-03-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(_dec(promo, 4)).cast("double")
                / F.sum(_dec(disc, 4)).cast("double")
            ).alias("promo_revenue")
        )
    )


def q17(spark, sf):
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar
    subquery (per-part average quantity) — Catalyst decorrelates it
    into an aggregate + join; the 0.2*avg threshold is computed in
    exact decimal and compared, so no float-accumulation divergence."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    avg_q = (
        li.groupBy(F.col("l_partkey").alias("ak"))
        .agg(
            F.count(F.lit(1)).alias("nq"),
            F.sum(_dec(F.col("l_quantity"), 2)).alias("sq"),
        )
    )
    # qty < 0.2*avg ⟺ qty*5*n < sum — multiplication-only decimal
    # comparison (decimal DIVISION scale rules differ across engines)
    return (
        li.join(part.where(F.col("p_brand") == "Brand#13"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, F.col("l_partkey") == F.col("ak"))
        .where(
            _dec(F.col("l_quantity"), 2) * F.lit(5) * F.col("nq")
            < F.col("sq")
        )
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"), 2)).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


def q18(spark, sf):
    """TPC-H Q18 (large-volume customers): HAVING over a join chain +
    deterministic top-k."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"), 2)).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice"),
            F.col("sum_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q2(spark, sf):
    """TPC-H Q2 shape (min-cost supplier): the part-supplier relation
    is derived from lineitem (the testdata has no partsupp), cost =
    MIN(l_extendedprice) per (part, supplier) — the correlated
    min-subquery over region-local suppliers survives intact.
    Division-free (no unit-price divide), so decimal-exact."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").where(
        (F.col("p_size") == 15) | (F.col("p_type") == "LARGE")
    )
    supp = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec(F.col("l_extendedprice"), 2)).alias("cost")
    )
    eu = (
        offers.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    best = eu.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("cost").alias("best_cost")
    )
    return (
        eu.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            best,
            (F.col("l_partkey") == F.col("bk"))
            & (F.col("cost") == F.col("best_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("cost").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q7(spark, sf):
    """TPC-H Q7 (volume shipping between two nations, both
    directions): year extracted from l_shipdate; revenue in exact
    decimal per (supp_nation, cust_nation, year)."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cnk"))
        .where(pair)
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_dec(rev, 4)).cast("double").alias("revenue"))
    )


def q8(spark, sf):
    """TPC-H Q8 (national market share): share of ASIA-customer PROMO
    order volume supplied by NATION_3, per order year. The share is
    ONE division of two exact decimal sums cast to double."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    part = _t(spark, sf, "part").where(F.col("p_type") == "PROMO")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region").where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(
        F.col("sn_name") == "NATION_3", vol
    ).otherwise(F.lit(0.0))
    cnat = nat.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    snat = nat.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("sn_name")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(reg), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(snat), F.col("s_nationkey") == F.col("snk"))
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(_dec(nation_vol, 4)).cast("double")
                / F.sum(_dec(vol, 4)).cast("double")
            ).alias("mkt_share")
        )
    )


def q9(spark, sf):
    """TPC-H Q9 (product-type profit by nation and year). The
    testdata has no partsupp, so unit cost = p_retailprice (documented
    adaptation): profit = price*(1-disc) - retailprice*quantity, both
    terms exact decimal(18,4) so the difference is exact."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    supp = _t(spark, sf, "supplier")
    part = _t(spark, sf, "part").where(F.col("p_name").contains("red"))
    nat = _t(spark, sf, "nation")
    amount = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ) - _dec(F.col("p_retailprice") * F.col("l_quantity"), 4)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q10(spark, sf):
    """TPC-H Q10 (returned-item reporting): top 20 customers by
    returned revenue in a quarter."""
    li = _t(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    nat = _t(spark, sf, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("o_orderdate") >= "1996-10-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_dec(rev, 4)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q11(spark, sf):
    """TPC-H Q11 shape (important stock): per-part value share above
    a global-scalar threshold. Value from lineitem (no partsupp);
    the HAVING against the scalar total is the division-free
    comparison value*1000 > total (exact decimal both sides)."""
    li = _t(spark, sf, "lineitem")
    supp = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation").where(F.col("n_name") == "NATION_4")
    scoped = li.join(
        F.broadcast(
            supp.join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(_dec(F.col("l_extendedprice"), 2)).alias("value")
    )
    total = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value") * 1000 > F.col("total"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


def q12(spark, sf):
    """TPC-H Q12 shape (priority counting by shipping class): the
    testdata has no l_shipmode/commitdate, so the class is lateness
    (shipped >60 days after order date); high/low priority line
    counts per class via conditional aggregation."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.lit("LATE"),
    ).otherwise(F.lit("ONTIME"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(late.alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


def q13(spark, sf):
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join
    (customers with zero orders count), two-level aggregation. The
    reference's comment filter becomes an o_orderpriority filter."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").where(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q15(spark, sf):
    """TPC-H Q15 (top supplier): 3-month revenue per supplier, select
    the max via an exact-decimal scalar-max join (ties all returned,
    like the reference)."""
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4))
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


def q16(spark, sf):
    """TPC-H Q16 (supplier count per part attribute group): the
    part-supplier relation from DISTINCT lineitem pairs; the
    complaint-supplier exclusion becomes a negative-balance NOT IN
    (same anti-join shape)."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 35)
    )
    bad = _t(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_k")
    )
    rel = li.select("l_partkey", "l_suppkey").dropDuplicates()
    return (
        rel.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("bad_k"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q19(spark, sf):
    """TPC-H Q19 (discounted revenue, OR-of-ANDs predicate): three
    brand/size/quantity branches — one scan, the disjunction is a
    single pushed filter."""
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(b1 | b2 | b3)
        .agg(F.sum(_dec(rev, 4)).cast("double").alias("revenue"))
    )


def q20(spark, sf):
    """TPC-H Q20 shape (excess-supply suppliers): suppliers whose
    shipped 1996 quantity of a 'red' part exceeds half that part's
    total 1996 quantity — nested aggregate + multiplication-only
    comparison (2*supplier_qty > part_qty), then a semi-join up to
    EUROPE suppliers."""
    li = _t(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    part = _t(spark, sf, "part").where(F.col("p_name").contains("red"))
    supp = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    red = li.join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    per_ps = red.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec(F.col("l_quantity"), 2)).alias("sq_ps")
    )
    per_p = red.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec(F.col("l_quantity"), 2)).alias("sq_p")
    )
    dominant = (
        per_ps.join(per_p, F.col("l_partkey") == F.col("pk"))
        .where(F.col("sq_ps") * 2 > F.col("sq_p"))
        .select(F.col("l_suppkey").alias("dk"))
        .dropDuplicates()
    )
    return (
        supp.join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(dominant, F.col("s_suppkey") == F.col("dk"), "left_semi")
        .select("s_suppkey", "s_name")
    )


def q21(spark, sf):
    """TPC-H Q21 (suppliers who kept orders waiting): failed orders
    where THIS supplier shipped late (>90 days), ANOTHER supplier is
    on the order (EXISTS), and NO other supplier was late
    (NOT EXISTS) — the double-correlated-subquery shape, as one late
    aggregate + semi + anti join."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders").where(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf, "supplier")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = lo.where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    # per order: distinct suppliers on it, distinct LATE suppliers
    all_s = lo.select("l_orderkey", "l_suppkey").dropDuplicates()
    late_s = late.select("l_orderkey", "l_suppkey").dropDuplicates()
    n_all = all_s.groupBy(F.col("l_orderkey").alias("ka")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    n_late = late_s.groupBy(F.col("l_orderkey").alias("kl")).agg(
        F.count(F.lit(1)).alias("n_late")
    )
    culprit = (
        late_s.join(n_all, F.col("l_orderkey") == F.col("ka"))
        .join(n_late, F.col("l_orderkey") == F.col("kl"))
        .where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        culprit.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_tpch_rev(spark, sf):
    """Consolidated TPC-H revenue trio Q7+Q8+Q9 (registry
    consolidation, COVERAGE.md round 10: three near-duplicate
    multi-join + year-extract + decimal-agg shapes merged into one
    multi-assert entry ahead of the 150-entry cap). All three plans
    still execute end-to-end unchanged — q7/q8/q9 remain the
    implementations — and their results harmonize into
    (q, k, yr, v) rows: q7 keys on supp|cust nation pair, q8 on the
    market-share scalar, q9 on nation; every original value column
    survives verbatim in v."""
    a = q7(spark, sf).select(
        F.lit("q7").alias("q"),
        F.concat(
            F.col("supp_nation"), F.lit("|"), F.col("cust_nation")
        ).alias("k"),
        F.col("l_year").cast("int").alias("yr"),
        F.col("revenue").alias("v"),
    )
    b = q8(spark, sf).select(
        F.lit("q8").alias("q"),
        F.lit("mkt_share").alias("k"),
        F.col("o_year").cast("int").alias("yr"),
        F.col("mkt_share").alias("v"),
    )
    c = q9(spark, sf).select(
        F.lit("q9").alias("q"),
        F.col("nation").alias("k"),
        F.col("o_year").cast("int").alias("yr"),
        F.col("sum_profit").alias("v"),
    )
    return a.unionByName(b).unionByName(c)


def q_tpch_mix1(spark, sf):
    """Consolidated TPC-H Q19+Q20+Q21 (registry consolidation,
    COVERAGE.md round 10): the OR-of-ANDs pushed-filter aggregate,
    the nested-aggregate semi-join chain, and the double-correlated
    EXISTS/NOT-EXISTS shape merged into one multi-assert entry. The
    three plans execute unchanged via q19/q20/q21; results
    harmonize into (q, k, v): q19 contributes its revenue scalar,
    q20 its (s_name → s_suppkey) rows, q21 its (s_name → numwait)
    top-20."""
    a = q19(spark, sf).select(
        F.lit("q19").alias("q"),
        F.lit("revenue").alias("k"),
        F.col("revenue").alias("v"),
    )
    b = q20(spark, sf).select(
        F.lit("q20").alias("q"),
        F.col("s_name").alias("k"),
        F.col("s_suppkey").cast("double").alias("v"),
    )
    c = q21(spark, sf).select(
        F.lit("q21").alias("q"),
        F.col("s_name").alias("k"),
        F.col("numwait").cast("double").alias("v"),
    )
    return a.unionByName(b).unionByName(c)


def q_tpch_topn(spark, sf):
    """Consolidated TPC-H top-N trio Q3+Q10+Q18 (registry
    consolidation round 15, COVERAGE.md cap policy item 2 /
    VERDICT r14 #6): three near-duplicate join + decimal-agg +
    deterministic-top-N shapes merged into one multi-assert entry.
    The three plans execute end-to-end unchanged — q3/q10/q18 remain
    the implementations — and results harmonize into (q, k, v, v2):
    the grouping/identity columns pack into k (dates via CAST(date),
    so both engines render 'YYYY-MM-DD'), the headline aggregate is
    v, and the one extra numeric each query carries (q10's
    c_acctbal, q18's o_totalprice) survives verbatim in v2."""
    null_d = F.lit(None).cast("double")
    a = q3(spark, sf).select(
        F.lit("q3").alias("q"),
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit("|"),
            F.col("o_orderdate").cast("date").cast("string"),
        ).alias("k"),
        F.col("revenue").alias("v"),
        null_d.alias("v2"),
    )
    b = q10(spark, sf).select(
        F.lit("q10").alias("q"),
        F.concat(
            F.col("c_custkey").cast("string"),
            F.lit("|"),
            F.col("c_name"),
            F.lit("|"),
            F.col("n_name"),
        ).alias("k"),
        F.col("revenue").alias("v"),
        F.col("c_acctbal").cast("double").alias("v2"),
    )
    c = q18(spark, sf).select(
        F.lit("q18").alias("q"),
        F.concat(
            F.col("c_name"),
            F.lit("|"),
            F.col("c_custkey").cast("string"),
            F.lit("|"),
            F.col("o_orderkey").cast("string"),
            F.lit("|"),
            F.col("o_orderdate").cast("date").cast("string"),
        ).alias("k"),
        F.col("total_qty").alias("v"),
        F.col("o_totalprice").cast("double").alias("v2"),
    )
    return a.unionByName(b).unionByName(c)


def q_tpch_exists(spark, sf):
    """Consolidated TPC-H Q4+Q22 (registry consolidation round 15):
    the EXISTS → left-semi shape and the NOT-EXISTS → left-anti +
    above-average-balance shape merged into one multi-assert entry;
    q4/q22 execute unchanged. Harmonized (q, k, v, v2): q4 rows key
    on o_orderpriority with v = order_count; q22 rows key on the
    country code with v = numcust and totacctbal riding in v2."""
    a = q4(spark, sf).select(
        F.lit("q4").alias("q"),
        F.col("o_orderpriority").alias("k"),
        F.col("order_count").cast("double").alias("v"),
        F.lit(None).cast("double").alias("v2"),
    )
    b = q22(spark, sf).select(
        F.lit("q22").alias("q"),
        F.col("cntrycode").cast("string").alias("k"),
        F.col("numcust").cast("double").alias("v"),
        F.col("totacctbal").alias("v2"),
    )
    return a.unionByName(b)


def q_tpch_scalar(spark, sf):
    """Consolidated TPC-H Q6+Q14+Q17 (registry consolidation round
    15): three lineitem-filter + exact-decimal-aggregate scalar
    shapes (pushed-filter range agg, conditional promo ratio,
    decorrelated avg-quantity threshold) merged into one
    multi-assert entry; q6/q14/q17 execute unchanged. Harmonized
    (q, k, v) — each contributes its scalar under its own key."""
    a = q6(spark, sf).select(
        F.lit("q6").alias("q"),
        F.lit("revenue").alias("k"),
        F.col("revenue").alias("v"),
    )
    b = q14(spark, sf).select(
        F.lit("q14").alias("q"),
        F.lit("promo_revenue").alias("k"),
        F.col("promo_revenue").alias("v"),
    )
    c = q17(spark, sf).select(
        F.lit("q17").alias("q"),
        F.lit("avg_yearly").alias("k"),
        F.col("avg_yearly").alias("v"),
    )
    return a.unionByName(b).unionByName(c)


def q22(spark, sf):
    """TPC-H Q22 (global sales opportunity): rich-but-inactive
    customers per nation — above-average balance (division-free:
    bal*n > sum over positive-balance customers in the nation set),
    no RECENT orders (anti-join against the post-2000 order
    window — the analog of the reference's 7-year inactivity rule).
    Balance sums in exact decimal."""
    cust = _t(spark, sf, "customer").where(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    orders = _t(spark, sf, "orders")
    stats = cust.where(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(_dec(F.col("c_acctbal"), 2)).alias("sum_pos"),
    )
    return (
        cust.crossJoin(F.broadcast(stats))
        .where(_dec(F.col("c_acctbal"), 2) * F.col("n_pos") > F.col("sum_pos"))
        .join(
            orders.where(F.col("o_orderdate") >= "2000-01-01")
            .select(F.col("o_custkey").alias("ok"))
            .dropDuplicates(),
            F.col("c_custkey") == F.col("ok"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"), 2)).cast("double").alias("totacctbal"),
        )
    )


def _events(spark, sf):
    """events.parquet has shipped `ts` as either TIMESTAMP(NANOS)
    (older testdata: the vectorized reader rejects it, so read nanos
    as long and truncate to micros — exactly what DuckDB's TIMESTAMP
    cast does) or plain TIMESTAMP/TIMESTAMP_NTZ (current testdata:
    use as-is; NTZ matches DuckDB's naive TIMESTAMP semantics, no
    session-timezone conversion on either side). Handle both.

    The schema is probed from the parquet footer with pyarrow (no
    Spark conf consulted), so on modern testdata this function never
    touches session state. Only a genuinely-nanos file sets the
    legacy reader conf — a documented one-way latch, because the conf
    must still be set when the LAZY DataFrame later executes, so a
    try/finally restore here would break the read it enables.
    Sessions we build ourselves (bench.py, tools/check_oracles.py)
    set it at construction, so even the legacy path mutates nothing
    mid-session there."""
    import glob
    import os

    import pyarrow.parquet as pq

    mkey = (id(spark), sf, "_events")
    if mkey in _READ_CACHE:
        return _READ_CACHE[mkey]
    path = os.path.join(sf, "events.parquet")
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        # Partitioned/empty layout with no top-level part files: skip
        # the footer probe (the nanos latch only matters for the flat
        # single-file testdata layout) and let the dtype fallback
        # below handle a bigint ts column.
        probe = parts[0] if parts else None
    else:
        probe = path
    ts_type = (
        dict(
            zip(
                pq.ParquetFile(probe).schema_arrow.names,
                pq.ParquetFile(probe).schema_arrow.types,
            )
        ).get("ts")
        if probe is not None
        else None
    )
    if ts_type is not None and getattr(ts_type, "unit", None) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf, "events")
    if dict(ev.dtypes).get("ts") in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _READ_CACHE[mkey] = ev
    return ev


def q_events_hourly(spark, sf):
    ev = _events(spark, sf)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("value"), 4)).cast("double").alias("sum_value"),
        )
    )


def q_sessions(spark, sf):
    """Gap-based sessionization (1h gap) — the batch twin of the
    applyInPandasWithState streaming operator in streaming/sessions.py;
    window lag + running sum, fully SQL-expressible."""
    from cayley_spark.streaming.sessions import sessionize

    ev = _events(spark, sf)
    return sessionize(
        ev, gap_seconds=3600, id_col="user_id", ts_col="ts", order_col="event_id"
    ).select("user_id", "session_start", "session_end", "n_events")


def s_overlap(spark, sf):
    """Pairwise source-overlap estimation (functions/sketch.
    source_overlap — the dataset-overlap audit a mixture plan needs,
    cf. The Pile §4): per source, the 256 smallest distinct md5
    digests of its 3-word shingle space (one Arrow kernel keeping
    per-source running minima at scan speed — no per-source window
    over the corpus, the round-13 skew-audit discipline); per source
    pair, the KMV union estimator J ≈ |U ∩ K_a ∩ K_b| / |U| (Beyer
    et al. 2007 §5.2), EXACT whenever the pair's combined shingle
    space fits the sketch. Deterministic md5 everywhere, so the
    oracle replays the sketches bit-for-bit."""
    from cayley_spark.functions.sketch import source_overlap

    docs = _t_wide(spark, sf, "documents")
    return source_overlap(docs, sketch_k=256)


def q_sessions_bucketed(spark, sf):
    """TWO-PHASE sessionization (streaming/sessions._sessionize_
    bucketed — the hot-entity scale path of q_sessions, SCALE.md
    round-13 audit): phase 1 sessionizes per (user, 15-minute
    bucket) so no task ever holds one user's whole history — the
    10^7-event bot key that would straggle the single-window form
    costs one bucket per task; phase 2 gap-merges the per-bucket
    sessions over a frame bounded by session count, not event count.
    Bit-identical to q_sessions by contract (equivalence property
    test over spiky synthetic traffic + this oracle, which is the
    q_sessions oracle verbatim). The 15-minute bucket is DELIBERATELY
    smaller than the 1 h gap, so most sessions span several buckets
    and the merge chain is actually exercised."""
    from cayley_spark.streaming.sessions import sessionize

    ev = _events(spark, sf)
    return sessionize(
        ev, gap_seconds=3600, id_col="user_id", ts_col="ts",
        order_col="event_id", bucket_seconds=900,
    ).select("user_id", "session_start", "session_end", "n_events")


def q_events_topuser(spark, sf):
    """Top event per user by value — the argmax shape. Round 13
    (VERDICT r12 #5, hot-entity skew audit): formulated as a
    map-side-combinable max_by aggregate instead of a row_number
    window. The window form serializes EVERY event of a user into
    one sorted partition task — a 10^7-event bot key becomes one
    straggler; max_by partial-aggregates per input partition first,
    so a hot key costs one combine row per partition regardless of
    its event count. Ordering (value DESC, event_id ASC) rides one
    lexicographic struct; results are bit-identical to the window
    form."""
    ev = _events(spark, sf)
    top = F.max_by(
        F.struct("event_id", "event_type"),
        F.struct(F.col("value"), -F.col("event_id")),
    )
    return ev.groupBy("user_id").agg(top.alias("__t")).select(
        "user_id",
        F.col("__t.event_id").alias("event_id"),
        F.col("__t.event_type").alias("event_type"),
    )


def q_asof(spark, sf):
    """As-of join (operators/joins.py): last-touch attribution — each
    purchase event joined to the user's latest click at-or-before it.
    Union + one window over (user_id), no join node in the plan; the
    naive formulation (inequality join + argmax) multiplies every
    purchase by its full click history. Clicks are pre-deduped to one
    per (user, ts) so the match is deterministic on both engines."""
    from pyspark.sql.window import Window

    from cayley_spark.operators.joins import asof_join

    ev = _events(spark, sf)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_cols=["click_id"]
    )
    return out.withColumnRenamed("ts_right", "click_ts")


def q_asof_bucketed(spark, sf):
    """The TWO-PHASE as-of join scale path (SCALE.md round-13 audit,
    landed round 14): the q_asof query verbatim with
    ``bucket_seconds=3600`` — phase 1 runs the running window per
    (user, 1-hour bucket) so a hot user's history never serializes
    into one sorted task, each bucket's final click carries across
    buckets through a window bounded by the user's bucket count, and
    the result coalesces (within-bucket, incoming carry).
    Bit-identical to q_asof by contract (same-ts rows share a bucket,
    so exactness semantics ride phase 1's side ordering unchanged);
    the oracle is q_asof's oracle verbatim."""
    from pyspark.sql.window import Window

    from cayley_spark.operators.joins import asof_join

    ev = _events(spark, sf)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts",
        right_cols=["click_id"], bucket_seconds=3600,
    )
    return out.withColumnRenamed("ts_right", "click_ts")


def q_asof_stream(spark, sf):
    """The STREAMING as-of join's driver oracle (VERDICT r14 #7):
    q_asof's query run through ``streaming/asof.asof_join_stream``
    over a ONE-micro-batch stream. The operator's documented
    contract is that a single-batch run reproduces the batch
    operator row-for-row (streaming/asof.py module docstring — the
    sorted fold IS the batch semantics within a batch), so the
    oracle is q_asof's SQL verbatim. Each side lands as one parquet
    file, so availableNow cannot split the data across batches; the
    work dir is wiped per call, so the file-source checkpoint never
    suppresses a re-run."""
    import os
    import shutil
    import tempfile

    from cayley_spark.streaming.asof import asof_join_stream
    from pyspark.sql.window import Window

    ev = _events(spark, sf)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.where(F.col("event_type") == "click")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    tag = os.path.basename(sf.rstrip("/")) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"cayley_q_asof_stream_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    p_dir = os.path.join(base, "probes")
    q_dir = os.path.join(base, "quotes")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    purchases.coalesce(1).write.parquet(p_dir)
    clicks.coalesce(1).write.parquet(q_dir)
    sp = spark.readStream.schema(purchases.schema).parquet(p_dir)
    sq = spark.readStream.schema(clicks.schema).parquet(q_dir)
    res = asof_join_stream(
        sp, sq, on="user_id", probe_ts="ts", quote_cols=["click_id"]
    )
    q = (
        res.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out_dir).select(
        "purchase_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("click_ts"),
        "click_id",
    )


def q_range(spark, sf):
    """Bucketed range join (operators/joins.py): every click that
    falls inside a 2-minute window opened by an error event. Interval
    flooding → plain equi-join on the bucket id; never a nested-loop
    all-pairs plan."""
    from cayley_spark.operators.joins import range_join

    ev = _events(spark, sf)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 120 SECONDS")).alias("end"),
    )
    return range_join(
        clicks, errors, point_ts="ts", bucket_seconds=120
    ).select("error_id", "click_id")


# ---------------------------------------------------------------
# text / dedup / similarity (training-data operators)
# ---------------------------------------------------------------


def t_tokens(spark, sf):
    from cayley_spark.functions.text import token_count

    docs = _t_wide(spark, sf, "documents")
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


def t_quality(spark, sf):
    from cayley_spark.functions.text import quality_stats

    return quality_stats(_t_wide(spark, sf, "documents"))


def t_fingerprint(spark, sf):
    from cayley_spark.functions.text import fingerprint

    docs = _t_wide(spark, sf, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def t_langid(spark, sf):
    from cayley_spark.functions.text import language_guess

    docs = _t_wide(spark, sf, "documents")
    return docs.select("doc_id", language_guess(F.col("text")).alias("lang_guess"))


def d_exact(spark, sf):
    from cayley_spark.functions.dedup import exact_duplicate_groups

    docs = _t_wide(spark, sf, "documents")
    g = exact_duplicate_groups(docs)
    return g.select("digest", "n_docs", F.explode("doc_ids").alias("doc_id"))


def d_lsh(spark, sf):
    """MinHash-LSH near-dup pairs with exact-Jaccard verification."""
    from cayley_spark.functions.dedup import minhash_lsh_pairs

    docs = _t_wide(spark, sf, "documents")
    return minhash_lsh_pairs(
        docs, k=3, num_hashes=16, bands=4, jaccard_threshold=0.2
    )


def d_jaccard(spark, sf):
    """Exact 2-gram Jaccard pairs, blocked by language."""
    from cayley_spark.functions.dedup import ngram_jaccard_pairs

    docs = _t_wide(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, "lang", k=2, threshold=0.35)


def d_simhash(spark, sf):
    """SimHash fingerprints (md5-hex-based, portable to the oracle)."""
    from cayley_spark.functions.dedup import simhash64

    docs = _t_wide(spark, sf, "documents")
    return docs.select("doc_id", simhash64(F.col("text"), k=2).alias("simhash"))


def d_cluster(spark, sf):
    """Duplicate clustering: connected components (min-label
    propagation) over the verified MinHash-LSH pair graph — the
    keep-one-per-cluster stage of a dedup pipeline."""
    from cayley_spark.functions.dedup import duplicate_clusters, minhash_lsh_pairs

    docs = _t_wide(spark, sf, "documents")
    pairs = minhash_lsh_pairs(
        docs, k=3, num_hashes=16, bands=4, jaccard_threshold=0.2
    ).select("id_a", "id_b")
    return duplicate_clusters(docs.select("doc_id"), pairs)


def t_redact(spark, sf):
    """PII scrub (emails/IPs/phones → typed placeholders) + per-doc
    redaction count."""
    from cayley_spark.functions.text import redaction_stats

    docs = _t_wide(spark, sf, "documents")
    return redaction_stats(docs)


def q_events_windowed(spark, sf):
    """Tumbling-window rollup via the streaming-capable operator
    (streaming/aggregates.windowed_counts) run in batch mode — the
    SAME plan incrementalizes under writeStream (append + watermark,
    test_windowed_counts_batch_vs_stream)."""
    from cayley_spark.streaming.aggregates import windowed_counts

    ev = _events(spark, sf).withColumn("value", _dec(F.col("value"), 4))
    out = windowed_counts(ev, window="1 hour")
    return out.withColumn(
        "sum_value", F.col("sum_value").cast("double")
    )


def d_dedup_corpus(spark, sf):
    """End-to-end near-dup removal: the surviving doc ids after
    LSH→verify→cluster→keep-representative (the corpus a pipeline
    would actually train on)."""
    from cayley_spark.functions.dedup import dedup_corpus

    docs = _t_wide(spark, sf, "documents")
    return dedup_corpus(
        docs, k=3, num_hashes=16, bands=4, jaccard_threshold=0.2
    ).select("doc_id")


def t_repetition(spark, sf):
    """Gopher-style repetition gates: duplicate-token and top-token
    fractions per doc, zero-shuffle (sorted-array run-length pass)."""
    from cayley_spark.functions.text import repetition_stats

    docs = _t_wide(spark, sf, "documents")
    return repetition_stats(docs)


def t_contaminate(spark, sf):
    """Benchmark decontamination: corpus docs sharing any word 5-gram
    with the benchmark slice (doc_id % 25 == 0 stands in for the eval
    set); benchmark n-gram set broadcasts."""
    from cayley_spark.functions.dedup import benchmark_contamination

    docs = _t_wide(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 25 == 0)
    corpus = docs.where(F.col("doc_id") % 25 != 0)
    return benchmark_contamination(corpus, bench, n=5)


def t_split(spark, sf):
    """Deterministic content-hash train/val/test split (1/16 val,
    1/16 test) — reproducible across runs and engines."""
    from cayley_spark.functions.sampling import hash_split

    docs = _t_wide(spark, sf, "documents")
    return hash_split(docs)


def t_bpe(spark, sf):
    """BPE-style pre-tokenization (functions/text.bpe_pretokens): the
    GPT-2 segmentation pattern in the Java∩RE2 regex subset —
    contraction suffixes, space-prefixed word/number/punct runs.
    Output: non-whitespace pre-token count + the first three
    pre-tokens (joined) per document, both hash-gated."""
    from cayley_spark.functions.text import bpe_pretokens, bpe_token_count

    docs = _t_wide(spark, sf, "documents")
    return docs.select(
        "doc_id",
        bpe_token_count(F.col("text")).alias("n_bpe"),
        F.concat_ws(
            "|", F.slice(bpe_pretokens(F.col("text")), 1, 3)
        ).alias("head_toks"),
    )


def t_html(spark, sf):
    """HTML → visible-text extraction (functions/text.html_to_text):
    each document is wrapped in a deterministic HTML shell (script +
    style + entities + nested tags) and the extractor must recover
    the title, body and decoded footer at scan speed. The wrapper is
    built identically in the oracle, so the extraction chain itself
    is what's hash-gated."""
    from cayley_spark.functions.text import html_text_stats

    docs = _t_wide(spark, sf, "documents")
    html = F.concat(
        F.lit(
            "<html><head><script>var x = 1 < 2;</script>"
            "<style>p {color: red}</style></head><body>"
            "<h1>Doc &amp; Title</h1><p>"
        ),
        F.col("text"),
        F.lit("</p><p>&#169; footer&nbsp;text &lt;end&gt;</p></body></html>"),
    )
    return html_text_stats(docs.withColumn("html", html))


def t_mixture(spark, sf):
    """Temperature-based source mixing (functions/sampling.
    source_mixture, alpha=0.5): per-source keep-rates ∝ n^alpha,
    capped at 1, applied by content-hash threshold — the standard
    multi-source re-weighting for pre-training mixes, fully
    deterministic (same survivors on any engine/partitioning)."""
    from cayley_spark.functions.sampling import source_mixture

    docs = _t_wide(spark, sf, "documents")
    return source_mixture(
        docs, source_col="source", alpha=0.5, target_frac=0.5
    ).select("doc_id", "source")


def t_mixture_up(spark, sf):
    """Source mixing with UPSAMPLING (source_mixture(upsample=True),
    alpha=0.3, target_frac=1.0): keep-rates past 1 replicate a
    source beyond one epoch — floor(rate) full copies + a
    content-hash-decided fractional copy, the published-LLM-recipe
    behavior (GPT-3/Pile mixture weights exceed natural proportions;
    Brown et al. 2020, Gao et al. 2020). The oracle replays the
    whole rule — counts, pow, rate, floor, fractional threshold,
    per-copy explode — so every (doc_id, replica) pair is pinned."""
    from cayley_spark.functions.sampling import source_mixture

    docs = _t_wide(spark, sf, "documents")
    return (
        source_mixture(
            docs,
            source_col="source",
            alpha=0.3,
            target_frac=1.0,
            upsample=True,
        )
        .select("doc_id", "source", "replica")
        .orderBy("doc_id", "replica")
    )


def t_shards(spark, sf):
    """Deterministic training-export shard assignment (functions/
    sampling.export_shards): shard = md5-hash(id) mod 16 plus an
    in-shard content-addressed sort key — a reproducible global
    shuffle with no global sort task."""
    from cayley_spark.functions.sampling import export_shards

    docs = _t_wide(spark, sf, "documents")
    return export_shards(docs, id_col="doc_id", n_shards=16, salt="x")


def t_paradedup(spark, sf):
    """Boilerplate paragraph removal (functions/text.paragraph_dedup —
    the C4/RefinedWeb rule at paragraph granularity): drop all copies
    of any paragraph appearing in >1 distinct documents, reassemble
    survivors in order. The testdata text carries no newlines, so the
    query first synthesizes 5-token paragraphs (every 5-token run's
    trailing space becomes a blank line), mirrored in the oracle —
    same pattern as t_html's synthesized markup."""
    from cayley_spark.functions.text import paragraph_dedup

    docs = _t_wide(spark, sf, "documents").withColumn(
        "text",
        F.regexp_replace("text", r"((?:\S+ ){4}\S+) ", "$1\n\n"),
    )
    return paragraph_dedup(docs, max_df=1)


def d_spans(spark, sf):
    """Verbatim cross-document span detection (functions/dedup.
    duplicated_spans — the per-doc signal of Lee et al. 2022 exact-
    substring dedup): count each document's distinct 5-word shingles
    that also appear verbatim in another document. No pair join —
    O(total shingles)."""
    from cayley_spark.functions.dedup import duplicated_spans

    docs = _t_wide(spark, sf, "documents")
    return duplicated_spans(docs, k=5, min_docs=2)


def d_trimspans(spark, sf):
    """Exact-substring REMOVAL (functions/dedup.trim_spans — the
    actionable form of d_spans, Lee et al. 2022 §3: delete the
    duplicated substring, keep the document): 5-word shingles in >=2
    distinct docs are duplicated, adjacent duplicated shingles merge
    into maximal token spans, covered tokens are dropped, and every
    document returns with its reassembled clean_text. No pair join;
    span merging is a per-doc run-length aggregate."""
    from cayley_spark.functions.dedup import trim_spans

    docs = _t_wide(spark, sf, "documents")
    return trim_spans(docs, k=5, min_docs=2)


def d_substr(spark, sf):
    """ExactSubstr dedup (functions/dedup.exact_substr_dedup; Lee et
    al. 2022 §4.1: a substring repeated verbatim in the corpus is
    removed until one copy remains — the suffix-array dedup modality,
    here as its fixed-k sliding-window Spark relaxation): 10-token
    VERBATIM windows with >=2 total occurrences (within-doc repeats
    count, unlike d_trimspans' distinct-doc threshold) are
    duplicated; the (id, pos)-smallest occurrence survives and every
    other copy is span-merged and trimmed. No pair join: one window
    explode, (count, keeper) annotated over ONE window-key shuffle
    (analytic window, not groupBy + join-back), one id-keyed trim."""
    from cayley_spark.functions.dedup import exact_substr_dedup

    docs = _t_wide(spark, sf, "documents")
    return exact_substr_dedup(docs, k=10, min_count=2)


def d_substr_against(spark, sf):
    """Asymmetric/incremental ExactSubstr (functions/dedup.
    exact_substr_against — the daily-crawl-vs-historical-corpus
    pattern of d_against in the substring modality): the doc_id % 3
    = 0 slice stands in for the already-admitted corpus, the rest is
    the new batch; every 10-token window the corpus already holds is
    removed from ALL its batch occurrences (the corpus copy is
    canonical), and windows fresh to the batch get the keep-one rule
    within it, so appending the output to the corpus preserves the
    global at-most-one-copy invariant. Never a document pair join:
    the corpus reduces to its distinct window set, the batch windows
    semi/anti-join it on the window key."""
    from cayley_spark.functions.dedup import exact_substr_against

    docs = _t_wide(spark, sf, "documents")
    ref = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0)
    return exact_substr_against(new, ref, k=10, min_count=2)


def d_substr_index(spark, sf):
    """Persisted ExactSubstr window index (functions/dedup_index.
    SubstrDedupIndex): the doc_id % 3 = 0 corpus slice is indexed
    ONCE to Parquet — distinct 64-bit window fingerprints, 8 bytes
    per corpus token, the storage order of the suffix array Lee et
    al. 2022 build — keyed by (sf dir, source-file mtime) like
    d_index, so the first call per dataset builds+saves and every
    later call LOADS; the remaining docs are trimmed against the
    FILES. Same verdict as d_substr_against: the oracle certifies
    the persisted fingerprint path reproduces the exact-string
    semantics (64-bit collisions are impossible at test scale and
    documented ≈n²/2⁶⁵ on the class at 100 TB)."""
    import hashlib
    import os

    from cayley_spark.functions.dedup_index import SubstrDedupIndex

    docs = _t_wide(spark, sf, "documents")
    ref = docs.where(F.col("doc_id") % 3 == 0)
    new = docs.where(F.col("doc_id") % 3 != 0)
    src = f"{sf}/documents.parquet"
    # k rides in the cache key: a stale cache built with another k
    # would otherwise load silently and trim in a disjoint window
    # space (meta carries k, but load() has no expected-k argument)
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:substr:k=10".encode()
    ).hexdigest()[:10]
    path = f"/tmp/cayley_substr_index_{fp}"
    # probe for genuine absence explicitly (meta is written LAST by
    # save(), so its presence marks a completed save; load() recovers
    # the wins crash window itself) — a bare except would silently
    # rebuild on transient FS errors / corrupt footers instead of
    # surfacing them (the _path_exists anti-pattern, ADVICE r11)
    from cayley_spark.streaming.sketches import _path_exists

    if not _path_exists(spark, os.path.join(path, "meta")):
        SubstrDedupIndex.build(ref, k=10).save(path)
    idx = SubstrDedupIndex.load(spark, path)
    if idx.k != 10:
        raise RuntimeError(f"cached substr index carries k={idx.k}, want 10")
    return idx.trim(new, min_count=2)


def t_rep_ngrams(spark, sf):
    """Gopher N-GRAM repetition battery (functions/text.
    repetition_ngram_stats — Rae et al. 2021 §A1.1, the n-gram half
    t_repetition's unigram gates don't cover): per (doc, n),
    LONG-format verdicts — most-frequent-n-gram char fraction for
    n=2-4 (thresholds 0.20/0.18/0.16), merged char coverage of
    duplicated n-grams for n=5-10 (0.15..0.10) — applied
    division-free (100·cov ≤ T_n·word_chars, T_n = 24−2n / 20−n).
    One explode covers all nine n; occurrence counts ride one
    (id, n, gram) window shuffle."""
    from cayley_spark.functions.text import repetition_ngram_stats

    docs = _t_wide(spark, sf, "documents")
    return repetition_ngram_stats(docs)


def q_events_agg(spark, sf):
    """Consolidated tumbling-aggregation pair q_events_hourly +
    q_events_windowed (registry consolidation, COVERAGE.md round 11
    — the same-shape merge COVERAGE scheduled ahead of the 150 cap).
    Both plans still execute end-to-end unchanged: the direct
    date_trunc groupBy AND the streaming-capable windowed_counts
    operator (whose batch plan is the one that incrementalizes under
    writeStream). Results harmonize into (q, bucket_ts, event_type,
    n, sum_value) with every original value column preserved."""
    a = q_events_hourly(spark, sf).select(
        F.lit("hourly").alias("q"),
        F.col("hour").alias("bucket_ts"),
        "event_type",
        "n",
        "sum_value",
    )
    b = q_events_windowed(spark, sf).select(
        F.lit("windowed").alias("q"),
        F.col("window_start").alias("bucket_ts"),
        "event_type",
        "n",
        "sum_value",
    )
    return a.unionByName(b)


def p_wet(spark, sf):
    """WET crawl on-ramp parse (sources/warc.py, VERDICT r13 #6):
    every documents row is rendered as an exact WARC/1.0 WET
    conversion record (synthetic segment files under /tmp, cache-keyed
    on the source parquet's mtime like p_admit's indexes; each
    text-writer row ends CR LF CR so the writer's own LF completes the
    record terminator byte-exactly), read back through the SPLITTABLE
    read_wet scan — real file I/O through the lineSep framing, the
    version guard, and the header regexps — and mapped onto the
    documents contract by wet_to_documents. Output is (source, text,
    url, record_id, content_length): the oracle derives every field
    ANALYTICALLY from the documents table (synthesized url and
    record id, host = source + '.example.com', byte length, text with
    the parser's documented trailing-newline trim) — it never replays
    the parse, so a framing or extraction bug cannot cancel out.
    doc_id is omitted: it is xxhash64-derived, which DuckDB cannot
    replay (its determinism is pinned by
    test_wet_to_documents_contract)."""
    import hashlib
    import os

    from cayley_spark.sources.warc import read_wet, wet_to_documents

    src = f"{sf}/documents.parquet"
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:wet:v1".encode()
    ).hexdigest()[:10]
    wet_dir = f"/tmp/cayley_wet_{fp}"
    from cayley_spark.streaming.sketches import _path_exists

    if not _path_exists(spark, os.path.join(wet_dir, "_SUCCESS")):
        docs = _t_wide(spark, sf, "documents")
        rec = F.concat(
            F.lit(
                "WARC/1.0\r\nWARC-Type: conversion\r\n"
                "WARC-Target-URI: https://"
            ),
            F.col("source"),
            F.lit(".example.com/"),
            F.col("doc_id").cast("string"),
            F.lit(
                "\r\nWARC-Date: 2026-01-05T10:00:00Z\r\n"
                "WARC-Record-ID: <urn:uuid:"
            ),
            F.col("doc_id").cast("string"),
            F.lit(">\r\nContent-Length: "),
            F.octet_length("text").cast("string"),
            F.lit("\r\n\r\n"),
            F.col("text"),
            F.lit("\r\n\r"),
        )
        docs.select(rec.alias("value")).write.mode("overwrite").text(
            wet_dir
        )
    return wet_to_documents(
        read_wet(spark, wet_dir),
        keep=("url", "record_id", "content_length"),
    ).drop("doc_id")


def p_pipeline(spark, sf):
    """End-to-end corpus-preparation pipeline (functions/pipeline.
    corpus_pipeline — the COMPOSITION of the individually certified
    stages, which is what a training-data team actually runs):
    language-ID -> Gopher rule battery -> C4 line cleaning (stages
    1-3 fused into ONE raw scan, survivor frame persisted) ->
    boilerplate-paragraph dedup -> ExactSubstr keep-one dedup ->
    MinHash near-dup removal -> benchmark decontamination ->
    temperature source mixing -> deterministic export shards.

    The flat testdata gets the t_paradedup structure synthesis plus
    terminal periods (every 5-token run becomes a '.'-terminated
    line + paragraph break) so the line/paragraph stages
    discriminate; the doc_id % 25 = 0 slice stands in for the
    benchmark set (the t_contaminate convention). The oracle replays
    the ENTIRE chain — every stage oracle already exists in this
    file; this entry certifies their composition (column contracts,
    stage wiring) and the plan pin certifies no stage re-scans raw
    text (tests/test_plans.py)."""
    from cayley_spark.functions.pipeline import corpus_pipeline

    docs = _t_wide(spark, sf, "documents").withColumn(
        "text",
        F.regexp_replace("text", r"((?:\S+ ){4}\S+) ", "$1.\n\n"),
    )
    bench = docs.where(F.col("doc_id") % 25 == 0)
    corpus = docs.where(F.col("doc_id") % 25 != 0)
    return corpus_pipeline(
        corpus,
        bench,
        gopher_min_words=30,
        gopher_stoplist=("the", "a", "table", "value", "row", "fast"),
        substr_k=10,
        substr_min_count=2,
        jaccard_threshold=0.2,
        alpha=0.5,
        target_frac=0.5,
        n_shards=16,
        shard_salt="x",
    )


def q_window_agg(spark, sf):
    """Consolidated window-frame pair q_rolling + q_sliding (registry
    consolidation, COVERAGE.md round 12 — the q_events_agg pattern).
    Both plans still execute end-to-end unchanged: the interval
    RANGE-frame analytic window (events per user in the preceding
    hour) AND the overlapping sliding-window generator (1h window,
    30min slide). Results harmonize into (q, event_id, user_id,
    window_start, event_type, n) with every original value column
    preserved; columns the other plan lacks are typed NULLs."""
    a = q_rolling(spark, sf).select(
        F.lit("rolling").alias("q"),
        "event_id",
        "user_id",
        F.lit(None).cast("timestamp").alias("window_start"),
        F.lit(None).cast("string").alias("event_type"),
        F.col("n_last_hour").alias("n"),
    )
    b = q_sliding(spark, sf).select(
        F.lit("sliding").alias("q"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        "window_start",
        "event_type",
        F.col("n").alias("n"),
    )
    return a.unionByName(b)


def p_admit(spark, sf):
    """Incremental corpus admission (functions/pipeline.
    admit_corpus_batch — the DAILY-BATCH form of p_pipeline, the
    reference's batch-import analog graph/kv/indexing.go:409-480):
    yesterday's corpus lives only in the two persisted indexes
    (SubstrDedupIndex window fingerprints + LSHDedupIndex MinHash
    signatures, built ONCE from the doc_id % 3 = 0 slice and cached
    on disk like d_substr_index); today's batch (the % 3 != 0 slice)
    runs quality gates fused into one scan -> ExactSubstr trim
    against the fingerprint FILES -> within-batch MinHash dedup ->
    cross-corpus LSH admission from the signature FILES ->
    benchmark decontamination (the doc_id % 25 = 0 slice, the
    t_contaminate convention). Corpus text is never re-read — the
    trim probes 8-byte fingerprints and the admission reads
    signatures. update_indexes=False keeps the entry idempotent (the
    append path is regression-tested in tests/test_pipeline.py; its
    durable-out crash discipline in the same file). Text gets the
    p_pipeline structure synthesis so the line/sentence gates
    discriminate. The oracle replays the whole chain as one CTE
    pipeline composed from the already-certified stage oracles."""
    import hashlib
    import os

    from cayley_spark.functions.dedup_index import (
        LSHDedupIndex,
        SubstrDedupIndex,
    )
    from cayley_spark.functions.pipeline import admit_corpus_batch

    docs = _t_wide(spark, sf, "documents").withColumn(
        "text",
        F.regexp_replace("text", r"((?:\S+ ){4}\S+) ", "$1.\n\n"),
    )
    bench = docs.where(F.col("doc_id") % 25 == 0)
    rest = docs.where(F.col("doc_id") % 25 != 0)
    corpus = rest.where(F.col("doc_id") % 3 == 0)
    batch = rest.where(F.col("doc_id") % 3 != 0)
    src = f"{sf}/documents.parquet"
    # both index geometries ride in the cache key (the d_substr_index
    # discipline): a stale cache built with other parameters would
    # otherwise load silently and admit in a disjoint key space
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}"
        ":admit:sk=10:lk=3:nh=16:b=4".encode()
    ).hexdigest()[:10]
    spath = f"/tmp/cayley_admit_sidx_{fp}"
    lpath = f"/tmp/cayley_admit_lidx_{fp}"
    from cayley_spark.streaming.sketches import _path_exists

    if not _path_exists(spark, os.path.join(spath, "meta")):
        SubstrDedupIndex.build(corpus, k=10).save(spath)
    if not _path_exists(spark, os.path.join(lpath, "meta")):
        LSHDedupIndex.build(corpus, k=3, num_hashes=16, bands=4).save(
            lpath
        )
    sidx = SubstrDedupIndex.load(spark, spath)
    lidx = LSHDedupIndex.load(spark, lpath)
    if sidx.k != 10 or (lidx.k, lidx.num_hashes, lidx.bands) != (3, 16, 4):
        raise RuntimeError("cached admission index geometry mismatch")
    return admit_corpus_batch(
        batch,
        sidx,
        lidx,
        bench,
        gopher_min_words=30,
        gopher_stoplist=("the", "a", "table", "value", "row", "fast"),
        substr_min_count=2,
        jaccard_threshold=0.2,
        contam_n=5,
        minhash_k=3,
        num_hashes=16,
        bands=4,
        update_indexes=False,
    )


def _synth_url():
    """Deterministic messy URL per document (six aliasing spellings
    keyed on doc_id % 6) — shared by t_urlnorm and t_domains; the
    oracles rebuild the identical strings analytically."""
    h = F.col("doc_id") % 7
    v = F.col("doc_id") % 5
    return (
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(
                F.lit("HTTP://Example"), h, F.lit(".COM/path/a/?utm_source=feed&x="), v
            ),
        )
        .when(
            F.col("doc_id") % 6 == 1,
            F.concat(
                F.lit("http://example"), h, F.lit(".com:80/path/a?x="), v,
                F.lit("&utm_campaign=z"),
            ),
        )
        .when(
            F.col("doc_id") % 6 == 2,
            F.concat(
                F.lit("https://Example"), h, F.lit(".com:443/path/b/#frag")
            ),
        )
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(F.lit("https://example"), h, F.lit(".com/path/b")),
        )
        .when(
            F.col("doc_id") % 6 == 4,
            F.concat(
                F.lit("http://example"), h, F.lit(".com/p%2fq?b=2&a="), v
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://example"), h, F.lit(".com/p%2Fq?gclid=abc&a="),
                v, F.lit("&b=2"),
            )
        )
    )


def t_urlnorm(spark, sf):
    """URL canonicalization + url-keyed crawl dedup (functions/text.
    canonicalize_url / url_dedup): the first dedup key a crawl
    pipeline applies, upstream of MinHash. The testdata has no URL
    column, so the query synthesizes one per document from doc_id —
    six deterministic messy spellings (case, :80/:443, trailing
    slash, fragments, tracking params, %-hex case, param order) that
    alias pairwise after canonicalization; the oracle builds the
    identical strings and derives each case's expected canonical form
    analytically (the m_audio regenerate-in-SQL pattern)."""
    from cayley_spark.functions.text import url_dedup

    docs = _t_wide(spark, sf, "documents")
    return url_dedup(docs.withColumn("url", _synth_url()))


def t_domains(spark, sf):
    """Per-domain corpus statistics (functions/text.domain_stats —
    the aggregation RefinedWeb-style pipelines build domain
    blocklists from): host extraction + canonical-URL dedup counts +
    per-domain character mass, over the same synthesized URL column
    as t_urlnorm. One groupBy on the host; all counters map-side
    combinable."""
    from cayley_spark.functions.text import domain_stats

    docs = _t_wide(spark, sf, "documents")
    return domain_stats(
        docs.withColumn("url", _synth_url()), chars_col="n_chars"
    )


def d_semdedup(spark, sf):
    """SemDeDup (functions/similarity.semdedup — Abbas et al. 2023):
    8-cluster kmeans over the embeddings, in-cluster cosine >= 0.43
    marks semantic duplicates, min-id survivor per twin group. The
    oracle replays the identical deterministic kmeans (2 decimal-exact
    Lloyd rounds, the s_knn_ivf pattern) and the same threshold; the
    score itself never reaches the output (d_embed precedent)."""
    from cayley_spark.functions.similarity import semdedup

    emb = _t_wide(spark, sf, "embeddings")
    return semdedup(emb, n_centroids=8, iters=2, threshold=0.43)


def d_semdedup_far(spark, sf):
    """SemDeDup with the PAPER-FAITHFUL keep rule (Abbas et al. 2023
    §3: within a twin group keep the point with lowest similarity to
    its cluster centroid — the least prototypical example). Same
    cluster-bounded plan as d_semdedup; precedence is the
    integer-scaled centroid cosine floor(cos·1e9) with id tiebreak so
    the relation is total and engine-replayable (VERDICT r8 #8 — the
    r8 opt-in rule was pytest-only; this certifies it)."""
    from cayley_spark.functions.similarity import semdedup

    emb = _t_wide(spark, sf, "embeddings")
    return semdedup(
        emb,
        n_centroids=8,
        iters=2,
        threshold=0.43,
        keep="far_from_centroid",
    )


def t_scripts(spark, sf):
    """Unicode script mix (functions/text.script_profile): exact
    integer character counts per script + digits — the script-vs-
    declared-language consistency signal."""
    from cayley_spark.functions.text import script_profile

    docs = _t_wide(spark, sf, "documents")
    return script_profile(docs)


def t_cooc(spark, sf):
    """GloVe-input co-occurrence matrix (functions/text.
    cooccurrence_counts): canonical word pairs within a ±3 window,
    integer counts — pair generation is pure array expressions at
    scan speed, the only shuffle is the final pair groupBy."""
    from cayley_spark.functions.text import cooccurrence_counts

    docs = _t_wide(spark, sf, "documents")
    return cooccurrence_counts(docs, window=3, min_count=5)


def t_tiers(spark, sf):
    """CCNet-style quality tiering (functions/text.quality_buckets):
    rank by integer stopword density, cut into 10 ntile tiers via the
    distributed-rank machinery (range partition + per-partition
    row_number + offset exchange — never a single-task global
    window). Oracle = plain SQL ntile."""
    from cayley_spark.functions.text import quality_buckets

    docs = _t_wide(spark, sf, "documents")
    return quality_buckets(docs, n_buckets=10)


def t_clean(spark, sf):
    """Normalization pass (functions/text.clean_stats): strip control
    chars, collapse whitespace, trim — regexp_replace chain at scan
    speed."""
    from cayley_spark.functions.text import clean_stats

    docs = _t_wide(spark, sf, "documents")
    return clean_stats(docs)


def t_urls(spark, sf):
    """Link-density signal (functions/text.url_stats): URL counts and
    character mass per document."""
    from cayley_spark.functions.text import url_stats

    docs = _t_wide(spark, sf, "documents")
    return url_stats(docs)


def d_against(spark, sf):
    """Asymmetric cross-corpus dedup (functions/dedup.dedup_against):
    documents from sources src10+ that near-duplicate the historical
    src0-9 corpus are dropped — the daily-crawl admission pattern.
    Depends on MinHash signatures being REPRODUCIBLE across separate
    builds (regression anchor for the lambda-arity seed bug)."""
    from cayley_spark.functions.dedup import dedup_against

    docs = _t_wide(spark, sf, "documents")
    old = [f"src{i}" for i in range(10)]
    existing = docs.where(F.col("source").isin(old))
    new = docs.where(~F.col("source").isin(old))
    return dedup_against(
        new, existing, jaccard_threshold=0.5
    ).select("doc_id", "source")


def d_bloom(spark, sf):
    """Bloom-filter cross-corpus membership (functions/bloom.py —
    Bloom 1970; the RefinedWeb-style "seen before?" primitive): a
    2^17-bit / 5-hash bloom is built over md5(text) of the English
    subset (one explode + one map-side-combinable groupBy, output
    bounded by n_bits/64 rows), packed into a single broadcast row,
    and EVERY document probes it with pure column expressions — the
    probe side never shuffles, which is the whole point at 100 TB.
    The oracle replays membership exactly via the position-set
    equivalence (all k seeded-md5 positions present in the set the
    build side populated — the bit array is just the O(1) packing of
    that set), so false positives reproduce bit-for-bit too."""
    from cayley_spark.functions.bloom import bloom_build, bloom_probe

    docs = _t_wide(spark, sf, "documents")
    key = F.md5(F.coalesce(F.col("text"), F.lit("")))
    built = bloom_build(
        docs.where(F.col("lang") == "en"), key, n_bits=1 << 17, k=5
    )
    return bloom_probe(docs, built, key, n_bits=1 << 17, k=5).select(
        "doc_id", "maybe_member"
    )


def t_bpe_train(spark, sf):
    """Distributed BPE merge LEARNING (functions/text.bpe_train —
    Sennrich et al. 2016, GPT-2 pretokens): 6 merge rounds over the
    word-type frequency table; each round is one pair-count groupBy
    (bounded by the vocabulary, never corpus text) + a 1-row
    TakeOrdered collect + one plain-string replace. Ties break
    lexicographically, so the oracle's 6 unrolled SQL iterations
    reproduce the exact merge sequence and counts."""
    from cayley_spark.functions.text import bpe_train

    docs = _t_wide(spark, sf, "documents")
    return bpe_train(docs, n_merges=6)


def t_countmin(spark, sf):
    """Count-Min heavy hitters over the token stream
    (functions/sketch.py — Cormode & Muthukrishnan 2005): the grid is
    d·w cells REGARDLESS of key cardinality (the summary you ship
    when the exact per-key groupBy is itself too big), estimates
    never under-count, and the seeded-md5 hashing makes every cell
    and estimate integer-exact under the DuckDB oracle — unlike
    HLL/datasketches blobs, which are engine-specific encodings."""
    from cayley_spark.functions.sketch import countmin_heavy_hitters
    from cayley_spark.functions.text import tokens

    docs = _t_wide(spark, sf, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return countmin_heavy_hitters(
        toks, F.col("tok"), threshold=200, depth=4, width=2048
    )


def t_dsir(spark, sf):
    """DSIR importance weights (functions/sampling.dsir_weights —
    Xie et al., NeurIPS 2023): hashed unigram+bigram bag features
    (4096 md5 buckets), categorical models over the English target
    and the full raw corpus, per-document model-count aggregation.
    The registry output is the INTEGER-EXACT core (n_grams and the
    per-doc target/raw model count sums) — the float log-weight and
    Gumbel resampling on top are pytest-verified (a float sum's
    accumulation order is engine-specific, so it cannot be
    hash-gated; the integer sums fully pin the feature pipeline and
    both models). Models are bounded by `buckets` rows regardless of
    corpus size, so both joins broadcast; no document ever pairs
    with another."""
    from cayley_spark.functions.sampling import dsir_weights

    docs = _t_wide(spark, sf, "documents")
    target = docs.where(F.col("lang") == "en")
    return dsir_weights(docs, target, buckets=4096).select(
        "doc_id", "n_grams", "target_freq_sum", "raw_freq_sum"
    )


def t_wsample(spark, sf):
    """Weighted sampling WITHOUT replacement (functions/sampling.
    weighted_sample — Gumbel top-k ≡ Efraimidis & Spirakis 2006 keys
    in log space): quality-weighted corpus subsampling with weight =
    n_chars + 1, k = 100. The Gumbel noise is seeded-md5, so the
    DuckDB oracle replays the EXACT selection; the output pins the
    selected id SET plus each id's 60-bit integer hash core (the
    continuous float key ln(w) - ln(-ln(u)) decides the top-k cut on
    both engines — a 1-ulp libm log difference cannot flip the
    boundary unless two keys land within ~1e-15, and the integer
    core pins the whole hash pipeline; same determinism contract as
    t_dsir). One TakeOrderedAndProject, no global sort."""
    from cayley_spark.functions.sampling import weighted_sample

    docs = _t_wide(spark, sf, "documents").withColumn(
        "w", (F.col("n_chars") + F.lit(1)).cast("double")
    )
    picked = weighted_sample(docs, "w", k=100, id_col="doc_id", seed="ws")
    return picked.select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    ).orderBy("doc_id")


def t_qsketch(spark, sf):
    """Bottom-k SAMPLE sketch + positional quantiles
    (functions/sketch.sample_sketch_build/_quantiles, round 14): the
    64 documents with the smallest md5(doc_id) digests form a
    content-addressed uniform sample (the KMV argument applied to a
    value-carrying sample — the quantile/distribution member of the
    sketch family, where approx_percentile would ship an opaque
    datasketch blob no other engine reads); quantiles of text length
    are selected POSITIONALLY (the q_median convention — no
    interpolation arithmetic) at ceil(q*n), so the oracle replays
    digest selection, the min-per-key duplicate rule, and the rank
    arithmetic exactly. Scale path: per-partition Arrow kernel with
    O(k) state, one corpus scan, nothing else moves."""
    from cayley_spark.functions.sketch import (
        sample_sketch_build,
        sample_sketch_quantiles,
    )

    docs = _t_wide(spark, sf, "documents")
    sk = sample_sketch_build(
        docs, F.col("doc_id"), F.length("text"), k=64
    )
    return sample_sketch_quantiles(sk, [0.1, 0.25, 0.5, 0.75, 0.9, 1.0])


def t_kmv(spark, sf):
    """KMV distinct-count sketch (functions/sketch.kmv_build —
    Bar-Yossef et al. 2002 / Beyer et al. 2007): the 128 smallest
    md5 digests of the token set, the engine-portable alternative to
    HLL blobs (state = plain hashes, set-union mergeable, exactly
    SQL-replayable). The scale path is a per-partition Arrow kernel
    holding O(k) state — the corpus is scanned once and never
    shuffled; only ≤ k rows per partition reach the merge."""
    from cayley_spark.functions.sketch import kmv_build
    from cayley_spark.functions.text import tokens

    docs = _t_wide(spark, sf, "documents")
    # (doc, token) pairs: cardinality well past k, so the sketch's
    # truncation path (not just the exact small-set mode) is what
    # the oracle certifies
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("t")
    ).select(
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("t")
        ).alias("tok")
    )
    return kmv_build(toks, F.col("tok"), k=128)


def g_lpa(spark, sf):
    """Community detection by synchronous label propagation
    (graphs/algorithms.label_propagation — Raghavan et al. 2007,
    deterministic variant: simultaneous updates, ties to the
    smallest label) over the order↔part bipartite graph, 2 rounds.
    Labels are the packed numeric node ids, so min-label ordering is
    identical in both engines; ids render to strings only in the
    final projection (the g_hits discipline)."""
    from cayley_spark.graphs.algorithms import label_propagation

    li = _t(spark, sf, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates(["src", "dst"])
    out = label_propagation(edges, iters=2)

    def rend(c):
        return F.when(
            F.col(c) % 2 == 0,
            F.concat(F.lit("o:"), (F.col(c) / 2).cast("long")),
        ).otherwise(
            F.concat(F.lit("p:"), ((F.col(c) - 1) / 2).cast("long"))
        )

    return out.select(
        rend("id").alias("id"), rend("community").alias("community")
    )


def t_perplexity(spark, sf):
    """CCNet-style LM quality filtering (functions/text.lm_perplexity
    — Wenzek et al. 2020 §3.3): word-trigram model with add-one
    smoothing trained on the corpus, per-document integer-scaled
    negative log-likelihood Σ floor(-1e6·ln p(w3|w1w2)). The float ln
    is evaluated once per DISTINCT model trigram and floored to an
    integer, so the per-doc aggregation is exact integer summation —
    fully hash-gated, unlike a float perplexity."""
    from cayley_spark.functions.text import lm_perplexity

    docs = _t_wide(spark, sf, "documents")
    return lm_perplexity(docs)


def t_qscore(spark, sf):
    """Model-based quality scoring, fastText-shaped (functions/text.
    hashed_linear_score — Joulin et al. 2017; the GPT-3 CommonCrawl
    filter was exactly such a linear classifier, Brown et al. 2020
    appendix A): hashed unigram+bigram features (the DSIR feature
    map) × a broadcast integer weight table, reduced per document.
    The registry weights are a deterministic synthetic model
    (weight = bucket % 97 - 48) so the oracle derives every weight
    analytically; a trained model's quantized weights drop into the
    same table."""
    from cayley_spark.functions.text import hashed_linear_score

    docs = _t_wide(spark, sf, "documents")
    weights = spark.range(8192).select(
        F.col("id").alias("bucket"),
        ((F.col("id") % 97) - 48).cast("long").alias("weight"),
    )
    return hashed_linear_score(docs, weights, buckets=8192)


def t_perplexity_ext(spark, sf):
    """CCNet-FAITHFUL LM filtering (functions/text.lm_perplexity with
    model= — Wenzek et al. 2020 §3.3 train on a clean REFERENCE
    corpus, score the target): the trigram model is trained only on
    the doc_id % 5 = 0 slice (the stand-in for Wikipedia) via
    lm_train_trigram, then every document is scored against it with
    a broadcast model join; trigrams absent from the model cost the
    explicit default_nll (20·scale ≡ ln p = -20). Because the
    reference-corpus model is fixed-size w.r.t. the target, the
    100 TB scoring plan touches the corpus exactly twice with a
    BroadcastHashJoin in between — no corpus-keyed join shuffle
    (plan-pinned, tests/test_plans.py)."""
    from cayley_spark.functions.text import lm_perplexity, lm_train_trigram

    docs = _t_wide(spark, sf, "documents")
    ref = docs.where(F.col("doc_id") % 5 == 0)
    model = lm_train_trigram(ref)
    return lm_perplexity(
        docs, model=model, default_nll=20_000_000, broadcast_model=True
    )


def t_qtrain(spark, sf):
    """In-engine trainer for the GPT-3-style quality filter
    (functions/text.hashed_linear_train — Brown et al. 2020 appendix
    A fit a linear classifier on curated-vs-crawl labels): integer
    batch perceptron, 2 epochs, over hashed unigram+bigram features;
    labels are the deterministic doc_id parity split (+1 even / -1
    odd) so the oracle can unroll both epochs analytically. Output =
    the non-zero (bucket, weight) rows hashed_linear_score consumes.
    Per epoch: broadcast weight join + one groupBy(id) shuffle + a
    map-side-combinable groupBy(bucket); driver traffic is ≤ buckets
    rows per epoch (the BPE-trainer discipline)."""
    from cayley_spark.functions.text import hashed_linear_train

    docs = _t_wide(spark, sf, "documents").select(
        "doc_id",
        "text",
        ((F.col("doc_id") % 2) * 2 - 1).cast("int").alias("label"),
    )
    return hashed_linear_train(docs, buckets=8192, epochs=2)


def t_gopher_lines(spark, sf):
    """Gopher LINE-level rules (functions/text.gopher_rules —
    Rae et al. 2021 appendix A: drop docs with >90% bullet-start or
    >30% ellipsis-end lines, the two rules real pipelines hit most
    on web text). The flat testdata has no newlines, so the entry
    synthesizes deterministic line structure first: doc_id % 3 = 0
    docs become all-bullet lists (fail the bullet rule), % 3 = 1
    docs end every line with an ellipsis (fail the ellipsis rule),
    the rest get plain multi-line bodies (pass). Division-free
    threshold comparisons, same expression shape as the other
    rules."""
    from cayley_spark.functions.text import gopher_rules

    docs = _t_wide(spark, sf, "documents").select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 3 = 0"
            "  THEN '- ' || replace(text, ' ', chr(10) || '- ')"
            " WHEN doc_id % 3 = 1"
            "  THEN replace(text, ' ', '...' || chr(10))"
            " ELSE replace(text, ' join', chr(10) || 'join') END"
        ).alias("text"),
    )
    out = gopher_rules(docs, min_words=1)
    return out.select(
        "doc_id",
        "n_lines",
        "n_bullet_lines",
        "n_ellipsis_lines",
        "ok_bullet_lines",
        "ok_ellipsis_lines",
    )


def t_c4(spark, sf):
    """C4 cleaning battery (functions/text.c4_rules — Raffel et al.
    2020 §2.2, the T5-corpus filter set): line retention by terminal
    punctuation + minimum words, sentence-count gate, lorem-ipsum
    and curly-brace page drops, plus the cleaned text itself. The
    flat testdata gets deterministic structure first: doc_id % 4 = 0
    docs become multi-line prose with terminal periods (mostly
    keepable), % 4 = 1 gain a literal brace (drop), % 4 = 2 lead
    with lorem ipsum (drop), % 4 = 3 stay flat and unpunctuated
    (no surviving lines). Pure column expressions at scan speed."""
    from cayley_spark.functions.text import c4_rules

    docs = _t_wide(spark, sf, "documents").select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 4 = 0"
            "  THEN replace(text, ' row', '.' || chr(10)) || '.'"
            " WHEN doc_id % 4 = 1 THEN text || ' {x}'"
            " WHEN doc_id % 4 = 2"
            "  THEN 'lorem ipsum ' || replace(text, ' row', '.' ||"
            " chr(10)) || '.'"
            " ELSE text END"
        ).alias("text"),
    )
    return c4_rules(docs)


def t_entropy(spark, sf):
    """Per-document unigram Shannon entropy (functions/text.
    token_entropy — Shannon 1948; the cheap repetitiveness signal
    quality pipelines use to drop templated/keyboard-mash pages):
    integer-scaled Σ c_w·floor(scale·ln(N/c_w)) with the ln floored
    once per distinct (doc, token) row, so the sums hash-gate
    exactly. One count shuffle + a window that the final per-doc agg
    rides — no joins, no model."""
    from cayley_spark.functions.text import token_entropy

    docs = _t_wide(spark, sf, "documents")
    return token_entropy(docs)


def t_gopher(spark, sf):
    """Gopher quality-rule battery (functions/text.gopher_rules —
    Rae et al. 2021 appendix A, the MassiveWeb filter set later
    pipelines reuse): per-doc boolean verdicts for word count, mean
    word length, symbol ratio, alphabetic-word fraction, stopword
    presence, plus the conjunction — all division-free integer
    comparisons, so every verdict hash-gates exactly."""
    from cayley_spark.functions.text import gopher_rules

    docs = _t_wide(spark, sf, "documents")
    # corpus-apt stop list (the synthetic vocabulary has only two of
    # the paper's English function words) so every rule DISCRIMINATES
    # on this corpus instead of uniformly failing the conjunction
    return gopher_rules(
        docs,
        min_words=30,
        stoplist=("the", "a", "table", "value", "row", "fast"),
    )


def g_ppr(spark, sf):
    """Personalized PageRank (graphs/algorithms.personalized_pagerank
    — Page et al. 1999 §6, Jeh & Widom 2003) over the order↔part
    bipartite graph, seeded at the two smallest order nodes, 2
    rounds: teleport mass lands only on the seeds, so ranks measure
    proximity to them (the similar-node primitive). Integer
    fixed-point (the g_pagerank discipline); the seed set is a
    literal isin — the graph never joins against it."""
    from cayley_spark.graphs.algorithms import personalized_pagerank

    li = _t(spark, sf, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates(["src", "dst"])
    seeds = [
        int(r[0])
        for r in edges.select("src")
        .dropDuplicates(["src"])
        .orderBy("src")
        .limit(2)
        .collect()
    ]
    pr = personalized_pagerank(edges, seeds, iters=2)
    id_str = F.when(
        F.col("id") % 2 == 0,
        F.concat(F.lit("o:"), (F.col("id") / 2).cast("long")),
    ).otherwise(
        F.concat(F.lit("p:"), ((F.col("id") - 1) / 2).cast("long"))
    )
    return pr.select(id_str.alias("id"), "rank")


def d_index(spark, sf):
    """Persisted cross-corpus dedup index (functions/dedup_index.
    LSHDedupIndex): the src0-9 historical corpus is indexed ONCE to
    Parquet — keyed by (sf dir, source-file mtime), so the first
    call per dataset builds+saves and every later call LOADS — and
    the src10+ batch is admitted against the saved signatures. Same
    verdict as d_against, but the existing side comes from index
    files, never a recompute: the warm number measures pure
    admission, the daily-batch cost that matters at 100 TB, and the
    oracle certifies the persisted representation."""
    import hashlib
    import os

    from cayley_spark.functions.dedup_index import LSHDedupIndex

    docs = _t_wide(spark, sf, "documents")
    old = [f"src{i}" for i in range(10)]
    existing = docs.where(F.col("source").isin(old))
    new = docs.where(~F.col("source").isin(old))
    src = f"{sf}/documents.parquet"
    fp = hashlib.md5(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    path = f"/tmp/cayley_dedup_index_{fp}"
    # explicit-absence probe, same rationale as d_substr_index: meta
    # is written last, so its presence marks a completed save
    from cayley_spark.streaming.sketches import _path_exists

    if not _path_exists(spark, os.path.join(path, "meta")):
        LSHDedupIndex.build(existing, k=3, num_hashes=16, bands=4).save(path)
    idx = LSHDedupIndex.load(spark, path)
    return idx.dedup(new, jaccard_threshold=0.5).select("doc_id", "source")


def d_neardup(spark, sf):
    """Batch twin of the STREAMING near-dup operator
    (streaming/neardup.neardup_pairs_batch): banded LSH self-join
    with the MinHash component-match ESTIMATOR (matching signature
    slots / 16) instead of exact shingle verification — the verify
    path that needs no text re-read, certifying the same estimator
    the stateful stream applies against bucket state. Constant ts:
    arrival order falls to doc_id."""
    from cayley_spark.streaming.neardup import neardup_pairs_batch

    docs = _t_wide(spark, sf, "documents").withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    return neardup_pairs_batch(docs, threshold=0.5)


def d_editdist(spark, sf):
    """Near-dup pairs verified by EDIT DISTANCE (integer-exact, both
    engines have a levenshtein builtin): LSH candidates only — the
    O(len^2)-per-pair verifier never sees the cross product."""
    from cayley_spark.functions.dedup import editdist_dup_pairs

    docs = _t_wide(spark, sf, "documents")
    return editdist_dup_pairs(
        docs, max_dist=50, k=3, num_hashes=16, bands=4
    )


def t_postings(spark, sf):
    """Inverted-index materialization (functions/text.inverted_index):
    term → document frequency + sorted posting list (serialized to a
    string so the cross-engine hash compares exactly)."""
    from cayley_spark.functions.text import inverted_index

    docs = _t_wide(spark, sf, "documents")
    idx = inverted_index(docs)
    return idx.select(
        "term",
        "df",
        F.array_join(F.col("postings"), ",").alias("postings"),
    )


def t_tfidf(spark, sf):
    """Top-3 characteristic terms per document by TF-IDF
    (functions/text.tf_idf_top_terms). idf='inv' keeps the score a
    single int-multiply + IEEE division so the ranking is
    bit-reproducible across engines (ln is libm-ulp-variant)."""
    from cayley_spark.functions.text import tf_idf_top_terms

    docs = _t_wide(spark, sf, "documents")
    return tf_idf_top_terms(docs, k=3, idf="inv")


def t_vocab(spark, sf):
    """Corpus vocabulary, top 50 terms by occurrence count — the
    tokenizer-training / vocab-cap primitive."""
    from cayley_spark.functions.text import vocabulary

    docs = _t_wide(spark, sf, "documents")
    return vocabulary(docs, top=50)


def t_trigram_lm(spark, sf):
    """Char-trigram corpus-typicality score (the integer-exact
    skeleton of n-gram-LM perplexity quality filtering)."""
    from cayley_spark.functions.text import trigram_typicality

    docs = _t_wide(spark, sf, "documents")
    return trigram_typicality(docs)


def q_stratified(spark, sf):
    """Deterministic stratified sample: 20 events per event_type,
    selected by content-addressed hash order (same rows on every
    engine and run). Round 13 exercises the TWO-PHASE salted form
    (SCALE.md hot-stratum audit: phase 1 takes the top-n per
    (stratum, 8-way salt), phase 2 re-ranks ≤ 8×20 survivors per
    stratum) — bit-identical to the single-window form by contract,
    so the oracle is unchanged."""
    from cayley_spark.functions.sampling import stratified_sample

    ev = _events(spark, sf)
    return stratified_sample(
        ev, "event_type", 20, "event_id", salt_buckets=8
    ).select("event_id", "event_type", "user_id")


def t_chunks(spark, sf):
    """Fixed-size overlapping character chunking (retrieval-index /
    long-doc primitive) — scan-speed posexplode, no shuffle."""
    from cayley_spark.functions.chunking import chunk_documents

    docs = _t_wide(spark, sf, "documents")
    return chunk_documents(docs, chunk_chars=200, overlap=50)


def t_pack(spark, sf):
    """Concat-then-slice sequence packing via a distributed prefix
    sum (range partition + local cumsum + per-partition offsets) —
    never a single-partition global window."""
    from cayley_spark.functions.chunking import pack_sequences

    docs = _t_wide(spark, sf, "documents")
    return pack_sequences(docs, budget=1000)


def q_cube(spark, sf):
    """CUBE grouping: all four aggregation combinations of
    (event_type, is_weekend) in one pass."""
    ev = _events(spark, sf)
    wd = F.dayofweek(F.col("ts")).isin(1, 7).cast("int")
    return (
        ev.select("event_type", wd.alias("is_weekend"), "value")
        .cube("event_type", "is_weekend")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("value"), 4)).cast("double").alias("sum_value"),
        )
    )


def q_wau(spark, sf):
    """Trailing-7-day active users per day: windowed COUNT(DISTINCT)
    is not a window aggregate in any engine, so each (user, day)
    activity floods the 7 report days it contributes to (the same
    interval-flooding shape as the range join) and a plain distinct
    group-by finishes — bounded 7x row expansion, no self-join."""
    ev = _events(spark, sf)
    day = F.date_trunc("day", F.col("ts"))
    act = ev.select("user_id", day.alias("day")).dropDuplicates()
    days = ev.select(day.alias("report_day")).dropDuplicates()
    flooded = act.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    return (
        flooded.join(days, "report_day", "left_semi")
        .dropDuplicates(["report_day", "user_id"])
        .groupBy("report_day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )


def q_antijoin(spark, sf):
    """NOT EXISTS → left-anti join: customers with no 1996 order.
    Catalyst builds the hash side from the filtered orders slice."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    o96 = orders.where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        cust.join(o96, "c_custkey", "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


def q_rolling(spark, sf):
    """Interval range-frame window: for each event, how many events
    the same user fired in the preceding hour (inclusive of now).
    The frame is RANGE over event-time seconds — order-only frames
    (ROWS) can't express a time horizon."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf)
    secs = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-3_600_000_000 + 1, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


def q_json(spark, sf):
    """Semi-structured extraction: parse the props JSON column
    (from_json with an explicit schema — vectorized JVM path, not a
    per-row UDF) and aggregate the typed field."""
    ev = _events(spark, sf)
    k = F.from_json(F.col("props"), "k int")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_sliding(spark, sf):
    """Sliding-window counts (1h window, 30min slide): every event
    lands in exactly two overlapping windows — the built-in window()
    generator, incrementalizable under a watermark unchanged."""
    ev = _events(spark, sf)
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def q_session_window(spark, sf):
    """Spark's NATIVE session_window aggregation (1h gap) — the
    built-in twin of the manual lag/cumsum sessionization
    (q_sessions); both hash-match the same oracle."""
    ev = _events(spark, sf)
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "1 hour").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def q_retention(spark, sf):
    """Cohort retention: users grouped by first-active day; for each
    (cohort_day, day_offset) the count of distinct users active
    offset days later — the standard events-warehouse rollup, built
    from one window min + one dedup + one group-by."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf)
    w = Window.partitionBy("user_id")
    d = F.date_trunc("day", F.col("ts"))
    act = (
        ev.select("user_id", d.alias("day"))
        .withColumn("cohort_day", F.min("day").over(w))
        .dropDuplicates(["user_id", "day"])
    )
    return (
        act.groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_funnel(spark, sf):
    """Ordered funnel: per user, first signup -> first click after it
    -> first purchase after that; one row of stage counts. Built from
    conditional min-aggregations — one shuffle, no self-joins."""
    ev = _events(spark, sf)
    t = F.col("ts")
    k = F.col("event_type")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(k == "signup", t)).alias("t_signup"),
    )
    # first click strictly after the user's first signup, then first
    # purchase strictly after that click: two more conditional mins
    ev2 = ev.join(per_user, "user_id")
    per_user2 = ev2.groupBy("user_id", "t_signup").agg(
        F.min(
            F.when((k == "click") & (t > F.col("t_signup")), t)
        ).alias("t_click")
    )
    ev3 = ev.join(per_user2, "user_id")
    per_user3 = ev3.groupBy("user_id", "t_signup", "t_click").agg(
        F.min(
            F.when((k == "purchase") & (t > F.col("t_click")), t)
        ).alias("t_purchase")
    )
    return per_user3.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_click_after"),
        F.count("t_purchase").alias("n_purchase_after"),
    )


def g_triangles(spark, sf):
    """Triangle count over the undirected parts-bought-together graph
    (parts co-occurring in an order), via DEGREE-ORIENTED wedge
    counting (compact-forward): every edge is directed from its
    lower-(degree, id) endpoint to the higher one, wedges are pairs
    of out-edges, and a wedge closes iff its far endpoints are a
    directed edge. The id-ordered formulation's wedge count is
    Σ deg² — a hub vertex alone can explode it — while orientation
    bounds out-degrees by O(√m), the arboricity bound (Schank &
    Wagner 2005 "forward"; Latapy 2008 "compact-forward"), which is
    why it's THE distributed triangle algorithm (now a library
    operator: graphs/algorithms.triangles, also exposed as
    GraphStore.triangle_count)."""
    from cayley_spark.graphs.algorithms import triangles

    li = _t(spark, sf, "lineitem")
    op = li.select("l_orderkey", "l_partkey").dropDuplicates()
    a, b = op.alias("a"), op.alias("b")
    cooc = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return triangles(cooc)


def m_image(spark, sf):
    """Multimodal image decode through the Arrow-batched mapInPandas
    kernel (functions/multimodal.py): the deterministic netpbm
    fixtures have closed-form metadata (32x24 RGB P6), so the REAL
    distributed decode path gets a full rows+schema+hash oracle —
    the oracle recomputes the expected table from constants."""
    from cayley_spark.functions.multimodal import (
        decode_image_info,
        synthetic_media,
    )

    media = synthetic_media(spark, n=300)
    return decode_image_info(media.where(F.col("kind") == "image"))


def m_dhash(spark, sf):
    """Perceptual image hashing through the REAL distributed netpbm
    decode + dHash kernel (functions/multimodal.image_dhash): the
    synthetic gradient images all share one dHash by construction
    (x-monotone luminance ⇒ all 64 gradient bits set ⇒ signed -1),
    so the oracle recomputes the expected table from constants —
    the hash-gate certifies the decode + pooling + bit-packing
    pipeline row-for-row."""
    from cayley_spark.functions.multimodal import image_dhash, synthetic_media

    media = synthetic_media(spark, n=300)
    return image_dhash(media.where(F.col("kind") == "image"))


def m_audio_segments(spark, sf):
    """Per-segment audio activity (functions/multimodal.
    audio_segments) through the REAL PCM decode: the synthetic
    corpus is pure sine tones with frequency a closed-form function
    of doc_id, so the ORACLE REGENERATES THE SAMPLES IN SQL
    (trunc(sin(2π f i / rate) * 12000) matches numpy's
    truncate-toward-zero int16 cast) and aggregates the identical
    exact-integer features — the strongest multimodal gate in the
    suite: every sample of every row is re-derived independently."""
    from cayley_spark.functions.multimodal import (
        audio_segments,
        synthetic_media,
    )

    media = synthetic_media(spark, n=120)
    return audio_segments(media.where(F.col("kind") == "audio"))


def m_audio(spark, sf):
    """Multimodal WAV decode (real stdlib/numpy kernel) — integer
    metadata columns only, so the oracle hash is exact."""
    from cayley_spark.functions.multimodal import (
        decode_audio_info,
        synthetic_media,
    )

    media = synthetic_media(spark, n=300)
    return decode_audio_info(media.where(F.col("kind") == "audio")).select(
        "doc_id", "sample_rate", "channels", "duration_ms"
    )


def q_median(spark, sf):
    """Exact discrete (lower) median of value per event_type: the
    row at position ceil(n/2) in (value, event_id) order — picked,
    not interpolated, so no float arithmetic can diverge between
    engines."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value"), F.col("event_id")
    )
    cnt = Window.partitionBy("event_type")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(cnt))
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("value").alias("median_value"))
    )


def g_degrees(spark, sf):
    """Degree distribution of the order→part graph: (degree,
    n_nodes) histogram — two keyed aggregations, the basic
    graph-stats primitive. Node ids are packed into disjoint LONG
    spaces (order → 2k, part → 2k+1): integer shuffle keys, not
    string concats — the output carries no ids, so the encoding is
    free (measured ~35% faster than string keys at sf0.1)."""
    li = _t(spark, sf, "lineitem")
    edges = li.select("l_orderkey", "l_partkey").dropDuplicates()
    deg = (
        edges.select((F.col("l_orderkey") * 2).alias("n"))
        .unionAll(edges.select((F.col("l_partkey") * 2 + 1).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def g_predstats(spark, sf):
    """Per-predicate quad counts (GraphStore.predicate_stats) — the
    reference Stats surface extended per predicate: the statistics a
    cost-based join order keys on. Oracle = the closed-form
    relational count of each edge branch in graphs/tpch.py."""
    from cayley_spark.graphs.tpch import tpch_graph

    return tpch_graph(spark, sf).predicate_stats()


def g_walks(spark, sf):
    """DeepWalk-style deterministic random-walk corpus
    (graphs/algorithms.random_walks) over the symmetrized order↔part
    graph — the sampling stage of graph-embedding training. Seeded
    md5 argmin stands in for the RNG, so the DuckDB oracle replays
    every hop exactly (4 unrolled rounds)."""
    from cayley_spark.graphs.algorithms import random_walks

    li = _t(spark, sf, "lineitem")
    fwd = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    return random_walks(edges, walk_length=4, seed="w")


def g_pagerank(spark, sf):
    """Fixed-point PageRank (graphs/algorithms.py) over the
    order→part bipartite graph from lineitem. Integer-scaled ranks
    with truncating division make every iteration bit-identical
    across engines — float PageRank is summation-order dependent and
    can never hash-match a single-threaded oracle."""
    from cayley_spark.graphs.algorithms import pagerank

    li = _t(spark, sf, "lineitem")
    # every iteration shuffles on the node id: pack orders/parts into
    # disjoint LONG spaces (2k / 2k+1) so the 3x(join+agg) loop moves
    # 8-byte keys, and render the "o:"/"p:" string form only in the
    # one final projection (measured ~35% faster at sf0.1; ranks are
    # identical — the graphs are isomorphic and rank arithmetic never
    # reads the id)
    edges = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates(["src", "dst"])
    ranks = pagerank(edges, iters=3)
    id_str = F.when(
        F.col("id") % 2 == 0,
        F.concat(F.lit("o:"), (F.col("id") / 2).cast("long")),
    ).otherwise(
        F.concat(F.lit("p:"), ((F.col("id") - 1) / 2).cast("long"))
    )
    return ranks.select(id_str.alias("id"), "rank")


def g_hits(spark, sf):
    """Fixed-point HITS hubs & authorities (graphs/algorithms.hits,
    Kleinberg 1999) over the order→part bipartite graph. Integer
    scores with truncating max-normalization per half-step make every
    iteration bit-identical across engines (the g_pagerank
    determinism discipline); same packed-long internal ids, string
    render only in the final projection."""
    from cayley_spark.graphs.algorithms import hits

    li = _t(spark, sf, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).dropDuplicates(["src", "dst"])
    hs = hits(edges, iters=2)
    id_str = F.when(
        F.col("id") % 2 == 0,
        F.concat(F.lit("o:"), (F.col("id") / 2).cast("long")),
    ).otherwise(
        F.concat(F.lit("p:"), ((F.col("id") - 1) / 2).cast("long"))
    )
    return hs.select(id_str.alias("id"), "hub", "authority")


def s_kcenter(spark, sf):
    """Greedy k-center coreset selection (functions/similarity.
    kcenter_sample — Sener & Savarese 2018 farthest-point sampling)
    over the embeddings: 6 diverse representatives, deterministic
    (min-id seed, id tie-break, sequential-fold distances). The
    oracle unrolls the 5 greedy rounds with correlated MIN-distance
    subqueries over the growing selected set."""
    from cayley_spark.functions.similarity import kcenter_sample

    emb = _t_wide(spark, sf, "embeddings")
    return kcenter_sample(emb, k=6)


def q_rollup(spark, sf):
    """OLAP rollup: (day, event_type) with per-day and grand
    subtotals — Spark's rollup() mirrors ANSI GROUP BY ROLLUP."""
    ev = _events(spark, sf)
    return ev.rollup(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("value"), 4)).cast("double").alias("sum_value"),
    )


def q_pivot(spark, sf):
    """Pivot: per-user event counts spread across one column per
    event type (explicit value list keeps the schema deterministic)."""
    ev = _events(spark, sf)
    types = ["click", "error", "purchase", "signup", "view"]
    return ev.groupBy("user_id").pivot("event_type", types).count()


def g_recursive_dist(spark, sf):
    """FollowRecursive forced onto the DISTRIBUTED frontier loop
    (collect budget 0), so the oracle gate checks both recursion
    executors — the adaptive driver BFS (g_recursive) and this one —
    against the same WITH RECURSIVE SQL."""
    g = tpch_graph(spark, sf)
    spark.conf.set("spark.cayley.recursive.collectBudget", "0")
    try:
        return (
            Path.start(g, IRI("nation:0"))
            .follow_recursive(IRI("next"), depth_tag="depth")
            .values_df()
        )
    finally:
        spark.conf.unset("spark.cayley.recursive.collectBudget")


def d_embed(spark, sf):
    """Embedding-cosine near-dup pairs: hyperplane-LSH candidates
    verified with exact cosine (threshold chosen for the synthetic
    embeddings' score range)."""
    from cayley_spark.functions.similarity import embedding_dup_pairs

    emb = _t_wide(spark, sf, "embeddings")
    return embedding_dup_pairs(emb, threshold=0.4).select("id_a", "id_b")


KNN_QUERIES = [0, 1, 2]


def s_knn(spark, sf):
    from cayley_spark.functions.similarity import cosine_topk

    emb = _t_wide(spark, sf, "embeddings")
    return cosine_topk(emb, KNN_QUERIES, k=5).select("query_id", "neighbor_id")


def s_knn_lsh(spark, sf):
    """Hyperplane-LSH ANN (approximate; rows-only check)."""
    from cayley_spark.functions.similarity import lsh_topk

    emb = _t_wide(spark, sf, "embeddings")
    return lsh_topk(emb, KNN_QUERIES, k=5).select("query_id", "neighbor_id")


def s_knn_ivf(spark, sf):
    """IVF ANN: kmeans-bucketed index, nprobe-bucket search
    (approximate; rows-only check)."""
    from cayley_spark.functions.similarity import ivf_topk

    emb = _t_wide(spark, sf, "embeddings")
    return ivf_topk(emb, KNN_QUERIES, k=5).select("query_id", "neighbor_id")


def s_knn_quant(spark, sf):
    """Exact top-k cosine over INT8-QUANTIZED embeddings
    (functions/similarity.quantized_topk): scales cancel out of
    cosine, so the ranking is a deterministic function of exact
    integer dot products — hash-gateable, unlike float-accumulated
    cosine."""
    from cayley_spark.functions.similarity import quantized_topk

    emb = _t_wide(spark, sf, "embeddings")
    return quantized_topk(emb, KNN_QUERIES, k=5).select(
        "query_id", "neighbor_id"
    )


# ---------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return g_tags(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry, ordered for the driver's 50-query oracle window.

    The driver verifies the FIRST 50 entries in dict order, so ordering
    is evidence policy (a CONTINUOUS ROTATION, documented in
    COVERAGE.md): entries with no driver verdict yet go first, then
    entries whose code changed since their last verdict, then the
    entries whose last green verdict is OLDEST; entries green in the
    immediately previous round go last (they retain pytest +
    tools/check_oracles.py coverage while they wait).

    ROUND-16 WINDOW (executed per the COVERAGE.md round-15
    arithmetic; an optimization round — no new registrations, no
    entry removed, reorder only): rule 3 leads with the 10 entries
    whose operator code changed this round — the quality-battery and
    URL-canonicalization expression-binding family (t_gopher,
    t_gopher_lines, t_c4, t_urlnorm, t_domains), the bytes-sized
    iteration pins (g_pagerank, g_hits, g_ppr, g_lpa), and the
    per-(doc,trigram) count compression (t_trigram_lm). Then the
    r13-green cohort at the 3-round rotation ceiling: the 8 fills the
    r15 restoration displaced (p_admit .. t_perplexity_ext) plus 32
    of the r13 remainder complete the 50 — this cohort naturally
    contains most of the round's other changed operators (p_admit,
    p_pipeline, d_index, t_perplexity, d_against, d_neardup,
    d_simhash, t_langid, t_dsir). The 9 UNCHANGED r13 entries the
    jumps displaced (s_knn, t_tokens, t_quality, t_fingerprint,
    t_bpe_train, t_countmin, t_redact, t_repetition, t_contaminate)
    sit at positions 51-59 and lead the next rotation; the r14
    cohort follows; r15-green entries sit last (rule 4).
    Registry = 147, unchanged from round 15.
    """
    return {
        # --- rule-3 jumps: operator code changed this round (r16) after
        # --- their last green verdict — quality-battery + URL-canonical
        # --- expression binding (t_gopher/t_gopher_lines/t_c4/t_urlnorm/
        # --- t_domains), bytes-sized iteration pins (g_pagerank/g_hits/
        # --- g_ppr/g_lpa), per-(doc,trigram) count compression
        # --- (t_trigram_lm) -------------------------------------------
        "t_gopher": t_gopher,
        "t_gopher_lines": t_gopher_lines,
        "t_c4": t_c4,
        "t_urlnorm": t_urlnorm,
        "t_domains": t_domains,
        "g_pagerank": g_pagerank,
        "g_hits": g_hits,
        "g_ppr": g_ppr,
        "g_lpa": g_lpa,
        "t_trigram_lm": t_trigram_lm,
        # --- green in round 13, 3 rounds stale = the rotation ceiling:
        # --- the 8 fills the r15 restoration displaced lead, then the
        # --- r13 remainder in registry order; the entries this round
        # --- also CHANGED (p_admit, p_pipeline, d_index, t_perplexity
        # --- (_ext), d_against, d_neardup, d_simhash, t_langid, t_dsir,
        # --- d_jaccard sizing callers) sit here naturally --------------
        "p_admit": p_admit,
        "q_sessions_bucketed": q_sessions_bucketed,
        "p_pipeline": p_pipeline,
        "t_shards": t_shards,
        "d_index": d_index,
        "q_events_topuser": q_events_topuser,
        "q_sessions": q_sessions,
        "t_perplexity_ext": t_perplexity_ext,
        "t_qtrain": t_qtrain,
        "t_entropy": t_entropy,
        "q_tpch_rev": q_tpch_rev,
        "q_tpch_mix1": q_tpch_mix1,
        "t_perplexity": t_perplexity,
        "q_cube": q_cube,
        "q_wau": q_wau,
        "q_session_window": q_session_window,
        "d_lsh": d_lsh,
        "d_against": d_against,
        "d_neardup": d_neardup,
        "t_html": t_html,
        "t_mixture": t_mixture,
        "g_triangles": g_triangles,
        "g_degrees": g_degrees,
        "g_predstats": g_predstats,
        "m_dhash": m_dhash,
        "m_audio_segments": m_audio_segments,
        "q_retention": q_retention,
        "q_funnel": q_funnel,
        "q_stratified": q_stratified,
        "d_exact": d_exact,
        "d_editdist": d_editdist,
        "d_simhash": d_simhash,
        "d_cluster": d_cluster,
        "d_dedup_corpus": d_dedup_corpus,
        "d_embed": d_embed,
        "s_knn_lsh": s_knn_lsh,
        "s_knn_ivf": s_knn_ivf,
        "t_langid": t_langid,
        "t_dsir": t_dsir,
        "d_jaccard": d_jaccard,
        # --- r13-green, UNCHANGED this round — displaced from the window
        # --- by the rule-3 jumps (the window caps at 50); they lead the
        # --- next round's rotation ------------------------------------
        "s_knn": s_knn,
        "t_tokens": t_tokens,
        "t_quality": t_quality,
        "t_fingerprint": t_fingerprint,
        "t_bpe_train": t_bpe_train,
        "t_countmin": t_countmin,
        "t_redact": t_redact,
        "t_repetition": t_repetition,
        "t_contaminate": t_contaminate,
        # --- green in round 14 (t_trigram_lm jumped out by rule 3);
        # --- rotate into the next window ------------------------------
        "s_overlap": s_overlap,
        "q_asof_bucketed": q_asof_bucketed,
        "p_wet": p_wet,
        "t_qsketch": t_qsketch,
        "q_asof": q_asof,
        "t_rep_ngrams": t_rep_ngrams,
        "q_events_agg": q_events_agg,
        "d_bloom": d_bloom,
        "d_trimspans": d_trimspans,
        "t_split": t_split,
        "t_postings": t_postings,
        "t_clean": t_clean,
        "t_urls": t_urls,
        "t_tfidf": t_tfidf,
        "t_vocab": t_vocab,
        "t_chunks": t_chunks,
        "t_pack": t_pack,
        "t_bpe": t_bpe,
        "s_knn_quant": s_knn_quant,
        "q2": q2,
        "q11": q11,
        "q13": q13,
        "q15": q15,
        "q16": q16,
        "t_paradedup": t_paradedup,
        "d_spans": d_spans,
        "t_scripts": t_scripts,
        "t_tiers": t_tiers,
        "g_walks": g_walks,
        "t_cooc": t_cooc,
        "g_in": g_in,
        "g_out2": g_out2,
        "g_tags": g_tags,
        "g_union": g_union,
        "g_except": g_except,
        "g_intersect": g_intersect,
        "g_unique": g_unique,
        "g_count": g_count,
        "g_allnodes": g_allnodes,
        "g_labeled": g_labeled,
        "g_compare": g_compare,
        "g_regex": g_regex,
        "g_order_limit": g_order_limit,
        "g_skip": g_skip,
        "g_optional": g_optional,
        "g_both": g_both,
        "q_window_agg": q_window_agg,
        # --- green in round 15 (rule 4 tail: verified last round; held
        # --- by pytest + tools/check_oracles.py between verdicts) ------
        "q_asof_stream": q_asof_stream,
        "q_tpch_topn": q_tpch_topn,
        "q_tpch_exists": q_tpch_exists,
        "q_tpch_scalar": q_tpch_scalar,
        "q3": q3,
        "q4": q4,
        "q6": q6,
        "q10": q10,
        "q14": q14,
        "q17": q17,
        "q18": q18,
        "q22": q22,
        "d_substr": d_substr,
        "d_substr_against": d_substr_against,
        "d_substr_index": d_substr_index,
        "g_follow": g_follow,
        "g_followr": g_followr,
        "g_or_short": g_or_short,
        "g_valuefilter": g_valuefilter,
        "g_valuefilter_fn": g_valuefilter_fn,
        "g_write_delete": g_write_delete,
        "g_recursive": g_recursive,
        "g_recursive_dist": g_recursive_dist,
        "q1": q1,
        "q5": q5,
        "d_semdedup": d_semdedup,
        "s_kcenter": s_kcenter,
        "q12": q12,
        "q_range": q_range,
        "q_rollup": q_rollup,
        "q_pivot": q_pivot,
        "q_median": q_median,
        "m_image": m_image,
        "m_audio": m_audio,
        "q_json": q_json,
        "q_antijoin": q_antijoin,
        "t_wsample": t_wsample,
        "t_mixture_up": t_mixture_up,
        "d_semdedup_far": d_semdedup_far,
        "t_kmv": t_kmv,
        "t_qscore": t_qscore,
    }


_CUST = "'<customer:' || c_custkey || '>'"
_NAT = "'<nation:' || n_nationkey || '>'"

# Shared kmeans replay for the two semdedup oracles: 2 decimal-exact
# Lloyd rounds over the embeddings (the s_knn_ivf pattern), ending in
# `bucketed` (id, v, c) and `c2` (c, v) — the final centroids.
_SEMDEDUP_KMEANS_CTE = r"""
            WITH base AS (
              SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), c0 AS (
              SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS c, v
              FROM (SELECT id, v FROM base ORDER BY id LIMIT 8)
            ),
            a1 AS (
              SELECT id, v, c FROM (
                SELECT b.id, b.v, s.c,
                  ROW_NUMBER() OVER (PARTITION BY b.id
                    ORDER BY list_sum([(b.v[i] - s.v[i]) * (b.v[i] - s.v[i]) for i in range(1, len(b.v)+1)]), s.c) AS rn
                FROM base b CROSS JOIN c0 s
              ) WHERE rn = 1
            ), m1 AS (
              SELECT c, pos,
                CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
                  / COUNT(*) AS m
              FROM (SELECT c, unnest(
                      [{'pos': i, 'x': v[i]} for i in range(1, len(v)+1)],
                      recursive := true)
                    FROM a1)
              GROUP BY c, pos
            ), c1 AS (
              SELECT p.c, coalesce(g.gv, p.v) AS v
              FROM c0 p LEFT JOIN
                (SELECT c, list(m ORDER BY pos) AS gv FROM m1 GROUP BY c) g
                USING (c)
            ),
            a2 AS (
              SELECT id, v, c FROM (
                SELECT b.id, b.v, s.c,
                  ROW_NUMBER() OVER (PARTITION BY b.id
                    ORDER BY list_sum([(b.v[i] - s.v[i]) * (b.v[i] - s.v[i]) for i in range(1, len(b.v)+1)]), s.c) AS rn
                FROM base b CROSS JOIN c1 s
              ) WHERE rn = 1
            ), m2 AS (
              SELECT c, pos,
                CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
                  / COUNT(*) AS m
              FROM (SELECT c, unnest(
                      [{'pos': i, 'x': v[i]} for i in range(1, len(v)+1)],
                      recursive := true)
                    FROM a2)
              GROUP BY c, pos
            ), c2 AS (
              SELECT p.c, coalesce(g.gv, p.v) AS v
              FROM c1 p LEFT JOIN
                (SELECT c, list(m ORDER BY pos) AS gv FROM m2 GROUP BY c) g
                USING (c)
            ),
            bucketed AS (
              SELECT id, v, c FROM (
                SELECT b.id, b.v, s.c,
                  ROW_NUMBER() OVER (PARTITION BY b.id
                    ORDER BY list_sum([(b.v[i] - s.v[i]) * (b.v[i] - s.v[i]) for i in range(1, len(b.v)+1)]), s.c) AS rn
                FROM base b CROSS JOIN c2 s
              ) WHERE rn = 1
            )"""

_SHINGLE3 = (
    "list_distinct([array_to_string(toks[i:i+2], ' ') "
    "for i in range(1, len(toks) - 1)])"
)

_MINHASH = (
    "[list_min([md5(CAST(j AS VARCHAR) || ':' || s) for s in sh]) "
    "for j in range(0, 16)]"
)

_BANDS = (
    "[{'band': b, 'bh': md5(array_to_string(sig[b*4+1:b*4+4], '|'))} "
    "for b in range(0, 4)]"
)

# Hot-bucket guard mirror (dedup.minhash_lsh_pairs max_bucket_size):
# buckets with > 256 occupants emit no candidate pairs. Filtering the
# a-side of the (band, bh) equi-join is equivalent to dropping the
# whole bucket. Expects a CTE named ``banded``.
_BOK = """bsz AS (
              SELECT band, bh, COUNT(*) AS n FROM banded GROUP BY band, bh
            ), bok AS (
              SELECT banded.* FROM banded JOIN bsz USING (band, bh)
              WHERE bsz.n <= 256
            )"""


def _walk_round(n: int, prev: str) -> str:
    """One random-walk hop as a SQL CTE: per walk, the out-neighbor
    of the current node minimizing the seeded md5 — mirrors
    cayley_spark.graphs.algorithms.random_walks exactly (struct-min
    on (hash, id): lexicographic on the hash, ties to smallest id —
    sign-safe for any integer id)."""
    return f"""s{n} AS (
              SELECT w.walk_id,
                min({{'h': md5('w:{n}:' || CAST(w.node AS VARCHAR)
                          || '>' || CAST(e.d AS VARCHAR)),
                     'd': e.d}}).d AS node
              FROM {prev} w JOIN e ON e.s = w.node
              GROUP BY w.walk_id
            )"""


def _lsh_planes_values() -> str:
    """The deterministic hyperplanes as SQL VALUES rows ``(t, p, pv)``,
    generated from the same ``_plane()`` the Spark path uses — the
    oracle recomputes identical signatures from plain constants (no
    engine-specific hash function in the SQL)."""
    from cayley_spark.functions.similarity import _plane

    rows = []
    for t in range(4):
        for p in range(8):
            arr = ", ".join(repr(x) for x in _plane(64, p, t))
            rows.append(f"({t}, {p}, [{arr}])")
    return ",\n              ".join(rows)


def _bpe_train_oracle(n_merges: int) -> str:
    """Unrolled DuckDB replay of bpe_train's driver loop: per round,
    adjacent-pair counts over the double-separator symbol encoding,
    lexicographic-tie-broken argmax, plain-string replace (identical
    left-to-right non-overlapping semantics in both engines)."""
    its = []
    prev = "s0"
    for i in range(1, n_merges + 1):
        # MATERIALIZED + 1-row cross join: scalar subqueries would
        # re-execute the whole upstream CTE chain once per reference,
        # compounding across rounds (measured 96 s -> ~1 s at sf0.01)
        its.append(
            f"""top{i} AS MATERIALIZED (
              SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_count
              FROM (
                SELECT freq,
                  unnest([{{'a': l[j], 'b': l[j+1]}}
                          for j in range(1, len(l))],
                         recursive := true)
                FROM (SELECT freq,
                        [replace(x, chr(31), '')
                         for x in string_split(sym, chr(31) || chr(31))]
                          AS l
                      FROM {prev})
              ) GROUP BY a, b
              ORDER BY pair_count DESC, a, b LIMIT 1
            ), s{i} AS MATERIALIZED (
              SELECT freq, replace(sym,
                chr(31) || t.a || chr(31) || chr(31) || t.b || chr(31),
                chr(31) || t.a || t.b || chr(31)) AS sym
              FROM {prev}, top{i} t
            )"""
        )
        prev = f"s{i}"
    finals = "\n            UNION ALL ".join(
        f"SELECT CAST({i - 1} AS INT) AS merge_rank, a AS left_sym, "
        f"b AS right_sym, pair_count FROM top{i}"
        for i in range(1, n_merges + 1)
    )
    return f"""
        WITH pre AS (
          SELECT unnest(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'
          )) AS w
          FROM documents
        ), w AS (
          SELECT w, COUNT(*) AS freq FROM pre
          WHERE trim(w) <> '' AND w NOT LIKE '%' || chr(31) || '%'
          GROUP BY w
        ), s0 AS MATERIALIZED (
          SELECT freq,
            chr(31) || array_to_string(
              [substr(w, i, 1) for i in range(1, len(w) + 1)],
              chr(31) || chr(31)) || chr(31) AS sym
          FROM w
        ), {', '.join(its)}
        {finals}
    """


def _sqdist(a: str, b: str) -> str:
    """Squared-L2 between two DOUBLE[] columns, summed in dimension
    order (matches the Spark side's sequential F.aggregate)."""
    return (
        f"list_sum([({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) "
        f"for i in range(1, len({a})+1)])"
    )


def _ivf_round(n: int, prev: str) -> str:
    """One Lloyd round as SQL CTEs: assignment a{n} against centroids
    ``prev``, exact-decimal per-dimension means m{n}, new centroids
    c{n} (empty clusters keep their previous centroid) — mirrors
    cayley_spark.functions.similarity.kmeans_centroids."""
    return f"""
            a{n} AS (
              SELECT id, v, c FROM (
                SELECT b.id, b.v, s.c,
                  ROW_NUMBER() OVER (PARTITION BY b.id
                    ORDER BY {_sqdist('b.v', 's.v')}, s.c) AS rn
                FROM base b CROSS JOIN {prev} s
              ) WHERE rn = 1
            ), m{n} AS (
              SELECT c, pos,
                CAST(SUM(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
                  / COUNT(*) AS m
              FROM (SELECT c, unnest(
                      [{{'pos': i, 'x': v[i]}} for i in range(1, len(v)+1)],
                      recursive := true)
                    FROM a{n})
              GROUP BY c, pos
            ), c{n} AS (
              SELECT p.c, coalesce(g.gv, p.v) AS v
              FROM {prev} p LEFT JOIN
                (SELECT c, list(m ORDER BY pos) AS gv FROM m{n} GROUP BY c) g
                USING (c)
            )"""


def _ivf_oracle(n_centroids: int = 16, nprobe: int = 4, k: int = 5) -> str:
    qids = ", ".join(str(q) for q in KNN_QUERIES)
    return f"""
            WITH base AS (
              SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), c0 AS (
              SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS c, v
              FROM (SELECT id, v FROM base ORDER BY id LIMIT {n_centroids})
            ),{_ivf_round(1, 'c0')},{_ivf_round(2, 'c1')},
            bucketed AS (
              SELECT id, c FROM (
                SELECT b.id, s.c,
                  ROW_NUMBER() OVER (PARTITION BY b.id
                    ORDER BY {_sqdist('b.v', 's.v')}, s.c) AS rn
                FROM base b CROSS JOIN c2 s
              ) WHERE rn = 1
            ), probe AS (
              SELECT query_id, c FROM (
                SELECT b.id AS query_id, s.c,
                  ROW_NUMBER() OVER (PARTITION BY b.id
                    ORDER BY {_sqdist('b.v', 's.v')}, s.c) AS rn
                FROM base b CROSS JOIN c2 s WHERE b.id IN ({qids})
              ) WHERE rn <= {nprobe}
            ), cand AS (
              SELECT p.query_id, bk.id AS neighbor_id
              FROM probe p JOIN bucketed bk ON bk.c = p.c
              WHERE bk.id <> p.query_id
            ), scored AS (
              SELECT c.query_id, c.neighbor_id,
                list_cosine_similarity(qb.v, nb.v) AS score
              FROM cand c
              JOIN base qb ON qb.id = c.query_id
              JOIN base nb ON nb.id = c.neighbor_id
            )
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS rn
              FROM scored
            ) WHERE rn <= {k}
    """


def _embed_dup_oracle(threshold: float = 0.4) -> str:
    return f"""
            WITH planes(t, p, pv) AS (VALUES
              {_lsh_planes_values()}
            ), base AS (
              SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), sigs AS (
              SELECT b.id, pl.t,
                CAST(SUM(CASE WHEN list_inner_product(b.v, pl.pv) > 0
                     THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS sig
              FROM base b CROSS JOIN planes pl
              GROUP BY b.id, pl.t
            ), cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig
              WHERE a.id < b.id
            )
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN base x ON x.id = c.id_a
            JOIN base y ON y.id = c.id_b
            WHERE list_cosine_similarity(x.v, y.v) >= {threshold}
    """


def _lsh_oracle(n_planes: int = 8, k: int = 5) -> str:
    qids = ", ".join(str(q) for q in KNN_QUERIES)
    return f"""
            WITH planes(t, p, pv) AS (VALUES
              {_lsh_planes_values()}
            ), base AS (
              SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), sigs AS (
              SELECT b.id, pl.t,
                CAST(SUM(CASE WHEN list_inner_product(b.v, pl.pv) > 0
                     THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS BIGINT) AS sig
              FROM base b CROSS JOIN planes pl
              GROUP BY b.id, pl.t
            ), q AS (
              SELECT id AS query_id, t, sig FROM sigs
              WHERE id IN ({qids})
            ), cand AS (
              SELECT DISTINCT q.query_id, s.id AS neighbor_id
              FROM sigs s JOIN q ON s.t = q.t AND s.sig = q.sig
              WHERE s.id <> q.query_id
            ), scored AS (
              SELECT c.query_id, c.neighbor_id,
                list_cosine_similarity(qb.v, nb.v) AS score
              FROM cand c
              JOIN base qb ON qb.id = c.query_id
              JOIN base nb ON nb.id = c.neighbor_id
            )
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS rn
              FROM scored
            ) WHERE rn <= {k}
    """




def _kcenter_oracle(k: int = 6) -> str:
    """Unrolled greedy k-center SQL: round r picks the id-tie-broken
    argmax of MIN squared-L2 distance to the selected set (a
    correlated scalar subquery over the tiny s{r-1} CTE)."""
    dist = (
        "list_sum([(b.v[i]-s.v[i])*(b.v[i]-s.v[i]) "
        "for i in range(1, len(b.v)+1)])"
    )
    parts = [
        "WITH base AS (SELECT vec_id AS id, "
        "CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
        's0 AS (SELECT id, v, 0 AS "rank" FROM base ORDER BY id LIMIT 1)'
    ]
    for r in range(1, k):
        p = f"s{r-1}"
        parts.append(
            f""",\nn{r} AS (
  SELECT b.id, b.v FROM base b
  WHERE b.id NOT IN (SELECT id FROM {p})
  ORDER BY (SELECT MIN({dist}) FROM {p} s) DESC, b.id
  LIMIT 1
),\ns{r} AS (
  SELECT id, v, "rank" FROM {p}
  UNION ALL SELECT id, v, {r} FROM n{r}
)"""
        )
    parts.append(
        f'\nSELECT id AS vec_id, CAST("rank" AS INT) AS rank FROM s{k-1}'
    )
    return "".join(parts)


_SUBSTR_AGAINST_SQL = r"""
            WITH newd AS (
              SELECT doc_id AS id,
                     regexp_extract_all(text, '\w+') AS toks
              FROM documents WHERE doc_id % 3 <> 0
            ), refd AS (
              SELECT regexp_extract_all(text, '\w+') AS toks
              FROM documents WHERE doc_id % 3 = 0
            ), refg AS (
              SELECT DISTINCT g FROM (
                SELECT unnest(
                  [array_to_string(toks[i:i+9], ' ')
                   for i in range(1, len(toks) - 8)]) AS g
                FROM refd
              )
            ), sh AS (
              SELECT id, unnest(
                [{'pos': i - 1,
                  'g': array_to_string(toks[i:i+9], ' ')}
                 for i in range(1, len(toks) - 8)],
                recursive := true)
              FROM newd
            ), hc AS (
              SELECT s.id, s.pos FROM sh s JOIN refg USING (g)
            ), fresh AS (
              SELECT * FROM sh s
              WHERE NOT EXISTS (SELECT 1 FROM refg r WHERE r.g = s.g)
            ), occ AS (
              SELECT id, pos,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY id, pos)
                  AS rn,
                COUNT(*) OVER (PARTITION BY g) AS cnt
              FROM fresh
            ), rem AS (
              SELECT id, pos FROM occ WHERE cnt >= 2 AND rn > 1
              UNION ALL
              SELECT id, pos FROM hc
            ), cov AS (
              SELECT DISTINCT r.id, r.pos + d.d AS cpos
              FROM rem r
              CROSS JOIN (SELECT unnest(range(0, 10)) AS d) d
            ), sp AS (
              SELECT id,
                     CAST(COUNT(*) AS INT) AS n_removed,
                     CAST(SUM(CASE WHEN prev = cpos - 1 THEN 0 ELSE 1
                              END) AS INT) AS n_spans
              FROM (
                SELECT id, cpos,
                       lag(cpos) OVER (PARTITION BY id ORDER BY cpos)
                         AS prev
                FROM cov
              ) GROUP BY id
            ), tokpos AS (
              SELECT id, unnest(
                [{'i': i - 1, 'tok': toks[i]}
                 for i in range(1, len(toks) + 1)],
                recursive := true)
              FROM newd
            ), ct AS (
              SELECT t.id,
                     string_agg(t.tok, ' ' ORDER BY t.i) AS clean_text
              FROM tokpos t
              LEFT JOIN cov c ON t.id = c.id AND t.i = c.cpos
              WHERE c.cpos IS NULL
              GROUP BY t.id
            )
            SELECT b.id AS doc_id,
                   COALESCE(ct.clean_text, '') AS clean_text,
                   CAST(len(b.toks) AS INT) AS n_tokens,
                   COALESCE(sp.n_removed, 0) AS n_removed,
                   COALESCE(sp.n_spans, 0) AS n_spans
            FROM newd b
            LEFT JOIN ct ON b.id = ct.id
            LEFT JOIN sp ON b.id = sp.id
        """


def oracle_sql() -> dict[str, str]:
    return {
        "g_in": f"""
            SELECT {_CUST} AS id FROM customer WHERE c_nationkey = 7
            UNION ALL
            SELECT '<supplier:' || s_suppkey || '>' FROM supplier WHERE s_nationkey = 7
        """,
        "g_out2": """
            SELECT '<region:' || n_regionkey || '>' AS id
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            WHERE c_mktsegment = 'BUILDING'
        """,
        "g_tags": f"""
            SELECT {_NAT} AS id, {_CUST} AS cust, '"' || n_name || '"' AS nname
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            WHERE c_mktsegment = 'BUILDING'
        """,
        "g_union": f"""
            SELECT {_CUST} AS id FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            UNION ALL
            SELECT {_CUST} FROM customer WHERE c_mktsegment = 'MACHINERY'
        """,
        "g_except": f"""
            SELECT {_CUST} AS id FROM customer WHERE c_mktsegment <> 'BUILDING'
        """,
        "g_intersect": f"""
            SELECT {_CUST} AS id FROM customer
            WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000.0
        """,
        "g_unique": f"""
            SELECT DISTINCT {_NAT} AS id
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            WHERE c_mktsegment = 'BUILDING'
        """,
        "g_count": "SELECT COUNT(*) AS count FROM lineitem",
        "g_predstats": """
            SELECT '<placed_by>' AS predicate,
                   (SELECT COUNT(*) FROM orders) AS n_quads
            UNION ALL SELECT '<in_nation>',
                   (SELECT COUNT(*) FROM customer)
                   + (SELECT COUNT(*) FROM supplier)
            UNION ALL SELECT '<in_region>',
                   (SELECT COUNT(*) FROM nation)
            UNION ALL SELECT '<in_segment>',
                   (SELECT COUNT(*) FROM customer)
            UNION ALL SELECT '<named>',
                   (SELECT COUNT(*) FROM nation)
                   + (SELECT COUNT(*) FROM region)
            UNION ALL SELECT '<balance>',
                   (SELECT COUNT(*) FROM customer)
            UNION ALL SELECT '<status>',
                   (SELECT COUNT(*) FROM orders)
            UNION ALL SELECT '<next>',
                   (SELECT COUNT(*) FROM nation a JOIN nation b
                    ON a.n_nationkey + 1 = b.n_nationkey)
            UNION ALL SELECT '<contains>',
                   (SELECT COUNT(*) FROM lineitem)
        """,
        "g_allnodes": """
            SELECT CAST(
              (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM orders)
              + (SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region)
              + (SELECT COUNT(*) FROM supplier)
              + (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)
              + (SELECT COUNT(DISTINCT c_mktsegment) FROM customer)
              + (SELECT COUNT(DISTINCT n_name) FROM nation)
              + (SELECT COUNT(DISTINCT r_name) FROM region)
              + (SELECT COUNT(DISTINCT o_orderstatus) FROM orders)
              + (SELECT COUNT(DISTINCT c_acctbal) FROM customer)
              + 9 AS BIGINT) AS count
        """,
        "g_labeled": """
            SELECT '<part:' || l_partkey || '>' AS id
            FROM lineitem WHERE l_suppkey = 3
        """,
        "g_compare": f"""
            SELECT {_CUST} AS id FROM customer WHERE c_acctbal > 5000.0
        """,
        "g_regex": f"""
            SELECT {_NAT} AS id FROM nation WHERE regexp_matches(n_name, '^NATION_1')
        """,
        "g_order_limit": f"""
            SELECT id FROM (
              SELECT {_CUST} AS id FROM customer WHERE c_mktsegment = 'BUILDING'
            ) ORDER BY id LIMIT 5
        """,
        "g_skip": f"""
            SELECT id FROM (
              SELECT {_CUST} AS id FROM customer WHERE c_mktsegment = 'BUILDING'
            ) ORDER BY id LIMIT 4 OFFSET 3
        """,
        "g_optional": f"""
            SELECT {_NAT.replace('n_nationkey', 'a.n_nationkey')} AS id,
                   CASE WHEN b.n_nationkey IS NULL THEN NULL
                        ELSE '<nation:' || b.n_nationkey || '>' END AS nxt
            FROM nation a LEFT JOIN nation b ON b.n_nationkey = a.n_nationkey + 1
        """,
        "g_both": f"""
            SELECT {_CUST} AS id FROM customer WHERE c_nationkey = 7
            UNION ALL
            SELECT '<supplier:' || s_suppkey || '>' FROM supplier WHERE s_nationkey = 7
        """,
        "g_follow": f"""
            SELECT {_NAT} AS id
            FROM orders
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            WHERE o_orderstatus = 'F'
        """,
        "g_followr": f"""
            SELECT {_CUST} AS id FROM customer WHERE c_nationkey = 3
            UNION ALL
            SELECT '<supplier:' || s_suppkey || '>' FROM supplier WHERE s_nationkey = 3
        """,
        "g_or_short": f"""
            SELECT {_CUST} AS id FROM customer WHERE c_mktsegment = 'FURNITURE'
        """,
        "g_valuefilter": f"""
            SELECT {_NAT} AS id FROM nation WHERE n_name LIKE '%1'
        """,
        "g_valuefilter_fn": f"""
            SELECT {_NAT} AS id FROM nation WHERE n_name LIKE '%1'
        """,
        "g_write_delete": """
            SELECT '"' || n_name || '"' AS id FROM nation WHERE n_nationkey = 7
            UNION ALL
            SELECT '"TEMP_NAME"' AS id
        """,
        "g_recursive": """
            WITH RECURSIVE r(nk, depth) AS (
              SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
              UNION ALL
              SELECT b.n_nationkey, r.depth + 1
              FROM r JOIN nation b ON b.n_nationkey = r.nk + 1
              WHERE r.depth < 50
            )
            SELECT '<nation:' || nk || '>' AS id, CAST(depth AS INT) AS depth
            FROM r WHERE depth >= 1
        """,
        "g_recursive_dist": """
            WITH RECURSIVE r(nk, depth) AS (
              SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
              UNION ALL
              SELECT b.n_nationkey, r.depth + 1
              FROM r JOIN nation b ON b.n_nationkey = r.nk + 1
              WHERE r.depth < 50
            )
            SELECT '<nation:' || nk || '>' AS id, CAST(depth AS INT) AS depth
            FROM r WHERE depth >= 1
        """,
        "q2": """
WITH offers AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ), eu AS (
          SELECT o.l_partkey, o.cost, s.s_acctbal, s.s_name, n.n_name
          FROM offers o
          JOIN supplier s ON o.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'EUROPE'
        ), best AS (
          SELECT l_partkey AS bk, MIN(cost) AS best_cost
          FROM eu GROUP BY l_partkey
        )
        SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
               CAST(e.cost AS DOUBLE) AS supply_cost
        FROM eu e
        JOIN part p ON e.l_partkey = p.p_partkey
        JOIN best b ON e.l_partkey = b.bk AND e.cost = b.best_cost
        WHERE p.p_size = 15 OR p.p_type = 'LARGE'
        ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
        LIMIT 100
        """,
        # Consolidated Q7+Q8+Q9 (COVERAGE.md r10 consolidation):
        # each branch is the former standalone oracle verbatim,
        # harmonized into (q, k, yr, v).
        "q_tpch_rev": r"""
            SELECT 'q7' AS q,
                   supp_nation || '|' || cust_nation AS k,
                   l_year AS yr, revenue AS v
            FROM (

SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        )
            UNION ALL
            SELECT 'q8' AS q, 'mkt_share' AS k,
                   o_year AS yr, mkt_share AS v
            FROM (

SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
          CAST(SUM(CAST(CASE WHEN ns.n_name = 'NATION_3'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region ON nc.n_regionkey = r_regionkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
        )
            UNION ALL
            SELECT 'q9' AS q, nation AS k,
                   o_year AS yr, sum_profit AS v
            FROM (

SELECT n_name AS nation,
          CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))
                 - CAST(p_retailprice * l_quantity
                        AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        )
        """,
        # Consolidated Q19+Q20+Q21 (COVERAGE.md r10
        # consolidation): former standalone oracles verbatim,
        # harmonized into (q, k, v).
        "q_tpch_mix1": r"""
            SELECT 'q19' AS q, 'revenue' AS k, revenue AS v
            FROM (

SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
        )
            UNION ALL
            SELECT 'q20' AS q, s_name AS k,
                   CAST(s_suppkey AS DOUBLE) AS v
            FROM (

WITH red AS (
          SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
            AND l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        ), per_ps AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq_ps
          FROM red GROUP BY 1, 2
        ), per_p AS (
          SELECT l_partkey AS pk,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq_p
          FROM red GROUP BY 1
        ), dominant AS (
          SELECT DISTINCT l_suppkey FROM per_ps
          JOIN per_p ON l_partkey = pk WHERE sq_ps * 2 > sq_p
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (SELECT l_suppkey FROM dominant)
        )
            UNION ALL
            SELECT 'q21' AS q, s_name AS k,
                   CAST(numwait AS DOUBLE) AS v
            FROM (

WITH lo AS (
          SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        ), all_s AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lo
        ), late_s AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lo
          WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        ), n_all AS (
          SELECT l_orderkey AS ka, COUNT(*) AS n_supp
          FROM all_s GROUP BY 1
        ), n_late AS (
          SELECT l_orderkey AS kl, COUNT(*) AS n_late
          FROM late_s GROUP BY 1
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late_s
        JOIN n_all ON l_orderkey = ka
        JOIN n_late ON l_orderkey = kl
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp > 1 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name LIMIT 20
        )
        """,
        # r15 restoration: the eight retired singles, oracle rows
        # byte-identical to their r14 form (the declared-query
        # contract: entries may be added, never removed).
        "q3": """
            SELECT o_orderkey, o_orderdate,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q4": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
        """,
        "q6": """
            SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q10": """
SELECT c_custkey, c_name, c_acctbal, n_name,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "q14": """
            SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
        """,
        "q17": """
            WITH a AS (
              SELECT l_partkey AS ak, COUNT(*) AS nq,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
              FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / 7.0 AS avg_yearly
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
            JOIN a ON l_partkey = ak
            WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * nq < sq
        """,
        "q18": """
            WITH big AS (
              SELECT l_orderkey,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
            )
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   o_totalprice, CAST(sum_qty AS DOUBLE) AS total_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
        """,
        "q22": """
WITH cust AS (
          SELECT * FROM customer
          WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        ), stats AS (
          SELECT COUNT(*) AS n_pos,
                 SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos
          FROM cust WHERE c_acctbal > 0
        )
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            AS totacctbal
        FROM cust, stats
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
          AND c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
        """,
        # q_tpch_topn / q_tpch_exists / q_tpch_scalar: the round-15
        # registry consolidation (COVERAGE.md cap policy item 2) —
        # each branch wraps the retired single-entry oracle verbatim
        # and harmonizes exactly like the Spark side (dates through
        # CAST(date) so both engines render ISO strings)
        "q_tpch_topn": r"""
            SELECT 'q3' AS q,
                   CAST(o_orderkey AS VARCHAR) || '|' ||
                     CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS k,
                   revenue AS v, CAST(NULL AS DOUBLE) AS v2
            FROM (
            SELECT o_orderkey, o_orderdate,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
            )
            UNION ALL
            SELECT 'q10' AS q,
                   CAST(c_custkey AS VARCHAR) || '|' || c_name
                     || '|' || n_name AS k,
                   revenue AS v, CAST(c_acctbal AS DOUBLE) AS v2
            FROM (
            SELECT c_custkey, c_name, c_acctbal, n_name,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-10-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey LIMIT 20
            )
            UNION ALL
            SELECT 'q18' AS q,
                   c_name || '|' || CAST(c_custkey AS VARCHAR)
                     || '|' || CAST(o_orderkey AS VARCHAR) || '|' ||
                     CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS k,
                   total_qty AS v, CAST(o_totalprice AS DOUBLE) AS v2
            FROM (
            WITH big AS (
              SELECT l_orderkey,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
            )
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   o_totalprice, CAST(sum_qty AS DOUBLE) AS total_qty
            FROM orders
            JOIN big ON o_orderkey = l_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
            )
        """,
        "q_tpch_exists": r"""
            SELECT 'q4' AS q, o_orderpriority AS k,
                   CAST(order_count AS DOUBLE) AS v,
                   CAST(NULL AS DOUBLE) AS v2
            FROM (
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
            )
            UNION ALL
            SELECT 'q22' AS q, CAST(cntrycode AS VARCHAR) AS k,
                   CAST(numcust AS DOUBLE) AS v, totacctbal AS v2
            FROM (
            WITH cust AS (
              SELECT * FROM customer
              WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
            ), stats AS (
              SELECT COUNT(*) AS n_pos,
                     SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sum_pos
              FROM cust WHERE c_acctbal > 0
            )
            SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                AS totacctbal
            FROM cust, stats
            WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > sum_pos
              AND c_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
            )
        """,
        "q_tpch_scalar": r"""
            SELECT 'q6' AS q, 'revenue' AS k, revenue AS v
            FROM (
            SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
            )
            UNION ALL
            SELECT 'q14' AS q, 'promo_revenue' AS k, promo_revenue AS v
            FROM (
            SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            )
            UNION ALL
            SELECT 'q17' AS q, 'avg_yearly' AS k, avg_yearly AS v
            FROM (
            WITH a AS (
              SELECT l_partkey AS ak, COUNT(*) AS nq,
                     SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
              FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / 7.0 AS avg_yearly
            FROM lineitem
            JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'
            JOIN a ON l_partkey = ak
            WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * nq < sq
            )
        """,
        "q11": """
WITH per_part AS (
          SELECT l_partkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_4'
          GROUP BY l_partkey
        ), t AS (SELECT SUM(value) AS total FROM per_part)
        SELECT l_partkey, CAST(value AS DOUBLE) AS value
        FROM per_part, t WHERE value * 1000 > total
        """,
        "q15": """
WITH rev AS (
          SELECT l_suppkey,
            SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        ), mx AS (SELECT MAX(total_revenue) AS m FROM rev)
        SELECT s_suppkey, s_name,
               CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey, mx
        WHERE total_revenue = mx.m
        """,
        "q16": """
WITH rel AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM rel
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 9, 14, 19, 24, 28, 35)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3
        """,
        "q12": """
SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                    THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
        """,
        "q13": """
WITH per_cust AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust GROUP BY c_count
        """,
        "q1": """
            SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
              CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
              COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q5": """
            SELECT n_name,
              CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
            GROUP BY n_name
        """,
        # q_events_agg: the two former standalone oracles verbatim
        # under a union (the q_tpch_rev consolidation pattern) — the
        # Spark entry runs BOTH implementations (direct groupBy +
        # the streaming-capable windowed_counts operator).
        "q_events_agg": """
            SELECT 'hourly' AS q, date_trunc('hour', ts) AS bucket_ts,
              event_type, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT 'windowed' AS q, date_trunc('hour', ts) AS bucket_ts,
              event_type, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 2, 3
        """,
        "q_sessions": """
            WITH m AS (
              SELECT user_id, ts, event_id,
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          <= INTERVAL 3600 SECOND
                     THEN 0 ELSE 1 END AS new_sess
              FROM events
            ), s AS (
              SELECT user_id, ts,
                SUM(new_sess) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess
              FROM m
            )
            SELECT user_id, MIN(ts) AS session_start,
                   MAX(ts) AS session_end, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sess
        """,
        # s_overlap: the per-source KMV sketches replay as DISTINCT
        # md5(shingle) + a per-source rank cut (the sketch table is
        # sources x 256 rows, so the oracle-side window is tiny);
        # the pairwise estimator is pure list algebra on both sides.
        "s_overlap": r"""
            WITH sh AS (
              SELECT source AS src,
                unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
                                      for i in range(1, len(toks) - 1)])) AS g
              FROM (SELECT source, regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), hs AS (
              SELECT DISTINCT src, md5(g) AS h FROM sh
            ), rk AS (
              SELECT src, h,
                ROW_NUMBER() OVER (PARTITION BY src ORDER BY h) AS r
              FROM hs
            ), sk AS (
              SELECT src, list(h ORDER BY h) AS ks
              FROM rk WHERE r <= 256 GROUP BY src
            ), pr AS (
              SELECT a.src AS src_a, a.ks AS ka, b.src AS src_b, b.ks AS kb
              FROM sk a JOIN sk b ON a.src < b.src
            ), uu AS (
              SELECT src_a, src_b, ka, kb,
                list_sort(list_distinct(ka || kb))[1:256] AS u
              FROM pr
            )
            SELECT src_a, src_b,
              CAST(len(list_intersect(list_intersect(u, ka), kb)) AS INT)
                AS n_common,
              CAST(len(u) AS INT) AS n_union,
              CAST(len(list_intersect(list_intersect(u, ka), kb)) AS DOUBLE)
                / len(u) AS jaccard_est
            FROM uu
        """,
        # q_sessions_bucketed: the two-phase form is bit-identical to
        # single-phase sessionization BY CONTRACT (the equivalence
        # property test pins it for any bucket size), so the oracle
        # is the q_sessions oracle verbatim — the row certifies that
        # the (key, bucket) phase-1 window + session-level gap-merge
        # reproduce the event-level semantics on real data.
        "q_sessions_bucketed": """
            WITH m AS (
              SELECT user_id, ts, event_id,
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          <= INTERVAL 3600 SECOND
                     THEN 0 ELSE 1 END AS new_sess
              FROM events
            ), s AS (
              SELECT user_id, ts,
                SUM(new_sess) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess
              FROM m
            )
            SELECT user_id, MIN(ts) AS session_start,
                   MAX(ts) AS session_end, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sess
        """,
        "q_events_topuser": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        # q_asof_stream: the streaming operator's single-batch run
        # equals the batch as-of join row-for-row by contract
        # (streaming/asof.py), so the oracle is q_asof's verbatim
        "q_asof_stream": """
            WITH p AS (
              SELECT event_id AS purchase_id, user_id, ts
              FROM events WHERE event_type = 'purchase'
            ), cd AS (
              SELECT user_id, ts, event_id AS click_id FROM (
                SELECT user_id, ts, event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
              ) WHERE rn = 1
            ), j AS (
              SELECT p.purchase_id, p.user_id, p.ts,
                     cd.ts AS click_ts, cd.click_id,
                ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                   ORDER BY cd.ts DESC) AS rn
              FROM p LEFT JOIN cd
                ON p.user_id = cd.user_id AND cd.ts <= p.ts
            )
            SELECT purchase_id, user_id, ts, click_ts, click_id
            FROM j WHERE rn = 1
        """,
        "q_asof": """
            WITH p AS (
              SELECT event_id AS purchase_id, user_id, ts
              FROM events WHERE event_type = 'purchase'
            ), cd AS (
              SELECT user_id, ts, event_id AS click_id FROM (
                SELECT user_id, ts, event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
              ) WHERE rn = 1
            ), j AS (
              SELECT p.purchase_id, p.user_id, p.ts,
                     cd.ts AS click_ts, cd.click_id,
                ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                   ORDER BY cd.ts DESC) AS rn
              FROM p LEFT JOIN cd
                ON p.user_id = cd.user_id AND cd.ts <= p.ts
            )
            SELECT purchase_id, user_id, ts, click_ts, click_id
            FROM j WHERE rn = 1
        """,
        # p_wet: the oracle DERIVES every parsed field analytically
        # from the documents table — synthesized url/record id, host,
        # byte length, the parser's trailing-newline trim — instead
        # of replaying the regexp parse, so framing bugs can't cancel
        "p_wet": """
            SELECT lower(source) || '.example.com' AS source,
                   regexp_replace(text, '[\r\n]+$', '') AS text,
                   'https://' || source || '.example.com/'
                     || CAST(doc_id AS VARCHAR) AS url,
                   '<urn:uuid:' || CAST(doc_id AS VARCHAR) || '>'
                     AS record_id,
                   CAST(octet_length(encode(text)) AS INT)
                     AS content_length
            FROM documents
        """,
        # t_qsketch: digest selection, the min-per-key rule, and the
        # positional rank arithmetic replay exactly; q is cast DOUBLE
        # on both sides (a bare VALUES literal would be DECIMAL in
        # DuckDB and hash-mismatch)
        "t_qsketch": """
            WITH s AS (
              SELECT md5(CAST(doc_id AS VARCHAR)) AS h,
                     MIN(CAST(length(text) AS DOUBLE)) AS v
              FROM documents GROUP BY 1 ORDER BY h LIMIT 64
            ), r AS (
              SELECT v, h, ROW_NUMBER() OVER (ORDER BY v, h) AS rn,
                     COUNT(*) OVER () AS n
              FROM s
            )
            SELECT CAST(t.q AS DOUBLE) AS q, r.v AS value
            FROM r JOIN (VALUES (0.1),(0.25),(0.5),(0.75),(0.9),(1.0))
                     AS t(q)
              ON r.rn = GREATEST(
                   1, CAST(CEIL(CAST(t.q AS DOUBLE) * r.n) AS BIGINT))
            ORDER BY q
        """,
        # q_asof_bucketed: the two-phase scale path is bit-identical
        # to the single-window form by contract — the oracle is
        # q_asof's verbatim
        "q_asof_bucketed": """
            WITH p AS (
              SELECT event_id AS purchase_id, user_id, ts
              FROM events WHERE event_type = 'purchase'
            ), cd AS (
              SELECT user_id, ts, event_id AS click_id FROM (
                SELECT user_id, ts, event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
              ) WHERE rn = 1
            ), j AS (
              SELECT p.purchase_id, p.user_id, p.ts,
                     cd.ts AS click_ts, cd.click_id,
                ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                   ORDER BY cd.ts DESC) AS rn
              FROM p LEFT JOIN cd
                ON p.user_id = cd.user_id AND cd.ts <= p.ts
            )
            SELECT purchase_id, user_id, ts, click_ts, click_id
            FROM j WHERE rn = 1
        """,
        "q_range": """
            SELECT e.event_id AS error_id, c.event_id AS click_id
            FROM events e JOIN events c
              ON c.event_type = 'click'
             AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 120 SECOND
            WHERE e.event_type = 'error'
        """,
        "q_rollup": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY ROLLUP(date_trunc('day', ts), event_type)
        """,
        "q_cube": """
            SELECT event_type, is_weekend, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                AS sum_value
            FROM (
              SELECT event_type,
                CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END
                  AS is_weekend,
                value
              FROM events
            ) GROUP BY CUBE(event_type, is_weekend)
        """,
        "q_wau": """
            WITH act AS (
              SELECT DISTINCT user_id,
                CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
              FROM events
            ), days AS (
              SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP)
                AS report_day
              FROM events
            )
            SELECT d.report_day, COUNT(DISTINCT a.user_id) AS wau
            FROM days d JOIN act a
              ON a.day <= d.report_day
             AND a.day > d.report_day - INTERVAL 7 DAY
            GROUP BY d.report_day
        """,
        "q_antijoin": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                AND o.o_orderdate < TIMESTAMP '1997-01-01')
        """,
        # q_window_agg: the two former standalone window-frame
        # oracles (q_rolling + q_sliding) verbatim under a union —
        # the q_events_agg consolidation pattern; the Spark entry
        # runs BOTH plans (RANGE-frame analytic window + overlapping
        # window() generator).
        "q_window_agg": """
            WITH wins AS (
              -- make_timestamp(µs) is timezone-free; a
              -- to_timestamp()+CAST round-trip goes through
              -- TIMESTAMPTZ and shifts by the DuckDB session zone
              SELECT event_type, unnest([
                make_timestamp((epoch_ms(ts) // 1800000) * 1800000000),
                make_timestamp((epoch_ms(ts) // 1800000) * 1800000000
                               - 1800000000)
              ]) AS window_start
              FROM events
            )
            SELECT 'rolling' AS q, event_id, user_id,
              CAST(NULL AS TIMESTAMP) AS window_start,
              CAST(NULL AS VARCHAR) AS event_type,
              COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
                AS n
            FROM events
            UNION ALL
            SELECT 'sliding' AS q, CAST(NULL AS BIGINT) AS event_id,
              CAST(NULL AS BIGINT) AS user_id,
              window_start, event_type, COUNT(*) AS n
            FROM wins GROUP BY window_start, event_type
        """,
        # p_pipeline: the WHOLE corpus-preparation chain replayed
        # as one CTE pipeline — each stage is the corresponding
        # standalone oracle (t_langid/t_gopher/t_c4/t_paradedup/
        # d_substr/d_dedup_corpus/t_contaminate/t_mixture/t_shards)
        # rewired to read its predecessor instead of `documents`.
        "p_pipeline": r"""
            -- stext/survivors/basem are MATERIALIZED: DuckDB inlines
            -- CTEs by default, and the mixture tail references basem
            -- three times (counts -> totals -> hash-filter join) --
            -- un-hinted, each reference re-executes the whole
            -- upstream pipeline (measured 30x: 30.3s -> 1.0s at
            -- sf0.01), the oracle-side twin of the with_src persist
            -- in corpus_pipeline itself.
            WITH RECURSIVE syn AS (
              SELECT doc_id, source,
                regexp_replace(text, '((?:\S+ ){4}\S+) ',
                  '\1.' || chr(10) || chr(10), 'g') AS text
              FROM documents
            ), corp AS (
              SELECT doc_id, source, COALESCE(text, '') AS text
              FROM syn WHERE doc_id % 25 <> 0
            ), lang AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                  len(list_filter(t, x -> x IN ('der','und','das'))) AS s_de,
                  len(list_filter(t, x -> x IN ('the','and','of'))) AS s_en,
                  len(list_filter(t, x -> x IN ('el','los','de'))) AS s_es,
                  len(list_filter(t, x -> x IN ('le','les','et'))) AS s_fr
                FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
                      FROM corp)
              ) WHERE (CASE
                  WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END) = 'en'
            ), gop AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                  CAST(len(t) AS INT) AS n_words,
                  CAST(COALESCE(list_sum([length(x) for x in t]), 0)
                       AS INT) AS word_chars,
                  CAST(len(string_split(tx, '#')) - 1
                       + len(regexp_split_to_array(tx, '\.\.\.')) - 1
                       + len(string_split(tx, '…')) - 1 AS INT) AS n_symbols,
                  CAST(len([x for x in t if regexp_matches(x, '[a-z]')])
                       AS INT) AS n_alpha_words,
                  CAST(len([w for w in ['the','a','table','value','row','fast']
                            if list_contains(t, w)]) AS INT) AS stop_hits,
                  CAST(len(ls) AS INT) AS n_lines,
                  CAST(len([x for x in ls
                            if regexp_matches(trim(x), '^[-*•]')])
                       AS INT) AS n_bullet_lines,
                  CAST(len([x for x in ls
                            if regexp_matches(trim(x), '(\.\.\.|…)$')])
                       AS INT) AS n_ellipsis_lines
                FROM (SELECT doc_id, text AS tx,
                        regexp_extract_all(lower(text), '\w+') AS t,
                        string_split(text, chr(10)) AS ls
                      FROM corp)
              ) WHERE n_words >= 30 AND n_words <= 100000
                  AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
                  AND 10 * n_symbols <= n_words
                  AND 5 * n_alpha_words >= 4 * n_words
                  AND stop_hits >= 2
                  AND 10 * n_bullet_lines <= 9 * n_lines
                  AND 10 * n_ellipsis_lines <= 3 * n_lines
            ), c4 AS (
              SELECT doc_id, source, array_to_string(kept, chr(10)) AS text
              FROM (
                SELECT doc_id, source,
                  [x for x in ls
                   if regexp_matches(trim(x), '[.!?"]$')
                      AND len([w for w in string_split(trim(x), ' ')
                               if w <> '']) >= 5] AS kept,
                  CAST(len(regexp_extract_all(tx, '[.!?]')) AS INT)
                    AS n_sentences,
                  contains(lower(tx), 'lorem ipsum') AS has_lorem,
                  contains(tx, '{') AS has_brace
                FROM (SELECT doc_id, source, text AS tx,
                        string_split(text, chr(10)) AS ls
                      FROM corp
                      WHERE doc_id IN (SELECT doc_id FROM lang)
                        AND doc_id IN (SELECT doc_id FROM gop))
              ) WHERE n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
                  AND len(kept) >= 1
            ), paras AS (
              SELECT doc_id,
                unnest([{'pos': i - 1, 'para': arr[i]}
                        for i in range(1, len(arr) + 1)],
                       recursive := true)
              FROM (SELECT doc_id, regexp_split_to_array(text, '\n+') AS arr
                    FROM c4)
            ), pd AS (
              SELECT doc_id, pos, para FROM paras WHERE trim(para) <> ''
            ), dfreq AS (
              SELECT para, COUNT(DISTINCT doc_id) AS pdf FROM pd GROUP BY para
            ), pkept AS (
              SELECT p.doc_id, p.pos, p.para, (f.pdf > 1) AS drp
              FROM pd p JOIN dfreq f USING (para)
            ), ptext AS (
              SELECT doc_id,
                COALESCE(array_to_string(
                  list(para ORDER BY pos) FILTER (WHERE NOT drp),
                  chr(10)), '') AS text
              FROM pkept GROUP BY doc_id
            ), sbase AS (
              SELECT doc_id AS id, regexp_extract_all(text, '\w+') AS toks
              FROM ptext
            ), ssh AS (
              SELECT id, unnest(
                [{'pos': i - 1, 'g': array_to_string(toks[i:i+9], ' ')}
                 for i in range(1, len(toks) - 8)],
                recursive := true)
              FROM sbase
            ), socc AS (
              SELECT id, pos,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY id, pos) AS rn,
                COUNT(*) OVER (PARTITION BY g) AS cnt
              FROM ssh
            ), srem AS (
              SELECT id, pos FROM socc WHERE cnt >= 2 AND rn > 1
            ), scov AS (
              SELECT DISTINCT r.id, r.pos + d.d AS cpos
              FROM srem r
              CROSS JOIN (SELECT unnest(range(0, 10)) AS d) d
            ), stokpos AS (
              SELECT id, unnest(
                [{'i': i - 1, 'tok': toks[i]}
                 for i in range(1, len(toks) + 1)],
                recursive := true)
              FROM sbase
            ), stext AS MATERIALIZED (
              SELECT t.id AS doc_id, string_agg(t.tok, ' ' ORDER BY t.i) AS text
              FROM stokpos t
              LEFT JOIN scov c ON t.id = c.id AND t.i = c.cpos
              WHERE c.cpos IS NULL
              GROUP BY t.id
            ), msh AS (
              SELECT doc_id AS id,
                list_distinct([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, len(toks) - 1)]) AS sh
              FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
                    FROM stext)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, sh,
                [list_min([md5(CAST(j AS VARCHAR) || ':' || s) for s in sh])
                 for j in range(0, 16)] AS sig
              FROM msh
            ), banded AS (
              SELECT id, sh, unnest(
                [{'band': b, 'bh': md5(array_to_string(sig[b*4+1:b*4+4], '|'))}
                 for b in range(0, 4)],
                recursive := true)
              FROM sig
            ), bsz AS (
              SELECT band, bh, COUNT(*) AS n FROM banded GROUP BY band, bh
            ), bok AS (
              SELECT banded.* FROM banded JOIN bsz USING (band, bh)
              WHERE bsz.n <= 256
            ), cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM bok a JOIN banded b
                ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
            ), pairs AS (
              SELECT p.id_a, p.id_b
              FROM cand p
              JOIN msh x ON x.id = p.id_a
              JOIN msh y ON y.id = p.id_b
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
                  >= 0.2
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b AS a, id_a AS b FROM pairs
            ), reach AS (
              SELECT doc_id AS id, doc_id AS lab FROM stext
              UNION
              SELECT e.b AS id, r.lab
              FROM reach r JOIN edges e ON e.a = r.id
            ), survivors AS MATERIALIZED (
              SELECT id AS doc_id FROM reach GROUP BY id HAVING MIN(lab) = id
            ), cgrams AS (
              SELECT doc_id,
                unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                      for i in range(1, len(t) - 3)])) AS g
              FROM (SELECT s.doc_id,
                      regexp_extract_all(lower(t.text), '\w+') AS t
                    FROM survivors s JOIN stext t USING (doc_id))
              WHERE len(t) >= 5
            ), bgrams AS (
              SELECT DISTINCT
                unnest([array_to_string(t[i:i+4], ' ')
                        for i in range(1, len(t) - 3)]) AS g
              FROM (SELECT regexp_extract_all(lower(text), '\w+') AS t
                    FROM syn WHERE doc_id % 25 = 0)
              WHERE len(t) >= 5
            ), contaminated AS (
              SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b USING (g)
            ), basem AS MATERIALIZED (
              SELECT s.doc_id, c.source, t.text
              FROM survivors s
              JOIN stext t USING (doc_id)
              JOIN c4 c USING (doc_id)
              WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
            ), mc AS (
              SELECT source, COUNT(*) AS n FROM basem GROUP BY source
            ), mw AS (
              SELECT source, n, pow(CAST(n AS DOUBLE), 0.5) AS w FROM mc
            ), mt AS (
              SELECT SUM(w) AS wsum, SUM(n) AS total FROM mw
            ), mr AS (
              SELECT mw.source,
                LEAST(1.0,
                  (mw.w / mt.wsum) * (CAST(mt.total AS DOUBLE) * 0.5) / mw.n
                ) AS rate
              FROM mw, mt
            ), mixed AS (
              SELECT b.doc_id, b.source, b.text
              FROM basem b JOIN mr ON mr.source = b.source
              WHERE CAST(CAST(('0x' || substr(md5(COALESCE(b.text, '')), 1, 8))::BIGINT
                         % 1048576 AS INT) AS DOUBLE) / 1048576 < mr.rate
            )
            SELECT doc_id, source,
              CAST(('0x' || substr(md5('x' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 16 AS INT) AS shard,
              md5('x' || CAST(doc_id AS VARCHAR)) AS sort_key,
              text AS clean_text
            FROM mixed
        """,
        # p_admit: the INCREMENTAL admission chain replayed as one
        # CTE pipeline — gates (t_langid/t_gopher/t_c4 oracles on the
        # batch slice) -> ExactSubstr trim against the corpus slice's
        # window set (the d_substr_index oracle, corpus side = refg)
        # -> within-batch MinHash dedup (the d_dedup_corpus oracle
        # over the trimmed text) -> cross-corpus LSH admission (the
        # d_index oracle: digest semi-join + banded join with the
        # hot-bucket guard counting BOTH sides, Jaccard verify) ->
        # decontamination (the t_contaminate oracle). The persisted
        # indexes hold exactly the corpus slice's fingerprints /
        # signatures, so the file-backed Spark path must reproduce
        # these recomputed-side semantics bit-for-bit.
        "p_admit": r"""
            WITH RECURSIVE syn AS (
              SELECT doc_id, source,
                regexp_replace(text, '((?:\S+ ){4}\S+) ',
                  '\1.' || chr(10) || chr(10), 'g') AS text
              FROM documents
            ), bat AS (
              SELECT doc_id, source, COALESCE(text, '') AS text
              FROM syn WHERE doc_id % 25 <> 0 AND doc_id % 3 <> 0
            ), corp AS (
              SELECT doc_id, COALESCE(text, '') AS text
              FROM syn WHERE doc_id % 25 <> 0 AND doc_id % 3 = 0
            ), lang AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                  len(list_filter(t, x -> x IN ('der','und','das'))) AS s_de,
                  len(list_filter(t, x -> x IN ('the','and','of'))) AS s_en,
                  len(list_filter(t, x -> x IN ('el','los','de'))) AS s_es,
                  len(list_filter(t, x -> x IN ('le','les','et'))) AS s_fr
                FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
                      FROM bat)
              ) WHERE (CASE
                  WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END) = 'en'
            ), gop AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                  CAST(len(t) AS INT) AS n_words,
                  CAST(COALESCE(list_sum([length(x) for x in t]), 0)
                       AS INT) AS word_chars,
                  CAST(len(string_split(tx, '#')) - 1
                       + len(regexp_split_to_array(tx, '\.\.\.')) - 1
                       + len(string_split(tx, '…')) - 1 AS INT) AS n_symbols,
                  CAST(len([x for x in t if regexp_matches(x, '[a-z]')])
                       AS INT) AS n_alpha_words,
                  CAST(len([w for w in ['the','a','table','value','row','fast']
                            if list_contains(t, w)]) AS INT) AS stop_hits,
                  CAST(len(ls) AS INT) AS n_lines,
                  CAST(len([x for x in ls
                            if regexp_matches(trim(x), '^[-*•]')])
                       AS INT) AS n_bullet_lines,
                  CAST(len([x for x in ls
                            if regexp_matches(trim(x), '(\.\.\.|…)$')])
                       AS INT) AS n_ellipsis_lines
                FROM (SELECT doc_id, text AS tx,
                        regexp_extract_all(lower(text), '\w+') AS t,
                        string_split(text, chr(10)) AS ls
                      FROM bat)
              ) WHERE n_words >= 30 AND n_words <= 100000
                  AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
                  AND 10 * n_symbols <= n_words
                  AND 5 * n_alpha_words >= 4 * n_words
                  AND stop_hits >= 2
                  AND 10 * n_bullet_lines <= 9 * n_lines
                  AND 10 * n_ellipsis_lines <= 3 * n_lines
            ), c4 AS (
              SELECT doc_id, source, array_to_string(kept, chr(10)) AS text
              FROM (
                SELECT doc_id, source,
                  [x for x in ls
                   if regexp_matches(trim(x), '[.!?"]$')
                      AND len([w for w in string_split(trim(x), ' ')
                               if w <> '']) >= 5] AS kept,
                  CAST(len(regexp_extract_all(tx, '[.!?]')) AS INT)
                    AS n_sentences,
                  contains(lower(tx), 'lorem ipsum') AS has_lorem,
                  contains(tx, '{') AS has_brace
                FROM (SELECT doc_id, source, text AS tx,
                        string_split(text, chr(10)) AS ls
                      FROM bat
                      WHERE doc_id IN (SELECT doc_id FROM lang)
                        AND doc_id IN (SELECT doc_id FROM gop))
              ) WHERE n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
                  AND len(kept) >= 1
            ), refg AS MATERIALIZED (
              SELECT DISTINCT g FROM (
                SELECT unnest(
                  [array_to_string(toks[i:i+9], ' ')
                   for i in range(1, len(toks) - 8)]) AS g
                FROM (SELECT regexp_extract_all(text, '\w+') AS toks
                      FROM corp)
              )
            ), sbase AS (
              SELECT doc_id AS id, regexp_extract_all(text, '\w+') AS toks
              FROM c4
            ), ssh AS (
              SELECT id, unnest(
                [{'pos': i - 1, 'g': array_to_string(toks[i:i+9], ' ')}
                 for i in range(1, len(toks) - 8)],
                recursive := true)
              FROM sbase
            ), hc AS (
              SELECT s.id, s.pos FROM ssh s JOIN refg USING (g)
            ), fresh AS (
              SELECT * FROM ssh s
              WHERE NOT EXISTS (SELECT 1 FROM refg r WHERE r.g = s.g)
            ), occ AS (
              SELECT id, pos,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY id, pos) AS rn,
                COUNT(*) OVER (PARTITION BY g) AS cnt
              FROM fresh
            ), rem AS (
              SELECT id, pos FROM occ WHERE cnt >= 2 AND rn > 1
              UNION ALL
              SELECT id, pos FROM hc
            ), cov AS (
              SELECT DISTINCT r.id, r.pos + d.d AS cpos
              FROM rem r
              CROSS JOIN (SELECT unnest(range(0, 10)) AS d) d
            ), stokpos AS (
              SELECT id, unnest(
                [{'i': i - 1, 'tok': toks[i]}
                 for i in range(1, len(toks) + 1)],
                recursive := true)
              FROM sbase
            ), stext AS MATERIALIZED (
              SELECT t.id AS doc_id, string_agg(t.tok, ' ' ORDER BY t.i) AS text
              FROM stokpos t
              LEFT JOIN cov c ON t.id = c.id AND t.i = c.cpos
              WHERE c.cpos IS NULL
              GROUP BY t.id
            ), msh AS (
              SELECT doc_id AS id,
                list_distinct([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, len(toks) - 1)]) AS sh
              FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
                    FROM stext)
              WHERE len(toks) >= 3
            ), wsig AS (
              SELECT id, sh,
                [list_min([md5(CAST(j AS VARCHAR) || ':' || s) for s in sh])
                 for j in range(0, 16)] AS sig
              FROM msh
            ), wbanded AS (
              SELECT id, unnest(
                [{'band': b, 'bh': md5(array_to_string(sig[b*4+1:b*4+4], '|'))}
                 for b in range(0, 4)],
                recursive := true)
              FROM wsig
            ), wbsz AS (
              SELECT band, bh, COUNT(*) AS n FROM wbanded GROUP BY band, bh
            ), wbok AS (
              SELECT wbanded.* FROM wbanded JOIN wbsz USING (band, bh)
              WHERE wbsz.n <= 256
            ), wcand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM wbok a JOIN wbanded b
                ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
            ), wpairs AS (
              SELECT p.id_a, p.id_b
              FROM wcand p
              JOIN msh x ON x.id = p.id_a
              JOIN msh y ON y.id = p.id_b
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
                  >= 0.2
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM wpairs
              UNION ALL
              SELECT id_b AS a, id_a AS b FROM wpairs
            ), reach AS (
              SELECT doc_id AS id, doc_id AS lab FROM stext
              UNION
              SELECT e.b AS id, r.lab
              FROM reach r JOIN edges e ON e.a = r.id
            ), survivors AS MATERIALIZED (
              SELECT id AS doc_id FROM reach GROUP BY id HAVING MIN(lab) = id
            ), ctoks AS (
              SELECT doc_id AS id, text,
                     regexp_extract_all(lower(text), '\w+') AS toks
              FROM corp
            ), csh AS (
              SELECT id,
                list_distinct([array_to_string(toks[i:i+2], ' ')
                               for i in range(1, len(toks) - 1)]) AS sh
              FROM ctoks WHERE len(toks) >= 3
            ), csig AS (
              SELECT id, sh,
                [list_min([md5(CAST(j AS VARCHAR) || ':' || s) for s in sh])
                 for j in range(0, 16)] AS sig
              FROM csh
            ), cbanded AS (
              SELECT id, unnest(
                [{'band': b, 'bh': md5(array_to_string(sig[b*4+1:b*4+4], '|'))}
                 for b in range(0, 4)],
                recursive := true)
              FROM csig
            ), nbanded AS (
              SELECT w.* FROM wbanded w JOIN survivors s ON w.id = s.doc_id
            ), xsz AS (
              SELECT band, bh, COUNT(*) AS n FROM (
                SELECT band, bh FROM nbanded
                UNION ALL
                SELECT band, bh FROM cbanded
              ) GROUP BY band, bh
            ), nbok AS (
              SELECT nbanded.* FROM nbanded JOIN xsz USING (band, bh)
              WHERE xsz.n <= 256
            ), xcand AS (
              SELECT DISTINCT n.id AS id_n, e.id AS id_e
              FROM nbok n JOIN cbanded e
                ON n.band = e.band AND n.bh = e.bh
            ), xdup AS (
              SELECT DISTINCT c.id_n FROM xcand c
              JOIN msh x ON x.id = c.id_n
              JOIN csh y ON y.id = c.id_e
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
                  >= 0.2
            ), xexact AS (
              SELECT DISTINCT t.doc_id
              FROM survivors s
              JOIN stext t USING (doc_id)
              JOIN (SELECT DISTINCT md5(text) AS d FROM corp) c
                ON md5(t.text) = c.d
            ), xadm AS MATERIALIZED (
              SELECT s.doc_id FROM survivors s
              WHERE s.doc_id NOT IN (SELECT id_n FROM xdup)
                AND s.doc_id NOT IN (SELECT doc_id FROM xexact)
            ), cgrams AS (
              SELECT doc_id,
                unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                      for i in range(1, len(t) - 3)])) AS g
              FROM (SELECT a.doc_id,
                      regexp_extract_all(lower(t.text), '\w+') AS t
                    FROM xadm a JOIN stext t USING (doc_id))
              WHERE len(t) >= 5
            ), bgrams AS (
              SELECT DISTINCT
                unnest([array_to_string(t[i:i+4], ' ')
                        for i in range(1, len(t) - 3)]) AS g
              FROM (SELECT regexp_extract_all(lower(text), '\w+') AS t
                    FROM syn WHERE doc_id % 25 = 0)
              WHERE len(t) >= 5
            ), contaminated AS (
              SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b USING (g)
            )
            SELECT a.doc_id, c.source, t.text AS clean_text
            FROM xadm a
            JOIN stext t USING (doc_id)
            JOIN c4 c USING (doc_id)
            WHERE a.doc_id NOT IN (SELECT doc_id FROM contaminated)
        """,
        "q_json": """
            SELECT event_type,
              COUNT(k) AS n_with_k,
              CAST(SUM(k) AS BIGINT) AS sum_k,
              MIN(k) AS min_k, MAX(k) AS max_k
            FROM (
              SELECT event_type,
                CAST(json_extract(props, '$.k') AS INT) AS k
              FROM events
            ) GROUP BY event_type
        """,
        "q_session_window": """
            -- session_window semantics differ from the manual
            -- sessionization in two ways mirrored here: the merge rule
            -- is STRICT (< gap) and session_end = last event + gap
            WITH m AS (
              SELECT user_id, ts,
                CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts)
                          < INTERVAL 3600 SECOND
                     THEN 0 ELSE 1 END AS new_sess
              FROM events
            ), s AS (
              SELECT user_id, ts,
                SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess
              FROM m
            )
            SELECT user_id, MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 3600 SECOND AS session_end,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, sess
        """,
        "q_retention": """
            WITH act AS (
              SELECT DISTINCT user_id,
                CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                CAST(MIN(date_trunc('day', ts))
                     OVER (PARTITION BY user_id) AS TIMESTAMP) AS cohort_day
              FROM events
            )
            SELECT cohort_day,
                   CAST(datediff('day', cohort_day, day) AS INT)
                     AS day_offset,
                   COUNT(*) AS n_users
            FROM act GROUP BY 1, 2
        """,
        "q_funnel": """
            WITH s1 AS (
              SELECT user_id,
                MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
              FROM events GROUP BY user_id
            ), s2 AS (
              SELECT e.user_id, s1.t_signup,
                MIN(CASE WHEN e.event_type = 'click'
                          AND e.ts > s1.t_signup THEN e.ts END) AS t_click
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              GROUP BY e.user_id, s1.t_signup
            ), s3 AS (
              SELECT e.user_id, s2.t_signup, s2.t_click,
                MIN(CASE WHEN e.event_type = 'purchase'
                          AND e.ts > s2.t_click THEN e.ts END) AS t_purchase
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              GROUP BY e.user_id, s2.t_signup, s2.t_click
            )
            SELECT COUNT(*) AS n_users,
                   COUNT(t_signup) AS n_signup,
                   COUNT(t_click) AS n_click_after,
                   COUNT(t_purchase) AS n_purchase_after
            FROM s3
        """,
        "g_triangles": """
            WITH op AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), e AS (
              SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey
            )
            SELECT COUNT(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """,
        "m_image": """
            SELECT CAST(x * 3 AS BIGINT) AS doc_id,
                   CAST(32 AS INT) AS width, CAST(24 AS INT) AS height,
                   CAST(3 AS INT) AS channels, 'ppm' AS format
            FROM range(0, 100) t(x)
        """,
        "m_dhash": """
            SELECT CAST(x * 3 AS BIGINT) AS doc_id,
                   CAST(-1 AS BIGINT) AS dhash
            FROM range(0, 100) t(x)
        """,
        "m_audio_segments": """
            WITH docs AS (
              SELECT CAST(x * 3 + 1 AS BIGINT) AS doc_id
              FROM range(0, 40) t(x)
            ), samp AS (
              SELECT d.doc_id, CAST(i.i AS INT) AS i,
                CAST(trunc(sin(2 * pi()
                       * (220.0 + (d.doc_id % 16) * 55.0)
                       * i.i / 8000.0) * 12000.0) AS BIGINT) AS s
              FROM docs d CROSS JOIN range(0, 2000) i(i)
            )
            SELECT doc_id, CAST(i // 250 AS INT) AS segment,
              CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_pos,
              CAST(SUM(abs(s)) AS BIGINT) AS energy
            FROM samp GROUP BY 1, 2
        """,
        "m_audio": """
            SELECT CAST(x * 3 + 1 AS BIGINT) AS doc_id,
                   CAST(8000 AS INT) AS sample_rate,
                   CAST(1 AS INT) AS channels,
                   CAST(250 AS INT) AS duration_ms
            FROM range(0, 100) t(x)
        """,
        "q_median": """
            SELECT event_type, value AS median_value FROM (
              SELECT event_type, value, event_id,
                ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM events
            ) WHERE rn = (n + 1) // 2
        """,
        "q_pivot": """
            SELECT user_id,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
              CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
            FROM events GROUP BY user_id
        """,
        "g_degrees": """
            WITH e AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), deg AS (
              SELECT n, COUNT(*) AS degree FROM (
                SELECT 'o:' || l_orderkey AS n FROM e
                UNION ALL
                SELECT 'p:' || l_partkey AS n FROM e
              ) GROUP BY n
            )
            SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
        """,
        "g_walks": f"""
            WITH fwd AS (
              SELECT DISTINCT l_orderkey * 2 AS s, l_partkey * 2 + 1 AS d
              FROM lineitem
            ), e AS (
              SELECT s, d FROM fwd UNION SELECT d, s FROM fwd
            ), w0 AS (
              SELECT DISTINCT s AS walk_id, s AS node FROM e
            ), {_walk_round(1, 'w0')},
            {_walk_round(2, 's1')},
            {_walk_round(3, 's2')},
            {_walk_round(4, 's3')}
            SELECT walk_id, 0 AS step, node FROM w0
            UNION ALL SELECT walk_id, 1 AS step, node FROM s1
            UNION ALL SELECT walk_id, 2 AS step, node FROM s2
            UNION ALL SELECT walk_id, 3 AS step, node FROM s3
            UNION ALL SELECT walk_id, 4 AS step, node FROM s4
        """,
        "g_pagerank": """
            WITH e AS (
              SELECT DISTINCT 'o:' || l_orderkey AS src,
                              'p:' || l_partkey AS dst
              FROM lineitem
            ), nodes AS (
              SELECT src AS id FROM e UNION SELECT dst FROM e
            ), deg AS (
              SELECT src, COUNT(*) AS deg FROM e GROUP BY 1
            ), r0 AS (
              SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes
            ), i1 AS (
              SELECT n.id,
                CAST(150000000 + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT) AS r
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS BIGINT) AS inc
                FROM e JOIN r0 r ON r.id = e.src
                       JOIN deg d ON d.src = e.src
                GROUP BY e.dst
              ) s ON n.id = s.id
            ), i2 AS (
              SELECT n.id,
                CAST(150000000 + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT) AS r
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS BIGINT) AS inc
                FROM e JOIN i1 r ON r.id = e.src
                       JOIN deg d ON d.src = e.src
                GROUP BY e.dst
              ) s ON n.id = s.id
            ), i3 AS (
              SELECT n.id,
                CAST(150000000 + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT) AS r
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS BIGINT) AS inc
                FROM e JOIN i2 r ON r.id = e.src
                       JOIN deg d ON d.src = e.src
                GROUP BY e.dst
              ) s ON n.id = s.id
            )
            SELECT id, r AS rank FROM i3
        """,
        "t_tokens": r"""
            SELECT doc_id,
              CAST(len(regexp_extract_all(text, '\w+')) AS INT) AS n_tokens
            FROM documents
        """,
        "t_quality": r"""
            WITH t AS (
              SELECT doc_id, text,
                     regexp_extract_all(lower(text), '\w+') AS toks
              FROM documents
            )
            SELECT doc_id,
              CAST(length(text) AS INT) AS n_chars2,
              CAST(len(toks) AS INT) AS n_tokens,
              CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS INT) AS n_punct,
              CAST(len(list_filter(toks, x -> x IN
                ('the','and','of','to','a','in','is','it'))) AS INT) AS n_stopwords,
              CAST(list_sum(list_transform(toks, x -> length(x))) AS INT) AS token_chars
            FROM t
        """,
        "t_fingerprint": r"""
            SELECT doc_id,
              md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "t_langid": r"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                len(list_filter(toks, x -> x IN ('der','und','das'))) AS s_de,
                len(list_filter(toks, x -> x IN ('the','and','of'))) AS s_en,
                len(list_filter(toks, x -> x IN ('el','los','de'))) AS s_es,
                len(list_filter(toks, x -> x IN ('le','les','et'))) AS s_fr
              FROM t
            )
            SELECT doc_id,
              CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
                   WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                   WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                   WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                   ELSE 'fr' END AS lang_guess
            FROM s
        """,
        "t_redact": r"""
            SELECT doc_id,
              regexp_replace(
                regexp_replace(
                  regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                    '<EMAIL>', 'g'),
                  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                '\+?\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g'
              ) AS redacted,
              CAST(len(regexp_extract_all(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '<EMAIL>', 'g'),
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                  '\+?\b\d{3}[- .]\d{3}[- .]\d{4}\b', '<PHONE>', 'g'
                ), '<EMAIL>|<IP>|<PHONE>')) AS INT) AS n_redactions
            FROM documents
        """,
        "t_repetition": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS tok
              FROM documents
            ), f AS (
              SELECT doc_id, tok, COUNT(*) AS c
              FROM toks GROUP BY doc_id, tok
            ), agg AS (
              SELECT doc_id,
                CAST(SUM(c) AS BIGINT) AS n_tokens,
                COUNT(*) AS n_distinct,
                CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                  AS dup_token_ratio,
                CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                  AS top_token_ratio
              FROM f GROUP BY doc_id
            )
            -- LEFT JOIN from documents: a zero-token document still
            -- gets a row (n=0, NULL ratios), matching the Spark
            -- operator's pure-column-expression semantics
            SELECT d.doc_id,
              CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
              CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
              a.dup_token_ratio, a.top_token_ratio
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "t_contaminate": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id,
                unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                                      for i in range(1, len(t) - 3)])) AS g
              FROM toks WHERE len(t) >= 5
            ), bench AS (
              SELECT DISTINCT g FROM grams WHERE doc_id % 25 = 0
            )
            SELECT c.doc_id, COUNT(DISTINCT c.g) AS n_contaminated
            FROM grams c JOIN bench b ON c.g = b.g
            WHERE c.doc_id % 25 <> 0
            GROUP BY c.doc_id
        """,
        "t_split": """
            WITH b AS (
              SELECT doc_id,
                CAST(('0x' || substr(md5(COALESCE(text, '')), 1, 8))::BIGINT
                     % 16 AS INT) AS bucket
              FROM documents
            )
            SELECT doc_id, bucket,
              CASE WHEN bucket < 1 THEN 'val'
                   WHEN bucket < 2 THEN 'test'
                   ELSE 'train' END AS split
            FROM b
        """,
        "t_bpe": r"""
            WITH toks AS (
              SELECT doc_id,
                regexp_extract_all(text,
                  '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'
                ) AS t
              FROM documents
            )
            SELECT doc_id,
              len([x for x in t if trim(x) <> '']) AS n_bpe,
              array_to_string(t[1:3], '|') AS head_toks
            FROM toks
        """,
        "t_html": r"""
            WITH h AS (
              SELECT doc_id,
                '<html><head><script>var x = 1 < 2;</script>'
                || '<style>p {color: red}</style></head><body>'
                || '<h1>Doc &amp; Title</h1><p>' || text
                || '</p><p>&#169; footer&nbsp;text &lt;end&gt;</p></body></html>'
                AS html
              FROM documents
            ), x AS (
              SELECT doc_id,
                -- entity order mirrors html_to_text: named entities,
                -- then the numeric sweep, then &amp; strictly last
                trim(regexp_replace(
                  replace(
                    regexp_replace(
                      replace(replace(replace(replace(replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(
                              regexp_replace(html,
                                '(?is)<script\b.*?</script\s*>', ' ', 'g'),
                              '(?is)<style\b.*?</style\s*>', ' ', 'g'),
                            '(?i)<(br|/p|/div|/li|/h[1-6]|/tr)\b[^>]*>',
                            chr(10), 'g'),
                          '(?s)<[^>]*>', ' ', 'g'),
                      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                      '&quot;', '"'), '&#39;', ''''),
                      '&#(\d+);', ' ', 'g'),
                  '&amp;', '&'),
                  '\s+', ' ', 'g')) AS text
              FROM h
            )
            SELECT doc_id, text,
              len(regexp_extract_all(text, '\w+')) AS n_tokens
            FROM x
        """,
        "t_mixture": """
            WITH c AS (
              SELECT source, COUNT(*) AS n FROM documents GROUP BY source
            ), w AS (
              SELECT source, n, pow(CAST(n AS DOUBLE), 0.5) AS w FROM c
            ), t AS (
              SELECT SUM(w) AS wsum, SUM(n) AS total FROM w
            ), r AS (
              SELECT w.source,
                LEAST(1.0,
                  (w.w / t.wsum) * (CAST(t.total AS DOUBLE) * 0.5) / w.n
                ) AS rate
              FROM w, t
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN r ON r.source = d.source
            WHERE CAST(CAST(('0x' || substr(md5(COALESCE(d.text, '')), 1, 8))::BIGINT
                       % 1048576 AS INT) AS DOUBLE) / 1048576 < r.rate
        """,
        # Full replay of the upsampling mixture rule: rates past 1
        # emit floor(rate) copies + a content-hash fractional copy;
        # range(0, copies) is empty when copies = 0, so those rows
        # vanish exactly like the Spark filter.
        "t_mixture_up": """
            WITH c AS (
              SELECT source, COUNT(*) AS n FROM documents GROUP BY source
            ), w AS (
              SELECT source, n, pow(CAST(n AS DOUBLE), 0.3) AS w FROM c
            ), t AS (
              SELECT SUM(w) AS wsum, SUM(n) AS total FROM w
            ), r AS (
              SELECT w.source,
                (w.w / t.wsum) * (CAST(t.total AS DOUBLE) * 1.0) / w.n
                  AS rate
              FROM w, t
            ), j AS (
              SELECT d.doc_id, d.source, r.rate,
                CAST(CAST(('0x' || substr(md5(COALESCE(d.text, '')), 1, 8))::BIGINT
                     % 1048576 AS INT) AS DOUBLE) / 1048576 AS bf
              FROM documents d JOIN r ON r.source = d.source
            ), n AS (
              SELECT doc_id, source,
                CAST(floor(rate)
                     + CASE WHEN bf < rate - floor(rate) THEN 1 ELSE 0 END
                     AS INT) AS copies
              FROM j
            )
            SELECT doc_id, source,
                   CAST(unnest(range(0, copies)) AS INT) AS replica
            FROM n
            ORDER BY doc_id, replica
        """,
        "t_shards": """
            SELECT doc_id,
              CAST(('0x' || substr(md5('x' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 16 AS INT) AS shard,
              md5('x' || CAST(doc_id AS VARCHAR)) AS sort_key
            FROM documents
        """,
        "t_paradedup": r"""
            WITH syn AS (
              SELECT doc_id,
                regexp_replace(text, '((?:\S+ ){4}\S+) ',
                  '\1' || chr(10) || chr(10), 'g') AS text
              FROM documents
            ), paras AS (
              SELECT doc_id,
                unnest([{'pos': i - 1, 'para': arr[i]}
                        for i in range(1, len(arr) + 1)],
                       recursive := true)
              FROM (SELECT doc_id,
                      regexp_split_to_array(text, '\n{2,}') AS arr
                    FROM syn)
            ), pd AS (
              SELECT doc_id, pos, para FROM paras WHERE trim(para) <> ''
            ), dfreq AS (
              SELECT para, COUNT(DISTINCT doc_id) AS pdf
              FROM pd GROUP BY para
            ), kept AS (
              SELECT p.doc_id, p.pos, p.para, (f.pdf > 1) AS drp
              FROM pd p JOIN dfreq f USING (para)
            )
            SELECT doc_id,
              COALESCE(array_to_string(
                list(para ORDER BY pos) FILTER (WHERE NOT drp),
                chr(10) || chr(10)), '') AS clean_text,
              CAST(COUNT(*) AS INT) AS n_paragraphs,
              CAST(COUNT(*) FILTER (WHERE drp) AS INT) AS n_dropped
            FROM kept GROUP BY doc_id
        """,
        "d_spans": r"""
            WITH sh AS (
              SELECT doc_id AS id,
                list_distinct([array_to_string(toks[i:i+4], ' ')
                               for i in range(1, len(toks) - 3)]) AS sh
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 5
            ), g AS (
              SELECT id, unnest(sh) AS g FROM sh
            ), dup AS (
              SELECT g FROM (
                SELECT g, COUNT(DISTINCT id) AS nd FROM g GROUP BY g
              ) WHERE nd >= 2
            )
            SELECT id AS doc_id, COUNT(*) AS n_dup_spans
            FROM g WHERE g IN (SELECT g FROM dup)
            GROUP BY id
        """,
        # HITS: 2 unrolled iterations; each half-step = edge join +
        # SUM, then floor-div max-normalization via a scalar subquery
        # (the g_pagerank unrolled-rounds pattern).
        "g_hits": r"""
            WITH e AS (
              SELECT DISTINCT 'o:' || l_orderkey AS src,
                              'p:' || l_partkey AS dst
              FROM lineitem
            ), nodes AS (
              SELECT src AS id FROM e UNION SELECT dst FROM e
            ), h0 AS (
              SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes
            ), a1r AS (
              SELECT e.dst AS id, CAST(SUM(h.h) AS BIGINT) AS v
              FROM e JOIN h0 h ON h.id = e.src GROUP BY e.dst
            ), a1 AS (
              SELECT n.id,
                CAST((COALESCE(r.v, 0) * 1000000)
                     // greatest((SELECT MAX(v) FROM a1r), 1)
                     AS BIGINT) AS a
              FROM nodes n LEFT JOIN a1r r ON n.id = r.id
            ), h1r AS (
              SELECT e.src AS id, CAST(SUM(a.a) AS BIGINT) AS v
              FROM e JOIN a1 a ON a.id = e.dst GROUP BY e.src
            ), h1 AS (
              SELECT n.id,
                CAST((COALESCE(r.v, 0) * 1000000)
                     // greatest((SELECT MAX(v) FROM h1r), 1)
                     AS BIGINT) AS h
              FROM nodes n LEFT JOIN h1r r ON n.id = r.id
            ), a2r AS (
              SELECT e.dst AS id, CAST(SUM(h.h) AS BIGINT) AS v
              FROM e JOIN h1 h ON h.id = e.src GROUP BY e.dst
            ), a2 AS (
              SELECT n.id,
                CAST((COALESCE(r.v, 0) * 1000000)
                     // greatest((SELECT MAX(v) FROM a2r), 1)
                     AS BIGINT) AS a
              FROM nodes n LEFT JOIN a2r r ON n.id = r.id
            ), h2r AS (
              SELECT e.src AS id, CAST(SUM(a.a) AS BIGINT) AS v
              FROM e JOIN a2 a ON a.id = e.dst GROUP BY e.src
            ), h2 AS (
              SELECT n.id,
                CAST((COALESCE(r.v, 0) * 1000000)
                     // greatest((SELECT MAX(v) FROM h2r), 1)
                     AS BIGINT) AS h
              FROM nodes n LEFT JOIN h2r r ON n.id = r.id
            )
            SELECT n.id, h2.h AS hub, a2.a AS authority
            FROM nodes n JOIN h2 ON n.id = h2.id JOIN a2 ON n.id = a2.id
        """,
        "s_kcenter": _kcenter_oracle(6),
        # SemDeDup: replay the deterministic kmeans (seeds = first 8
        # ids, 2 decimal-exact Lloyd rounds — the s_knn_ivf oracle
        # pattern with LIMIT 8), then the in-cluster pair rule.
        "d_semdedup": _SEMDEDUP_KMEANS_CTE + r""", dup AS (
              SELECT b.id AS id, MIN(a.id) AS dup_of
              FROM bucketed a JOIN bucketed b
                ON a.c = b.c AND a.id < b.id
              WHERE list_cosine_similarity(a.v, b.v) >= 0.43
              GROUP BY b.id
            )
            SELECT bk.id AS vec_id, CAST(bk.c AS INT) AS cluster,
                   dup.dup_of IS NULL AS kept, dup.dup_of
            FROM bucketed bk LEFT JOIN dup ON bk.id = dup.id
        """,
        # Paper-faithful keep rule (Abbas et al. 2023 §3): within a
        # twin group keep the point FARTHEST from its centroid —
        # precedence is the integer-scaled centroid cosine
        # floor(cos·1e9) with id tiebreak, replayed with the same
        # sequential array-order folds the Spark expressions use.
        "d_semdedup_far": _SEMDEDUP_KMEANS_CTE + r""", keyed AS (
              SELECT bk.id, bk.v, bk.c,
                CAST(floor(1e9 * (
                  list_sum([bk.v[i] * cv.v[i]
                            for i in range(1, len(bk.v)+1)])
                  / (sqrt(list_sum([bk.v[i] * bk.v[i]
                                    for i in range(1, len(bk.v)+1)]))
                     * sqrt(list_sum([cv.v[i] * cv.v[i]
                                      for i in range(1, len(cv.v)+1)])))
                )) AS BIGINT) AS k
              FROM bucketed bk JOIN c2 cv USING (c)
            ), dup AS (
              SELECT id, dup_of FROM (
                SELECT b.id AS id, a.id AS dup_of,
                  ROW_NUMBER() OVER (PARTITION BY b.id
                    ORDER BY a.k, a.id) AS rn
                FROM keyed a JOIN keyed b
                  ON a.c = b.c
                  AND (a.k < b.k OR (a.k = b.k AND a.id < b.id))
                WHERE list_cosine_similarity(a.v, b.v) >= 0.43
              ) WHERE rn = 1
            )
            SELECT bk.id AS vec_id, CAST(bk.c AS INT) AS cluster,
                   dup.dup_of IS NULL AS kept, dup.dup_of
            FROM keyed bk LEFT JOIN dup ON bk.id = dup.id
        """,
        # Per-domain stats: host and canonical URL derived analytically
        # per synthesized case (t_urlnorm's CASE table), then one
        # GROUP BY host. n_chars SUM cast to BIGINT (checklist rule).
        "t_domains": r"""
            WITH u AS (
              SELECT doc_id, n_chars,
                'example' || (doc_id % 7) || '.com' AS host,
                CASE doc_id % 6
                  WHEN 0 THEN 'http://example' || (doc_id % 7)
                    || '.com/path/a?x=' || (doc_id % 5)
                  WHEN 1 THEN 'http://example' || (doc_id % 7)
                    || '.com/path/a?x=' || (doc_id % 5)
                  WHEN 2 THEN 'https://example' || (doc_id % 7)
                    || '.com/path/b'
                  WHEN 3 THEN 'https://example' || (doc_id % 7)
                    || '.com/path/b'
                  WHEN 4 THEN 'http://example' || (doc_id % 7)
                    || '.com/p%2Fq?a=' || (doc_id % 5) || '&b=2'
                  ELSE 'http://example' || (doc_id % 7)
                    || '.com/p%2Fq?a=' || (doc_id % 5) || '&b=2'
                END AS canon
              FROM documents
            )
            SELECT host,
                   COUNT(*) AS n_docs,
                   COUNT(DISTINCT canon) AS n_urls,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM u GROUP BY host
        """,
        # Independent relational formulation of the span trim: covered
        # positions via a start-to-offset join, span count via
        # islands-and-gaps (lag), clean_text via ordered string_agg of
        # the uncovered tokens — no shared code shape with the Spark
        # run-length array aggregate.
        "d_trimspans": r"""
            WITH base AS (
              SELECT doc_id AS id,
                     regexp_extract_all(text, '\w+') AS toks
              FROM documents
            ), sh AS (
              SELECT id, unnest(
                [{'pos': i - 1,
                  'g': lower(array_to_string(toks[i:i+4], ' '))}
                 for i in range(1, len(toks) - 3)],
                recursive := true)
              FROM base
            ), dup AS (
              SELECT g FROM (
                SELECT g, COUNT(DISTINCT id) AS nd FROM sh GROUP BY g
              ) WHERE nd >= 2
            ), cov AS (
              SELECT DISTINCT s.id, s.pos + d.d AS cpos
              FROM sh s
              JOIN dup USING (g)
              CROSS JOIN (SELECT unnest(range(0, 5)) AS d) d
            ), sp AS (
              SELECT id,
                     CAST(COUNT(*) AS INT) AS n_removed,
                     CAST(SUM(CASE WHEN prev = cpos - 1 THEN 0 ELSE 1
                              END) AS INT) AS n_spans
              FROM (
                SELECT id, cpos,
                       lag(cpos) OVER (PARTITION BY id ORDER BY cpos)
                         AS prev
                FROM cov
              ) GROUP BY id
            ), tokpos AS (
              SELECT id, unnest(
                [{'i': i - 1, 'tok': toks[i]}
                 for i in range(1, len(toks) + 1)],
                recursive := true)
              FROM base
            ), ct AS (
              SELECT t.id,
                     string_agg(t.tok, ' ' ORDER BY t.i) AS clean_text
              FROM tokpos t
              LEFT JOIN cov c ON t.id = c.id AND t.i = c.cpos
              WHERE c.cpos IS NULL
              GROUP BY t.id
            )
            SELECT b.id AS doc_id,
                   COALESCE(ct.clean_text, '') AS clean_text,
                   CAST(len(b.toks) AS INT) AS n_tokens,
                   COALESCE(sp.n_removed, 0) AS n_removed,
                   COALESCE(sp.n_spans, 0) AS n_spans
            FROM base b
            LEFT JOIN ct ON b.id = ct.id
            LEFT JOIN sp ON b.id = sp.id
        """,
        # ExactSubstr: verbatim (NO lower()) 10-token windows,
        # total-occurrence >= 2 threshold, keep-one = the (id, pos)-
        # smallest occurrence (ROW_NUMBER replay of Spark's
        # min(struct(id, pos))); the trim tail mirrors d_trimspans.
        "d_substr": r"""
            WITH base AS (
              SELECT doc_id AS id,
                     regexp_extract_all(text, '\w+') AS toks
              FROM documents
            ), sh AS (
              SELECT id, unnest(
                [{'pos': i - 1,
                  'g': array_to_string(toks[i:i+9], ' ')}
                 for i in range(1, len(toks) - 8)],
                recursive := true)
              FROM base
            ), occ AS (
              SELECT id, pos,
                ROW_NUMBER() OVER (PARTITION BY g ORDER BY id, pos)
                  AS rn,
                COUNT(*) OVER (PARTITION BY g) AS cnt
              FROM sh
            ), rem AS (
              SELECT id, pos FROM occ WHERE cnt >= 2 AND rn > 1
            ), cov AS (
              SELECT DISTINCT r.id, r.pos + d.d AS cpos
              FROM rem r
              CROSS JOIN (SELECT unnest(range(0, 10)) AS d) d
            ), sp AS (
              SELECT id,
                     CAST(COUNT(*) AS INT) AS n_removed,
                     CAST(SUM(CASE WHEN prev = cpos - 1 THEN 0 ELSE 1
                              END) AS INT) AS n_spans
              FROM (
                SELECT id, cpos,
                       lag(cpos) OVER (PARTITION BY id ORDER BY cpos)
                         AS prev
                FROM cov
              ) GROUP BY id
            ), tokpos AS (
              SELECT id, unnest(
                [{'i': i - 1, 'tok': toks[i]}
                 for i in range(1, len(toks) + 1)],
                recursive := true)
              FROM base
            ), ct AS (
              SELECT t.id,
                     string_agg(t.tok, ' ' ORDER BY t.i) AS clean_text
              FROM tokpos t
              LEFT JOIN cov c ON t.id = c.id AND t.i = c.cpos
              WHERE c.cpos IS NULL
              GROUP BY t.id
            )
            SELECT b.id AS doc_id,
                   COALESCE(ct.clean_text, '') AS clean_text,
                   CAST(len(b.toks) AS INT) AS n_tokens,
                   COALESCE(sp.n_removed, 0) AS n_removed,
                   COALESCE(sp.n_spans, 0) AS n_spans
            FROM base b
            LEFT JOIN ct ON b.id = ct.id
            LEFT JOIN sp ON b.id = sp.id
        """,
        # Asymmetric ExactSubstr: corpus = doc_id % 3 = 0 slice,
        # batch = the rest; corpus-window hits remove EVERY batch
        # occurrence, batch-fresh windows get the same keep-one
        # ROW_NUMBER replay as d_substr; trim tail identical.
        "d_substr_against": _SUBSTR_AGAINST_SQL,
        # d_substr_index: identical verdict — the entry certifies
        # the PERSISTED fingerprint index reproduces the exact-
        # string semantics (the d_index-vs-d_against pattern).
        "d_substr_index": _SUBSTR_AGAINST_SQL,
        # Gopher n-gram repetition: top = count x token-chars of the
        # most frequent n-gram (ROW_NUMBER tie-break to smallest
        # gram, replaying Spark's min(struct(-cnt, g))); dup = merged
        # char coverage of >=2-count n-grams via DISTINCT covered
        # positions; division-free verdicts with T_n = 24-2n / 20-n.
        "t_rep_ngrams": r"""
            WITH base AS (
              SELECT doc_id AS id,
                     regexp_extract_all(lower(text), '\w+') AS toks
              FROM documents
            ), chars AS (
              SELECT id,
                CAST(COALESCE(list_sum([length(x) for x in toks]), 0)
                     AS BIGINT) AS wc
              FROM base
            ), ns AS (
              SELECT unnest(range(2, 11)) AS n
            ), grams AS (
              SELECT b.id, ns.n, unnest(
                [{'pos': i - 1,
                  'g': array_to_string(toks[i:i+CAST(ns.n AS INT)-1],
                                       ' ')}
                 for i in range(1, len(toks) - CAST(ns.n AS INT) + 2)],
                recursive := true)
              FROM base b CROSS JOIN ns
            ), counts AS (
              SELECT id, n, g, COUNT(*) AS cnt
              FROM grams GROUP BY 1, 2, 3
            ), top AS (
              SELECT id, n,
                CAST(cnt * (length(g) - (n - 1)) AS BIGINT) AS cov
              FROM (
                SELECT id, n, g, cnt,
                  ROW_NUMBER() OVER (PARTITION BY id, n
                                     ORDER BY cnt DESC, g) AS rn
                FROM counts
              ) WHERE rn = 1 AND n <= 4
            ), dupocc AS (
              SELECT g2.id, g2.n, g2.pos
              FROM grams g2
              JOIN counts c
                ON g2.id = c.id AND g2.n = c.n AND g2.g = c.g
              WHERE c.cnt >= 2 AND g2.n >= 5
            ), cov AS (
              SELECT DISTINCT id, n, pos + d AS cpos
              FROM (
                SELECT id, n, pos, unnest(range(0, n)) AS d
                FROM dupocc
              )
            ), tokpos AS (
              SELECT id, unnest(
                [{'i': i - 1, 'len': length(toks[i])}
                 for i in range(1, len(toks) + 1)],
                recursive := true)
              FROM base
            ), dupcov AS (
              SELECT c.id, c.n, CAST(SUM(t.len) AS BIGINT) AS cov
              FROM cov c
              JOIN tokpos t ON c.id = t.id AND c.cpos = t.i
              GROUP BY 1, 2
            )
            SELECT ch.id AS doc_id,
              CAST(ns.n AS INT) AS n,
              CASE WHEN ns.n <= 4 THEN 'top' ELSE 'dup' END AS rule,
              CAST(COALESCE(CASE WHEN ns.n <= 4 THEN top.cov
                                 ELSE dupcov.cov END, 0)
                   AS BIGINT) AS cov_chars,
              ch.wc AS word_chars,
              (100 * COALESCE(CASE WHEN ns.n <= 4 THEN top.cov
                                   ELSE dupcov.cov END, 0)
               <= (CASE WHEN ns.n <= 4 THEN 24 - 2 * ns.n
                        ELSE 20 - ns.n END) * ch.wc) AS ok
            FROM chars ch
            CROSS JOIN ns
            LEFT JOIN top ON top.id = ch.id AND top.n = ns.n
            LEFT JOIN dupcov
              ON dupcov.id = ch.id AND dupcov.n = ns.n
        """,
        # The oracle does NOT replay the normalization chain: it
        # derives each synthesized case's expected canonical form
        # analytically (independent derivation, the m_dhash
        # closed-form pattern), then aggregates like url_dedup.
        "t_urlnorm": r"""
            WITH u AS (
              SELECT doc_id,
                CASE doc_id % 6
                  WHEN 0 THEN 'HTTP://Example' || (doc_id % 7)
                    || '.COM/path/a/?utm_source=feed&x=' || (doc_id % 5)
                  WHEN 1 THEN 'http://example' || (doc_id % 7)
                    || '.com:80/path/a?x=' || (doc_id % 5)
                    || '&utm_campaign=z'
                  WHEN 2 THEN 'https://Example' || (doc_id % 7)
                    || '.com:443/path/b/#frag'
                  WHEN 3 THEN 'https://example' || (doc_id % 7)
                    || '.com/path/b'
                  WHEN 4 THEN 'http://example' || (doc_id % 7)
                    || '.com/p%2fq?b=2&a=' || (doc_id % 5)
                  ELSE 'http://example' || (doc_id % 7)
                    || '.com/p%2Fq?gclid=abc&a=' || (doc_id % 5)
                    || '&b=2'
                END AS raw,
                CASE doc_id % 6
                  WHEN 0 THEN 'http://example' || (doc_id % 7)
                    || '.com/path/a?x=' || (doc_id % 5)
                  WHEN 1 THEN 'http://example' || (doc_id % 7)
                    || '.com/path/a?x=' || (doc_id % 5)
                  WHEN 2 THEN 'https://example' || (doc_id % 7)
                    || '.com/path/b'
                  WHEN 3 THEN 'https://example' || (doc_id % 7)
                    || '.com/path/b'
                  WHEN 4 THEN 'http://example' || (doc_id % 7)
                    || '.com/p%2Fq?a=' || (doc_id % 5) || '&b=2'
                  ELSE 'http://example' || (doc_id % 7)
                    || '.com/p%2Fq?a=' || (doc_id % 5) || '&b=2'
                END AS canon_url
              FROM documents
            )
            SELECT canon_url,
                   MIN(doc_id) AS keeper_id,
                   COUNT(*) AS n_copies,
                   COUNT(DISTINCT raw) AS n_variants
            FROM u GROUP BY canon_url
        """,
        "t_cooc": r"""
            WITH t AS (
              SELECT regexp_extract_all(lower(text), '\w+') AS toks
              FROM documents
            ), p AS (
              SELECT unnest(flatten([
                [{'a': least(toks[i], toks[i+d]),
                  'b': greatest(toks[i], toks[i+d])}
                 for d in range(1, 4) if i + d <= len(toks)]
                for i in range(1, len(toks) + 1)
              ]), recursive := true)
              FROM t
            )
            SELECT a, b, COUNT(*) AS cnt
            FROM p GROUP BY a, b HAVING COUNT(*) >= 5
        """,
        "t_tiers": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\w+') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                (CAST(len(list_filter(toks, x -> x IN
                   ('the','and','of','to','a','in','is','it'))) AS BIGINT)
                 * 1000000) // CAST(len(toks) AS BIGINT) AS density_ppm
              FROM t WHERE len(toks) > 0
            )
            SELECT doc_id, density_ppm,
              CAST(ntile(10) OVER (ORDER BY density_ppm DESC, doc_id)
                   AS INT) AS bucket
            FROM s
        """,
        "t_scripts": r"""
            SELECT doc_id,
              CAST(length(text) - length(regexp_replace(text,
                '\p{Latin}', '', 'g')) AS INT) AS latin_n,
              CAST(length(text) - length(regexp_replace(text,
                '\p{Cyrillic}', '', 'g')) AS INT) AS cyrillic_n,
              CAST(length(text) - length(regexp_replace(text,
                '\p{Han}', '', 'g')) AS INT) AS han_n,
              CAST(length(text) - length(regexp_replace(text,
                '\p{Arabic}', '', 'g')) AS INT) AS arabic_n,
              CAST(length(text) - length(regexp_replace(text,
                '[0-9]', '', 'g')) AS INT) AS digit_n,
              CAST(length(text) AS INT) AS total_n
            FROM documents
        """,
        "t_postings": r"""
            WITH toks AS (
              SELECT DISTINCT doc_id,
                unnest(regexp_extract_all(lower(text), '\w+')) AS term
              FROM documents
            )
            SELECT term, COUNT(*) AS df,
              array_to_string(list(doc_id ORDER BY doc_id), ',')
                AS postings
            FROM toks GROUP BY term
        """,
        "t_clean": r"""
            WITH c AS (
              SELECT doc_id, text,
                trim(regexp_replace(regexp_replace(text,
                  '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                  '[ \t\r\n]+', ' ', 'g')) AS cleaned
              FROM documents
            )
            SELECT doc_id, cleaned,
              CAST(length(text) - length(cleaned) AS INT) AS n_removed
            FROM c
        """,
        "t_urls": r"""
            WITH u AS (
              SELECT doc_id, regexp_extract_all(text,
                'https?://[A-Za-z0-9._~:/?#@!$&''()*+,;=%-]+') AS urls
              FROM documents
            )
            SELECT doc_id,
              CAST(len(urls) AS INT) AS n_urls,
              CAST(COALESCE(list_sum([length(x) for x in urls]), 0)
                   AS INT) AS url_chars
            FROM u
        """,
        "t_tfidf": r"""
            WITH toks AS (
              SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '\w+')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
            ), dfreq AS (
              SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
            ), n AS (SELECT COUNT(*) AS n FROM documents)
            SELECT doc_id, term, tf, df, rank FROM (
              SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                  ORDER BY CAST(tf.tf * n.n AS DOUBLE) / dfreq.df DESC,
                           tf.term) AS INT) AS rank
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            ) WHERE rank <= 3
        """,
        "t_vocab": r"""
            WITH toks AS (
              SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '\w+')) AS term
              FROM documents
            ), per_doc AS (
              SELECT doc_id, term, COUNT(*) AS n FROM toks GROUP BY 1, 2
            )
            SELECT term, CAST(SUM(n) AS BIGINT) AS n_occurrences,
                   COUNT(*) AS n_docs
            FROM per_doc GROUP BY term
            ORDER BY n_occurrences DESC, term LIMIT 50
        """,
        "t_trigram_lm": """
            WITH tg AS (
              SELECT doc_id,
                unnest([substr(lower(text), i, 3)
                        for i in range(1, length(lower(text)) - 1)]) AS tri
              FROM documents
            ), model AS (
              SELECT tri, COUNT(*) AS freq FROM tg GROUP BY 1
            )
            SELECT t.doc_id, COUNT(*) AS n_trigrams,
                   CAST(SUM(m.freq) AS BIGINT) AS freq_sum
            FROM tg t JOIN model m USING (tri) GROUP BY t.doc_id
        """,
        "t_chunks": """
            WITH c AS (
              SELECT doc_id, unnest(
                [{'idx': s, 'txt': substr(text, s*150 + 1, 200)}
                 for s in range(0, CASE WHEN length(text) > 0
                   THEN (length(text) - 1) // 150 + 1 ELSE 0 END)],
                recursive := true)
              FROM documents
            )
            SELECT doc_id, CAST(idx AS INT) AS chunk_idx,
                   txt AS chunk_text
            FROM c
        """,
        "t_pack": r"""
            WITH t AS (
              SELECT doc_id,
                CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT)
                  AS n_tokens
              FROM documents
            ), c AS (
              SELECT doc_id, n_tokens,
                CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS "offset"
              FROM t
            )
            SELECT doc_id, n_tokens, "offset", "offset" // 1000 AS bin
            FROM c
        """,
        "q_stratified": """
            SELECT event_id, event_type, user_id FROM (
              SELECT event_id, event_type, user_id,
                ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
              FROM events
            ) WHERE rn <= 20
        """,
        # CMS cells + min-over-rows estimates, integer-exact via the
        # seeded-md5 cell hashing (see functions/sketch.py).
        "t_countmin": r"""
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS tok
              FROM documents
            ), rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
            cells AS (
              SELECT r,
                CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok),
                      1, 15))::BIGINT % 2048 AS BIGINT) AS bucket,
                COUNT(*) AS cnt
              FROM toks, rs GROUP BY 1, 2
            ), keys AS (SELECT DISTINCT tok AS key FROM toks),
            probes AS (
              SELECT k.key, rs.r,
                CAST(('0x' || substr(md5(CAST(rs.r AS VARCHAR) || ':' || k.key),
                      1, 15))::BIGINT % 2048 AS BIGINT) AS bucket
              FROM keys k, rs
            )
            SELECT key, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
            FROM probes p LEFT JOIN cells c
              ON c.r = p.r AND c.bucket = p.bucket
            GROUP BY key HAVING MIN(COALESCE(c.cnt, 0)) >= 200
        """,
        # KMV sketch: the k smallest distinct digests are a pure SQL
        # statement — fixed-width lowercase hex makes string order =
        # numeric order, so LIMIT k selects the same set.
        "t_kmv": r"""
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) AS INT) AS rank,
                   h, CAST(128 AS INT) AS k
            FROM (
              SELECT DISTINCT md5(CAST(doc_id AS VARCHAR) || ':' || t) AS h
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '\w+')) AS t
                    FROM documents)
              ORDER BY h LIMIT 128
            )
        """,
        # 2 unrolled synchronous LPA rounds: neighbor-label counts,
        # arg-max by (cnt DESC, label ASC) — labels are the PACKED
        # numeric ids (min-label must order numerically, which the
        # string-rendered g_hits edge form would not).
        "g_lpa": r"""
            WITH und AS (
              SELECT DISTINCT l_orderkey * 2 AS u,
                              l_partkey * 2 + 1 AS v
              FROM lineitem
            ), b AS (
              SELECT u, v FROM und
              UNION ALL
              SELECT v AS u, u AS v FROM und
            ), l0 AS (
              SELECT DISTINCT u AS id, u AS label FROM b
            ), c1 AS (
              SELECT b.u AS id, l.label, COUNT(*) AS cnt
              FROM b JOIN l0 l ON l.id = b.v
              GROUP BY b.u, l.label
            ), r1 AS (
              SELECT id, label FROM (
                SELECT id, label,
                  ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY cnt DESC, label) AS rn
                FROM c1) WHERE rn = 1
            ), c2 AS (
              SELECT b.u AS id, l.label, COUNT(*) AS cnt
              FROM b JOIN r1 l ON l.id = b.v
              GROUP BY b.u, l.label
            ), r2 AS (
              SELECT id, label FROM (
                SELECT id, label,
                  ROW_NUMBER() OVER (PARTITION BY id
                    ORDER BY cnt DESC, label) AS rn
                FROM c2) WHERE rn = 1
            )
            SELECT
              CASE WHEN id % 2 = 0 THEN 'o:' || (id // 2)
                   ELSE 'p:' || ((id - 1) // 2) END AS id,
              CASE WHEN label % 2 = 0 THEN 'o:' || (label // 2)
                   ELSE 'p:' || ((label - 1) // 2) END AS community
            FROM r2
        """,
        # Gopher rules: division-free integer comparisons replayed
        # verbatim; symbol count = '#' + '...' + '…' occurrences (the
        # r11 fix: the symbol rule now counts the Unicode ellipsis the
        # way the ellipsis-line rule always did).
        "t_gopher": r"""
            WITH b AS (
              SELECT doc_id,
                regexp_extract_all(lower(COALESCE(text, '')), '\w+') AS t,
                string_split(COALESCE(text, ''), chr(10)) AS ls,
                len(string_split(COALESCE(text, ''), '#')) - 1
                  + len(regexp_split_to_array(COALESCE(text, ''),
                                              '\.\.\.')) - 1
                  + len(string_split(COALESCE(text, ''), '…')) - 1
                  AS n_symbols
              FROM documents
            ), m AS (
              SELECT doc_id,
                CAST(len(t) AS INT) AS n_words,
                CAST(COALESCE(list_sum([length(x) for x in t]), 0)
                     AS INT) AS word_chars,
                CAST(n_symbols AS INT) AS n_symbols,
                CAST(len([x for x in t if regexp_matches(x, '[a-z]')])
                     AS INT) AS n_alpha_words,
                CAST(len([w for w in
                          ['the','a','table','value','row','fast']
                          if list_contains(t, w)]) AS INT) AS stop_hits,
                CAST(len(ls) AS INT) AS n_lines,
                CAST(len([x for x in ls
                          if regexp_matches(trim(x), '^[-*•]')])
                     AS INT) AS n_bullet_lines,
                CAST(len([x for x in ls
                          if regexp_matches(trim(x), '(\.\.\.|…)$')])
                     AS INT) AS n_ellipsis_lines
              FROM b
            )
            SELECT doc_id, n_words, word_chars, n_symbols,
                   n_alpha_words, stop_hits, n_lines, n_bullet_lines,
                   n_ellipsis_lines,
              (n_words >= 30 AND n_words <= 100000) AS ok_word_count,
              (word_chars >= 3 * n_words
               AND word_chars <= 10 * n_words) AS ok_mean_word_len,
              (10 * n_symbols <= n_words) AS ok_symbol_ratio,
              (5 * n_alpha_words >= 4 * n_words) AS ok_alpha_words,
              (stop_hits >= 2) AS ok_stopwords,
              (10 * n_bullet_lines <= 9 * n_lines) AS ok_bullet_lines,
              (10 * n_ellipsis_lines <= 3 * n_lines)
                AS ok_ellipsis_lines,
              ((n_words >= 30 AND n_words <= 100000)
               AND (word_chars >= 3 * n_words
                    AND word_chars <= 10 * n_words)
               AND (10 * n_symbols <= n_words)
               AND (5 * n_alpha_words >= 4 * n_words)
               AND (stop_hits >= 2)
               AND (10 * n_bullet_lines <= 9 * n_lines)
               AND (10 * n_ellipsis_lines <= 3 * n_lines))
                AS pass_gopher
            FROM m
        """,
        "t_gopher_lines": r"""
            WITH src AS (
              SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                  THEN '- ' || replace(text, ' ', chr(10) || '- ')
                 WHEN doc_id % 3 = 1
                  THEN replace(text, ' ', '...' || chr(10))
                 ELSE replace(text, ' join', chr(10) || 'join') END
                  AS text
              FROM documents
            ), b AS (
              SELECT doc_id,
                string_split(COALESCE(text, ''), chr(10)) AS ls
              FROM src
            ), m AS (
              SELECT doc_id,
                CAST(len(ls) AS INT) AS n_lines,
                CAST(len([x for x in ls
                          if regexp_matches(trim(x), '^[-*•]')])
                     AS INT) AS n_bullet_lines,
                CAST(len([x for x in ls
                          if regexp_matches(trim(x), '(\.\.\.|…)$')])
                     AS INT) AS n_ellipsis_lines
              FROM b
            )
            SELECT doc_id, n_lines, n_bullet_lines, n_ellipsis_lines,
              (10 * n_bullet_lines <= 9 * n_lines) AS ok_bullet_lines,
              (10 * n_ellipsis_lines <= 3 * n_lines)
                AS ok_ellipsis_lines
            FROM m
        """,
        # C4 battery over the same deterministic line synthesis as
        # the Spark entry; list comprehensions mirror the array
        # filter lambdas exactly.
        "t_c4": r"""
            WITH src AS (
              SELECT doc_id,
                CASE WHEN doc_id % 4 = 0
                  THEN replace(text, ' row', '.' || chr(10)) || '.'
                 WHEN doc_id % 4 = 1 THEN text || ' {x}'
                 WHEN doc_id % 4 = 2
                  THEN 'lorem ipsum ' ||
                       replace(text, ' row', '.' || chr(10)) || '.'
                 ELSE text END AS text
              FROM documents
            ), b AS (
              SELECT doc_id, COALESCE(text, '') AS t,
                     string_split(COALESCE(text, ''), chr(10)) AS ls
              FROM src
            ), m AS (
              SELECT doc_id,
                CAST(len(ls) AS INT) AS n_lines,
                [x for x in ls
                 if regexp_matches(trim(x), '[.!?"]$')
                    AND len([w for w in string_split(trim(x), ' ')
                             if w != '']) >= 5] AS kept,
                CAST(len(regexp_extract_all(t, '[.!?]')) AS INT)
                  AS n_sentences,
                contains(lower(t), 'lorem ipsum') AS has_lorem,
                contains(t, '{') AS has_brace
              FROM b
            )
            SELECT doc_id, n_lines,
                   CAST(len(kept) AS INT) AS n_kept_lines,
                   n_sentences, has_lorem, has_brace,
              (n_sentences >= 3) AS ok_sentences,
              (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
               AND len(kept) >= 1) AS keep_c4,
              COALESCE(array_to_string(kept, chr(10)), '')
                AS clean_text
            FROM m
        """,
        # Unigram entropy: ln floored once per distinct (doc, token)
        # count row (the lm_perplexity determinism discipline), so
        # both engines sum identical integers.
        "t_entropy": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+'))
                       AS w
              FROM documents
            ), counts AS (
              SELECT doc_id, w, COUNT(*) AS c
              FROM toks GROUP BY 1, 2
            ), wn AS (
              SELECT doc_id, c,
                     SUM(c) OVER (PARTITION BY doc_id) AS n
              FROM counts
            )
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(SUM(c * CAST(floor(1000000.0 *
                     ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)))
                     AS BIGINT)) AS BIGINT) AS entropy_scaled
            FROM wn GROUP BY doc_id
        """,
        # CCNet split: model trained ONLY on the doc_id % 5 = 0 slice,
        # scored over every document; OOV trigrams cost the explicit
        # default_nll = 20,000,000 each. Same once-per-distinct-
        # trigram floored ln as t_perplexity, so sums stay exact.
        "t_perplexity_ext": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), tri AS (
              SELECT doc_id,
                unnest([{'w1': t[i], 'w2': t[i+1], 'w3': t[i+2]}
                        for i in range(1, len(t) - 1)],
                       recursive := true)
              FROM toks WHERE len(t) >= 3
            ), rtri AS (
              SELECT * FROM tri WHERE doc_id % 5 = 0
            ), c3 AS (
              SELECT w1, w2, w3, COUNT(*) AS c3
              FROM rtri GROUP BY 1, 2, 3
            ), c2 AS (
              SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2
              FROM c3 GROUP BY 1, 2
            ), v AS (
              SELECT COUNT(DISTINCT tok) AS V
              FROM (SELECT unnest(t) AS tok FROM toks
                    WHERE doc_id % 5 = 0)
            ), model AS (
              SELECT c3.w1, c3.w2, c3.w3,
                CAST(floor(-1000000.0 * ln(
                  CAST(c3.c3 + 1 AS DOUBLE)
                  / CAST(c2.c2 + v.V AS DOUBLE))) AS BIGINT) AS nll
              FROM c3 JOIN c2 USING (w1, w2), v
            )
            SELECT tri.doc_id,
                   COUNT(*) AS n_trigrams,
                   CAST(SUM(COALESCE(m.nll, 20000000)) AS BIGINT)
                     AS nll_scaled
            FROM tri LEFT JOIN model m USING (w1, w2, w3)
            GROUP BY tri.doc_id
        """,
        # Integer batch perceptron, 2 epochs unrolled analytically
        # (the g_ppr unroll discipline): epoch 1 starts from zero
        # weights, so label*score = 0 <= 0 misclassifies EVERY doc
        # and w1 = sum(label*cnt) per bucket; epoch 2 rescores under
        # w1 and only then gates the gradient on misclassification.
        "t_qtrain": r"""
            WITH toks AS (
              SELECT doc_id,
                     CAST((doc_id % 2) * 2 - 1 AS BIGINT) AS label,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id, label, unnest(t) AS g FROM toks
              UNION ALL
              SELECT doc_id, label,
                     unnest([t[i] || ' ' || t[i+1]
                             for i in range(1, len(t))]) AS g
              FROM toks
            ), feats AS (
              SELECT doc_id, label,
                CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 8192
                     AS BIGINT) AS bucket,
                COUNT(*) AS cnt
              FROM grams GROUP BY 1, 2, 3
            ), w1 AS (
              SELECT bucket, CAST(SUM(label * cnt) AS BIGINT) AS w
              FROM feats GROUP BY bucket
            ), s2 AS (
              SELECT f.doc_id, f.label,
                CAST(SUM(f.cnt * COALESCE(w1.w, 0)) AS BIGINT) AS score
              FROM feats f LEFT JOIN w1 USING (bucket)
              GROUP BY 1, 2
            ), mis2 AS (
              SELECT doc_id FROM s2 WHERE label * score <= 0
            ), g2 AS (
              SELECT f.bucket,
                CAST(SUM(f.label * f.cnt) AS BIGINT) AS g
              FROM feats f JOIN mis2 USING (doc_id)
              GROUP BY f.bucket
            )
            SELECT w1.bucket,
                   CAST(w1.w + COALESCE(g2.g, 0) AS BIGINT) AS weight
            FROM w1 LEFT JOIN g2 USING (bucket)
            WHERE w1.w + COALESCE(g2.g, 0) != 0
        """,
        # Trigram-LM NLL: the float ln is evaluated once per DISTINCT
        # model trigram and floored to an integer (LM_LOGPROB_SCALE),
        # so the per-doc sums below are exact integer arithmetic.
        "t_perplexity": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), tri AS (
              SELECT doc_id,
                unnest([{'w1': t[i], 'w2': t[i+1], 'w3': t[i+2]}
                        for i in range(1, len(t) - 1)],
                       recursive := true)
              FROM toks WHERE len(t) >= 3
            ), c3 AS (
              SELECT w1, w2, w3, COUNT(*) AS c3
              FROM tri GROUP BY 1, 2, 3
            ), c2 AS (
              SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2
              FROM c3 GROUP BY 1, 2
            ), v AS (
              SELECT COUNT(DISTINCT tok) AS V
              FROM (SELECT unnest(t) AS tok FROM toks)
            ), model AS (
              SELECT c3.w1, c3.w2, c3.w3,
                CAST(floor(-1000000.0 * ln(
                  CAST(c3.c3 + 1 AS DOUBLE)
                  / CAST(c2.c2 + v.V AS DOUBLE))) AS BIGINT) AS nll
              FROM c3 JOIN c2 USING (w1, w2), v
            )
            SELECT tri.doc_id,
                   COUNT(*) AS n_trigrams,
                   CAST(SUM(m.nll) AS BIGINT) AS nll_scaled
            FROM tri JOIN model m USING (w1, w2, w3)
            GROUP BY tri.doc_id
        """,
        # Hashed linear scorer: the registry's synthetic model is
        # weight = bucket % 97 - 48, derived analytically per bucket
        # (same grams + md5-bucket map as t_dsir, 8192 buckets).
        "t_qscore": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id, unnest(t) AS g FROM toks
              UNION ALL
              SELECT doc_id,
                     unnest([t[i] || ' ' || t[i+1]
                             for i in range(1, len(t))]) AS g
              FROM toks
            ), b AS (
              SELECT doc_id,
                CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 8192
                     AS BIGINT) AS bucket
              FROM grams
            )
            SELECT doc_id, COUNT(*) AS n_feats,
                   CAST(SUM((bucket % 97) - 48) AS BIGINT) AS score
            FROM b GROUP BY doc_id
        """,
        # 2 unrolled personalized-pagerank rounds: teleport mass only
        # on the two smallest order nodes (derived in-query, same set
        # the Spark side collects); integer truncating division both
        # engines (// on non-negative operands == Spark's div).
        "g_ppr": r"""
            WITH e AS (
              SELECT DISTINCT l_orderkey * 2 AS src,
                              l_partkey * 2 + 1 AS dst
              FROM lineitem
            ), nodes AS (
              SELECT src AS id FROM e UNION SELECT dst FROM e
            ), seeds AS (
              SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT 2
            ), deg AS (
              SELECT src, COUNT(*) AS deg FROM e GROUP BY src
            ), r0 AS (
              SELECT n.id,
                CASE WHEN s.id IS NOT NULL
                     THEN CAST(1000000000 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS r
              FROM nodes n LEFT JOIN seeds s ON n.id = s.id
            ), i1 AS (
              SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS BIGINT) AS inc
              FROM e JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src
              GROUP BY e.dst
            ), r1 AS (
              SELECT n.id,
                CAST(CASE WHEN s.id IS NOT NULL THEN 150000000 ELSE 0 END
                     + (85 * COALESCE(i.inc, 0)) // 100 AS BIGINT) AS r
              FROM nodes n LEFT JOIN seeds s ON n.id = s.id
                           LEFT JOIN i1 i ON n.id = i.id
            ), i2 AS (
              SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS BIGINT) AS inc
              FROM e JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src
              GROUP BY e.dst
            ), r2 AS (
              SELECT n.id,
                CAST(CASE WHEN s.id IS NOT NULL THEN 150000000 ELSE 0 END
                     + (85 * COALESCE(i.inc, 0)) // 100 AS BIGINT) AS r
              FROM nodes n LEFT JOIN seeds s ON n.id = s.id
                           LEFT JOIN i2 i ON n.id = i.id
            )
            SELECT
              CASE WHEN id % 2 = 0 THEN 'o:' || (id // 2)
                   ELSE 'p:' || ((id - 1) // 2) END AS id,
              r AS rank
            FROM r2
        """,
        # 6 unrolled BPE training rounds (see _bpe_train_oracle): the
        # replace() merge-application semantics are identical in both
        # engines, so the whole merge SEQUENCE is hash-gated.
        "t_bpe_train": _bpe_train_oracle(6),
        # Integer-exact DSIR core: hashed unigram+bigram buckets, per-doc
        # count sums against the target (lang='en') and raw (all docs)
        # models. The float log-weight is NOT oracled (accumulation
        # order) — see t_dsir docstring.
        "t_dsir": r"""
            WITH toks AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id, lang, unnest(t) AS g FROM toks
              UNION ALL
              SELECT doc_id, lang,
                     unnest([t[i] || ' ' || t[i+1]
                             for i in range(1, len(t))]) AS g
              FROM toks
            ), b AS (
              SELECT doc_id, lang,
                CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 4096
                     AS BIGINT) AS bucket
              FROM grams
            ), tgt AS (
              SELECT bucket, COUNT(*) AS tc FROM b
              WHERE lang = 'en' GROUP BY 1
            ), rawm AS (
              SELECT bucket, COUNT(*) AS rc FROM b GROUP BY 1
            )
            SELECT b.doc_id, COUNT(*) AS n_grams,
                   CAST(SUM(COALESCE(t.tc, 0)) AS BIGINT)
                     AS target_freq_sum,
                   CAST(SUM(r.rc) AS BIGINT) AS raw_freq_sum
            FROM b LEFT JOIN tgt t USING (bucket)
                   JOIN rawm r USING (bucket)
            GROUP BY b.doc_id
        """,
        # Exact replay of the seeded-md5 Gumbel top-k draw (see
        # functions/sampling.weighted_sample): u = (h+1)/2^60 clamped
        # below 1.0, key = ln(w) - ln(-ln(u)); output pins the
        # selected id set + the 60-bit integer hash core.
        "t_wsample": """
            WITH k AS (
              SELECT doc_id,
                     ('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
                                     1, 15))::BIGINT AS h,
                     CAST(n_chars + 1 AS DOUBLE) AS w
              FROM documents
              WHERE n_chars + 1 > 0
            ), g AS (
              SELECT doc_id, h,
                     ln(w) - ln(-ln(least(
                         (CAST(h AS DOUBLE) + 1.0) / 1152921504606846976.0,
                         1.0 - power(2.0, -53)))) AS skey
              FROM k
            ), top AS (
              SELECT doc_id, h FROM g
              ORDER BY skey DESC, doc_id LIMIT 100
            )
            SELECT doc_id, CAST(h AS BIGINT) AS h FROM top
            ORDER BY doc_id
        """,
        # Position-set equivalence of the packed-bit-array probe (see
        # functions/bloom.py): a key is maybe-member iff ALL 5 of its
        # seeded-md5 positions were set by the build side.
        "d_bloom": """
            WITH keys AS (
              SELECT doc_id, lang, md5(COALESCE(text, '')) AS kk
              FROM documents
            ), j AS (SELECT unnest([0, 1, 2, 3, 4]) AS j),
            built AS (
              SELECT DISTINCT
                CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || kk),
                      1, 15))::BIGINT % 131072 AS BIGINT) AS pos
              FROM keys, j WHERE lang = 'en'
            ), probe AS (
              SELECT doc_id,
                CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || kk),
                      1, 15))::BIGINT % 131072 AS BIGINT) AS pos
              FROM keys, j
            )
            SELECT p.doc_id, (COUNT(b.pos) = 5) AS maybe_member
            FROM probe p LEFT JOIN built b USING (pos)
            GROUP BY p.doc_id
        """,
        "d_exact": """
            WITH g AS (
              SELECT md5(text) AS digest, COUNT(*) AS n_docs
              FROM documents GROUP BY 1 HAVING COUNT(*) > 1
            )
            SELECT g.digest, g.n_docs, d.doc_id
            FROM g JOIN (SELECT doc_id, md5(text) AS digest FROM documents) d
              ON d.digest = g.digest
        """,
        "d_lsh": rf"""
            WITH sh AS (
              SELECT doc_id AS id, {_SHINGLE3} AS sh
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, sh, {_MINHASH} AS sig FROM sh
            ), banded AS (
              SELECT id, sh, unnest({_BANDS}, recursive := true)
              FROM sig
            ), {_BOK}, pairs AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM bok a JOIN banded b
                ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
            )
            SELECT p.id_a, p.id_b,
              CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
            FROM pairs p
            JOIN sh x ON x.id = p.id_a
            JOIN sh y ON y.id = p.id_b
            WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.2
        """,
        "d_cluster": rf"""
            WITH RECURSIVE sh AS (
              SELECT doc_id AS id, {_SHINGLE3} AS sh
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, sh, {_MINHASH} AS sig FROM sh
            ), banded AS (
              SELECT id, sh, unnest({_BANDS}, recursive := true)
              FROM sig
            ), {_BOK}, cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM bok a JOIN banded b
                ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
            ), pairs AS (
              SELECT p.id_a, p.id_b
              FROM cand p
              JOIN sh x ON x.id = p.id_a
              JOIN sh y ON y.id = p.id_b
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.2
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b AS a, id_a AS b FROM pairs
            ), reach AS (
              -- min-label reachability: every doc starts labeled with
              -- itself; labels flow along duplicate edges
              SELECT doc_id AS id, doc_id AS lab FROM documents
              UNION
              SELECT e.b AS id, r.lab
              FROM reach r JOIN edges e ON e.a = r.id
            )
            SELECT id AS doc_id, MIN(lab) AS cluster_id
            FROM reach GROUP BY id
        """,
        "d_dedup_corpus": rf"""
            WITH RECURSIVE sh AS (
              SELECT doc_id AS id, {_SHINGLE3} AS sh
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, sh, {_MINHASH} AS sig FROM sh
            ), banded AS (
              SELECT id, sh, unnest({_BANDS}, recursive := true)
              FROM sig
            ), {_BOK}, cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM bok a JOIN banded b
                ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
            ), pairs AS (
              SELECT p.id_a, p.id_b
              FROM cand p
              JOIN sh x ON x.id = p.id_a
              JOIN sh y ON y.id = p.id_b
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) >= 0.2
            ), edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL
              SELECT id_b AS a, id_a AS b FROM pairs
            ), reach AS (
              SELECT doc_id AS id, doc_id AS lab FROM documents
              UNION
              SELECT e.b AS id, r.lab
              FROM reach r JOIN edges e ON e.a = r.id
            ), clusters AS (
              SELECT id AS doc_id, MIN(lab) AS cluster_id
              FROM reach GROUP BY id
            )
            SELECT doc_id FROM clusters WHERE cluster_id = doc_id
        """,
        # d_index runs the same admission semantics as d_against with
        # the existing side round-tripped through the saved index —
        # the oracle is therefore identical by construction.
        "d_index": rf"""
            WITH olds(s) AS (VALUES ('src0'),('src1'),('src2'),('src3'),
              ('src4'),('src5'),('src6'),('src7'),('src8'),('src9')
            ), sh AS (
              SELECT doc_id AS id, source, {_SHINGLE3} AS sh
              FROM (SELECT doc_id, source,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, source, {_MINHASH} AS sig
              FROM (SELECT id, source, sh FROM sh)
            ), banded AS (
              SELECT id, source, unnest({_BANDS}, recursive := true)
              FROM sig
            ), {_BOK}, cand AS (
              SELECT DISTINCT n.id AS id_n, e.id AS id_e
              FROM bok n JOIN banded e
                ON n.band = e.band AND n.bh = e.bh
              WHERE n.source NOT IN (SELECT s FROM olds)
                AND e.source IN (SELECT s FROM olds)
            ), dup AS (
              SELECT DISTINCT c.id_n FROM cand c
              JOIN sh x ON x.id = c.id_n
              JOIN sh y ON y.id = c.id_e
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
                >= 0.5
            ), exact AS (
              SELECT DISTINCT n.doc_id AS id_n
              FROM documents n JOIN documents e
                ON md5(n.text) = md5(e.text)
              WHERE n.source NOT IN (SELECT s FROM olds)
                AND e.source IN (SELECT s FROM olds)
            )
            SELECT d.doc_id, d.source FROM documents d
            WHERE d.source NOT IN (SELECT s FROM olds)
              AND d.doc_id NOT IN (SELECT id_n FROM dup)
              AND d.doc_id NOT IN (SELECT id_n FROM exact)
        """,
        "d_against": rf"""
            WITH olds(s) AS (VALUES ('src0'),('src1'),('src2'),('src3'),
              ('src4'),('src5'),('src6'),('src7'),('src8'),('src9')
            ), sh AS (
              SELECT doc_id AS id, source, {_SHINGLE3} AS sh
              FROM (SELECT doc_id, source,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, source, {_MINHASH} AS sig
              FROM (SELECT id, source, sh FROM sh)
            ), banded AS (
              SELECT id, source, unnest({_BANDS}, recursive := true)
              FROM sig
            ), {_BOK}, cand AS (
              SELECT DISTINCT n.id AS id_n, e.id AS id_e
              FROM bok n JOIN banded e
                ON n.band = e.band AND n.bh = e.bh
              WHERE n.source NOT IN (SELECT s FROM olds)
                AND e.source IN (SELECT s FROM olds)
            ), dup AS (
              SELECT DISTINCT c.id_n FROM cand c
              JOIN sh x ON x.id = c.id_n
              JOIN sh y ON y.id = c.id_e
              WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
                >= 0.5
            ), exact AS (
              SELECT DISTINCT n.doc_id AS id_n
              FROM documents n JOIN documents e
                ON md5(n.text) = md5(e.text)
              WHERE n.source NOT IN (SELECT s FROM olds)
                AND e.source IN (SELECT s FROM olds)
            )
            SELECT d.doc_id, d.source FROM documents d
            WHERE d.source NOT IN (SELECT s FROM olds)
              AND d.doc_id NOT IN (SELECT id_n FROM dup)
              AND d.doc_id NOT IN (SELECT id_n FROM exact)
        """,
        "d_neardup": rf"""
            WITH sh AS (
              SELECT doc_id AS id, {_SHINGLE3} AS sh
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, {_MINHASH} AS sig FROM (SELECT id, sh FROM sh)
            ), banded AS (
              SELECT id, sig, unnest({_BANDS}, recursive := true)
              FROM sig
            ), {_BOK}, cand AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.band,
                CAST(list_sum([CASE WHEN a.sig[i] = b.sig[i]
                               THEN 1 ELSE 0 END
                               for i in range(1, 17)]) AS DOUBLE) / 16
                  AS est_jaccard
              FROM bok a JOIN banded b
                ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
            )
            SELECT id_a, id_b, est_jaccard, band
            FROM cand WHERE est_jaccard >= 0.5
        """,
        "d_editdist": rf"""
            WITH sh AS (
              SELECT doc_id AS id, {_SHINGLE3} AS sh
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 3
            ), sig AS (
              SELECT id, {_MINHASH} AS sig FROM (SELECT id, sh FROM sh)
            ), banded AS (
              SELECT id, unnest({_BANDS}, recursive := true)
              FROM sig
            ), {_BOK}, pairs AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM bok a JOIN banded b
                ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
            )
            SELECT p.id_a, p.id_b,
              CAST(levenshtein(x.text, y.text) AS INT) AS dist
            FROM pairs p
            JOIN documents x ON x.doc_id = p.id_a
            JOIN documents y ON y.doc_id = p.id_b
            WHERE levenshtein(x.text, y.text) <= 50
        """,
        "d_jaccard": r"""
            WITH sh AS (
              SELECT lang AS blk, doc_id AS id,
                list_distinct([array_to_string(toks[i:i+1], ' ')
                               for i in range(1, len(toks))]) AS sh
              FROM (SELECT lang, doc_id,
                           regexp_extract_all(lower(text), '\w+') AS toks
                    FROM documents)
              WHERE len(toks) >= 2
            )
            SELECT a.id AS id_a, b.id AS id_b,
              CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
            FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
            WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.35
        """,
        "d_simhash": r"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
              FROM documents
            ), sh AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 2 THEN
                  list_distinct([array_to_string(toks[i:i+1], ' ')
                                 for i in range(1, len(toks))])
                ELSE [] END AS sh
              FROM t
            ), hs AS (
              SELECT doc_id,
                [md5('0:' || s) || md5('1:' || s) for s in sh] AS hs
              FROM sh
            ), cnt AS (
              SELECT doc_id,
                [list_sum([CASE WHEN substr(h, b+1, 1) >= '8'
                           THEN 1 ELSE -1 END for h in hs])
                 for b in range(0, 64)] AS cnt
              FROM hs
            )
            SELECT doc_id, CAST(
              coalesce(list_sum([CASE WHEN cnt[b+1] > 0
                        THEN CAST(1 AS BIGINT) << b
                        ELSE 0 END for b in range(0, 63)]), 0)
              + CASE WHEN cnt[64] > 0
                     THEN CAST(-9223372036854775808 AS HUGEINT) ELSE 0 END
              AS BIGINT) AS simhash
            FROM cnt
        """,
        "s_knn": """
            WITH s AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                       CAST(c.embedding AS DOUBLE[])) AS score
              FROM embeddings q, embeddings c
              WHERE q.vec_id IN (0, 1, 2) AND c.vec_id <> q.vec_id
            )
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id) AS rn
              FROM s
            ) WHERE rn <= 5
        """,
        "d_embed": _embed_dup_oracle(),
        "s_knn_lsh": _lsh_oracle(),
        "s_knn_ivf": _ivf_oracle(),
        "s_knn_quant": """
            WITH base AS (
              SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), sc AS (
              SELECT id, v,
                CASE WHEN list_max([abs(x) for x in v]) > 0
                     THEN list_max([abs(x) for x in v]) / 127.0
                     ELSE 1.0 END AS scale
              FROM base
            ), q8 AS (
              SELECT id,
                [CAST(floor(x / scale + 0.5) AS DOUBLE) for x in v] AS qv
              FROM sc
            ), s AS (
              SELECT q.id AS query_id, c.id AS neighbor_id,
                list_inner_product(q.qv, c.qv)
                  / (sqrt(list_inner_product(q.qv, q.qv))
                     * sqrt(list_inner_product(c.qv, c.qv))) AS qscore
              FROM q8 q, q8 c
              WHERE q.id IN (0, 1, 2) AND c.id <> q.id
                AND list_inner_product(q.qv, q.qv) > 0
                AND list_inner_product(c.qv, c.qv) > 0
            )
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY qscore DESC, neighbor_id) AS rn
              FROM s
            ) WHERE rn <= 5
        """,
    }
