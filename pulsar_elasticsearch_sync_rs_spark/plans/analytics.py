"""Relational/analytic query pack over the TPC-H-ish fixtures
(SURVEY.md §2.9 extended surface): aggregation, joins (broadcast +
shuffle), windows, rollup, set ops, top-k, sessionization.

Determinism conventions (FIXTURES.md):
- sums of double columns go through DECIMAL(18,4) so the aggregation is
  exact and engine/order independent, then cast back to double;
- top-k always carries a unique tiebreaker;
- dates render as strings.

Scale notes per query are in the docstrings — each plan was
``.explain``-checked: small dims broadcast, filters push to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_elasticsearch_sync_rs_spark.sources.batch import read_table


def _dec2(col):
    """Fixture money/rate doubles are exact 2-dp values; casting the
    *inputs* to decimal (not the products) makes all downstream
    arithmetic exact and engine-order-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def _dsum(col, scale: int = 4):
    """Exact, order-independent sum of a double column: decimal-cast
    per row, decimal sum, double render."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def _dsum_expr(expr):
    """Exact sum of an already-decimal expression, rendered as double."""
    return F.sum(expr).cast("double")


def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Single scan + single shuffle on
    (returnflag, linestatus); partial aggregation map-side. Filter and
    the 7-column projection push down to parquet."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum_expr(_dec2("l_extendedprice") * (1 - _dec2("l_discount"))).alias(
                "sum_disc_price"
            ),
            _dsum_expr(
                _dec2("l_extendedprice") * (1 - _dec2("l_discount")) * (1 + _dec2("l_tax"))
            ).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_TPCH_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: 3-way join + top-10 by
    revenue. customer (tiny) broadcasts into orders, the orders side
    broadcasts into lineitem at this SF; at 100 TB Catalyst/AQE picks
    SMJ on l_orderkey with the same declarative plan. Revenue is an
    exact decimal sum, so the top-k cut is engine-independent."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum_expr(_dec2("l_extendedprice") * (1 - _dec2("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


ORACLE_TPCH_JOIN_TOPK = """
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_orderpriority,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_tpch_custrev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item customer revenue: 4-way join
    (nation broadcast into customer, customer broadcast into orders ⋈
    lineitem), filter returned lines, top-20 customers by exact decimal
    revenue. At 100 TB the only data-sized shuffle is lineitem⋈orders
    on the order key; everything else rides broadcasts."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum_expr(_dec2("l_extendedprice") * (1 - _dec2("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_TPCH_CUSTREV = """
SELECT c_custkey, c_name, n_name,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavor: revenue per region via a 5-way star join.
    region/nation/supplier/customer all broadcast (bounded dims);
    lineitem⋈orders is the only shuffle join at scale. One aggregate."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    supplier = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(_dsum_expr(_dec2("l_extendedprice") * (1 - _dec2("l_discount"))).alias("revenue"))
    )


ORACLE_REGION_REVENUE = """
SELECT r_name,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) over customer account balances (exact
    decimal sums). Spark evaluates rollup as a single Expand+aggregate —
    one shuffle."""
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(_dsum("c_acctbal").alias("sum_acctbal"), F.count("*").alias("n_customers"))
    )


ORACLE_ROLLUP_ACCTBAL = """
SELECT r_name, n_name,
  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_acctbal,
  count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers that placed an URGENT-priority order
    but never a LOW-priority one (INTERSECT/EXCEPT composition ≡
    semi/anti joins physically)."""
    orders = read_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both = urgent.intersect(low).select(F.lit("both").alias("tag"), F.col("o_custkey"))
    urgent_only = urgent.distinct().exceptAll(low.distinct()).select(
        F.lit("urgent_only").alias("tag"), F.col("o_custkey")
    )
    return both.union(urgent_only).select(
        "tag", F.col("o_custkey").alias("custkey")
    )


ORACLE_SETOPS = """
SELECT tag, o_custkey AS custkey FROM (
  SELECT 'both' AS tag, o_custkey FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
  )
  UNION ALL
  SELECT 'urgent_only' AS tag, o_custkey FROM (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
  )
)
ORDER BY tag, custkey
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total + order sequence number.
    Single shuffle on o_custkey; running decimal sum is exact."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("order_seq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
    )


ORACLE_WINDOW_RUNNING = """
SELECT o_orderkey, o_custkey,
  CAST(row_number() OVER w AS INTEGER) AS order_seq,
  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sliding window: per-user event count and value sum
    over the trailing 1 hour of EVENT TIME (rangeBetween on epoch
    seconds — a value frame, not a row frame; peers at equal
    timestamps all see the same frame, so the result is deterministic
    without a unique tiebreak). Single shuffle on user_id."""
    ev = read_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_last_hour"),
    )


ORACLE_WINDOW_RANGE = """
SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS VARCHAR) AS DOUBLE) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def q_argmin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style correlated-min pattern: for each part, the
    lineitem row(s) achieving the minimum extended price — expressed as
    aggregate + join back on (key, min) instead of a correlated
    subquery per row. Both sides shuffle once on l_partkey; at scale
    AQE picks SMJ and the min side is a fraction of the fact table."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice"
    )
    mins = (
        li.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .withColumnRenamed("l_partkey", "m_partkey")
    )
    return (
        li.join(
            mins,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select(
            F.col("l_partkey").alias("p_key"),
            "l_suppkey",
            "l_orderkey",
            F.col("l_extendedprice").alias("min_price"),
        )
    )


ORACLE_ARGMIN_JOIN = """
SELECT l.l_partkey AS p_key, l.l_suppkey, l.l_orderkey,
  l.l_extendedprice AS min_price
FROM lineitem l
JOIN (
  SELECT l_partkey, min(l_extendedprice) AS m
  FROM lineitem GROUP BY l_partkey
) mm ON l.l_partkey = mm.l_partkey AND l.l_extendedprice = mm.m
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per customer (classic windowed
    top-k; raw double comparison — no arithmetic, so bit-identical
    across engines; o_orderkey tiebreak)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk", "o_totalprice")
    )


ORACLE_TOPK_PER_GROUP = """
SELECT o_custkey, o_orderkey, CAST(rnk AS INTEGER) AS rnk, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join coverage: per-segment counts of customers with
    and without orders (left_semi / left_anti — no row multiplication,
    orders side reduced to keys before the join)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        with_orders.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
        .join(
            without.groupBy("c_mktsegment").agg(F.count("*").alias("n_without_orders")),
            "c_mktsegment",
            "full_outer",
        )
        .select(
            "c_mktsegment",
            F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
            F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
        )
    )


ORACLE_SEMI_ANTI = """
SELECT c_mktsegment,
  CAST(coalesce(sum(CASE WHEN has_o THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_with_orders,
  CAST(coalesce(sum(CASE WHEN has_o THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_without_orders
FROM (
  SELECT c_mktsegment, EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
  FROM customer
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_tpch_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check, widened to cover BOTH
    correlated-quantifier shapes: per priority, the count of orders with
    at least one returned lineitem (EXISTS → ``left_semi``) and with
    none (NOT EXISTS → ``left_anti``). (The fixture's slimmed lineitem
    has no commit/receipt dates; ``l_returnflag = 'R'`` plays Q4's
    late-line predicate — the plan shape is identical.)

    Scale: the lineitem side is reduced to DISTINCT l_orderkey AFTER the
    returned-line filter (both push to the parquet scan), so the
    semi/anti joins shuffle keys only — no row multiplication, no
    payload movement. At 100 TB AQE picks SMJ on the order key; the
    aggregate after is a 5-row reduction. Subsumes the former
    q_semi_anti declared slot."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    returned = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    )
    with_r = orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
    without_r = orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_anti")
    return (
        with_r.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_with_returned"))
        .join(
            without_r.groupBy("o_orderpriority").agg(
                F.count("*").alias("n_without_returned")
            ),
            "o_orderpriority",
            "full_outer",
        )
        .select(
            "o_orderpriority",
            F.coalesce("n_with_returned", F.lit(0)).alias("n_with_returned"),
            F.coalesce("n_without_returned", F.lit(0)).alias("n_without_returned"),
        )
    )


ORACLE_TPCH_EXISTS = """
SELECT o_orderpriority,
  CAST(coalesce(sum(CASE WHEN has_r THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_with_returned,
  CAST(coalesce(sum(CASE WHEN has_r THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_without_returned
FROM (
  SELECT o_orderpriority,
    EXISTS (SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') AS has_r
  FROM orders
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style conditional aggregation: per line status, how
    many 1997+-shipped lines belong to high- vs low-priority orders
    (CASE inside SUM — one pass, no per-branch scans; the fixture's
    slimmed lineitem has no l_shipmode, so l_linestatus plays the
    grouping dimension — identical plan shape).

    Scale: the ship-date filter pushes to the lineitem scan; the only
    data-sized shuffle is lineitem⋈orders on the order key, then a
    tiny (|statuses|-row) aggregate."""
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = read_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1997-01-01"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_TPCH_SHIPMODE = """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-distinct lane (the scale path promised by the
    q_distinct_users docstring): HyperLogLog++ user cardinality per
    event type next to the exact count, with the relative error
    rendered so the bound is visible in the result itself.

    Rows-only by nature: HLL sketches are engine-specific, so no DuckDB
    hash-match is possible — the |approx-exact|/exact <= 5% contract is
    pinned by pytest instead (tests/test_extra_oracles.py).

    Scale: approx_count_distinct is a fixed-size sketch per group —
    map-side partials merge without holding the distinct set, so at
    100 TB this replaces the exact countDistinct's full key shuffle."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "approx_users",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users")
            ).alias("rel_err"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events stream (30-minute
    inactivity gap) — the classic lag/cumulative-sum formulation. One
    shuffle on user_id; at scale this is the batch shape of
    session_window streaming aggregation."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_ms = 30 * 60 * 1000
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull() | ((F.unix_millis(F.col("ts")) - F.unix_millis(prev_ts)) > gap_ms),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
        )
    )


ORACLE_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT user_id, event_id,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  count(*) AS n_events,
  min(event_id) AS first_event_id,
  max(event_id) AS last_event_id
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation shape: exact user cardinality + event count
    per event type. (The approximate twin — HLL approx_count_distinct —
    is the scale path but sketches differ across engines, so the exact
    form is the oracle-checked one.)"""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


ORACLE_DISTINCT_USERS = """
SELECT event_type,
  count(DISTINCT user_id) AS n_users,
  count(*) AS n_events
FROM events
GROUP BY event_type ORDER BY event_type
"""


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread across event-type columns
    (fixed pivot values -> single Expand+aggregate, one shuffle)."""
    ev = read_table(spark, sf_dir, "events")
    types = ["click", "purchase", "error", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


ORACLE_PIVOT_EVENTS = """
SELECT user_id,
  CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click,
  CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase,
  CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS error,
  CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS signup,
  CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view
FROM events
GROUP BY user_id ORDER BY user_id
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the user's most recent order at or
    before the event time (latest o_orderkey wins ties). Implemented as
    the single-shuffle log-merge composition (operators/asof.py), NOT
    the row-multiplying inequality join the oracle uses."""
    from pulsar_elasticsearch_sync_rs_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    out = asof_join(
        ev,
        orders.withColumnRenamed("o_custkey", "user_id"),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        right_tiebreaker="o_orderkey",
    )
    return out.select("event_id", "asof_o_orderkey", "asof_o_totalprice")


ORACLE_ASOF_JOIN = """
WITH ranked AS (
  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
    row_number() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.event_id, r.o_orderkey AS asof_o_orderkey, r.o_totalprice AS asof_o_totalprice
FROM events e LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r USING (event_id)
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase (salted) aggregation; result must equal the
    direct groupBy (which the oracle computes)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import salted_count

    ev = read_table(spark, sf_dir, "events")
    return salted_count(ev, key="event_type", salt_from="event_id", n_salts=16)


ORACLE_SALTED_AGG = """
SELECT event_type, count(*) AS n_records
FROM events GROUP BY event_type
"""


def q_cube_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations
    in one Expand+aggregate pass (single shuffle)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(_dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows"))
    )


ORACLE_CUBE_VOLUME = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  count(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous-interpolation quantiles of event value per
    event type (p50/p90/p99) — the percentile aggregation surface.
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    same definition (sort + linear interpolation), so exact values
    hash-match after rounding. One shuffle on event_type.

    Scale note: exact percentile buffers the group's values — the
    oracle-grade lane. The sketch path at 100 TB is
    ``approx_percentile`` (same shape as q_approx_distinct's HLL
    twin): fixed-size t-digest-style state, map-side mergeable."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


ORACLE_QUANTILES = """
SELECT event_type,
  round(quantile_cont(value, 0.5), 6) AS p50,
  round(quantile_cont(value, 0.9), 6) AS p90,
  round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type ORDER BY event_type
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per event type: integer
    bin index = floor(value / 10) (engine-portable — no width_bucket
    dependency), count per (type, bin). Single shuffle; bins are
    bounded by the value range, so the aggregate is tiny."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.floor(F.col("value") / 10).cast("long").alias("bin")
        )
        .agg(F.count("*").alias("n"))
    )


ORACLE_HISTOGRAM = """
SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS bin, count(*) AS n
FROM events
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch twin q_quantiles' docstring promises: per event type,
    ``approx_percentile`` (fixed-size mergeable state — map-side
    partials combine without buffering the group's values, which the
    exact lane must do) beside the exact percentile, with the absolute
    error rendered so the bound is visible in the result.

    Rows-only by nature (sketch internals are engine-specific); pytest
    pins |approx − exact| ≤ the accuracy parameter's guarantee on both
    p50 and p99 (tests/test_extra_oracles.py)."""
    ev = read_table(spark, sf_dir, "events")
    acc = 10000  # 1/acc relative-rank error guarantee
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr(f"approx_percentile(value, 0.5, {acc})").alias("approx_p50"),
            F.expr("percentile(value, 0.5)").alias("exact_p50"),
            F.expr(f"approx_percentile(value, 0.99, {acc})").alias("approx_p99"),
            F.expr("percentile(value, 0.99)").alias("exact_p99"),
        )
        .select(
            "event_type",
            F.round("approx_p50", 6).alias("approx_p50"),
            F.round("exact_p50", 6).alias("exact_p50"),
            F.round(F.abs(F.col("approx_p50") - F.col("exact_p50")), 6).alias("abs_err_p50"),
            F.round("approx_p99", 6).alias("approx_p99"),
            F.round("exact_p99", 6).alias("exact_p99"),
            F.round(F.abs(F.col("approx_p99") - F.col("exact_p99")), 6).alias("abs_err_p99"),
        )
    )


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill — the metrics-pipeline staple:
    per user, DAILY buckets of mean event value over the user's own
    active span, with days that saw no events FORWARD-FILLED from the
    last observed day (n_events marks fills as 0). Dense, regular
    per-entity series are what downstream forecasting/joining expects.

    Scale shape: one (user, day) partial-agg; the per-user day spine is
    an exploded ``sequence`` off the (tiny) per-user min/max span — no
    calendar table, no cross join; the fill is one ``last(ignorenulls)``
    window per user. Shuffle keys are (user, day) and user."""
    ev = read_table(spark, sf_dir, "events")
    # mean as exact-decimal sum / count(value) (avg's null-skipping
    # divisor; decimal(30,6) holds any |value| < 1e24), NOT
    # avg(double): float
    # summation ORDER differs between Spark's partial aggregation and
    # DuckDB's sequential scan, and a per-day mean landing on a
    # round(.,6) boundary flips the oracle hash (surfaced by the
    # regenerated skew fixture, round 8 — data-dependent, invisible on
    # the driver fixtures). The decimal sum is order-independent and
    # exact on both engines; ONE double division each side then agrees
    # bit-for-bit.
    daily = ev.groupBy(
        "user_id", F.date_trunc("DAY", "ts").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
            / F.count("value"),
            6,
        ).alias("mean_value"),
        F.count("*").alias("n_events"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day")
    return joined.select(
        "user_id",
        # rendered in the UTC session, not returned as TimestampType:
        # PySpark's collect() converts raw timestamps through the HOST
        # OS timezone, so a raw `day` hash-mismatches the oracle's
        # naive timestamp on any non-UTC host (TZ=America/New_York
        # probe, round 9) — the string is host-TZ-proof on both engines
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.last("mean_value", ignorenulls=True).over(w), 6).alias("value_ffill"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


ORACLE_RESAMPLE_FFILL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
    round(CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / count(value), 6) AS mean_value,
    count(*) AS n_events
  FROM events GROUP BY user_id, date_trunc('day', ts)
), span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span
)
SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
  round(last_value(d.mean_value IGNORE NULLS)
    OVER (PARTITION BY s.user_id ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_ffill,
  COALESCE(d.n_events, 0) AS n_events
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
ORDER BY s.user_id, s.day
"""


def q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier detection over the resampled series: flag the days where
    a user's mean event value sits more than 2 sample standard
    deviations from that user's own mean — the ops-dashboard staple on
    top of q_resample_ffill's dense series (computed here on observed
    days only; fills carry no new information). One (user, day)
    partial-agg, one (user) agg joined back broadcast-or-shuffle by
    size; z rounded to 4 dp so the two engines' float summation orders
    cannot flip the hash."""
    ev = read_table(spark, sf_dir, "events")
    # deterministic daily mean (exact decimal sum / count) — same
    # rationale as q_resample_ffill; mu/sigma stay float aggregates,
    # which the 4-dp z rounding absorbs
    daily = ev.groupBy(
        "user_id", F.date_trunc("DAY", "ts").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
            / F.count("value")
        ).alias("mean_value")
    )
    stats = daily.groupBy("user_id").agg(
        F.avg("mean_value").alias("mu"),
        F.stddev_samp("mean_value").alias("sigma"),
        F.count("*").alias("n_days"),
    )
    z = (F.col("mean_value") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(stats, "user_id")
        .filter((F.col("n_days") >= 3) & (F.col("sigma") > 0))
        .withColumn("z", F.round(z, 4))
        .filter(F.abs("z") > 2)
        # day rendered as a string: raw TimestampType collects through
        # the HOST OS timezone (round-9 TZ probe; see q_resample_ffill)
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("mean_value", 6).alias("mean_value"),
            "z",
        )
    )


ORACLE_DAILY_ANOMALIES = """
WITH daily AS (
  -- CAST: DuckDB date_trunc('day') yields DATE, Spark yields TIMESTAMP
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) / count(value) AS mean_value
  FROM events GROUP BY user_id, date_trunc('day', ts)
), stats AS (
  SELECT user_id, avg(mean_value) AS mu, stddev_samp(mean_value) AS sigma,
    count(*) AS n_days
  FROM daily GROUP BY user_id
)
SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
  round(d.mean_value, 6) AS mean_value,
  round((d.mean_value - s.mu) / s.sigma, 4) AS z
FROM daily d JOIN stats s USING (user_id)
WHERE s.n_days >= 3 AND s.sigma > 0
  AND abs(round((d.mean_value - s.mu) / s.sigma, 4)) > 2
ORDER BY d.user_id, d.day
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join with NO equality key — "which signups
    landed inside the 30 minutes after each error?" — the
    time-alignment shape (incident windows × events, promo windows ×
    purchases) that naively analyzes to a nested-loop join.

    Implemented with operators/range_join.py's binning rewrite: both
    sides quantize onto 30-minute buckets (each interval explodes onto
    <= 2 of them), the join is a plain equi-join on the bucket id, and
    exact containment is a residual filter — O(|P| + 2|I|) join input
    instead of |P|x|I| comparisons. The oracle computes the same pairs
    via DuckDB's native inequality join (IEJoin)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.range_join import bucketed_range_join

    ev = read_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    pairs = bucketed_range_join(
        points=signups,
        intervals=errors,
        point_ts="s_ts",
        start_ts="w_start",
        end_ts="w_end",
        bucket_width_s=1800,
    )
    return pairs.select(
        "error_id",
        "signup_id",
        (F.unix_micros("s_ts") - F.unix_micros("w_start")).alias("delay_us"),
    )


ORACLE_RANGE_JOIN = """
SELECT e.event_id AS error_id, s.event_id AS signup_id,
  epoch_us(s.ts) - epoch_us(e.ts) AS delay_us
FROM events e JOIN events s
  ON s.ts >= e.ts AND s.ts < e.ts + INTERVAL 30 MINUTE
WHERE e.event_type = 'error' AND s.event_type = 'signup'
ORDER BY error_id, signup_id
"""


def q_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: per event type, event
    count + exact value sum at BOTH day and hour granularities in ONE
    Expand+aggregate pass (GROUPING SETS -> single shuffle), instead of
    two scans. This is the time-series "rollup cascade" shape
    (Timescale continuous aggregates / Druid granularity rollup): the
    coarse grain is always available beside the fine grain, and at
    100 TB the one-pass Expand halves the scan cost of maintaining
    both. ``grouping()`` distinguishes the grains; day/hour render as
    strings per FIXTURES.md determinism conventions."""
    ev = read_table(spark, sf_dir, "events")
    bucketed = ev.select(
        "event_type",
        F.date_trunc("DAY", "ts").alias("day"),
        F.date_trunc("HOUR", "ts").alias("hour"),
        "value",
    )
    return (
        bucketed.groupingSets(
            [["event_type", "day"], ["event_type", "day", "hour"]],
            "event_type",
            "day",
            "hour",
        )
        .agg(
            F.count("*").alias("n_events"),
            _dsum("value").alias("sum_value"),
            F.grouping("hour").alias("__g"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.when(F.col("__g") == 1, F.lit("day")).otherwise(F.lit("hour")).alias("grain"),
            "n_events",
            "sum_value",
        )
    )


ORACLE_TIME_BUCKET_ROLLUP = """
SELECT event_type,
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
  CASE WHEN GROUPING(date_trunc('hour', ts)) = 1 THEN 'day' ELSE 'hour' END AS grain,
  count(*) AS n_events,
  CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type, date_trunc('day', ts)),
                        (event_type, date_trunc('day', ts), date_trunc('hour', ts)))
ORDER BY event_type, day, grain, hour
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe shuffle join (operators/skew.salted_join): events
    joined to customers on a salted (key, salt) pair — each hot user's
    fact rows spread over 16 reducers, the dim side replicated 16× —
    then aggregated per customer. Result must equal the plain join the
    oracle computes; the salting is invisible in the answer, visible
    only in the shuffle layout."""
    from pulsar_elasticsearch_sync_rs_spark.operators.skew import salted_join

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    joined = salted_join(ev, dim, "user_id", salt_from="event_id", n_salts=16)
    return joined.groupBy("user_id", "c_name").agg(F.count("*").alias("n_events"))


ORACLE_SALTED_JOIN = """
SELECT e.user_id, c.c_name, count(*) AS n_events
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY e.user_id, c.c_name
ORDER BY e.user_id
"""


def q_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation — the monitoring staple
    Spark expresses natively with ``window(ts, len, slide)``: per
    event type, count + exact value sum over 1-hour windows sliding
    every 15 minutes. Each event lands in len/slide = 4 windows via
    one Expand (no self-join); the single shuffle is on
    (window, event_type). The oracle reproduces the window set with a
    generate_series explode."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), _dsum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# each event belongs to the 4 hopping windows whose start lies in
# (ts - 1h, ts]; starts are the 15-min grid points. make_timestamp
# (naive, from microseconds) instead of to_timestamp: the latter
# yields TIMESTAMPTZ and strftime would render it in the DuckDB
# session's host timezone, breaking the hash off-UTC.
ORACLE_HOPPING_WINDOW = """
WITH hits AS (
  SELECT e.event_type, CAST(e.value AS DECIMAL(18,4)) AS v,
    make_timestamp(gs.s * 1000000) AS w_start
  FROM events e,
  LATERAL (
    SELECT unnest(generate_series(
      CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900 - 2700,
      CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900,
      900)) AS s
  ) gs
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
  count(*) AS n_events, CAST(CAST(sum(v) AS VARCHAR) AS DOUBLE) AS sum_value
FROM hits
GROUP BY w_start, event_type
ORDER BY w_start, event_type
"""


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned join (operators/bloom.py): events ⋈ orders on
    o_orderkey-as-event bucket — here events join to the SPARSE set of
    orders with totalprice > 190000, the shape where most fact rows
    match nothing and a full fact shuffle is waste. The fact side is
    pre-filtered through a broadcast m-bit membership summary of the
    dim keys before the exact join; no false negatives, join removes
    false positives, so the answer equals the plain join the oracle
    computes."""
    from pulsar_elasticsearch_sync_rs_spark.operators.bloom import bloom_join

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 190000)
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count("*").alias("n_big_orders"))
    )
    joined = bloom_join(ev, dim, "user_id", k=5, m=1 << 16)
    return joined.groupBy("user_id", "n_big_orders").agg(
        F.count("*").alias("n_events")
    )


ORACLE_BLOOM_JOIN = """
WITH dim AS (
  SELECT o_custkey AS user_id, count(*) AS n_big_orders
  FROM orders WHERE o_totalprice > 190000 GROUP BY o_custkey
)
SELECT e.user_id, d.n_big_orders, count(*) AS n_events
FROM events e JOIN dim d USING (user_id)
GROUP BY e.user_id, d.n_big_orders
ORDER BY e.user_id
"""


def equidepth_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Equi-depth (quartile) histogram operator: per ``key_col`` group,
    bin edges at the quartiles of ``value_col``, then one pass counting
    each row into its bin → ``(key, bin, n_events)``.

    The edge pass has two regimes, switched by ``exact``:

    - ``exact=True`` — ``percentile``: exact order statistics, but the
      agg buffer holds EVERY distinct value per group. Right when the
      group count is small (a handful of event types) and per-group
      cardinality fits an executor.
    - ``exact=False`` — ``approx_percentile``: the mergeable KLL-style
      sketch (bounded buffer, ``accuracy`` controls ε≈1/accuracy).
      The 100 TB path when groups are many or heavy: partial sketches
      combine map-side, memory is O(accuracy) per group regardless of
      data volume.

    Both regimes keep the same plan shape: per-key edge agg → join
    back → (key, bin) count. Two tiny shuffles total. The join-back
    hint follows the regime: exact mode is contractually few-groups,
    so the one-row-per-key edge table gets an explicit
    ``F.broadcast``; sketch mode exists precisely because groups may
    be MANY, and force-broadcasting a many-key edge table is the
    driver/executor OOM the regime is meant to avoid — there the hint
    is omitted and Catalyst/AQE picks broadcast vs shuffle from the
    measured edge-table size.
    """
    if exact:
        edges = df.groupBy(key_col).agg(
            F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
            F.expr(f"percentile({value_col}, 0.50)").alias("q2"),
            F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
        )
    else:
        edges = (
            df.groupBy(key_col)
            .agg(
                F.expr(
                    f"approx_percentile({value_col}, array(0.25, 0.5, 0.75), {accuracy})"
                ).alias("qs")
            )
            .select(
                key_col,
                F.col("qs")[0].cast("double").alias("q1"),
                F.col("qs")[1].cast("double").alias("q2"),
                F.col("qs")[2].cast("double").alias("q3"),
            )
        )
    if exact:
        edges = F.broadcast(edges)
    binned = df.join(edges, key_col).withColumn(
        "bin",
        F.when(F.col(value_col) <= F.col("q1"), F.lit(0))
        .when(F.col(value_col) <= F.col("q2"), F.lit(1))
        .when(F.col(value_col) <= F.col("q3"), F.lit(2))
        .otherwise(F.lit(3)),
    )
    return (
        binned.groupBy(key_col, "bin")
        .agg(F.count("*").alias("n_events"))
        .orderBy(key_col, "bin")
    )


def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram — the NDV-aware binning planners and data
    profilers actually want (fixed-width bins starve on skewed data):
    per event type, bin edges at the exact quartiles of value, then
    one pass assigning each event to its quartile bin. Two tiny
    shuffles: the per-type quartile agg (broadcast back) and the
    (type, bin) count. `percentile` ≡ DuckDB `quantile_cont` parity is
    already pinned by q_quantiles. The oracled lane uses the exact
    edge pass (5 event types); ``equidepth_histogram(exact=False)``
    is the mergeable-sketch switch for real key counts."""
    ev = read_table(spark, sf_dir, "events")
    return equidepth_histogram(ev, "event_type", "value", exact=True)


ORACLE_HISTOGRAM_EQUIDEPTH = """
WITH edges AS (
  SELECT event_type,
    quantile_cont(value, 0.25) AS q1,
    quantile_cont(value, 0.50) AS q2,
    quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type,
  CASE WHEN e.value <= d.q1 THEN 0
       WHEN e.value <= d.q2 THEN 1
       WHEN e.value <= d.q3 THEN 2
       ELSE 3 END AS bin,
  count(*) AS n_events
FROM events e JOIN edges d USING (event_type)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_trending_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: the single busiest event type per hopping
    window (1h windows sliding 15min) — the "what's hot right now"
    dashboard query. Composes the hopping Expand with one windowed
    rank; ties break on event_type for determinism."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("w").orderBy(F.col("n_events").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            F.col("event_type").alias("top_type"),
            "n_events",
        )
    )


ORACLE_TRENDING_WINDOWS = """
WITH hits AS (
  SELECT e.event_type, make_timestamp(gs.s * 1000000) AS w_start
  FROM events e,
  LATERAL (
    SELECT unnest(generate_series(
      CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900 - 2700,
      CAST(floor(epoch(e.ts) / 900) AS BIGINT) * 900,
      900)) AS s
  ) gs
), counts AS (
  SELECT w_start, event_type, count(*) AS n_events
  FROM hits GROUP BY w_start, event_type
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY w_start
             ORDER BY n_events DESC, event_type ASC) AS rnk
  FROM counts
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
  event_type AS top_type, n_events
FROM ranked WHERE rnk = 1 ORDER BY w_start
"""


def q_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized conversion funnel — "of the sessions that saw a
    signup, how many purchased AFTER it in the same session?" — the
    product-analytics staple composed from the verified sessionization
    model: lag-gap sessions → per-session first-signup time → ordered
    conversion test → per-user funnel accounting (one row per user, so
    the result is deterministic and hash-comparable). Shuffles only on
    user_id; the funnel test is two conditional aggregates."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_ms = 30 * 60 * 1000
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull() | ((F.unix_millis(F.col("ts")) - F.unix_millis(prev_ts)) > gap_ms),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = sess.groupBy("user_id", "session_seq").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup_ts"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("last_purchase_ts"),
    )
    return (
        per_sess.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.col("first_signup_ts").isNotNull().cast("bigint")).alias(
                "n_signup_sessions"
            ),
            F.sum(
                (
                    F.col("first_signup_ts").isNotNull()
                    & (F.col("last_purchase_ts") >= F.col("first_signup_ts"))
                ).cast("bigint")
            ).alias("n_converted"),
        )
        .orderBy("user_id")
    )


ORACLE_SESSION_FUNNEL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
), per_sess AS (
  SELECT user_id, session_seq,
    min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup_ts,
    max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase_ts
  FROM sess GROUP BY user_id, session_seq
)
SELECT user_id,
  count(*) AS n_sessions,
  CAST(sum(CASE WHEN first_signup_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_sessions,
  CAST(sum(CASE WHEN first_signup_ts IS NOT NULL
        AND last_purchase_ts >= first_signup_ts THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM per_sess
GROUP BY user_id ORDER BY user_id
"""



def _scd2_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared fixture plan for the SCD2 lanes: customers as the
    versioned base snapshot, a deterministic change batch derived from
    orders (one change per (custkey, orderdate); op I/U/D keyed off the
    min orderkey), merged with operators/cdc.scd2_apply."""
    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import scd2_apply

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    base = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_mktsegment").alias("seg"),
        F.lit("1992-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    ch = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(
            F.min("o_totalprice").alias("bal"),
            F.min("o_orderpriority").alias("seg"),
            F.min("o_orderkey").alias("__k"),
        )
        .withColumn(
            "op",
            F.when(F.col("__k") % 10 == 0, F.lit("D"))
            .when(F.col("__k") % 10 < 5, F.lit("U"))
            .otherwise(F.lit("I")),
        )
        .drop("__k")
    )
    return scd2_apply(base, ch, key="custkey", attrs=["bal", "seg"])


def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 CDC merge (operators/cdc.scd2_apply): the merged
    snapshot — history, closed versions, untouched keys, and the
    opened versions with their validity intervals.

    Scale: the base is never shuffled — the change batch is reduced to
    first-change-per-key and BROADCAST against it; the only exchanges
    are over the (small) change side. The reference's ES upsert keeps
    only the newest version (src/es.rs bulk index); this lane is the
    time-travel-capable superset an analytics store wants."""
    out = _scd2_merged(spark, sf_dir)
    # interval bounds rendered in the UTC session: PySpark collect()
    # converts raw TimestampType through the HOST OS timezone, so raw
    # timestamps hash-mismatch the oracle's naive values on non-UTC
    # hosts (TZ=America/New_York probe, round 9); NULL (open version)
    # formats to NULL on both engines
    return out.select(
        "custkey",
        "bal",
        "seg",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


ORACLE_SCD2_APPLY = """
WITH base AS (
  SELECT c_custkey AS custkey, c_acctbal AS bal, c_mktsegment AS seg,
         TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
  FROM customer
), ch0 AS (
  SELECT o_custkey AS custkey, o_orderdate AS ts,
         min(o_totalprice) AS bal, min(o_orderpriority) AS seg,
         min(o_orderkey) AS k
  FROM orders WHERE o_orderkey % 7 = 0
  GROUP BY 1, 2
), ch AS (
  SELECT custkey, ts, bal, seg,
         CASE WHEN k % 10 = 0 THEN 'D' WHEN k % 10 < 5 THEN 'U' ELSE 'I' END AS op,
         lead(ts) OVER (PARTITION BY custkey ORDER BY ts) AS next_ts
  FROM ch0
), first_ts AS (
  SELECT custkey, min(ts) AS fts FROM ch0 GROUP BY 1
)
SELECT custkey, bal, seg,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
       is_current
FROM (
  SELECT b.custkey, b.bal, b.seg, b.valid_from, f.fts AS valid_to,
         FALSE AS is_current
  FROM base b JOIN first_ts f USING (custkey)
  UNION ALL
  SELECT b.custkey, b.bal, b.seg, b.valid_from, b.valid_to, b.is_current
  FROM base b WHERE b.custkey NOT IN (SELECT custkey FROM first_ts)
  UNION ALL
  SELECT custkey, bal, seg, ts AS valid_from, next_ts AS valid_to,
         next_ts IS NULL AS is_current
  FROM ch WHERE op <> 'D'
)
"""


_SCD2_ASOF_POINTS = ("1993-06-01", "1995-06-01", "1997-06-01", "1999-01-01")


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 time travel (operators/cdc.scd2_as_of): the merged snapshot
    queried "as of" four timestamps spanning the change horizon —
    before most changes, two mid-stream points, and after all of them.
    Exactly one version per key alive at each point; deleted keys
    vanish, later-born keys absent. The oracle replays the same merge
    as SQL and filters the validity intervals — the query the
    intervals exist to answer, which the reference's ES upsert
    (src/es.rs keeps only the newest doc) cannot.

    Scale: each as-of read is a pure narrow filter over the snapshot
    (no shuffle, no UDF); the lane unions four of them over ONE merge
    evaluation — the snapshot is lazily localCheckpoint'ed, so all
    four union branches share the materialized RDD instead of
    re-running the merge lineage per branch (round-10 review finding;
    only identical Exchanges get ReuseExchange, the narrow work would
    otherwise run 4×)."""
    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import scd2_as_of

    snap = _scd2_merged(spark, sf_dir).localCheckpoint(eager=False)
    slices = []
    for p in _SCD2_ASOF_POINTS:
        slices.append(
            scd2_as_of(snap, p).select(
                F.lit(p).alias("as_of"),
                "custkey",
                "bal",
                "seg",
                F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
                F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
                "is_current",
            )
        )
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    return out


ORACLE_SCD2_ASOF = """
WITH base AS (
  SELECT c_custkey AS custkey, c_acctbal AS bal, c_mktsegment AS seg,
         TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
  FROM customer
), ch0 AS (
  SELECT o_custkey AS custkey, o_orderdate AS ts,
         min(o_totalprice) AS bal, min(o_orderpriority) AS seg,
         min(o_orderkey) AS k
  FROM orders WHERE o_orderkey % 7 = 0
  GROUP BY 1, 2
), ch AS (
  SELECT custkey, ts, bal, seg,
         CASE WHEN k % 10 = 0 THEN 'D' WHEN k % 10 < 5 THEN 'U' ELSE 'I' END AS op,
         lead(ts) OVER (PARTITION BY custkey ORDER BY ts) AS next_ts
  FROM ch0
), first_ts AS (
  SELECT custkey, min(ts) AS fts FROM ch0 GROUP BY 1
), snap AS (
  SELECT b.custkey, b.bal, b.seg, b.valid_from, f.fts AS valid_to,
         FALSE AS is_current
  FROM base b JOIN first_ts f USING (custkey)
  UNION ALL
  SELECT b.custkey, b.bal, b.seg, b.valid_from, b.valid_to, b.is_current
  FROM base b WHERE b.custkey NOT IN (SELECT custkey FROM first_ts)
  UNION ALL
  SELECT custkey, bal, seg, ts AS valid_from, next_ts AS valid_to,
         next_ts IS NULL AS is_current
  FROM ch WHERE op <> 'D'
), pts AS (
  SELECT * FROM (VALUES ('1993-06-01'), ('1995-06-01'), ('1997-06-01'),
                        ('1999-01-01')) AS t(as_of)
)
SELECT p.as_of, s.custkey, s.bal, s.seg,
       strftime(s.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(s.valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
       s.is_current
FROM snap s, pts p
WHERE s.valid_from <= CAST(p.as_of AS TIMESTAMP)
  AND (s.valid_to IS NULL OR s.valid_to > CAST(p.as_of AS TIMESTAMP))
"""


def q_scd2_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 snapshot CHURN (operators/cdc.scd2_diff): per-key
    added/removed/changed classification between two as-of points of
    the merged snapshot — the audit query a dimension owner runs after
    a backfill ('what did this window do to my table'). Two narrow
    interval filters over ONE merge evaluation + a key full-outer
    join; unchanged keys absent, so the output is the churn, not the
    table."""
    from pulsar_elasticsearch_sync_rs_spark.operators.cdc import scd2_diff

    snap = _scd2_merged(spark, sf_dir).localCheckpoint(eager=False)
    return scd2_diff(
        snap, "1994-06-01", "1997-06-01", key="custkey", attrs=["bal", "seg"]
    )


ORACLE_SCD2_DIFF = """
WITH base AS (
  SELECT c_custkey AS custkey, c_acctbal AS bal, c_mktsegment AS seg,
         TIMESTAMP '1992-01-01 00:00:00' AS valid_from,
         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
  FROM customer
), ch0 AS (
  SELECT o_custkey AS custkey, o_orderdate AS ts,
         min(o_totalprice) AS bal, min(o_orderpriority) AS seg,
         min(o_orderkey) AS k
  FROM orders WHERE o_orderkey % 7 = 0
  GROUP BY 1, 2
), ch AS (
  SELECT custkey, ts, bal, seg,
         CASE WHEN k % 10 = 0 THEN 'D' WHEN k % 10 < 5 THEN 'U' ELSE 'I' END AS op,
         lead(ts) OVER (PARTITION BY custkey ORDER BY ts) AS next_ts
  FROM ch0
), first_ts AS (
  SELECT custkey, min(ts) AS fts FROM ch0 GROUP BY 1
), snap AS (
  SELECT b.custkey, b.bal, b.seg, b.valid_from, f.fts AS valid_to
  FROM base b JOIN first_ts f USING (custkey)
  UNION ALL
  SELECT b.custkey, b.bal, b.seg, b.valid_from, b.valid_to
  FROM base b WHERE b.custkey NOT IN (SELECT custkey FROM first_ts)
  UNION ALL
  SELECT custkey, bal, seg, ts AS valid_from, next_ts AS valid_to
  FROM ch WHERE op <> 'D'
), old AS (
  SELECT custkey, bal AS old_bal, seg AS old_seg FROM snap
  WHERE valid_from <= TIMESTAMP '1994-06-01'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '1994-06-01')
), new AS (
  SELECT custkey, bal AS new_bal, seg AS new_seg FROM snap
  WHERE valid_from <= TIMESTAMP '1997-06-01'
    AND (valid_to IS NULL OR valid_to > TIMESTAMP '1997-06-01')
)
SELECT custkey,
  CASE WHEN o.custkey IS NULL THEN 'added'
       WHEN n.custkey IS NULL THEN 'removed'
       ELSE 'changed' END AS change,
  old_bal, old_seg, new_bal, new_seg
FROM old o FULL OUTER JOIN new n USING (custkey)
WHERE o.custkey IS NULL OR n.custkey IS NULL
   OR (old_bal IS DISTINCT FROM new_bal) OR (old_seg IS DISTINCT FROM new_seg)
"""


# the previous q_zorder_scan scratch dir (at most one), reclaimed on
# the next invocation within the same process
_ZSCAN_LAST: list[str] = []


def q_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout round-trip (operators/layout.persist_zordered):
    rewrite events Z-ordered on (user_id, event_id), read the copy
    back, and aggregate a central ~10%-band predicate on BOTH
    dimensions. The oracle runs the same filter over the original
    table — layout must be semantics-invisible, which is exactly the
    property that makes Z-ordering a free scale lever. The pruning
    MECHANISM (row groups skipped on every cluster dimension, vs 1-D
    clustering's leading column only) is pinned from the parquet
    footers in tests/test_layout.py.

    Scale: one approxQuantile pass + a narrow Arrow UDF over the two
    cluster columns + one range exchange — the standard OPTIMIZE
    ZORDER cost, paid once at write time; every later multi-dimension
    band scan then reads a near-minimal file subset."""
    import atexit
    import shutil
    import tempfile

    from pulsar_elasticsearch_sync_rs_spark.operators.layout import (
        persist_zordered,
    )

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # per-call private dir: a fixed shared path races concurrent runs
    # of the same lane (overwrite deletes files another process's scan
    # is planning). The PREVIOUS call's copy is reclaimed on the next
    # invocation — so a long-lived driver holds at most one stale copy,
    # not one per call — and the final copy at interpreter exit.
    prev = _ZSCAN_LAST.pop(0) if _ZSCAN_LAST else None
    if prev:
        shutil.rmtree(prev, ignore_errors=True)
    path = tempfile.mkdtemp(prefix="spark_graft_zscan_")
    _ZSCAN_LAST.append(path)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    persist_zordered(ev, path, ["user_id", "event_id"], bits=8, n_files=16)
    b = ev.agg(
        F.min("user_id").cast("double"),
        F.max("user_id").cast("double"),
        F.min("event_id").cast("double"),
        F.max("event_id").cast("double"),
    ).collect()[0]
    import math

    mnu, mxu, mne, mxe = b
    if mnu is None:
        # empty corpus: min/max are NULL and the band is vacuous — any
        # constant bounds select nothing (totality: 0 rows in → 0 out)
        mnu = mxu = mne = mxe = 0.0
    # INTEGER band bounds (ceil/floor of the double arithmetic, same
    # ops in the oracle): a double literal against the bigint columns
    # plans as an unpushable cast comparison — only IsNotNull would
    # reach the parquet scan, silently defeating the row-group pruning
    # the layout exists for (pinned in tests/test_layout.py)
    lo_u = int(math.ceil(mnu + 0.45 * (mxu - mnu)))
    hi_u = int(math.floor(mnu + 0.55 * (mxu - mnu)))
    lo_e = int(math.ceil(mne + 0.45 * (mxe - mne)))
    hi_e = int(math.floor(mne + 0.55 * (mxe - mne)))
    z = spark.read.parquet(path)
    # constant group key instead of a global agg: a global aggregate
    # fabricates one (0, NULL…) row from an EMPTY corpus, violating the
    # empty-input totality contract (0 rows in → 0 rows out); grouping
    # returns no groups on no input and one row otherwise
    return (
        z.filter(
            (F.col("user_id") >= lo_u)
            & (F.col("user_id") <= hi_u)
            & (F.col("event_id") >= lo_e)
            & (F.col("event_id") <= hi_e)
        )
        .groupBy(F.lit("all").alias("grp"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("event_id").alias("sum_event"),
            F.sum("user_id").alias("sum_user"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


ORACLE_ZORDER_SCAN = """
WITH b AS (
  SELECT CAST(min(user_id) AS DOUBLE) AS mnu, CAST(max(user_id) AS DOUBLE) AS mxu,
         CAST(min(event_id) AS DOUBLE) AS mne, CAST(max(event_id) AS DOUBLE) AS mxe
  FROM events
)
SELECT 'all' AS grp, count(*) AS n_rows,
  CAST(sum(event_id) AS BIGINT) AS sum_event,
  CAST(sum(user_id) AS BIGINT) AS sum_user,
  CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events, b
WHERE user_id >= CAST(ceil(b.mnu + 0.45 * (b.mxu - b.mnu)) AS BIGINT)
  AND user_id <= CAST(floor(b.mnu + 0.55 * (b.mxu - b.mnu)) AS BIGINT)
  AND event_id >= CAST(ceil(b.mne + 0.45 * (b.mxe - b.mne)) AS BIGINT)
  AND event_id <= CAST(floor(b.mne + 0.55 * (b.mxe - b.mne)) AS BIGINT)
GROUP BY grp
"""
