"""Classic multi-join OLAP suite over the TPC-H-shaped testdata.

The reference engine's analytic surface is single-table GROUP BYs plus
two-table joins (SURVEY.md §2.4-2.5); a user replacing it with this repo
also gets the canonical decision-support shapes — multi-way join chains,
semi-join existence checks, conditional-share aggregates, and global
top-k — expressed so Catalyst picks the right physical strategy:

- Tiny dims (region, nation) are broadcast explicitly: replicated hash
  joins, zero shuffle of the fact side for those hops.
- Fact-fact hops (orders ⋈ lineitem, lineitem ⋈ part) stay as shuffle
  hash/sort-merge joins on the key — the only strategy that scales to
  100 TB — with AQE free to re-plan skew at runtime.
- Global top-k is ORDER BY + LIMIT, which Spark executes as
  TakeOrderedAndProject (per-partition heap + driver merge of k rows),
  never a full sort shuffle.
- Determinism (SURVEY.md §4): double sums rounded, counts cast to
  BIGINT on the DuckDB side, timestamps emitted as formatted strings,
  every LIMIT ranked with an explicit unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, table


# ---------------------------------------------------------------------------
# Q1 shape — pricing summary report: single-pass hash aggregate
# ---------------------------------------------------------------------------


@register(
    "pricing_summary_report",
    """
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("X-olap-q1",),
)
def pricing_summary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan-filter-aggregate. The shipdate
    predicate reaches the parquet scan (PushedFilters) and the 6-entry
    group-by is a pure map-side-combine hash aggregate — at 100 TB this
    is one scan, one 6-row shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# Q3 shape — shipping priority: 3-way join chain + global top-k
# ---------------------------------------------------------------------------


@register(
    "shipping_priority_topk",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("X-olap-q3",),
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with per-table
    pushed filters, then global top-10 by revenue. Both joins are
    key-shuffle joins (customer and orders are fact-sized at 100 TB, so
    no broadcast); AQE coalesces the post-filter sides. The final
    ORDER BY+LIMIT compiles to TakeOrderedAndProject — k rows to the
    driver, no global sort. Revenue is rounded before ranking and
    l_orderkey breaks ties so the top-10 set is engine-stable."""
    cutoff = F.lit("1998-07-01 00:00:00").cast("timestamp")
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey).join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return (
        joined.groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 shape — order priority checking: EXISTS with a non-equi correlate
# ---------------------------------------------------------------------------


@register(
    "order_priority_semi",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("X-olap-q4", "J7"),
)
def order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated *non-equi* predicate
    (l_shipdate > o_orderdate) on top of the key equality. Spark plans
    this as a LEFT SEMI shuffle join on l_orderkey with the inequality
    as a join residual — dedup-free existence semantics at any scale."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    probed = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return probed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q5 shape — local supplier volume: 6-way join with broadcast dims
# ---------------------------------------------------------------------------


@register(
    "local_supplier_volume",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    tags=("X-olap-q5",),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the full 6-way chain. region and nation are
    O(10²)-row dims at ANY scale factor — broadcast explicitly, so the
    region filter prunes suppliers without shuffling them. The three
    fact hops (customer⋈orders, ⋈lineitem, ⋈supplier) shuffle on their
    keys; the c_nationkey = s_nationkey residual rides the supplier
    join. One aggregation, ≤25 output rows."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    # Dim pre-join is driver-cheap: nation ⋈ region is 25 × 5 rows.
    local_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    supplier = table(spark, sf_dir, "supplier").join(
        local_nations, F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q10 shape — returned items: 4-way join + per-customer top-k
# ---------------------------------------------------------------------------


@register(
    "returned_items_topk",
    """
    SELECT c_custkey,
           c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS acctbal,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY c_custkey, c_name, acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("X-olap-q10",),
)
def returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last half-year.
    nation broadcasts (25 rows); customer⋈orders⋈lineitem shuffle on
    keys with the returnflag + orderdate filters pushed to the scans.
    Top-20 via TakeOrderedAndProject on rounded revenue with c_custkey
    tiebreak."""
    nation = F.broadcast(
        table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp"))
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 shape — promo revenue share: join + conditional-share scalar
# ---------------------------------------------------------------------------


@register(
    "promo_revenue_share",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00'
    GROUP BY ALL
    """,
    tags=("X-olap-q14",),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: what fraction of this month's revenue came from
    promo parts. lineitem ⋈ part shuffles on partkey (part is
    fact-sized at 100 TB — no broadcast); the month filter prunes the
    lineitem scan first. The conditional numerator and denominator
    compute in ONE aggregation pass — no second scan, no self-join."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-02-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0))
            / F.sum(disc_price),
            4,
        ).alias("promo_share_pct")
    )


# ---------------------------------------------------------------------------
# Q7 shape — nation-pair trade volume: 6-way join, two broadcast dim hops
# ---------------------------------------------------------------------------


@register(
    "nation_pair_trade_volume",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               strftime(l.l_shipdate, '%Y') AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("X-olap-q7",),
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional trade volume between a nation pair by
    ship year. supplier/customer/nation are broadcast (the nation filter
    shrinks them before the join); the only shuffle hop is the
    lineitem ⋈ orders fact-fact join on orderkey. The pair predicate is
    applied on the joined nation names — Catalyst pushes each half down
    its own dim branch."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.date_format("l_shipdate", "yyyy").alias("l_year"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q18 shape — large-volume customers: HAVING semi-filter + top-k
# ---------------------------------------------------------------------------


@register(
    "large_volume_customers",
    """
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(t.total_qty, 2) AS total_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("X-olap-q18",),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: GROUP BY + HAVING builds the qualifying-order set
    (map-side-combined sum per orderkey), which then drives a join back to
    orders + broadcast customer, finished by a global top-20 that Spark
    executes as TakeOrderedAndProject (k-row heaps, no full sort).
    Deterministic via the orderkey tiebreak."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    joined = t.join(o, t.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return (
        joined.select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Frame-function window surface: first/last/nth with explicit frames
# ---------------------------------------------------------------------------


@register(
    "frame_value_functions",
    """
    SELECT event_id, user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_type,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("X-frame-functions",),
)
def frame_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with EXPLICIT frames — the
    default frame (unbounded-preceding..current-row) makes last_value a
    footgun both engines share, so the full-frame variant is spelled out.
    Keyed windows (user_id) with total-order tiebreaks."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grow = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(grow).alias("first_type"),
        F.last("event_type").over(full).alias("last_type"),
        F.nth_value("event_type", 2).over(grow).alias("second_type"),
    )


# ---------------------------------------------------------------------------
# Round-4 decision-support shapes: TPC-H Q12 / Q19 / Q22 analogs
# ---------------------------------------------------------------------------


@register(
    "late_shipment_priority_counts",
    """
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("X-olap-q12", "J5", "A1"),
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted to the synthetic schema, which carries
    no shipmode/commitdate): late-shipment audit — lines shipped more
    than 60 days after their order date, with conditional priority
    counts per return flag. The lateness predicate spans both join
    sides, so it evaluates post-join; the conditional sums are one
    map-side combinable aggregation on the joined stream."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "discounted_brand_revenue",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("X-olap-q19", "J5", "F4"),
)
def discounted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate spanning
    BOTH join sides. The single-side conjuncts Catalyst can extract
    (brand/size on part, quantity ranges on lineitem) are pushed to the
    scans as derived OR-filters; the residual cross-side disjunction
    evaluates post-join. part is broadcast — the fact side never
    shuffles."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#24")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "global_sales_opportunity",
    """
    WITH eligible AS (
        SELECT c_nationkey, c_custkey, c_acctbal
        FROM customer
        WHERE c_nationkey IN (3, 7, 11, 13, 17, 19, 23)
    ),
    threshold AS (
        SELECT avg(c_acctbal) AS avg_bal FROM eligible WHERE c_acctbal > 0.00
    )
    SELECT CAST(e.c_nationkey AS INT) AS c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(e.c_acctbal), 2) AS totacctbal
    FROM eligible e, threshold t
    WHERE e.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("X-olap-q22", "J2", "J6"),
)
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nation cohort standing in for the phone country
    code the synthetic schema lacks): customers above the cohort's
    average positive balance with no URGENT order on file (every
    synthetic customer has SOME order, so the classic never-ordered
    probe would be vacuous). Three distributed patterns compose: a
    broadcast scalar (the AVG subquery — one row, joined with no
    shuffle), a left-anti join against the filtered fact table, and a
    small keyed aggregation. The priority filter pushes to the orders
    scan, so the anti join — the only fact-side shuffle — moves ~20% of
    the fact rows."""
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    ).filter(F.col("c_nationkey").isin(3, 7, 11, 13, 17, 19, 23))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.00).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Round-5 decision-support shapes: TPC-H Q13 / Q15 / Q17 / Q21 analogs
# (adapted to the synthetic schema: no partsupp table, no
# commit/receipt dates — adaptations documented per query).
# ---------------------------------------------------------------------------


@register(
    "customer_order_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("X-q13",),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, with
    zero-order customers COUNTED (the left outer join is load-bearing:
    count(o_orderkey) over an unmatched row is 0, an inner join would
    drop the bucket). The join carries a filter in the JOIN CONDITION,
    not the WHERE clause — pushing it to WHERE would silently turn the
    outer join inner. Two-level aggregation: per-customer count (the
    only fact-side shuffle), then the metadata-scale histogram of
    counts."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "top_revenue_suppliers",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("X-q15",),
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, then the
    supplier(s) achieving the MAX — the scalar-subquery-over-an-
    aggregate-view pattern. The revenue frame is built once and consumed
    twice (group rows + its own max); the max is a broadcast scalar so
    the second consumption adds no shuffle. Ties all surface, which is
    why the equality-with-max form (not LIMIT 1) is the correct
    semantics."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
          FROM lineitem GROUP BY 1) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_threshold
    """,
    tags=("X-q17",),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    correlated per-part AVG subquery decorrelated into a per-part
    aggregate joined back to the fact table. The threshold frame is
    part-grain (dim-sized) so it broadcasts; the fact table is scanned
    once for the thresholds and once for the probe — at 100 TB the
    threshold pass is the one you persist or push into a materialized
    stat, same as the zone-map pattern."""
    li = table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    probe = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return probe.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


@register(
    "late_shippers_in_shared_orders",
    """
    WITH multi AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY 1
        HAVING count(DISTINCT l_suppkey) >= 2
    ),
    last_ship AS (
        SELECT l_orderkey, max(l_shipdate) AS max_ship
        FROM lineitem GROUP BY 1
    )
    SELECT s.s_name, CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS numwait
    FROM lineitem l
    JOIN multi m ON m.l_orderkey = l.l_orderkey
    JOIN last_ship x ON x.l_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE l.l_shipdate = x.max_ship
      AND NOT EXISTS (
          SELECT 1 FROM lineitem o
          WHERE o.l_orderkey = l.l_orderkey
            AND o.l_suppkey <> l.l_suppkey
            AND o.l_shipdate = x.max_ship
      )
    GROUP BY 1
    """,
    tags=("X-q21",),
)
def late_shippers_in_shared_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted to this schema (no receipt/commit dates):
    suppliers who were the SOLE latest shipper in a multi-supplier order
    — the semi-join (another supplier exists in the order) + anti-join
    (no OTHER supplier shipped on the order's last ship date) chain over
    the same fact table that makes Q21 the classic multi-pass self-join
    stress. All three derived frames are order-grain aggregates of the
    same scan, joined back on l_orderkey — one shuffle key throughout,
    so co-partitioning carries every step; the anti side is expressed
    as a left_anti join on (orderkey, latest-day, other-supplier)
    rather than a per-row subquery."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # ONE order-grain aggregate carries both the multi-supplier gate and
    # the last ship date (the oracle spells them as two CTEs; fusing
    # them removes a scan and a join), then one join back restricted to
    # each order's final-day lines. With the checkpoint below, sf0.1
    # steady-state went 1.9 -> 0.49 s.
    order_stats = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("ns"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .filter(F.col("ns") >= 2)
        .select("l_orderkey", "max_ship")
    )
    # lazily checkpointed: both sides of the sole-shipper anti-join read
    # this frame, and without truncation the scan+agg+join upstream runs
    # TWICE — reuse is the bigger half of the 1.9 -> 0.49 s win.
    from ..functions.lineage import truncate_lineage

    latest_lines = truncate_lineage(
        li.join(order_stats, "l_orderkey")
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey", "max_ship"),
        eager=False,
    )
    others = latest_lines.select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_suppkey").alias("o_suppkey"),
    )
    sole = latest_lines.join(
        others,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_suppkey") != F.col("o_suppkey")),
        "left_anti",
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


@register(
    "pareto_frontier_by_brand",
    """
    SELECT p_brand, p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM (
        SELECT p_brand, p_partkey, p_retailprice, p_size,
               min(p_size) OVER (
                   PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_prior_size
        FROM part
    )
    WHERE best_prior_size IS NULL OR p_size < best_prior_size
    """,
    tags=("X-skyline",),
)
def pareto_frontier_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier (skyline) over (price asc, size asc):
    a part survives iff no cheaper-or-equal part of the same brand is
    also smaller — the multi-objective shortlist query (price/latency,
    quality/cost, recall/QPS trade-off curves). One pass: sort within
    brand by (price, partkey), keep rows that strictly improve the
    running size minimum over all PRIOR rows. Equal-price ties resolve
    by partkey order, exactly as the window frame sees them, so both
    engines keep the identical row set. The window is partitioned by
    brand — bounded partitions, no global sort; at 100 TB the skyline
    of each group streams through one windowed pass instead of the
    O(n^2) dominance join a naive formulation would use."""
    part = table(spark, sf_dir, "part")
    w = (
        Window.partitionBy("p_brand")
        .orderBy("p_retailprice", "p_partkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.min("p_size").over(w).alias("best_prior_size"),
    )
    return flagged.filter(
        F.col("best_prior_size").isNull()
        | (F.col("p_size") < F.col("best_prior_size"))
    ).select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("long").alias("p_size"),
    )


@register(
    "frequent_brand_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    single AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS sup FROM items GROUP BY 1),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items),
    pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(count(*) AS BIGINT) AS support
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT p.brand_a, p.brand_b, p.support,
           CAST(p.support * n.n_orders AS DOUBLE) / (sa.sup * sb.sup) AS lift
    FROM pairs p
    JOIN single sa ON sa.p_brand = p.brand_a
    JOIN single sb ON sb.p_brand = p.brand_b
    CROSS JOIN n
    """,
    tags=("X-itemsets",),
)
def frequent_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining with association-rule lift: per order,
    the distinct brand set; per brand pair, co-occurrence support and
    lift = P(a,b)/(P(a)·P(b)). The a-priori shape at scale: the item
    frame is deduped to (basket, item) FIRST (one shuffle), the
    candidate join is basket-keyed (never all-pairs across baskets), and
    the single-item support table is dimension-sized so both enrichment
    joins broadcast. On a sparse item space you'd prune items below
    min-support before the pair join (classic apriori) — at 25 brands
    every item is frequent, so the prune is a documented no-op here.
    Lift is one integer multiply and one division on both engines — raw
    bit-identical double, no rounding."""
    from ..functions.lineage import truncate_lineage

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # items feeds FOUR consumers (singles, the basket count, both pair
    # aliases) and Catalyst does not dedupe aliased subplans — without
    # the lazy checkpoint each consumer re-runs the fact join + distinct
    # (the training_corpus_prep shared-intermediate pattern; 1.4 ->
    # ~0.8 s at sf0.1)
    items = truncate_lineage(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct(),
        eager=False,
    )
    single = items.groupBy("p_brand").agg(F.count(F.lit(1)).alias("sup"))
    n = items.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    sa = single.select(F.col("p_brand").alias("brand_a"), F.col("sup").alias("sup_a"))
    sb = single.select(F.col("p_brand").alias("brand_b"), F.col("sup").alias("sup_b"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .join(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "support",
            (
                (F.col("support") * F.col("n_orders")).cast("double")
                / (F.col("sup_a") * F.col("sup_b"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part: argmin without a join-back
# ---------------------------------------------------------------------------


@register(
    "min_cost_supplier_per_part",
    """
    WITH quote AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_cost, l_suppkey) AS rn
        FROM quote
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type, b.unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE b.rn = 1 AND r.r_name = 'EUROPE' AND p.p_size >= 30
    ORDER BY s.s_acctbal DESC, p.p_partkey
    LIMIT 100
    """,
    tags=("X-q2",),
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (lineitem unit prices standing in for the partsupp
    table the synthetic schema lacks): per part, the supplier quoting the
    lowest unit cost, then the region/size-filtered top-100 by account
    balance. The reference's correlated-min subquery (Q2's classic form)
    is decorrelated into ``min(struct(cost, suppkey))`` — an argmin
    computed INSIDE the per-part hash aggregate, so the "which supplier"
    question costs zero extra shuffles (vs the window-rank or join-back
    forms, which re-shuffle the quote frame). The unit cost stays the
    RAW IEEE division (identical bits on both engines) — min is
    order-independent, and rounding here would re-introduce the
    half-way-boundary divergence between the engines' round()
    implementations. Dims (part/supplier/nation/region) broadcast; the only
    big shuffles are the two keyed aggregates over lineitem; the final
    top-100 is TakeOrderedAndProject with a unique p_partkey tiebreak.

    The part predicate is pushed BELOW the aggregations as a broadcast
    semi-join on the fact scan (p_size >= 30 keeps ~42% of parts, so both
    keyed shuffles shrink by ~2.4×) — safe because the per-part argmin is
    independent of which parts survive, and a rewrite Catalyst will not
    derive on its own (it cannot push a join through an aggregate). The
    supplier-side region filter must NOT be pushed the same way: the
    argmin ranges over ALL suppliers, and EUROPE filters the winner."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    li = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    quote = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = (
        quote.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_cost", "l_suppkey")).alias("b"))
        .select(
            "l_partkey",
            F.col("b.unit_cost").alias("unit_cost"),
            F.col("b.l_suppkey").alias("l_suppkey"),
        )
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q8 shape — national market share within a region, by order year
# ---------------------------------------------------------------------------


@register(
    "nation_market_share",
    """
    WITH base AS (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS vol,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = cn.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
    ),
    yearly AS (
        SELECT o_year,
               CAST(round(sum(CASE WHEN supp_nation = 'NATION_5'
                                   THEN CAST(vol AS DECIMAL(30, 8))
                                   ELSE CAST(0 AS DECIMAL(30, 8)) END), 2)
                    AS DOUBLE) AS nation_vol,
               CAST(round(sum(CAST(vol AS DECIMAL(30, 8))), 2)
                    AS DOUBLE) AS total_vol
        FROM base GROUP BY o_year
    )
    SELECT o_year, nation_vol, total_vol,
           round(nation_vol / total_vol, 6) AS mkt_share
    FROM yearly
    """,
    tags=("X-q8",),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's purchase volume
    per order year. Two independent dimension chains hang off the same
    fact row — customer→nation→region gates the rows, supplier→nation
    labels them — and both collapse to broadcast hash joins, so the only
    shuffles are the orders⋈lineitem key exchange and the final
    years-sized aggregate. The share is a conditional-sum-over-sum inside
    ONE aggregate (no second pass, no self-join); dividing the two
    already-rounded sums keeps the ratio bit-identical across engines.
    Both sums aggregate in DECIMAL(30,8) before rounding (the
    important_part_value_share pattern): double addition is
    partition-order-dependent, so a sum landing within float noise of a
    half-cent boundary could round differently across engines/runs."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = c.join(
        F.broadcast(n.select("n_nationkey", "n_regionkey")),
        c.c_nationkey == F.col("n_nationkey"),
    ).join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey).select("c_custkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                             F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_nation), o.o_custkey == cust_nation.c_custkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    dec = "decimal(30,8)"
    yearly = base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5",
                         F.col("vol").cast(dec))
                  .otherwise(F.lit(0).cast(dec))), 2
        ).cast("double").alias("nation_vol"),
        F.round(F.sum(F.col("vol").cast(dec)), 2).cast("double").alias("total_vol"),
    )
    return yearly.select(
        "o_year", "nation_vol", "total_vol",
        F.round(F.col("nation_vol") / F.col("total_vol"), 6).alias("mkt_share"),
    )


# ---------------------------------------------------------------------------
# Q9 shape — product-type profit by supplier nation and year
# ---------------------------------------------------------------------------


@register(
    "product_type_profit",
    """
    SELECT n.n_name AS nation, year(l.l_shipdate) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - 0.1 * p.p_retailprice * l.l_quantity
                               AS DECIMAL(30, 8))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("X-q9",),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (a 10%-of-retail cost proxy standing in for
    ps_supplycost): profit on one product family by supplier nation and
    ship year. The LIKE '%widget%' predicate prunes part to ~13% BEFORE
    the broadcast, so the fact⋈part hash join probes a smaller table and
    non-matching lineitem rows die at the join instead of the aggregate.
    All three dims broadcast: the fact side never shuffles until the
    final (nation, year)-grain aggregate — which map-side combines to
    ~25×7 rows. One scan, zero fact shuffles before the tiny agg. The
    profit sum aggregates in DECIMAL(30,8) before rounding so the 2dp
    output is partition-order-independent across engines/runs."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit.cast("decimal(30,8)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


# ---------------------------------------------------------------------------
# Q11 shape — important part values vs a global-total threshold
# ---------------------------------------------------------------------------


@register(
    "important_part_value_share",
    """
    WITH val AS (
        SELECT l.l_partkey,
               sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                        AS DECIMAL(30, 8))) AS v
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
    FROM val, (SELECT sum(v) AS total FROM val) t
    WHERE v > CAST(0.0006 AS DECIMAL(10, 8)) * t.total
    """,
    tags=("X-q11",),
)
def important_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value (through a nation
    cohort's suppliers) exceeds a fraction of the cohort's TOTAL value.
    The HAVING-against-a-global-scalar is the interesting bit: the total
    is a one-row re-aggregate of the already-reduced part-grain frame —
    metadata-scale — broadcast back as a literal-like join, so the
    global threshold costs no second fact scan and no shuffle. The
    part-grain frame is built once and consumed twice (Spark reuses the
    exchange; at 100 TB you'd persist it). The per-part values aggregate
    in DECIMAL: double sums are summation-order-dependent across engines
    and 2/669 rows here landed within float noise of a half-cent
    boundary — exact decimal addition makes both the rounded output and
    the threshold comparison order-independent."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,8)"
                )
            ).alias("v")
        )
    )
    total = val.agg(F.sum("v").alias("total"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v") > F.lit("0.0006").cast("decimal(10,8)") * F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("v", 2).cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier diversity per part attribute, with a NOT-IN scrub
# ---------------------------------------------------------------------------


@register(
    "supplier_count_by_part_attrs",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    tags=("X-q16",),
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, type, size) bucket, excluding a supplier denylist (negative
    balance standing in for Q16's complaints LIKE). The NOT IN becomes a
    broadcast left-anti join — null-safe by construction since
    s_suppkey is never null, and never a shuffle because the denylist is
    dimension-sized. Brand/size predicates prune part before ITS
    broadcast. count(DISTINCT) over the surviving pairs is the only fact
    shuffle, keyed by the 3-attr group — Spark expands to a two-level
    aggregate (distinct-pair partial agg, then count), both map-side
    combining."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    deny = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(deny), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Revenue concentration — the whale curve at decile grain
# ---------------------------------------------------------------------------


@register(
    "revenue_decile_concentration",
    """
    WITH cust AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(30, 8))) AS rev
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT rev, ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
        FROM cust
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(rev), 2) AS DOUBLE) AS decile_revenue,
           round(CAST(sum(rev) AS DOUBLE)
                 / (SELECT CAST(sum(rev) AS DOUBLE) FROM cust), 6)
               AS revenue_share
    FROM ranked GROUP BY 1
    """,
    tags=("X-whale-curve",),
)
def revenue_decile_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whale curve: customers ranked by lifetime revenue into
    deciles, each decile's share of total — the concentration readout
    behind every 'top 10% of customers drive X%' claim. Orders reduce
    to customer grain first (one keyed DECIMAL aggregate —
    order-independent sums), the decile rank is an ntile over the
    CUSTOMER frame (1000× smaller than orders; a unique-key tiebreak
    makes the split deterministic), and the total is a broadcast
    scalar. At 100 TB the window frame is customer-count sized; if even
    that overflows one partition, swap ntile for the bucket-offset
    dense-id pattern (global_dense_ids) — same output."""
    o = table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias("rev")
    )
    ranked = cust.select(
        "rev",
        F.ntile(10).over(Window.orderBy(F.desc("rev"), "o_custkey")).alias("decile"),
    )
    total = cust.agg(F.sum("rev").cast("double").alias("total"))
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("rev"), 2).cast("double").alias("decile_revenue"),
            F.sum("rev").cast("double").alias("_raw"),
        )
        .join(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            "decile_revenue",
            F.round(F.col("_raw") / F.col("total"), 6).alias("revenue_share"),
        )
    )


# ---------------------------------------------------------------------------
# Repeat-order cadence — inter-order interval distribution
# ---------------------------------------------------------------------------


@register(
    "repeat_order_intervals",
    """
    WITH seq AS (
        SELECT o_custkey, o_orderdate,
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                   AS prev_date
        FROM orders
    )
    SELECT CAST(datediff('day', prev_date, o_orderdate) // 30 AS BIGINT)
               AS interval_months,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM seq
    WHERE prev_date IS NOT NULL
    GROUP BY 1
    """,
    tags=("X-repeat-cadence",),
)
def repeat_order_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the distribution of gaps between a
    customer's consecutive orders, bucketed by 30-day months — the
    metric behind replenishment-cycle and win-back timing decisions.
    One customer-partitioned lag window (orders per customer are
    bounded; the partition key is the natural shuffle key), integer
    date arithmetic, then a months-sized aggregate. Deterministic via
    the (date, orderkey) tiebreak in the window order."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
    ).filter(F.col("prev_date").isNotNull())
    months = (F.datediff("o_orderdate", "prev_date") / 30).cast("long")
    return seq.groupBy(months.alias("interval_months")).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.count_distinct("o_custkey").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit — data-forensics distribution check
# ---------------------------------------------------------------------------


@register(
    "benford_first_digit_audit",
    """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INTEGER) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT d, n,
           round(CAST(n AS DOUBLE) / t.total, 6) AS observed_share,
           round(log10(1.0 + 1.0 / d), 6) AS benford_share,
           round(CAST(n AS DOUBLE) / t.total - log10(1.0 + 1.0 / d), 6)
               AS deviation
    FROM obs, tot t
    """,
    tags=("X-benford",),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    data-forensics screen for fabricated or truncated monetary columns
    (natural multi-magnitude amounts follow P(d)=log10(1+1/d); uniform
    or spiky deviations flag synthetic or clipped data). The digit
    extraction is integer/string codegen on the scan, counts reduce to
    nine rows, and the expected shares are closed-form literals — both
    engines compute log10 of the same nine rationals, so the audit is
    deterministic end to end. One scan, one 9-row aggregate."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    # floor() explicitly before the integer cast: DuckDB's double->BIGINT
    # cast ROUNDS while Spark's truncates, which flips the first digit of
    # values like 999.6 (1000 vs 999) — caught by preflight on 2/9 rows.
    d = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = o.groupBy(d.alias("d")).agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    share = F.col("n").cast("double") / F.col("total")
    return obs.join(F.broadcast(tot)).select(
        "d",
        "n",
        F.round(share, 6).alias("observed_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(share - benford, 6).alias("deviation"),
    )


# ---------------------------------------------------------------------------
# Open-order backlog — sweep-line interval counting over the day grid
# ---------------------------------------------------------------------------


@register(
    "open_order_backlog_sweepline",
    """
    WITH span AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS start_day,
               CAST(max(l.l_shipdate) AS DATE) AS end_day
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    deltas AS (
        SELECT start_day AS day, 1 AS delta FROM span
        UNION ALL
        SELECT end_day AS day, -1 AS delta FROM span
    ),
    daily AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS net_change
        FROM deltas GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day_str, net_change,
           CAST(sum(net_change) OVER (ORDER BY day) AS BIGINT) AS open_orders
    FROM daily
    """,
    tags=("X-sweepline",),
)
def open_order_backlog_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in flight per day (placed but not fully shipped) via the
    sweep line: each order contributes +1 at placement and −1 at its
    last shipment, the deltas collapse to the DAY GRID, and the backlog
    is a running sum over that grid — interval counting with NO range
    join and no per-day × per-order blowup (the naive form joins every
    day against every overlapping order: O(days × open)). The only
    window is over the day grid — calendar-bounded, thousands of rows
    at any corpus size — and every value is an exact integer. The same
    sweep shape prices concurrent-session peaks, warehouse occupancy,
    and GPU-reservation overlap at 100 TB."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # Aggregate lineitem to order grain BEFORE meeting orders: the join
    # then carries 150k rows per side instead of streaming 600k lineitem
    # rows through it, and the order-grain groupBy disappears.
    last = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.to_date(F.max("l_shipdate")).alias("end_day")
    )
    span = last.join(
        o.select("o_orderkey", F.to_date("o_orderdate").alias("start_day")),
        "o_orderkey",
    )
    # Both sweep deltas come out of ONE pass over span via explode — the
    # two-branch union re-evaluated the span subplan per branch (aliased
    # subplans don't dedupe).
    deltas = span.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_day").alias("day"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.col("end_day").alias("day"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("e")
    ).select("e.day", "e.delta")
    daily = deltas.groupBy("day").agg(F.sum("delta").cast("long").alias("net_change"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day_str"),
        "net_change",
        F.sum("net_change").over(w).cast("long").alias("open_orders"),
    )
