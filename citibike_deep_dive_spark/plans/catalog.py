"""Operator catalog: SURVEY.md §2 inventory + training-data extensions.

Every entry is a QuerySpec(name, build, oracle, tags):
- ``build(spark, sf_dir) -> DataFrame`` — the idiomatic-Spark plan,
- ``oracle`` — equivalent ANSI SQL the DuckDB oracle runs on the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings),
- ``tags`` — SURVEY.md §2 operator ids this query demonstrates.

Determinism rules (SURVEY.md §4): every aggregate/computed column is
aliased identically on both sides; doubles are rounded; counts are cast
to BIGINT on the DuckDB side (its SUM(int) yields HUGEINT); ANY_VALUE
becomes max(); rankings always carry explicit tiebreaks; timestamps are
emitted as formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import ntz_from_nanos
from ..normalize import month_abbrev


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table; normalizes events.ts (parquet
    TIMESTAMP_NANOS) to a naive wall-clock timestamp matching DuckDB's
    reading. Spark 4.1+ reads the column natively as TIMESTAMP_NTZ —
    already the right semantics, pass through. Older runtimes surface it
    as ``bigint`` ns-since-epoch (under the legacy ``nanosAsLong`` conf);
    convert that to NTZ so plans see one type everywhere. No session conf
    is touched here — plan builders must not mutate the caller's session."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", ntz_from_nanos("ts"))
    return df


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.4 A1 — GROUP BY + conditional counts (LineGraphTable shape)
# reference: citibike_data_process/table_updating/update_linegraph.py:33-43
# ---------------------------------------------------------------------------


@register(
    "linegraph_conditional_counts",
    """
    SELECT strftime(ts, '%Y') AS year,
           strftime(ts, '%b') AS month,
           CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click_count,
           CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view_count
    FROM events
    GROUP BY 1, 2
    """,
    tags=("A1", "F1", "P5"),
)
def linegraph_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy").alias("year"),
        month_abbrev(F.col("ts")).alias("month"),
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click_count"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("view_count"),
    )


# ---------------------------------------------------------------------------
# §2.4 A2 — GROUP BY 3 keys + COUNT(*) with hour extraction (HeatMapTable)
# reference: citibike_data_process/table_updating/update_heatmap.py:48-64
# ---------------------------------------------------------------------------


@register(
    "heatmap_hourly_counts",
    """
    SELECT strftime(ts, '%Y') AS year,
           strftime(ts, '%b') AS month,
           CAST(hour(ts) AS INT) AS hour,
           CAST(count(*) AS BIGINT) AS total_count
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("A2", "F1"),
)
def heatmap_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy").alias("year"),
        month_abbrev(F.col("ts")).alias("month"),
        F.hour("ts").alias("hour"),
    ).agg(F.count("*").alias("total_count"))


# ---------------------------------------------------------------------------
# §2.4 A3 — GROUP BY + ANY_VALUE, made deterministic (max)
# reference: citibike_data_process/table_updating/update_dockmap.py:57-59
# ---------------------------------------------------------------------------


@register(
    "anyvalue_deterministic",
    """
    SELECT n.n_name AS nation,
           max(c.c_name) AS sample_customer,
           CAST(count(*) AS BIGINT) AS customer_count
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("A3",),
)
def anyvalue_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("c_name").alias("sample_customer"),
            F.count("*").alias("customer_count"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 J1 + §2.4 A4 — dual-branch counts ⟗ FULL OUTER USING + COALESCE
# (DockTable monthly shape: starts/ends per station)
# reference: citibike_data_process/table_updating/update_dockmap.py:54-96
# ---------------------------------------------------------------------------

_DOCK_FLOW_ORACLE = """
    WITH starts AS (
        SELECT user_id, strftime(ts, '%b') AS month,
               CAST(count(*) AS BIGINT) AS month_starts
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ), ends AS (
        SELECT user_id, strftime(ts, '%b') AS month,
               CAST(count(*) AS BIGINT) AS month_ends
        FROM events WHERE event_type = 'view' GROUP BY 1, 2
    )
    SELECT user_id, month,
           COALESCE(month_starts, 0) AS month_starts,
           COALESCE(month_ends, 0) AS month_ends,
           COALESCE(month_starts, 0) + COALESCE(month_ends, 0) AS month_total
    FROM starts FULL OUTER JOIN ends USING (user_id, month)
"""


@register("dock_flow_full_outer", _DOCK_FLOW_ORACLE, tags=("J1", "A4", "F5", "U2"))
def dock_flow_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").withColumn("month", month_abbrev(F.col("ts")))
    starts = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "month")
        .agg(F.count("*").alias("month_starts"))
    )
    ends = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "month")
        .agg(F.count("*").alias("month_ends"))
    )
    joined = starts.join(ends, ["user_id", "month"], "full_outer")
    return joined.select(
        "user_id",
        "month",
        F.coalesce("month_starts", F.lit(0)).alias("month_starts"),
        F.coalesce("month_ends", F.lit(0)).alias("month_ends"),
        (F.coalesce("month_starts", F.lit(0)) + F.coalesce("month_ends", F.lit(0))).alias(
            "month_total"
        ),
    )


# ---------------------------------------------------------------------------
# §2.4 A5 — two-level rollup (month → year re-aggregation)
# reference: citibike_data_process/table_updating/update_dockmap.py:110-129
# ---------------------------------------------------------------------------


@register(
    "monthly_to_yearly_rollup",
    f"""
    WITH monthly AS ({_DOCK_FLOW_ORACLE})
    SELECT user_id,
           CAST(sum(month_starts) AS BIGINT) AS year_starts,
           CAST(sum(month_ends) AS BIGINT) AS year_ends,
           CAST(sum(month_total) AS BIGINT) AS year_total
    FROM monthly GROUP BY user_id
    """,
    tags=("A5",),
)
def monthly_to_yearly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = dock_flow_full_outer(spark, sf_dir)
    return monthly.groupBy("user_id").agg(
        F.sum("month_starts").alias("year_starts"),
        F.sum("month_ends").alias("year_ends"),
        F.sum("month_total").alias("year_total"),
    )


# ---------------------------------------------------------------------------
# §2.4 A6 — keyed JSON-object aggregate (DockTable months map), canonical
# sorted-key serialization on both sides
# reference: citibike_data_process/table_updating/update_dockmap.py:119-126
# ---------------------------------------------------------------------------


@register(
    "json_object_aggregate",
    """
    SELECT event_type,
           '{' || string_agg('"' || day || '":' || cnt, ',' ORDER BY day) || '}'
               AS day_counts
    FROM (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    )
    GROUP BY event_type
    """,
    tags=("A6", "F6"),
)
def json_object_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("cnt"))
    return daily.groupBy("event_type").agg(
        F.to_json(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("day", "cnt")))
            )
        ).alias("day_counts")
    )


# ---------------------------------------------------------------------------
# §2.3 J2 — LEFT JOIN + IS NULL anti-join (insert-missing idiom)
# reference: citibike_data_process/table_updating/update_heatmap.py:26-35
# ---------------------------------------------------------------------------


@register(
    "anti_join_missing",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("J2",),
)
def anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.3 J3 — NOT IN anti-join (null-free keys)
# reference: citibike_data_process/table_updating/update_dockmap.py:253-258
# ---------------------------------------------------------------------------


@register(
    "not_in_subquery",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_nationkey NOT IN (
        SELECT n.n_nationkey FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    """,
    tags=("J3",),
)
def not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    european = n.join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
                      n.n_regionkey == r.r_regionkey).select("n_nationkey")
    return s.join(
        F.broadcast(european), s.s_nationkey == european.n_nationkey, "left_anti"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# §2.3 J4 + §2.10 I3 — additive upsert (UPDATE-add + INSERT-missing) as one
# full-outer merge
# reference: citibike_data_process/table_updating/update_heatmap.py:17-35
# ---------------------------------------------------------------------------


@register(
    "additive_upsert_merge",
    """
    WITH main AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_count
        FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1
    ), delta AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_count
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY 1
    )
    SELECT o_custkey,
           COALESCE(main.order_count, 0) + COALESCE(delta.order_count, 0) AS order_count
    FROM main FULL OUTER JOIN delta USING (o_custkey)
    """,
    tags=("J4", "I3", "F5"),
)
def additive_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import additive_upsert

    o = table(spark, sf_dir, "orders")
    main = (
        o.filter(F.col("o_orderdate") < "1996-01-01")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_count"))
    )
    delta = (
        o.filter(F.col("o_orderdate") >= "1996-01-01")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_count"))
    )
    return additive_upsert(main, delta, keys=["o_custkey"], counters=["order_count"])


# ---------------------------------------------------------------------------
# §2.3 J5 — LEFT JOIN enrichment with COALESCE default
# reference: citibike_data_process/table_updating/update_dockmap.py:199-212
# ---------------------------------------------------------------------------


@register(
    "left_join_enrich_default",
    """
    SELECT o.o_orderkey,
           COALESCE(c.c_mktsegment, '{}') AS segment,
           o.o_orderstatus
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
      ON o.o_custkey = c.c_custkey
    """,
    tags=("J5", "F5"),
)
def left_join_enrich_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        F.coalesce("c_mktsegment", F.lit("{}")).alias("segment"),
        "o_orderstatus",
    )


# ---------------------------------------------------------------------------
# §2.3 J7 + §2.6 O2 — EXISTS probe (semi-join)
# reference: citibike_data_process/table_updating/update_status_data.py:19-24
# ---------------------------------------------------------------------------


@register(
    "exists_semi_join",
    """
    SELECT o.o_orderkey, o.o_orderstatus
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000
    )
    """,
    tags=("J7", "O2"),
)
def exists_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    rich = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return o.join(F.broadcast(rich), o.o_custkey == rich.c_custkey, "left_semi").select(
        "o_orderkey", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# §2.5 W1 — ranked top-k per group with deterministic tiebreaks
# reference: citibike_data_process/table_updating/update_tripsmap.py:86-95
# ---------------------------------------------------------------------------


@register(
    "topk_per_group_window",
    """
    SELECT nation, customer, total_price, rn FROM (
        SELECT n.n_name AS nation, c.c_name AS customer,
               ROUND(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS total_price,
               ROW_NUMBER() OVER (
                   PARTITION BY n.n_name
                   ORDER BY ROUND(CAST(sum(o.o_totalprice) AS DOUBLE), 2) DESC,
                            c.c_custkey
               ) AS rn
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, c.c_name, c.c_custkey
    ) WHERE rn <= 5
    """,
    tags=("W1", "O4"),
)
def topk_per_group_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import top_k_per_group

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_name").alias("customer"),
            F.col("c_custkey"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )
    ranked = top_k_per_group(
        per_cust,
        group_by=["nation"],
        order_by=[F.col("total_price").desc(), F.col("c_custkey")],
        k=5,
    )
    return ranked.select("nation", "customer", "total_price", "rn")


# ---------------------------------------------------------------------------
# §2.2 P4 — conditional column-pair swap (bbox coordinate repair shape)
# reference: citibike_data_process/data_processing/ingestion/db_importing.py:44-71
# ---------------------------------------------------------------------------


@register(
    "conditional_pair_swap",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount BETWEEN 0.0 AND 0.05 THEN l_discount ELSE l_tax END AS lo_part,
           CASE WHEN l_discount BETWEEN 0.0 AND 0.05 THEN l_tax ELSE l_discount END AS hi_part
    FROM lineitem
    """,
    tags=("P4", "F4"),
)
def conditional_pair_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    ok = F.col("l_discount").between(0.0, 0.05)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(ok, F.col("l_discount")).otherwise(F.col("l_tax")).alias("lo_part"),
        F.when(ok, F.col("l_tax")).otherwise(F.col("l_discount")).alias("hi_part"),
    )


# ---------------------------------------------------------------------------
# §2.8 F2/F3 — lower() + generated CASE value normalization
# reference: citibike_data_process/data_processing/ingestion/db_importing.py:11-28
# ---------------------------------------------------------------------------


@register(
    "case_value_normalization",
    """
    SELECT event_id,
           CASE WHEN lower(event_type) = 'click' THEN 'interaction'
                WHEN lower(event_type) = 'view' THEN 'impression'
                ELSE lower(event_type) END AS event_class
    FROM events
    """,
    tags=("F2", "F3"),
)
def case_value_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    low = F.lower(F.col("event_type"))
    return ev.select(
        "event_id",
        F.when(low == "click", "interaction")
        .when(low == "view", "impression")
        .otherwise(low)
        .alias("event_class"),
    )


# ---------------------------------------------------------------------------
# §2.2 P6 — multi-predicate conjunction filter (load-filter shape)
# reference: citibike_data_process/data_processing/ingestion/db_importing.py:76-88
# ---------------------------------------------------------------------------


@register(
    "multi_predicate_filter",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS kept_rows,
           ROUND(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS kept_value
    FROM lineitem
    WHERE l_quantity <> 0
      AND l_returnflag IS NOT NULL
      AND l_linestatus NOT IN ('X', 'Y')
      AND l_shipdate IS NOT NULL
      AND strftime(l_shipdate, '%Y') = '1995'
    GROUP BY l_returnflag
    """,
    tags=("P6", "F1"),
)
def multi_predicate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") != 0)
            & F.col("l_returnflag").isNotNull()
            & ~F.col("l_linestatus").isin("X", "Y")
            & F.col("l_shipdate").isNotNull()
            & (F.date_format("l_shipdate", "yyyy") == "1995")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("kept_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("kept_value"),
        )
    )


# ---------------------------------------------------------------------------
# §2.6 A9/O1 — DISTINCT projection + ORDER BY
# reference: citibike_data_process/table_updating/update_dockmap.py:47-49
# ---------------------------------------------------------------------------


@register(
    "distinct_years_ordered",
    """
    SELECT DISTINCT strftime(o_orderdate, '%Y') AS year
    FROM orders ORDER BY year
    """,
    tags=("A9", "O1"),
)
def distinct_years_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(F.date_format("o_orderdate", "yyyy").alias("year"))
        .distinct()
        .orderBy("year")
    )


# ---------------------------------------------------------------------------
# §2.7 U1 — schema-aligned UNION ALL
# reference: citibike_data_process/data_processing/ingestion/zip_processing.py:16
# ---------------------------------------------------------------------------


@register(
    "union_by_name",
    """
    SELECT part_key, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT l_partkey AS part_key FROM lineitem WHERE l_returnflag = 'R'
        UNION ALL
        SELECT p_partkey AS part_key FROM part WHERE p_size > 40
    ) GROUP BY part_key
    """,
    tags=("U1", "S6"),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("part_key"))
    b = p.filter(F.col("p_size") > 40).select(F.col("p_partkey").alias("part_key"))
    return a.unionByName(b).groupBy("part_key").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# §2.2 P7 — self-inequality filter + §2.4 A8 — many-key agg with COUNT+MIN
# reference: citibike_data_process/table_updating/update_tripsmap.py:60-85
# ---------------------------------------------------------------------------


@register(
    "group_count_min_time",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS trip_count,
           strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship
    FROM lineitem
    WHERE l_partkey <> l_suppkey
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A8", "P7"),
)
def group_count_min_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_partkey") != F.col("l_suppkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("trip_count"),
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        )
    )


# ---------------------------------------------------------------------------
# §2.10 I1 — new-file diff as an anti-join over (year, month) state
# reference: citibike_data_process/data_processing/ingestion/new_file_check.py:4-75
# ---------------------------------------------------------------------------


@register(
    "state_gate_new_periods",
    """
    WITH candidates AS (
        SELECT DISTINCT strftime(ts, '%Y') AS year,
               CAST(strftime(ts, '%d') AS INT) AS day
        FROM events
    ), processed AS (
        SELECT DISTINCT strftime(ts, '%Y') AS year,
               CAST(strftime(ts, '%d') AS INT) AS day
        FROM events WHERE event_id % 7 = 0 AND CAST(strftime(ts, '%d') AS INT) <= 10
    )
    SELECT c.year, c.day FROM candidates c
    WHERE NOT EXISTS (
        SELECT 1 FROM processed p WHERE p.year = c.year AND p.day = c.day
    )
    """,
    tags=("I1", "I2", "P9"),
)
def state_gate_new_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    keyed = ev.select(
        F.date_format("ts", "yyyy").alias("year"),
        F.dayofmonth("ts").alias("day"),
        "event_id",
    )
    candidates = keyed.select("year", "day").distinct()
    processed = (
        keyed.filter((F.col("event_id") % 7 == 0) & (F.col("day") <= 10))
        .select("year", "day")
        .distinct()
    )
    return candidates.join(processed, ["year", "day"], "left_anti")
