"""Relational query battery over the TPC-H-ish testdata (TESTDATA.md).

Exercises the engine's join/aggregate/filter/window/set-op surface
(SURVEY.md §2.3-2.8 operator ids cited per query) on the driver's tables.
Scale notes: every join below either broadcasts a dimension (region/nation/
supplier/part are tiny at any SF — Catalyst auto-broadcasts under the 64 MB
threshold we set) or shuffles on a high-cardinality key with AQE handling
skew; filters sit directly on scans so parquet pushdown applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.lake import read_table
from .money import DEC, davg, dsum
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# Registered first within this module: its round-2 oracle rework has not
# yet had a driver correctness row, and the gate window truncates this
# module's tail (see registry.load_all) — the never-yet-verified query must
# not be the one truncated.
@register(
    "q_approx_aggregates",
    """
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_parts_within_5pct,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_median_price,
           TRUE AS approx_median_within_p40_p60
    FROM lineitem
    """,
    doc="Sketch aggregates (HLL count-distinct, approx percentile) with a "
    "checkable contract: exact twins hash-compared, approximate values "
    "exported as error-bound booleans the oracle pins to TRUE.",
)
def q_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("_approx_parts"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("exact_median_price"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_approx_median"),
        F.expr("percentile(l_extendedprice, 0.4)").alias("_p40"),
        F.expr("percentile(l_extendedprice, 0.6)").alias("_p60"),
    )
    return agg.select(
        "exact_parts",
        (
            F.abs(F.col("_approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.05
        ).alias("approx_parts_within_5pct"),
        "exact_median_price",
        (
            (F.col("_approx_median") >= F.col("_p40"))
            & (F.col("_approx_median") <= F.col("_p60"))
        ).alias("approx_median_within_p40_p60"),
    )


@register(
    "q_window_range_frame_7d",
    """
    SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(count(*) OVER w AS BIGINT) AS n_orders_7d,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w, 2)
                AS DOUBLE) AS spend_7d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    """,
    doc=(
        "RANGE-interval window frame: trailing-7-calendar-day order count "
        "and spend per customer — a value-based frame (peers included by "
        "time distance, not row position), the window variant ROWS frames "
        "can't express. One shuffle on the partition key."
    ),
)
def q_window_range_frame_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("spend_7d"),
    )


@register(
    "q_analytic_ranks_by_segment",
    """
    WITH spend AS (
      SELECT c.c_mktsegment, c.c_custkey,
             CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_spend
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2)
    SELECT c_mktsegment, c_custkey, total_spend,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           round(percent_rank() OVER w, 6) AS prank,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(cume_dist() OVER w, 6) AS cdist
    FROM spend
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY total_spend DESC, c_custkey)
    """,
    doc=(
        "Analytic-rank family in one window (dense_rank / percent_rank / "
        "ntile / cume_dist): customers ranked by exact-decimal spend "
        "within segment, unique tiebreak so every rank value is "
        "deterministic."
    ),
)
def q_analytic_ranks_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast(DEC)), 2)
            .cast("double")
            .alias("total_spend")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total_spend"), F.asc("c_custkey")
    )
    return spend.select(
        "c_mktsegment",
        "c_custkey",
        "total_spend",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


# --------------------------------------------------------------------------
# Aggregation core
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: filter pushdown + 8-agg groupBy (A-class; P1).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT o.o_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join + agg + deterministic top-k (J-class, O-class).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name, CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join, dims broadcast (J1-class).",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Join variants (J-class)
# --------------------------------------------------------------------------


@register(
    "q_left_join_order_counts",
    """
    SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n_orders,
           CAST(round(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 0), 2) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    doc="J2-style left equi-join keeping zero-order customers.",
)
def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey, "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast(DEC)), 2
            ).cast("double").alias("total_spent"),
        )
    )


@register(
    "q_semi_join_urgent_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    doc="J9/P9 semi-join membership (reference integrity filter :491-495).",
)
def q_semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="J8 anti-join: insert-if-absent / NOT EXISTS shape (:423-428,:599-601).",
)
def q_anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_full_outer_nation_activity",
    """
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(cn.n_customers, 0) AS n_customers,
           coalesce(sn.n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers
          FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) sn
    ON cn.nationkey = sn.nationkey
    """,
    doc="Full outer join (absent in reference; engine surface per §2.4).",
)
def q_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "q_cross_join_region_priority_grid",
    """
    SELECT r.r_name, p.o_orderpriority, count(*) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    GROUP BY r.r_name, p.o_orderpriority
    """,
    doc="Degenerate cross join (J4/J5 pattern-table shape uses the same plan).",
)
def q_cross_join_region_priority_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(F.broadcast(p)).groupBy("r_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
# Window functions / top-k per group (O-class + A-class)
# --------------------------------------------------------------------------


@register(
    "q_topk_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
      SELECT c.c_mktsegment, o.o_orderkey,
             round(o.o_totalprice, 2) AS o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rk <= 3
    """,
    doc="Top-k per group via row_number window (guide OLAP pattern).",
)
def q_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "q_window_running_spend",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
    doc="Running-sum window (cumulative per-entity state, batch analog of A5).",
)
def q_window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "q_window_lag_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    """,
    doc="lag() window — gap computation (sessionization building block).",
)
def q_window_lag_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    # bigint: DuckDB date_diff returns BIGINT, Spark datediff int
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).cast("bigint").alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Dedup / distinct / set ops (A3, §2.8)
# --------------------------------------------------------------------------


@register(
    "q_distinct_ship_modes",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="A3 dropDuplicates on a projection.",
)
def q_distinct_ship_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_set_ops_customer_keys",
    """
    WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM b UNION SELECT * FROM a)
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT * FROM b INTERSECT SELECT * FROM a)
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    """,
    doc="§2.8 set operations: UNION/INTERSECT/EXCEPT.",
)
def q_set_ops_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    a = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    rows = [
        b.union(a).distinct().select(F.lit("union").alias("op"), F.lit(1).alias("one")),
        b.intersect(a).select(F.lit("intersect").alias("op"), F.lit(1).alias("one")),
        b.exceptAll(a).distinct().select(F.lit("except").alias("op"), F.lit(1).alias("one")),
    ]
    u = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return u.groupBy("op").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Grouping sets / conditional aggregation
# --------------------------------------------------------------------------


@register(
    "q_rollup_region_nation_customers",
    """
    SELECT coalesce(r.r_name, 'ALL') AS region_name,
           coalesce(n.n_name, 'ALL') AS nation_name,
           count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="ROLLUP grouping sets (engine surface; absent in reference §2.5).",
)
def q_rollup_region_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
        )
    )


@register(
    "q_conditional_agg_status_pivot",
    """
    SELECT o_custkey,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY o_custkey
    """,
    doc="Conditional aggregation / manual pivot (F12/F13 when-chain shape).",
)
def q_conditional_agg_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def flag(v):
        return F.sum(F.when(F.col("o_orderstatus") == v, 1).otherwise(0))

    return o.groupBy("o_custkey").agg(
        flag("F").alias("n_f"), flag("O").alias("n_o"), flag("P").alias("n_p")
    )


@register(
    "q_sorted_set_agg_priorities",
    """
    SELECT o_custkey,
           string_agg(DISTINCT o_orderpriority, '; ' ORDER BY o_orderpriority) AS priorities,
           count(DISTINCT o_orderpriority) AS n_distinct
    FROM orders GROUP BY o_custkey
    """,
    doc="A1/A2 sorted-set '; '-join aggregate (reference flat view :510-519).",
)
def q_sorted_set_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "; ").alias("priorities"),
        F.count_distinct("o_orderpriority").alias("n_distinct"),
    )


@register(
    "q_count_distinct_parts_per_supplier",
    """
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_lines
    FROM lineitem GROUP BY l_suppkey
    """,
    doc="Exact distinct-count aggregate (shuffle-heavy; AQE-coalesced).",
)
def q_count_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q_scalar_subquery_above_avg_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="Scalar subquery predicate (Catalyst rewrites to a broadcast agg).",
)
def q_scalar_subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_scalar_sub")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM _orders_scalar_sub
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM _orders_scalar_sub)
        """
    )


@register(
    "q_percentiles_order_value",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles (approx_percentile is the approximate twin).",
)
def q_percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@register(
    "q_unpivot_part_metrics",
    """
    SELECT p_partkey, metric, round(val, 2) AS val
    FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS price
          FROM part)
    UNPIVOT (val FOR metric IN (size, price))
    """,
    doc="Unpivot/stack (§2 absent-in-reference surface; engine completeness).",
)
def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("price"),
    )
    return p.unpivot("p_partkey", ["size", "price"], "metric", "v").select(
        "p_partkey", "metric", F.round("v", 2).alias("val")
    )


@register(
    "q_pivot_segment_by_status",
    """
    SELECT c.c_mktsegment,
           CAST(count(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
           CAST(count(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
           CAST(count(CASE WHEN o.o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Native .pivot() (vs the manual when-chain in q_conditional_agg_status_pivot).",
)
def q_pivot_segment_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    out = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return out.select(
        "c_mktsegment",
        F.coalesce("F", F.lit(0)).alias("F"),
        F.coalesce("O", F.lit(0)).alias("O"),
        F.coalesce("P", F.lit(0)).alias("P"),
    )




# --------------------------------------------------------------------------
# TPC-H completion (round 6): q2, q9, q11, q16, q20 — the five queries whose
# canonical form reads PARTSUPP, which the testdata does not ship. The
# (part, supplier) relation is therefore DERIVED from lineitem:
# ps_supplycost = min observed unit price (rounded 4dp — division parity),
# ps_availqty = total shipped quantity. Every query keeps its canonical
# SHAPE (correlated min, profit decomposition, threshold-of-total, NOT-IN
# distinct count, nested-IN semi-join chain) on the derived relation.
# --------------------------------------------------------------------------

_PS_SQL = """
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(CAST(floor(round(l_extendedprice * 100, 0) * 10000
                            / l_quantity) AS BIGINT)) AS ps_cost_micro,
             sum(l_quantity) AS ps_availqty
      FROM lineitem GROUP BY 1, 2)
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp surrogate (see module comment above). One map-side-
    combinable groupBy on (partkey, suppkey) — at 100 TB this is the
    relation you would materialize once (bucketed by ps_partkey) and
    reuse across all five queries rather than recompute.

    ``ps_cost_micro`` is the min observed unit price in integer
    MICRO-units (1e-6 currency): prices are 2dp so ``round(price*100)``
    is an exact integer, ``*10000/qty`` then ``floor`` is deterministic
    IEEE arithmetic producing the same bigint on every engine. The
    fixed-point detour exists because ``round(price/qty, 4)`` is NOT
    engine-portable — unit prices land exactly on 4dp midpoints
    (e.g. 72179.93/40 = 1804.49825) where DuckDB's scale-in-binary
    round and Spark/Java's decimal-repr round disagree by one ulp of
    the last digit. Downstream arithmetic divides by 1e6 only at the
    edge (display / 6dp-decimal cast), which is parity-safe."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(
            F.floor(
                F.round(F.col("l_extendedprice") * 100, 0)
                * 10000
                / F.col("l_quantity")
            ).cast("long")
        ).alias("ps_cost_micro"),
        F.sum("l_quantity").alias("ps_availqty"),
    )


@register(
    "q2_min_cost_supplier",
    "WITH " + _PS_SQL + """,
    eps AS (
      SELECT ps.ps_partkey, ps.ps_cost_micro, s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'),
    mn AS (SELECT ps_partkey, min(ps_cost_micro) AS mc FROM eps GROUP BY 1)
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           e.ps_cost_micro / 1000000.0 AS supplycost
    FROM eps e
    JOIN mn ON e.ps_partkey = mn.ps_partkey AND e.ps_cost_micro = mn.mc
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size = 15 AND p.p_type = 'SMALL'
    """,
    doc=(
        "TPC-H Q2 shape (adapted to the derived partsupp): cheapest "
        "EUROPE supplier per qualifying part — the correlated min "
        "subquery decorrelates into a per-part min aggregate re-joined "
        "on (partkey, cost). region/nation/supplier broadcast; the only "
        "big shuffle is the ps derivation itself. Ties (two suppliers at "
        "the min cost) are all returned — no LIMIT, hash compare is "
        "order-insensitive."
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    eps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_cost_micro", "s_acctbal", "s_name", "n_name")
    )
    mn = eps.groupBy("ps_partkey").agg(F.min("ps_cost_micro").alias("mc"))
    return (
        eps.join(
            mn,
            (eps.ps_partkey == mn.ps_partkey)
            & (eps.ps_cost_micro == mn.mc),
        )
        .drop(mn.ps_partkey)
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("ps_cost_micro") / 1000000.0).alias("supplycost"),
        )
    )


@register(
    "q9_product_type_profit",
    "WITH " + _PS_SQL + """,
    profit AS (
      SELECT n.n_name AS nation,
             CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  - ps.ps_cost_micro * l.l_quantity / 1000000.0
                  AS DECIMAL(18,6)) AS amount
      FROM lineitem l
      JOIN ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%')
    SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM profit GROUP BY nation, o_year
    """,
    doc=(
        "TPC-H Q9 shape (adapted): per-nation per-year profit "
        "decomposition — revenue minus supply cost — for parts matching "
        "a name pattern. lineitem joins the derived ps on its composite "
        "key (the one big shuffle, both sides pre-partitionable on "
        "partkey), part filter broadcast-semi-reduces the probe side, "
        "supplier/nation broadcast, orders equi-join on orderkey. "
        "Amounts cast DECIMAL(18,6) before the sum so accumulation "
        "order cannot flip the hash."
    ),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    # Both terms are exact-decimal-valued doubles (price×(1−2dp discount)
    # is a 4dp value, micro-cost×qty/1e6 a 6dp value), so the difference
    # sits ≥1e-7 from any 6dp midpoint and the DECIMAL(18,6) cast is
    # engine-portable. See _derived_partsupp for why no round() appears.
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("ps_cost_micro") * F.col("l_quantity") / 1000000.0
    ).cast(DEC)
    base = (
        li.join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return base.groupBy("nation", "o_year").agg(
        F.round(F.sum("amount"), 2).cast("double").alias("sum_profit")
    )


@register(
    "q11_important_stock",
    "WITH " + _PS_SQL + """,
    nps AS (
      SELECT ps.ps_partkey,
             CAST(ps.ps_cost_micro * ps.ps_availqty / 1000000.0
                  AS DECIMAL(18,6)) AS val
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA')
    SELECT ps_partkey, CAST(round(sum(val), 2) AS DOUBLE) AS value
    FROM nps
    GROUP BY ps_partkey
    HAVING sum(val) > (SELECT 0.001 * sum(val) FROM nps)
    """,
    doc=(
        "TPC-H Q11 shape (adapted): per-part inventory value held by "
        "ASIA suppliers, keeping parts above a fraction of the TOTAL "
        "value — the scalar-subquery threshold decorrelates into a "
        "single-row aggregate broadcast-cross-joined against the "
        "per-part sums (no second scan of the base relation at scale: "
        "both aggregates reuse the same shuffled nps). DECIMAL sums "
        "both sides."
    ),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "ps_partkey",
            (F.col("ps_cost_micro") * F.col("ps_availqty") / 1000000.0)
            .cast(DEC)
            .alias("val"),
        )
    )
    per_part = nps.groupBy("ps_partkey").agg(F.sum("val").alias("_sv"))
    thresh = nps.agg((F.sum("val") * F.lit(0.001)).alias("_th"))
    return (
        per_part.crossJoin(F.broadcast(thresh))
        .filter(F.col("_sv") > F.col("_th"))
        .select(
            "ps_partkey", F.round("_sv", 2).cast("double").alias("value")
        )
    )


@register(
    "q16_parts_supplier_counts",
    """
    WITH psd AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT psd.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM psd
    JOIN part p ON p.p_partkey = psd.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND psd.l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
    doc=(
        "TPC-H Q16 shape (adapted): distinct supplier count per "
        "(brand, type, size) bucket, excluding a brand/type/size set and "
        "suppliers on a deny list (negative balance stands in for the "
        "comment-pattern complaint filter; the testdata has no comment "
        "column). The NOT IN is a broadcast anti-join (supplier is "
        "tiny); part filter broadcast; one distinct + one grouped "
        "count-distinct shuffle."
    ),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    deny = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    psd = li.select("l_partkey", "l_suppkey").distinct()
    return (
        psd.join(F.broadcast(deny), "l_suppkey", "left_anti")
        .join(F.broadcast(p), psd.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_potential_promotion",
    "WITH " + _PS_SQL + """,
    yearly AS (
      SELECT l_partkey, 0.5 * sum(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1),
    qual AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM ps
      JOIN yearly y ON y.l_partkey = ps.ps_partkey
      WHERE ps.ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND ps.ps_availqty > y.half_qty)
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT ps_suppkey FROM qual)
    """,
    doc=(
        "TPC-H Q20 shape (adapted): ASIA suppliers holding more than "
        "half a qualifying part's 1997 shipped volume — the canonical "
        "nested-IN chain (supplier IN (... partsupp WHERE part IN (...) "
        "AND availqty > correlated half-sum)). Both INs are LEFT SEMI "
        "joins in the plan (pinned in tests/test_plans.py) — the "
        "subqueries execute once as builds, never per-row; the "
        "correlated scalar decorrelates into the per-part 1997 "
        "aggregate joined on partkey."
    ),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _derived_partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    small_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("ps_partkey"))
    )
    yearly = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg((F.sum("l_quantity") * 0.5).alias("half_qty"))
    )
    qual = (
        ps.join(F.broadcast(small_parts), "ps_partkey", "left_semi")
        .join(yearly, "ps_partkey")
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        s.join(qual, "s_suppkey", "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
