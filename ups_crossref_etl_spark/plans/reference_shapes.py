"""Reference-operator shapes exercised on the driver's testdata tables.

Each query here is one of SURVEY.md §2's operators (J4/J5/K3/K5/K7/F-class)
re-expressed over region/nation/part/orders/events/documents so the
driver's DuckDB gate covers the *operator*, independent of the bibliometric
fixture (which pytest covers end-to-end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import functions as fx
from ..sources.lake import read_table
from .money import DEC, dsum
from .registry import register


@register(
    "q_ref_normalize_text",
    r"""
    SELECT doc_id,
           trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g')) AS text_nfc,
           strip_accents(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_search
    FROM documents
    """,
    doc="F1/F2 Unicode normalization pandas_udfs (oracle: DuckDB nfc_normalize/strip_accents).",
)
def q_ref_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fx.norm_text_nfc(F.col("text")).alias("text_nfc"),
        fx.norm_text_nfkd_lower(F.col("text")).alias("text_search"),
    )


@register(
    "q_ref_standardize_doi",
    r"""
    SELECT p_partkey,
           lower(trim(regexp_replace(
             'https://doi.org/10.' || CAST(p_partkey AS VARCHAR) || '/' || replace(p_name, ' ', '.'),
             '(?i)^(https?://(dx\.)?doi\.org/|doi:\s*)', ''))) AS doi
    FROM part
    """,
    doc="F3 standardize_doi as a native Column expression (prefix-strip + lower).",
)
def q_ref_standardize_doi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    synthetic = F.concat(
        F.lit("https://doi.org/10."),
        F.col("p_partkey").cast("string"),
        F.lit("/"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit(".")),
    )
    return p.select("p_partkey", fx.standardize_doi(synthetic).alias("doi"))


@register(
    "q_ref_pattern_priority_join",
    r"""
    WITH pat(priority, label, pattern) AS (
      VALUES (0, 'widget', '\bwidget\b'), (1, 'bolt', '\bbolt\b'),
             (2, 'rod', '\brod\b'), (3, 'colored', '\b(blue|red|green)\b')),
    m AS (
      SELECT p.p_partkey, min(pat.priority) AS pr
      FROM part p JOIN pat ON regexp_matches(p.p_name, pat.pattern)
      GROUP BY p.p_partkey)
    SELECT coalesce(pat.label, 'none') AS label, count(*) AS n
    FROM part p
    LEFT JOIN m ON p.p_partkey = m.p_partkey
    LEFT JOIN pat ON m.pr = pat.priority
    GROUP BY 1
    """,
    doc="J4 pattern-table theta join, first-match-priority (country tagging shape).",
)
def q_ref_pattern_priority_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    pats = spark.createDataFrame(
        [(0, "widget", r"\bwidget\b"), (1, "bolt", r"\bbolt\b"),
         (2, "rod", r"\brod\b"), (3, "colored", r"\b(blue|red|green)\b")],
        schema="priority int, label string, pattern string",
    )
    j = p.join(F.broadcast(pats), F.expr("rlike(p_name, pattern)"), "left")
    w = Window.partitionBy("p_partkey").orderBy(F.col("priority").asc_nulls_last())
    first = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        first.select(F.coalesce("label", F.lit("none")).alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_ref_keyword_lastwins_join",
    """
    WITH kw(kid, kw) AS (VALUES (1, 'small'), (2, 'large'), (3, 'widget')),
    m AS (
      SELECT p.p_partkey, max(kw.kid) AS kid
      FROM part p JOIN kw ON p.p_name LIKE '%' || kw.kw || '%'
      GROUP BY p.p_partkey)
    SELECT coalesce(m.kid, 0) AS kid, count(*) AS n
    FROM part p LEFT JOIN m ON p.p_partkey = m.p_partkey
    GROUP BY 1
    """,
    doc="J5 keyword contains-join, last-writer-wins = max id (sede labeling shape).",
)
def q_ref_keyword_lastwins_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    kws = spark.createDataFrame(
        [(1, "small"), (2, "large"), (3, "widget")], schema="kid int, kw string"
    )
    m = (
        p.join(F.broadcast(kws), F.col("p_name").contains(F.col("kw")))
        .groupBy("p_partkey")
        .agg(F.max("kid").alias("kid"))
    )
    return (
        p.join(m, "p_partkey", "left")
        .select(F.coalesce("kid", F.lit(0)).alias("kid"))
        .groupBy("kid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_ref_monotone_merge",
    """
    WITH ordered AS (
      SELECT user_id, event_type, props,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT user_id,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS any_purchase,
           CAST(min(CASE WHEN rn = 1 THEN json_extract_string(props, '$.k') END) AS BIGINT)
             AS first_k
    FROM ordered GROUP BY user_id
    """,
    doc="K5/K6 monotone flag + deterministic first-value merge (upsert rebuild shape).",
)
def q_ref_monotone_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "any_purchase"
            ),
            F.min(
                F.when(F.col("rn") == 1, F.get_json_object("props", "$.k"))
            ).cast("bigint").alias("first_k"),
        )
    )


@register(
    "q_ref_insert_if_absent",
    """
    WITH existing AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0),
         incoming AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0)
    SELECT count(*) AS n_inserted, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS inserted_value
    FROM incoming WHERE o_orderkey NOT IN (SELECT o_orderkey FROM existing)
    """,
    doc="K3/J8 insert-if-absent: anti-join of incoming batch vs existing keys.",
)
def q_ref_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    existing = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderkey")
    incoming = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    ins = incoming.join(existing, "o_orderkey", "left_anti")
    return ins.agg(
        F.count(F.lit(1)).alias("n_inserted"),
        dsum(F.col("o_totalprice")).alias("inserted_value"),
    )


@register(
    "q_ref_upsert_catalog",
    """
    WITH incoming AS (
      SELECT n_nationkey, upper(n_name) AS n_name, n_regionkey
      FROM nation WHERE n_nationkey < 10),
    merged AS (
      SELECT * FROM incoming
      UNION ALL
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      WHERE n_nationkey NOT IN (SELECT n_nationkey FROM incoming))
    SELECT n_regionkey, count(*) AS n, count(CASE WHEN n_name = upper(n_name) THEN 1 END) AS n_upper
    FROM merged GROUP BY n_regionkey
    """,
    doc="K7 catalog upsert: incoming ∪ (existing anti incoming) overwrite.",
)
def q_ref_upsert_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    incoming = n.filter(F.col("n_nationkey") < 10).select(
        "n_nationkey", F.upper("n_name").alias("n_name"), "n_regionkey"
    )
    merged = incoming.unionByName(
        n.select("n_nationkey", "n_name", "n_regionkey").join(
            incoming.select("n_nationkey"), "n_nationkey", "left_anti"
        )
    )
    return merged.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("n_name") == F.upper("n_name"), 1)).alias("n_upper"),
    )


@register(
    "q_ref_flatview_shape",
    """
    SELECT c.c_custkey,
           string_agg(DISTINCT CAST(date_part('year', o.o_orderdate) AS VARCHAR), '; '
                      ORDER BY CAST(date_part('year', o.o_orderdate) AS VARCHAR)) AS years,
           CAST(max(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS INT) AS f_flag,
           count(*) AS n_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
    doc="A1 flat-view aggregate shape: '; '-joined sorted set + monotone flag.",
)
def q_ref_flatview_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy(c.c_custkey)
        .agg(
            F.array_join(
                F.array_sort(F.collect_set(F.year("o_orderdate").cast("string"))), "; "
            ).alias("years"),
            F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("int")
            .alias("f_flag"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q_ref_date_functions",
    """
    SELECT o_orderkey,
           CAST(date_part('year', o_orderdate) AS INT) AS y,
           CAST(date_part('month', o_orderdate) AS INT) AS m,
           CAST(date_part('day', o_orderdate) AS INT) AS d,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(make_date(CAST(date_part('year', o_orderdate) AS INT), 1, 1),
                    '%Y-%m-%d') AS year_start
    FROM orders
    """,
    doc="F4/F5/F14 date extraction + make_date + formatting.",
)
def q_ref_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.make_date(F.year(d), F.lit(1), F.lit(1)), "yyyy-MM-dd").alias(
            "year_start"
        ),
    )


@register(
    "q_ref_json_encode",
    """
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type)) AS payload
    FROM events WHERE event_id < 100
    """,
    doc="F15 JSON encode of run params (to_json(struct(...))).",
)
def q_ref_json_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    return ev.select(
        "event_id",
        F.to_json(F.struct(F.col("event_id"), F.col("event_type"))).alias("payload"),
    )


@register(
    "q_ref_try_cast_defaults",
    """
    SELECT event_id,
           coalesce(TRY_CAST(event_type AS BIGINT), 0) AS et_num,
           coalesce(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k
    FROM events WHERE event_id < 200
    """,
    doc="F11/F12 try_cast coercion with default-on-missing.",
)
def q_ref_try_cast_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    return ev.select(
        "event_id",
        fx.default_zero(fx.try_long(F.col("event_type"))).cast("bigint").alias("et_num"),
        fx.default_zero(
            fx.try_long(F.get_json_object("props", "$.k"))
        ).cast("bigint").alias("k"),
    )


# ---- additional TPC-H shapes -------------------------------------------------


@register(
    "q_tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top-20.",
)
def q_tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(c.c_custkey, "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q14_promo_share",
    """
    SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE), 4) AS promo_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="TPC-H Q14 shape: conditional revenue share.",
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0).cast(DEC)
                ).cast("double")
                / F.sum(rev.cast(DEC)).cast("double"),
                4,
            ).alias("promo_share")
        )
    )


@register(
    "q_tpch_q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS o_totalprice,
           CAST(round(t.qty, 2) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty FROM lineitem
          GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 150) t
    ON o.o_orderkey = t.l_orderkey
    """,
    doc="TPC-H Q18 shape: HAVING-filtered agg joined back to orders.",
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > 150)
    )
    return o.join(t, o.o_orderkey == t.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round("qty", 2).cast("double").alias("total_qty"),
    )


@register(
    "q_tpch_q19_bracket_filter",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 5 AND 25
           AND l.l_discount BETWEEN 0.02 AND 0.08)
       OR (p.p_brand = 'Brand#1' AND l.l_quantity >= 30)
    """,
    doc="TPC-H Q19 shape: disjunctive bracketed range predicates.",
)
def q_tpch_q19_bracket_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    cond = (
        F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
        & F.col("l_discount").between(0.02, 0.08)
    ) | ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity") >= 30))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q_tpch_q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(date_part('year', l.l_shipdate) AS INT) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
    GROUP BY sn.n_name, cn.n_name, 3
    """,
    doc="TPC-H Q7 shape: cross-nation volume with dual dimension aliases.",
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .filter(F.col("sk") != F.col("ck"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q_tpch_q13_order_distribution",
    """
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) t
    GROUP BY n_orders
    """,
    doc="TPC-H Q13 shape: distribution of per-customer order counts (double groupBy).",
)
def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q_tpch_q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0),
    rich_idle AS (
      SELECT c.c_custkey, c.c_nationkey % 5 AS cntrycode, c.c_acctbal
      FROM customer c, avg_bal
      WHERE c.c_acctbal > avg_bal.a
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P'))
    SELECT cntrycode, count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
    FROM rich_idle GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: scalar-avg subquery + NOT EXISTS anti-join + agg.",
)
def q_tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    idle = rich.join(
        o.filter(F.col("o_orderstatus") == "P"),
        rich.c_custkey == o.o_custkey,
        "left_anti",
    )
    return (
        idle.select((F.col("c_nationkey") % 5).alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "q_cube_flag_status",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (completes rollup coverage from q_rollup_*).",
)
def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "n",
        )
    )


@register(
    "q_tpch_q4_priority_check",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a cross-table predicate (semi-join).",
)
def q_tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q_tpch_q6_forecast_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure scan+filter+agg (pushdown showcase).",
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q_tpch_q12_priority_by_linestatus",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: join + IN-list conditional counts.",
)
def q_tpch_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total
      FROM lineitem GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total, 2) AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total = (SELECT max(total) FROM revenue)
    """,
    doc="TPC-H Q15 shape: view + scalar-max subquery (top supplier, exact decimal).",
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias(
            "total"
        )
    )
    mx = revenue.agg(F.max("total").alias("mx"))
    top = revenue.crossJoin(F.broadcast(mx)).filter(F.col("total") == F.col("mx"))
    return (
        s.join(top, s.s_suppkey == top.supplier_no)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total", 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q_tpch_q17_small_quantity",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0, 4) AS DOUBLE)
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: correlated per-key avg subquery (agg + rejoin).",
)
def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)) / 7.0, 4
            ).cast("double").alias("avg_yearly")
        )
    )


@register(
    "q_tpch_q21_waiting_orders",
    """
    WITH multi AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING count(DISTINCT l_suppkey) > 1),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey FROM lineitem l
      WHERE l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00')
    SELECT s.s_name, count(*) AS numwait
    FROM late
    JOIN multi ON late.l_orderkey = multi.l_orderkey
    JOIN supplier s ON late.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (adapted): HAVING distinct-count + multi-join chain.",
)
def q_tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    late = (
        li.filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        late.join(multi, "l_orderkey")
        .join(F.broadcast(s), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q_tpch_q8_market_share",
    """
    WITH all_volume AS (
      SELECT CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume,
             sn.n_regionkey AS supp_region
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_region = 2 THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM all_volume GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: market-share ratio of conditional decimal sums per year.",
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = n.select(F.col("n_nationkey").alias("sk"), F.col("n_regionkey").alias("supp_region"))
    cn = n.select(F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("cust_region"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("ck"))
        .join(F.broadcast(r), F.col("cust_region") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_region")
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_region") == 2, F.col("volume")).otherwise(
                F.lit(0).cast(DEC)
            )).cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )
