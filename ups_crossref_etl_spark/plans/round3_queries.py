"""Round-3 additions: grouping-sets/CUBE aggregation, oracle-checked
connected components (the transitive-closure dedup path), and the salted
two-phase skew aggregation driven through the driver gate.

These register inside the driver's bounded correctness window (see
``registry.load_all``) because they are new this round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import connected_components
from ..operators.skew import salted_agg
from ..sources.lake import read_table
from .money import DEC
from .registry import register


@register(
    "q_events_cube_type_hour",
    """
    SELECT event_type,
           hour_of_day,
           CAST(GROUPING(event_type) * 2 + GROUPING(hour_of_day) AS BIGINT) AS gid,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM (SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day, value FROM events)
    GROUP BY CUBE (event_type, hour_of_day)
    """,
    doc=(
        "CUBE (grouping sets) over (event_type, hour-of-day): all four "
        "grouping combinations in one pass — Spark plans a single Expand + "
        "hash aggregate, not four scans. gid disambiguates rolled-up NULLs "
        "from data NULLs."
    ),
)
def q_events_cube_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hour_of_day"), "value"
    )
    return (
        ev.cube("event_type", "hour_of_day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)), 2).cast("double").alias("total_value"),
        )
        .select("event_type", "hour_of_day", "gid", "n_events", "total_value")
    )


@register(
    "q_docs_neardup_cc",
    """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_distinct([x for x in regexp_split_to_array(lower(text), '[^a-z0-9]+') IF x <> '']) AS tok
      FROM documents WHERE doc_id < 80),
    edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.tok, b.tok))::DOUBLE /
            nullif(len(list_distinct(list_concat(a.tok, b.tok))), 0) >= 0.5),
    sym AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    reach(node, comp) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.node)
    SELECT node, min(comp) AS component FROM reach GROUP BY node
    """,
    doc=(
        "Connected components over the exact-Jaccard≥0.5 near-dup graph on "
        "a bounded doc sample: distributed min-label propagation vs a "
        "recursive-CTE reachability oracle. This is the transitive-closure "
        "dedup path (minhash_dedup_transitive) with the LSH stage replaced "
        "by oracle-expressible exact pairs so the component labels "
        "hash-match."
    ),
)
def q_docs_neardup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    toks = d.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split(F.lower("text"), r"[^a-z0-9]+"), lambda t: t != F.lit(""))
        ).alias("tok"),
    )
    a = toks.select(F.col("doc_id").alias("src"), F.col("tok").alias("ta"))
    b = toks.select(F.col("doc_id").alias("dst"), F.col("tok").alias("tb"))
    edges = (
        a.crossJoin(b)
        .filter(F.col("src") < F.col("dst"))
        .filter(
            F.size(F.array_intersect("ta", "tb"))
            / F.nullif(F.size(F.array_union("ta", "tb")), F.lit(0)).cast("double")
            >= 0.5
        )
        .select("src", "dst")
    )
    return connected_components(edges)


@register(
    "q_events_skew_salted_topk",
    """
    SELECT user_id, count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC LIMIT 10
    """,
    doc=(
        "Top-10 users by event count via the two-phase salted aggregation "
        "(partial per (user, salt), final per user) — skew-proof shape for "
        "heavy-hitter keys; byte-identical to the plain GROUP BY oracle "
        "because count/decimal-sum are associative."
    ),
)
def q_events_skew_salted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    agg = salted_agg(
        ev,
        ["user_id"],
        "event_id",
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast(DEC)).alias("_v"),
        ],
        final_aggs=[
            F.sum("_n").alias("n_events"),
            F.round(F.sum("_v"), 2).cast("double").alias("total_value"),
        ],
    )
    return agg.orderBy(F.desc("n_events"), F.asc("user_id")).limit(10)
