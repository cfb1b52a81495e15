"""K10 — run audit trail (reference ``Runs`` table :289-300,:552-557,
:736-738): append a row at start, append the finalized row at end.

Append-only (no in-place UPDATE in a lake): the finalized state of a run
is the row with the max EndedAt per RunID; ``current_runs`` resolves it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import now_str
from ..schemas import runs_schema


def start_run(spark: SparkSession, run_id: int, query_params: dict[str, str],
              cursor_inicio: str = "*") -> DataFrame:
    import json

    row = [(run_id, None, None, json.dumps(query_params), cursor_inicio, None, None, None)]
    df = spark.createDataFrame(row, schema=runs_schema)
    return df.withColumn("StartedAt", now_str())


def finish_run(start_df: DataFrame, cursor_fin: str | None,
               rows_ingested: int, notes: str | None = None) -> DataFrame:
    # explicit string casts: F.lit(None) alone is NullType, which breaks
    # the parquet schema on write
    return (
        start_df.withColumn("EndedAt", now_str())
        .withColumn("CursorFin", F.lit(cursor_fin).cast("string"))
        .withColumn("RowsIngested", F.lit(rows_ingested).cast("bigint"))
        .withColumn("Notes", F.lit(notes).cast("string"))
    )


def current_runs(runs: DataFrame) -> DataFrame:
    """Latest row per RunID (finalized state wins over the start stub)."""
    w = Window.partitionBy("RunID").orderBy(
        F.col("EndedAt").desc_nulls_last(), F.col("StartedAt").desc_nulls_last()
    )
    return runs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
