"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster (AQE handles runtime re-planning; shuffle
partition counts are sized by AQE coalescing rather than hand-tuning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "ups_crossref_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    Settings chosen for oracle-comparability and scale:

    - ``session.timeZone=UTC``: DuckDB timestamps are UTC-naive; pin the
      session TZ so timestamp semantics agree.
    - AQE on (coalesce partitions + skew-join): at 100 TB the static
      shuffle-partition count is always wrong somewhere; AQE fixes it at
      runtime per stage.
    - Arrow on: every pandas_udf / toPandas crosses via Arrow batches.
    - ``parquet.aggregatePushdown``: count/min/max served from footers.
    """
    import tempfile

    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    warehouse = os.path.join(tempfile.gettempdir(), f"spark-warehouse-{os.getpid()}")

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # keep managed-table state (bucketed tables, derby metastore) out
        # of the repo working dir
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={warehouse}")
        # Testdata events.parquet has shipped two encodings across
        # regenerations: TIMESTAMP(NANOS) (unreadable without this conf;
        # sources/lake.py converts the resulting long to micros) and plain
        # micros/isAdjustedToUTC=false (scans as TIMESTAMP_NTZ; conf is a
        # no-op). Keep it set so either encoding scans; readers branch on
        # the observed type, never assume one.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
