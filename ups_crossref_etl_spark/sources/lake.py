"""Parquet-lake readers (reference's SQLite table scans, S5 →
``spark.read.parquet``; ``src/barrazueta_pipeline_etl_crossref.py:461-469``).

At cluster scale these are plain columnar scans: Catalyst pushes predicates
and prunes columns into the parquet reader automatically, and partitioned
table layouts (e.g. ``obras`` by ``Anio``) activate partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ensure_oracle_confs(spark: SparkSession) -> None:
    """Runtime confs the oracle comparison depends on, set defensively in
    case the calling session isn't ours (the driver builds its own):
    nanos-parquet readability and UTC timestamp formatting."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


#: events.ts footer encodings the readers are known to handle. Anything
#: else must fail LOUDLY: round 4 shipped three commits on stale artifacts
#: because a silent nanos→micros testdata regeneration broke 7 queries.
_KNOWN_TS_ENCODINGS = (
    "timestamp[ns]",
    "timestamp[us]",
    "timestamp[ms]",
    "timestamp[us, tz=UTC]",
    "timestamp[ns, tz=UTC]",
    "timestamp[ms, tz=UTC]",
)


def assert_testdata_shape(sf_dir: str) -> None:
    """Testdata-drift sentinel: assert the parquet footer type of
    ``events.ts`` is one the readers branch on. Cheap pyarrow probe (no
    JVM); called from ``tests/conftest.py`` and ``tools/check_queries.py``
    so a regeneration to an unhandled encoding fails every test run
    immediately instead of stale-passing."""
    import pyarrow.parquet as pa_pq

    p = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(p):
        return
    t = str(pa_pq.ParquetFile(p).schema_arrow.field("ts").type)
    if t not in _KNOWN_TS_ENCODINGS:
        raise AssertionError(
            f"testdata drift: {p} stores ts as {t!r}, not one of "
            f"{_KNOWN_TS_ENCODINGS} — update sources/lake.read_table, "
            "streaming/events.stream_events, and this sentinel together"
        )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table: ``{sf_dir}/{name}.parquet``.

    ``events.ts`` has shipped in two footer encodings across testdata
    regenerations: TIMESTAMP(NANOS) — scans as epoch-nanos long under
    ``nanosAsLong``, truncated to micros here (DuckDB truncates the same
    way, keeping oracles comparable) — and plain micros with
    ``isAdjustedToUTC=false`` — scans as TIMESTAMP_NTZ and passes through
    untouched. Downstream epoch math must use
    ``functions.dates.epoch_seconds`` (NTZ-safe under the UTC-pinned
    session), never ``.cast("long")``.
    """
    ensure_oracle_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, not `/`: epoch-nanos (~1.7e18) overflows double mantissa
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def input_bytes_below(df: DataFrame, threshold: int) -> bool:
    """True iff ``df``'s file-source inputs are KNOWN to total under
    ``threshold`` bytes — the driver-side size signal behind conditional
    broadcast/spread decisions (r14). Conservative and O(1)-ish at
    scale: the stat loop bails False the moment the running total
    crosses the threshold, an input with more files than the threshold
    could even cover in 4 MB open-cost charges returns False without
    statting, and non-file/unknown sources return False (broadcast
    decisions must fail toward the shuffle plan, never toward an
    unbounded broadcast)."""
    try:
        files = df.inputFiles()
        if not files or len(files) * 4 * 1024 * 1024 >= threshold:
            return False
        total = 0
        for p in files:
            if not p.startswith("file:"):
                return False
            total += os.path.getsize(p.removeprefix("file:"))
            if total >= threshold:
                return False
        return True
    except Exception:  # noqa: BLE001 — unknown source
        return False


def spread_scan(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition a frame whose scan yields fewer partitions
    than the session's parallelism — the optimization-guide §2.5 "input
    skew" case: a single-row-group parquet file (or gzip) is ONE task no
    matter the split config, so every downstream per-row expression runs
    on one core while the rest of the cluster idles. The testdata files
    are all single-row-group, which serializes the map side of every
    scan at any ``local[N]``.

    No-op when the scan already has enough splits — the 100 TB case,
    where the inputs are thousands of row groups and adding a full-table
    round-robin exchange would be a pure extra shuffle. The knob is the
    observed plan partitioning vs ``defaultParallelism``, not a constant,
    so the same code is right on one core, local[32], and a cluster.

    Callers must be partition-layout-invariant: exact/commutative
    aggregates (decimal sums, counts, min/max), shuffle-keyed joins and
    groupBys — NOT per-partition-sketch operators (KLL, IVF k-means
    partials) whose output depends on which rows share a partition.

    Detection: total input-file bytes under ``target x openCostInBytes
    (4 MB)`` — below that the split packer cannot hand every core a
    meaty split, so the scan is parallelism-starved whatever the
    row-group layout. (The first implementation probed
    ``df.rdd.getNumPartitions()``, which compiles the plan to an RDD —
    measured ~0.4 s of pure driver overhead PER CALL; the file-size
    probe is a local stat of an already-listed file index.) Non-file
    and remote sources return unchanged — at cluster scale the inputs
    split on their own.
    """
    spark = df.sparkSession
    target = parts or spark.sparkContext.defaultParallelism
    threshold = target * 4 * 1024 * 1024
    try:
        files = df.inputFiles()
        # r14 (r13 verdict #8): O(1)-ish on the driver at scale. The split
        # packer charges every file openCostInBytes (4 MB) against the
        # 128 MB maxPartitionBytes bin, so >= target*32 files guarantee
        # >= target splits whatever their real sizes — obviously-large
        # inputs skip the stat loop entirely, and the loop below bails
        # the moment the running total crosses the threshold, so a
        # million-file table never stats a million paths.
        if len(files) >= target * 32:
            return df
        total = 0
        for p in files:
            if not p.startswith("file:"):
                return df
            total += os.path.getsize(p.removeprefix("file:"))
            if total >= threshold:
                return df
    except Exception:  # noqa: BLE001 — unknown source: leave untouched
        return df
    if not files:
        return df
    return df.repartition(target)


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present in ``sf_dir`` keyed by name.

    Routed through ``read_table`` so the events nanos→micros timestamp
    adaptation applies uniformly — SQL views over ``events`` expose a real
    TIMESTAMP, consistent with the scan contract and DuckDB semantics.
    """
    from ..schemas import TESTDATA_TABLES

    out: dict[str, DataFrame] = {}
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            out[t] = read_table(spark, sf_dir, t)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each testdata table as a temp view for ``spark.sql`` use."""
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
