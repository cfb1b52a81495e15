"""Timestamp-encoding drift regression: the event-time operator family
must produce IDENTICAL results whether events.parquet stores ts as

- micros, isAdjustedToUTC=false  → Spark scans TIMESTAMP_NTZ (current
  testdata encoding),
- micros, isAdjustedToUTC=true   → Spark scans TIMESTAMP (LTZ),
- nanos                          → Spark scans long under the
  ``nanosAsLong`` conf; ``sources/lake`` converts to micros.

Round 4 shipped against a silent nanos→micros regeneration and 7 queries
broke (3 analysis errors from ``.cast("long")`` on NTZ, 4 streaming
queries off by 1000x) — this test pins every event-time code path
(sessionize, as-of, range join, tumbling window, resample, streaming
tumbling) against all three encodings so the next drift fails here, not
in the driver gate.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ups_crossref_etl_spark.sources.lake import read_table

ENCODINGS = ("us_ntz", "us_utc", "ns")


@pytest.fixture(scope="module")
def encoded_dirs(spark, sf_dir, tmp_path_factory):
    """Three copies of the sf0.001 events table, one per encoding, each in
    its own dir shaped like a testdata sf dir."""
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    # normalize to naive micros as the base wall-clock column
    base = src.set_column(
        src.schema.get_field_index("ts"),
        "ts",
        src.column("ts").cast(pa.timestamp("us")),
    )
    dirs = {}
    for enc in ENCODINGS:
        d = tmp_path_factory.mktemp(f"events_{enc}")
        if enc == "us_ntz":
            t = base
        elif enc == "us_utc":
            t = base.set_column(
                base.schema.get_field_index("ts"),
                "ts",
                base.column("ts").cast(pa.timestamp("us", tz="UTC")),
            )
        else:  # ns — version 2.6 writer keeps nanos instead of coercing
            t = base.set_column(
                base.schema.get_field_index("ts"),
                "ts",
                base.column("ts").cast(pa.timestamp("ns")),
            )
        pq.write_table(t, os.path.join(d, "events.parquet"), version="2.6")
        dirs[enc] = str(d)
    return dirs


def _collect(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname",
    [
        "q_events_sessionize_30min",
        "q_events_asof_join",
        "q_events_range_join",
        "q_events_tumbling_5min",
        "q_events_resample_1h",
    ],
)
def test_batch_event_queries_encoding_invariant(spark, encoded_dirs, qname):
    from ups_crossref_etl_spark.plans.registry import load_all

    fn = load_all()[qname].fn
    results = {enc: _collect(fn(spark, d)) for enc, d in encoded_dirs.items()}
    assert results["us_ntz"], f"{qname} returned no rows — fixture too small"
    assert results["us_ntz"] == results["us_utc"] == results["ns"]


def test_read_table_yields_timestamp_for_all_encodings(spark, encoded_dirs):
    from pyspark.sql import types as T

    for enc, d in encoded_dirs.items():
        t = read_table(spark, d, "events").schema["ts"].dataType
        assert isinstance(t, (T.TimestampType, T.TimestampNTZType)), (enc, t)


def test_streaming_tumbling_encoding_invariant(spark, encoded_dirs):
    from ups_crossref_etl_spark.streaming.events import (
        run_to_memory,
        stream_events,
        tumbling_counts,
    )

    results = {}
    for enc, d in encoded_dirs.items():
        q = run_to_memory(
            tumbling_counts(stream_events(spark, d)), f"enc_{enc}", "complete"
        )
        try:
            results[enc] = _collect(spark.table(f"enc_{enc}"))
        finally:
            q.stop()
    assert results["us_ntz"], "streaming returned no rows"
    assert results["us_ntz"] == results["us_utc"] == results["ns"]
