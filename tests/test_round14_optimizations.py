"""Round-14 optimization tests.

Pins the physical/behavioral contracts of the round-14 changes: the
spread_scan driver-cost short-circuit (r13 verdict #8) and the operator
internals this round touches.
"""

from __future__ import annotations

import os

import pytest

from ups_crossref_etl_spark.sources.lake import spread_scan


@pytest.fixture(scope="module")
def many_file_frame(spark, tmp_path_factory):
    """A 40-file parquet table of trivial rows (total bytes far below any
    spread threshold, file count far above the parts=1 count bound)."""
    p = str(tmp_path_factory.mktemp("many") / "t.parquet")
    spark.range(0, 400, 1, 40).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= 40
    return df


def test_spread_scan_many_files_skips_stat_loop(many_file_frame, monkeypatch):
    """>= target*32 files guarantee >= target splits from the packer's
    4 MB-per-file open charge, so spread_scan must return the frame
    unchanged WITHOUT statting a single path (at 100 TB the file list is
    millions of entries; the helper must stay O(1)-ish on the driver)."""
    calls = []
    real = os.path.getsize
    monkeypatch.setattr(
        os.path, "getsize", lambda p: calls.append(p) or real(p)
    )
    out = spread_scan(many_file_frame, parts=1)
    assert out is many_file_frame
    assert calls == []


def test_spread_scan_stat_loop_bails_at_threshold(many_file_frame, monkeypatch):
    """Below the count bound the stat loop must stop the moment the
    running byte total crosses target*4MB — not stat every file."""
    calls = []
    monkeypatch.setattr(
        os.path, "getsize", lambda p: calls.append(p) or 5 * 1024 * 1024
    )
    # parts=2: count bound 64 files (not hit at 40), byte threshold 8 MB —
    # crossed on the second fake 5 MB stat, so at most 2 of 40 paths stat.
    out = spread_scan(many_file_frame, parts=2)
    assert out is many_file_frame
    assert len(calls) == 2


def test_spread_scan_still_spreads_single_small_file(spark, tmp_path_factory):
    """The actual optimization is unchanged: one small file (one split,
    parallelism-starved scan) round-robins to the requested parts."""
    p = str(tmp_path_factory.mktemp("single") / "t.parquet")
    spark.range(0, 100, 1, 1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread_scan(df, parts=8)
    assert out is not df
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in plan or "Exchange" in plan
    assert out.count() == 100
