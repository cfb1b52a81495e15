"""Round-7 neighborhood-function and matryoshka operators.

Gates pin oracle parity; these pin hand-checkable graph shapes and the
prefix-truncation contract.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from ups_crossref_etl_spark.operators.graph import hyper_anf, k_hop_reach
from ups_crossref_etl_spark.operators.similarity import (
    matryoshka_truncate,
    matryoshka_two_stage_topk,
)


def _chain(spark, n):
    return spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(n - 1)]
    )


def test_k_hop_reach_chain(spark):
    # path 0-1-2-3-4: within 2 hops, ends reach 2, node 1/3 reach 3+1?
    out = {r["node"]: r["n_reach"] for r in k_hop_reach(_chain(spark, 5), 2).collect()}
    assert out == {0: 2, 1: 3, 2: 4, 3: 3, 4: 2}


def test_k_hop_reach_one_hop_is_degree(spark):
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=0, dst=2), Row(src=1, dst=2)]
    )
    out = {r["node"]: r["n_reach"] for r in k_hop_reach(edges, 1).collect()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_hyper_anf_matches_exact_small(spark):
    # triangle + pendant: sparse-mode HLL is exact at these cardinalities
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=1, dst=2), Row(src=2, dst=0), Row(src=2, dst=3)]
    )
    exact = {r["node"]: r["n_reach"] for r in k_hop_reach(edges, 2).collect()}
    est = {r["node"]: r["est_reach"] for r in hyper_anf(edges, 2).collect()}
    assert set(est) == set(exact)
    for node, n_reach in exact.items():
        assert est[node] == n_reach + 1  # hyper_anf includes self


def test_matryoshka_truncate_unit_norm_and_zero_guard(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[3.0, 4.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 0.0, 5.0, 5.0]),  # zero prefix
        ]
    )
    out = {
        r["vec_id"]: r["prefix"]
        for r in matryoshka_truncate(df, "embedding", "vec_id", dim=2).collect()
    }
    assert out[1] == [0.6, 0.8]
    assert out[2] == [0.0, 0.0]  # zero-norm prefix passes through unscaled


def test_matryoshka_two_stage_contains_exact_top1(spark):
    # random gaussian vectors with a planted copy of the query at vec 7:
    # its PREFIX cosine is exactly 1, so the stage-1 pool must keep it
    # and the full-dim rerank must return it first
    import random

    rnd = random.Random(11)
    rows = []
    q = [rnd.gauss(0, 1) for _ in range(8)]
    for i in range(20):
        v = list(q) if i == 7 else [rnd.gauss(0, 1) for _ in range(8)]
        rows.append(Row(vec_id=i, embedding=v))
    df = spark.createDataFrame(rows)
    top = matryoshka_two_stage_topk(df, q, k=3, pool_frac=0.5, dim=4).collect()
    assert top[0]["vec_id"] == 7
    assert top[0]["cos_sim"] == pytest.approx(1.0, abs=1e-3)
