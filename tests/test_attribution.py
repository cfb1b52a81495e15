from __future__ import annotations

import datetime as dt

from ups_crossref_etl_spark.operators.attribution import (
    attribute_conversions,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [
            (u, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v)
            for u, t, s, v in rows
        ],
        "user_id long, event_type string, ts timestamp, value double",
    )


def test_attribution_hand_case(spark):
    rows = [
        # user 1: click@0, view@10, purchase@20 (both in window)
        (1, "click", 0, None),
        (1, "view", 10, None),
        (1, "purchase", 20, 100.0),
        # user 2: click far outside window, purchase unattributed
        (2, "click", 0, None),
        (2, "purchase", 999999, 50.0),
        # user 3: two clicks then purchase
        (3, "click", 0, None),
        (3, "click", 5, None),
        (3, "purchase", 6, 30.0),
    ]
    out = {
        (r["model"], r["touch_type"]): (r["n_conversions"], r["credited_value"])
        for r in attribute_conversions(
            _mk(spark, rows),
            "user_id",
            "event_type",
            "ts",
            "value",
            "purchase",
            ["click", "view"],
            100,
        ).collect()
    }
    # first touch: u1 -> click, u3 -> click
    assert out[("first_touch", "click")] == (2, 130.0)
    assert ("first_touch", "view") not in out
    # last touch: u1 -> view, u3 -> click
    assert out[("last_touch", "view")] == (1, 100.0)
    assert out[("last_touch", "click")] == (1, 30.0)
    # linear: u1 50/50 click/view; u3 all to click
    assert out[("linear", "click")] == (2, 80.0)
    assert out[("linear", "view")] == (1, 50.0)
    # user 2's purchase is unattributed everywhere
    total = sum(v for _n, v in out.values())
    assert total == 130.0 * 3


def test_attribution_strict_precedence(spark):
    # touch AT the conversion timestamp must not count
    rows = [
        (1, "click", 20, None),
        (1, "purchase", 20, 10.0),
        (2, "click", 19, None),
        (2, "purchase", 20, 10.0),
    ]
    out = {
        (r["model"], r["touch_type"]): r["n_conversions"]
        for r in attribute_conversions(
            _mk(spark, rows),
            "user_id",
            "event_type",
            "ts",
            "value",
            "purchase",
            ["click"],
            100,
        ).collect()
    }
    assert out[("first_touch", "click")] == 1
