"""S1/S2/S3 — CrossRef source adapter, fully offline (injected transport).
Covers retry/backoff, Retry-After, progressive param degradation on 400,
the cursor loop with early-stop (O2/O3), page→DataFrame conversion, and
K10 run audit + catalog CSV (S4/K7)."""

from __future__ import annotations

import os
import tempfile

import pytest

from ups_crossref_etl_spark.sources import catalog as cat
from ups_crossref_etl_spark.sources.crossref import (
    FetchPolicy,
    default_params,
    items_to_dataframe,
    iterate_pages,
    read_works_fixtures,
)


def _policy():
    sleeps = []
    p = FetchPolicy(sleep=sleeps.append)
    return p, sleeps


def test_retry_backoff_on_500():
    p, sleeps = _policy()
    calls = []

    def fetch(url, params):
        calls.append(dict(params))
        if len(calls) < 3:
            return 500, {}, {}
        return 200, {}, {"message": {"items": [1]}}

    body = p.fetch_with_retry(fetch, "u", {"a": "1"})
    assert body["message"]["items"] == [1]
    assert sleeps == [1.0, 2.0]  # exponential from 1s


def test_retry_honors_retry_after():
    p, sleeps = _policy()
    state = {"n": 0}

    def fetch(url, params):
        state["n"] += 1
        if state["n"] == 1:
            return 429, {"Retry-After": "7"}, {}
        return 200, {}, {"message": {}}

    p.fetch_with_retry(fetch, "u", {})
    assert sleeps[0] == 7.0


def test_param_degradation_on_400():
    p, _ = _policy()
    seen = []

    def fetch(url, params):
        seen.append(dict(params))
        if "select" in params:
            return 400, {}, {}
        if "sort" in params:
            return 400, {}, {}
        return 200, {}, {"message": {}}

    params = {
        "select": "DOI",
        "sort": "published",
        "filter": "has-affiliation:true,from-pub-date:2022-01-01",
    }
    p.fetch_with_retry(fetch, "u", params)
    assert "select" not in seen[-1]
    assert "sort" not in seen[-1]
    # stage 3 (dates-only filter) only reached on a third 400
    p2, _ = _policy()
    deg3 = p2.degrade_params(params, 3)
    assert deg3["filter"] == "from-pub-date:2022-01-01"


def test_retries_exhausted_raises():
    p, _ = _policy()
    with pytest.raises(RuntimeError, match="retries exhausted|HTTP"):
        p.fetch_with_retry(lambda u, q: (500, {}, {}), "u", {})


def _page(items, nxt):
    return {"message": {"items": items, "next-cursor": nxt}}


def test_cursor_loop_and_early_stop():
    p, _ = _policy()
    pages = {
        "*": _page([{"DOI": "a"}], "c1"),
        "c1": _page([{"DOI": "b"}], "c2"),
        "c2": _page([{"DOI": "c"}], "c3"),
        "c3": _page([], None),
    }

    def fetch(url, params):
        return 200, {}, pages[params["cursor"]]

    got = list(iterate_pages(fetch, p, default_params(), accept=lambda it: True))
    assert [c for c, _ in got] == ["*", "c1", "c2"]

    # no-hits streak termination (O3)
    p2, _ = _policy()
    got2 = list(
        iterate_pages(fetch, p2, default_params(), accept=lambda it: False,
                      no_hits_limit=2)
    )
    assert len(got2) == 2  # stops after 2 consecutive zero-accept pages

    # max_works cap (O2)
    p3, _ = _policy()
    got3 = list(iterate_pages(fetch, p3, default_params(), max_works=1))
    assert len(got3) == 1


def test_items_to_dataframe_schema(spark):
    items = [
        {
            "DOI": "10.1/x",
            "title": ["T"],
            "container-title": ["J"],
            "publisher": "P",
            "type": "journal-article",
            "is-referenced-by-count": 3,
            "reference-count": 1,
            "author": [
                {
                    "given": "A",
                    "family": "B",
                    "ORCID": "https://orcid.org/0000-0001-0000-0001",
                    "sequence": "first",
                    "affiliation": [{"name": "Universidad Politécnica Salesiana"}],
                }
            ],
            "published-online": {"date-parts": [[2023, 5, 1]]},
        }
    ]
    df = items_to_dataframe(spark, items)
    r = df.first()
    assert r["doi"] == "10.1/x"
    assert r["container_title"] == ["J"]
    assert r["author"][0]["ORCID"].endswith("0000-0001-0000-0001")
    assert r["published_online"]["date_parts"] == [[2023, 5, 1]]


def test_works_fixture_roundtrip(spark):
    import json

    from ups_crossref_etl_spark.fixtures import make_works

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "works.jsonl")
        with open(path, "w") as f:
            for it in make_works()[:20]:
                f.write(json.dumps(it) + "\n")
        df = read_works_fixtures(spark, path)
        assert df.count() == 20
        assert "author" in df.columns


def test_catalog_csv_and_upsert(spark):
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "cat.csv")
        with open(path, "w") as f:
            f.write("SedeID,Sede,AreaAcademica,PalabrasClave\n")
            f.write("1,Sede Cuenca,CV,cuenca;azuay\n")
            f.write("5,Sede Nueva,Nueva Area,nueva\n")
        incoming = cat.read_catalog_csv(spark, path)
        assert incoming.count() == 2
        merged = cat.upsert_catalog(cat.seed_catalog(spark), incoming)
        rows = {r["SedeID"]: r["AreaAcademica"] for r in merged.collect()}
        assert rows[1] == "CV"  # incoming wins
        assert rows[4] == "No definida"  # untouched existing survives
        assert rows[5] == "Nueva Area"  # new row inserted


def test_runs_audit(spark):
    from ups_crossref_etl_spark.plans import runs as R

    start = R.start_run(spark, 1, {"rows": "500"}, cursor_inicio="*")
    done = R.finish_run(start, cursor_fin="c9", rows_ingested=42, notes="ok")
    log = start.unionByName(done)
    cur = R.current_runs(log).collect()
    assert len(cur) == 1
    assert cur[0]["RowsIngested"] == 42 and cur[0]["CursorFin"] == "c9"


def _api_item(doi: str, family: str, year: int = 2023) -> dict:
    """A CrossRef-API-shaped item (hyphenated keys, date-parts wrappers)."""
    return {
        "DOI": doi,
        "title": [f"Work {doi}"],
        "container-title": ["Journal of Tests"],
        "publisher": "Pub",
        "type": "journal-article",
        "is-referenced-by-count": 3,
        "reference-count": 10,
        "subject": ["Energy"],
        "author": [
            {
                "given": "Ana",
                "family": family,
                "ORCID": "https://orcid.org/0000-0001-2345-6789",
                "sequence": "first",
                "affiliation": [
                    {"name": "Universidad Politecnica Salesiana, Cuenca, Ecuador"}
                ],
            }
        ],
        "issued": {"date-parts": [[year, 5, 1]]},
        "created": {"date-parts": [[year, 5, 2]]},
    }


def test_datasource_end_to_end_offline(spark, tmp_path):
    """Drives CrossRefCursorSource ITSELF (spark.read.format("crossref"),
    the Spark adapter for the reference's main path, reference
    src/barrazueta_pipeline_etl_crossref.py:563-733) through a canned
    3-page cursor walk via the fixture_path offline transport — the read
    goes through DataSource.reader → partitions → read in a real Python
    worker, not just iterate_pages in-process."""
    import json as _json

    from ups_crossref_etl_spark.sources.crossref import CrossRefCursorSource

    pages = {
        "*": {
            "message": {
                "items": [_api_item("10.1/a", "Lopez"), _api_item("10.1/b", "Perez")],
                "next-cursor": "c1",
            }
        },
        "c1": {
            "message": {"items": [_api_item("10.1/c", "Sanchez")], "next-cursor": "c2"}
        },
        "c2": {"message": {"items": []}},
    }
    fp = tmp_path / "pages.json"
    fp.write_text(_json.dumps(pages))

    spark.dataSource.register(CrossRefCursorSource)
    df = spark.read.format("crossref").option("fixture_path", str(fp)).load()

    from ups_crossref_etl_spark.schemas import works_raw_schema

    assert df.schema == works_raw_schema
    rows = sorted(df.collect(), key=lambda r: r["doi"])
    assert [r["doi"] for r in rows] == ["10.1/a", "10.1/b", "10.1/c"]
    a = rows[0]["author"][0]
    assert a["family"] == "Lopez" and a["sequence"] == "first"
    assert a["affiliation"][0]["name"].startswith("Universidad Politecnica")
    assert rows[0]["issued"]["date_parts"] == [[2023, 5, 1]]

    # O2 cap pushed through the source option: stops mid-walk at 2 works.
    df2 = (
        spark.read.format("crossref")
        .option("fixture_path", str(fp))
        .option("max_works", "2")
        .load()
    )
    assert df2.count() == 2
