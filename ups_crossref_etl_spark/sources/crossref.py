"""CrossRef works source (S1-S3) — Spark-first design.

The reference fetches ``/works`` pages driver-side in a loop with retry/
backoff/param-degradation (``get_with_retry``
``src/barrazueta_pipeline_etl_crossref.py:44-94``, loop :563-733). Here:

- ``read_works_fixtures``: the testable batch path — JSON lines with the
  declared ``works_raw_schema`` (schema-on-read → schema-declared).
- ``CrossRefCursorSource``: Spark 4 Python Data Source. Deep-paging
  cursors are inherently sequential, so one input partition streams pages
  (rows=500/page); within a cluster the parallelism comes from the
  downstream shuffle, not the scan. Source-side pushdown: the date-window
  and affiliation filters ride in the query params (P1/P3).
- ``FetchPolicy.fetch_with_retry``: the S2 resilience contract —
  exponential backoff honoring Retry-After, and progressive param
  degradation on HTTP 400 (drop select → drop sort → dates-only filter).
  Transport is injected so the policy is unit-testable offline.

No network call happens unless a live transport is passed explicitly.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..schemas import works_raw_schema

PageFetcher = Callable[[str, dict], tuple[int, dict, dict]]
"""(url, params) -> (status_code, headers, body_json)"""


def read_works_fixtures(spark: SparkSession, path: str) -> DataFrame:
    """Batch path: JSON-lines fixture of CrossRef-shaped items."""
    return spark.read.schema(works_raw_schema).json(path)


@dataclass
class FetchPolicy:
    """S2: retry/backoff/param-degradation (reference defaults :44)."""

    max_tries: int = 6
    backoff_start_s: float = 1.0
    backoff_cap_s: float = 30.0
    timeout_s: float = 60.0
    sleep: Callable[[float], None] = time.sleep
    attempts_log: list[dict] = field(default_factory=list)

    def degrade_params(self, params: dict, stage: int) -> dict:
        """Progressive degradation on 400: stage 1 drops ``select``,
        stage 2 drops ``sort``/``order``, stage 3 relaxes ``filter`` to
        the date window only (reference :57-68)."""
        p = dict(params)
        if stage >= 1:
            p.pop("select", None)
        if stage >= 2:
            p.pop("sort", None)
            p.pop("order", None)
        if stage >= 3 and "filter" in p:
            parts = [
                f
                for f in p["filter"].split(",")
                if f.startswith(("from-pub-date", "until-pub-date"))
            ]
            if parts:
                p["filter"] = ",".join(parts)
            else:
                p.pop("filter")
        return p

    def fetch_with_retry(self, fetch: PageFetcher, url: str, params: dict) -> dict:
        backoff = self.backoff_start_s
        stage = 0
        p = dict(params)
        last_err: Exception | None = None
        for attempt in range(self.max_tries):
            try:
                status, headers, body = fetch(url, p)
            except Exception as ex:  # noqa: BLE001 — transport error → retry
                last_err = ex
                self.attempts_log.append({"attempt": attempt, "error": str(ex)})
                self.sleep(backoff)
                backoff = min(backoff * 2, self.backoff_cap_s)
                continue
            self.attempts_log.append({"attempt": attempt, "status": status})
            if status == 200:
                return body
            if status == 400:
                stage += 1
                p = self.degrade_params(params, stage)
                continue
            if status == 429 or status >= 500:
                retry_after = headers.get("Retry-After")
                wait = float(retry_after) if retry_after else backoff
                self.sleep(min(wait, self.backoff_cap_s))
                backoff = min(backoff * 2, self.backoff_cap_s)
                continue
            raise RuntimeError(f"CrossRef fetch failed: HTTP {status}")
        raise RuntimeError(f"CrossRef fetch: retries exhausted ({last_err})")


def default_params(
    affiliation: str = "Universidad Politécnica Salesiana",
    from_date: str = "2022-01-01",
    until_date: str = "2025-11-30",
    rows: int = 500,
) -> dict:
    """P1/P3 source-side pushdown params (reference :375-384)."""
    return {
        "query.affiliation": affiliation,
        "filter": f"has-affiliation:true,from-pub-date:{from_date},until-pub-date:{until_date}",
        "rows": str(rows),
        "cursor": "*",
    }


def iterate_pages(
    fetch: PageFetcher,
    policy: FetchPolicy,
    params: dict,
    url: str = "https://api.crossref.org/works",
    max_works: int = 1_000_000,
    no_hits_limit: int = 15,
    accept: Callable[[dict], bool] | None = None,
    inter_page_sleep_s: float = 0.3,
) -> Iterator[tuple[str, list[dict]]]:
    """S1 cursor loop with O2/O3 termination: stop at ``max_works``
    accepted items or after ``no_hits_limit`` consecutive pages with zero
    accepted items. Yields (cursor, items) per page."""
    p = dict(params)
    seen = 0
    no_hits_streak = 0
    while True:
        body = policy.fetch_with_retry(fetch, url, p)
        msg = body.get("message", {})
        items = msg.get("items", [])
        if not items:
            return
        cursor = p.get("cursor", "*")
        yield cursor, items
        accepted = sum(1 for it in items if accept is None or accept(it))
        seen += accepted
        no_hits_streak = 0 if accepted else no_hits_streak + 1
        if seen >= max_works or no_hits_streak >= no_hits_limit:
            return
        nxt = msg.get("next-cursor")
        if not nxt or nxt == cursor:
            return
        p["cursor"] = nxt
        policy.sleep(inter_page_sleep_s)


def items_to_dataframe(spark: SparkSession, items: list[dict]) -> DataFrame:
    """S3: one page of API items → typed DataFrame (renaming the API's
    hyphenated keys to the fixture schema's snake_case)."""
    renames = {
        "DOI": "doi",
        "container-title": "container_title",
        "is-referenced-by-count": "is_referenced_by_count",
        "reference-count": "reference_count",
        "published-online": "published_online",
        "published-print": "published_print",
    }

    def fix_dates(v):
        if isinstance(v, dict) and "date-parts" in v:
            return {"date_parts": v["date-parts"]}
        return v

    normed = []
    for it in items:
        row = {renames.get(k, k): fix_dates(v) for k, v in it.items()}
        for dk in ("published_online", "published_print", "issued", "created"):
            row[dk] = fix_dates(row.get(dk))
        normed.append(row)
    rdd_like = [json.dumps(r) for r in normed]
    return spark.read.schema(works_raw_schema).json(
        spark.sparkContext.parallelize(rdd_like)
    )


# --------------------------------------------------------------------------
# Spark 4 Python Data Source (optional live adapter)
# --------------------------------------------------------------------------

try:  # pragma: no cover — API present in PySpark >= 4
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class CrossRefCursorSource(DataSource):
        """``spark.read.format(...).load()`` adapter. Usage:

        spark.dataSource.register(CrossRefCursorSource)
        spark.read.format("crossref").schema(works_raw_schema)
             .option("from_date", "2022-01-01").load()
        """

        @classmethod
        def name(cls) -> str:
            return "crossref"

        def schema(self):
            return works_raw_schema

        def reader(self, schema):
            return _CrossRefReader(self.options)

    class _CrossRefReader(DataSourceReader):
        def __init__(self, options):
            self.options = dict(options)

        def partitions(self):
            # deep-paging cursors are sequential → a single input split;
            # downstream stages re-partition after the scan.
            return [InputPartition(0)]

        def read(self, partition):
            """Runs in the Python worker. Transport is selected by option:
            ``fixture_path`` (a JSON file mapping cursor → HTTP body dict)
            replays canned pages through the SAME iterate_pages cursor loop
            the live path uses — the offline end-to-end test path; without
            it, a urllib transport hits the real API."""
            fixture_path = self.options.get("fixture_path")
            if fixture_path:
                with open(fixture_path) as fh:
                    pages = json.load(fh)

                def fetch(url, params):
                    return 200, {}, pages[params.get("cursor", "*")]

                policy = FetchPolicy(sleep=lambda s: None)
                sleep_s = 0.0
            else:  # pragma: no cover — needs network
                import urllib.parse
                import urllib.request

                def fetch(url, params):
                    full = url + "?" + urllib.parse.urlencode(params)
                    req = urllib.request.Request(
                        full, headers={"User-Agent": "ups-etl-spark"}
                    )
                    with urllib.request.urlopen(req, timeout=60) as r:
                        return r.status, dict(r.headers), json.loads(r.read())

                policy = FetchPolicy()
                sleep_s = 0.3
            params = default_params(
                affiliation=self.options.get(
                    "affiliation", "Universidad Politécnica Salesiana"
                ),
                from_date=self.options.get("from_date", "2022-01-01"),
                until_date=self.options.get("until_date", "2025-11-30"),
            )
            max_works = int(self.options.get("max_works", 1_000_000))
            for _cursor, items in iterate_pages(
                fetch, policy, params, max_works=max_works, inter_page_sleep_s=sleep_s
            ):
                for it in items:
                    yield _item_to_row(it)

    def _item_to_row(it: dict):
        def dp(v):
            if isinstance(v, dict):
                return (v.get("date-parts"),)
            return None

        authors = it.get("author") or []
        return (
            it.get("DOI"),
            it.get("title"),
            it.get("container-title"),
            it.get("publisher"),
            it.get("type"),
            it.get("is-referenced-by-count"),
            it.get("reference-count"),
            it.get("subject"),
            [
                (
                    a.get("given"),
                    a.get("family"),
                    a.get("name"),
                    a.get("ORCID"),
                    a.get("sequence"),
                    [(x.get("name"),) for x in (a.get("affiliation") or [])],
                )
                for a in authors
            ],
            dp(it.get("published-online")),
            dp(it.get("published-print")),
            dp(it.get("issued")),
            dp(it.get("created")),
        )

except ImportError:  # pragma: no cover
    CrossRefCursorSource = None  # type: ignore[assignment]
