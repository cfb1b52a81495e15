"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir and compares against its
``oracle_sql()`` in DuckDB: row count, column names, and order-insensitive
values (columns sorted by name, rows sorted, exact match after a small
float tolerance). Run me before every commit:

    python tools/check_queries.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ups_crossref_etl_spark.session import get_spark
from ups_crossref_etl_spark.schemas import TESTDATA_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def reject_unhashable(rows: list[tuple], cols: list[str], side: str) -> None:
    """Replicate the driver's canonicalizer constraint: it loads results
    into pandas and ``sort_values`` over every column, which raises
    ``TypeError: unhashable type: 'list'`` on array/map-typed cells. The
    r3 gate scored two such queries ``err`` while this replica passed
    them — so reject them here, BEFORE the driver can. Serialize arrays
    (array_join / to_json on both engines) instead of returning them."""
    for r in rows:
        for v, c in zip(r, cols):
            if isinstance(v, (list, tuple, set, dict)) or type(v).__name__ == "ndarray":
                raise TypeError(
                    f"unhashable type in {side} column {c!r} (value {v!r:.60}): "
                    "the driver's pandas canonicalizer cannot hash "
                    "array/map cells — serialize with array_join/to_json "
                    "on both engines"
                )


def normalize(rows: list[tuple], cols: list[str]):
    """Sort columns by name, normalize cell values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        if isinstance(v, bool):
            return int(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(("" if x is None else str(x)) for x in r))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="restrict to these query names")
    ap.add_argument("--json", dest="json_out", metavar="PATH", default=None)
    args = ap.parse_args()
    json_out = args.json_out
    sf_dir = args.sf_dir
    only = set(args.names)

    from ups_crossref_etl_spark.sources.lake import assert_testdata_shape

    assert_testdata_shape(sf_dir)  # fail fast on testdata encoding drift

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    spark = get_spark("check_queries")
    con = duck_con(sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            results[name] = {"status": "fail", "err": f"spark: {ex}"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            results[name] = {"status": "rows_only", "spark_rows": len(srows)}
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            results[name] = {"status": "fail", "err": f"duckdb: {ex}"}
            n_fail += 1
            continue
        problems = []
        try:
            reject_unhashable(srows, scols, "spark")
            reject_unhashable(drows, dcols, "oracle")
        except TypeError as ex:
            problems.append(str(ex))
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            ns, nd = normalize(srows, scols), normalize(drows, dcols)
            mism = [(a, b) for a, b in zip(ns, nd) if a != b]
            if mism:
                problems.append(f"{len(mism)} row mismatches; first: {mism[0]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            results[name] = {"status": "fail", "err": "; ".join(problems)[:500]}
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            results[name] = {
                "status": "pass",
                "spark_rows": len(srows),
                "secs": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_rows_only": n_rowsonly,
                    "n_fail": n_fail,
                    "queries": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
