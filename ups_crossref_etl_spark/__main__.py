"""CLI — end-to-end run like the reference script.

    python -m ups_crossref_etl_spark --works works.jsonl --lake ./ups_lake
    python -m ups_crossref_etl_spark --works more.jsonl --lake ./ups_lake  # incremental
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(prog="ups_crossref_etl_spark")
    ap.add_argument("--works", required=True, help="JSON-lines works fixture path")
    ap.add_argument("--lake", default="./ups_lake", help="lake root directory")
    ap.add_argument("--catalog", default=None, help="institutional catalog CSV")
    ap.add_argument("--max-works", type=int, default=None, help="O2 cap on accepted works")
    args = ap.parse_args()

    from .engine import Engine

    eng = Engine()
    vista = eng.run(
        works_jsonl=args.works,
        catalog_csv=args.catalog,
        lake_root=args.lake,
        max_works=args.max_works,
    )
    print(f"vista_analisis: {vista.count()} works → {args.lake}")
    print("Publicaciones por Año:")
    for r in eng.publications_per_year().collect():
        print(f"  {r['Anio']}: {r['n']}")


if __name__ == "__main__":
    main()
