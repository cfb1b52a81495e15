"""CLI — end-to-end runs.

Bibliometric ETL (the reference script's surface,
src/barrazueta_pipeline_etl_crossref.py:563-733):

    python -m ups_crossref_etl_spark etl --works works.jsonl --lake ./ups_lake
    python -m ups_crossref_etl_spark etl --works more.jsonl --lake ./ups_lake  # incremental

Training-corpus pipeline (extension layer):

    python -m ups_crossref_etl_spark corpus --docs documents.parquet --out ./clean \
        --dedup transitive --split --pack 2048

Bare flags (no subcommand) default to `etl` for backward compatibility.
"""

from __future__ import annotations

import argparse
import json
import sys


def _etl(args) -> None:
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


def _corpus(args) -> None:
    from pyspark.sql import functions as F

    from .operators import corpus as C
    from .operators import dedup as D
    from .operators import sampling as S
    from .session import get_spark

    spark = get_spark("corpus_cli")
    docs = spark.read.parquet(args.docs)

    cleaned = C.clean_corpus(docs)
    # clean_corpus returns the audit/features frame; semi-join the
    # surviving ids back to the source rows to keep the full columns
    kept = docs.join(
        cleaned.filter(F.col("drop_reason").isNull()).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    if args.dedup == "minhash":
        kept = D.minhash_dedup(kept, "text", "doc_id")
    elif args.dedup == "transitive":
        kept = D.minhash_dedup_transitive(kept, "text", "doc_id")

    if args.split:
        kept = S.split_assign(kept, "doc_id")
    if args.pack:
        from .operators import text_analysis as ta

        kept = kept.withColumn(
            "n_tok", ta.token_count(F.col("text")).cast("bigint")
        )
        kept = S.pack_sequences(kept, "n_tok", "doc_id", args.pack, "source")

    if args.shards:
        from .sources.sinks import write_training_shards

        write_training_shards(kept, args.out, "doc_id", num_shards=args.shards)
    else:
        writer = kept.write.mode("overwrite")
        if args.split:
            writer = writer.partitionBy("split")
        writer.parquet(args.out)

    out = spark.read.parquet(args.out)
    report = {
        "input_docs": docs.count(),
        "output_docs": out.count(),
        "dedup": args.dedup,
        "split": bool(args.split),
        "pack_budget": args.pack,
        "shards": args.shards,
    }
    print(json.dumps(report))


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # backward compat: bare flags mean the original etl invocation
    if argv and argv[0].startswith("-"):
        argv = ["etl", *argv]

    ap = argparse.ArgumentParser(prog="ups_crossref_etl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("etl", help="bibliometric ETL (reference parity)")
    etl.add_argument("--works", required=True, help="JSON-lines works fixture path")
    etl.add_argument("--lake", default="./ups_lake", help="lake root directory")
    etl.add_argument("--catalog", default=None, help="institutional catalog CSV")
    etl.add_argument(
        "--max-works", type=int, default=None, help="O2 cap on accepted works"
    )
    etl.set_defaults(fn=_etl)

    corpus = sub.add_parser("corpus", help="training-corpus cleaning pipeline")
    corpus.add_argument("--docs", required=True, help="documents parquet path")
    corpus.add_argument("--out", required=True, help="output parquet dir")
    corpus.add_argument(
        "--dedup",
        choices=["none", "minhash", "transitive"],
        default="none",
        help="near-dup removal after the exact-dedup/quality/lang gates",
    )
    corpus.add_argument(
        "--split", action="store_true", help="add train/val/test and partition by it"
    )
    corpus.add_argument(
        "--pack", type=int, default=None, help="token budget for sequence packing"
    )
    corpus.add_argument(
        "--shards",
        type=int,
        default=None,
        help="export as N deterministic hash-assigned training shards",
    )
    corpus.set_defaults(fn=_corpus)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
