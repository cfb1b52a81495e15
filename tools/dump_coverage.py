"""Generate COVERAGE.md: the full query registry with oracle status and
one-line docs — the quick index a reviewer reads next to SURVEY.md §2."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ups_crossref_etl_spark.plans.registry import load_all  # noqa: E402


def main() -> None:
    specs = load_all()
    lines = [
        "# Query registry coverage",
        "",
        f"{len(specs)} queries; "
        f"{sum(1 for s in specs.values() if s.oracle)} with DuckDB oracles "
        "(driver hash-compares), the rest rows-only (approximate/hash-seeded "
        "operators, pinned by pytest invariants instead).",
        "",
        "| query | oracle | what it exercises |",
        "|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        lines.append(f"| `{name}` | {'SQL' if s.oracle else 'rows-only'} | {s.doc} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote COVERAGE.md ({len(specs)} queries)")


if __name__ == "__main__":
    main()
