"""Generate COVERAGE.md: the full query registry with oracle status and
one-line docs — the quick index a reviewer reads next to SURVEY.md §2."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ups_crossref_etl_spark.plans.registry import load_all  # noqa: E402


def main() -> None:
    specs = load_all()
    n_gated = sum(1 for s in specs.values() if s.gate)
    n_off = len(specs) - n_gated
    lines = [
        "# Query registry coverage",
        "",
        f"{len(specs)} registry queries. The {n_gated} driver-gated entries "
        "ALL carry DuckDB oracles (driver hash-compares — zero rows-only "
        f"rows in the gate). The other {n_off} are approximate/hash-seeded "
        "operational twins kept as bench/pytest surface (`gate=False`): "
        "each is quality-pinned by an oracle-checked `*_bound`/`*_exact` "
        "contract query listed below.",
        "",
        "| query | oracle | what it exercises |",
        "|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        status = "SQL" if s.oracle else "bench+pytest (gate=False)" if not s.gate else "rows-only"
        lines.append(f"| `{name}` | {status} | {s.doc} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "COVERAGE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote COVERAGE.md ({len(specs)} queries)")


if __name__ == "__main__":
    main()
