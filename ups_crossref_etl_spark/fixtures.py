"""Deterministic CrossRef-shaped fixture (FIXTURES.md §1 edge cases).

Lives in the package (not tests/) because the driver-facing bibliometric
queries in ``plans/bibliometric_queries.py`` run the full pipeline over
this fixture — the sf_dir tables don't carry the bibliometric domain."""

from __future__ import annotations

import random

UPS = "Universidad Politécnica Salesiana"


def _dp(*ymd):
    return {"date_parts": [list(ymd)]} if ymd else None


def _author(given=None, family=None, name=None, orcid=None, seq=None, affs=()):
    return {
        "given": given,
        "family": family,
        "name": name,
        "ORCID": orcid,
        "sequence": seq,
        "affiliation": [{"name": a} for a in affs],
    }


def make_works() -> list[dict]:
    """~40 hand-built edge-case works + ~160 generated bulk works."""
    w = []

    # --- DOI form variants (same DOI, dedup path), UPS Cuenca
    for i, doi in enumerate(
        [
            "10.5555/dup.1",
            "https://doi.org/10.5555/DUP.1",
            "https://dx.doi.org/10.5555/dup.1",
            "doi: 10.5555/Dup.1",
        ]
    ):
        w.append(
            {
                "doi": doi,
                "title": [f"Duplicate work v{i}"],
                "container_title": ["Rev A"],
                "publisher": "Pub A",
                "type": "journal-article",
                "is_referenced_by_count": i,
                "reference_count": 2,
                "subject": ["Dedup"],
                "author": [
                    _author("Ana", "Loja", orcid=None, seq="first",
                            affs=[f"{UPS}, Cuenca, Ecuador"])
                ],
                "published_online": _dp(2022, 3, 4),
                "published_print": None,
                "issued": None,
                "created": _dp(2021),
            }
        )

    # --- HTML entities + whitespace in title/journal; multi-element arrays
    w.append(
        {
            "doi": "10.5555/ent.1",
            "title": ["P&amp;G   study", "Second   part"],
            "container_title": ["Revista de Investigaci&#243;n"],
            "publisher": "Editorial  X",
            "type": "proceedings-article",
            "is_referenced_by_count": None,  # → 0
            "reference_count": None,
            "subject": None,
            "author": [
                _author("José", "García", orcid="https://orcid.org/0000-0002-1825-0097",
                        seq="first", affs=[f"{UPS}, Quito, Ecuador"]),
                # same person de-accented, no ORCID → collides after NFKD
                _author("Jose", "Garcia", seq="additional",
                        affs=[f"{UPS}, Quito, Ecuador", "Universidad de Granada, Spain"]),
            ],
            "published_online": None,
            "published_print": _dp(2023, 7),
            "issued": _dp(2022),
            "created": _dp(2020, 1, 1),
        }
    )

    # --- ORCID backfill: name first without ORCID, later with
    w.append(
        {
            "doi": "10.5555/orc.1",
            "title": ["Backfill one"],
            "container_title": ["Rev B"],
            "publisher": "Pub B",
            "type": "journal-article",
            "is_referenced_by_count": 5,
            "reference_count": 1,
            "subject": ["Energy", "Energy", "  Grid  "],
            "author": [
                _author("Luis", "Pérez", seq="first", affs=[f"{UPS}, Guayaquil, Ecuador"]),
            ],
            "published_online": _dp(2022, 5),
            "published_print": None,
            "issued": None,
            "created": None,
        }
    )
    w.append(
        {
            "doi": "10.5555/orc.2",
            "title": ["Backfill two"],
            "container_title": ["Rev B"],
            "publisher": "Pub B",
            "type": "journal-article",
            "is_referenced_by_count": 3,
            "reference_count": 0,
            "subject": None,
            "author": [
                _author("Luis", "Pérez", orcid="0000-0001-0000-0001", seq="first",
                        affs=[f"{UPS} sede Guayaquil"]),
                # ORCID-first identity: same ORCID, different spelling
                _author("L.", "Perez Jr", orcid="0000-0001-0000-0001", seq="additional",
                        affs=["Universidad de Cuenca, Ecuador"]),
            ],
            "published_online": None,
            "published_print": None,
            "issued": _dp(2024, 11, 30),
            "created": None,
        }
    )

    # --- literal-name-only author; empty-name author (dropped);
    #     affiliationless author (dropped from bridge)
    w.append(
        {
            "doi": "10.5555/name.1",
            "title": ["Name fallbacks"],
            "container_title": [],
            "publisher": None,
            "type": "book-chapter",
            "is_referenced_by_count": 0,
            "reference_count": 9,
            "subject": ["Sociology"],
            "author": [
                _author(name="Grupo GIETI", seq="first", affs=[f"{UPS} - Cuenca"]),
                _author("", "", name="  ", affs=[f"{UPS}"]),  # empty → dropped
                _author("Solo", "SinAfiliacion", seq="additional", affs=[]),  # no affs
            ],
            "published_online": None,
            "published_print": None,
            "issued": None,
            "created": _dp(2025, 2),
        }
    )

    # --- sequence promotion: 'first' on a later occurrence of same author
    w.append(
        {
            "doi": "10.5555/seq.1",
            "title": ["Sequence promo"],
            "container_title": ["Rev C"],
            "publisher": "Pub C",
            "type": "journal-article",
            "is_referenced_by_count": 1,
            "reference_count": 1,
            "subject": None,
            "author": [
                _author("Rosa", "Vega", seq="additional", affs=[f"{UPS}, Quito"]),
                _author("Rosa", "Vega", seq="first", affs=["Politecnico di Milano, Italy"]),
            ],
            "published_online": _dp(2023, 1, 15),
            "published_print": None,
            "issued": None,
            "created": None,
        }
    )

    # --- country patterns: two-pattern match (ecuador wins over spain by
    #     priority), "nan"-containing affiliation (Nanjing), UPS w/o city
    w.append(
        {
            "doi": "10.5555/geo.1",
            "title": ["Geo edge"],
            "container_title": ["Rev D"],
            "publisher": "Pub D",
            "type": "journal-article",
            "is_referenced_by_count": 7,
            "reference_count": 3,
            "subject": ["Geo"],
            "author": [
                _author("Mei", "Chen", seq="first",
                        affs=["Nanjing University, China", f"{UPS}"]),
                _author("Paz", "Díaz", seq="additional",
                        affs=["Instituto Ecuador-España de Madrid, Spain"]),
            ],
            "published_online": None,
            "published_print": None,
            "issued": _dp(1234),  # invalid year → fall through to created
            "created": _dp(2024, 6, 6),
        }
    )

    # --- non-UPS work (gate must drop it)
    w.append(
        {
            "doi": "10.5555/noups.1",
            "title": ["No UPS here"],
            "container_title": ["Rev E"],
            "publisher": "Pub E",
            "type": "journal-article",
            "is_referenced_by_count": 99,
            "reference_count": 9,
            "subject": ["Physics"],
            "author": [
                _author("Jean", "Valjean", seq="first",
                        affs=["Université de Paris, France"]),
            ],
            "published_online": _dp(2023, 3),
            "published_print": None,
            "issued": None,
            "created": None,
        }
    )

    # --- no DOI (dropped), no valid date (Anio null)
    w.append(
        {
            "doi": None,
            "title": ["No DOI"],
            "container_title": ["Rev F"],
            "publisher": "Pub F",
            "type": "journal-article",
            "is_referenced_by_count": 0,
            "reference_count": 0,
            "subject": None,
            "author": [_author("Ana", "Loja", seq="first", affs=[f"{UPS}, Cuenca"])],
            "published_online": _dp(2022),
            "published_print": None,
            "issued": None,
            "created": None,
        }
    )
    w.append(
        {
            "doi": "10.5555/nodate.1",
            "title": ["No date"],
            "container_title": ["Rev F"],
            "publisher": "Pub F",
            "type": "journal-article",
            "is_referenced_by_count": 2,
            "reference_count": 2,
            "subject": None,
            "author": [_author("Ana", "Loja", seq="first", affs=[f"{UPS}, Cuenca, Ecuador"])],
            "published_online": None,
            "published_print": None,
            "issued": None,
            "created": None,
        }
    )

    # --- bulk generated works (seeded): mix of UPS/non-UPS, countries,
    #     shared authors/affiliations across works
    rng = random.Random(42)
    first_names = ["Ana", "Luis", "José", "María", "Pedro", "Lucía", "Jorge", "Elena"]
    last_names = ["Loja", "Pérez", "García", "Calle", "Torres", "Zhu", "Rossi", "Silva"]
    ups_affs = [
        f"{UPS}, Cuenca, Ecuador",
        f"{UPS}, Quito, Ecuador",
        f"{UPS}, Guayaquil, Ecuador",
        f"{UPS}",
        f"Grupo GIHP4C, {UPS}, Cuenca, Ecuador",
    ]
    other_affs = [
        "Universidad de Granada, Spain",
        "Universidad Nacional de Colombia, Colombia",
        "Politecnico di Milano, Italy",
        "Tsinghua University, China",
        "Universidad de Cuenca, Ecuador",
        "MIT, USA",
        "Pontificia Universidad Católica del Perú, Peru",
        "Universidade de São Paulo, Brazil",
    ]
    journals = ["Energies", "Sustainability", "IEEE Access", "Revista Ciencia"]
    publishers = ["MDPI", "IEEE", "Elsevier", "Springer"]
    types = ["journal-article", "proceedings-article", "book-chapter"]
    subjects = ["Energy", "Control", "IoT", "Education", "Health", None]

    for i in range(160):
        has_ups = rng.random() < 0.55
        n_auth = rng.randint(1, 4)
        authors = []
        for j in range(n_auth):
            fn = rng.choice(first_names)
            ln = rng.choice(last_names)
            affs = []
            if has_ups and j == 0:
                affs.append(rng.choice(ups_affs))
            if rng.random() < 0.6:
                affs.append(rng.choice(other_affs))
            if not affs:
                affs.append(rng.choice(other_affs))
            orcid = (
                f"0000-000{rng.randint(1, 9)}-{rng.randint(1000, 9999)}-000{j}"
                if rng.random() < 0.3
                else None
            )
            authors.append(
                _author(fn, ln, orcid=orcid, seq="first" if j == 0 else "additional",
                        affs=affs)
            )
        y = rng.choice([2022, 2023, 2024, 2025])
        m = rng.randint(1, 12)
        subj = rng.choice(subjects)
        w.append(
            {
                "doi": f"10.5555/bulk.{i}",
                "title": [f"Bulk work {i}"],
                "container_title": [rng.choice(journals)],
                "publisher": rng.choice(publishers),
                "type": rng.choice(types),
                "is_referenced_by_count": rng.randint(0, 50),
                "reference_count": rng.randint(0, 40),
                "subject": [subj] if subj else None,
                "author": authors,
                "published_online": _dp(y, m) if rng.random() < 0.7 else None,
                "published_print": None,
                "issued": _dp(y) if rng.random() < 0.5 else None,
                "created": _dp(y - 1, 12, 31),
            }
        )
    return w
