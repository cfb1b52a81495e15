"""Sequential oracle for the bibliometric pipeline.

An independent, deliberately-naive reimplementation of the reference
semantics (SURVEY.md §2/§3/§7.4 spec — insert-or-ignore, probe-then-upsert
entity resolution, last-writer-wins keyword labeling, first-match country
tagging, sorted-set flat view), processed item-by-item in the order given.
Feed it items in the same canonical order the engine's deterministic
tie-breaks encode and the outputs must match exactly (minus surrogate ids).

The nan-keyword bug (§7.4.3) is NOT implemented, matching the engine's
documented decision.
"""

from __future__ import annotations

import html
import re
import unicodedata

from ups_crossref_etl_spark.plans.ingest import COUNTRY_PATTERNS, UPS_TARGET


def norm_nfc(s):
    if s is None:
        return ""
    s = unicodedata.normalize("NFC", html.unescape(s))
    return re.sub(r"\s+", " ", s).strip()


def norm_search(s):
    if s is None:
        return ""
    s = unicodedata.normalize("NFKD", html.unescape(s))
    s = "".join(ch for ch in s if not unicodedata.combining(ch))
    return re.sub(r"\s+", " ", s).strip().lower()


def std_doi(s):
    if s is None:
        return None
    s = html.unescape(s.strip())
    s = re.sub(r"(?i)^(https?://(dx\.)?doi\.org/|doi:\s*)", "", s).strip().lower()
    return s or None


DATE_KEYS = ("published_online", "published_print", "issued", "created")


def _ymd(item, key):
    v = item.get(key)
    if not v:
        return None
    parts = v.get("date_parts")
    if not parts or not parts[0]:
        return None
    row = parts[0]
    y = row[0] if len(row) > 0 else None
    if y is None or not (1600 <= y <= 2100):
        return None
    m = row[1] if len(row) > 1 else None
    d = row[2] if len(row) > 2 else None
    return y, m, d


def year_any(item):
    for k in DATE_KEYS:
        r = _ymd(item, k)
        if r:
            return r[0]
    return None


def date_iso(item):
    for k in DATE_KEYS:
        r = _ymd(item, k)
        if r:
            y, m, d = r
            return f"{y:04d}-{(m or 1):02d}-{(d or 1):02d}"
    return None


def author_name(a):
    g, f = a.get("given") or "", a.get("family") or ""
    joined = f"{g} {f}".strip() if (g or f) else ""
    joined = " ".join(joined.split())
    if joined:
        return joined
    return (a.get("name") or "").strip() or None


def strip_orcid(o):
    if not o:
        return None
    return re.sub(r"^https?://orcid\.org/", "", o.strip()) or None


def guess_country(s_norm):
    for cc, name, pat in COUNTRY_PATTERNS:
        if re.search(rf"\b({pat})\b", s_norm):
            return cc, name
    return None, None


def classify_sede(aff_norm):
    for kw, sid in (("cuenca", 1), ("quito", 2), ("guayaquil", 3)):
        if kw in aff_norm:
            return sid
    return 4


def run_oracle(items: list[dict], catalog_rows: list[tuple]) -> dict:
    """catalog_rows: (SedeID, Sede, AreaAcademica, PalabrasClave)."""
    target = norm_search(UPS_TARGET)
    seen = set()
    obras = {}
    obra_tema = set()
    autores = []  # rows: dict NombreBusqueda/NombreLimpio/Orcid
    by_orcid: dict[str, dict] = {}
    by_name: dict[str, dict] = {}
    afilis: dict[str, dict] = {}
    oaa = set()  # (doi, NombreBusqueda, AfiliacionBusqueda, seq)

    for it in items:
        doi = std_doi(it.get("doi"))
        if doi is None or doi in seen:
            continue
        seen.add(doi)

        work_has_ups = False
        temp: dict[str, dict] = {}  # author NombreBusqueda → {affs, seq}
        for a in it.get("author") or []:
            raw = author_name(a)
            nl = norm_nfc(raw)
            ns = norm_search(raw)
            if ns == "":
                continue
            orcid = strip_orcid(a.get("ORCID"))
            seq = a.get("sequence") or "additional"
            aff_ids = []
            for aff in a.get("affiliation") or []:
                lit = norm_nfc(aff.get("name"))
                srch = norm_search(aff.get("name"))
                if srch == "":
                    continue
                is_ups = target in srch
                work_has_ups = work_has_ups or is_ups
                sede = classify_sede(srch) if is_ups else None
                if srch in afilis:
                    row = afilis[srch]
                    if row["SedeID"] is None and sede is not None:
                        row["SedeID"] = sede  # K5 COALESCE
                else:
                    row = {
                        "CadenaLiteral": lit,
                        "AfiliacionBusqueda": srch,
                        "SedeID": sede,
                        "CountryCode": None,
                        "CountryName": None,
                        "EsUPS": 0,
                    }
                    afilis[srch] = row
                cc, cn = guess_country(srch)
                if cc is None and is_ups:
                    cc, cn = "EC", "Ecuador"
                # K6 monotone
                if is_ups:
                    row["EsUPS"] = 1
                if row["CountryCode"] is None and cc is not None:
                    row["CountryCode"] = cc
                    row["CountryName"] = cn
                aff_ids.append(srch)

            if not aff_ids:
                continue  # affiliationless authors never reach the bridge

            # J6/K4 probe: orcid → name (backfill) → insert
            arow = None
            if orcid and orcid in by_orcid:
                arow = by_orcid[orcid]
            elif ns in by_name:
                arow = by_name[ns]
                if arow["Orcid"] is None and orcid:
                    arow["Orcid"] = orcid
                    by_orcid[orcid] = arow
            else:
                arow = {"NombreBusqueda": ns, "NombreLimpio": nl, "Orcid": orcid}
                autores.append(arow)
                by_name[ns] = arow
                if orcid:
                    by_orcid[orcid] = arow
            key = arow["NombreBusqueda"]
            t = temp.setdefault(key, {"affs": set(), "seq": "additional"})
            t["affs"].update(aff_ids)
            if seq == "first":
                t["seq"] = "first"

        if not work_has_ups:
            continue  # P7 gate

        obras[doi] = {
            "DOI": doi,
            "Titulo": norm_nfc("; ".join(it.get("title") or [])),
            "Anio": year_any(it),
            "Revista": norm_nfc("; ".join(it.get("container_title") or [])),
            "Editorial": norm_nfc(it.get("publisher")),
            "Tipo": it.get("type"),
            "Citas": it.get("is_referenced_by_count") or 0,
            "Referencias": it.get("reference_count") or 0,
            "FechaPublicacion": date_iso(it),
        }
        for s in it.get("subject") or []:
            t = norm_nfc(s)
            if t:
                obra_tema.add((doi, t))
        for key, t in temp.items():
            for srch in t["affs"]:
                oaa.add((doi, key, srch, t["seq"]))

    # EP2: catalog integration — default 4, then keyword last-writer-wins
    for row in afilis.values():
        if row["SedeID"] is None:
            row["SedeID"] = 4
    for sid, _sede, _area, kws in sorted(catalog_rows, key=lambda r: r[0]):
        for kw in (kws or "").split(";"):
            kw = kw.strip().lower()
            if not kw:
                continue  # no nan-bug replication
            for row in afilis.values():
                if kw in row["AfiliacionBusqueda"]:
                    row["SedeID"] = sid

    # EP3: flat view
    sedes_map = {r[0]: (r[1], r[2]) for r in catalog_rows}
    autores_by_key = {a["NombreBusqueda"]: a for a in autores}
    vista = []
    oaa_by_doi: dict[str, list] = {}
    for doi, akey, srch, seq in oaa:
        oaa_by_doi.setdefault(doi, []).append((akey, srch, seq))
    for doi, ob in obras.items():
        names, lits, seds, areas, paises, ccs = set(), set(), set(), set(), set(), set()
        flag = None
        for akey, srch, _seq in oaa_by_doi.get(doi, []):
            names.add(autores_by_key[akey]["NombreLimpio"])
            arow = afilis[srch]
            lits.add(arow["CadenaLiteral"])
            sede_name, area = sedes_map.get(arow["SedeID"], (None, None))
            if sede_name:
                seds.add(sede_name)
            if area:
                areas.add(area)
            if arow["CountryName"]:
                paises.add(arow["CountryName"])
            if arow["CountryCode"]:
                ccs.add(arow["CountryCode"])
            flag = max(flag or 0, arow["EsUPS"]) if arow["EsUPS"] is not None else flag
        temas = sorted({t for d, t in obra_tema if d == doi})
        vista.append(
            {
                **ob,
                "Autores": "; ".join(sorted(names)),
                "Afiliaciones": "; ".join(sorted(lits)),
                "Sedes": "; ".join(sorted(seds)),
                "Areas": "; ".join(sorted(areas)),
                "Paises": "; ".join(sorted(paises)),
                "PaisesCodigo": "; ".join(sorted(ccs)),
                "UPS_Flag": flag,
                "Temas": "; ".join(temas),
            }
        )

    return {
        "obras": list(obras.values()),
        "obra_tema": sorted(obra_tema),
        "autores": autores,
        "afiliaciones": list(afilis.values()),
        "oaa": sorted(oaa),
        "vista": vista,
    }
