"""F3 ``standardize_doi`` (reference :115-122) — fully native Column expr.

trim → HTML-unescape (&amp; etc.) → strip ``https?://(dx.)?doi.org/`` or
``doi:`` prefix, case-insensitively → lower. Null/empty → null.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREFIX = r"(?i)^(https?://(dx\.)?doi\.org/|doi:\s*)"
# The common HTML entities CrossRef DOIs actually carry; full unescape is
# only needed for free text (F1/F2), not the DOI charset.
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")]


def standardize_doi(col: Column) -> Column:
    c = F.trim(col)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.lower(F.trim(F.regexp_replace(c, _PREFIX, "")))
    return F.nullif(c, F.lit(""))
