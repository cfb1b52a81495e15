from .text import (  # noqa: F401
    norm_text_nfc,
    norm_text_nfkd_lower,
    author_full_name,
    strip_orcid_url,
    join_str_array,
)
from .doi import standardize_doi  # noqa: F401
from .dates import extract_year_any, extract_date_iso, DATE_PRIORITY  # noqa: F401
from .misc import (  # noqa: F401
    try_long,
    default_zero,
    classify_sede,
    now_str,
    params_json,
)
