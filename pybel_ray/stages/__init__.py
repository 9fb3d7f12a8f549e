"""Ray Data stages: extraction, gating, parsing, dedup."""

from .extract import ExtractText, extract_text_from_html  # noqa: F401
from .gate import looks_like_bel  # noqa: F401
from .parse_stage import EVENTS_SCHEMA, ParseDocuments  # noqa: F401
from .dedup import dedup_exact, local_dedup_table  # noqa: F401
