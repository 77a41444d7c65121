"""Ray Data pipeline stages."""

from .parse import parse_batch, FLAGSHIP_GROK, PARSE_FIELDS
from .enrich import Enrich, TOOL_TABLE, ROLE_TABLE
from .route import route_batch, SINK_NAMES
from .aggregate import count_by

__all__ = [
    "parse_batch", "FLAGSHIP_GROK", "PARSE_FIELDS",
    "Enrich", "TOOL_TABLE", "ROLE_TABLE",
    "route_batch", "SINK_NAMES", "count_by",
]
