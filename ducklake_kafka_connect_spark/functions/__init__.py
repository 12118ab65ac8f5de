from .timestamps import (  # noqa: F401
    ID_FIELD_SUFFIXES,
    is_id_like_field,
    is_iso_timestamp_str,
    parse_iso_timestamp_ms,
    iso_timestamp_matches,
    parse_iso_timestamp,
)
