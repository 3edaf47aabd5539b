"""Scalar/text function surface (SURVEY.md §2.7): normalization, similarity."""

from .normalize import (  # noqa: F401
    normalize_text,
    normalize_text_udf,
    norm_id_col,
    parse_year_col,
    sha1_id_col,
)
