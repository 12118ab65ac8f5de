"""Text-analysis operators for training-data pipelines (beyond-parity).

All hot-path expressions are built-in Catalyst functions (split /
filter / size / lower) — whole-stage-codegen'd, no Python in the loop.
Each has an exact ANSI-SQL oracle twin registered in ``plans/queries.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny function-word lists per language for the n-gram-free language-ID
# heuristic and stopword-ratio quality signal.
EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of trimmed, lower-cased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


def stopword_ratio_col(text: Column, stopwords: Sequence[str] = EN_STOPWORDS) -> Column:
    toks = tokens_col(text)
    matches = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    return F.round(matches.cast("double") / F.size(toks), 6)


def marker_hits_col(text: Column, markers: Sequence[str]) -> Column:
    """How many tokens are in the marker set (language-ID signal)."""
    return F.size(F.filter(tokens_col(text), lambda w: w.isin(*markers)))
