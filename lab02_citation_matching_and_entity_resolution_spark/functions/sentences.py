"""F9 sentence splitter — parity with the reference's legacy splitter
(ref: src/parse_util.py:952-972 ``legacy_split_sentences``).

The reference protects two things before splitting on sentence-final
punctuation + whitespace + capital:

  * single-capital initials ``X.`` followed by whitespace and a capital
    (``A. Smith``) — regex-protected,
  * a fixed lowercase abbreviation list — protected with plain
    case-sensitive ``str.replace`` (so ``E.g.`` is NOT protected, and the
    match is position-blind: both quirks are part of the parity contract,
    replicated deliberately).

Sentence-at-a-time Python is unavoidable here (backreference-driven
placeholder protection has no Catalyst equivalent), so the operator wraps it
in an Arrow-batched pandas UDF — batch transfer, no per-row Python in the
executor loop.  This is an optional doc-feature stage, never in the
pair-scoring hot path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# exact list and order from the reference (parse_util.py:953)
ABBREVIATIONS = [
    "e.g.", "i.e.", "etc.", "vs.", "fig.", "figs.", "sec.", "secs.",
    "eq.", "eqs.", "dr.", "mr.", "ms.", "prof.",
]

_INITIAL_RE = re.compile(r"\b[A-Z]\.(?=\s+[A-Z])")
_SPLIT_RE = re.compile(r"(?<=[.!?])\s+(?=(?:[A-Z]|__INIT\d+__))")


def split_sentences(text: str) -> list[str]:
    """Split ``text`` into sentences with the reference's exact semantics."""
    initials: list[str] = []

    def _protect(match: re.Match) -> str:
        initials.append(match.group(0))
        return f"__INIT{len(initials) - 1}__"

    tmp = _INITIAL_RE.sub(_protect, text)
    for i, abbr in enumerate(ABBREVIATIONS):
        tmp = tmp.replace(abbr, f"__ABBR{i}__")
    out: list[str] = []
    for part in _SPLIT_RE.split(tmp):
        for i, val in enumerate(initials):
            part = part.replace(f"__INIT{i}__", val)
        for i, abbr in enumerate(ABBREVIATIONS):
            part = part.replace(f"__ABBR{i}__", abbr)
        part = part.strip()
        if part:
            out.append(part)
    return out


def split_sentences_udf():
    """Arrow-batched pandas UDF returning array<string> of sentences."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _split(batch: pd.Series) -> pd.Series:
        return batch.map(lambda s: split_sentences(s) if s is not None else None)

    return _split


def explode_sentences(
    docs: DataFrame, text_col: str | Column = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sent_idx, sentence) — one row per sentence, index = in-document
    order (posexplode keeps the split order deterministic)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return docs.select(
        F.col(id_col),
        F.posexplode(split_sentences_udf()(col)).alias("sent_idx", "sentence"),
    )
