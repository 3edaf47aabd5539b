"""Source-format adapters (SURVEY.md §2.1 S1-S5, plus the S4 JSON-doc scan).

S1/S2  JSONL grouped/filtered scans: spark.read.json with explicit schema +
       PERMISSIVE bad-line handling (the reference silently skips bad lines,
       ref: src/match_utils.py:156-174 / :177-194).
S3     map-of-maps JSON scan: multiLine json -> double explode to a labeled
       pairs frame (ref: src/match_utils.py:197-213, manual_candidates.json).
S4     per-group JSON document scan: one {id: {...meta...}} JSON object per
       group directory -> wholetext scan + from_json(map<string,struct>) +
       explode, one row per inner entry (ref: src/parse_util.py:593-630,
       build_normalized_references).  Malformed/missing files drop the group
       silently, matching the reference's try/except-return-[].
S5     entry-stream adapter for @-delimited record formats (the reference's
       BibTeX reader streams .bib files entry-at-a-time with brace-depth
       tracking, ref: src/parse_util.py:62-93): wholetext read -> mapInPandas
       entry splitter -> one row per entry.  The parser is a fresh
       implementation of the record-splitting semantics (depth tracking,
       comment/@string skipping), not a port.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, group_key: str | None = None
) -> DataFrame:
    """S1/S2: schema-on-read JSONL scan that skips malformed lines."""
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    if group_key is not None:
        df = df.where(F.col(group_key).isNotNull() & (F.col(group_key) != ""))
    return df


def read_nested_label_map(spark: SparkSession, path: str) -> DataFrame:
    """S3: {group: {left_key: right_id}} JSON -> (group_id, left_key, right_id).

    multiLine JSON object whose keys are dynamic -> read as a single map
    column via from_json over wholetext, then explode twice.
    """
    raw = spark.read.option("wholetext", True).text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"), "map<string, map<string, string>>"
        ).alias("m")
    )
    return (
        parsed.select(F.explode("m").alias("group_id", "inner"))
        .select("group_id", F.explode("inner").alias("left_key", "right_id"))
    )


# S4: the inner meta shape of a per-group references.json document
# (ref: src/parse_util.py:601-613 reads paper_title / authors /
# submission_date from each entry; unknown extra keys are ignored, which
# from_json's permissive struct matching reproduces)
_REFERENCES_JSON_SCHEMA = (
    "map<string, struct<paper_title string, authors array<string>, "
    "submission_date string>>"
)


def read_references_json(spark: SparkSession, path_glob: str) -> DataFrame:
    """S4: per-group JSON doc scan — {ref_id: meta} dict files -> rows.

    One ``references.json`` per paper directory; the group id is the parent
    directory name (ref: src/parse_util.py:617 ``paper_dir.name``).  Output:
    (paper_id, ref_id, title, authors, year, arxiv), one row per dict entry,
    with the reference's scalar derivations done natively:

      * ``year``: first ``(19|20)\\d{2}`` word in submission_date
        (ref :581-585 _extract_year_from_date), '' when absent,
      * ``arxiv``: the entry key itself (ref :625).

    A file that fails to parse yields from_json NULL and the whole group is
    dropped — the reference's silent try/except-return-[] (:598-600).  Text
    normalization (authors_norm / title_tokens / note_norm) is deliberately
    NOT baked into the scan: it belongs to the F1-F5 normalizer operators,
    which callers compose downstream (one normalizer implementation, not two).

    Scale shape: wholetext scan is one row per file (files are small dicts);
    from_json + explode is map-only — no shuffle until the caller aggregates.
    """
    raw = spark.read.option("wholetext", True).text(path_glob).select(
        F.input_file_name().alias("_file"), "value"
    )
    parsed = raw.select(
        F.element_at(F.split(F.col("_file"), "/"), -2).alias("paper_id"),
        F.from_json(F.col("value"), _REFERENCES_JSON_SCHEMA).alias("m"),
    )
    return (
        parsed.where(F.col("m").isNotNull())
        .select("paper_id", F.explode("m").alias("ref_id", "meta"))
        .select(
            "paper_id",
            "ref_id",
            F.coalesce(F.col("meta.paper_title"), F.lit("")).alias("title"),
            F.coalesce(
                F.col("meta.authors"), F.array().cast("array<string>")
            ).alias("authors"),
            F.regexp_extract(
                F.coalesce(F.col("meta.submission_date"), F.lit("")),
                r"\b(19|20)\d{2}\b",
                0,
            ).alias("year"),
            F.col("ref_id").alias("arxiv"),
        )
    )


ENTRY_SCHEMA = StructType(
    [
        StructField("src_file", StringType(), False),
        StructField("entry_type", StringType(), True),
        StructField("entry_key", StringType(), True),
        StructField("body", StringType(), True),
    ]
)

_ENTRY_HEAD = re.compile(r"@(\w+)\s*\{\s*([^,\s}]*)", re.S)


def split_at_entries(text: str) -> list[tuple[str, str, str]]:
    """Split an @-record document into (type, key, body) with brace-depth
    tracking; comments (%) and @string/@comment records are skipped."""
    # drop %-comments outside entries (keep \% escapes)
    lines = [re.sub(r"(?<!\\)%.*", "", ln) for ln in text.splitlines()]
    src = "\n".join(lines)
    out: list[tuple[str, str, str]] = []
    i = 0
    n = len(src)
    while i < n:
        at = src.find("@", i)
        if at < 0:
            break
        brace = src.find("{", at)
        if brace < 0:
            break
        depth = 0
        j = brace
        while j < n:
            c = src[j]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        chunk = src[at : j + 1]
        m = _ENTRY_HEAD.match(chunk)
        if m:
            etype = m.group(1).lower()
            if etype not in ("string", "comment", "preamble"):
                out.append((etype, m.group(2), chunk))
        i = j + 1
    return out


def read_entry_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    """S5: one row per @-record across a directory of record files."""
    whole = spark.read.option("wholetext", True).text(path_glob).select(
        F.input_file_name().alias("src_file"), "value"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src_file, value in zip(pdf["src_file"], pdf["value"]):
                for etype, key, body in split_at_entries(value or ""):
                    rows.append((src_file, etype, key, body))
            yield pd.DataFrame(
                rows, columns=["src_file", "entry_type", "entry_key", "body"]
            )

    return whole.mapInPandas(parse, schema=ENTRY_SCHEMA)
