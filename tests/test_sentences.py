"""F9 sentence-splitter goldens — parity with the reference's
legacy_split_sentences (ref: src/parse_util.py:952-972), including its
case-sensitive, position-blind abbreviation protection quirks."""

import pytest

from lab02_citation_matching_and_entity_resolution_spark.functions.sentences import (
    explode_sentences,
    split_sentences,
)

GOLDENS = [
    # abbreviation protection: "e.g." must not split
    (
        "We see e.g. the result. Next sentence follows.",
        ["We see e.g. the result.", "Next sentence follows."],
    ),
    # initials "A." / "B." protected; real boundary still splits
    (
        "A. Smith and B. Jones wrote it. They were right.",
        ["A. Smith and B. Jones wrote it.", "They were right."],
    ),
    # QUIRK: the list holds lowercase "fig." only — capital "Fig." is NOT
    # protected, but "3" is not a capital so no split happens anyway
    (
        "See Fig. 3 for details. The curve rises.",
        ["See Fig. 3 for details.", "The curve rises."],
    ),
    # protected "vs." swallows what would otherwise be a boundary
    (
        "It works vs. Baseline results improve.",
        ["It works vs. Baseline results improve."],
    ),
    ("Is it right? Yes! Done.", ["Is it right?", "Yes!", "Done."]),
    # lowercase continuation: no split without a capital
    ("end of one. next starts lowercase", ["end of one. next starts lowercase"]),
    # QUIRK: plain str.replace protection is position-blind (mid-word match)
    ("strange.e.g.case", ["strange.e.g.case"]),
    # initial followed by lowercase is not protected AND not a boundary
    ("He cited A. b lowercase.", ["He cited A. b lowercase."]),
    ("", []),
    ("   ", []),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_split_sentences_goldens(text, expected):
    assert split_sentences(text) == expected


def test_explode_sentences_operator(spark):
    docs = spark.createDataFrame(
        [(1, "First point. Second point."), (2, None)],
        "doc_id long, text string",
    )
    rows = explode_sentences(docs).collect()
    got = sorted((r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows)
    assert got == [(1, 0, "First point."), (1, 1, "Second point.")]


def test_explode_sentences_is_arrow_batched(spark):
    docs = spark.createDataFrame([(1, "A. B sentence.")], "doc_id long, text string")
    df = explode_sentences(docs)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
