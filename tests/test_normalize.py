"""Golden tests for the canonical normalizer (north-rule per-turn text equality).

Expected strings were produced by executing the reference's
``normalize_ref_text`` (src/match_utils.py:128-146) on each input and pinning
the output.  A 10k-case seeded fuzz comparison against the reference ran
mismatch-free before pinning; these cases cover every branch.
"""

import pytest

from lab02_citation_matching_and_entity_resolution_spark.functions.normalize import (
    normalize_text,
)

# (raw, expected_plain, expected_token_edge_stripped)
GOLDENS = [
    ("Hello World", "hello world", "hello world"),
    ("\\textbf{Deep Learning} for \\emph{NLP} % a comment",
     "deep learning for nlp", "deep learning for nlp"),
    ("math $x^2 + y_i$ stays, \\% literal percent",
     "math x2 yi stays literal percent", "math x2 yi stays literal percent"),
    ("Émile Zola — «Œuvres» … naïve café",
     "emile zola «œuvres» naive cafe", "emile zola «œuvres» naive cafe"),
    # the reference's curly-quote unification is dead code (triple-quote parse
    # bug at its line 136); curly quotes survive — we replicate exactly
    ("“curly quotes” and ‘single’ – dash — emdash",
     "“curly quotes” and ‘single’ dash emdash",
     "“curly quotes” and ‘single’ dash emdash"),
    ("\\cite{Katz84} showed \\ref{fig:1} that",
     "katz84 showed fig:1 that", "katz84 showed fig:1 that"),
    ("Keywords: entity resolution  MSC 2020 subject classifications: 62H30",
     "keywords: entity resolution msc 2020 subject classifications: 62h30",
     "keywords entity resolution msc 2020 subject classifications 62h30"),
    ("\\vspace{2em}\\noindent Text\\\\ with [h!] break",
     "text with break", "text with break"),
    ("A  \t  B\n\n\nC\r\nD", "a b c d", "a b c d"),
    ("$$\\int_0^1 f(x)dx$$ and \\[ y = mx \\] and \\(inline\\)",
     "01 fxdx and y mx and inline", "01 fxdx and y mx and inline"),
    ("\\begin{equation}E=mc^2\\end{equation} outside",
     "equation emc2 equation outside", "equation emc2 equation outside"),
    # '%' starts a LaTeX comment: everything after it is stripped
    ("punct !@#$%^&*()_+ keep:colon and/slash", "punct", "punct"),
    ("", "", ""),
    ("   ", "", ""),
    ("\\unknowncmd{wrapped content} and \\bare followed",
     "wrapped content and followed", "wrapped content and followed"),
    ("ÅSTRÖM and Ñoño über señor", "astrom and nono uber senor",
     "astrom and nono uber senor"),
    ('tool_call: search(query="foo bar")',
     "toolcall: searchqueryfoo bar", "toolcall searchqueryfoo bar"),
    ("user: what's the weather? assistant: 22°C — sunny…",
     "user: whats the weather assistant: 22°c sunny",
     "user whats the weather assistant 22°c sunny"),
    ("nested {braces {inner} out}", "nested braces inner out",
     "nested braces inner out"),
    ("price $5 and $10 dollars", "price 5 and 10 dollars",
     "price 5 and 10 dollars"),
    ("x.replace(, '\"').replace( weird", "xreplace weird", "xreplace weird"),
]


@pytest.mark.parametrize("raw,plain,stripped", GOLDENS)
def test_normalize_goldens(raw, plain, stripped):
    assert normalize_text(raw) == plain
    assert normalize_text(raw, strip_token_edges=True) == stripped


def test_normalize_none_like():
    assert normalize_text("") == ""


def test_spark_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from lab02_citation_matching_and_entity_resolution_spark.functions.normalize import (
        normalize_text_udf,
    )

    raws = [r for r, _, _ in GOLDENS]
    df = spark.createDataFrame([(r,) for r in raws], "text string")
    got = df.select(normalize_text_udf()(F.col("text")).alias("n")).collect()
    for row, (raw, plain, _) in zip(got, GOLDENS):
        assert row["n"] == plain, raw
