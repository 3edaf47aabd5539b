"""Unit tests for pairwise feature semantics (SURVEY.md §5.2.1 edge rules).

Hand-computed expected values; edge rules match the reference
feature_engineering_utils exactly (file:line cited per case).
"""

import math

import pytest
from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.operators.features import (
    YEAR_DIFF_SENTINEL,
    any_shared_col,
    char_ngram_jaccard_cols,
    either_empty_jaccard_col,
    jaccard_col,
    jaro_winkler,
    levenshtein_sim_col,
    overlap_count_col,
    overlap_ratio_col,
    year_diff_col,
    year_match_col,
)


def _one(spark, df_spec, col):
    df = spark.createDataFrame([df_spec[0]], df_spec[1])
    return df.select(col.alias("v")).collect()[0]["v"]


# --- levenshtein_sim (ref :25-44) ---------------------------------------

@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("kitten", "sitting", 1 - 3 / 7),
        ("abc", "abc", 1.0),
        ("", "", 0.0),          # both-empty → 0.0 (ref :27-28)
        ("", "abc", 0.0),       # either-empty → 0.0 (ref :30-31)
        ("abc", "", 0.0),
    ],
)
def test_levenshtein_sim(spark, a, b, expected):
    v = _one(spark, ((a, b), "a string, b string"),
             levenshtein_sim_col(F.col("a"), F.col("b")))
    assert v == pytest.approx(expected)


# --- jaccard / overlaps (ref :47-68) ------------------------------------

def test_jaccard_both_empty_zero(spark):
    v = _one(spark, (([], []), "a array<string>, b array<string>"),
             jaccard_col(F.col("a"), F.col("b")))
    assert v == 0.0


def test_jaccard_basic(spark):
    v = _one(spark, ((["a", "b", "c"], ["b", "c", "d"]),
                     "a array<string>, b array<string>"),
             jaccard_col(F.col("a"), F.col("b")))
    assert v == pytest.approx(2 / 4)


def test_token_overlap_count_dedups(spark):
    v = _one(spark, ((["a", "a", "b"], ["a", "b", "b"]),
                     "a array<string>, b array<string>"),
             overlap_count_col(F.col("a"), F.col("b")))
    assert v == 2  # set semantics (ref :57-59)


def test_token_overlap_ratio_raw_length_denominator(spark):
    # |{a,b}∩{a}| / max(RAW len 3, RAW len 1) = 1/3 (ref :62-68)
    v = _one(spark, ((["a", "a", "b"], ["a"]),
                     "a array<string>, b array<string>"),
             overlap_ratio_col(F.col("a"), F.col("b")))
    assert v == pytest.approx(1 / 3)


def test_overlap_ratio_either_empty(spark):
    v = _one(spark, (([], ["a"]), "a array<string>, b array<string>"),
             overlap_ratio_col(F.col("a"), F.col("b")))
    assert v == 0.0


# --- char n-grams (ref :71-89) -------------------------------------------

def test_char_ngram_jaccard(spark):
    # "ab cd" -> cleaned "abcd" -> 3-grams {abc, bcd}; "abcd" identical → 1.0
    v = _one(spark, (("ab cd", "abcd"), "a string, b string"),
             char_ngram_jaccard_cols("a", "b", 3))
    assert v == 1.0


def test_char_ngram_too_short_zero(spark):
    v = _one(spark, (("ab", "abcd"), "a string, b string"),
             char_ngram_jaccard_cols("a", "b", 3))
    assert v == 0.0  # either-empty ngram set → 0.0 (ref :85-86)


# --- signature (author-analog) rules (ref :122-142) -----------------------

def test_either_empty_jaccard_convention(spark):
    # author_overlap: EITHER empty → 0.0 (differs from jaccard's both-empty)
    v = _one(spark, (([], ["x"]), "a array<string>, b array<string>"),
             either_empty_jaccard_col(F.col("a"), F.col("b")))
    assert v == 0.0


def test_any_shared(spark):
    v = _one(spark, ((["t1", "t2"], ["t2"]), "a array<string>, b array<string>"),
             any_shared_col(F.col("a"), F.col("b")))
    assert v == 1.0
    v0 = _one(spark, ((["t1"], []), "a array<string>, b array<string>"),
              any_shared_col(F.col("a"), F.col("b")))
    assert v0 == 0.0


# --- year features (ref :197-198) -----------------------------------------

def test_year_match_and_diff(spark):
    row = ((2020, 2022), "a int, b int")
    assert _one(spark, row, year_match_col(F.col("a"), F.col("b"))) == 0
    assert _one(spark, row, year_diff_col(F.col("a"), F.col("b"))) == 2
    row_eq = ((2020, 2020), "a int, b int")
    assert _one(spark, row_eq, year_match_col(F.col("a"), F.col("b"))) == 1


def test_year_diff_missing_sentinel(spark):
    v = _one(spark, ((None, 2020), "a int, b int"),
             year_diff_col(F.col("a"), F.col("b")))
    assert v == YEAR_DIFF_SENTINEL


# --- jaro-winkler (pure function; north-star addition) --------------------

@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("MARTHA", "MARHTA", 0.9611111111111111),
        ("DIXON", "DICKSONX", 0.8133333333333332),
        ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
        ("abc", "abc", 1.0),
        ("", "", 0.0),
        ("", "a", 0.0),
    ],
)
def test_jaro_winkler_known_values(a, b, expected):
    assert jaro_winkler(a, b) == pytest.approx(expected, abs=1e-12)
