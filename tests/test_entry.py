"""Driver-contract flagship: entry() must be the scale-safe plan.

Round-4 verdict finding #2: the flagship demo used an uncapped within-block
cross join — the one pattern the rest of the engine forbids.  These tests pin
(a) the cap window is present in the physical plan, and (b) at sf0.001 the
cap is unhit, so the output equals the uncapped join exactly.
"""

import importlib.util
import os

from pyspark.sql import functions as F

_ENTRY_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
_spec = importlib.util.spec_from_file_location("spark_entry_under_test", _ENTRY_PATH)
_entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_entry_mod)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_entry_plan_contains_cap_window(spark):
    df = _entry_mod.entry(spark)
    plan = _plan(df)
    # the skew-cap is a row_number window over the block key; its absence
    # means the demo regressed to the uncapped cross join
    assert "row_number" in plan, plan


def test_entry_output_matches_uncapped_at_smoke_scale(spark):
    got = {
        (r["left_id"], r["right_id"], r["lev_sim"], r["jaccard"])
        for r in _entry_mod.entry(spark).collect()
    }
    assert len(got) > 0

    # uncapped re-derivation (the pre-round-5 flagship), inline
    from lab02_citation_matching_and_entity_resolution_spark.operators.features import (
        jaccard_col,
        levenshtein_sim_col,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        "lang",
        "source",
        F.col("text"),
        F.array_distinct(F.split("text", " ")).alias("tokens"),
    )
    a = docs.select(
        "lang", "source",
        F.col("doc_id").alias("left_id"),
        F.col("text").alias("l_text"),
        F.col("tokens").alias("l_tokens"),
    )
    b = docs.select(
        "lang", "source",
        F.col("doc_id").alias("right_id"),
        F.col("text").alias("r_text"),
        F.col("tokens").alias("r_tokens"),
    )
    pairs = a.join(b, ["lang", "source"]).where(F.col("left_id") < F.col("right_id"))
    scored = pairs.select(
        "left_id",
        "right_id",
        F.round(
            levenshtein_sim_col(
                F.substring("l_text", 1, 120), F.substring("r_text", 1, 120)
            ),
            4,
        ).alias("lev_sim"),
        F.round(jaccard_col(F.col("l_tokens"), F.col("r_tokens")), 4).alias("jaccard"),
    ).where((F.col("jaccard") >= 0.3) | (F.col("lev_sim") >= 0.5))
    expected = {
        (r["left_id"], r["right_id"], r["lev_sim"], r["jaccard"])
        for r in scored.collect()
    }
    assert got == expected
