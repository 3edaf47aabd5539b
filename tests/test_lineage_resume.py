"""Checkpoint/lineage resume semantics (SURVEY.md §5.2.5, §7.6): completed
partitions are skipped on resume; outputs identical to a single-shot run."""

import os

from pyspark.sql import functions as F

from lab02_citation_matching_and_entity_resolution_spark.plans.lineage import (
    LineageLog,
    partition_key_col,
)
from lab02_citation_matching_and_entity_resolution_spark.sources.tables import TableStore


def test_resume_skips_completed_partitions(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    log = LineageLog(store, run_id="r1")

    work = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("key")
    ).withColumn("partition_key", partition_key_col("key", 8))

    # simulate: partitions 0..3 completed in a previous attempt
    log.mark_done("score", [(pk, 10) for pk in range(4)])
    remaining = log.resume_filter(work, "score")
    done_keys = {r["partition_key"] for r in remaining.select("partition_key").distinct().collect()}
    assert done_keys == {4, 5, 6, 7}

    # completing the rest empties the work list
    log.mark_done("score", [(pk, 10) for pk in range(4, 8)])
    assert log.resume_filter(work, "score").count() == 0

    # a different stage is unaffected
    assert log.resume_filter(work, "cluster").count() == 100


def test_overwrite_partitions_resume_identical(spark, tmp_path):
    """Writing partitions in two batches == writing them in one shot."""
    store = TableStore(spark, str(tmp_path))
    df = spark.range(40).select(
        (F.col("id") % 4).cast("int").alias("pk"), F.col("id").alias("v")
    )
    store.overwrite_partitions(df.where("pk < 2"), "out_two_step", ["pk"])
    store.overwrite_partitions(df.where("pk >= 2"), "out_two_step", ["pk"])
    store.create_or_replace(df, "out_one_shot", ["pk"])
    two = store.read("out_two_step").orderBy("v").collect()
    one = store.read("out_one_shot").orderBy("v").collect()
    assert [tuple(r) for r in two] == [tuple(r) for r in one]


def test_metrics_table_roundtrip(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    log = LineageLog(store, run_id="r9")
    log.log_metrics("block", [(0, "pairs_generated", 123.0), (1, "pairs_capped", 4.0)])
    got = store.read("_metrics").collect()
    assert {(r["partition_key"], r["metric"], r["value"]) for r in got} == {
        (0, "pairs_generated", 123.0),
        (1, "pairs_capped", 4.0),
    }


def test_parquet_merge_upsert_partitioned_refuses_null_partition(spark, tmp_path):
    """Parquet path: NULL partition values break the isin() partition filter
    the same way NULL breaks SQL equality — the anti-join can never see the
    old row, so the 'upsert' would accumulate duplicate keys.  Refuse."""
    import pytest

    from lab02_citation_matching_and_entity_resolution_spark.sources.tables import (
        TableStore,
    )

    store = TableStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("c1", 0, "x"), ("c2", 1, "y")], "conv_id string, b int, v string"
    )
    store.merge_upsert_partitioned(base, "t", key_cols=["conv_id"], partition_col="b")
    bad = spark.createDataFrame(
        [("c1", None, "z")], "conv_id string, b int, v string"
    )
    with pytest.raises(ValueError, match="NULL value in partition column"):
        store.merge_upsert_partitioned(bad, "t", key_cols=["conv_id"], partition_col="b")
    # table unchanged by the refused merge
    assert {(r["conv_id"], r["v"]) for r in store.read("t").collect()} == {
        ("c1", "x"), ("c2", "y")
    }


def test_parquet_merge_upsert_refuses_null_partition_at_bootstrap(spark, tmp_path):
    """The NULL guard must fire BEFORE the bootstrap write too: a
    NULL-partition row written at bootstrap could never be upserted
    afterwards (every later merge of that key would refuse)."""
    import pytest

    from lab02_citation_matching_and_entity_resolution_spark.sources.tables import (
        TableStore,
    )

    store = TableStore(spark, str(tmp_path))
    bad = spark.createDataFrame(
        [("c1", None, "x")], "conv_id string, b int, v string"
    )
    with pytest.raises(ValueError, match="NULL value in partition column"):
        store.merge_upsert_partitioned(bad, "t2", key_cols=["conv_id"], partition_col="b")
    assert not store.exists("t2")
