"""Source adapter tests: JSONL permissive scan, nested label-map scan,
@-record entry-stream splitter."""

from pyspark.sql.types import StringType, StructField, StructType

from lab02_citation_matching_and_entity_resolution_spark.sources.adapters import (
    read_entry_stream,
    read_jsonl,
    read_nested_label_map,
    split_at_entries,
)


def test_read_jsonl_skips_bad_lines(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"conv_id": "a", "text": "hello"}\n'
        "NOT JSON AT ALL\n"
        '{"conv_id": "", "text": "dropped: empty key"}\n'
        '{"conv_id": "b", "text": "world"}\n'
    )
    schema = StructType(
        [StructField("conv_id", StringType()), StructField("text", StringType())]
    )
    got = read_jsonl(spark, str(p), schema, group_key="conv_id").collect()
    assert {r["conv_id"] for r in got} == {"a", "b"}


def test_read_nested_label_map(spark, tmp_path):
    p = tmp_path / "manual.json"
    p.write_text('{"g1": {"k1": "r1", "k2": "r2"}, "g2": {"k9": "r9"}}')
    got = {
        (r["group_id"], r["left_key"], r["right_id"])
        for r in read_nested_label_map(spark, str(p)).collect()
    }
    assert got == {("g1", "k1", "r1"), ("g1", "k2", "r2"), ("g2", "k9", "r9")}


def test_split_at_entries_depth_and_skips():
    text = """
% a comment with @fake{nope}
@string{abbrev = "X"}
@article{key1, title = {Nested {Braces} Work}, year = {2020}}
@misc{key2,
  note = {multi
  line}
}
"""
    entries = split_at_entries(text)
    assert [(e[0], e[1]) for e in entries] == [("article", "key1"), ("misc", "key2")]
    assert "Nested {Braces} Work" in entries[0][2]


def test_read_entry_stream(spark, tmp_path):
    (tmp_path / "one.bib").write_text(
        "@article{a1, title={T1}}\n@inproceedings{b2, title={T2}}"
    )
    (tmp_path / "two.bib").write_text("@misc{c3, title={T3}}")
    got = read_entry_stream(spark, str(tmp_path) + "/*.bib").collect()
    assert {r["entry_key"] for r in got} == {"a1", "b2", "c3"}
    assert all(r["src_file"] for r in got)


def test_merge_upsert_parquet_is_per_key_update_not_append(spark, tmp_path):
    """Reference parity (modeling_utils.py:391-481): rescoring with a changed
    model must UPDATE each key's predictions row in place; unrelated keys
    survive, nothing is appended twice."""
    from lab02_citation_matching_and_entity_resolution_spark.sources.tables import (
        TableStore,
    )

    store = TableStore(spark, str(tmp_path))
    v1 = spark.createDataFrame(
        [("a", 0.9, "m1"), ("b", 0.8, "m1"), ("c", 0.7, "m1")],
        "left_id string, score double, model string",
    )
    store.merge_upsert(v1, "preds", key_cols=["left_id"])
    # rescore: a and b change, d is new, c untouched
    v2 = spark.createDataFrame(
        [("a", 0.4, "m2"), ("b", 0.5, "m2"), ("d", 0.6, "m2")],
        "left_id string, score double, model string",
    )
    store.merge_upsert(v2, "preds", key_cols=["left_id"])
    got = {r["left_id"]: (r["score"], r["model"]) for r in store.read("preds").collect()}
    assert got == {
        "a": (0.4, "m2"),
        "b": (0.5, "m2"),
        "c": (0.7, "m1"),
        "d": (0.6, "m2"),
    }
    assert store.read("preds").count() == 4  # upsert, never append


def test_merge_upsert_end_to_end_rescore(spark, tmp_path):
    """Write a predictions table, rescore with a different model, upsert:
    every overlapping left_id must carry the NEW model's scores."""
    from lab02_citation_matching_and_entity_resolution_spark.sources.tables import (
        TableStore,
    )

    store = TableStore(spark, str(tmp_path))
    scored_a = spark.createDataFrame(
        [("e1", "x1", 0.99), ("e1", "x2", 0.10), ("e2", "x3", 0.95)],
        "left_id string, right_id string, model_score double",
    )
    scored_b = spark.createDataFrame(
        [("e1", "x2", 0.98), ("e1", "x1", 0.20)],  # model B flips e1's ranking
        "left_id string, right_id string, model_score double",
    )
    labeled = spark.createDataFrame(
        [("e1", "x1", 1), ("e2", "x3", 1)], "left_id string, right_id string, label int"
    )
    from lab02_citation_matching_and_entity_resolution_spark.plans.model import (
        predictions_table,
    )

    # array columns serialize fine to parquet; only driver-oracle rows ban them
    pa = predictions_table(scored_a, labeled, k=5)
    store.merge_upsert(pa, "pred_table", key_cols=["left_id"])
    # the rescore batch covers e1 only — scope truth to the batch, else the
    # labels full-join manufactures empty rows for every labeled entity and
    # the upsert would wipe them (the reference merges only the papers it
    # rescored, modeling_utils.py:391-481)
    pb = predictions_table(scored_b, labeled.where("left_id = 'e1'"), k=5)
    store.merge_upsert(pb, "pred_table", key_cols=["left_id"])
    rows = {r["left_id"]: r for r in store.read("pred_table").collect()}
    assert set(rows) == {"e1", "e2"}
    # e1 was rescored: top prediction is now x2 (model B's ranking)
    assert rows["e1"]["predictions"][0]["right_id"] == "x2"
    # e2 was not in the rescore batch: model A's row survives
    assert rows["e2"]["predictions"][0]["right_id"] == "x3"
