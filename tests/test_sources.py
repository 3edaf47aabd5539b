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
