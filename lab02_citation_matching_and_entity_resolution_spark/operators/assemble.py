"""Per-conversation document assembly (SURVEY.md §2.8 D1/D2/W7).

The reference assembles a per-paper document tree and emits BFS-stable-ordered
elements (ref: src/parse_util.py:1197-1321); transcripts arrive pre-segmented
as turns, so assembly is a window-ordered concatenation with a deterministic
tie-break — the north-rule "stable turn ordering preserving per-turn text
equality".

All of this is native Catalyst (array_sort on structs sorts field-by-field, so
(turn_idx, text_norm) gives the stable order); the only Python is the
normalizer pandas UDF applied per turn BEFORE grouping, which preserves the
per-turn text-equality invariant versus the reference normalizer.

Scale notes: one shuffle on conv_id (the natural partitioning key for every
downstream stage); collect_list is bounded by turns-per-conversation, not by
table size.  At 10^12 turns the shuffle is wide but even — conv_id is a
high-cardinality key; no salting needed here (skew handling lives in blocking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize_text_udf, parse_year_col

# Reference TITLE_STOPWORDS (src/parse_util.py:31-46) — token filter drops
# these plus single-char tokens (ref _filter_title_tokens, :257-261).
TITLE_STOPWORDS = (
    "a an the and of in for on to with by at from as".split()
)


def token_filter_expr(arr_col: str) -> F.Column:
    """Native equivalent of the reference's _filter_title_tokens."""
    stop_list = ", ".join(f"'{w}'" for w in TITLE_STOPWORDS)
    return F.expr(
        f"filter({arr_col}, t -> t is not null and length(t) > 1 and t not in ({stop_list}))"
    )


def assemble_documents(turns: DataFrame, text_col: str = "text") -> DataFrame:
    """transcripts -> documents, one row per conv_id.

    Output schema:
      conv_id, doc_text (stable-ordered normalized concat), n_turns,
      roles array<string> (sorted distinct), tools array<string> (sorted
      distinct non-empty), tokens array<string> (filtered), year_like int,
      first_ts, last_ts
    """
    normed = turns.withColumn("text_norm", normalize_text_udf()(F.col(text_col)))
    docs = (
        normed.groupBy("conv_id")
        .agg(
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(array_sort(collect_list(struct(turn_idx, text_norm))),"
                    " s -> s.text_norm)"
                ),
            ).alias("doc_text"),
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            F.sort_array(F.collect_set("role")).alias("roles"),
            F.sort_array(
                F.expr("collect_set(case when tool is not null and tool != '' then tool end)")
            ).alias("tools"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .withColumn("tokens", token_filter_expr(r"split(doc_text, '\\s+')"))
        .withColumn("year_like", parse_year_col("doc_text"))
    )
    return docs
