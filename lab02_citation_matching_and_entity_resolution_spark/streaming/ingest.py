"""Streaming transcript ingestion (Structured Streaming).

The reference is entirely batch (SURVEY.md §2.10), but the engine's target
deployment ingests transcripts continuously, so this module adds the thin
streaming front the batch pipeline needs and nothing more:

  read_transcript_stream   file-source readStream over JSONL turn records
                           (the input_hint schema: conv_id, turn_idx, role,
                           text, tool, ts)
  incremental_assemble     foreachBatch handler — append the micro-batch's
                           turns to a raw turns table, then re-assemble ONLY
                           the affected conversations and MERGE-upsert them
                           into the live documents table
  start_ingest             wire the two together with a checkpoint dir

Design: conversations span micro-batches (a turn for conv X can arrive hours
after X's first turn), so per-batch groupBy state is not enough and
applyInPandasWithState would duplicate the batch assembler's logic.  The
idiomatic fix is incremental re-materialization: each batch touches only the
conv_ids it contains — re-read those conversations' full turn history (a
broadcast semi-join against the raw table), run the SAME assemble_documents
the batch pipeline uses (one code path, one set of semantics), and upsert by
conv_id via TableStore.merge_upsert (a real MERGE INTO on Iceberg).  Work per
batch is proportional to the batch's conversations, not the table.

Exactly-once EFFECT (not storage): the file source + checkpointLocation give
replay-safe input, but a crash between the turns append and the checkpoint
commit re-appends the replayed batch's rows to the raw table.  Assembly
therefore full-row-dedups the turn history before concatenating — replayed
rows are byte-identical, so the assembled documents (and the keyed upsert)
are idempotent even though turns_raw may hold duplicates.  Pinned by the
replay test in tests/test_streaming_ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.assemble import assemble_documents
from ..sources.tables import TableStore

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

TURNS_TABLE = "turns_raw"
DOCS_TABLE = "documents_live"


def read_transcript_stream(
    spark: SparkSession, path: str, fmt: str = "json", max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of transcript turns (one JSON record per turn)."""
    reader = spark.readStream.schema(TRANSCRIPT_DDL).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def incremental_assemble(
    store: TableStore,
    turns_table: str = TURNS_TABLE,
    docs_table: str = DOCS_TABLE,
):
    """foreachBatch handler: append turns, re-assemble affected convs, upsert."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if not batch_df.take(1):
                return
            store.append(batch_df, turns_table)
            affected = batch_df.select("conv_id").distinct()
            # full turn history of just the touched conversations — broadcast
            # semi-join keeps this proportional to the batch, not the table.
            # dropDuplicates makes re-assembly idempotent under batch REPLAY:
            # a crash between the append and the checkpoint commit re-appends
            # the same rows on restart, and without the dedup every turn in
            # that batch would be assembled twice, permanently corrupting the
            # docs.  Replayed rows are byte-identical, so full-row dedup is
            # exact (no guessing about turn_idx semantics).
            history = (
                store.read(turns_table)
                .join(F.broadcast(affected), "conv_id", "left_semi")
                .dropDuplicates()
            )
            docs = assemble_documents(history)
            store.merge_upsert(docs, docs_table, key_cols=["conv_id"])
        finally:
            batch_df.unpersist()

    return process


def start_ingest(
    stream_df: DataFrame,
    store: TableStore,
    checkpoint_dir: str,
    turns_table: str = TURNS_TABLE,
    docs_table: str = DOCS_TABLE,
    available_now: bool = True,
):
    """Start the ingest query.  available_now=True drains everything currently
    in the source then stops (the testable/backfill mode); False runs
    continuously with the default micro-batch trigger."""
    writer = (
        stream_df.writeStream.foreachBatch(
            incremental_assemble(store, turns_table, docs_table)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
