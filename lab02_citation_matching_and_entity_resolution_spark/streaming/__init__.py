"""Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.10): it is an entirely
batch pipeline, and the target north rule is batch too (spark-submit at two
cluster sizes).  The engine's incremental story is therefore batch-level
checkpoint/resume per blocking-key partition (plans/lineage.py), not
Structured Streaming.  Beyond that decision, the
engine's target deployment DOES ingest transcripts continuously, so
``ingest.py`` (round 3) provides the thin streaming front: a file-source
``readStream`` over JSONL turn records and a ``foreachBatch`` incremental
re-assembly (append turns -> re-assemble only affected conversations with
the SAME batch assemble_documents -> MERGE-upsert the live documents table).
Checkpoint-restart and batch/stream parity are pinned in
tests/test_streaming_ingest.py.
"""
