"""Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.10): it is an entirely
batch pipeline, and the target north rule is batch too (spark-submit at two
cluster sizes).  The engine's incremental story is therefore batch-level
checkpoint/resume per blocking-key partition (plans/lineage.py), not
Structured Streaming.  This package exists to make that decision explicit and
to host a thin ingestion adapter if a future round adds streaming transcript
arrival (readStream -> the same assemble/blocking stages via foreachBatch).
"""
