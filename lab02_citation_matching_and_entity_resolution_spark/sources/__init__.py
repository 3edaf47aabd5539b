"""Table IO: Iceberg-or-parquet abstraction, JSONL adapters, lineage tables."""
