"""Pipeline orchestration: stage graph, checkpoint/lineage, resume."""
