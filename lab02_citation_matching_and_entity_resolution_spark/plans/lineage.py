"""Per-partition lineage, metrics, and checkpoint-resume (SURVEY.md §7.6).

North rule: the pipeline is "checkpoint-resumable per blocking-key partition
with per-partition lineage and metrics written to Iceberg".  This module keeps
two small tables in the TableStore:

  checkpoints(run_id, stage, partition_key, status, rows_out, seq)
  metrics(run_id, stage, partition_key, metric, value)

and exposes the resume filter: an anti-join of the work-partition list against
completed checkpoints — mirroring the reference's per-paper skip-list fault
isolation (ref: src/parse_util.py:1710-1722) and append-mode restart
(ref: src/match_utils.py:554-556), but partition-granular and table-backed.

Partition granularity: pmod(xxhash64(blocking key), n_partitions) — stable
under any cluster size, so a run started at N executors resumes at 4N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import TableStore

CHECKPOINT_TABLE = "_checkpoints"
METRICS_TABLE = "_metrics"

CHECKPOINT_SCHEMA = "run_id string, stage string, partition_key int, status string, rows_out long, seq long"
METRICS_SCHEMA = "run_id string, stage string, partition_key int, metric string, value double"


def partition_key_col(key_col: str, n_partitions: int) -> F.Column:
    """Stable partition id for a blocking key (cluster-size independent)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_partitions)).cast("int")


class LineageLog:
    def __init__(self, store: TableStore, run_id: str):
        self.store = store
        self.run_id = run_id
        self._seq = 0

    def mark_done(self, stage: str, partition_keys_rows: list[tuple[int, int]]):
        """Record completed (partition_key, rows_out) for a stage."""
        self._seq += 1
        spark = self.store.spark
        df = spark.createDataFrame(
            [
                (self.run_id, stage, int(pk), "done", int(rows), self._seq)
                for pk, rows in partition_keys_rows
            ],
            CHECKPOINT_SCHEMA,
        )
        self.store.append(df, CHECKPOINT_TABLE)

    def log_metrics(self, stage: str, rows: list[tuple[int, str, float]]):
        """rows: (partition_key, metric, value)."""
        spark = self.store.spark
        df = spark.createDataFrame(
            [(self.run_id, stage, int(pk), m, float(v)) for pk, m, v in rows],
            METRICS_SCHEMA,
        )
        self.store.append(df, METRICS_TABLE)

    def completed_partitions(self, stage: str) -> DataFrame:
        if not self.store.exists(CHECKPOINT_TABLE):
            spark = self.store.spark
            return spark.createDataFrame([], CHECKPOINT_SCHEMA).select("partition_key")
        return (
            self.store.read(CHECKPOINT_TABLE)
            .where((F.col("run_id") == self.run_id) & (F.col("stage") == stage)
                   & (F.col("status") == "done"))
            .select("partition_key")
            .distinct()
        )

    def resume_filter(self, df: DataFrame, stage: str, pk_col: str = "partition_key") -> DataFrame:
        """Drop rows whose partition already completed this stage+run."""
        done = self.completed_partitions(stage).withColumnRenamed("partition_key", pk_col)
        return df.join(done, pk_col, "left_anti")
