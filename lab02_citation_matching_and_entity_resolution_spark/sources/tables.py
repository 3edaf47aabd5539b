"""Iceberg-or-parquet table layer (SURVEY.md §2.1, §7.0).

On a real cluster the engine targets Iceberg (``USING iceberg`` +
``overwritePartitions`` snapshots — the north rule's per-partition resume
substrate).  The sandbox has no Iceberg runtime jar and no network, so the
same API is backed by parquet directories with partition-dir overwrite
(``partitionOverwriteMode=dynamic``), keeping all pipeline code
format-agnostic: swap the catalog in one place, nothing downstream changes.

Replaces the reference's materialized-JSONL stage boundaries
(ref: src/parse_util.py:1575-1581 _append_jsonl; src/match_utils.py:554-556
append-mode restart; :854-874 partitioned split sink).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v) -> str:
    """SQL literal for a partition value (int/float/bool/str ONLY).

    Anything else raises: silently rendering e.g. None as the string 'None'
    would make the MERGE ON clause never match existing rows, so every
    re-merge of that key would INSERT a duplicate — the exact corruption
    merge semantics exist to prevent."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(
        f"unsupported partition-value type {type(v).__name__!r} ({v!r}); "
        "partition values must be int/float/bool/str and non-null"
    )


def _check_partition_values(vals: list, partition_col: str) -> None:
    """NULL partition values break upserts in BOTH store backends: SQL
    equality in the Iceberg MERGE ON clause is never true for NULL (the row
    re-inserts forever), and ``isin(vals)`` in the parquet path never selects
    NULL-partition rows for the anti-join (same duplicate-key outcome).
    Refuse loudly instead."""
    if any(v is None for v in vals):
        raise ValueError(
            f"merge_upsert_partitioned: NULL value in partition column "
            f"{partition_col!r} — NULL never equality-matches in the merge "
            "condition, so the upsert invariant cannot hold; filter or "
            "default the partition value upstream"
        )


def _iceberg_available(spark: SparkSession) -> bool:
    return bool(
        spark.conf.get("spark.sql.catalog.spark_catalog", None)
        or spark.conf.get("spark.sql.catalog.er", None)
    )


@dataclass
class TableStore:
    """Named-table IO rooted at ``root`` (parquet) or an Iceberg catalog."""

    spark: SparkSession
    root: str
    catalog: str | None = None  # e.g. "er" when an Iceberg catalog is configured

    def _use_iceberg(self) -> bool:
        return self.catalog is not None and _iceberg_available(self.spark)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def sink_path(self, name: str) -> str:
        """Public filesystem path for ``name`` — for writers the store does
        not own (e.g. ``writeStream.format("parquet").option("path", ...)``),
        so callers never reach into ``_path`` (round-5 ADVICE).  Only valid
        in parquet mode: an Iceberg-configured store has no path sink —
        streaming writers must target ``writeStream.toTable`` there, and a
        loud error beats a parquet directory silently shadowing the catalog
        table."""
        if self._use_iceberg():
            raise ValueError(
                f"sink_path({name!r}): store is Iceberg-backed; use "
                f"writeStream.toTable('{self.catalog}.{name}') instead of a path sink"
            )
        return self._path(name)

    def exists(self, name: str) -> bool:
        if self._use_iceberg():
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.isdir(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self._use_iceberg():
            return self.spark.read.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def create_or_replace(self, df: DataFrame, name: str, partition_by: list[str] | None = None):
        """S11 output-truncate semantics (ref parse_util.py:1620-1631)."""
        if self._use_iceberg():
            w = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
            if partition_by:
                from pyspark.sql.functions import col

                w = w.partitionedBy(*[col(c) for c in partition_by])
            w.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def append(self, df: DataFrame, name: str, partition_by: list[str] | None = None):
        """S7 append-sink semantics (ref parse_util.py:1575-1581).

        Iceberg: the partition SPEC lives on the table, not the write, so the
        first append of a partitioned table must CREATE it with
        ``partitionedBy`` — silently dropping ``partition_by`` there would
        leave every downstream "partition pruning" claim void on exactly the
        substrate documented as the scale path."""
        if self._use_iceberg():
            if not self.exists(name):
                w = df.writeTo(f"{self.catalog}.{name}").using("iceberg")
                if partition_by:
                    from pyspark.sql.functions import col

                    w = w.partitionedBy(*[col(c) for c in partition_by])
                w.create()
                return
            df.writeTo(f"{self.catalog}.{name}").append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def merge_upsert(self, df: DataFrame, name: str, key_cols: list[str]):
        """M8 MERGE semantics — per-key upsert, not append (the reference
        UPDATES existing per-paper pred.json files in place,
        ref: src/modeling_utils.py:391-481).

        Iceberg (the scale path): a real MERGE INTO — matched keys update,
        new keys insert; snapshot-isolated, no table rewrite.

        Parquet fallback: keep = existing ANTI-JOIN updates on key, result =
        keep UNION updates, written to a sibling tmp dir then atomically
        swapped in (reading lazily from the same path being overwritten
        would corrupt the table).  This rewrites the table — fine for the
        sandbox, documented as the reason Iceberg is the 100 TB substrate.
        """
        if self._use_iceberg():
            if not self.exists(name):
                # first upsert bootstraps the table (MERGE INTO on a
                # non-existent table is an AnalysisException)
                df.writeTo(f"{self.catalog}.{name}").using("iceberg").create()
                return
            view = f"_merge_src_{name}"
            df.createOrReplaceTempView(view)
            on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
            self.spark.sql(
                f"MERGE INTO {self.catalog}.{name} t USING {view} s ON {on} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            return
        if not self.exists(name):
            df.write.mode("overwrite").parquet(self._path(name))
            return
        import shutil
        import uuid

        existing = self.spark.read.parquet(self._path(name))
        keep = existing.join(df.select(*key_cols), key_cols, "left_anti")
        result = keep.unionByName(df)
        token = uuid.uuid4().hex[:8]
        tmp = self._path(f"{name}.__merge_{token}")
        result.write.mode("overwrite").parquet(tmp)
        final = self._path(name)
        # two renames, never a window with no table: old -> trash, tmp ->
        # final, then drop trash.  A crash leaves either the old or the new
        # table in place (plus at worst an orphan dir), never neither.
        trash = self._path(f"{name}.__old_{token}")
        os.replace(final, trash)
        os.replace(tmp, final)
        shutil.rmtree(trash)

    def merge_upsert_partitioned(
        self, df: DataFrame, name: str, key_cols: list[str], partition_col: str
    ):
        """Per-key upsert where ``df`` touches only a subset of
        ``partition_col`` values: only those partitions are rewritten,
        bounding merge cost to the touched partitions instead of the table
        (the plain parquet ``merge_upsert`` rewrites everything — fine for a
        one-off, a scale bug inside a per-batch streaming loop).

        PRECONDITION (caller's contract, not validated here): partition_col
        must be a deterministic function of key_cols — a key's new row must
        land in the same partition as its old row, otherwise the
        partition-filtered anti-join cannot see the old row and the "upsert"
        leaves duplicate keys.  The streaming caller satisfies this by
        construction (conv_bucket = pmod(xxhash64(conv_id), n)).

        Iceberg: MERGE INTO whose ON clause carries the partition column
        BOTH as an s-side equality AND as a literal IN list of the touched
        values (bounded by the partition count, e.g. 64 conv buckets) — the
        key-only ON clause of plain merge_upsert gives Iceberg nothing to
        statically prune the target scan with, so "cost bounded to touched
        partitions" would not hold on exactly the documented scale substrate
        (round-4 ADVICE).  The bootstrap CREATE declares the partition spec
        so the engine can prune.  Parquet: read ONLY the touched
        partitions,
        anti-join out updated keys, union the new rows, localCheckpoint to
        sever lineage from the files about to be replaced (reading lazily
        from a path being overwritten corrupts the table), then
        dynamic-partition-overwrite exactly those partitions.  A crash
        mid-overwrite can leave a subset of touched partitions new and the
        rest old; the streaming caller's batch REPLAY re-merges the same
        rows, which converges because the merge is idempotent per key.
        """
        # ONE bounded driver-side collect up front (one row per touched
        # partition), validating NULL-freedom on EVERY path INCLUDING the
        # bootstrap writes: a NULL-partition row written at bootstrap could
        # never be upserted afterwards (every later merge of that key would
        # refuse), so it must be refused before anything lands on disk
        vals = [r[0] for r in df.select(partition_col).distinct().collect()]
        _check_partition_values(vals, partition_col)
        if self._use_iceberg():
            if not self.exists(name):
                from pyspark.sql.functions import col

                (
                    df.writeTo(f"{self.catalog}.{name}")
                    .using("iceberg")
                    .partitionedBy(col(partition_col))
                    .create()
                )
                return
            view = f"_merge_src_{name}"
            df.createOrReplaceTempView(view)
            on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
            on += f" AND t.{partition_col} = s.{partition_col}"
            if vals:
                lits = ", ".join(_sql_literal(v) for v in sorted(vals, key=str))
                on += f" AND t.{partition_col} IN ({lits})"
            self.spark.sql(
                f"MERGE INTO {self.catalog}.{name} t USING {view} s ON {on} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            return
        from pyspark.sql.functions import col

        if not self.exists(name):
            df.write.mode("overwrite").partitionBy(partition_col).parquet(self._path(name))
            return
        existing = self.read(name).where(col(partition_col).isin(vals))
        keep = existing.join(df.select(*key_cols).distinct(), key_cols, "left_anti")
        result = keep.unionByName(df).localCheckpoint(eager=True)
        self.overwrite_partitions(result, name, [partition_col])

    def replace_groups_partitioned(
        self,
        df: DataFrame,
        name: str,
        group_col: str,
        partition_col: str,
        extra_partition_vals: tuple = (),
    ):
        """Replace EVERY row of each ``group_col`` value present in ``df``,
        rewriting only the touched ``partition_col`` partitions.

        The upsert variant for indexes whose partition column is NOT a
        function of the merge key: an LSH band index bucketed by band-key
        hash re-signs a conversation into buckets its OLD rows may not
        occupy, so key-equality within the new rows' partitions cannot find
        them.  The caller locates the old rows' partitions (bounded work —
        recompute the group's previous band keys) and passes them as
        ``extra_partition_vals``; all rows of the touched groups inside the
        touched partitions are dropped, then ``df`` is inserted.  Replay of
        the same ``df`` converges (the rewrite is idempotent per group).

        Parquet: read touched partitions, anti-join on ``group_col``,
        union, localCheckpoint (sever lineage from files being replaced),
        dynamic-partition overwrite.  Iceberg: partition-pruned DELETE of
        the touched groups, then append — two transactions; a crash between
        them loses the groups' rows until the streaming caller's batch
        replay re-runs both (documented crash window, same convergence
        argument as merge_upsert_partitioned's partial overwrite).
        """
        vals = sorted(
            {r[0] for r in df.select(partition_col).distinct().collect()}
            | set(extra_partition_vals),
            key=str,
        )
        _check_partition_values(vals, partition_col)
        from pyspark.sql.functions import col

        if self._use_iceberg():
            if not self.exists(name):
                (
                    df.writeTo(f"{self.catalog}.{name}")
                    .using("iceberg")
                    .partitionedBy(col(partition_col))
                    .create()
                )
                return
            view = f"_replace_src_{name}"
            df.createOrReplaceTempView(view)
            lits = ", ".join(_sql_literal(v) for v in vals)
            self.spark.sql(
                f"DELETE FROM {self.catalog}.{name} "
                f"WHERE {partition_col} IN ({lits}) "
                f"AND {group_col} IN (SELECT {group_col} FROM {view})"
            )
            df.writeTo(f"{self.catalog}.{name}").append()
            return
        if not self.exists(name):
            df.write.mode("overwrite").partitionBy(partition_col).parquet(self._path(name))
            return
        existing = self.read(name).where(col(partition_col).isin(vals))
        keep = existing.join(df.select(group_col).distinct(), group_col, "left_anti")
        result = keep.unionByName(df).localCheckpoint(eager=True)
        # dynamic overwrite only rewrites partitions PRESENT in result — a
        # touched partition whose only rows belonged to the replaced groups
        # comes out empty and would silently keep its old file; drop it
        # explicitly (bounded: one directory per touched-and-now-empty value)
        present = {r[0] for r in result.select(partition_col).distinct().collect()}
        if present:
            self.overwrite_partitions(result, name, [partition_col])
        import shutil

        for v in vals:
            if v not in present:
                d = os.path.join(self._path(name), f"{partition_col}={v}")
                if os.path.isdir(d):
                    shutil.rmtree(d)

    def overwrite_partitions(self, df: DataFrame, name: str, partition_by: list[str]):
        """Replace only the partitions present in ``df`` — the resume
        substrate (Iceberg overwritePartitions / dynamic parquet overwrite)."""
        if self._use_iceberg():
            df.writeTo(f"{self.catalog}.{name}").overwritePartitions()
            return
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(self._path(name))
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
