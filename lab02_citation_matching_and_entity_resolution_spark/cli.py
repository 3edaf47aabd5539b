"""spark-submit entry point (north rule: ``spark-submit --py-files engine.zip cli.py``).

Runs the ER pipeline against a transcripts table (parquet path or Iceberg
table name), writing documents / pairs / matches / clusters plus per-partition
lineage + metrics to the TableStore, with --resume support.

Usage:
  spark-submit --py-files er_engine.zip -m lab02_..._spark.cli \
      --input /path/transcripts --output /path/er_out \
      [--synthetic N_BASE] [--threshold 0.7] [--resume RUN_ID] [--greedy]

Streaming ingest mode (--stream-input DIR): drain a JSONL turn-record
directory through the Structured Streaming front (readStream ->
incremental re-assembly -> partition-bounded upsert of documents_live),
then exit; the checkpoint lives under <output>/_stream_ckpt, so
re-invoking after new files arrive processes only the new data.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import uuid

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path (or Iceberg table)")
    ap.add_argument("--output", required=True, help="TableStore root")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a synthetic corpus with N base entities instead of --input")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--greedy", action="store_true", help="reference-parity greedy 1:1 resolution")
    ap.add_argument("--cc-algorithm", default="auto",
                    choices=["auto", "propagation", "star"],
                    help="connected-components variant: auto (propagation "
                         "with one-shot star fallback on non-convergence; "
                         "default), propagation (1 join/round, O(diameter)) "
                         "or star (large/small-star, O(log n) — for "
                         "long-chain components)")
    ap.add_argument("--cc-salt-buckets", type=int, default=16,
                    help="salted skew handling: reducers per hot vertex in "
                         "the CC label join (ignored by --cc-algorithm star)")
    ap.add_argument("--cc-hot-degree-threshold", type=int, default=1_000_000,
                    help="symmetrized degree at which a vertex counts as hot "
                         "for CC salting")
    ap.add_argument("--stream-input", default=None,
                    help="JSONL turn-record directory: drain it through the "
                         "streaming ingest front into documents_live, then "
                         "exit (checkpointed; re-invocation is incremental)")
    ap.add_argument("--stream-stats", action="store_true",
                    help="with --stream-input: also drain the live-stats "
                         "queries — watermarked per-role turn_rate_5m and "
                         "timeout-closed conversations_closed tables "
                         "(own checkpoints; incremental like the ingest)")
    ap.add_argument("--stream-gap-seconds", type=int, default=1800,
                    help="idle gap after which --stream-stats closes a "
                         "conversation")
    ap.add_argument("--resume", default=None, help="run_id to resume")
    ap.add_argument("--n-partitions", type=int, default=64,
                    help="lineage partition count (cluster-size independent)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from .session import get_spark
    from .sources.tables import TableStore
    from .plans.lineage import LineageLog, partition_key_col
    from .plans.pipeline import PipelineConfig, run_pipeline
    from .synth import SynthConfig, transcripts_df

    spark = get_spark(app_name="er-pipeline", master=args.master)
    store = TableStore(spark, args.output)

    if args.stream_input:
        from .streaming.ingest import read_transcript_stream, start_ingest

        ckpt = os.path.join(args.output, "_stream_ckpt")
        q = start_ingest(read_transcript_stream(spark, args.stream_input), store, ckpt)
        drained = q.awaitTermination(600)
        if not drained:
            # timeout: counts would be mid-drain lies and spark.stop() would
            # kill an active batch — stop the query cleanly and fail loudly
            q.stop()
            print("stream drain TIMED OUT after 600s — partial state, re-run "
                  "to resume from checkpoint", file=sys.stderr)
            spark.stop()
            sys.exit(2)
        n_turns = store.read("turns_raw").count() if store.exists("turns_raw") else 0
        n_docs = (
            store.read("documents_live").count()
            if store.exists("documents_live")
            else 0
        )
        print(f"stream drained: turns_raw={n_turns} documents_live={n_docs}")
        if args.stream_stats:
            from .streaming.live_stats import start_live_stats_drain

            qs = start_live_stats_drain(
                read_transcript_stream(spark, args.stream_input),
                store,
                os.path.join(args.output, "_stream_stats_ckpt"),
                gap_seconds=args.stream_gap_seconds,
            )
            for q2 in qs:
                if not q2.awaitTermination(600):
                    # stop EVERY stats query, not just the timed-out one:
                    # a sibling still active when spark.stop() runs is the
                    # mid-batch kill the ingest path avoids by stopping the
                    # query first (round-5 ADVICE)
                    for q3 in qs:
                        q3.stop()
                    print("stream stats drain TIMED OUT after 600s — re-run "
                          "to resume from checkpoint", file=sys.stderr)
                    spark.stop()
                    sys.exit(2)
            def _n(table: str) -> int:
                # a drain that closed nothing leaves a metadata-only sink
                # dir; parquet schema inference fails there -> count is 0.
                # Only THAT failure maps to 0 — a genuinely corrupted sink
                # must not masquerade as a clean empty drain (round-5
                # ADVICE), so anything else logs and re-raises.
                from pyspark.errors import AnalysisException

                if not store.exists(table):
                    return 0
                try:
                    return store.read(table).count()
                except AnalysisException as exc:
                    msg = str(exc)
                    if "UNABLE_TO_INFER_SCHEMA" in msg or "Unable to infer schema" in msg:
                        return 0  # metadata-only sink dir: nothing was closed
                    print(f"reading {table} failed: {msg}", file=sys.stderr)
                    raise

            n_rate = _n("turn_rate_5m")
            n_closed = _n("conversations_closed")
            print(f"stream stats: turn_rate_5m={n_rate} "
                  f"conversations_closed={n_closed}")
        spark.stop()
        return

    run_id = args.resume or uuid.uuid4().hex[:12]
    log = LineageLog(store, run_id)

    if args.synthetic:
        transcripts = transcripts_df(spark, SynthConfig(n_base=args.synthetic))
    else:
        transcripts = spark.read.parquet(args.input)

    t0 = time.time()
    cfg = PipelineConfig(threshold=args.threshold, use_greedy_one_to_one=args.greedy,
                         cc_algorithm=args.cc_algorithm,
                         cc_salt_buckets=args.cc_salt_buckets,
                         cc_hot_degree_threshold=args.cc_hot_degree_threshold)
    result = run_pipeline(transcripts, cfg)

    # partition everything by the lineage partition key for resumable writes
    docs = result.documents.withColumn(
        "partition_key", partition_key_col("conv_id", args.n_partitions)
    )
    if args.resume:
        docs = log.resume_filter(docs, "documents")
    store.overwrite_partitions(docs, "documents", ["partition_key"])
    done = [
        (r["partition_key"], r["n"])
        for r in docs.groupBy("partition_key").agg(F.count("*").alias("n")).collect()
    ]
    log.mark_done("documents", done)

    matches = result.matches.withColumn(
        "partition_key", partition_key_col("left_id", args.n_partitions)
    )
    store.overwrite_partitions(matches, "matches", ["partition_key"])
    store.create_or_replace(result.clusters, "clusters")
    store.append(
        result.block_metrics.withColumn("run_id", F.lit(run_id)), "block_cap_metrics"
    )

    n_pairs = result.pairs.count()
    n_matches = store.read("matches").count()
    n_clusters = store.read("clusters").select("cluster_id").distinct().count()
    wall = time.time() - t0
    log.log_metrics(
        "pipeline",
        [
            (0, "pairs_scored", float(n_pairs)),
            (0, "matches", float(n_matches)),
            (0, "clusters", float(n_clusters)),
            (0, "wall_sec", wall),
            (0, "pairs_per_sec", n_pairs / wall if wall > 0 else 0.0),
            # clustering observability: which CC variant actually ran and
            # whether auto fell back to star (the lineage record the fallback
            # design promises)
            (0, "cc_rounds", float(result.cc_stats.get("rounds") or 0)),
            (0, "cc_fallback_to_star", 1.0 if result.cc_stats.get("fallback") else 0.0),
        ],
    )
    print(
        f"run_id={run_id} pairs={n_pairs} matches={n_matches} "
        f"clusters={n_clusters} wall={wall:.1f}s pairs/sec={n_pairs / wall:.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
