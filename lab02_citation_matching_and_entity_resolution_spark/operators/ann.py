"""Approximate nearest-neighbor search over embedding columns.

Two paths:

  brute_force_topk  exact cosine top-k per query — the correctness baseline.
                    Native array math (zip_with/aggregate) + window top-k.
  ivf_topk          IVF-style scale path: k-means-lite centroids via
                    deterministic seeding, assign every vector to its nearest
                    centroid (broadcast), probe only ``n_probe`` closest cells
                    per query.  Candidate set shrinks ~n_cells/n_probe ×,
                    turning the all-pairs join into a cell-local join — the
                    same blocking idea the ER pipeline uses for text.

At 100 TB the centroid table stays tiny (broadcast), assignment is a map-only
stage, and the join shuffles on cell id — no cross-join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm_col(vec_col: str) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )


def _dot(a: str | F.Column, b: str | F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rk<=k).

    queries: (query_id, embedding).  Broadcast the (small) query side; the
    item table streams through once — no shuffle of the big side (a narrow
    single-file scan is fanned out first so the per-item scoring map
    parallelizes; no-op when the scan already has enough partitions).
    """
    from .dedup import fan_out_narrow_input

    items = fan_out_narrow_input(items)
    it = items.select(
        F.col(id_col), F.col(vec_col).alias("iv"), _norm_col(vec_col).alias("inorm")
    )
    qs = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("qv"), _norm_col(vec_col).alias("qnorm")
    )
    scored = it.crossJoin(F.broadcast(qs)).select(
        query_id_col,
        id_col,
        F.round(_dot("iv", "qv") / (F.col("inorm") * F.col("qnorm")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def seed_centroids(
    items: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid pick: the n_cells vectors with smallest md5(id).

    ``orderBy(md5).limit(n_cells)`` compiles to TakeOrderedAndProject —
    per-partition top-N plus a driver merge of exactly n_cells rows — so the
    corpus never funnels through one task (the round-1
    ``Window.orderBy`` variant did exactly that).  The tiny picked set is
    collected (bounded by n_cells) and re-emitted as a local relation, which
    downstream broadcasts; no SinglePartition exchange anywhere in the
    distributed plan.
    """
    picked = (
        items.select(
            F.md5(F.col(id_col).cast("string")).alias("_m"),
            F.col(id_col).alias("_sid"),
            F.col(vec_col).alias("centroid"),
        )
        .orderBy("_m", "_sid")
        .limit(n_cells)
    )
    rows = sorted(picked.collect(), key=lambda r: (r["_m"], r["_sid"]))
    spark = items.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in r["centroid"]]) for i, r in enumerate(rows)],
        "cell_id int, centroid array<double>",
    )
    return cents.select("cell_id", "centroid", _norm_col("centroid").alias("cnorm"))


def refine_centroids(
    items: DataFrame,
    centroids: DataFrame,
    rounds: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd re-centering pass(es) over the deterministic seed centroids.

    Per round: assign every vector to its nearest centroid (broadcast,
    map-only), posexplode the vectors, groupBy(cell_id, pos) avg, rebuild the
    per-cell mean arrays — two narrow aggregations whose output is bounded by
    n_cells x dim rows, never a driver loop over data.  Cells that attract no
    vectors keep their seed centroid (coalesce), so cell ids stay stable.

    Float averaging is partition-order sensitive in the last ulp, so refined
    centroids power the PRODUCTION path; the oracled catalog query keeps the
    raw md5 seeds (engine-exact).  Re-centering balances cell populations,
    which improves recall at fixed n_probe (pinned by
    tests/test_dedup_ann_text.py).
    """
    for _ in range(rounds):
        assigned = assign_cells(items, centroids, id_col, vec_col, n_probe=1)
        means = (
            assigned.select("cell_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("x").alias("m"))
        )
        new = (
            means.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell_id", F.expr("transform(pm, s -> s.m)").alias("mean_c"))
        )
        centroids = (
            centroids.select("cell_id", F.col("centroid").alias("seed"))
            .join(new, "cell_id", "left")
            .select("cell_id", F.coalesce("mean_c", "seed").alias("centroid"))
            .select("cell_id", "centroid", _norm_col("centroid").alias("cnorm"))
        )
    return centroids


def assign_cells(
    items: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
    out_id: str = "vec_id",
) -> DataFrame:
    """Attach the n_probe nearest cell ids to every vector (broadcast join).

    The item side is fanned out when it arrives as a narrow single-file
    scan (no-op otherwise) — the per-vector × n_cells similarity map is the
    expensive part of IVF indexing and must parallelize."""
    from .dedup import fan_out_narrow_input

    items = fan_out_narrow_input(items)
    it = items.select(F.col(id_col).alias(out_id), F.col(vec_col), _norm_col(vec_col).alias("vnorm"))
    # sims rounded to 6dp BEFORE ranking: assignment becomes bit-stable across
    # engines/partitionings (cell_id tiebreak), enabling the DuckDB oracle
    joined = it.crossJoin(F.broadcast(centroids)).select(
        out_id,
        vec_col,
        "cell_id",
        F.round(_dot(vec_col, "centroid") / (F.col("vnorm") * F.col("cnorm")), 6).alias("sim"),
    )
    w = Window.partitionBy(out_id).orderBy(F.desc("sim"), F.asc("cell_id"))
    return (
        joined.withColumn("_p", F.row_number().over(w))
        .where(F.col("_p") <= n_probe)
        .select(out_id, vec_col, "cell_id")
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    refine: int = 0,
    centroids: DataFrame | None = None,
    assigned_items: DataFrame | None = None,
) -> DataFrame:
    """IVF-blocked approximate top-k: join items and queries on cell_id only.

    ``refine`` > 0 runs that many Lloyd re-centering rounds over the seeds
    (production path; the oracled catalog query keeps refine=0 for
    engine-exact centroids).  ``centroids`` short-circuits seeding/refining
    with a prebuilt (cell_id, centroid, cnorm) frame, and ``assigned_items``
    additionally short-circuits the item-side cell assignment (an all-items
    × broadcast-centroids pass) with a prebuilt assign_cells(items, cents,
    n_probe=1, out_id=id_col) frame — callers probing multiple n_probe values (e.g.
    ivf_recall_audit) build the index AND the item assignment once; only the
    n_probe-dependent query-side assignment re-runs per probe."""
    if centroids is not None:
        cents = centroids
    else:
        cents = seed_centroids(items, n_cells, id_col, vec_col)  # local relation, broadcast below
        if refine:
            cents = refine_centroids(items, cents, rounds=refine, id_col=id_col, vec_col=vec_col)
    if assigned_items is not None:
        it = assigned_items.withColumnRenamed(vec_col, "iv")
    else:
        it = assign_cells(items, cents, id_col, vec_col, n_probe=1, out_id=id_col).withColumnRenamed(
            vec_col, "iv"
        )
    qs = assign_cells(
        queries, cents, query_id_col, vec_col, n_probe=n_probe, out_id=query_id_col
    ).withColumnRenamed(vec_col, "qv")
    scored = it.join(qs, "cell_id").select(
        query_id_col,
        F.col(id_col),
        F.round(
            _dot("iv", "qv")
            / (
                F.sqrt(F.aggregate(F.transform("iv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
                * F.sqrt(F.aggregate(F.transform("qv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.groupBy(query_id_col, id_col)
        .agg(F.max("cosine").alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def ivf_recall_audit(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probes: tuple[int, ...] = (1, 2, 4),
    sample_queries: int = 32,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Runtime recall observability for IVF callers — the same audit-frame
    discipline as the blocking-recall and skew-cap audits (no silent
    approximation): measure recall@k of ivf_topk against brute-force on a
    deterministic sample of queries, one row per probed n_probe.

    Sampling is md5-ranked (order-free, engine-portable) and bounded by
    ``sample_queries``; brute force runs ONCE on the sample (broadcast
    queries, items stream through), and the IVF index AND the item-side cell
    assignment are built ONCE and reused across all n_probe values (only the
    n_probe-dependent query-side assignment, bounded by the sample, re-runs
    per probe).  Cost: one brute-force pass + one assignment pass over items
    plus len(n_probes) cell-join probes.

    Recall denominates by each query's ACTUAL truth-set size, not k: with
    fewer than k items in the corpus a perfect retrieval would otherwise
    read as recall n_items/k and raise a false alarm in the metrics sink.

    Returns (n_probe, k, n_queries, mean_recall, min_recall), tiny — shaped
    for the lineage metrics sink.
    """
    sampled = (
        queries.select(
            F.md5(F.col(query_id_col).cast("string")).alias("_m"),
            query_id_col,
            vec_col,
        )
        .orderBy("_m", query_id_col)   # TakeOrderedAndProject — no SinglePartition
        .limit(sample_queries)
        .drop("_m")
    )
    truth = brute_force_topk(
        items, sampled, k=k, id_col=id_col, vec_col=vec_col, query_id_col=query_id_col
    ).select(query_id_col, id_col)
    truth = truth.persist()
    n_queries = truth.select(query_id_col).distinct().count()

    cents = seed_centroids(items, n_cells, id_col, vec_col)
    if refine:
        cents = refine_centroids(items, cents, rounds=refine, id_col=id_col, vec_col=vec_col)
    assigned = assign_cells(items, cents, id_col, vec_col, n_probe=1, out_id=id_col).persist()

    # per-query truth-set size — the recall denominator (NOT k: a corpus
    # smaller than k makes hits/k understate a perfect retrieval)
    truth_sizes = truth.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_truth")
    )

    rows = []
    try:
        for n_probe in n_probes:
            approx = ivf_topk(
            items, sampled, k=k, n_cells=n_cells, n_probe=n_probe,
            id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
            centroids=cents, assigned_items=assigned,
            ).select(query_id_col, id_col)
            per_query = (
                truth.join(approx, [query_id_col, id_col], "left_semi")
                .groupBy(query_id_col)
                .agg(F.count(F.lit(1)).alias("hits"))
            )
            # queries whose ENTIRE truth set was missed produce no row — the
            # right join base is the truth-side query list
            agg = (
                truth_sizes
                .join(per_query, query_id_col, "left")
                .fillna({"hits": 0})
                .agg(
                    F.avg(F.col("hits") / F.col("n_truth")).alias("mean_recall"),
                    F.min(F.col("hits") / F.col("n_truth")).alias("min_recall"),
                )
                .collect()[0]
            )
            rows.append(
                (
                    int(n_probe),
                    int(k),
                    int(n_queries),
                    float(agg["mean_recall"] or 0.0),
                    float(agg["min_recall"] or 0.0),
                )
            )
    finally:
        # a failed probe iteration must not leak the cached frames for the
        # session lifetime
        truth.unpersist()
        assigned.unpersist()
    return items.sparkSession.createDataFrame(
        rows,
        "n_probe int, k int, n_queries int, mean_recall double, min_recall double",
    )
