"""Domain-mix sampling for training-data assembly.

Training corpora are blended to target per-domain proportions ("20% code,
30% books, ...").  ``mix_sample`` draws a deterministic quota sample: each
stratum contributes the ``k_s`` docs with the smallest md5 rank, where the
``k_s`` follow the target fractions under largest-remainder rounding (so the
quotas sum to exactly ``n_out``).  Everything is md5-derived and therefore
engine-portable and partition-stable — rerunning on a differently-sharded
copy of the corpus selects the SAME documents, which is what makes the mix
reproducible and auditable.

Scale shape: one broadcast join against the tiny quota table plus a window
rank PARTITIONED BY the stratum column — per-stratum parallel, no
single-partition exchange.  The rank sort is the deterministic price; for
approximate throwaway mixes ``DataFrame.sampleBy`` is cheaper but neither
deterministic across partitionings nor exact in count.

Beyond-reference training-pipeline operator (the reference repo has no
mixing stage); complements M2 stratified sampling (keep-all-positives
hash-negative sampling) which serves model training rather than corpus
blending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def largest_remainder_quotas(targets: dict[str, float], n_out: int) -> dict[str, int]:
    """Integer quotas per stratum summing to exactly n_out, largest-remainder
    apportionment, ties broken by stratum name (deterministic)."""
    if n_out < 0:
        raise ValueError(f"n_out must be >= 0, got {n_out}")
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"target fractions must sum to 1, got {total}")
    if any(f < 0 for f in targets.values()):
        raise ValueError("target fractions must be non-negative")
    floors = {s: int(n_out * f) for s, f in targets.items()}
    rem = n_out - sum(floors.values())
    order = sorted(targets, key=lambda s: (-(n_out * targets[s] - floors[s]), s))
    for s in order[:rem]:
        floors[s] += 1
    return floors


def mix_sample(
    docs: DataFrame,
    targets: dict[str, float],
    n_out: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 11,
) -> DataFrame:
    """Deterministic quota sample hitting the target domain mix.

    Strata absent from ``targets`` are dropped; a stratum with fewer rows
    than its quota contributes everything it has (use ``mix_audit`` to see
    the shortfall — silent under-delivery is what the audit frame is for).
    Returns the input columns unchanged.
    """
    quotas = largest_remainder_quotas(targets, n_out)
    spark = docs.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(
            sorted(quotas.items()), f"{strata_col} string, _quota long"
        )
    )
    rank = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#mix{seed}")))
    w = Window.partitionBy(strata_col).orderBy("_rank", id_col)
    return (
        docs.join(qdf, strata_col)
        .withColumn("_rank", rank)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("_quota"))
        .drop("_rank", "_rn", "_quota")
    )


def mix_audit(
    sample: DataFrame,
    targets: dict[str, float],
    n_out: int,
    strata_col: str = "source",
) -> DataFrame:
    """(stratum, quota, delivered, shortfall) — the no-silent-caps audit for
    mix_sample: a stratum smaller than its quota under-delivers quietly in
    the sample itself, loudly here.  Tiny frame, shaped for the metrics
    sink."""
    quotas = largest_remainder_quotas(targets, n_out)
    spark = sample.sparkSession
    qdf = spark.createDataFrame(
        sorted(quotas.items()), f"{strata_col} string, quota long"
    )
    got = sample.groupBy(strata_col).agg(F.count(F.lit(1)).alias("delivered"))
    return (
        qdf.join(got, strata_col, "left")
        .fillna({"delivered": 0})
        .select(
            strata_col,
            "quota",
            "delivered",
            (F.col("quota") - F.col("delivered")).alias("shortfall"),
        )
    )
