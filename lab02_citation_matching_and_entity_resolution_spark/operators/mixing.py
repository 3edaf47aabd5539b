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
    # normalize by the actual sum: fractions that pass the 1e-6 gate but are
    # not exactly 1 would otherwise make rem negative or larger than the
    # stratum count at large n_out (silent over-/under-delivery of up to
    # n_out*1e-6 docs); clamp is belt-and-braces for float pathologies
    norm = {s: f / total for s, f in targets.items()}
    floors = {s: int(n_out * f) for s, f in norm.items()}
    rem = n_out - sum(floors.values())
    rem = max(0, min(rem, len(norm)))
    order = sorted(norm, key=lambda s: (-(n_out * norm[s] - floors[s]), s))
    for s in order[:rem]:
        floors[s] += 1
    assert sum(floors.values()) == n_out, (floors, n_out)
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
    tmp_rank, tmp_rn, tmp_quota = "__mix_rank", "__mix_rn", "__mix_quota"
    clash = {tmp_rank, tmp_rn, tmp_quota} & set(docs.columns)
    if clash:
        raise ValueError(
            f"mix_sample: input carries reserved temporary column(s) {sorted(clash)}"
        )
    spark = docs.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(
            sorted(quotas.items()), f"{strata_col} string, {tmp_quota} long"
        )
    )
    rank = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#mix{seed}")))
    w = Window.partitionBy(strata_col).orderBy(tmp_rank, id_col)
    return (
        docs.join(qdf, strata_col)
        .withColumn(tmp_rank, rank)
        .withColumn(tmp_rn, F.row_number().over(w))
        .where(F.col(tmp_rn) <= F.col(tmp_quota))
        .drop(tmp_rank, tmp_rn, tmp_quota)
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
