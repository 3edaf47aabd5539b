"""Large-scale training-data deduplication operators.

Beyond the reference's content-hash dedup (ref: src/parse_util.py:1121-1130,
:1441-1450), the suite a 100 TB text pipeline needs:

  exact_dedup          hash-groupBy on (normalized) content
  ngram_jaccard_pairs  char n-gram set Jaccard near-dup pairs within blocks
  minhash_signatures / minhash_band_pairs
                       MinHash + banded LSH (shingle -> minhash -> band ->
                       bucket self-join), pure SQL — engine-portable because
                       the hash is md5-derived (same bits in Spark & DuckDB)
  simhash64            64-bit SimHash over tokens, hamming-distance pairs
  embedding_near_dup   cosine near-duplicates over an embedding column

Everything is native DataFrame ops (no Python in the hot path); the md5-based
hashing keeps every operator reproducible across engines and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocking import shingle_expr


def _md5_i64(col: F.Column, salt: int) -> F.Column:
    """Deterministic 63-bit int hash from md5 (portable to DuckDB: same md5)."""
    return F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{salt}"))), 1, 15), 16, 10).cast(
        "long"
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical content; keeper = min id (deterministic)."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    block_cols: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-block char-n-gram Jaccard near-duplicate pairs >= threshold."""
    sh = docs.select(
        *block_cols, F.col(id_col), shingle_expr(text_col, n).alias("sh")
    ).where(F.size("sh") > 0)
    a = sh.select(*block_cols, F.col(id_col).alias("left_id"), F.col("sh").alias("sha"))
    b = sh.select(*block_cols, F.col(id_col).alias("right_id"), F.col("sh").alias("shb"))
    pairs = a.join(b, list(block_cols)).where(F.col("left_id") < F.col("right_id"))
    jac = F.size(F.array_intersect("sha", "shb")) / F.size(F.array_union("sha", "shb"))
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 16,
    shingle_n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature via salted min over shingles.

    explode shingles -> per-salt min aggregation: one shuffle, map-side
    combinable, no UDF.  hash_fn="md5" gives engine-portable bits (DuckDB
    oracle parity); hash_fn="xxhash64" is ~10x cheaper and is what the ER
    blocking hot path uses.
    """
    exploded = docs.select(
        F.col(id_col), F.explode(shingle_expr(text_col, shingle_n)).alias("sh")
    )
    if hash_fn == "md5":
        aggs = [F.min(_md5_i64(F.col("sh"), i)).alias(f"h{i}") for i in range(n_hashes)]
    elif hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_band_pairs(
    signatures: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    band_cap: int | None = None,
    cap_seed: int = 23120334,
) -> DataFrame:
    """Banded LSH: docs sharing any full band of minhashes become a pair.

    All bands are keyed in ONE pass (posexplode of the band-key array) so the
    self-join runs once on (band_idx, band_key) instead of ``bands`` separate
    joins.  ``band_cap`` bounds any band bucket (boilerplate content shared by
    thousands of docs would otherwise explode quadratically): deterministic
    xxhash64-ranked row_number, same discipline as blocking's skew cap.
    """
    from pyspark.sql.window import Window

    rows = n_hashes // bands
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"h{b * rows + r}").cast("string") for r in range(rows)]
                )
            )
            for b in range(bands)
        ]
    )
    keyed = signatures.select(
        F.col(id_col), F.posexplode(band_keys).alias("band_idx", "band_key")
    )
    if band_cap is not None:
        w = Window.partitionBy("band_idx", "band_key").orderBy(
            F.xxhash64(id_col, F.lit(cap_seed)), F.col(id_col)
        )
        keyed = keyed.withColumn("_rk", F.row_number().over(w)).where(
            F.col("_rk") <= band_cap
        ).drop("_rk")
    l = keyed.select(F.col(id_col).alias("left_id"), "band_idx", "band_key")
    r = keyed.select(F.col(id_col).alias("right_id"), "band_idx", "band_key")
    return (
        l.join(r, ["band_idx", "band_key"])
        .where(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .distinct()
    )


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    For each bit b: sum over tokens of (+1 if bit set else -1); bit = sign.
    Expressed as explode -> per-bit conditional sums -> bit reassembly; all
    native aggregations (64 conditional sums, one shuffle).

    hash_fn="xxhash64" is the production path (full 64 informative bits,
    cheapest); hash_fn="md5" derives a 60-bit token hash from md5 hex so
    DuckDB reproduces the exact same simhash values (oracle parity; bits
    60-63 stay zero in both engines).
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    if hash_fn == "md5":
        h = toks.withColumn("th", _md5_i64(F.col("tok"), 0))
    elif hash_fn == "xxhash64":
        h = toks.withColumn("th", F.xxhash64("tok"))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(th >> {b}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = h.groupBy(id_col).agg(*bit_aggs)
    bit_terms = [
        F.expr(
            f"CASE WHEN b{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b})"
            f" ELSE CAST(0 AS BIGINT) END"
        )
        for b in range(64)
    ]
    expr = bit_terms[0]
    for t in bit_terms[1:]:
        expr = expr.bitwiseOR(t)
    return sums.select(F.col(id_col), expr.alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    prefix_bits: int = 16,
    block_cap: int | None = 1000,
    cap_seed: int = 23120334,
    return_metrics: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Near-dup pairs with hamming(simhash) <= max_hamming, blocked on the
    top ``prefix_bits`` bits (single-probe LSH; catches most close pairs).

    ``block_cap`` bounds any prefix-bit bucket before the self-join — a
    boilerplate-heavy corpus can drop thousands of docs into one 16-bit
    bucket, going quadratic without it.  Ranking is md5(id)-ordered (stable
    under any partitioning AND engine-portable, so a DuckDB oracle with the
    same cap reproduces the exact pair set).  Cap events are counted into a
    metrics frame — no silent truncation; pass return_metrics=True to get it.
    """
    from pyspark.sql.window import Window

    keyed = sim.select(
        F.col(id_col),
        F.col("simhash"),
        F.expr(f"simhash >> {64 - prefix_bits}").alias("block"),
    )
    metrics = None
    if block_cap is not None:
        w = Window.partitionBy("block").orderBy(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{cap_seed}"))),
            F.col(id_col),
        )
        ranked = keyed.withColumn("_rk", F.row_number().over(w))
        metrics = (
            ranked.groupBy("block")
            .agg(F.count(F.lit(1)).alias("block_size"))
            .where(F.col("block_size") > block_cap)
            .select(
                F.col("block").cast("string").alias("block_key"),
                "block_size",
                F.lit(block_cap).alias("cap"),
                (F.col("block_size") - block_cap).alias("rows_dropped"),
            )
        )
        keyed = ranked.where(F.col("_rk") <= block_cap).drop("_rk")
    a = keyed.select(F.col(id_col).alias("left_id"), F.col("simhash").alias("sa"), "block")
    b = keyed.select(F.col(id_col).alias("right_id"), F.col("simhash").alias("sb"), "block")
    pairs = a.join(b, "block").where(F.col("left_id") < F.col("right_id"))
    hamming = F.bit_count(F.expr("sa ^ sb"))
    out = pairs.select(
        "left_id", "right_id", hamming.alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
    if return_metrics:
        empty_schema = "block_key string, block_size long, cap int, rows_dropped long"
        if metrics is None:
            metrics = sim.sparkSession.createDataFrame([], empty_schema)
        return out, metrics
    return out


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_expr: F.Column | None = None,
    allow_full_scan: bool = False,
) -> DataFrame:
    """Cosine near-duplicates over an embedding column.

    Brute-force within blocks using native array math (zip_with +
    aggregate — no Python).  ``block_expr`` is REQUIRED at scale: without it
    the self-join is a whole-corpus cross product.  Callers that genuinely
    want the all-pairs baseline (small verification sets) must say so with
    ``allow_full_scan=True``; otherwise we refuse rather than silently
    launching an O(n^2) job.  The scale path blocks first (see ann.ivf_topk).
    """
    if block_expr is None and not allow_full_scan:
        raise ValueError(
            "embedding_near_dup without block_expr is a full O(n^2) cross "
            "product; pass block_expr (e.g. an IVF cell id or metadata key) "
            "or explicitly opt in with allow_full_scan=True"
        )
    normed = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(
            F.aggregate(
                F.transform(vec_col, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("norm"),
        (block_expr if block_expr is not None else F.lit(0)).alias("block"),
    )
    a = normed.select(
        F.col(id_col).alias("left_id"), F.col(vec_col).alias("va"),
        F.col("norm").alias("na"), "block",
    )
    b = normed.select(
        F.col(id_col).alias("right_id"), F.col(vec_col).alias("vb"),
        F.col("norm").alias("nb"), "block",
    )
    pairs = a.join(b, "block").where(F.col("left_id") < F.col("right_id"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        pairs.withColumn("cosine", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("left_id", "right_id", "cosine")
    )
