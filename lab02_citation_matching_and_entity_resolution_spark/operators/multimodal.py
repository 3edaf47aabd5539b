"""Multimodal column operators: image/audio/video as opaque binary columns.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow batch
shape, mapInPandas signatures; the actual codec work is stubbed behind
``DecodeUnavailable`` / a deterministic fake because no image/audio libraries
exist in this container (swap ``_decode_image_stub`` for a PIL/libvips call on
a real cluster; nothing else changes).

Schema convention for a multimodal asset table:

    assets(asset_id string, kind string,            -- image|audio|video
           payload binary, media_type string,
           width int, height int, duration_ms int)  -- typed metadata

Feature extraction runs as mapInPandas over Arrow batches: one Python worker
call per batch (bounded by spark.sql.execution.arrow.maxRecordsPerBatch), no
per-row Python through the JVM boundary.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("content_hash", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real decoders when the codec library is absent."""


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake 'decode' — 16-dim feature from content bytes.

    A real deployment replaces this with PIL/libvips decode + model features;
    the deterministic fake keeps the distributed plumbing testable here.
    """
    if payload is None:
        raise DecodeUnavailable("no payload")
    digest = hashlib.sha256(payload).digest()
    return (np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0)


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow-batched)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, hashes, sizes = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    hashes.append(None)
                    sizes.append(None)
                    continue
                raw = bytes(payload)
                feats.append(_decode_image_stub(raw).tolist())
                hashes.append(hashlib.sha256(raw).hexdigest()[:16])
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(sizes, dtype="Int32"),
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) — the
    explode is native; actual frame decode happens in extract_features."""
    return (
        assets.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("asset_id", "frame_ts_ms", "payload")
    )


def asset_near_dup(
    assets: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 64,
    refine_rounds: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Multimodal face of the dedup suite: returns (exact, near).

    exact — byte-identical payload groups (content_hash groupBy, min-id
    keeper, same contract as dedup.exact_dedup); near — feature-cosine
    near-duplicates within (kind, IVF cell) blocks via
    dedup.embedding_near_dup.  Composes the binary plumbing with the
    text-corpus dedup operators unchanged — at scale the feature column
    comes from a real decoder+model, everything downstream is identical.

    Blocking is (kind, cell_id), the same seed/refine/assign IVF
    composition the dedup pipeline uses for text embeddings
    (plans/dedup_pipeline.py "embedding" pass): blocking on ``kind`` alone
    put every image in ONE block — the O(n^2)-per-modality cross product
    embedding_near_dup itself refuses to run implicitly (round-6 verdict
    finding #4).  ``n_cells`` bounds the quadratic term to
    O((n/n_cells)^2 * n_cells) per kind; identical payloads always share a
    cell (identical vectors), and near-dup pairs straddling a cell boundary
    are the documented n_probe=1 recall trade — audit with
    ann.ivf_recall_audit, as the dedup pipeline does.  ``n_cells=1``
    restores the exhaustive per-kind scan for small verification sets.

    Both outputs are LAZY plans over the same extract_features frame; a
    caller materializing both should persist the feature frame itself
    (``extract_features(assets).persist()`` + build the two aggregates on
    that) — persisting here would pin executor storage with no handle for
    the caller to release.
    """
    from .ann import assign_cells, refine_centroids, seed_centroids
    from .dedup import embedding_near_dup

    feats = extract_features(assets)
    exact = (
        feats.where(F.col("content_hash").isNotNull())
        .groupBy("content_hash")
        .agg(
            F.min("asset_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )
    emb = feats.where(F.col("feature").isNotNull()).select(
        F.col("asset_id").alias("vec_id"),
        F.col("kind"),
        F.col("feature").cast("array<double>").alias("embedding"),
    )
    if n_cells > 1:
        cents = seed_centroids(emb, n_cells, id_col="vec_id", vec_col="embedding")
        if refine_rounds:
            cents = refine_centroids(
                emb, cents, rounds=refine_rounds, id_col="vec_id",
                vec_col="embedding",
            )
        assigned = assign_cells(
            emb, cents, id_col="vec_id", vec_col="embedding", n_probe=1,
            out_id="vec_id",
        )
        # assign_cells projects to (vec_id, embedding, cell_id); kind rides
        # back in via its id — a slim join, no payload
        emb = assigned.join(emb.select("vec_id", "kind"), "vec_id")
        block = F.concat_ws("#", F.col("kind"), F.col("cell_id").cast("string"))
    else:
        block = F.col("kind")
    near = embedding_near_dup(emb, threshold=threshold, block_expr=block)
    return exact, near


def synthetic_assets(spark, n: int = 32) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"asset{i}".encode()).digest() * 4
        rows.append(
            (
                f"a{i:04d}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                3000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
