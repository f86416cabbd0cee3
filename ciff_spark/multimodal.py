"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched UDFs over ``mapInPandas``.

The Spark-side machinery (schemas, batch shapes, partition sizing, UDF
signatures) is real and tested; the actual media DECODE is stubbed — the
image/audio libraries are not in this container — behind an import-try with a
deterministic fake so pipelines are end-to-end runnable. Swapping
``_decode_image_stub`` for a PIL/libav call changes nothing structurally.

Scale notes: binary payloads ride Parquet/Arrow as-is (no base64 inflation);
``maxRecordsPerBatch`` bounds decoder memory (batch_bytes ≈ records ×
payload); feature vectors come back as ``array<float>`` feeding the
simsearch operators.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int"
)

FEATURE_DIM = 32

try:  # real decoders, if ever present in the image
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _media_rows(n: int, seed: int = 42) -> list[tuple]:
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        kind = ("image", "audio", "video")[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8)
        rows.append(
            (
                i, kind, payload.tobytes(),
                int(rng.integers(16, 512)) if kind == "image" else None,
                int(rng.integers(16, 512)) if kind == "image" else None,
                16000 if kind == "audio" else None,
                int(rng.integers(100, 60000)) if kind != "image" else None,
            )
        )
    return rows


def synth_media_df(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded pseudo-bytes)."""
    return spark.createDataFrame(_media_rows(n, seed), MEDIA_SCHEMA)


def stage_media_parquet(path: str, n: int, seed: int = 42) -> str:
    """Write the synthetic media table to ONE parquet file (idempotent —
    content is a pure function of (n, seed)). Both the Spark queries and the
    DuckDB oracle SQL read this same file, so the multimodal entries get a
    full value-hash check instead of the rows-only fallback."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = _media_rows(n, seed)
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "kind": pa.array(cols[1], pa.string()),
            "payload": pa.array(cols[2], pa.binary()),
            "width": pa.array(cols[3], pa.int32()),
            "height": pa.array(cols[4], pa.int32()),
            "sample_rate": pa.array(cols[5], pa.int32()),
            "duration_ms": pa.array(cols[6], pa.int32()),
        }
    )
    tmp = f"{path}.__tmp_{os.getpid()}"
    papq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic: concurrent stagers settle on one file
    return path


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: payload bytes → pseudo-pixel array.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))``;
    raising here when the caller demands a real decode keeps the contract
    honest."""
    if HAVE_PIL:  # pragma: no cover - library absent in this container
        raise NotImplementedError("real decode path not wired in this sandbox")
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], "<u8")[0])
    return rng.integers(0, 256, size=(min(height or 8, 8), min(width or 8, 8), 3), dtype=np.uint8)


def stage_expected_features_parquet(
    path: str, n: int, seed: int = 42, dim: int = FEATURE_DIM
) -> str:
    """Golden expected output of :func:`extract_features` over the synthetic
    media table, computed WITHOUT Spark (plain driver-side loop) and staged as
    one parquet file: (media_id, kind, dim_idx, fv float32). The DuckDB oracle
    reads this file, so ``mm_feature_extract`` gets a full value-hash check of
    the Arrow-batch plumbing (batching, null metadata handling, row
    completeness) instead of the rows-only fallback. The decode stub is shared
    — it IS the spec — but the reduction and the execution path are
    independent."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ids, kinds, idxs, fvs = [], [], [], []
    for media_id, kind, payload, width, height, _sr, _dur in _media_rows(n, seed):
        px = _decode_image_stub(payload, width if width else 8, height if height else 8)
        flat = px.reshape(-1).astype(np.float64)
        k = max(1, flat.size // dim)
        vec = flat[: k * dim].reshape(dim, k).sum(axis=1) / k
        # np.linalg.norm, not sqrt((v*v).sum()): BLAS ddot sums sequentially,
        # pairwise summation can differ by an ULP — the staged golden must be
        # bit-identical to the UDF's arithmetic
        vec = (vec / (np.linalg.norm(vec) or 1.0)).astype(np.float32)
        ids.extend([media_id] * dim)
        kinds.extend([kind] * dim)
        idxs.extend(range(dim))
        fvs.extend(vec.tolist())
    tbl = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "dim_idx": pa.array(idxs, pa.int32()),
            "fv": pa.array(fvs, pa.float32()),
        }
    )
    tmp = f"{path}.__tmp_{os.getpid()}"
    papq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """media → (media_id, kind, feature array<float>): Arrow-batched,
    vectorized per batch; the decode is per-item (as any codec is), the
    feature reduction is NumPy."""

    def run(batches):
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                # nullable int columns arrive as NaN in pandas, not None
                px = _decode_image_stub(
                    payload,
                    int(w) if pd.notna(w) else 8,
                    int(h) if pd.notna(h) else 8,
                )
                flat = px.reshape(-1).astype(np.float64)
                k = max(1, len(flat) // dim)
                vec = flat[: k * dim].reshape(dim, k).mean(axis=1)
                vec = vec / (np.linalg.norm(vec) or 1.0)
                feats.append(vec.astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema="media_id bigint, kind string, feature array<float>")


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video/audio → one row per sampled frame timestamp (metadata-driven;
    the decode of the frame itself is the same stubbed boundary)."""
    return (
        df.where(F.col("kind").isin("video", "audio"))
        .select(
            "media_id",
            "kind",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Operational stats over the binary column — pure built-ins. avg is
    derived from the exact integer sum so cross-engine rounding can't flip."""
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        )
        .withColumn("avg_bytes", F.round(F.col("total_bytes") / F.col("n"), 6))
    )
