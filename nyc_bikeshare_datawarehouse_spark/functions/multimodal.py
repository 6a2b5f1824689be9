"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Design (the part that must be real at 100 TB):
- An asset is a row: `asset_id long, modality string, content binary,
  meta struct<mime string, width int, height int, sample_rate int,
  duration_ms long>`. Binary payloads live inline for small assets or as
  URI references (`content_uri`) for large ones — both schemas declared
  here so writers/readers agree.
- Decode / feature-extract / resize / frame-sample run as **Arrow-batched
  `mapInPandas`** operators: Spark streams record batches into Python, the
  heavy codec work happens per batch (not per row), and the output schema
  is fixed up front so Catalyst can plan around the op.
- The codec layer itself (PIL/ffmpeg/librosa) is NOT in this environment,
  so `decode_fn=None` uses a deterministic fake decoder (metadata-derived)
  and real deployments inject the codec callable. The Spark-side contract —
  schemas, batching, partition sizing — is identical either way.

Partitioning guidance: binary-heavy tables should be written with
`maxRecordsPerFile` tuned so files stay ~128-256 MB, and processed with
`spark.sql.files.maxPartitionBytes` at default 128 MB so one task holds a
bounded number of payloads in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),  # image | audio | video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("content_uri", T.StringType(), True),
    T.StructField(
        "meta",
        T.StructType([
            T.StructField("mime", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]),
        True,
    ),
])

FEATURE_SCHEMA = "asset_id long, modality string, n_bytes long, sha int, feature array<float>"


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real encoder: md5-seeded values.
    Real deployments replace this via `decode_fn`."""
    h = hashlib.md5(payload or b"").digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] | None = None,
    dim: int = 8,
) -> DataFrame:
    """Batch feature extraction over binary content via mapInPandas.

    `decode_fn(payload, modality) -> list[float]` is the pluggable codec+
    encoder; absent one, a deterministic md5-based fake keeps the pipeline
    testable end-to-end (clearly marked — NOT a real decoder)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            feats, shas, sizes = [], [], []
            for payload, modality in zip(payloads, pdf["modality"]):
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                shas.append(int.from_bytes(hashlib.sha256(raw).digest()[:4], "big") // 2)
                if decode_fn is not None:
                    feats.append(decode_fn(raw, modality))
                else:
                    feats.append(_fake_feature(raw, dim))
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": sizes,
                "sha": shas,
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def _pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real codec path, import-gated: PIL decode → resize → PNG re-encode.
    Raises NotImplementedError where PIL is not installed (this container);
    deployments either install PIL or inject their own `codec_fn`."""
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - PIL absent in CI container
        raise NotImplementedError(
            "image codec (PIL) not available in this environment; "
            "install PIL or inject codec_fn to enable resize_images"
        ) from e
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    out = io.BytesIO()  # pragma: no cover
    img.resize((width, height)).save(out, format="PNG")  # pragma: no cover
    return out.getvalue()  # pragma: no cover


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    codec_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize operator over Arrow-batched mapInPandas.

    `codec_fn(payload, width, height) -> bytes` is the pluggable codec
    (real codecs parse their own headers); the default is the import-gated
    PIL path, which raises NotImplementedError at EXECUTION time where PIL
    is absent — the plan (schema, batch shape) is constructible either way.
    Image rows get resized content and meta.width/height rewritten to the
    target; null-content and non-image rows pass through unchanged."""
    codec = codec_fn or _pil_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for content, modality, meta in zip(
                pdf["content"], pdf["modality"], pdf["meta"]
            ):
                if modality == "image" and content is not None:
                    contents.append(codec(bytes(content), width, height))
                    new_meta = dict(meta) if meta is not None else {}
                    new_meta["width"] = width
                    new_meta["height"] = height
                    metas.append(new_meta)
                else:
                    contents.append(content)
                    metas.append(meta)
            out = pdf.copy()
            out["content"] = contents
            out["meta"] = metas
            yield out

    return df.mapInPandas(run, schema=ASSET_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    With no video codec in this environment, frames are *planned* from
    metadata (duration_ms / every_ms synthetic frame index rows) so the
    explode shape, schema, and partition behavior are real; the decoded
    frame payload is null until a codec is injected."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("frame_ms", F.col("frame_idx") * F.lit(every_ms))
        .withColumn("frame_content", F.lit(None).cast("binary"))
    )
