"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the 100 TB part is the plumbing, not the codec):

- payloads live in a ``binary`` column next to a typed metadata struct
  (media_type, byte length, content hash) — scans prune the binary column
  unless a stage actually consumes it (columnar parquet: metadata-only
  queries never read the bytes);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole batches
  across the JVM↔Python boundary, output schema declared up front;
- partition sizing: Python-side memory is bounded per Arrow BATCH
  (``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k rows),
  not per partition — batches stream — so no defensive repartition (an
  extra shuffle + full pass over the binary column) is inserted. Balance
  binary-bearing SCANS at read time via
  ``spark.sql.files.maxPartitionBytes`` (small values split fat parquet
  files into more tasks for free); pass ``num_partitions`` only to force
  an explicit reshuffle, e.g. after a skewing filter.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_image`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic structural decoder (dimensions/pixels derived
from the bytes) — the Spark-side contract (schemas, batching, partition
strategy) is identical either way and is what the tests cover.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "id bigint, media_type string, n_bytes int, content_md5 string,"
    " width int, height int, mean_intensity double"
)


def attach_binary_payload(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Normalize to the engine's multimodal layout:
    (id, media_type, n_bytes, content_md5, payload binary)."""
    payload = F.col(payload_col)
    binary = payload if dict(df.dtypes)[payload_col] == "binary" else F.encode(payload, "utf-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(binary).alias("n_bytes"),
        F.md5(binary.cast("string")).alias("content_md5"),
        binary.alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic structural stand-in for an image codec: derives
    (width, height, mean_intensity) from the bytes themselves."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean = sum(payload[:256]) / max(min(len(payload), 256), 1) if payload else 0.0
    return width, height, round(mean, 6)


def decode_image_features(
    df: DataFrame,
    fake: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Binary payloads → per-item features via Arrow-batched mapInPandas.

    With a real codec installed, replace the fake branch with
    ``PIL.Image.open(io.BytesIO(b))``; everything else stays identical.
    No implicit repartition: Arrow batches bound Python memory, and
    read-time ``spark.sql.files.maxPartitionBytes`` balances the scan —
    see the module docstring.
    """
    try:
        if not fake:
            import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image codec not available in this environment; call with fake=True "
            "to exercise the pipeline with the deterministic structural decoder"
        ) from None

    sized = df.repartition(num_partitions) if num_partitions else df

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(b)) for b in pdf["payload"]]
            out = pdf[["id", "media_type", "n_bytes", "content_md5"]].copy()
            out["width"] = [f_[0] for f_ in feats]
            out["height"] = [f_[1] for f_ in feats]
            out["mean_intensity"] = [f_[2] for f_ in feats]
            yield out

    return sized.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = "id bigint, width int, height int, payload binary"


def resize_images(
    df: DataFrame,
    max_side: int = 32,
    fake: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Bounded-dimension 'resize' stage over binary payloads via
    Arrow-batched mapInPandas: emits (id, width, height, payload) with both
    sides ≤ ``max_side`` and aspect ratio preserved. With a real codec this
    is ``PIL.Image.resize``; the ``fake`` branch derives dimensions via the
    structural decoder and truncates the payload proportionally to the area
    change — output schema, batching, and partition strategy are the
    production contract either way. No implicit repartition (see module
    docstring)."""
    try:
        if not fake:
            import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image codec not available in this environment; call with fake=True "
            "to exercise the pipeline with the deterministic structural resizer"
        ) from None

    sized = df.repartition(num_partitions) if num_partitions else df

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads = [], [], [], []
            for i, b in zip(pdf["id"], pdf["payload"]):
                raw = bytes(b)
                w0, h0, _ = _fake_decode(raw)
                scale = min(1.0, max_side / max(w0, h0))
                w1, h1 = max(1, int(w0 * scale)), max(1, int(h0 * scale))
                keep = max(1, int(len(raw) * (w1 * h1) / max(w0 * h0, 1)))
                ids.append(i)
                ws.append(w1)
                hs.append(h1)
                payloads.append(raw[:keep])
            yield pd.DataFrame({"id": ids, "width": ws, "height": hs, "payload": payloads})

    return sized.mapInPandas(resize, schema=RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over opaque payloads: emit evenly spaced byte
    offsets per item (stand-in for video frame extraction). Pure Spark
    expressions — demonstrates the explode-to-frames partition shape
    without a codec."""
    return df.select(
        "id",
        F.posexplode(
            F.slice(
                F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes)),
                1,
                max_frames,
            )
        ).alias("frame_no", "byte_offset"),
    )
