"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The decode step itself is STUBBED (image/audio libraries are not in this
container): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder derives
features from the bytes (so the Spark-side plumbing — schema, partitioning,
UDF signature, batch shape — is real and tested end-to-end).

Schema convention:
  blob        binary         -- the raw payload
  media_type  string         -- e.g. 'image/png', 'audio/wav', 'text/fake'
  meta        struct<...>    -- typed metadata (width/height/sample_rate/...)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def attach_fake_blobs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a binary payload column from text (UTF-8 bytes) so the
    binary pipeline can be exercised without real media files."""
    return df.select(
        F.col(id_col).alias("blob_id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.lit("text/fake").alias("media_type"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit("utf-8").alias("encoding"),
        ).alias("meta"),
    )


def _fake_image_decode(payload: bytes) -> np.ndarray:
    """Deterministic fake: bytes -> pseudo 8x8 grayscale 'image'."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    size = 64
    if len(arr) >= size:
        img = arr[:size]
    else:
        img = np.pad(arr, (0, size - len(arr)), constant_values=0)
    return img.reshape(8, 8)


def decode_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    Real decode path is a clearly-marked stub; the fake path derives
    deterministic per-blob features (byte stats + fake-image stats) so
    schema/batching/partitioning are fully exercised.
    """
    if not fake:
        # STUB: real decoders (PIL/torchaudio/av) are not installed in this
        # environment. The Spark plumbing below is identical for the real
        # path — only the per-payload function changes.
        raise NotImplementedError("real media decode requires PIL/av; use fake=True")

    out_schema = (
        "blob_id long, n_bytes int, n_distinct_bytes int, "
        "mean_byte double, img_row_sum_0 int, img_col_sum_0 int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob_id, blob in zip(pdf["blob_id"], pdf["blob"]):
                payload = bytes(blob)
                arr = np.frombuffer(payload, dtype=np.uint8)
                img = _fake_image_decode(payload)
                rows.append(
                    {
                        "blob_id": int(blob_id),
                        "n_bytes": int(len(arr)),
                        "n_distinct_bytes": int(len(np.unique(arr))),
                        "mean_byte": round(float(arr.mean()) if len(arr) else 0.0, 6),
                        "img_row_sum_0": int(img[0].sum()),
                        "img_col_sum_0": int(img[:, 0].sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("blob_id", "blob").mapInPandas(extract, schema=out_schema)


def resize(df: DataFrame, width: int = 8, height: int = 8, fake: bool = True) -> DataFrame:
    """Resize plumbing: decode -> resample to (width x height) -> summary.

    Real decode/resample is a clearly-marked stub (no PIL/cv2 in this
    container); the fake path nearest-neighbor-samples the byte stream to
    width*height samples — deterministic, so the output (dims + sample
    checksum) is testable against a pure-python reference. The Spark side
    (Arrow batches, schema, partition-parallel map) is the real thing."""
    if not fake:
        raise NotImplementedError("real image resize requires PIL/cv2; use fake=True")

    out_schema = "blob_id long, width int, height int, checksum bigint"
    n_samples = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob_id, blob in zip(pdf["blob_id"], pdf["blob"]):
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                if len(b):
                    # nearest-neighbor stride over the byte stream
                    idx = (np.arange(n_samples) * len(b)) // n_samples
                    checksum = int(b[idx].astype(np.int64).sum())
                else:
                    checksum = 0
                rows.append(
                    {
                        "blob_id": int(blob_id),
                        "width": width,
                        "height": height,
                        "checksum": checksum,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("blob_id", "blob").mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """'Frame sampling' over the fake byte stream: one row per sampled
    offset — the same explode-by-offset plumbing a real video frame sampler
    uses (decode stubbed, offsets real)."""
    n_frames = F.floor(F.col("meta.n_bytes") / every_n_bytes).cast("int")
    return df.select(
        "blob_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
        (F.col("meta.n_bytes") - F.lit(0)).alias("n_bytes"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
