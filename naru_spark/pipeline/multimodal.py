"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

Decode is REAL for the codecs stdlib+numpy can handle — binary netpbm
images (``decode_pnm``: P5/P6, comments, 16-bit maxval) and PCM WAV
(``decode_wav``) — and those paths sit inside the hard DuckDB gate via
closed-form synthetic media (``attach_synth_media``). Compressed codecs
(JPEG/PNG/MP3/H.264) genuinely require PIL/av, absent in this container:
those paths raise a clearly-marked NotImplementedError, with the
deterministic fake decoder keeping their Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — tested end-to-end.

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


# ------------------------------------------------------------- REAL decoders
# Not every codec needs an external library: the netpbm image family and
# PCM WAV are fully decodable with numpy + stdlib, so for these the decode
# step is REAL, not stubbed — the NotImplementedError below now only covers
# compressed codecs (JPEG/PNG/MP3/H.264) that genuinely require PIL/av.


def decode_pnm(payload: bytes) -> np.ndarray:
    """Decode a binary netpbm image: P5 (grayscale) -> [H, W] uint8/uint16,
    P6 (RGB) -> [H, W, 3]. Full header parsing: '#' comments, arbitrary
    whitespace, maxval (>255 -> big-endian 16-bit samples per the spec)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload: {payload[:2]!r}")
    # tokenize the header: magic, width, height, maxval; '#' starts a comment
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        # a token ends at whitespace OR at '#' (a comment may directly
        # follow the digits, e.g. '255# c\n<raster>')
        while (
            j < len(payload)
            and not payload[j : j + 1].isspace()
            and payload[j : j + 1] != b"#"
        ):
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    # the raster starts after a SINGLE whitespace byte following maxval —
    # but tolerate the two writer variants that silently shift frombuffer's
    # offset if assumed away: a comment line between maxval and raster, and
    # a CRLF terminator. Anything else after maxval is a malformed header
    # (fail loudly: a mis-offset read shifts EVERY pixel, undetectably).
    if payload[i : i + 1] == b"#":
        # comment directly after the maxval digits ('255# c\n<raster>'):
        # the comment's newline IS the header-terminating whitespace
        while i < len(payload) and payload[i : i + 1] != b"\n":
            i += 1
        i += 1
    else:
        b = payload[i : i + 1]
        if not b.isspace():
            raise ValueError(
                f"malformed netpbm header: expected whitespace after maxval, got {b!r}"
            )
        i += 1
        if b == b"\r" and payload[i : i + 1] == b"\n":
            i += 1  # CRLF writer: consume both bytes of the terminator
    width, height, maxval = tokens
    channels = 3 if payload[:2] == b"P6" else 1
    dtype = np.dtype(">u2") if maxval > 255 else np.uint8
    count = width * height * channels
    img = np.frombuffer(payload, dtype=dtype, count=count, offset=i)
    if channels == 3:
        return img.reshape(height, width, 3)
    return img.reshape(height, width)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload with the stdlib ``wave`` reader: returns
    ([n_frames, channels] int16/uint8 samples, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2")}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width: {width}")
    return np.frombuffer(raw, dtype=dtype).reshape(n, ch), rate


def synth_pgm(blob_id: int, width: int = 16, height: int = 12) -> bytes:
    """Deterministic P5 test image: pixel at linear index l is
    (l + blob_id) % 256 — closed form, so decoded statistics are
    SQL-computable for the oracle."""
    header = f"P5 {width} {height} 255\n".encode()
    pixels = ((np.arange(width * height) + blob_id) % 256).astype(np.uint8)
    return header + pixels.tobytes()


def synth_wav(blob_id: int, n_samples: int = 1024, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV: sample i is
    ((i*37 + blob_id) % 65536) - 32768 — integer-exact closed form."""
    import io
    import wave

    samples = (((np.arange(n_samples) * 37 + blob_id) % 65536) - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


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


def attach_synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach deterministic REAL media blobs: even ids get a P5 image,
    odd ids a PCM WAV — generated inside an Arrow-batched mapInPandas (the
    blob never touches the driver), decodable by ``decode_pnm``/
    ``decode_wav`` with closed-form statistics for the oracle."""
    out_schema = "blob_id long, blob binary, media_type string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid in pdf["blob_id"]:
                bid = int(bid)
                if bid % 2 == 0:
                    rows.append((bid, synth_pgm(bid), "image/x-portable-graymap"))
                else:
                    rows.append((bid, synth_wav(bid), "audio/wav"))
            yield pd.DataFrame(rows, columns=["blob_id", "blob", "media_type"])

    return df.select(F.col(id_col).alias("blob_id")).mapInPandas(gen, schema=out_schema)


def decode_media_features(df: DataFrame) -> DataFrame:
    """REAL media feature extraction over binary blobs, dispatched by
    media_type inside one mapInPandas pass:

      image/x-portable-graymap|pixmap -> decode_pnm: (width, height,
        mean_pixel)
      audio/wav                       -> decode_wav: (n_samples,
        sample_rate, rms)
      anything compressed             -> NotImplementedError (JPEG/PNG/MP3
        need PIL/av, absent in this environment)

    Same Spark shape as ``decode_features`` — Arrow batches, one numpy
    decode per payload, partition-parallel — but the decode is real."""
    out_schema = (
        "blob_id long, kind string, width int, height int, mean_pixel double,"
        " n_samples int, sample_rate int, rms double"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob, mt in zip(pdf["blob_id"], pdf["blob"], pdf["media_type"]):
                payload = bytes(blob)
                if mt in ("image/x-portable-graymap", "image/x-portable-pixmap"):
                    img = decode_pnm(payload)
                    h, w = img.shape[:2]
                    rows.append((int(bid), "image", w, h,
                                 round(float(img.astype(np.float64).mean()), 6),
                                 None, None, None))
                elif mt == "audio/wav":
                    samples, rate = decode_wav(payload)
                    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                    rows.append((int(bid), "audio", None, None, None,
                                 int(samples.shape[0]), int(rate), round(rms, 6)))
                else:
                    raise NotImplementedError(
                        f"decode for {mt} requires PIL/av (not in this environment)"
                    )
            yield pd.DataFrame(
                rows,
                columns=["blob_id", "kind", "width", "height", "mean_pixel",
                         "n_samples", "sample_rate", "rms"],
            )

    return df.select("blob_id", "blob", "media_type").mapInPandas(extract, schema=out_schema)


def resize_image_real(df: DataFrame, width: int = 8, height: int = 6) -> DataFrame:
    """REAL 2D nearest-neighbor resize of decoded netpbm images (numpy
    index-grid sampling — the actual resample a thumbnailer performs, not
    a byte-stream fake): emits output dims + resized-pixel checksum."""
    out_schema = "blob_id long, width int, height int, checksum bigint"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf["blob_id"], pdf["blob"]):
                img = decode_pnm(bytes(blob))
                h, w = img.shape[:2]
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                small = img[np.ix_(ys, xs)]
                rows.append((int(bid), width, height, int(small.astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=["blob_id", "width", "height", "checksum"])

    return df.select("blob_id", "blob").mapInPandas(run, schema=out_schema)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio DSP over decoded PCM WAV blobs (one numpy pass per
    payload, Arrow-batched):

      zero_crossings / peak / energy — integer-EXACT (int64 sample math),
        so the closed-form synthetic clips make them SQL-verifiable and
        the whole decode+DSP path sits in the hard gate;
      spectral_centroid — amplitude-weighted mean frequency over the real
        FFT (the brightness feature an audio curation pipeline filters
        on). An O(N log N) transform has no SQL twin, so it is gated by
        signal-property tests instead (a pure tone's centroid is the tone
        frequency; its crossing count is 2 f T).

    Multi-channel clips analyze channel 0."""
    out_schema = (
        "blob_id long, n_samples int, zero_crossings int, peak int,"
        " energy long, spectral_centroid double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf["blob_id"], pdf["blob"]):
                samples, rate = decode_wav(bytes(blob))
                xi = samples[:, 0].astype(np.int64)
                pos = xi >= 0
                zc = int(np.sum(pos[1:] != pos[:-1]))
                peak = int(np.abs(xi).max()) if len(xi) else 0
                energy = int(np.sum(xi * xi))
                spec = np.abs(np.fft.rfft(xi.astype(np.float64)))
                freqs = np.fft.rfftfreq(len(xi), 1.0 / rate)
                centroid = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
                rows.append(
                    (int(bid), int(len(xi)), zc, peak, energy, round(centroid, 6))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "blob_id", "n_samples", "zero_crossings", "peak",
                    "energy", "spectral_centroid",
                ],
            )

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
