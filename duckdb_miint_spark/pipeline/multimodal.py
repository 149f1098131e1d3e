"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded by Arrow-batched Python (``mapInPandas``).

The container has no image/audio/video libraries, so the REAL decoders
(``decode_image`` via PIL, ``decode_audio`` via soundfile,
``decode_video_frames`` via PyAV) are import-gated: full mapInPandas
bodies that run when the library is present, NotImplementedError when it
is not. Their per-payload math lives in ``audio_payload_features`` /
``video_payload_frames`` so it is unit-tested here with library-compatible
stand-ins (tests/test_pipeline.py). The ``fake_*`` twins share the exact
output schemas and batch shapes and are md5-deterministic, giving every
query an exact DuckDB oracle in any environment.

At scale: payload bytes travel Arrow-batched to Python once; metadata-only
queries never touch the binary column (columnar pruning), which is the
entire point of keeping media as a column, not a side file.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("content_hash", StringType()),
    ]
)


def attach_binary_column(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, payload binary) — in production this is the raw image/audio
    bytes; here derived from text so the pipeline is runnable anywhere."""
    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).cast("binary").alias("payload")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, str, str]:
    """Deterministic stand-in for an image decoder: pretend the md5 of the
    bytes encodes the header. Mirrors what a real decoder returns
    (dimensions + mode) with zero native dependencies."""
    h = hashlib.md5(payload).hexdigest()
    width = 32 + 16 * int(h[0], 16)
    height = 32 + 16 * int(h[1], 16)
    mode = "RGB" if int(h[2], 16) % 2 == 0 else "L"
    return len(payload), width, height, mode, h


def fake_decode_image_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (id, payload) → IMAGE_FEATURES_SCHEMA rows.

    The batch shape is the real one: Arrow record batches in, one output
    row per input row, schema declared up front."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                    "mode": [f[3] for f in feats],
                    "content_hash": [f[4] for f in feats],
                }
            )

    return binary_df.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("rms_q8", LongType()),
        StructField("content_hash", StringType()),
    ]
)

_SAMPLE_RATES = (8000, 16000, 22050, 44100, 48000)


def _fake_decode_audio(payload: bytes) -> tuple[int, int, int, int, int, str]:
    """Deterministic stand-in for an audio decoder (header fields derived
    from md5 of the bytes — exactly oracle-restatable)."""
    h = hashlib.md5(payload).hexdigest()
    sample_rate = _SAMPLE_RATES[int(h[0], 16) % 5]
    n_channels = 1 + int(h[1], 16) % 2
    duration_ms = 500 + 100 * int(h[2:4], 16)
    rms_q8 = int(h[4:6], 16)  # quantized loudness 0..255
    return len(payload), sample_rate, n_channels, duration_ms, rms_q8, h


def fake_decode_audio_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (id, payload) → AUDIO_FEATURES_SCHEMA rows — the
    audio counterpart of ``fake_decode_image_features`` (one output row per
    input row, Arrow-batched)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode_audio(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "sample_rate": pd.array([f[1] for f in feats], dtype="int32"),
                    "n_channels": pd.array([f[2] for f in feats], dtype="int32"),
                    "duration_ms": [f[3] for f in feats],
                    "rms_q8": [f[4] for f in feats],
                    "content_hash": [f[5] for f in feats],
                }
            )

    return binary_df.mapInPandas(decode, AUDIO_FEATURES_SCHEMA)


def decode_audio(binary_df: DataFrame) -> DataFrame:
    """Real audio decode (soundfile) — import-gated: raises only when the
    library is missing. Same mapInPandas shape as
    ``fake_decode_audio_features`` (one output row per input row,
    AUDIO_FEATURES_SCHEMA), so swapping fake→real changes no plans."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_audio requires soundfile, which is not available in this "
            "container; use fake_decode_audio_features for plumbing tests"
        ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import soundfile as sf

        for pdf in batches:
            rows = [
                (int(i),) + audio_payload_features(bytes(p), sf)
                for i, p in zip(pdf["id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return binary_df.mapInPandas(decode, AUDIO_FEATURES_SCHEMA)


def audio_payload_features(raw: bytes, sf) -> tuple[int, int, int, int, int, str]:
    """(n_bytes, sample_rate, n_channels, duration_ms, rms_q8, md5) for one
    audio payload, via a soundfile-compatible module ``sf`` — separated
    from the mapInPandas body so the decode math is unit-testable without
    the native library."""
    import io

    import numpy as np

    data, sr = sf.read(io.BytesIO(raw), dtype="float64", always_2d=True)
    n_frames, n_channels = data.shape
    duration_ms = round(n_frames * 1000 / sr) if sr else 0
    rms = float(np.sqrt(np.mean(np.square(data)))) if n_frames else 0.0
    rms_q8 = max(0, min(255, int(round(rms * 255))))
    return (
        len(raw),
        int(sr),
        int(n_channels),
        int(duration_ms),
        rms_q8,
        hashlib.md5(raw).hexdigest(),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("resized_hash", StringType()),
    ]
)


def fake_resize_image(binary_df: DataFrame, max_side: int = 128) -> DataFrame:
    """mapInPandas over (id, payload) → RESIZE_SCHEMA — binary-in/binary-out
    plumbing (the shape a real thumbnailer has). Output dims are the fake
    header dims clamped to ``max_side`` preserving aspect ratio (integer
    floor); the 'resized' payload is a deterministic md5 chain standing in
    for re-encoded pixels."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blobs, hashes = [], [], [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                _n, w, h, _mode, chash = _fake_decode(bytes(p))
                if max(w, h) <= max_side:
                    ow, oh = w, h
                elif w >= h:
                    ow, oh = max_side, h * max_side // w
                else:
                    ow, oh = w * max_side // h, max_side
                rh = hashlib.md5(f"{chash}:{ow}x{oh}".encode()).hexdigest()
                ids.append(int(i))
                ws.append(ow)
                hs.append(oh)
                blobs.append(bytes.fromhex(rh))
                hashes.append(rh)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "out_width": pd.array(ws, dtype="int32"),
                    "out_height": pd.array(hs, dtype="int32"),
                    "resized": blobs,
                    "resized_hash": hashes,
                }
            )

    return binary_df.mapInPandas(resize, RESIZE_SCHEMA)


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ms", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def fake_sample_video_frames(binary_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """mapInPandas over (id, payload) → one row PER SAMPLED FRAME — the
    one-to-many batch shape a real frame sampler (pyav/ffmpeg) produces.
    Frame count is md5-derived (1..12); each frame row carries a
    deterministic md5 chain hash standing in for the frame's pixel hash."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, hashes = [], [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                h = hashlib.md5(bytes(p)).hexdigest()
                n_frames = 1 + int(h[0:2], 16) % 12
                for fi in range(n_frames):
                    ids.append(int(i))
                    idxs.append(fi)
                    mss.append(fi * every_ms)
                    hashes.append(hashlib.md5(f"{h}:{fi}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "frame_ms": mss,
                    "frame_hash": hashes,
                }
            )

    return binary_df.mapInPandas(sample, VIDEO_FRAMES_SCHEMA)


def decode_video_frames(binary_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Real frame sampling (PyAV) — import-gated: raises only when av is
    missing. Same one-to-many mapInPandas shape as
    ``fake_sample_video_frames`` (one row per SAMPLED frame,
    VIDEO_FRAMES_SCHEMA): frames are emitted at >= ``every_ms`` spacing by
    presentation timestamp; ``frame_index`` numbers the EMITTED frames;
    ``frame_hash`` is the md5 of the rgb24 pixel buffer."""
    try:
        import av  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_video_frames requires PyAV, which is not available in "
            "this container; use fake_sample_video_frames for plumbing tests"
        ) from e

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import av as _av

        for pdf in batches:
            ids, idxs, mss, hashes = [], [], [], []
            for i, p in zip(pdf["id"], pdf["payload"]):
                for fi, t_ms, fhash in video_payload_frames(
                    bytes(p), _av, every_ms
                ):
                    ids.append(int(i))
                    idxs.append(fi)
                    mss.append(t_ms)
                    hashes.append(fhash)
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "frame_index": pd.array(idxs, dtype="int32"),
                    "frame_ms": pd.array(mss, dtype="int64"),
                    "frame_hash": pd.array(hashes, dtype=object),
                }
            )

    return binary_df.mapInPandas(sample, VIDEO_FRAMES_SCHEMA)


def video_payload_frames(
    raw: bytes, av, every_ms: int
) -> list[tuple[int, int, str]]:
    """[(frame_index, frame_ms, frame_hash)] sampled at >= every_ms
    spacing from one video payload, via a PyAV-compatible module ``av`` —
    separated from the mapInPandas body so the sampling logic is
    unit-testable without the native library."""
    import io

    out: list[tuple[int, int, str]] = []
    with av.open(io.BytesIO(raw)) as container:
        stream = container.streams.video[0]
        tb = float(stream.time_base) if stream.time_base else 0.0
        next_ms = 0
        emitted = 0
        for frame in container.decode(stream):
            if frame.pts is None or not tb:
                t_ms = emitted * every_ms  # no timestamps: assume spacing
            else:
                t_ms = int(frame.pts * tb * 1000)
            if t_ms < next_ms:
                continue
            pixels = frame.to_ndarray(format="rgb24").tobytes()
            out.append((emitted, t_ms, hashlib.md5(pixels).hexdigest()))
            emitted += 1
            next_ms = t_ms + every_ms
    return out


def decode_image(binary_df: DataFrame) -> DataFrame:
    """Real image decode (PIL) — STUB: raises unless PIL is installed.

    Signature and output schema are final; only the decoder body is
    environment-gated, so swapping in the real library changes no plans."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_image requires Pillow, which is not available in this "
            "container; use fake_decode_image_features for plumbing tests"
        ) from e

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        import PIL.Image as Image

        for pdf in batches:
            rows = []
            for i, p in zip(pdf["id"], pdf["payload"]):
                img = Image.open(io.BytesIO(bytes(p)))
                rows.append(
                    (i, len(p), img.width, img.height, img.mode, hashlib.md5(bytes(p)).hexdigest())
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return binary_df.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


__all__ = [
    "AUDIO_FEATURES_SCHEMA",
    "RESIZE_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "VIDEO_FRAMES_SCHEMA",
    "attach_binary_column",
    "audio_payload_features",
    "video_payload_frames",
    "decode_audio",
    "decode_image",
    "decode_video_frames",
    "fake_decode_audio_features",
    "fake_decode_image_features",
    "fake_resize_image",
    "fake_sample_video_frames",
]
