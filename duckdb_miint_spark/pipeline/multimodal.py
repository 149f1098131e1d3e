"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded by Arrow-batched Python (``mapInPandas``).

The container has no image/audio libraries, so the real decoders are
STUBBED behind import guards (``decode_image``); the Spark-side plumbing —
binary column handling, schema, batch shape, partitioning — is real and
exercised by ``fake_decode_image_features``, a deterministic decoder whose
output is md5-derived from the payload bytes and therefore has an exact
DuckDB oracle.

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
    "IMAGE_FEATURES_SCHEMA",
    "attach_binary_column",
    "decode_image",
    "fake_decode_image_features",
]
