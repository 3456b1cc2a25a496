"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct.  The
Spark-side machinery here — schemas, Arrow batch shapes, mapInPandas
signatures, partition sizing — is real and tested; the actual media decode is
STUBBED (the sandbox has no image/audio libraries): ``decode_stub=True``
produces a deterministic fake decode derived from the bytes, and
``decode_stub=False`` raises NotImplementedError where a real libjpeg/ffmpeg
call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes int, sha256 string, width int, height int, format string"
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo plumbing: derive a binary payload column (utf-8 bytes of text).

    In production this column arrives from the lake (parquet BINARY); only
    the downstream machinery matters here."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def binary_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Typed metadata of an opaque binary column — pure built-ins."""
    return docs_with_payload.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
    )


def decode_media(
    docs_with_payload: DataFrame, decode_stub: bool = True
) -> DataFrame:
    """'Decode' binary media into metadata via mapInPandas (Arrow batches).

    Batch shape: iterator of pandas DataFrames with a bytes column — exactly
    what a real decoder (PIL/libvips/ffmpeg) would consume frame-wise.  The
    stub derives deterministic width/height from the payload hash."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; run with decode_stub=True"
                )
            payloads = pdf["payload"]
            digests = [hashlib.sha256(b).digest() for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.str.len().astype("int32"),
                    "sha256": [d.hex() for d in digests],
                    "width": pd.Series(
                        [16 + d[0] % 240 for d in digests], dtype="int32"
                    ),
                    "height": pd.Series(
                        [16 + d[1] % 240 for d in digests], dtype="int32"
                    ),
                    "format": "stub",
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=MEDIA_META_SCHEMA
    )
