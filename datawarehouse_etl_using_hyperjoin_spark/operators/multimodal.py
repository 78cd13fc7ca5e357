"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct, and
implements decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` operators — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested; the actual codec step is a
STUB (this container has no image/audio libraries) with a deterministic
fake, clearly marked below.

At 100 TB the pattern matters more than the codec: payloads stay byte
arrays end-to-end (never hit Python row-at-a-time), batches flow through
Arrow, and heavy decode stages are isolated behind ``repartition`` so codec
parallelism can be sized independently of scan parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, media_format string, n_bytes long, width int, height int, "
    "n_frames int, ok boolean"
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a multimodal-shaped relation from the documents fixture: the
    text bytes stand in for an encoded media payload, with typed metadata."""
    fmt = (
        F.when(F.col(id_col) % 3 == 0, "png")
        .when(F.col(id_col) % 3 == 1, "jpeg")
        .otherwise("wav")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        fmt.alias("media_format"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_decode(payload: bytes, media_format: str) -> tuple[int, int, int]:
    """STUB: deterministic fake decoder.

    Real implementation would be ``PIL.Image.open(io.BytesIO(payload))`` /
    ``soundfile.read`` / ``av.open`` — none of those libraries exist in
    this container, so dimensions are derived deterministically from the
    payload so tests are stable.  Raise ``NotImplementedError`` here if you
    need to be loud about the missing codec instead.
    """
    n = len(payload)
    if media_format in ("png", "jpeg"):
        return (64 + n % 640, 64 + (n * 7) % 480, 1)
    return (0, 0, 1 + n % 300)  # audio: frames only


def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode payloads batch-wise (Arrow transfer)."""
    for pdf in it:
        dims = [
            _fake_decode(p, f)
            for p, f in zip(pdf["payload"], pdf["media_format"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_format": pdf["media_format"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
                "ok": True,
            }
        )


def decode(media: DataFrame, *, decode_parallelism: int | None = None) -> DataFrame:
    """Decode a payload relation to typed media metadata.

    ``decode_parallelism`` repartitions before the (CPU-heavy in real life)
    codec stage — the knob that decouples codec cores from scan splits at
    cluster scale.
    """
    if decode_parallelism:
        media = media.repartition(decode_parallelism)
    return media.mapInPandas(decode_batch, schema=DECODED_SCHEMA)
