"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct, and
implements decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` operators — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested.  The codec step uses PIL /
soundfile when importable (a real cluster); in this container (no
image/audio libraries) a clearly-marked deterministic STUB runs instead,
and every decoded row records which path produced it in a ``codec``
column.

At 100 TB the pattern matters more than the codec: payloads stay byte
arrays end-to-end (never hit Python row-at-a-time), batches flow through
Arrow, and heavy decode stages are isolated behind ``repartition`` so codec
parallelism can be sized independently of scan parallelism.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Optional real codecs: used when importable (a real cluster image), stub
# fallback otherwise (this test container has neither).  The import probe
# runs on the executor side too — the workers re-import this module.
try:  # pragma: no cover - not installed in the test container
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except Exception:  # ImportError, or a broken install
    _PILImage = None
    _HAVE_PIL = False

try:  # pragma: no cover - not installed in the test container
    import soundfile as _soundfile

    _HAVE_SOUNDFILE = True
except Exception:
    _soundfile = None
    _HAVE_SOUNDFILE = False

DECODED_SCHEMA = (
    "doc_id long, media_format string, n_bytes long, width int, height int, "
    "n_frames int, ok boolean, codec string"
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
    """STUB: deterministic fake decoder (fallback when no codec library is
    installed).  Dimensions are derived deterministically from the payload
    so tests are stable; rows decoded this way carry ``codec='stub'`` so a
    consumer can tell fabricated metadata from real decode output."""
    n = len(payload)
    if media_format in ("png", "jpeg"):
        return (64 + n % 640, 64 + (n * 7) % 480, 1)
    return (0, 0, 1 + n % 300)  # audio: frames only


def _decode_one(
    payload: bytes, media_format: str, force_stub: bool = False
) -> tuple[int, int, int, bool, str]:
    """(width, height, n_frames, ok, codec) for one payload.

    Real codec when importable: PIL for images, soundfile for audio — a
    payload the real codec rejects is reported ``ok=False`` (quarantine
    row; real pipelines route those aside) rather than silently faked.
    Without the library, the deterministic stub runs and says so in
    ``codec``.  ``force_stub`` pins the stub regardless of what is
    importable — the engine-portable mode the declared oracle query uses.
    """
    if force_stub:
        w, h, n = _fake_decode(payload, media_format)
        return (w, h, n, True, "stub")
    if media_format in ("png", "jpeg") and _HAVE_PIL:
        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return (int(im.width), int(im.height), 1, True, "pil")
        except Exception:
            return (0, 0, 0, False, "pil")
    if media_format == "wav" and _HAVE_SOUNDFILE:
        try:
            info = _soundfile.info(io.BytesIO(payload))
            return (0, 0, int(info.frames), True, "soundfile")
        except Exception:
            return (0, 0, 0, False, "soundfile")
    w, h, n = _fake_decode(payload, media_format)
    return (w, h, n, True, "stub")


def decode_batch(
    it: Iterator[pd.DataFrame], force_stub: bool = False
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode payloads batch-wise (Arrow transfer)."""
    for pdf in it:
        dims = [
            _decode_one(p, f, force_stub)
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
                "ok": [d[3] for d in dims],
                "codec": [d[4] for d in dims],
            }
        )


def decode(
    media: DataFrame,
    *,
    decode_parallelism: int | None = None,
    codec: str = "auto",
) -> DataFrame:
    """Decode a payload relation to typed media metadata.

    ``decode_parallelism`` repartitions before the (CPU-heavy in real life)
    codec stage — the knob that decouples codec cores from scan splits at
    cluster scale.

    ``codec``: ``"auto"`` (default) dispatches to PIL/soundfile when
    importable with the stub fallback; ``"stub"`` pins the deterministic
    stub on every row — the mode whose output is pure arithmetic over the
    payload, reproducible by any engine (the declared query's oracle).
    """
    if codec not in ("auto", "stub"):
        raise ValueError(f"codec must be 'auto' or 'stub', got {codec!r}")
    if decode_parallelism:
        media = media.repartition(decode_parallelism)
    force_stub = codec == "stub"

    def _body(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return decode_batch(it, force_stub)

    return media.mapInPandas(_body, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, media_format string, target_w int, target_h int, "
    "payload binary, n_bytes long"
)


def resize(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    *,
    parallelism: int | None = None,
) -> DataFrame:
    """Image resize stage (payload → payload): the normalize-to-model-input
    step of a vision pipeline.

    STUB codec (like :func:`decode`): the real body is
    ``PIL.Image.open(...).resize((w, h))`` re-encoded to bytes; here the
    payload is passed through with the target dimensions stamped, keeping
    batch shape, schema, and the payload-in/payload-out contract real.  At
    scale the contract is what matters: the stage is payload-to-payload
    (composable with decode/feature steps without re-shuffling), Arrow-
    batched, and its parallelism is sized independently of scan splits.
    """
    if parallelism:
        media = media.repartition(parallelism)

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": pdf["media_format"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "payload": pdf["payload"],  # STUB: real impl re-encodes
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_ts_ms long, frame binary"


def frame_sample(
    media: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    *,
    parallelism: int | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (doc_id, frame_idx, frame_ts_ms, frame bytes) — the fan-out stage that
    turns a video corpus into an image corpus.

    STUB codec: frame count comes from the fake decoder and each "frame"
    is a deterministic slice of the payload (real body: ``av.open`` +
    keyframe seek).  The plumbing is the point: a bounded fan-out
    (``max_frames`` caps output rows per doc — the skew guard for
    long-tail videos), Arrow-batched, schema'd as binary frames ready for
    the image path (resize → feature_extract).
    """
    if parallelism:
        media = media.repartition(parallelism)

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["media_format"], pdf["payload"]
            ):
                _, _, n_frames = _fake_decode(payload, fmt)
                picked = list(range(0, n_frames, every_n))[:max_frames]
                for idx in picked:
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(idx * 33)  # ~30 fps
                    # STUB: deterministic payload slice stands in for a frame
                    lo = idx % max(1, len(payload) - 16)
                    out["frame"].append(bytes(payload[lo : lo + 16]))
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id long, feature array<float>"


def feature_extract(media: DataFrame, dim: int = 16, *, parallelism: int | None = None) -> DataFrame:
    """Feature extraction: payload → fixed-dim embedding (array<float>).

    STUB model: a deterministic byte-histogram projection stands in for a
    real vision/audio encoder forward pass (ONNX/torch batch inference in
    production — the mapInPandas batch is exactly the model batch).  The
    output column is the same ``array<float>`` shape as the embeddings
    fixture, so the ANN/near-dup operators compose directly downstream.
    """
    if parallelism:
        media = media.repartition(parallelism)

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                hist = [0.0] * dim
                for b in payload:
                    hist[b % dim] += 1.0
                n = max(1.0, float(len(payload)))
                feats.append([v / n for v in hist])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(_feat, schema=FEATURES_SCHEMA)
