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

try:  # pragma: no cover - not installed in the test container
    import av as _av  # PyAV: the standard ffmpeg binding for frame access

    _HAVE_AV = True
except Exception:
    _av = None
    _HAVE_AV = False

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
    "payload binary, n_bytes long, ok boolean, codec string"
)

_PIL_FORMATS = {"png": "PNG", "jpeg": "JPEG"}


def _resize_one(
    payload: bytes, media_format: str, target_w: int, target_h: int
) -> tuple[bytes, bool, str]:
    """(payload_out, ok, codec) for one image payload.

    Real path (PIL importable, image format): decode → ``resize((w, h))``
    → re-encode to the same format.  A payload PIL rejects is a
    quarantine row (original bytes, ok=False) — never silently faked.
    Stub path (no PIL, or non-image format): byte-exact pass-through with
    the target dimensions stamped, ``codec='stub'``.
    """
    fmt = _PIL_FORMATS.get(media_format)
    if fmt is not None and _HAVE_PIL:
        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                buf = io.BytesIO()
                im.resize((target_w, target_h)).save(buf, format=fmt)
                return (buf.getvalue(), True, "pil")
        except Exception:
            return (payload, False, "pil")
    return (payload, True, "stub")


def resize(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    *,
    parallelism: int | None = None,
) -> DataFrame:
    """Image resize stage (payload → payload): the normalize-to-model-input
    step of a vision pipeline.

    Same optional-import dispatch as :func:`decode`: with PIL importable
    (a real cluster image) the payload is decoded, resized, and re-encoded
    in its own format; without it, a byte-exact pass-through stub runs with
    the target dimensions stamped — and every row's ``codec`` column says
    which path produced it.  At scale the contract is what matters: the
    stage is payload-to-payload (composable with decode/feature steps
    without re-shuffling), Arrow-batched, and its parallelism is sized
    independently of scan splits.
    """
    if parallelism:
        media = media.repartition(parallelism)

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                _resize_one(p, f, target_w, target_h)
                for p, f in zip(pdf["payload"], pdf["media_format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": pdf["media_format"],
                    "target_w": target_w,
                    "target_h": target_h,
                    "payload": [o[0] for o in out],
                    "n_bytes": [len(o[0]) for o in out],
                    "ok": [o[1] for o in out],
                    "codec": [o[2] for o in out],
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_ts_ms long, frame binary, codec string"
)

_VIDEO_FORMATS = {"mp4", "mkv", "webm", "avi", "mov"}


def _frames_one(
    payload: bytes, media_format: str, every_n: int, max_frames: int
) -> list[tuple[int, int, bytes, str]]:
    """Sampled frames for one payload: [(frame_idx, frame_ts_ms, frame
    bytes, codec)].

    Real path (PyAV importable, video format): demux-decode the container,
    keep every ``every_n``-th frame up to ``max_frames``, each re-encoded
    as PNG bytes (ready for the image path).  An unreadable container
    yields no frames — quarantine by absence, the natural shape for a
    fan-out stage.  Stub path: frame count from the fake decoder and a
    deterministic payload slice per "frame"."""
    if media_format in _VIDEO_FORMATS and _HAVE_AV:
        frames: list[tuple[int, int, bytes, str]] = []
        try:
            with _av.open(io.BytesIO(payload)) as container:
                for i, frame in enumerate(container.decode(video=0)):
                    if i % every_n:
                        continue
                    buf = io.BytesIO()
                    frame.to_image().save(buf, format="PNG")
                    ts_ms = int((frame.time or 0.0) * 1000)
                    frames.append((i, ts_ms, buf.getvalue(), "av"))
                    if len(frames) >= max_frames:
                        break
        except Exception:
            return []
        return frames
    _, _, n_frames = _fake_decode(payload, media_format)
    out = []
    for idx in list(range(0, n_frames, every_n))[:max_frames]:
        # STUB: deterministic payload slice stands in for a frame
        lo = idx % max(1, len(payload) - 16)
        out.append((idx, idx * 33, bytes(payload[lo : lo + 16]), "stub"))
    return out


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

    Optional-import dispatch like :func:`decode`: with PyAV importable the
    container is really demuxed and sampled frames re-encode as PNG; the
    deterministic stub runs otherwise, and ``codec`` says which path each
    frame came from.  The plumbing is the point either way: a bounded
    fan-out (``max_frames`` caps output rows per doc — the skew guard for
    long-tail videos), Arrow-batched, schema'd as binary frames ready for
    the image path (resize → feature_extract).
    """
    if parallelism:
        media = media.repartition(parallelism)

    def _sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts_ms": [],
                "frame": [], "codec": [],
            }
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["media_format"], pdf["payload"]
            ):
                for idx, ts_ms, frame, codec in _frames_one(
                    payload, fmt, every_n, max_frames
                ):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(ts_ms)
                    out["frame"].append(frame)
                    out["codec"].append(codec)
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id long, feature array<float>, codec string"


def _feature_one(payload: bytes, media_format: str, dim: int) -> tuple[list[float], str]:
    """(feature, codec) for one payload.

    Real path (PIL importable, image format): decode → grayscale →
    ``isqrt(dim)``² thumbnail → normalized pixel intensities, zero-padded
    to ``dim`` — a real (if simple) image descriptor; a production
    deployment swaps this one function for an ONNX/torch encoder forward
    pass, the mapInPandas batch already being the model batch.  An
    undecodable image falls through to the stub descriptor (a feature
    stage must emit a vector for every row — downstream ANN joins assume
    dense coverage).  Stub path: deterministic byte-histogram projection.
    """
    fmt = _PIL_FORMATS.get(media_format)
    if fmt is not None and _HAVE_PIL:
        try:
            g = max(1, int(dim**0.5))
            with _PILImage.open(io.BytesIO(payload)) as im:
                px = list(im.convert("L").resize((g, g)).getdata())
            vec = [v / 255.0 for v in px][:dim]
            return (vec + [0.0] * (dim - len(vec)), "pil")
        except Exception:
            pass
    if media_format == "wav" and _HAVE_SOUNDFILE:
        try:
            data, _rate = _soundfile.read(io.BytesIO(payload))
            samples = [float(s) for s in (data[:, 0] if getattr(data, "ndim", 1) > 1 else data)]
            # per-segment RMS over `dim` equal slices — the classic cheap
            # loudness-envelope descriptor
            seg = max(1, len(samples) // dim)
            vec = []
            for i in range(dim):
                chunk = samples[i * seg : (i + 1) * seg]
                vec.append(
                    (sum(s * s for s in chunk) / len(chunk)) ** 0.5 if chunk else 0.0
                )
            return (vec, "soundfile")
        except Exception:
            pass
    hist = [0.0] * dim
    for b in payload:
        hist[b % dim] += 1.0
    n = max(1.0, float(len(payload)))
    return ([v / n for v in hist], "stub")


def feature_extract(media: DataFrame, dim: int = 16, *, parallelism: int | None = None) -> DataFrame:
    """Feature extraction: payload → fixed-dim embedding (array<float>).

    Optional-import dispatch like :func:`decode`: with PIL importable,
    image payloads get a real thumbnail-intensity descriptor; otherwise a
    deterministic byte-histogram projection stands in for the encoder
    forward pass (ONNX/torch batch inference in production — the
    mapInPandas batch is exactly the model batch), with ``codec`` naming
    the path per row.  The output column is the same ``array<float>``
    shape as the embeddings fixture, so the ANN/near-dup operators compose
    directly downstream.
    """
    if parallelism:
        media = media.repartition(parallelism)

    def _feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [
                _feature_one(p, f, dim)
                for p, f in zip(pdf["payload"], pdf["media_format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": [o[0] for o in out],
                    "codec": [o[1] for o in out],
                }
            )

    return media.mapInPandas(_feat, schema=FEATURES_SCHEMA)
