"""Text-analysis column functions + multimodal plumbing."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators import text as tx
from datawarehouse_etl_using_hyperjoin_spark.operators.multimodal import (
    attach_payload,
    decode,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


def test_token_counts_match_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    got = docs.select(
        "doc_id",
        "text",
        tx.ws_token_count(F.col("text")).alias("ws"),
        tx.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()
    for r in got:
        assert r.ws == len(r.text.strip().split())
        assert r.bpe == len(re.findall(tx.BPE_ISH_PATTERN, r.text))


def test_quality_score_bounded_and_monotone_in_length(spark):
    short = "the cat"
    long = " ".join(["the cat sat on a mat"] * 30)
    df = spark.createDataFrame([(1, short), (2, long)], ["id", "text"])
    rows = {r.id: r.q for r in df.select("id", tx.quality_score(F.col("text")).alias("q")).collect()}
    assert 0.0 <= rows[1] <= 1.0 and 0.0 <= rows[2] <= 1.0
    assert rows[2] > rows[1]


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat and it is flat"),
         (2, "zzz qqq xxx yyy www vvv")],
        ["id", "text"],
    )
    rows = {r.id: r.lang for r in df.select("id", tx.lang_id(F.col("text")).alias("lang")).collect()}
    assert rows == {1: "en", 2: "und"}


def test_fingerprint_normalizes_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world "), (3, "different")],
        ["id", "text"],
    )
    rows = {r.id: r.fp for r in df.select("id", tx.fingerprint(F.col("text")).alias("fp")).collect()}
    assert rows[1] == rows[2] != rows[3]


def test_chunking_covers_document_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = tx.chunk_text(df, "doc_id", "text", chunk_size=64, overlap=16).collect()
    # stride 48 over 150 words ⇒ starts 1, 49, 97 (145 would exceed len-16)
    assert [c.chunk_id for c in chunks] == [0, 1, 2]
    words0 = chunks[0].chunk_text.split()
    words1 = chunks[1].chunk_text.split()
    assert len(words0) == 64 and words0[48:] == words1[:16]  # overlap region
    assert chunks[-1].n_tokens == 150 - 96  # last chunk: words 97..150
    # every word appears in at least one chunk
    seen = {w for c in chunks for w in c.chunk_text.split()}
    assert seen == set(text.split())


def test_train_eval_split_deterministic_and_ratioed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = {r.doc_id: r.s for r in docs.select(
        "doc_id", tx.train_eval_split(F.col("text")).alias("s")).collect()}
    s2 = {r.doc_id: r.s for r in docs.select(
        "doc_id", tx.train_eval_split(F.col("text")).alias("s")).collect()}
    assert s1 == s2
    frac = sum(1 for v in s1.values() if v == "train") / len(s1)
    assert 0.8 < frac < 0.97


def test_multimodal_decode_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    media = attach_payload(docs, "doc_id", "text")
    assert dict(media.dtypes)["payload"] == "binary"
    out = decode(media)
    assert out.columns == [
        "doc_id", "media_format", "n_bytes", "width", "height", "n_frames",
        "ok", "codec",
    ]
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 30 and all(r.ok for r in rows.values())
    # no PIL/soundfile in this container → every row says the stub ran;
    # on a real cluster the same rows would say 'pil'/'soundfile'
    assert all(r.codec == "stub" for r in rows.values())
    # audio rows have frames, no dimensions; image rows the reverse
    for r in rows.values():
        if r.media_format == "wav":
            assert r.width == 0 and r.n_frames >= 1
        else:
            assert r.width >= 64 and r.height >= 64
    # deterministic across runs
    again = {r.doc_id: r for r in decode(media).collect()}
    assert rows == again


def test_decode_one_prefers_real_codec(monkeypatch):
    """The optional-import dispatch: with a (fake) PIL present the real
    path runs — success reports real dimensions + codec='pil', undecodable
    bytes become an ok=False quarantine row instead of fabricated dims —
    while formats without a library still fall back to the stub."""
    from datawarehouse_etl_using_hyperjoin_spark.operators import multimodal as mm

    class FakeImage:
        width, height = 320, 200

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class FakePIL:
        @staticmethod
        def open(buf):
            if buf.read(4) != b"GOOD":
                raise ValueError("not an image")
            return FakeImage()

    monkeypatch.setattr(mm, "_PILImage", FakePIL)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    assert mm._decode_one(b"GOOD....", "png") == (320, 200, 1, True, "pil")
    assert mm._decode_one(b"junk", "jpeg") == (0, 0, 0, False, "pil")
    assert mm._decode_one(b"anything", "wav")[4] == "stub"  # no soundfile


def test_decode_parallelism_repartitions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    out = decode(media, decode_parallelism=7)
    assert out.rdd.getNumPartitions() == 7
    assert not math.isnan(out.count())


def test_resize_preserves_payload_contract(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.multimodal import resize

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    media = attach_payload(docs, "doc_id", "text")
    out = resize(media, 224, 224)
    assert dict(out.dtypes)["payload"] == "binary"  # payload→payload stage
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.target_w == 224 and r.target_h == 224 for r in rows)
    assert all(r.n_bytes == len(r.payload) for r in rows)


def test_frame_sample_bounded_fanout(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.multimodal import (
        frame_sample,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    media = attach_payload(docs, "doc_id", "text")
    frames = frame_sample(media, every_n=10, max_frames=4)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # max_frames caps the fan-out (skew guard for long videos)
    assert per_doc and all(1 <= n <= 4 for n in per_doc.values())
    # frames are binary and timestamped in order
    sample = frames.filter(F.col("doc_id") == min(per_doc)).orderBy("frame_idx").collect()
    assert all(isinstance(bytes(r.frame), bytes) for r in sample)
    ts = [r.frame_ts_ms for r in sample]
    assert ts == sorted(ts)


def test_feature_extract_composes_with_ann(spark, sf_dir):
    from datawarehouse_etl_using_hyperjoin_spark.operators.multimodal import (
        feature_extract,
    )
    from datawarehouse_etl_using_hyperjoin_spark.operators.similarity import (
        cosine_topk,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    media = attach_payload(docs, "doc_id", "text")
    feats = feature_extract(media, dim=16).withColumnRenamed(
        "doc_id", "vec_id"
    ).withColumnRenamed("feature", "embedding")
    assert dict(feats.dtypes)["embedding"] == "array<float>"
    # the multimodal feature column feeds the ANN operators unchanged
    queries = feats.filter(F.col("vec_id") < 3)
    top = cosine_topk(queries, feats, k=2)
    got = top.groupBy("query_id").count().collect()
    assert len(got) == 3 and all(r["count"] == 2 for r in got)
    # deterministic stub: same payload → same feature
    a = {r.vec_id: tuple(r.embedding) for r in feats.collect()}
    b = {r.vec_id: tuple(r.embedding) for r in feats.collect()}
    assert a == b


class _FakeImage:
    """Minimal PIL.Image stand-in: 320x200, resizable, encodable."""

    width, height = 320, 200

    def __init__(self, w=320, h=200):
        self.width, self.height = w, h

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def resize(self, wh):
        return _FakeImage(*wh)

    def convert(self, mode):
        return self

    def getdata(self):
        return [17] * (self.width * self.height)

    def save(self, buf, format=None):
        buf.write(b"IMG!" + bytes([self.width % 256, self.height % 256]))


class _FakePIL:
    @staticmethod
    def open(buf):
        if buf.read(4) != b"GOOD":
            raise ValueError("not an image")
        return _FakeImage()


def _with_fake_pil(monkeypatch):
    from datawarehouse_etl_using_hyperjoin_spark.operators import multimodal as mm

    monkeypatch.setattr(mm, "_PILImage", _FakePIL)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)
    return mm


def test_resize_one_prefers_real_codec(monkeypatch):
    """With a (fake) PIL present the real resize path decodes, resizes to
    the target box, and re-encodes (payload changes, codec='pil');
    undecodable bytes quarantine as ok=False with the ORIGINAL payload;
    non-image formats and no-PIL environments run the byte-exact stub."""
    mm = _with_fake_pil(monkeypatch)
    out, ok, codec = mm._resize_one(b"GOOD....", "png", 64, 48)
    assert (ok, codec) == (True, "pil")
    assert out == b"IMG!" + bytes([64, 48])  # re-encoded at target dims
    assert mm._resize_one(b"junk", "jpeg", 64, 48) == (b"junk", False, "pil")
    assert mm._resize_one(b"anything", "wav", 64, 48) == (b"anything", True, "stub")
    monkeypatch.setattr(mm, "_HAVE_PIL", False)
    assert mm._resize_one(b"GOOD....", "png", 64, 48) == (b"GOOD....", True, "stub")


def test_frames_one_prefers_real_codec(monkeypatch):
    """With a (fake) PyAV present, video formats demux real frames (every_n
    sampling + max_frames cap + PNG re-encode via PIL), unreadable
    containers yield zero rows, and non-video formats keep the stub."""
    mm = _with_fake_pil(monkeypatch)

    class _FakeFrame:
        def __init__(self, i):
            self.time = i / 30.0

        def to_image(self):
            return _FakeImage()

    class _FakeContainer:
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def decode(self, video=0):
            return iter(_FakeFrame(i) for i in range(100))

    class _FakeAV:
        @staticmethod
        def open(buf):
            if buf.read(4) != b"VIDS":
                raise ValueError("not a container")
            return _FakeContainer()

    monkeypatch.setattr(mm, "_av", _FakeAV)
    monkeypatch.setattr(mm, "_HAVE_AV", True)
    frames = mm._frames_one(b"VIDS....", "mp4", every_n=30, max_frames=3)
    assert [(f[0], f[3]) for f in frames] == [(0, "av"), (30, "av"), (60, "av")]
    assert frames[1][1] == 1000  # 30th frame at 30fps = 1.0s
    assert all(f[2].startswith(b"IMG!") for f in frames)  # PNG re-encode ran
    assert mm._frames_one(b"junk", "mp4", 30, 3) == []  # unreadable → absent
    stub = mm._frames_one(b"VIDS....", "wav", 30, 3)  # non-video → stub
    assert stub and all(f[3] == "stub" for f in stub)


def test_feature_one_prefers_real_codec(monkeypatch):
    """With a (fake) PIL present, image payloads get the thumbnail-intensity
    descriptor (dim-length, codec='pil'); undecodable images fall through
    to the stub histogram (dense coverage for downstream ANN), as do
    non-image formats."""
    mm = _with_fake_pil(monkeypatch)
    vec, codec = mm._feature_one(b"GOOD....", "png", 16)
    assert codec == "pil" and len(vec) == 16
    assert all(abs(v - 17 / 255.0) < 1e-6 for v in vec)  # fake pixel value
    vec2, codec2 = mm._feature_one(b"junk", "jpeg", 16)
    assert codec2 == "stub" and len(vec2) == 16
    assert mm._feature_one(b"abc", "wav", 8)[1] == "stub"


def test_resize_and_feature_stub_columns_in_plan(spark, sf_dir):
    """End-to-end through mapInPandas in this container: every row reports
    the stub codec and the provenance columns survive the Arrow batches."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.multimodal import (
        feature_extract,
        frame_sample,
        resize,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 15)
    media = attach_payload(docs, "doc_id", "text")
    r = resize(media, 32, 32).select("ok", "codec").distinct().collect()
    assert {(x.ok, x.codec) for x in r} == {(True, "stub")}
    f = feature_extract(media, dim=8).select("codec").distinct().collect()
    assert {x.codec for x in f} == {"stub"}
    fr = frame_sample(media, every_n=10, max_frames=2).select("codec").distinct().collect()
    assert {x.codec for x in fr} == {"stub"}


def test_feature_one_audio_prefers_soundfile(monkeypatch):
    """With a (fake) soundfile present, wav payloads get the per-segment
    RMS loudness-envelope descriptor (codec='soundfile'); unreadable audio
    falls through to the stub histogram."""
    from datawarehouse_etl_using_hyperjoin_spark.operators import multimodal as mm

    class _FakeSF:
        @staticmethod
        def read(buf):
            if buf.read(4) != b"RIFF":
                raise ValueError("not audio")
            import types

            return [0.5] * 64, 8000  # constant signal, ndim-1 list

    monkeypatch.setattr(mm, "_soundfile", _FakeSF)
    monkeypatch.setattr(mm, "_HAVE_SOUNDFILE", True)
    vec, codec = mm._feature_one(b"RIFF....", "wav", 8)
    assert codec == "soundfile" and len(vec) == 8
    assert all(abs(v - 0.5) < 1e-9 for v in vec)  # RMS of constant 0.5
    assert mm._feature_one(b"junk", "wav", 8)[1] == "stub"


def test_langid_rank_order_discriminates_and_is_deterministic(spark):
    """Cavnar-Trenkle n-gram language ID (r7): train profiles on two
    synthetic 'languages' with disjoint character distributions, then
    classify held-out docs of each — every prediction correct, distances
    integer and identical across repeated runs; empty text → 'und'."""
    from datawarehouse_etl_using_hyperjoin_spark.operators.text import (
        char_ngram_profile,
        langid_rank_order,
    )

    alpha = [(i, "alpha", "abba abab baab babb aabb " * 3) for i in range(6)]
    zeta = [(i + 10, "zeta", "zyyz zzyy yzzy yzyz zzzy " * 3) for i in range(6)]
    train = spark.createDataFrame(
        alpha + zeta, "doc_id long, lang string, text string"
    )
    profiles = char_ngram_profile(train, "lang", "text", top_k=20)
    assert profiles.count() <= 40
    held = spark.createDataFrame(
        [(100, "abab baba abba"), (101, "zyzy yzyz zzyy"), (102, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.lang_pred, r.oop_distance)
        for r in langid_rank_order(held, profiles, "doc_id", "text", top_k=20)
        .collect()
    }
    assert got[100][0] == "alpha" and got[101][0] == "zeta"
    assert got[102] == ("und", None)
    assert isinstance(got[100][1], int)
    again = {
        r.doc_id: (r.lang_pred, r.oop_distance)
        for r in langid_rank_order(held, profiles, "doc_id", "text", top_k=20)
        .collect()
    }
    assert got == again


def test_langid_oracle_matches_spark_on_gramless_docs(spark):
    """r8 (ADVICE medium): the _LANGID_SQL oracle must emit ('und', NULL)
    for docs that produce no n-grams — empty, whitespace-only, or NULL
    text — exactly like langid_rank_order's left-join-back-to-all-docs.
    Full value parity on a fixture that exercises all three gram-less
    shapes, so the driver gate can never diverge on row count again."""
    import duckdb

    from datawarehouse_etl_using_hyperjoin_spark.operators.text import (
        char_ngram_profile,
        langid_rank_order,
    )
    from datawarehouse_etl_using_hyperjoin_spark.queries.extensions import (
        _LANGID_SQL,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha", "abba abab baab babb aabb " * 3),
            (2, "zeta", "zyyz zzyy yzzy yzyz zzzy " * 3),
            (3, "alpha", "abab baba abba aabb"),
            (4, "zeta", "yzyz zzzy zyyz"),
            (5, "alpha", ""),        # empty -> no grams
            # whitespace-only is NOT gram-less: trim strips spaces but
            # the tab survives, \s+ collapses it to a single-space text,
            # which contributes itself as one gram — on BOTH engines
            (6, "zeta", "   \t  "),
            (7, "alpha", None),      # NULL text -> no grams
        ],
        "doc_id long, lang string, text string",
    )
    profiles = char_ngram_profile(docs, "lang", "text", n=3, top_k=50,
                                  max_chars=600)
    got = {
        r.doc_id: (r.lang_pred, r.oop_distance)
        for r in langid_rank_order(
            docs, profiles, "doc_id", "text", n=3, top_k=50, max_chars=600
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    exp = {
        row[0]: (row[1], row[2])
        for row in con.execute(_LANGID_SQL).fetchall()
    }
    assert got == exp
    assert got[5] == ("und", None)
    assert got[6][1] is not None  # single-space gram -> a real distance
    assert got[7] == ("und", None)
