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


def test_multimodal_decode_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    media = attach_payload(docs, "doc_id", "text")
    assert dict(media.dtypes)["payload"] == "binary"
    out = decode(media)
    assert out.columns == [
        "doc_id", "media_format", "n_bytes", "width", "height", "n_frames", "ok"
    ]
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 30 and all(r.ok for r in rows.values())
    # audio rows have frames, no dimensions; image rows the reverse
    for r in rows.values():
        if r.media_format == "wav":
            assert r.width == 0 and r.n_frames >= 1
        else:
            assert r.width >= 64 and r.height >= 64
    # deterministic across runs
    again = {r.doc_id: r for r in decode(media).collect()}
    assert rows == again


def test_decode_parallelism_repartitions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    out = decode(media, decode_parallelism=7)
    assert out.rdd.getNumPartitions() == 7
    assert not math.isnan(out.count())
