"""Multimodal binary-column plumbing: the binaryFile source over real
files on disk + the Arrow-batched decode pipeline (stubbed decoder,
real schema/batching — see operators/multimodal.py)."""

import os
import tempfile

import pyspark.sql.functions as F

from glaciersgee_spark.operators.multimodal import (
    _decode_stub,
    decode_features,
    q_e_mm_decode,
)
from glaciersgee_spark.sources.readers import read_binary_dir
from tests.conftest import SF_SMOKE

PAYLOADS = {
    "a.bin": b"\x89PNG\r\n\x1a\nfakeimagebytes",
    "b.bin": b"RIFF....WAVEfakeaudio",
    "c.bin": b"",
}


def _fixture_dir():
    d = tempfile.mkdtemp(prefix="ggee_bin_")
    for name, data in PAYLOADS.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(data)
    return d


def test_binaryfile_source_roundtrip(spark):
    d = _fixture_dir()
    df = read_binary_dir(spark, d)
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    rows = {os.path.basename(r.path): bytes(r.content) for r in df.collect()}
    # NOTE: the binaryFile source silently skips zero-byte files — a
    # real ingestion pipeline must reconcile against a manifest
    # (q_a_ingest_log shape) to notice them missing.
    assert rows == {k: v for k, v in PAYLOADS.items() if v}
    lens = {
        os.path.basename(r.path): r.length
        for r in df.select("path", "length").collect()
    }
    assert lens == {k: len(v) for k, v in PAYLOADS.items() if v}


def test_binaryfile_magic_byte_sniffing(spark):
    d = _fixture_dir()
    df = (
        spark.read.format("binaryFile")
        .load(d)
        .select(
            "path",
            F.lower(F.substring(F.hex("content"), 1, 8)).alias("magic"),
        )
    )
    magics = {os.path.basename(r.path): r.magic for r in df.collect()}
    assert magics["a.bin"] == "89504e47"  # PNG signature
    assert magics["b.bin"] == "52494646"  # RIFF
    assert "c.bin" not in magics  # zero-byte files skipped by the source


def test_decode_stub_deterministic():
    assert _decode_stub(b"abc") == _decode_stub(b"abc")
    assert _decode_stub(b"") == [0.0, 0.0, 0.0, 0.0]
    assert _decode_stub(b"\x01\x02") == [2.0, 1.0, 2.0, 3.0]


def test_decode_pipeline_schema_and_values(spark):
    out = q_e_mm_decode(spark, SF_SMOKE)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:bigint,byte_sum_mod:bigint,feat:array<double>>"
    )
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:10]:
        assert r.n_bytes == r.feat[0] > 0
        assert r.byte_sum_mod == r.feat[3]


def test_decode_pipeline_partitioning_invariant(spark):
    """mapInPandas output must not depend on the batch/partition layout."""
    a = {r.doc_id: tuple(r.feat) for r in q_e_mm_decode(spark, SF_SMOKE).collect()}
    from glaciersgee_spark.operators.multimodal import _FEATURE_SCHEMA
    from glaciersgee_spark.tables import load_table

    d = (
        load_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.col("text").cast("binary").alias("content"))
        .repartition(13)
    )
    b = {
        r.doc_id: tuple(r.feat)
        for r in d.mapInPandas(decode_features, _FEATURE_SCHEMA).collect()
    }
    assert a == b
