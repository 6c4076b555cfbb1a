"""Group E — multimodal (binary) column handling.

Images/audio/video are opaque BinaryType payloads + typed metadata
structs (SURVEY.md §1.2). The decode/feature-extract step is STUBBED —
no imaging libraries ship in this container — behind a deterministic
fake so the Spark-side plumbing (schema, Arrow batching, mapInPandas
signature, partitioning) is real and tested; swap `_decode_stub` for a
real decoder (PIL/librosa/ffmpeg) to productionize.

The scalar derivations (content hash, size, magic-byte sniffing) are
SQL-expressible and oracle-checked; the mapInPandas pipeline is
rows-only. A binaryFile-source unit test lives in tests/test_multimodal.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from glaciersgee_spark.registry import query
from glaciersgee_spark.tables import load_table


@query(
    "q_e_multimodal",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_md5,  -- DuckDB lacks md5(BLOB); bytes identical

           octet_length(content) AS n_bytes,
           lower(substring(hex(content), 1, 8)) AS magic_hex,
           (octet_length(content) = n_chars) AS len_consistent
    FROM (SELECT doc_id, n_chars, text, CAST(text AS BLOB) AS content FROM documents)
    WHERE doc_id % 6 = 0
    """,
)
def q_e_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column scalar surface: payloads built deterministically
    from document text (ASCII bytes), then content-addressed (md5),
    sized, and format-sniffed via magic bytes — the per-object metadata
    pass an imagery pipeline runs before any decode."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 6 == 0)
    content = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.md5(content).alias("content_md5"),
        F.length(content).cast("long").alias("n_bytes"),
        F.lower(F.substring(F.hex(content), 1, 8)).alias("magic_hex"),
        (F.length(content).cast("long") == F.col("n_chars")).alias("len_consistent"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum_mod", T.LongType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decoder: deterministic 4-dim fake feature from raw bytes.

    A real implementation would decode the image/audio payload
    (PIL.Image.open / librosa.load — not available in this container)
    and emit model features; raising NotImplementedError here would be
    correct too, but a deterministic fake lets the batch plumbing be
    exercised end-to-end.
    """
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
    ]


def decode_features(it: Iterator) -> Iterator:
    """mapInPandas worker: Arrow batches in, feature batches out.

    Per-batch (not per-row) Python crossing; at 100 TB this runs one
    Python worker per core with batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    import pandas as pd

    for pdf in it:
        feats = pdf["content"].map(lambda b: _decode_stub(bytes(b)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "byte_sum_mod": pdf["content"].map(lambda b: sum(bytes(b)) % 997).astype(
                    "int64"
                ),
                "feat": feats,
            }
        )


@query("q_e_mm_decode")  # rows-only: the decode stage is a Python boundary
def q_e_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature-extract pipeline over binary payloads
    via mapInPandas (Arrow-batched). Decode itself is the documented
    stub; schema, batching and partitioning are the real article."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("content"))
    return payloads.mapInPandas(decode_features, _FEATURE_SCHEMA)


@query(
    "q_e_mm_framesample",
    oracle="""
    SELECT doc_id, n_frames, CAST(f.frame_idx AS BIGINT) AS frame_idx,
           CAST(f.frame_idx * 40 AS BIGINT) AS ts_ms
    FROM (
      SELECT doc_id, n_chars AS n_frames,
             generate_series(0, CAST(n_chars AS BIGINT) - 1,
                             CAST(greatest(n_chars // 8, 1) AS BIGINT)) AS idxs
      FROM documents WHERE doc_id % 7 = 0
    ), unnest(idxs) AS f(frame_idx)
    """,
)
def q_e_mm_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: per payload, emit a uniform
    stride of ≤~8 frame indices with their 25fps timestamps (n_chars
    plays the frame count; the real pipeline feeds these indices to
    the stubbed decoder in q_e_mm_decode). sequence+explode keeps the
    expansion executor-side — one narrow stage, no Python, no shuffle;
    at 100 TB this is the map stage ahead of a decode mapInPandas."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    base = d.select(
        "doc_id",
        F.col("n_chars").alias("n_frames"),
        F.greatest(F.expr("n_chars div 8"), F.lit(1).cast("long")).alias("stride"),
    )
    return base.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.col("stride"))
        ).alias("frame_idx"),
    ).select(
        "doc_id",
        "n_frames",
        "frame_idx",
        (F.col("frame_idx") * 40).alias("ts_ms"),
    )
