"""Group E — multimodal (binary) column handling.

Images/audio/video are opaque BinaryType payloads + typed metadata
structs (SURVEY.md §1.2). The decode/feature-extract step is STUBBED —
no imaging libraries ship in this container — behind a deterministic
fake so the Spark-side plumbing (schema, Arrow batching, mapInPandas
signature, partitioning) is real and tested; swap `_decode_stub` for a
real decoder (PIL/librosa/ffmpeg) to productionize.

The scalar derivations (content hash, size, magic-byte sniffing) are
SQL-expressible and oracle-checked; the mapInPandas decode pipeline's
stub transform is md5-slice-based, so it is oracle-checked too. A
binaryFile-source unit test lives in tests/test_multimodal.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
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
        T.StructField("head_md5", T.StringType()),
        T.StructField("f0", T.DoubleType()),
        T.StructField("f1", T.DoubleType()),
        T.StructField("f2", T.DoubleType()),
        T.StructField("f3", T.DoubleType()),
    ]
)

_FEAT_MOD = 1_000_000


def _decode_stub(payload: bytes) -> tuple[str, list[float]]:
    """STUB decoder: deterministic md5-of-slice features from raw bytes.

    A real implementation would decode the image/audio payload
    (PIL.Image.open / librosa.load — not available in this container)
    and emit model features. The stand-in is a byte-transform any
    engine can reproduce (DuckDB BLOB/text functions in the oracle):
    md5 of the first 16 bytes, plus one 60-bit-md5-derived double per
    byte quarter — so the Python-boundary plumbing is exercised
    end-to-end AND the output hashes cross-engine.
    """
    import hashlib

    n = len(payload)
    q = n // 4
    slices = [payload[0:q], payload[q : 2 * q], payload[2 * q : 3 * q], payload[3 * q :]]
    feats = [
        float(int(hashlib.md5(s).hexdigest()[:15], 16) % _FEAT_MOD) for s in slices
    ]
    return hashlib.md5(payload[:16]).hexdigest(), feats


def decode_features(it: Iterator) -> Iterator:
    """mapInPandas worker: Arrow batches in, feature batches out.

    Per-batch (not per-row) Python crossing; at 100 TB this runs one
    Python worker per core with batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    import pandas as pd

    for pdf in it:
        decoded = pdf["content"].map(lambda b: _decode_stub(bytes(b)))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["content"].map(len).astype("int64"),
                "head_md5": decoded.map(lambda d: d[0]),
                "f0": decoded.map(lambda d: d[1][0]),
                "f1": decoded.map(lambda d: d[1][1]),
                "f2": decoded.map(lambda d: d[1][2]),
                "f3": decoded.map(lambda d: d[1][3]),
            }
        )


_DUCK_FEAT = (
    "CAST(CAST(concat('0x', substring(md5({s}), 1, 15)) AS BIGINT)"
    f" % {_FEAT_MOD} AS DOUBLE)"
)


@query(
    "q_e_mm_decode",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(substring(text, 1, 16)) AS head_md5,
           {_DUCK_FEAT.format(s="substring(text, 1, q)")} AS f0,
           {_DUCK_FEAT.format(s="substring(text, q + 1, q)")} AS f1,
           {_DUCK_FEAT.format(s="substring(text, 2 * q + 1, q)")} AS f2,
           {_DUCK_FEAT.format(s="substring(text, 3 * q + 1)")} AS f3
    FROM (SELECT doc_id, text, strlen(text) // 4 AS q
          FROM documents WHERE doc_id % 10 = 0)
    """,
)
def q_e_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode/feature-extract pipeline over binary payloads
    via mapInPandas (Arrow-batched). Decode itself is the documented
    deterministic stub (md5-of-quarter-slice features — ASCII payloads
    make text substring ≡ byte slice, so the DuckDB oracle reproduces
    it); schema, batching and partitioning are the real article."""
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


SHARD_BYTES = 4096  # webdataset-style shard budget (bytes, corpus-scaled)


@query(
    "q_e_mm_shard_manifest",
    oracle=f"""
    WITH payloads AS (
      SELECT doc_id, lang, octet_length(CAST(text AS BLOB)) AS n_bytes
      FROM documents
    ),
    offsets AS (
      SELECT doc_id, lang, n_bytes,
             CAST(COALESCE(SUM(n_bytes) OVER (
               PARTITION BY lang ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS start_off
      FROM payloads
    ),
    sharded AS (
      SELECT lang, doc_id, n_bytes,
             CAST(floor(start_off / {SHARD_BYTES}.0) AS BIGINT) AS shard_id
      FROM offsets
    )
    SELECT lang, shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_objects,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM sharded GROUP BY lang, shard_id
    """,
)
def q_e_mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest for binary payloads (webdataset-style
    export): assign each object a byte offset in its language's
    deterministic doc_id stream, cut shards at a fixed byte budget,
    and emit per-shard object counts / byte totals / id ranges — the
    manifest a multimodal export writes before sharding blobs to
    object storage.

    Same running-sum window discipline as q_e_seq_pack (offset =
    exact integer prefix sum, shard = offset div budget — an object
    that straddles the boundary belongs to the shard its START falls
    in). One window per language partition + one rollup; at 100 TB
    the partition key would include a date bucket so no single
    language's stream serializes through one task.
    """
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", "lang", F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sharded = payloads.select(
        "lang",
        "doc_id",
        "n_bytes",
        F.floor(
            F.coalesce(F.sum("n_bytes").over(w), F.lit(0)).cast("bigint")
            / float(SHARD_BYTES)
        )
        .cast("long")
        .alias("shard_id"),
    )
    return sharded.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_objects"),
        F.sum("n_bytes").alias("shard_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "q_e_mm_pairs",
    oracle="""
    SELECT d.lang,
           COUNT(*) AS n_docs,
           COUNT(e.vec_id) AS n_paired,
           round(CAST(COUNT(e.vec_id) AS DOUBLE) / COUNT(*), 6) AS pair_rate,
           CAST(SUM(CASE WHEN e.vec_id IS NOT NULL
                         THEN octet_length(CAST(d.text AS BLOB)) ELSE 0 END)
                AS BIGINT) AS paired_bytes,
           COUNT(DISTINCT e.label) AS n_labels
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def q_e_mm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-pair construction audit: join the binary-payload corpus
    (documents as payload carriers) against the embedding table on
    object id — the (image, embedding) pairing step of a contrastive
    training-data build — and report per language how complete the
    pairing is (pair rate), how many payload bytes are covered, and
    how many distinct labels the paired subset spans.

    LEFT JOIN keeps unpaired payloads visible (they are the backlog
    the embedding job still owes). At local scale the embedding side
    broadcasts; at 100 TB both sides are large and this becomes a
    shuffle join on the id — either way the rollup is map-side
    combinable on lang."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    j = d.join(e, d.doc_id == e.vec_id, "left")
    paired = F.col("vec_id").isNotNull()
    return (
        j.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("vec_id").alias("n_paired"),
            F.round(
                F.count("vec_id").cast("double") / F.count(F.lit(1)), 6
            ).alias("pair_rate"),
            F.sum(
                F.when(paired, F.length(F.col("text").cast("binary"))).otherwise(0)
            ).alias("paired_bytes"),
            F.countDistinct("label").alias("n_labels"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q_e_mm_audio_chunks (round 9)
# ---------------------------------------------------------------------------

# Deterministic audio metadata synthesized per doc: sample rate from
# the id parity (16 kHz mono speech vs 44.1 kHz music), PCM16 samples
# proportional to the payload size.
_AUD_RATE = "CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 44100 END"
# ×4096 (not ×256): at sf0.01 most sampled docs are < 625 chars, and
# 256 samples/char left EVERY doc inside one 16 kHz window — the
# round-9 constant-column audit flagged chunk_idx/is_tail as
# unfalsifiable; 4096/char puts typical docs at 2-20 windows.
_AUD_SAMPLES = "CAST(n_chars AS BIGINT) * 4096"
_AUD_WINDOW_S = 10  # fixed-duration transcription windows


@query(
    "q_e_mm_audio_chunks",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             CAST({_AUD_RATE} AS BIGINT) AS rate,
             {_AUD_SAMPLES} AS n_samples
      FROM documents WHERE doc_id % 7 = 0),
    sized AS (
      SELECT *, rate * {_AUD_WINDOW_S} AS win,
             CAST(ceil(CAST(n_samples AS DOUBLE)
                       / (rate * {_AUD_WINDOW_S})) AS BIGINT) AS n_chunks
      FROM meta),
    chunks AS (
      SELECT doc_id, rate, n_samples, n_chunks,
             CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx,
             win
      FROM sized)
    SELECT doc_id, CAST(rate AS INT) AS rate, chunk_idx,
           chunk_idx * win AS start_sample,
           LEAST((chunk_idx + 1) * win, n_samples) AS end_sample,
           chunk_idx * win * 2 AS start_byte,
           CAST(chunk_idx = n_chunks - 1 AS BOOLEAN) AS is_tail,
           CASE WHEN chunk_idx = n_chunks - 1
                THEN (chunk_idx + 1) * win - n_samples
                ELSE CAST(0 AS BIGINT) END AS pad_samples
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
)
def q_e_mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO WINDOWING PLAN (round 9) — the shard-prep step of a
    Whisper-style transcription pipeline: each opaque PCM16 payload is
    cut into fixed {_AUD_WINDOW_S}-second windows (sample-exact
    boundaries, byte offsets for ranged object-store reads, tail
    padding for the final partial window) BEFORE any decoder runs —
    the planning pass is pure metadata arithmetic, so it belongs in
    the engine, not the GPU worker. Completes the multimodal family:
    q_e_mm_framesample samples video frames, q_e_mm_shard_manifest
    packs shards, THIS op windows audio; the decode itself stays
    behind the module's documented stub boundary.

    Determinism: rate and sample count are synthesized from doc
    metadata identically in both engines; chunk fan-out is
    sequence()+explode ⟷ range()+unnest, every boundary an exact
    BIGINT (the one ceil() runs on a ≤2^53-exact double ratio,
    identically rounded in both engines). Scale: one scan-side
    projection, one JVM explode whose fan-out is duration-bounded
    per object (n_chunks = ⌈samples/window⌉), zero Python, zero
    shuffle until a downstream join — at 100 TB this plan emits the
    byte-range work-list the GPU fleet consumes."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 7 == 0)
        .selectExpr(
            "doc_id",
            f"CAST({_AUD_RATE} AS BIGINT) AS rate",
            f"{_AUD_SAMPLES} AS n_samples",
        )
    )
    sized = d.selectExpr(
        "*",
        f"rate * {_AUD_WINDOW_S} AS win",
        f"CAST(ceil(CAST(n_samples AS DOUBLE)"
        f" / (rate * {_AUD_WINDOW_S})) AS BIGINT) AS n_chunks",
    )
    # Guard the fan-out: an empty payload (n_chunks = 0) must emit zero
    # rows, but sequence(0, -1) yields a DESCENDING [0, -1] — matching
    # the oracle's empty range(0, 0) requires dropping the row first.
    chunks = sized.where(F.col("n_chunks") > 0).select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
        ).alias("chunk_idx"),
    )
    return chunks.selectExpr(
        "doc_id",
        "CAST(rate AS INT) AS rate",
        "chunk_idx",
        "chunk_idx * win AS start_sample",
        "LEAST((chunk_idx + 1) * win, n_samples) AS end_sample",
        "chunk_idx * win * 2 AS start_byte",
        "CAST(chunk_idx = n_chunks - 1 AS BOOLEAN) AS is_tail",
        "CASE WHEN chunk_idx = n_chunks - 1"
        " THEN (chunk_idx + 1) * win - n_samples"
        " ELSE CAST(0 AS BIGINT) END AS pad_samples",
    ).orderBy("doc_id", "chunk_idx")
