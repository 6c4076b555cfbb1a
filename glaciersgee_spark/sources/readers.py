"""Typed source readers — every external format the engine ingests.

Policy (SURVEY.md §1.2): schemas are DECLARED, never inferred. Schema
inference costs a second full pass over the data (fatal at 100 TB) and
produces engine-dependent types that break the DuckDB oracle's
schema-sensitive comparison. Each reader takes an explicit StructType
and returns a DataFrame whose schema is exactly that StructType.

The corpus parquet loaders (fixed per-table schemas asserted against
the footer) live in :mod:`glaciersgee_spark.tables`; these readers are
the generic surface for manifest files, ingest logs, and multimodal
payload directories that a Landsat-ETL-style pipeline produces and
consumes (SURVEY.md §2 Group A: q_a_export_manifest / q_a_ingest_log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from glaciersgee_spark.session import ensure_confs


def read_parquet(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Columnar parquet scan (projection + predicate pushdown intact).

    If `schema` is given it is asserted against the file footer —
    loud drift detection instead of silent cast surprises downstream.
    """
    ensure_confs(spark)
    df = spark.read.parquet(path)
    if schema is not None:
        got, want = df.schema.simpleString(), schema.simpleString()
        if got != want:
            raise AssertionError(f"{path}: schema drift: {got} != {want}")
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """CSV with a declared schema — no inference pass, no surprises."""
    ensure_confs(spark)
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with a declared schema (manifest-file shape).

    Fields absent from a line arrive as NULL; extra fields are ignored
    — the schema IS the contract, matching schema-on-read for the
    GEE-style dynamic-properties idiom (SURVEY.md §1.1).
    """
    ensure_confs(spark)
    return spark.read.schema(schema).json(path)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque binary payloads + typed metadata (multimodal columns).

    Spark's `binaryFile` source yields
    (path, modificationTime, length, content: BinaryType) — the
    engine's representation for imagery/audio blobs (SURVEY.md §1.2):
    payload stays opaque bytes, all query logic runs on the metadata
    and on features derived by the mapInPandas decode plumbing
    (operators.multimodal).
    """
    ensure_confs(spark)
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC source with an optionally-declared schema (never inferred
    twice: ORC footers carry types, but declaring pins the contract)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
