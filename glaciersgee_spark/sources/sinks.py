"""Sinks — every format the engine writes.

The partitioned-parquet sink is the 100 TB default: partition by a
date/ingest key so downstream scans get static + dynamic partition
pruning for free. JSON-lines is the manifest/ingest-log interchange
shape (Group A); noop is the bench sink (measures engine time without
driver-side row serialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet_partitioned(df: DataFrame, path: str, *partition_keys: str) -> None:
    """Partitioned columnar sink; key columns travel via the directory
    encoding (values must be directory-safe scalars)."""
    w = df.write.mode("overwrite")
    if partition_keys:
        w = w.partitionBy(*partition_keys)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines manifest sink (lossless only for long/string/bool;
    doubles round-trip via shortest-repr, timestamps as ISO strings)."""
    df.write.mode("overwrite").json(path)


def write_csv(df: DataFrame, path: str, sep: str = ",", header: bool = False) -> None:
    df.write.mode("overwrite").option("sep", sep).option(
        "header", str(header).lower()
    ).csv(path)


def write_noop(df: DataFrame) -> None:
    """Execute the full plan, discard rows executor-side (bench sink)."""
    df.write.format("noop").mode("overwrite").save()


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (columnar alternative to parquet; same lazy contract)."""
    df.write.mode("overwrite").orc(path)
