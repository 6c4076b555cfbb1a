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


# ---------------------------------------------------------------------------
# Python Data Source batch WRITER (round 9) — the write half of the
# Spark 4 Python DataSource API, completing the family: pysource.py is
# the batch/stream READ side (+ pushFilters), stream.py's pysink is
# the STREAMING write side, and this is the BATCH write side with the
# full two-phase commit protocol: executors write staged shards and
# return picklable commit messages; the driver's commit() publishes
# them atomically (rename + manifest) only after every task succeeded;
# abort() discards the staged files. At 100 TB the same protocol
# coordinates object-store multipart uploads — the staging/commit
# SPLIT is the contract, the local rename is the test-scale stand-in.
# ---------------------------------------------------------------------------

import dataclasses as _dc
import json as _json
import os as _os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@_dc.dataclass
class ShardCommit(WriterCommitMessage):
    shard: str
    n_rows: int


class JsonlSinkDataSource(DataSource):
    """Batch JSONL sink with staged-shard two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "ggee_jsonl_sink"

    def writer(self, schema, overwrite):
        return JsonlSinkWriter(
            self.options, [f.name for f in schema.fields]
        )


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, cols):
        self.path = options["path"]
        self.cols = cols

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = _os.path.join(self.path, f"_tmp_shard_{pid:05d}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(
                    _json.dumps(
                        {c: row[c] for c in self.cols}, sort_keys=True
                    )
                    + "\n"
                )
                n += 1
        return ShardCommit(shard=tmp, n_rows=n)

    def commit(self, messages):
        total = 0
        for m in messages:
            _os.rename(m.shard, m.shard.replace("_tmp_shard_", "shard_"))
            total += m.n_rows
        with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            _json.dump(
                {"n_shards": len(messages), "total_rows": total}, f
            )

    def abort(self, messages):
        for m in messages:
            try:
                _os.remove(m.shard)
            except OSError:
                pass
