"""Custom connector via the PySpark 4 Python Data Source API.

The one source surface the scan family (q_b_scan_*) didn't yet cover:
a user-defined batch connector (`pyspark.sql.datasource.DataSource`)
— the public API for "read from a system Spark has no built-in source
for" (a REST catalog, an instrument feed, an in-house manifest
service). Spark plans it like any source: `partitions()` declares the
split set (here 4), each executor pulls only its `InputPartition`
through `read()`, and the rows enter the plan as ordinary columns —
filters/projections compose on top.

This instance is a deterministic synthetic scene-manifest generator
(pure integer arithmetic per scene id), so the DuckDB oracle can
regenerate the identical rows from generate_series — the connector
protocol is what's under test, not the data.
"""

from __future__ import annotations

from collections.abc import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

ROWS_PER_PART = 100
N_PARTS = 4


class SceneManifestDataSource(DataSource):
    """4-partition deterministic scene manifest."""

    @classmethod
    def name(cls) -> str:
        return "ggee_scene_manifest"

    def schema(self) -> str:
        return (
            "scene_id BIGINT, tile_x INT, tile_y INT, day INT,"
            " cloud_pct DOUBLE"
        )

    def reader(self, schema) -> "SceneManifestReader":
        return SceneManifestReader()

    def streamReader(self, schema) -> "SceneManifestStreamReader":
        return SceneManifestStreamReader()


class SceneManifestReader(DataSourceReader):
    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(N_PARTS)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        base = partition.value * ROWS_PER_PART
        for i in range(ROWS_PER_PART):
            sid = base + i
            # pure integer derivations; int/10.0 is one correctly-
            # rounded IEEE division — identical in the SQL oracle
            yield (
                sid,
                sid % 36,
                (sid // 36) % 18,
                sid % 16,
                ((sid * 37) % 1000) / 10.0,
            )


# ------------------------------------------- filter-pushdown reader form


class SceneManifestPushdownDataSource(DataSource):
    """The same deterministic manifest behind a reader that implements
    Spark 4.1's `DataSourceReader.pushFilters` — a SEPARATE source name
    because Spark refuses (DATA_SOURCE_PUSHDOWN_DISABLED, verified
    first-hand) to plan a pushFilters-implementing reader while
    `spark.sql.python.filterPushdown.enabled` is false, and the plain
    connector must keep working on sessions without the conf."""

    @classmethod
    def name(cls) -> str:
        return "ggee_scene_manifest_pushdown"

    def schema(self) -> str:
        return (
            "scene_id BIGINT, tile_x INT, tile_y INT, day INT,"
            " cloud_pct DOUBLE"
        )

    def reader(self, schema) -> "SceneManifestPushdownReader":
        return SceneManifestPushdownReader()


class SceneManifestPushdownReader(DataSourceReader):
    """Connector-side filtering: the manifest service indexes scenes by
    id and acquisition day, so range/equality/IN predicates on
    `scene_id` and `day` are ACCEPTED in pushFilters (retained on self,
    applied in partitions()/read()); anything else — e.g. a cloud_pct
    bound, which the fictional service has no index for — is yielded
    back for Spark to evaluate post-scan, the partial-pushdown
    contract. scene_id bounds prune whole InputPartitions (each covers
    a contiguous ROWS_PER_PART id range), so a pruned split is never
    planned, never scheduled, never generated — the Python-source
    equivalent of parquet row-group skipping."""

    def __init__(self) -> None:
        # accepted-predicate state; pushFilters may tighten these and
        # MUST leave the object picklable (it ships to executors)
        self.id_lo = 0  # inclusive
        self.id_hi = N_PARTS * ROWS_PER_PART  # exclusive
        self.day_allowed: set[int] | None = None  # None = no day filter
        self.pushed: list[Filter] = []  # observability (tests assert)

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            att = getattr(f, "attribute", None)
            if att == ("scene_id",) and isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual),
            ):
                v = int(f.value)
                if isinstance(f, EqualTo):
                    self.id_lo = max(self.id_lo, v)
                    self.id_hi = min(self.id_hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.id_lo = max(self.id_lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.id_lo = max(self.id_lo, v)
                elif isinstance(f, LessThan):
                    self.id_hi = min(self.id_hi, v)
                else:  # LessThanOrEqual
                    self.id_hi = min(self.id_hi, v + 1)
                self.pushed.append(f)
            elif att == ("day",) and isinstance(f, (EqualTo, In)):
                vals = (
                    {int(f.value)}
                    if isinstance(f, EqualTo)
                    else {int(v) for v in f.value}
                )
                self.day_allowed = (
                    vals
                    if self.day_allowed is None
                    else self.day_allowed & vals
                )
                self.pushed.append(f)
            else:
                # unsupported (wrong column, OR-shape never arrives —
                # Spark sends only a top-level AND) → Spark re-applies
                yield f

    def partitions(self) -> list[InputPartition]:
        # split pruning off the accepted scene_id bounds
        return [
            InputPartition(i)
            for i in range(N_PARTS)
            if i * ROWS_PER_PART < self.id_hi
            and (i + 1) * ROWS_PER_PART > self.id_lo
        ] or [InputPartition(0)]  # Spark requires ≥1 split; reads empty

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        base = partition.value * ROWS_PER_PART
        lo = max(base, self.id_lo)
        hi = min(base + ROWS_PER_PART, self.id_hi)
        for sid in range(lo, hi):
            day = sid % 16
            if self.day_allowed is not None and day not in self.day_allowed:
                continue
            yield (
                sid,
                sid % 36,
                (sid // 36) % 18,
                day,
                ((sid * 37) % 1000) / 10.0,
            )


# ------------------------------------------------ streaming reader form

BATCH_ROWS = 100  # input-partition granularity within an offset range
STREAM_END = N_PARTS * ROWS_PER_PART  # the full manifest, then idle


class SceneManifestStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming form of the same manifest: offsets are
    row positions. latestOffset() reports everything the (static)
    manifest holds — for availableNow that is the drain target
    captured at query start, so the whole backlog lands in one
    micro-batch whose offset range partitions() splits into
    BATCH_ROWS-row input partitions for parallel executor-side reads.
    (Incremental per-poll offset stepping would under-report the
    availableNow target and truncate the drain; a live feed would
    instead return its real high-water mark here.) Deterministic
    total content equals the batch reader's, which is what the
    oracle checks."""

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        return {"pos": STREAM_END}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        return [
            InputPartition((p, min(p + BATCH_ROWS, hi)))
            for p in range(lo, hi, BATCH_ROWS)
        ] or [InputPartition((lo, hi))]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for sid in range(lo, hi):
            yield (
                sid,
                sid % 36,
                (sid // 36) % 18,
                sid % 16,
                ((sid * 37) % 1000) / 10.0,
            )

    def commit(self, end: dict) -> None:
        pass


# ------------------------------------------------ streaming writer form


@dataclass
class JsonlCommit(WriterCommitMessage):
    """Staged file produced by one write task (picklable)."""

    path: str
    n_rows: int


class JsonlSinkDataSource(DataSource):
    """Custom exactly-once JSON-lines streaming SINK: write tasks stage
    part files, the driver-side commit() publishes them into a
    per-batch manifest — uncommitted staging files are invisible to
    readers, so a failed task or abandoned batch leaves no partial
    output (the same stage-then-publish contract every transactional
    sink implements)."""

    @classmethod
    def name(cls) -> str:
        return "ggee_jsonl_sink"

    def schema(self) -> str:  # writer-only source still declares one
        return "event_id BIGINT, user_id BIGINT, value_cents BIGINT"

    def streamWriter(self, schema, overwrite: bool) -> "JsonlStreamWriter":
        return JsonlStreamWriter(self.options["path"], [f.name for f in schema.fields])


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, base: str, cols: list) -> None:
        self.base = base
        self.cols = cols

    def write(self, iterator) -> JsonlCommit:
        import json
        import os
        import uuid

        staging = os.path.join(self.base, "_staging")
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as fh:
            for row in iterator:
                fh.write(json.dumps({c: row[c] for c in self.cols}) + "\n")
                n += 1
        return JsonlCommit(path=path, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = os.path.join(self.base, f"_commit_{batchId}.json")
        files = [
            {"path": m.path, "n_rows": m.n_rows}
            for m in messages
            if m is not None
        ]
        with open(manifest, "w") as fh:
            json.dump(files, fh)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def read_committed_jsonl(spark, base: str):
    """Read back ONLY the files the sink's commit() published."""
    import glob
    import json

    files: list = []
    for manifest in sorted(glob.glob(f"{base}/_commit_*.json")):
        with open(manifest) as fh:
            files.extend(e["path"] for e in json.load(fh))
    schema = "event_id BIGINT, user_id BIGINT, value_cents BIGINT"
    return spark.read.schema(schema).json(files)
