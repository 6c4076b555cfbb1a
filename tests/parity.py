"""Local clone of the driver's t2 oracle comparison (SURVEY.md §5.2).

Runs a declared Spark query and its DuckDB oracle SQL side-by-side and
compares row count, column names/dtypes, and an order-insensitive exact
value comparison (stricter than any hash: if this passes, every
reasonable hash matches).
"""

from __future__ import annotations

import datetime
import math
import struct
from dataclasses import dataclass, field

import duckdb

from glaciersgee_spark.tables import TABLE_NAMES


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Canonical, hashable form of one cell value."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # bit-exact: the engine contract is deterministic doubles
        return "f:" + struct.pack(">d", v).hex()
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return "t:" + v.isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    return "s:" + str(v)


@dataclass
class Mismatch:
    name: str
    kind: str
    detail: str = ""
    sample: list = field(default_factory=list)

    def __str__(self):
        s = f"[{self.name}] {self.kind}: {self.detail}"
        for row in self.sample[:6]:
            s += f"\n    {row}"
        return s


def compare(name, spark_df, sql, con) -> Mismatch | None:
    srows = spark_df.collect()
    scols = spark_df.columns
    duck = con.sql(sql)
    dcols = list(duck.columns)
    dtypes = [str(t) for t in duck.types]

    # Driver-faithfulness guard (round-2 postmortem): the external driver
    # canonicalizes through pandas, which renders DuckDB HUGEINT/DECIMAL as
    # float64 while Spark emits int64 — hash-red even though fetchall()
    # (below) would hide it by converting HUGEINT to Python int. Fail here
    # unless the Spark side is genuinely decimal too.
    spark_decimal = {
        f.name.lower() for f in spark_df.schema.fields
        if f.dataType.typeName() == "decimal"
    }
    for c, t in zip(dcols, dtypes):
        if (t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")) and (
            c.lower() not in spark_decimal
        ):
            return Mismatch(
                name,
                "oracle-dtype",
                f"oracle column {c!r} is DuckDB {t} (driver's pandas "
                f"canonicalizer → float64 vs Spark int64); "
                f"CAST(... AS BIGINT) it in the oracle SQL",
            )

    drows = duck.fetchall()

    if len(srows) != len(drows):
        return Mismatch(name, "rowcount", f"spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(c.lower() for c in dcols):
        return Mismatch(name, "columns", f"spark={sorted(scols)} duck={sorted(dcols)}")

    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [[c.lower() for c in dcols].index(c) for c in sorted(scols)]
    snorm = sorted("|".join(_norm(r[i]) for i in sidx) for r in srows)
    dnorm = sorted("|".join(_norm(r[i]) for i in didx) for r in drows)
    if snorm != dnorm:
        diff_s = [r for r in snorm if r not in set(dnorm)]
        diff_d = [r for r in dnorm if r not in set(snorm)]
        return Mismatch(
            name,
            "values",
            f"{len(diff_s)} spark-only / {len(diff_d)} duck-only rows; cols={sorted(scols)}",
            ["S " + r for r in diff_s[:3]] + ["D " + r for r in diff_d[:3]],
        )
    return None
