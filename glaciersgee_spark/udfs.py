"""Group F — UDF surface (SURVEY.md §2 Group F).

UDFs are the engine's slow path by policy: every declared query that
CAN be a built-in expression is one (Groups A–E). This module is the
sanctioned escape hatch, demonstrating each UDF kind with oracle-
checkable semantics:

  * row-wise Python UDF (worst case: per-row serialization),
  * Arrow-vectorized pandas UDF (Series in, Series out),
  * grouped pandas aggregation via applyInPandas,
  * Python UDTF (one row in, N rows out).

Determinism across engines: the pandas paths either do IEEE-identical
elementwise math (bit-equal to SQL) or exact decimal arithmetic
mirroring the oracle's DECIMAL pipeline (q_f_pandas_grouped_agg).
"""

from __future__ import annotations

import decimal
import math
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T

from glaciersgee_spark.registry import query
from glaciersgee_spark.tables import fan_out, load_table


# ------------------------------------------------------- scalar Python UDF


# useArrow=False explicitly: this op IS the declared row-at-a-time
# boundary (and the explicit choice silences Spark 4's eval-type
# inference warning at import).
@F.udf(returnType=T.LongType(), useArrow=False)
def _digit_sum(n: int) -> int:
    return sum(int(c) for c in str(n))


@query(
    "q_f_udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(list_sum(list_transform(
                 range(1, length(CAST(o_orderkey AS VARCHAR)) + 1),
                 i -> CAST(CAST(o_orderkey AS VARCHAR)[i] AS BIGINT)))
             AS BIGINT) AS digit_sum
    FROM orders WHERE o_orderkey % 25 = 0
    """,
)
def q_f_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (digit sum). Exists to prove the
    boundary works — the oracle reimplements it in pure SQL, which is
    also how it SHOULD be written in production (see docstring policy)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 25 == 0)
    return o.select("o_orderkey", _digit_sum("o_orderkey").alias("digit_sum"))


# ------------------------------------------------------ pandas scalar UDF


@F.pandas_udf(T.DoubleType())
def _poly(x: pd.Series) -> pd.Series:
    # Parenthesized to match the SQL's left-assoc evaluation exactly:
    # IEEE-identical per element → bit-equal across engines.
    return ((3.0 * x) * x + (2.0 * x)) + 1.0


@query(
    "q_f_pandas_scalar",
    oracle="""
    SELECT p_partkey, ((3.0 * p_retailprice) * p_retailprice
                       + (2.0 * p_retailprice)) + 1.0 AS poly
    FROM part
    """,
)
def q_f_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: polynomial over a price column.
    NumPy elementwise float64 ops are IEEE-identical to the SQL
    expression with the same association order."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", _poly("p_retailprice").alias("poly"))


# -------------------------------------------------- grouped pandas agg


_TRIM_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("tmean", T.DoubleType()),
    ]
)

_Q6 = decimal.Decimal("0.000001")


def _quantize6(values) -> "np.ndarray":
    """Vectorized DECIMAL(·,6) cast: round-half-away-from-zero at 6 dp
    of the EXACT binary value, returned as scaled int64 (value·10⁶).

    Fast path: float multiply by 1e6 + half-away rounding — exact except
    when v·10⁶ lands within float error (≲1e-6 here) of a .5 boundary.
    Those borderline rows (plus any non-finite) fall back to
    decimal.Decimal on the exact binary expansion, so the result is
    bit-identical to the oracle's CAST(value AS DECIMAL(25,6)) while the
    hot path stays numpy."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    scaled = v * 1e6
    a = np.abs(scaled)
    frac = a - np.floor(a)
    fast = np.sign(scaled) * (np.floor(a) + (frac >= 0.5))
    borderline = (np.abs(frac - 0.5) < 1e-4) | ~np.isfinite(scaled)
    out = fast.astype(np.int64)
    if borderline.any():
        for i in np.flatnonzero(borderline):
            d = decimal.Decimal(float(v[i])).quantize(
                _Q6, rounding=decimal.ROUND_HALF_UP
            )
            out[i] = int(d.scaleb(6))
    return out


def _trimmed_mean(pdf: pd.DataFrame) -> pd.DataFrame:
    """Trimmed mean (drop one min, one max) in exact decimal arithmetic.

    Each value is quantized to 6 dp exactly like the oracle's
    CAST(value AS DECIMAL(25,6)) — see _quantize6 — then summed as
    int64 (exact integer arithmetic; |value| ≤ ~200 so Σ ≲ 2e13 «
    2⁶³), so the final double is bit-identical to the SQL
    (SUM(DECIMAL) - MIN - MAX) / (n-2) pipeline: x/1e6 and the
    decimal→double cast both correctly round the same exact rational.
    """
    q = _quantize6(pdf["value"])
    n = len(q)
    if n > 2:
        tmean = (int(q.sum() - q.min() - q.max()) / 1e6) / (n - 2)
    else:
        tmean = (int(q.sum()) / 1e6) / n
    return pd.DataFrame({"user_id": [pdf["user_id"].iloc[0]], "n": [n], "tmean": [tmean]})


@query(
    "q_f_pandas_grouped_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(25,6)))
                - CAST(MIN(value) AS DECIMAL(25,6))
                - CAST(MAX(value) AS DECIMAL(25,6)) AS DOUBLE)
             / (COUNT(*) - 2) AS tmean
    FROM events
    GROUP BY user_id
    """,
)
def q_f_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group aggregate (trimmed mean) via applyInPandas —
    the PySpark path for aggregates the built-ins can't express. One
    shuffle on the group key; each group becomes one Arrow batch."""
    ev = load_table(spark, sf_dir, "events")
    # Pre-hash-partition on the group key: groupBy reuses the
    # partitioning (no second shuffle) and the per-group Python calls
    # spread across all cores instead of one AQE-coalesced task.
    slim = fan_out(ev.select("user_id", "value"), "user_id")
    return slim.groupBy("user_id").applyInPandas(_trimmed_mean, _TRIM_SCHEMA)


# ----------------------------------------------------------------- UDTF


@query(
    "q_f_udtf",
    oracle="""
    SELECT o_orderkey, CAST(unit AS INT) AS unit
    FROM orders CROSS JOIN generate_series(1, 3) AS t(unit)
    WHERE o_orderkey % 40 = 0 AND unit <= (o_orderkey // 40) % 3 + 1
    """,
)
def q_f_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one input row → N output rows (unit expansion,
    capped at 3). Registered and invoked through LATERAL so the UDTF
    executes per input row; falls back conceptually to
    explode(sequence(...)) — which is the production spelling."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, unit int")
    class ExpandUnits:
        def eval(self, okey: int, n: int):
            for i in range(1, min(n, 3) + 1):
                yield okey, i

    spark.udtf.register("ggee_expand_units", ExpandUnits)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 40 == 0)
    o.createOrReplaceTempView("ggee_udtf_in")
    return spark.sql(
        """
        SELECT f.o_orderkey, f.unit
        FROM ggee_udtf_in v,
             LATERAL ggee_expand_units(v.o_orderkey,
                                       CAST((v.o_orderkey div 40) % 3 + 1 AS INT)) f
        """
    )


# ------------------------------------------------------- group-map UDF


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("z", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Population z-score of n_chars within one language group.

    All moments are exact int64 sums (n_chars ≤ ~1e3, Σx² ≲ 1e12 «
    2⁶³), so numerator (x·n − Σx) and radicand (n·Σx² − (Σx)²) are
    exact integers on both engines; the single sqrt + divide are then
    IEEE-identical to the oracle's spelling.
    """
    import numpy as np

    x = pdf["n_chars"].to_numpy(dtype="int64")
    n = len(x)
    s = int(x.sum())
    ss = int((x * x).sum())
    rad = n * ss - s * s
    if rad > 0:
        z = np.round((x * n - s).astype("float64") / math.sqrt(float(rad)), 6)
    else:
        z = np.zeros(n)
    return pd.DataFrame({"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z": z})


@query(
    "q_f_pandas_group_map",
    oracle="""
    WITH st AS (
      SELECT lang, COUNT(*) AS n, SUM(n_chars) AS s,
             SUM(n_chars * n_chars) AS ss
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           round((d.n_chars * st.n - st.s)
                 / sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE)), 6) AS z
    FROM documents d JOIN st ON d.lang = st.lang
    """,
)
def q_f_pandas_group_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-map UDF (applyInPandas transform): per-language z-score
    normalization of doc lengths — N rows in, N rows out per group,
    the whole-group-in-memory API the built-ins can't express when the
    transform needs every group row at once.

    Scale note: parallelism is bounded by group count (5 languages ⇒ 5
    Arrow batches) and each group must fit one executor's memory — the
    documented applyInPandas contract. A 100 TB pipeline with few huge
    groups would two-stage this (per-group moments via map-side-
    combinable agg + broadcast join back, exactly the oracle's
    spelling); this op declares the group-map API surface itself.
    """
    d = load_table(spark, sf_dir, "documents")
    slim = d.select("doc_id", "lang", "n_chars")
    return slim.groupBy("lang").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


# ------------------------------------------------------ cogroup UDF


_COGROUP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("n_purchases", T.LongType()),
        T.StructField("n_clicks", T.LongType()),
        T.StructField("n_purch_after_first_click", T.LongType()),
    ]
)


def _purchase_click_merge(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    """Merge one user's purchase and click streams: counts plus how
    many purchases happened after the user's FIRST click — needs both
    groups in memory at once, which is exactly the cogroup contract.

    Timestamps compare at millisecond grain (int64 µs // 1000) per the
    SURVEY.md §7.4 ns/µs parquet rule, matching the oracle's
    date_trunc('millisecond') comparisons.
    """
    uid = (purchases if len(purchases) else clicks)["user_id"].iloc[0]
    p_ms = purchases["ts"].astype("int64") // 1000 if len(purchases) else None
    c_ms = clicks["ts"].astype("int64") // 1000 if len(clicks) else None
    n_after = 0
    if p_ms is not None and c_ms is not None:
        n_after = int((p_ms > int(c_ms.min())).sum())
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_purchases": [len(purchases)],
            "n_clicks": [len(clicks)],
            "n_purch_after_first_click": [n_after],
        }
    )


@query(
    "q_f_cogroup_map",
    oracle="""
    WITH p AS (
      SELECT user_id, date_trunc('millisecond', ts) AS mts
      FROM events WHERE event_type = 'purchase' AND user_id % 5 = 0
    ),
    c AS (
      SELECT user_id, date_trunc('millisecond', ts) AS mts
      FROM events WHERE event_type = 'click' AND user_id % 5 = 0
    ),
    pc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases FROM p GROUP BY user_id),
    cc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_clicks,
                  MIN(mts) AS first_click
           FROM c GROUP BY user_id),
    af AS (SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS n_after
           FROM p JOIN cc ON p.user_id = cc.user_id
           WHERE p.mts > cc.first_click
           GROUP BY p.user_id)
    SELECT COALESCE(pc.user_id, cc.user_id) AS user_id,
           COALESCE(pc.n_purchases, 0) AS n_purchases,
           COALESCE(cc.n_clicks, 0) AS n_clicks,
           COALESCE(af.n_after, 0) AS n_purch_after_first_click
    FROM pc FULL OUTER JOIN cc ON pc.user_id = cc.user_id
            LEFT JOIN af ON COALESCE(pc.user_id, cc.user_id) = af.user_id
    """,
)
def q_f_cogroup_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped group-map UDF (`groupBy().cogroup().applyInPandas`):
    each user's purchase stream and click stream arrive as TWO pandas
    frames in one call — the API for per-key merges whose logic needs
    both sides materialized (session stitching, as-of matching).
    Here: per-user purchase/click counts plus purchases after the
    first click.

    One co-partitioned shuffle on the key for both sides; the oracle
    expresses the same merge relationally (aggregate + join), which is
    also the spelling a 100 TB run would prefer when the per-key logic
    IS expressible — the op declares the cogroup API surface itself.
    """
    # user_id % 5 sample: cogroup costs one Python call PER KEY, so key
    # cardinality — not row count — is the local-bench driver (measured
    # 7.7 s over all 1500 users, ~5 ms/key roundtrip). The declared
    # surface is the API shape; the sample keeps the bench honest about
    # engine work rather than Python call overhead.
    # Round-11 optimization note: this op could take q_f_cogroup_arrow's
    # bucketed-cogroup treatment (one roundtrip per hash bucket), but it
    # is the bench's python-class CALIBRATION probe (bench.py _TRIO) —
    # its runtime anchors host normalization across rounds, so its code
    # path stays frozen on purpose.
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 5 == 0)
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    c = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(_purchase_click_merge, _COGROUP_SCHEMA)
    )


# ------------------------------------------------------- mapInArrow


def _arrow_revenue(batches):
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        t = pa.Table.from_batches([batch])
        ext = pc.cast(t.column("l_extendedprice"), pa.float64())
        disc = pc.cast(t.column("l_discount"), pa.float64())
        cents = pc.cast(
            pc.floor(
                pc.multiply(
                    pc.multiply(ext, pc.subtract(pa.scalar(1.0), disc)),
                    pa.scalar(100.0),
                )
            ),
            pa.int64(),
        )
        out = pa.Table.from_arrays(
            [t.column("l_orderkey"), t.column("l_linenumber"), cents],
            names=["l_orderkey", "l_linenumber", "revenue_cents"],
        )
        yield from out.to_batches()


@query(
    "q_f_maparrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
             AS revenue_cents
    FROM lineitem WHERE l_orderkey % 10 = 0
    """,
)
def q_f_maparrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` surface: the zero-copy Arrow-native sibling of
    mapInPandas (no pandas conversion at all — RecordBatch in,
    RecordBatch out), the right boundary for kernels that already
    speak Arrow (Polars, DataFusion snippets, vectorized codecs).

    Kernel: discounted revenue in integer cents via floor — every step
    (f64 multiply, floor) is one IEEE-deterministic op, so the SQL
    oracle is bit-identical. Narrow map over the scan, zero shuffle;
    the projection (3 of 11 columns) is pushed through the Arrow
    boundary by Spark's columnar pruning."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    return fan_out(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    ).mapInArrow(
        _arrow_revenue,
        "l_orderkey bigint, l_linenumber int, revenue_cents bigint",
    )


# ------------------------------------------------- pandas iterator UDF


@F.pandas_udf(T.DoubleType())  # type OBJECT: a DDL string would force
# datatype parsing at import time, which needs an active SparkContext
def _log_revenue_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """SCALAR_ITER form: one-time per-worker setup (here: the constant)
    amortizes across batches — the eval type for UDFs with expensive
    initialization (model load, codec table). ln is rounded to 6 dp
    per the cross-engine convention."""
    import numpy as np

    scale = 100.0  # stands in for expensive setup done ONCE per worker
    for s in batches:
        yield pd.Series(np.round(np.log(s.to_numpy() / scale), 6))


@query(
    "q_f_pandas_iter",
    oracle="""
    SELECT o_orderkey,
           round(ln(o_totalprice / 100.0), 6) AS log_rev
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def q_f_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF (SCALAR_ITER) — the third Arrow
    eval type after scalar and grouped: same per-row semantics as
    q_f_pandas_scalar but the function sees the whole batch STREAM, so
    per-worker setup happens once instead of per batch. numpy ln and
    round(x, 6) are IEEE-identical to the SQL spelling."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    return fan_out(o.select("o_orderkey", "o_totalprice")).select(
        "o_orderkey", _log_revenue_iter("o_totalprice").alias("log_rev")
    )


# -------------------------------------------------- windowed pandas agg


@F.pandas_udf(T.DoubleType())
def _midrange(v: pd.Series) -> float:
    """Midrange (min+max)/2 of the window frame — one float add and
    halve over exact parquet doubles, IEEE-identical to the SQL
    (MIN(value) OVER w + MAX(value) OVER w) / 2 spelling."""
    return float((v.min() + v.max()) / 2.0)


@query(
    "q_f_pandas_window",
    oracle="""
    SELECT event_id, user_id,
           (MIN(value) OVER w + MAX(value) OVER w) / 2 AS mid3
    FROM events
    WHERE user_id % 19 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def q_f_pandas_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF over a BOUNDED WINDOW frame — the fourth Arrow eval
    shape of the declared UDF surface (after scalar, scalar-iter, and
    grouped-agg): a GROUPED_AGG pandas UDF applied `.over()` a
    rows-bounded window, computing the trailing-3-event midrange per
    user. This is the API a pipeline reaches for when a rolling
    statistic has no built-in window aggregate (rolling MAD, rolling
    trimmed mean); midrange keeps the oracle exactly expressible so
    the Arrow window plumbing itself is what parity checks.

    Scale: one shuffle on user_id (the window partition key); each
    frame is materialized per row over at most 3 values, streamed
    through WindowInPandasExec's spillable buffer — state is O(frame),
    not O(partition). Deterministic frame membership via the
    (ts, event_id) total order. The % 19 user sample keeps the
    per-row frame evaluation (the API's inherent cost: one Python
    call per output row, Arrow-batched) proportionate to its role as
    an API-surface proof, not a hot path.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 19 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        ev.select("event_id", "user_id", _midrange("value").over(w).alias("mid3"))
        .orderBy("event_id")
    )


# ------------------------------------------------- polymorphic UDTF


@query(
    "q_f_udtf_analyze",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 97 AS BIGINT) AS d_1,
           CAST((o_orderkey // 97) % 97 AS BIGINT) AS d_2,
           CAST((o_orderkey // (97 * 97)) % 97 AS BIGINT) AS d_3
    FROM orders WHERE o_orderkey % 40 = 0
    """,
)
def q_f_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (round 7 — Spark 4's `analyze()` API,
    the schema-from-arguments surface q_f_udtf's static form can't
    express): the UDTF's static analyze() receives the constant width
    argument at PLAN time and returns an AnalyzeResult whose schema
    has that many digit columns (base-97 key decomposition, width 3
    here) — the contract behind dynamic unpivot/parse/expand UDTFs
    whose shape depends on a parameter, resolved before execution so
    Catalyst plans column pruning over the emitted schema like any
    static source.

    Scale: per-row Python with Arrow batching, same posture as
    q_f_udtf — an API-surface proof over a % 40 key sample, not a hot
    path; the production spelling of THIS expansion is the pure
    codegen div/mod projection the oracle runs."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class DigitsBase97:
        @staticmethod
        def analyze(okey: AnalyzeArgument, width: AnalyzeArgument) -> AnalyzeResult:
            assert width.value is not None, "width must be a literal"
            fields = [T.StructField("o_orderkey", T.LongType())] + [
                T.StructField(f"d_{i}", T.LongType())
                for i in range(1, int(width.value) + 1)
            ]
            return AnalyzeResult(schema=T.StructType(fields))

        def eval(self, okey: int, width: int):
            digits = []
            x = okey
            for _ in range(width):
                digits.append(x % 97)
                x //= 97
            yield (okey, *digits)

    spark.udtf.register("ggee_digits97", DigitsBase97)
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 40 == 0)
    o.createOrReplaceTempView("ggee_udtfa_in")
    return spark.sql(
        """
        SELECT f.o_orderkey, f.d_1, f.d_2, f.d_3
        FROM ggee_udtfa_in v,
             LATERAL ggee_digits97(v.o_orderkey, 3) f
        """
    )


# ------------------------------------------------ Arrow grouped map


def _lang_mad_arrow(table):
    """Whole-group Arrow kernel: exact median + MAD of doc lengths for
    one language. numpy views the Arrow int column zero-copy; median
    of integers is exact (the even-count midpoint is a .0/.5 half,
    representable exactly), so the DuckDB median() oracle matches
    bit-for-bit."""
    import numpy as np
    import pyarrow as pa

    x = table.column("n_chars").to_numpy(zero_copy_only=False).astype("int64")
    med = float(np.median(x))
    mad = float(np.median(np.abs(x - med)))
    return pa.table(
        {
            "lang": [table.column("lang")[0].as_py()],
            "n_docs": [table.num_rows],
            "med_chars": [med],
            "mad_chars": [mad],
        }
    )


@query(
    "q_f_group_arrow",
    oracle="""
    WITH m AS (SELECT lang, median(n_chars) AS med
               FROM documents GROUP BY lang)
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ANY_VALUE(m.med) AS med_chars,
           median(abs(d.n_chars - m.med)) AS mad_chars
    FROM documents d JOIN m ON d.lang = m.lang
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def q_f_group_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native grouped map (`applyInArrow`, round 8 — completes
    the grouped-map pair the way q_f_maparrow completed the map pair:
    whole-group-at-once semantics with ZERO pandas conversion,
    RecordBatch in / Table out, the boundary for group kernels that
    already speak Arrow). Kernel: per-language exact median and MAD
    of document lengths — a robust-statistics pass that genuinely
    needs the whole group materialized (exact medians don't
    partial-aggregate), i.e. the contract this API exists for.

    Scale note: parallelism is bounded by group count and each group
    must fit one executor (the documented applyInArrow contract,
    same as q_f_pandas_group_map); a 100 TB run with huge groups
    switches to approx_percentile or the two-phase exact-percentile
    spelling of q_b_quantiles. Determinism: integer medians are
    exact .0/.5 doubles in numpy and DuckDB alike."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", "n_chars")
        .groupBy("lang")
        .applyInArrow(
            _lang_mad_arrow,
            "lang string, n_docs long, med_chars double, mad_chars double",
        )
        .orderBy("lang")
    )


# ------------------------------------------------ Arrow-optimized scalar UDF


# useArrow=True: Spark 4's Arrow-optimized Python UDF — same
# def-a-scalar-function authoring surface as q_f_udf_scalar's
# row-at-a-time form, but the executor⇄Python crossing is Arrow
# record batches instead of one pickled row per call. The kernel is
# the Luhn check digit (ISO/IEC 7812): from the right, every second
# digit doubles (and casts out nines), the rest pass through, and the
# check digit completes the sum to a multiple of 10 — pure integer
# arithmetic, bit-identical in any engine.
@F.udf(returnType=T.LongType(), useArrow=True)
def _luhn_check(n: int) -> int:
    tot = 0
    for i, ch in enumerate(str(n)[::-1]):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        tot += d
    return (10 - tot % 10) % 10


@query(
    "q_f_arrow_udf",
    oracle="""
    WITH s AS (
      SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS t
      FROM orders WHERE o_orderkey % 30 = 0
    )
    SELECT o_orderkey,
           CAST((10 - (list_sum(list_transform(
                  range(1, length(t) + 1),
                  p -> CASE
                         WHEN (length(t) - p) % 2 = 1 THEN
                           CASE WHEN CAST(t[p] AS BIGINT) * 2 > 9
                                THEN CAST(t[p] AS BIGINT) * 2 - 9
                                ELSE CAST(t[p] AS BIGINT) * 2 END
                         ELSE CAST(t[p] AS BIGINT)
                       END)) % 10)) % 10 AS BIGINT) AS luhn_check
    FROM s
    """,
)
def q_f_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-OPTIMIZED scalar Python UDF (round 8 — `useArrow=True`,
    the Spark 4 eval type Group F didn't yet declare): closes the
    scalar-UDF triangle.  q_f_udf_scalar is the row-at-a-time pickle
    boundary, q_f_pandas_scalar is the pandas_udf Series boundary;
    this is the third form — scalar authoring ergonomics (a plain
    int→int function, no pandas import) with Arrow-batched transfer,
    i.e. what a user should reach for when migrating legacy row UDFs
    without rewriting them as Series kernels.

    Kernel: Luhn check digit over a `% 30` order-key sample — integer
    doubling/casting-out-nines, so both engines produce identical
    BIGINTs with no float anywhere.  Scale posture: still per-row
    Python inside the batch loop (Arrow removes serialization cost,
    not interpreter cost) — the production spelling of THIS kernel is
    the pure SQL digit fold the oracle runs; the declared op exists to
    prove the boundary and price it honestly in BASELINE.md."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 30 == 0)
    return o.select("o_orderkey", _luhn_check("o_orderkey").alias("luhn_check"))


# ---------------------------------------------------------- SQL-language UDF


@query(
    "q_f_sql_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2)
             AS charged,
           CASE WHEN l_quantity < 10 THEN 'lo'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'hi' END AS qty_band
    FROM lineitem WHERE l_orderkey % 500 = 0
    """,
)
def q_f_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-LANGUAGE UDF (round 8; Spark 4's `CREATE FUNCTION …
    RETURNS … RETURN expr`) — the Group F member that is NOT a
    Python boundary: the function body is a SQL expression, so
    Catalyst INLINES it at plan time and the call sites run inside
    WholeStageCodegen like hand-written expressions — the form every
    reusable business rule (charged amount, quantity banding) should
    take before anyone reaches for Python. The oracle inlines the
    same expressions, which is exactly what the optimizer does.

    Scale: zero Python workers, zero serialization — the whole point;
    the declared op proves registration, typed signatures, and
    call-site inlining survive a real plan (pushdown still reaches
    the scan; pinned in PLANS.md probes via the shared harness)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ggee_charged"
        "(p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE"
        " RETURN round(p * (1.0 - d) * (1.0 + t), 2)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ggee_qty_band(q DOUBLE)"
        " RETURNS STRING RETURN CASE WHEN q < 10 THEN 'lo'"
        " WHEN q < 30 THEN 'mid' ELSE 'hi' END"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ggee_sqludf_li"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               ggee_charged(l_extendedprice, l_discount, l_tax) AS charged,
               ggee_qty_band(l_quantity) AS qty_band
        FROM ggee_sqludf_li WHERE l_orderkey % 500 = 0
        """
    )


# ------------------------------------------- UDTF over TABLE(...) PARTITION BY


@query(
    "q_f_udtf_partition",
    oracle="""
    WITH w AS (
      SELECT source, n_chars,
             MAX(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prevmax
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE prevmax IS NULL OR n_chars > prevmax)
             AS n_records,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM w GROUP BY source ORDER BY source
    """,
)
def q_f_udtf_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consuming a TABLE argument with PARTITION BY /
    ORDER BY (round 8) — the Spark 4 table-argument contract that
    turns a UDTF into a per-group STATEFUL FOLD: the engine
    repartitions the input on the PARTITION BY key, sorts each
    partition by the ORDER BY key, feeds every row of one partition
    to one UDTF instance's eval() in order, and calls terminate()
    exactly once per partition for the summary row. Completes the
    UDTF family: q_f_udtf is the per-row LATERAL expansion,
    q_f_udtf_analyze the polymorphic schema contract, and this one
    the grouped-iteration contract (the API a sessionizer or
    order-dependent auditor uses when applyInPandas' whole-group
    materialization is unwanted — rows stream through eval one at a
    time, state is O(1)).

    Kernel: per-source RECORD COUNT — how many times the running
    n_chars maximum is broken scanning docs in doc_id order (an
    order statistic that genuinely needs the sorted stream: ~H(n)
    expected breaks under exchangeability; a record count far above
    that flags docs arriving in length-sorted batches). Oracle: the
    windowed running-max spelling of the same scan.

    Scale: one hash repartition on source + per-partition sort —
    exactly what the equivalent window query pays; Python sees each
    row once (Arrow-batched rows, O(1) state per partition), and the
    output is |sources| rows. A skewed partition key concentrates one
    group per task, same as any PARTITION BY window."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="source string, n_docs bigint, n_records bigint,"
                     " max_chars bigint")
    class RecordAudit:
        def __init__(self) -> None:
            self._source = None
            self._n = 0
            self._records = 0
            self._mx = None

        def eval(self, row) -> None:
            self._source = row["source"]
            self._n += 1
            if self._mx is None or row["n_chars"] > self._mx:
                self._records += 1
                self._mx = row["n_chars"]

        def terminate(self):
            if self._n:
                yield self._source, self._n, self._records, self._mx

    spark.udtf.register("ggee_record_audit", RecordAudit)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    d.createOrReplaceTempView("ggee_udtf_part_in")
    return spark.sql(
        """
        SELECT source, n_docs, n_records, max_chars
        FROM ggee_record_audit(TABLE(ggee_udtf_part_in)
                               PARTITION BY source ORDER BY doc_id)
        ORDER BY source
        """
    )


# ---------------------------------------------------- Arrow-optimized UDTF


@query(
    "q_f_udtf_arrow",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 7 AS BIGINT) AS bucket,
           CAST(o_totalprice * 100 AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 25 = 0
    """,
)
def q_f_udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDTF (round 8): the same UDTF contract
    as q_f_udtf but with `useArrow=True` — rows cross the boundary in
    Arrow record batches instead of pickled tuples, the third leg of
    the Arrow-transfer family (q_f_arrow_udf covered the scalar UDF,
    q_f_group_arrow the grouped map). The declared op proves the
    opt-in actually takes effect (ArrowEvalPythonUDTF in the plan,
    pinned in tests) and that values are bit-identical to the
    pickled path — the guarantee that lets a pipeline flip the
    switch on an existing UDTF fleet for the ~2-5x boundary speedup
    without re-validating semantics.

    Kernel: integer bucket + exact price cents per filtered order —
    BIGINT in, BIGINT out, nothing float-fragile at the boundary.
    Scale: the filter is pushed below the UDTF (scan-side), and the
    UDTF itself is stateless per row, so the stage parallelizes
    like any narrow map."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="o_orderkey bigint, bucket bigint, cents bigint",
        useArrow=True,
    )
    class PriceCents:
        def eval(self, okey: int, price: float):
            yield okey, okey % 7, int(round(price * 100))

    spark.udtf.register("ggee_price_cents", PriceCents)
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 25 == 0
    )
    o.createOrReplaceTempView("ggee_udtf_arrow_in")
    return spark.sql(
        """
        SELECT f.o_orderkey, f.bucket, f.cents
        FROM ggee_udtf_arrow_in v,
             LATERAL ggee_price_cents(v.o_orderkey, v.o_totalprice) f
        """
    )


# ------------------------------------------------ Arrow cogrouped map


def _order_ship_arrow(left, right):
    """Whole-BUCKET Arrow kernel: every sampled order of one hash
    bucket (left) against the bucket's line items (right) — per order:
    items count, items shipped >30 days after order, and the max ship
    lag in whole days. Epoch-µs int64 views, pure integer arithmetic,
    vectorized end to end through pyarrow.compute + Table.join/
    group_by (round-11 optimization, guide §4.2: one boundary
    crossing per bucket, native-code kernel inside; no pandas, no
    float, no Python loop)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if left.num_rows == 0 or right.num_rows == 0:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
                "n_late": pa.array([], pa.int64()),
                "max_lag_days": pa.array([], pa.int64()),
            }
        )
    # date_diff('day', ...) counts calendar-day BOUNDARY crossings, so
    # floor each side to its epoch-day number BEFORE differencing —
    # floor((s-o)/day) would only coincide on midnight-aligned, non-
    # negative lags (the oracle-parity trap ADVICE r9 flagged).
    # Integer divide truncates; epoch-µs here are non-negative, so
    # truncation IS the floor.
    day = pa.scalar(86_400_000_000, pa.int64())
    orders = pa.table(
        {
            "l_orderkey": left.column("o_orderkey"),
            "oday": pc.divide(left.column("o_orderdate").cast(pa.int64()), day),
        }
    )
    items = pa.table(
        {
            "l_orderkey": right.column("l_orderkey"),
            "sday": pc.divide(right.column("l_shipdate").cast(pa.int64()), day),
        }
    )
    # inner join ⇒ orders with no items in the bucket emit nothing —
    # the per-key kernel's empty-right branch, preserved per order.
    j = items.join(orders, keys="l_orderkey", join_type="inner")
    lag = pc.subtract(j.column("sday"), j.column("oday"))
    g = (
        pa.table(
            {
                "o_orderkey": j.column("l_orderkey"),
                "lag": lag,
                "late": pc.cast(pc.greater(lag, 30), pa.int64()),
            }
        )
        .group_by("o_orderkey")
        .aggregate([("lag", "count"), ("late", "sum"), ("lag", "max")])
    )
    return pa.table(
        {
            "o_orderkey": g.column("o_orderkey").cast(pa.int64()),
            "n_items": g.column("lag_count").cast(pa.int64()),
            "n_late": g.column("late_sum").cast(pa.int64()),
            "max_lag_days": g.column("lag_max").cast(pa.int64()),
        }
    )


@query(
    "q_f_cogroup_arrow",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate,
                                        l.l_shipdate) > 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS max_lag_days
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey % 40 = 0
    GROUP BY o.o_orderkey ORDER BY o.o_orderkey
    """,
)
def q_f_cogroup_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native COGROUPED map (`cogroup().applyInArrow`, round 9)
    — closes the last cell of the Group F API matrix: map
    (pandas_iter/maparrow), grouped map (pandas_group_map/
    group_arrow), and now cogrouped map (cogroup_map/THIS) each exist
    in both pandas and Arrow forms. Two keyed relations arrive as two
    Arrow Tables per key with zero pandas conversion — the boundary
    for per-key merge kernels that already speak Arrow (feature
    stores, C-extension matchers). Kernel: order header vs its line
    items — item count, >30-day-lag shipments, max lag — all integer
    arithmetic on epoch-µs views, so the relational oracle matches
    exactly.

    Scale: ONE co-partitioned shuffle lands both sides of a key in
    the same call; cost is one Python roundtrip PER COGROUP KEY (the
    cogroup_map lesson), so the op samples o_orderkey % 40 AND — the
    round-11 optimization, guide §4.2 — cogroups by a HASH BUCKET of
    the order key (64 buckets) rather than the key itself: each call
    receives every sampled order of its bucket plus the bucket's line
    items, and the per-order aggregation runs vectorized through
    pyarrow Table.join + group_by inside the kernel. Same
    co-partitioned shuffle, same output, ~3.7k → 64 roundtrips. When
    the per-key logic IS relational (as this audit kernel is), the
    oracle's aggregate+join spelling is the 100 TB preference; the
    op declares the API surface for when it isn't."""
    obkt = F.pmod(F.col("o_orderkey"), F.lit(2560)).alias("bkt")
    lbkt = F.pmod(F.col("l_orderkey"), F.lit(2560)).alias("bkt")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 40 == 0)
        .select("o_orderkey", "o_orderdate", obkt)
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 40 == 0)
        .select("l_orderkey", "l_shipdate", lbkt)
    )
    return (
        o.groupBy("bkt")
        .cogroup(li.groupBy("bkt"))
        .applyInArrow(
            _order_ship_arrow,
            "o_orderkey long, n_items long, n_late long,"
            " max_lag_days long",
        )
        .orderBy("o_orderkey")
    )
