"""Operator edge-case unit tests on literal micro-fixtures
(FIXTURES.md §micro-fixtures): null keys/values, empty inputs, and the
flagship smoke path — cases the corpus itself can't express."""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from glaciersgee_spark.operators.relational import pricing_summary
from glaciersgee_spark.registry import dsum
from tests.conftest import SF_SMOKE

NULLS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _nulls_t(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, "a", None),
            (3, None, 2.5),
            (4, None, None),
            (5, "b", 0.0),
        ],
        NULLS_SCHEMA,
    )


def _empty_t(spark):
    return spark.createDataFrame([], NULLS_SCHEMA)


def test_flagship_smoke(spark):
    rows = pricing_summary(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert rows == sorted(rows, key=lambda r: (r.l_returnflag, r.l_linestatus))
    total = sum(r.count_order for r in rows)
    assert total > 5000  # sf0.001 ≈ 6k lineitem rows, most pass the date filter


def test_null_keys_group_together(spark):
    out = {
        r.k: r.n
        for r in _nulls_t(spark).groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert out == {"a": 2, None: 2, "b": 1}


def test_agg_ignores_null_values(spark):
    row = _nulls_t(spark).agg(
        F.expr(dsum("v")).alias("s"), F.count("v").alias("n"), F.avg("v").alias("m")
    ).collect()[0]
    assert row.s == 4.0 and row.n == 3
    assert abs(row.m - 4.0 / 3.0) < 1e-12


def test_null_join_keys_never_match(spark):
    t = _nulls_t(spark)
    j = t.alias("l").join(
        t.alias("r"), F.col("l.k") == F.col("r.k"), "inner"
    )
    # only the non-null keys join: a×a (2×2) + b×b (1×1)
    assert j.count() == 5


def test_empty_input_aggregate(spark):
    row = _empty_t(spark).agg(
        F.count(F.lit(1)).alias("n"), F.expr(dsum("v")).alias("s")
    ).collect()[0]
    assert row.n == 0 and row.s is None
    assert _empty_t(spark).groupBy("k").count().count() == 0


def test_empty_join_sides(spark):
    t, e = _nulls_t(spark), _empty_t(spark)
    assert t.join(e, "id", "inner").count() == 0
    assert t.join(e.withColumnRenamed("k", "k2"), "id", "left").count() == t.count()


def test_window_on_empty_and_single_row(spark):
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("id")
    assert _empty_t(spark).withColumn("rn", F.row_number().over(w)).count() == 0
    one = _nulls_t(spark).limit(1).withColumn("rn", F.row_number().over(w))
    assert one.collect()[0].rn == 1


def test_dsum_is_partitioning_invariant(spark):
    """The decimal-sum pattern must give identical bits on any layout."""
    t = _nulls_t(spark)
    a = t.agg(F.expr(dsum("v"))).collect()[0][0]
    b = t.repartition(7, "id").agg(F.expr(dsum("v"))).collect()[0][0]
    c = t.coalesce(1).agg(F.expr(dsum("v"))).collect()[0][0]
    import struct

    assert struct.pack(">d", a) == struct.pack(">d", b) == struct.pack(">d", c)
