"""Group E — similarity search over embedding columns.

Brute-force cosine top-k as the baseline; a deterministic
sign-random-projection (SRP/SimHash) LSH bucketing as the scale path
(SURVEY.md §2 Group E). All vector math stays JVM-side as higher-order
array expressions — verified bit-identical to DuckDB's list_sum fold
(both are sequential left-to-right double accumulation), so scores
hash-match without any decimal detour.

Scale notes: the brute-force form is O(n) per query with a broadcast
query vector (fine for query-time top-k at any n; it's one pass, no
shuffle). The all-pairs join is where O(n²) dies at 100 TB — the LSH
band join turns it into |bands| equi-joins that Catalyst executes as
ordinary shuffled hash joins on (band, bucket).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from glaciersgee_spark.registry import query
from glaciersgee_spark.tables import load_table

# Deterministic ±1 hyperplanes from a fixed seed, baked as literals —
# no rand() — so Spark and the SQL oracle build identical buckets
# (SURVEY.md §7.3.4). 8 bands × 8 planes (OR-construction over 8-bit
# sign buckets): a random unrelated pair collides in a band with
# p ≈ 2⁻⁸, so candidates stay near-linear while close pairs (cos ≥
# ~0.8, the dedup/similarity regime) collide with high probability.
N_BANDS = 8
PLANES_PER_BAND = 8
N_PLANES = N_BANDS * PLANES_PER_BAND
DIM = 64

_PLANES = np.random.RandomState(42).choice([-1.0, 1.0], size=N_PLANES * DIM)
# One flat literal array, hoisted to a column once per plan so HOF
# lambdas index into it instead of re-materializing the literal.
_PF_SPARK = "array(" + ",".join(f"{w:.0f}.0D" for w in _PLANES) + ")"
_PF_DUCK = "[" + ",".join(f"{w:.0f}.0" for w in _PLANES) + "]"

_DOT_SELF = (
    "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
)


def _with_vec(df: DataFrame) -> DataFrame:
    """Attach double-typed vector + L2 norm (sqrt is IEEE-exact)."""
    return df.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        F.sqrt(F.expr(_DOT_SELF)).alias("nrm"),
    )


def _cos(a: str, b: str, na: str, nb: str) -> str:
    """Cosine between two double arrays (sequential fold, bit-stable)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        f" CAST(0.0 AS DOUBLE), (acc, p) -> acc + p) / ({na} * {nb})"
    )


# DuckDB mirrors of the same expressions.
_D_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_D_NRM = "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


def _d_cos(a: str, b: str, na: str, nb: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i])) / ({na} * {nb})"
    )


@query(
    "q_e_sim_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, {_D_VEC} AS ve, {_D_NRM} AS nrm FROM embeddings),
    q AS (SELECT ve AS qv, nrm AS qn FROM v WHERE vec_id = 0)
    SELECT v.vec_id, v.label, {_d_cos('v.ve', 'q.qv', 'v.nrm', 'q.qn')} AS score
    FROM v, q
    WHERE v.vec_id <> 0
    ORDER BY score DESC, v.vec_id ASC
    LIMIT 20
    """,
)
def q_e_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for one query vector (vec_id 0).

    Query vector is a 1-row broadcast; the scan computes one fused
    JVM-side expression per row and TakeOrderedAndProject keeps k —
    no shuffle of vectors, no Python. The pattern at 100 TB: broadcast
    a small query batch and score in one pass.
    """
    v = _with_vec(load_table(spark, sf_dir, "embeddings"))
    q = v.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    return (
        v.where(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.expr(_cos("v", "qv", "nrm", "qn")).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(20)
    )


# LSH bucket pipeline fragments (Spark and DuckDB spellings of the
# same computation; dots are sequential folds → bit-identical). Both
# reference a hoisted `pf` flat plane array (column in Spark, 1-row
# CTE in DuckDB) so the literal is materialized once, not per lambda.
_DUCK_DOTS = (
    f"list_transform(range(0, {N_PLANES}), j -> "
    f"  list_sum(list_transform(range(1, {DIM + 1}), i -> ve[i] * pf[j * {DIM} + i])))"
)


def _spark_dot(plane: str) -> str:
    """Dot of row vector v with hyperplane `plane` (0-based expr)."""
    return (
        f"aggregate(zip_with(v, slice(pf, ({plane}) * {DIM} + 1, {DIM}),"
        " (x, w) -> x * w), CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )


# Fused band→bucket expression: each plane's dot appears EXACTLY once.
# An intermediate `dots` column would be inlined by CollapseProject
# into all 64 element_at references, re-evaluating the 4096-op dot
# array per reference — a 64× interpreted-expression blowup.
_SPARK_BUCKETS = (
    f"transform(sequence(0, {N_BANDS - 1}), b -> "
    + " + ".join(
        f"(CASE WHEN {_spark_dot(f'b * {PLANES_PER_BAND} + {k}')} > 0.0D"
        f" THEN {2 ** k} ELSE 0 END)"
        for k in range(PLANES_PER_BAND)
    )
    + ")"
)
_DUCK_BUCKETS = (
    f"list_transform(range(0, {N_BANDS}), b -> "
    + " + ".join(
        f"(CASE WHEN dots[b * {PLANES_PER_BAND} + {k + 1}] > 0.0"
        f" THEN {2 ** k} ELSE 0 END)"
        for k in range(PLANES_PER_BAND)
    )
    + ")"
)


def _banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, band, bucket) — each vector lands in N_BANDS buckets."""
    v = _with_vec(load_table(spark, sf_dir, "embeddings"))
    d = v.withColumn("pf", F.expr(_PF_SPARK)).withColumn(
        "buckets", F.expr(_SPARK_BUCKETS)
    )
    return d.select(
        "vec_id", F.posexplode("buckets").alias("band0", "bucket")
    ).select("vec_id", (F.col("band0")).alias("band"), "bucket")


@query(
    "q_e_sim_join",
    oracle=f"""
    WITH p AS (SELECT {_PF_DUCK} AS pf),
    v AS (SELECT vec_id, {_D_VEC} AS ve, {_D_NRM} AS nrm FROM embeddings),
    d AS (SELECT vec_id, ve, nrm, {_DUCK_DOTS} AS dots FROM v, p),
    bk AS (SELECT vec_id, ve, nrm, {_DUCK_BUCKETS} AS buckets FROM d),
    bands AS (SELECT vec_id,
                     CAST(generate_subscripts(buckets, 1) - 1 AS BIGINT) AS band,
                     CAST(unnest(buckets) AS BIGINT) AS bucket
              FROM bk),
    cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bucket = b.bucket
              AND a.vec_id < b.vec_id)
    SELECT c.id_a, c.id_b,
           {_d_cos('x.ve', 'y.ve', 'x.nrm', 'y.nrm')} AS score
    FROM cand c JOIN v x ON c.id_a = x.vec_id JOIN v y ON c.id_b = y.vec_id
    WHERE {_d_cos('x.ve', 'y.ve', 'x.nrm', 'y.nrm')} >= 0.25
    """,
)
def q_e_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs similarity join above a threshold via SRP-LSH banding.

    Pipeline: deterministic ±1 hyperplane dots → 8-bit sign bucket per
    band (8 bands, OR-construction) → equi self-join on (band, bucket)
    → DISTINCT candidate pairs → exact cosine filter ≥ 0.25.

    Recall for a pair at angle θ is 1-(1-(1-θ/π)⁸)⁸ (~0.94 at cos 0.9);
    banding is tuned per-corpus at scale — the declared semantics ARE
    "pairs surviving this banding", which the oracle reproduces exactly,
    so the hash-match is by construction, not by luck. At 100 TB the
    candidate join shuffles only (band, bucket, id) — vectors are
    re-joined afterward, keeping the wide rows out of the hot shuffle.
    """
    v = _with_vec(load_table(spark, sf_dir, "embeddings"))
    bands = _banded(spark, sf_dir)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    x = v.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    y = v.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    scored = (
        cand.join(x, "id_a")
        .join(y, "id_b")
        .select("id_a", "id_b", F.expr(_cos("va", "vb", "na", "nb")).alias("score"))
    )
    return scored.where(F.col("score") >= 0.25)


@query(
    "q_e_knn_pergroup",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, {_D_VEC} AS ve, {_D_NRM} AS nrm FROM embeddings),
    q AS (SELECT ve AS qv, nrm AS qn FROM v WHERE vec_id = 0),
    scored AS (
      SELECT v.vec_id, v.label, {_d_cos('v.ve', 'q.qv', 'v.nrm', 'q.qn')} AS score
      FROM v, q WHERE v.vec_id <> 0
    )
    SELECT label, vec_id, score, rk FROM (
      SELECT label, vec_id, score,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY score DESC, vec_id ASC) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
)
def q_e_knn_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN per label group: 3 nearest to the query vector within each
    cluster label (scored scan → one shuffle on label → ranked top-k)."""
    v = _with_vec(load_table(spark, sf_dir, "embeddings"))
    q = v.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        v.where(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("label", "vec_id", F.expr(_cos("v", "qv", "nrm", "qn")).alias("score"))
    )
    w = Window.partitionBy("label").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("label", "vec_id", "score", "rk")
    )


@query(
    "q_e_sim_topk_lsh",
    oracle=f"""
    WITH p AS (SELECT {_PF_DUCK} AS pf),
    v AS (SELECT vec_id, label, {_D_VEC} AS ve, {_D_NRM} AS nrm FROM embeddings),
    d AS (SELECT vec_id, ve, nrm, {_DUCK_DOTS} AS dots FROM v, p),
    bk AS (SELECT vec_id, {_DUCK_BUCKETS} AS buckets FROM d),
    bands AS (SELECT vec_id,
                     CAST(generate_subscripts(buckets, 1) - 1 AS BIGINT) AS band,
                     CAST(unnest(buckets) AS BIGINT) AS bucket
              FROM bk),
    qb AS (SELECT band, bucket FROM bands WHERE vec_id = 0),
    cand AS (SELECT DISTINCT b.vec_id
             FROM qb JOIN bands b ON qb.band = b.band AND qb.bucket = b.bucket
             WHERE b.vec_id <> 0),
    q AS (SELECT ve AS qv, nrm AS qn FROM v WHERE vec_id = 0)
    SELECT v.vec_id, v.label, {_d_cos('v.ve', 'q.qv', 'v.nrm', 'q.qn')} AS score
    FROM cand c JOIN v ON c.vec_id = v.vec_id, q
    ORDER BY score DESC, v.vec_id ASC
    LIMIT 20
    """,
)
def q_e_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-k — the scale path for q_e_sim_topk.

    Probe only the vectors sharing ≥1 SRP (band, bucket) with the query
    vector instead of scanning all n: at 100 TB the bands table is a
    bucket-partitioned index, the probe reads |candidates| ≈ n/2^bits ×
    bands rows, and exact cosine re-ranks just those. Declared
    semantics = "top-k among banding candidates" (recall < 1 by
    construction), which the oracle reproduces exactly."""
    v = _with_vec(load_table(spark, sf_dir, "embeddings"))
    bands = _banded(spark, sf_dir)
    qb = bands.where(F.col("vec_id") == 0).select("band", "bucket")
    cand = (
        bands.where(F.col("vec_id") != 0)
        .join(F.broadcast(qb), ["band", "bucket"])
        .select("vec_id")
        .distinct()
    )
    q = v.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    return (
        cand.join(v, "vec_id")
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.expr(_cos("v", "qv", "nrm", "qn")).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(20)
    )
