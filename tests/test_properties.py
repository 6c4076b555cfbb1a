"""Algebraic property checks over declared queries (SURVEY.md §5.2):
cheap cross-operator invariants that catch semantic drift without an
oracle."""

import pyspark.sql.functions as F

from glaciersgee_spark.operators.dedup import q_e_dedup_near, q_e_jaccard_verify
from glaciersgee_spark.operators.relational import (
    q_b_join_anti,
    q_b_join_semi,
    q_b_union,
)
from glaciersgee_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_semi_plus_anti_partition_the_left(spark):
    """For any predicate P: semi(P) ∪ anti(P) == all left keys, disjoint.

    q_b_join_semi filters on urgent orders, q_b_join_anti on high-value
    orders — so recompute both over the SAME predicate here.
    """
    c = load_table(spark, SF_SMOKE, "customer")
    o = load_table(spark, SF_SMOKE, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.join(anti, "c_custkey", "inner").count() == 0
    # and the declared queries are themselves consistent with customer
    assert q_b_join_semi(spark, SF_SMOKE).count() <= c.count()
    assert q_b_join_anti(spark, SF_SMOKE).count() <= c.count()


def test_union_all_counts_add(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    a = o.where(F.col("o_totalprice") > 200000.0).count()
    b = o.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert q_b_union(spark, SF_SMOKE).count() == a + b


def test_near_dup_pairs_canonical_and_bounded(spark):
    pairs = q_e_dedup_near(spark, SF_SMOKE).collect()
    for r in pairs:
        assert r.id_a < r.id_b
        assert 0.0 <= r.jaccard <= 1.0


def test_lsh_candidates_superset_of_high_jaccard(spark):
    """Every very-high-Jaccard pair (≥0.9) must be caught by MinHash
    banding (4 bands × 2 of 8 minhashes: miss probability ≤
    (1-j²)⁴ ≈ 1e-3 at j=0.9 — treat a miss as failure)."""
    lsh = {(r.id_a, r.id_b) for r in q_e_dedup_near(spark, SF_SMOKE).collect()}
    exact = {
        (r.id_a, r.id_b)
        for r in q_e_jaccard_verify(spark, SF_SMOKE).collect()
        if r.jaccard >= 0.9
    }
    assert exact, "corpus should contain at least one ≥0.9 near-dup pair"
    assert exact <= lsh


def test_distinct_idempotent(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type")
    once = ev.distinct()
    assert once.count() == once.distinct().count()


def test_salted_agg_matches_unsalted(spark):
    """Two-phase salted aggregation is algebraically identical to the
    plain groupBy — for every key and any salt count."""
    from glaciersgee_spark.operators.skew import salted_sum_count

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value", "event_id")
    plain = {
        r.user_id: (r.s, r.n)
        for r in ev.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(30,6)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for n_salt in (1, 7, 32):
        salted = {
            r.user_id: (r.s, r.n)
            for r in salted_sum_count(
                ev,
                ["user_id"],
                {
                    "s": F.sum(F.col("value").cast("decimal(30,6)")),
                    "n": F.count(F.lit(1)),
                },
                distinct_col="event_id",
                n_salt=n_salt,
            ).collect()
        }
        assert salted == plain


def test_salted_join_matches_plain_join(spark):
    """Salting the big side + replicating the small side is row-for-row
    the plain equi join."""
    from glaciersgee_spark.operators.skew import salted_join

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_id", "value")
    dim = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .withColumn("tag", F.col("user_id") * 10)
    )
    plain = sorted(
        (r.event_id, r.tag) for r in ev.join(dim, "user_id").collect()
    )
    salted = sorted(
        (r.event_id, r.tag)
        for r in salted_join(ev, dim, "user_id", "event_id", n_salt=4).collect()
    )
    assert salted == plain
