"""Skew handling — explicit salting for hot keys (SURVEY.md §4.2).

AQE's skew-join splitting handles most runtime skew, but two shapes
still need explicit salting at 100 TB:

  * a groupBy whose key domain is tiny relative to the cluster (the
    events corpus: 15 user_ids vs 1000s of cores — at most 15 tasks do
    ALL the aggregation work after the shuffle, regardless of AQE),
  * a shuffle join where one key holds a disproportionate share of the
    rows (AQE splits the partition, but only after materializing the
    skewed shuffle block).

Both helpers are deterministic (salt = pmod(xxhash64(distinct col), n)
— never rand(), SURVEY.md §7.3.4) and algebraically exact: salting
splits a hot key into n sub-keys, runs the cheap partial step per
sub-key, then merges — the classic two-phase (partial/final) spelling
made explicit where Catalyst's automatic partial aggregation isn't
enough because the FINAL stage itself is key-bound.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, distinct_col: str, n_salt: int) -> DataFrame:
    """Append a deterministic `_salt` in [0, n_salt) derived from a
    high-cardinality column (NOT the group/join key — the point is to
    split rows of one hot key across salts)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(distinct_col), F.lit(n_salt)))


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    distinct_col: str,
    n_salt: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    Phase 1 groups by (keys + _salt): with k hot keys and n salts the
    heavy reduction runs on k·n tasks instead of k. Phase 2 merges the
    k·n partial rows — trivially small. `sums` maps output name →
    summable column expression (sums/counts merge by re-summing;
    min/max would merge the same way)."""
    partial = (
        with_salt(df, distinct_col, n_salt)
        .groupBy(*keys, "_salt")
        .agg(
            *[expr.alias(f"_p_{name}") for name, expr in sums.items()],
        )
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{name}").alias(name) for name, expr in sums.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    distinct_col: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join: the big side is salted, the small side
    replicated n_salt× (explode), and the join key becomes
    (on, _salt) — a hot key's rows now land in n_salt partitions.
    Worth it only when `small` is too big to broadcast outright but
    n_salt× its size is still cheap relative to the skewed block."""
    b = with_salt(big, distinct_col, n_salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return b.join(s, [on, "_salt"], how).drop("_salt")
