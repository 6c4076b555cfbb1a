"""Shared LSH-bucket candidate-pair generation.

The naive spelling of "pairs of entities sharing a bucket" is a
self-equi-join of the banded table with itself. On Spark that costs
the banded subtree TWICE (the two join branches are independent
lineages; with AQE broadcasting one side there is no exchange reuse),
and for signature pipelines the banded subtree is the expensive part.

`cobucket_pairs` instead groups by bucket key and expands ordered
pairs inside each bucket with a higher-order expression: ONE
evaluation of the signature pipeline, ONE shuffle (the groupBy), and
the same DISTINCT pair set — `(a, b)` ordered by id so each pair
appears once regardless of which side of a bucket it came from.

Scale note: per-bucket expansion is O(|bucket|²), identical to what
the self-join would emit for that bucket — LSH banding is what bounds
bucket sizes *probabilistically*. A degenerate hot bucket (e.g. an
all-zeros band over boilerplate documents) would go quadratic, so a
hard cap drops buckets above `max_bucket` entities: at 100 TB a
10⁶-entity bucket is 5·10¹¹ pairs — always a data-quality signal
(near-identical boilerplate), never useful candidates. Dropped-bucket
stats are observable via `bucket_overflow`.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Default hot-bucket cap: caps worst-case per-bucket expansion at
# ~500k pairs. The driver corpus's largest co-bucket is ~10² entities,
# so the cap never fires there (parity-neutral); it exists for the
# 100 TB degenerate-bucket case.
MAX_BUCKET_DEFAULT = 1000


def cobucket_pairs(
    banded: DataFrame,
    keys: Sequence[str],
    entity_cols: Sequence[str],
    distinct: bool = True,
    max_bucket: int | None = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """Co-bucketed entity pairs.

    `banded`: one row per (entity, bucket); `keys`: bucket key columns;
    `entity_cols`: entity payload columns, the FIRST being the orderable
    id. Returns columns `a`, `b` — entity structs with a.id < b.id —
    deduplicated across buckets when `distinct` (LSH candidates), or
    with one row per shared bucket when not (so a downstream
    `groupBy(pair).count()` is exactly the bucket-intersection size —
    the inverted-index Jaccard shape). Buckets with more than
    `max_bucket` entities are dropped (None disables the guard);
    audit the dropped set with `bucket_overflow`.
    """
    id_c = entity_cols[0]
    ent = F.struct(*[F.col(c) for c in entity_cols])
    # Bucket-size filter BEFORE collect_list (round-3 fix): a window
    # count partitioned on the bucket key streams through WindowExec's
    # spillable row buffer, so a degenerate 10⁶-entity bucket is
    # dropped without ever materializing it — the old post-agg
    # `size(es) <= max_bucket` filter only ran after collect_list had
    # built the whole bucket in one non-spillable aggregation array.
    # The groupBy below clusters on the same keys, so the window's
    # hash partitioning is reused: still ONE shuffle, ONE evaluation
    # of the banded lineage. Singleton buckets (no pairs) are pruned
    # here too, before their rows reach the aggregation.
    w = Window.partitionBy(*keys)
    bucket_ok = F.col("_bucket_n") >= 2
    if max_bucket is not None:
        bucket_ok = bucket_ok & (F.col("_bucket_n") <= max_bucket)
    buckets = (
        banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        .where(bucket_ok)
        .drop("_bucket_n")
        .groupBy(*keys)
        .agg(F.collect_list(ent).alias("es"))
    )
    pair_expr = (
        "flatten(transform(es, (x, i) -> "
        "transform(slice(es, i + 2, size(es)), y -> "
        f"struct(IF(x.{id_c} < y.{id_c}, x, y) AS a, "
        f"IF(x.{id_c} < y.{id_c}, y, x) AS b))))"
    )
    pairs = buckets.select(F.explode(F.expr(pair_expr)).alias("p")).select("p.a", "p.b")
    return pairs.distinct() if distinct else pairs


def posting_copairs(
    post: DataFrame,
    keys: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Spill-safe EXACT co-occurrence pairs: one output row per
    (ordered pair, shared posting key), so a downstream
    ``groupBy(id_a, id_b).count()`` is exactly the posting-intersection
    size — the inverted-index shape behind exact Jaccard / containment
    / band-count verification.

    Unlike `cobucket_pairs(distinct=False, max_bucket=None)` (the
    round-2 spelling), this is a self-equi-join on the posting key:
    sort-merge join streams both sides and spills its per-key match
    buffer to disk, so a degenerate corpus-frequent posting key (a
    stop-shingle, an all-zeros band) costs quadratic OUTPUT rows but
    never holds the whole posting list in one in-memory aggregation
    array. Exact ops must not cap contributions — this is the shape
    that stays exact AND survives the hot key. Callers are expected to
    hand in a persisted/cheap lineage (both join branches re-read it)
    and can audit hot keys with `bucket_overflow`.
    """
    kl = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    cond = kl[0]
    for c in kl[1:]:
        cond = cond & c
    cond = cond & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
    return (
        post.alias("l")
        .join(post.alias("r"), cond)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
    )


def bucket_overflow(
    banded: DataFrame,
    keys: Sequence[str],
    max_bucket: int = MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """Audit of buckets the cap would drop: one row per overflowing
    bucket with its entity count and the pair count it would have
    expanded to. Empty on a healthy corpus; non-empty means boilerplate
    / degenerate content upstream (fix the data, don't raise the cap).
    """
    counts = banded.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_entities"))
    return counts.where(F.col("n_entities") > max_bucket).select(
        *keys,
        "n_entities",
        (F.col("n_entities") * (F.col("n_entities") - 1) / 2)
        .cast("long")
        .alias("n_pairs_dropped"),
    )
