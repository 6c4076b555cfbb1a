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
bucket sizes. At 100 TB add a bucket-size cap (`size(es) <= N`) to
drop degenerate buckets (e.g. an all-zeros band); the driver corpus
has none, so the cap is not applied here.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cobucket_pairs(
    banded: DataFrame,
    keys: Sequence[str],
    entity_cols: Sequence[str],
    distinct: bool = True,
) -> DataFrame:
    """Co-bucketed entity pairs.

    `banded`: one row per (entity, bucket); `keys`: bucket key columns;
    `entity_cols`: entity payload columns, the FIRST being the orderable
    id. Returns columns `a`, `b` — entity structs with a.id < b.id —
    deduplicated across buckets when `distinct` (LSH candidates), or
    with one row per shared bucket when not (so a downstream
    `groupBy(pair).count()` is exactly the bucket-intersection size —
    the inverted-index Jaccard shape).
    """
    id_c = entity_cols[0]
    ent = F.struct(*[F.col(c) for c in entity_cols])
    buckets = (
        banded.groupBy(*keys)
        .agg(F.collect_list(ent).alias("es"))
        .where(F.size("es") >= 2)
    )
    pair_expr = (
        "flatten(transform(es, (x, i) -> "
        "transform(slice(es, i + 2, size(es)), y -> "
        f"struct(IF(x.{id_c} < y.{id_c}, x, y) AS a, "
        f"IF(x.{id_c} < y.{id_c}, y, x) AS b))))"
    )
    pairs = buckets.select(F.explode(F.expr(pair_expr)).alias("p")).select("p.a", "p.b")
    return pairs.distinct() if distinct else pairs
