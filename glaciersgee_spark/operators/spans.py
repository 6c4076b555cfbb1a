"""Group E — substring-level duplication analysis (round 2 batch).

Two ops below the document granularity of dedup.py: exact repeated-
span detection (the "dedup training data at the substring level"
result of Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" — PAPERS.md) and winnowing fingerprint
selection (Schleimer/Wilkerson/Aiken 2003, the MOSS algorithm).

Both are pure built-in-expression pipelines: shingles come from
`transform(sequence(...))` over the token array (one narrow projection
in whole-stage codegen), keys are md5 prefixes so the shuffle carries
16-byte strings instead of full shingle text — at 100 TB the shuffle
width is what dominates, and both engines (Spark / DuckDB) compute
identical md5 hex, so keys are cross-engine stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from glaciersgee_spark.registry import davg, query
from glaciersgee_spark.tables import fan_out, load_table

# Span shingle width (tokens) for repeated-span detection.
SPAN_K = 8
# Winnowing: gram width (tokens) and window width (positions).
WIN_K = 5
WIN_W = 4


def _shingled(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(doc_id, source, pos, key): md5-16 key of every k-token shingle,
    1-based pos. Narrow explode on the scan — no shuffle."""
    d = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split("text", " ")
    # Docs shorter than k tokens MUST be filtered out, not clamped:
    # sequence(1, 0) in Spark is the DESCENDING [1, 0] and slice with
    # start 0 throws — while the oracle's generate_series(1, 0) is
    # simply empty. The filter reproduces the oracle's empty semantics.
    d = d.where(F.size(toks) >= k)
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.substring(F.md5(F.array_join(F.slice(toks, i, k), " ")), 1, 16),
    )
    return d.select(
        "doc_id", "source", F.posexplode(sh).alias("p0", "key")
    ).select("doc_id", "source", (F.col("p0") + 1).alias("pos"), "key")


# DuckDB mirror of the shingle CTEs (1-based list slicing is inclusive:
# toks[i:i+k-1] is exactly k tokens).
def _sh_cte(k: int) -> str:
    return f"""toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id, source, i AS pos,
             substring(md5(array_to_string(toks[i:i+{k - 1}], ' ')), 1, 16) AS key
      FROM (
        SELECT doc_id, source, toks,
               unnest(generate_series(1, greatest(len(toks) - {k - 1}, 0))) AS i
        FROM toks
      )
    )"""


@query(
    "q_e_span_dedup",
    oracle=f"""
    WITH {_sh_cte(SPAN_K)},
    dup AS (
      SELECT key FROM sh GROUP BY key HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per AS (
      SELECT s.doc_id, s.source,
             COUNT(*) AS n_sh,
             COUNT(*) FILTER (WHERE d.key IS NOT NULL) AS n_dup
      FROM sh s LEFT JOIN dup d ON s.key = d.key
      GROUP BY s.doc_id, s.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_dup) AS BIGINT) AS dup_shingles,
           round({davg("CAST(n_dup AS DOUBLE) / n_sh")}, 6) AS avg_coverage,
           COUNT(*) FILTER (WHERE CAST(n_dup AS DOUBLE) / n_sh >= 0.2)
             AS n_flagged
    FROM per
    GROUP BY source
    ORDER BY source
    """,
)
def q_e_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span coverage: the fraction of each doc's 8-token
    shingles that occur verbatim in at least one OTHER document, rolled
    up per source with a ≥20 %-coverage flag count — the audit that
    motivates substring-level dedup (Lee et al. 2022).

    Plan shape: shingle explode is narrow; ONE shuffle builds the
    cross-doc shingle index (groupBy key, map-side combinable); the
    dup-key set joins back as a shuffle semi-join on the same 16-byte
    key (at 100 TB the dup set is too big to broadcast — the hash
    join co-partitions with the index build). Per-doc rollup and the
    per-source aggregate are map-side-combinable counts."""
    sh = _shingled(spark, sf_dir, SPAN_K)
    dup = (
        sh.groupBy("key")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("key")
    )
    per = (
        sh.join(dup.withColumn("is_dup", F.lit(1)), "key", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count("is_dup").alias("n_dup"),
        )
    )
    cov = F.col("n_dup").cast("double") / F.col("n_sh")
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_dup").alias("dup_shingles"),
            F.round(
                F.sum(cov.cast("decimal(30,6)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_coverage"),
            F.count(F.when(cov >= 0.2, 1)).alias("n_flagged"),
        )
        .orderBy("source")
    )


@query(
    "q_e_winnow",
    oracle=f"""
    WITH {_sh_cte(WIN_K)},
    m AS (SELECT doc_id, MAX(pos) AS n_gram FROM sh GROUP BY doc_id),
    win AS (
      SELECT s.doc_id, s.pos, s.key,
             unnest(generate_series(greatest(1, s.pos - {WIN_W - 1}),
                                    least(s.pos, m.n_gram - {WIN_W - 1}))) AS w
      FROM sh s JOIN m ON s.doc_id = m.doc_id
      WHERE m.n_gram >= {WIN_W}
    ),
    wmin AS (SELECT doc_id, w, MIN(key) AS mkey FROM win GROUP BY doc_id, w),
    fp AS (
      SELECT DISTINCT win.doc_id, MAX(win.pos) AS fp_pos
      FROM win JOIN wmin ON win.doc_id = wmin.doc_id AND win.w = wmin.w
      WHERE win.key = wmin.mkey
      GROUP BY win.doc_id, win.w
    ),
    per AS (
      SELECT m.doc_id, m.n_gram - {WIN_W - 1} AS n_win, f.n_fp
      FROM m JOIN (
        SELECT doc_id, COUNT(DISTINCT fp_pos) AS n_fp FROM fp GROUP BY doc_id
      ) f ON m.doc_id = f.doc_id
      WHERE m.n_gram >= {WIN_W}
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(per.n_fp) AS BIGINT) AS total_fp,
           round({davg("CAST(per.n_fp AS DOUBLE) / per.n_win")}, 6) AS avg_density
    FROM per JOIN documents d ON per.doc_id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def q_e_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (MOSS): hash 5-token grams, slide
    a 4-position window, keep the rightmost minimum hash per window,
    count the distinct selected positions per doc — guarantees any
    shared run of ≥ WIN_K+WIN_W−1 tokens shares a fingerprint, at
    ~2/(w+1) the storage of full shingling. Rolled up per source.

    Plan shape: window membership is a bounded ≤4× narrow explode (no
    range join); per-(doc, window) min and the rightmost-of-min pick
    are two map-side-combinable aggregations over the SAME (doc_id)
    co-partitioning, so the wmin join back to `win` is AQE-local. The
    membership subtree feeds two consumers (wmin + the join probe),
    deduplicated by Spark's ReusedExchange within the single action —
    no persist, so a long-lived session running the whole battery
    holds no leaked cache partitions (round-3 fix; the round-2 persist
    was never unpersisted)."""
    sh = _shingled(spark, sf_dir, WIN_K)
    m = sh.groupBy("doc_id").agg(F.max("pos").alias("n_gram"))
    win = (
        sh.join(m.where(F.col("n_gram") >= WIN_W), "doc_id")
        .select(
            "doc_id",
            "pos",
            "key",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(1), F.col("pos") - (WIN_W - 1)),
                    F.least(F.col("pos"), F.col("n_gram") - (WIN_W - 1)),
                )
            ).alias("w"),
        )
    )
    wmin = win.groupBy("doc_id", "w").agg(F.min("key").alias("mkey"))
    fp = (
        win.join(wmin, ["doc_id", "w"])
        .where(F.col("key") == F.col("mkey"))
        .groupBy("doc_id", "w")
        .agg(F.max("pos").alias("fp_pos"))
        .select("doc_id", "fp_pos")
        .distinct()
    )
    per = (
        m.where(F.col("n_gram") >= WIN_W)
        .select("doc_id", (F.col("n_gram") - (WIN_W - 1)).alias("n_win"))
        .join(fp.groupBy("doc_id").agg(F.countDistinct("fp_pos").alias("n_fp")), "doc_id")
    )
    d = load_table(spark, sf_dir, "documents")
    dens = F.col("n_fp").cast("double") / F.col("n_win")
    return (
        per.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_fp").alias("total_fp"),
            F.round(
                F.sum(dens.cast("decimal(30,6)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_density"),
        )
        .orderBy("source")
    )
