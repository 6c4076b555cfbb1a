"""Group E — deduplication (exact + MinHash/LSH near-dup).

Exact dedup is content-hash groupBy (SQL-checkable). Near-dup is the
classic shingle → MinHash → LSH-band → candidate-join → exact-Jaccard
pipeline: the MinHash stage uses xxhash64 (engine-specific → rows-only
check), while the exact-Jaccard verify stage is independently declared
with a full DuckDB oracle (q_e_jaccard_verify), per SURVEY.md §2.

Determinism: minhash "permutations" are seeded by fixed literal salts;
candidate pairs are canonicalized (id_a < id_b); no rand() anywhere
(SURVEY.md §7.3.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from glaciersgee_spark.registry import query
from glaciersgee_spark.tables import load_table

N_MINHASH = 8
BAND_SIZE = 2  # 4 bands of 2 signatures

# Bigram shingles over whitespace tokens, deduplicated. Requires ≥3
# tokens (both spellings below enforce it) so the lambda indexing never
# leaves bounds under ANSI mode.
# zip_with over two shifted slices: split() is evaluated O(1) times per
# row. The indexing spelling — element_at(split(text,' '), i) inside the
# lambda — re-splits the full text per element, O(tokens²) per row.
_SPARK_SHINGLES = (
    "array_distinct(zip_with("
    "slice(split(text, ' '), 1, size(split(text, ' ')) - 1), "
    "slice(split(text, ' '), 2, size(split(text, ' ')) - 1), "
    "(x, y) -> concat(x, ' ', y)))"
)
_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(1, len(string_split(text, ' '))), "
    "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))"
)


@query(
    "q_e_dedup_exact",
    oracle="""
    SELECT doc_id, content_key, is_canonical FROM (
      SELECT doc_id,
             md5(lang || '|' || source || '|' || CAST(n_chars AS VARCHAR))
               AS content_key,
             ROW_NUMBER() OVER (
               PARTITION BY md5(lang || '|' || source || '|' || CAST(n_chars AS VARCHAR))
               ORDER BY doc_id ASC) = 1 AS is_canonical
      FROM documents
    )
    """,
)
def q_e_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection by content hash: canonical = lowest
    doc_id per key. Keyed on (lang,source,n_chars) because the corpus
    has zero exact text duplicates (FIXTURES.md) — the md5-of-text form
    is identical with a different hash input. One shuffle on the hash;
    at 100 TB this replaces dropDuplicates (whose keep-choice is
    partition-order-dependent) with a deterministic min-id rule."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat_ws("|", "lang", "source", F.col("n_chars").cast("string"))
    )
    w = Window.partitionBy("content_key").orderBy(F.col("doc_id").asc())
    return (
        d.select("doc_id", key.alias("content_key"))
        .withColumn("is_canonical", F.row_number().over(w) == 1)
    )


def _with_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.where(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", "lang", "source", F.expr(_SPARK_SHINGLES).alias("sh")
    )


@query("q_e_dedup_near")  # rows-only: xxhash64 minhash is engine-specific
def q_e_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    shingle → 8 minhashes (min of xxhash64(salt ⊕ shingle)) → 4 bands
    of 2 → band-key equi self-join → DISTINCT candidate pairs → exact
    Jaccard ≥ 0.5. Output (id_a, id_b, jaccard).

    Scale shape: the only shuffles are the band-key join (tiny rows:
    band hash + id) and the final pair join back to shingle arrays.
    Candidates per band-bucket are bounded by banding; no O(n²) stage.
    The exact-Jaccard stage is independently oracle-checked in
    q_e_jaccard_verify.
    """
    sh = _with_shingles(spark, sf_dir)
    mh = [
        F.array_min(
            F.expr(f"transform(sh, s -> xxhash64(concat(s, '#salt{p}')))")
        ).alias(f"mh{p}")
        for p in range(N_MINHASH)
    ]
    sig = sh.select("doc_id", *mh)
    bands = []
    for b in range(N_MINHASH // BAND_SIZE):
        cols = [f"mh{b * BAND_SIZE + k}" for k in range(BAND_SIZE)]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.concat_ws(",", *[F.col(c).cast("string") for c in cols])).alias(
                    "bkey"
                ),
            )
        )
    # Slim band rows (doc_id, band, bkey) only — the shingle arrays
    # stay out of the candidate join/distinct shuffles and are
    # re-joined once per side after dedup, exactly like q_e_sim_join.
    banded = sig.select("doc_id", F.explode(F.array(*bands)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    lhs = banded.select(F.col("doc_id").alias("id_a"), "band", "bkey")
    rhs = banded.select(F.col("doc_id").alias("id_b"), "band", "bkey")
    cand = (
        lhs.join(rhs, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh_a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    ).cast("double")
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


@query(
    "q_e_jaccard_verify",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, source, {_DUCK_SHINGLES} AS sh
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
    """,
)
def q_e_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard verification stage (SQL-checkable half of
    the near-dup pipeline): blocked candidate pairs (same lang+source)
    scored with exact |∩|/|∪| over distinct bigram shingles."""
    sh = _with_shingles(spark, sf_dir)
    # Inverted-index formulation: explode shingles and self-join on the
    # shingle VALUE, so only pairs that actually share a shingle ever
    # materialize (pairs with empty intersection have J=0 < 0.2 and are
    # correctly absent). At 100 TB this is the only viable shape — the
    # blocked nested-loop with per-pair array_intersect evaluates
    # |block|² set intersections; this is one shuffle on the posting
    # key, a pair-count aggregation, then two slim joins for sizes.
    post = sh.select(
        "doc_id", "lang", "source", F.explode("sh").alias("shingle")
    )
    a = post.select("lang", "source", "shingle", F.col("doc_id").alias("id_a"))
    b = post.select("lang", "source", "shingle", F.col("doc_id").alias("id_b"))
    inter = (
        a.join(b, ["lang", "source", "shingle"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.2)
    )
