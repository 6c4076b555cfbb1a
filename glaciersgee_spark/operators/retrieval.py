"""Hybrid retrieval — rank fusion across the lexical (BM25) and dense
(embedding-cosine) scoring paths (SURVEY.md §2 Group E).

The LLM-pipeline shape this models: RAG-style retrieval where a sparse
index and an ANN index each produce a ranked list and the final
ordering is reciprocal-rank fusion, RRF(d) = Σ_lists 1/(k + rank_d),
k = 60 (Cormack et al., SIGIR 2009 — the standard parameter).

Corpus wiring: `documents.doc_id` and `embeddings.vec_id` share the
same id space, so doc 0 plays the query on both sides — its text terms
via the fixed BM25 query-term set, its vector via vec_id 0.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from glaciersgee_spark.operators.similarity import _cos6, _D_NRM, _d_cos6, _D_VEC
from glaciersgee_spark.operators.text import BM25_CTES, q_e_bm25
from glaciersgee_spark.registry import dsum, query
from glaciersgee_spark.tables import load_table

RRF_K = 60


@query(
    "q_e_rrf_fusion",
    oracle=f"""
    WITH {BM25_CTES},
    bm AS (SELECT doc_id, {dsum('c')} AS score
           FROM contrib WHERE doc_id <> 0 GROUP BY doc_id),
    bmr AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rb
            FROM bm),
    v AS (SELECT vec_id, {_D_VEC} AS ve, {_D_NRM} AS nrm FROM embeddings),
    q AS (SELECT ve AS qv, nrm AS qn FROM v WHERE vec_id = 0),
    cs AS (SELECT v.vec_id AS doc_id,
                  {_d_cos6('v.ve', 'q.qv', 'v.nrm', 'q.qn')} AS score
           FROM v, q WHERE v.vec_id <> 0),
    csr AS (SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rc
            FROM cs),
    fused AS (
      SELECT COALESCE(bmr.doc_id, csr.doc_id) AS doc_id,
             round(COALESCE(1.0 / ({RRF_K} + rb), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + rc), 0.0), 6) AS rrf6,
             CAST(rb AS BIGINT) AS bm25_rank,
             CAST(rc AS BIGINT) AS cos_rank
      FROM bmr FULL OUTER JOIN csr ON bmr.doc_id = csr.doc_id
    )
    SELECT doc_id, rrf6, bm25_rank, cos_rank FROM fused
    ORDER BY rrf6 DESC, doc_id ASC
    LIMIT 25
    """,
)
def q_e_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 list and the dense cosine
    list for query doc/vec 0: RRF = 1/(60+r_bm25) + 1/(60+r_cos),
    missing-list membership contributes 0. Top 25, ties broken on
    doc_id.

    Determinism: ranks are integers from (score DESC, doc_id ASC)
    orderings whose scores are already 6-dp-deterministic (dsum'd BM25,
    rounded cosine); 1/(60+r) and the 2-term sum are per-row IEEE with
    identical trees in both engines, re-rounded to 6 dp. Plan shape:
    both ranked lists are post-aggregation slivers (≤ corpus-row
    count), so the global row_number windows and the full-outer fuse
    run on tiny data; at 100 TB the heavy work stays in the upstream
    scoring passes (token pipeline one side, ANN probe the other)."""
    bm = q_e_bm25(spark, sf_dir).where(F.col("doc_id") != 0)
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bmr = bm.select("doc_id", F.row_number().over(wb).cast("long").alias("rb"))

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qemb"))
    cs = (
        e.where(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"), _cos6("embedding", "qemb").alias("score")
        )
    )
    csr = cs.select("doc_id", F.row_number().over(wb).cast("long").alias("rc"))

    fused = (
        bmr.join(csr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (RRF_K + F.col("rb")), F.lit(0.0))
                + F.coalesce(1.0 / (RRF_K + F.col("rc")), F.lit(0.0)),
                6,
            ).alias("rrf6"),
            F.col("rb").alias("bm25_rank"),
            F.col("rc").alias("cos_rank"),
        )
    )
    return fused.orderBy(F.col("rrf6").desc(), F.col("doc_id").asc()).limit(25)
