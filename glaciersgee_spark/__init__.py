"""glaciersgee_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference (dliu9999/GlaciersGEE, a
Landsat-imagery metadata ETL package; checkout empty at build time — see
SURVEY.md §0) as an idiomatic Spark DataFrame/SQL engine, plus the
LLM-data-pipeline extensions mandated by BASELINE.json:6 (dedup,
similarity search, multimodal columns, text analysis).

Layout (SURVEY.md §7.5):
  session.py    SparkSession factory (UTC, AQE, Arrow, ns-parquet compat)
  tables.py     declared schemas + loaders for the driver corpus
  registry.py   the queries()/oracle_sql() registry the driver consumes
  operators/    Group A (metadata ETL), Group B (relational core),
                Group E (dedup/similarity/text/multimodal)
  functions/    Group C scalar function surface
  streaming/    Group D (batch-equivalent + true Structured Streaming)
  udfs.py       Group F UDF surface
"""

from glaciersgee_spark.caches import clear_caches
from glaciersgee_spark.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE", "clear_caches", "load_all_queries"]


def load_all_queries() -> None:
    """Import every operator module so its @query registrations run."""
    import glaciersgee_spark.operators.etl  # noqa: F401
    import glaciersgee_spark.operators.spatial  # noqa: F401
    import glaciersgee_spark.operators.relational  # noqa: F401
    import glaciersgee_spark.operators.dedup  # noqa: F401
    import glaciersgee_spark.operators.similarity  # noqa: F401
    import glaciersgee_spark.operators.text  # noqa: F401
    import glaciersgee_spark.operators.curation  # noqa: F401
    import glaciersgee_spark.operators.retrieval  # noqa: F401
    import glaciersgee_spark.operators.spans  # noqa: F401
    import glaciersgee_spark.operators.warehouse  # noqa: F401
    import glaciersgee_spark.operators.linalg  # noqa: F401
    import glaciersgee_spark.operators.drift  # noqa: F401
    import glaciersgee_spark.operators.multimodal  # noqa: F401
    import glaciersgee_spark.functions.scalar  # noqa: F401
    import glaciersgee_spark.streaming.batch_equiv  # noqa: F401
    import glaciersgee_spark.udfs  # noqa: F401
