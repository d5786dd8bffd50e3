"""baronbatch_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ETL (Gpascual11/BaronBatch-ETL — a
MongoDB/Redis/FastAPI match-analytics microservice) as idiomatic
Spark: declared schemas, DataFrame/SQL operators, a medallion
pipeline (bronze/silver/gold), structured-streaming incremental
semantics, plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) designed for 100 TB scale.

Layout:
    session    — SparkSession factory (UTC, AQE, Arrow).
    schemas    — declared StructTypes for the reference data model.
    io         — fixture-table loaders (/root/testdata/sf*/).
    functions/ — scalar/column expression catalog (SURVEY §2.8).
    operators/ — dedup, similarity, joins, retention, multimodal.
    pipeline/  — bronze→silver→gold medallion (SURVEY §3.2).
    streaming/ — incremental/streaming semantics (SURVEY §2.9).
    queries/   — the named query registry backing __spark_entry__.
"""

from baronbatch_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
