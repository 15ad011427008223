"""oss_data_lake_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing surface of the
reference data-lake stack (Marek-Czarnecki/oss-data-lake: MinIO + Iceberg +
Lakekeeper + Trino + Airflow glue) as one idiomatic PySpark engine:

- Trino SQL        -> Spark SQL / DataFrame API (Catalyst + Tungsten)
- Iceberg tables   -> session-catalog managed tables over partitioned Parquet
                      (day-transform partition materialized at write time)
- Airflow DAG      -> plain PySpark ingestion job (sources/ingest.py)
- pandas notebook  -> DataFrame operators (operators/)

Plus LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale: shuffle-aware, broadcast-aware,
no driver-side collection in any operator.
"""

from oss_data_lake_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
