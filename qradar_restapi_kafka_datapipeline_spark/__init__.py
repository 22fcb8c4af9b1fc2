"""PySpark-native security-analytics engine.

A brand-new engine with the query and data-processing capabilities of
``vikramaditya-tatke/qradar-restapi-kafka-datapipeline`` (see SURVEY.md), built on
the Spark DataFrame / SQL / Structured Streaming stack:

- ``engine``     — SparkSession factory + table registry
- ``functions``  — AQL scalar-function library (INCIDR, decode joins, date math)
- ``operators``  — normalize, summing roll-up, dedup, similarity, text analysis
- ``sources``    — parquet/JSONL/Kafka source registration
- ``plans``      — the AQL → Spark SQL frontend
- ``streaming``  — watermarked streaming roll-up + foreachBatch merge sink
"""

from qradar_restapi_kafka_datapipeline_spark.engine import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
