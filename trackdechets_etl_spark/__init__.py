"""trackdechets_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo MTES-MCT/trackdechets-etl (an Airflow + pandas ETL codebase, surveyed
in /root/repo/SURVEY.md) as an idiomatic Spark DataFrame/SQL library,
extended with large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal columns) and Structured
Streaming support.

Layout
------
- ``session``    : SparkSession factory (AQE on, explicit shuffle sizing)
- ``io``         : schema-explicit readers/writers (parquet, csv, jdbc)
- ``functions``  : scalar expression library (SURVEY §2.6-§2.7)
- ``operators``  : joins, dedup, stats blocks (SURVEY §2.3-§2.5)
- ``plans``      : the two reference pipelines rebuilt as lazy lineages
- ``llm``        : dedup / similarity / text-analysis / multimodal ops
- ``streaming``  : event-stream operators (watermark, windows, sessions)
"""

from trackdechets_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
