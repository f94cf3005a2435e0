"""healthcare_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline `arpittomar246/Healthcare-data-pipeline` (medallion ETL over
Medicare-style prescription data: ingest -> cleanse -> curate star-join
reports, plus profiling, anonymization, and a baseline ML model), re-expressed
Spark-first (DataFrame / SQL / Catalyst / Structured Streaming) and extended
with large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from healthcare_data_pipeline_spark.session import get_spark  # noqa: F401
