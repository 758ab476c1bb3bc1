"""ccog_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of
csiro-easi/ccog (distributed Cloud Optimized GeoTIFF writing: resolution
pyramids, per-band masked statistics, tiled compression, sparse tiles,
ordered multipart cloud writes) re-designed as idiomatic Spark, plus the
full relational surface and LLM-data-pipeline operators (dedup, vector
similarity search, text analysis, multimodal columns).

Blueprint: /root/repo/SURVEY.md. Everything here is built on public
PySpark APIs only.
"""

from ccog_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
