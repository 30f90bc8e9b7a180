"""eventbridge_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference "EventBridge ETL" pipeline (see SURVEY.md), re-expressed
Spark-first: batch + Structured Streaming DataFrame programs, an
EventBridge-style pattern-routing DSL compiled to Catalyst ``Column``
predicates, a keyed idempotent upsert sink, and the LLM-data-pipeline
operator suite (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Nothing here is a port of the reference's serverless machinery — the
capability surface is the same; the execution model is Spark's.
"""

from eventbridge_etl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
