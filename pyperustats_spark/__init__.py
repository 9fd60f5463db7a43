"""pyperustats_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of TJhon/PyPeruStats, rebuilt Spark-first
for cluster scale.

Subpackages
-----------
sources     parquet table registry + incremental cache semantics
functions   date/text/vector/hashing column expressions (JVM-side)
operators   relational / timeseries / dedup / similarity / text / events
streaming   Structured Streaming variants
multimodal  binary-column (image/audio) plumbing with stubbed decoders
plans       explain/plan-assertion helpers
"""

from pyperustats_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
