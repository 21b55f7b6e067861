"""Training-data pipeline functions: text analysis, dedup, similarity,
multimodal plumbing — all built from JVM-side ``pyspark.sql.functions``
where possible (oracle-checkable against DuckDB), Arrow UDFs otherwise.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
