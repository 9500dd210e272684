"""Column-level function library (beyond-reference).

The reference exposes no scalar string/date/math functions at all
(SURVEY.md §2.2 — its `.str` accessor has only contains/startswith/
endswith). Everything here is Spark-native superset surface, built on
`pyspark.sql.functions` so it stays JVM-side and codegen-friendly.
"""

from . import imagecodec, pii, similarity, text

__all__ = ["text", "similarity", "pii", "imagecodec"]
