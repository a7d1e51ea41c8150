"""nonconsumptive_spark — a PySpark-native analytics engine with the
capabilities of bmschmidt/nonconsumptive, rebuilt Spark-first.

Layout:
  session.py    — SparkSession construction tuned for the target cluster
  functions/    — scalar/array column functions (tokenize, hashing, embeddings)
  operators/    — DataFrame -> DataFrame operators (wordcount, ngrams, dedup,
                  similarity, text stats, relational helpers)
  sources/      — readers (folder-of-text, tsv corpus, ndjson/csv catalogs)
  plans/        — checkpoint/cache policy (the reference's Reservoir cache_set)
  streaming/    — Structured Streaming variants of the event operators
"""

from nonconsumptive_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
