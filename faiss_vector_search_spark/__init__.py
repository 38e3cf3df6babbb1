"""PySpark-native analytics engine with the query/data-processing
capabilities of RPLaine/faiss-vector-search (see SURVEY.md).

Spark-first re-expression: vector search, index lifecycle, dedup,
text analysis, chunking, and streaming — all as DataFrame plans that
Catalyst/Tungsten can optimize, designed for 100 TB-scale clusters.
"""

__version__ = "0.1.0"
