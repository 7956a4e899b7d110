"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference pipeline ``ulasagrts/CDC-Wastewater-Analysis-ML``
(pandas + scikit-learn single-node script), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession builder with scale-oriented defaults
- ``sources``    : scans (csv/parquet/json) and sinks, fixture table loaders
- ``functions``  : scalar column functions with pinned null/edge semantics
- ``operators``  : relational / aggregate / window / dedup / similarity / text ops
- ``plans``      : composed pipelines (feature engineering, ML, metrics) and the
                   named-query registry consumed by ``__spark_entry__.py``
- ``streaming``  : Structured Streaming variants of the time-series operators

Every operator documents the reference behavior it reproduces via
``codes.py:<line>`` citations (reference read-only at /root/reference).
"""

__version__ = "0.1.0"
