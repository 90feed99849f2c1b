"""cassandra_fs_pp_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference package ``erc-cassandra/cassandra_fs_pp`` (scientific-sensor ETL +
time-series analytics; see /root/repo/SURVEY.md), re-expressed Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, designed for
100 TB-scale partitioned execution rather than single-node pandas.

Layout:
    session     SparkSession construction + runtime tuning
    sources     scans: parquet star schema, TOA5 logger files, CSV dims
    operators   relational + time-series operators (dedup, validity,
                windows, joins, reshape, similarity)
    functions   scalar/column function families (text analysis, ts helpers)
    pipeline    reference-parity L0->L1->L2 pipelines + exports
    streaming   Structured Streaming skin over the batch semantics
    multimodal  opaque binary columns (image/audio) + Arrow UDF plumbing
"""

__version__ = "0.1.0"

from cassandra_fs_pp_spark.session import get_spark, tune

__all__ = ["get_spark", "tune", "__version__"]
