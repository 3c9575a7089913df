"""PySpark-native analytics & migration engine.

A from-scratch re-expression of the query and data-processing
capabilities of the michelderu/cassandra-data-migration reference
(a Cassandra/DSE → HCD migration training system) as idiomatic
PySpark: DataFrame/SQL batch pipelines, Structured Streaming
dual-write, and set-oriented validation — plus the large-scale
training-data operators (dedup, similarity search, text analysis)
such an engine needs at 100 TB.

Layout mirrors SURVEY.md §7.1:
  session     SparkSession factory with scale-tuned defaults
  schema      training-keyspace StructTypes + metadata columns
  sources     readers/writers (parquet/csv/json, COPY/DSBulk options)
  operators   projections, filters, joins, aggregates, windows,
              set ops, dedup, similarity, text, multimodal
  functions   hashing, writetime/TTL metadata, scalar helpers
  plans       migrate / validate / reconcile / track / throttle
  streaming   dual-write, read routing, LWW merge, metrics, alerts
"""

__version__ = "0.1.0"

from cassandra_data_migration_spark.session import get_spark  # noqa: F401
