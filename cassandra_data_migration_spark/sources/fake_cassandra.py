"""Executable fake of the Cassandra connector format — a PySpark
Python Data Source (Spark 4 `pyspark.sql.datasource`) registered
under the REAL format name ``org.apache.spark.sql.cassandra`` so
:class:`~cassandra_data_migration_spark.sources.connector.CassandraTableSource`'s
``read()``/``write()`` bodies execute end-to-end in tests without a
cluster.

What it fakes, faithfully:

- **format resolution** — ``spark.read.format("org.apache.spark.sql
  .cassandra").options(keyspace=…, table=…).load()`` resolves to this
  source (Python data sources take precedence over classpath lookup),
  so the deploy-hint error path in ``CassandraTableSource.read`` is
  exercised by simply NOT registering the fake.
- **keyspace/table addressing** — the fake resolves ``keyspace`` as a
  fixture directory and ``table`` as ``<keyspace>/<table>.parquet``
  (documented test convention; a live cluster uses real keyspace
  names).
- **CQL paging** — ``spark.cassandra.input.fetch.sizeInRows`` actually
  drives the Arrow batch size served per page, so the paging knob is
  load-bearing, not decorative.
- **server-side functions** — ``register_fake_cql_functions`` installs
  ``token()`` and ``writetime()`` as vectorized pandas UDFs with the
  repo's fixture semantics (``token(pk) = pmod(pk, 32)`` — the same
  bucket convention ``operators.filters.token_range_filter`` and its
  DuckDB oracles use; ``writetime(ts) = epoch µs``), so the pushdown
  predicate strings ``connector.py`` phrases (``token(pk) >= x``,
  ``writetime(col) >= t``) analyze and evaluate.
- **read recording** — every ``load()`` appends its full option map to
  ``$SPARK_GRAFT_FAKE_CQL_LOG`` (JSONL) when set.  Python data
  sources run in a worker process, so recording is file-based, not
  in-memory.

The real connector pushes token/writetime predicates into the CQL
WHERE clause server-side; here they run as Spark filters over the
same rows — identical semantics, observable plan.  Reference parity:
docs/04-cdm-approach.md:290-316 (partition-range scan),
lab/cdm-config/cdm.properties:27-29 (numParts / fetchSizeInRows).
"""

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
)

FAKE_CQL_LOG_ENV = "SPARK_GRAFT_FAKE_CQL_LOG"
# data-source workers inherit the env of the JVM (snapshotted at JVM
# launch), so an env var set mid-session never reaches them — the
# default is a fixed path; assertions filter records by keyspace/table
FAKE_CQL_LOG_DEFAULT = "/tmp/spark_graft_fake_cql_reads.jsonl"


def fake_cql_log_path():
    return os.environ.get(FAKE_CQL_LOG_ENV, FAKE_CQL_LOG_DEFAULT)


def _record_read(options):
    try:
        with open(fake_cql_log_path(), "a") as fh:
            fh.write(json.dumps(dict(options), sort_keys=True) + "\n")
    except OSError:
        pass


def _table_path(options):
    ks = options.get("keyspace", "")
    table = options.get("table", "")
    return os.path.join(ks, f"{table}.parquet")


class _FilePartition(InputPartition):
    def __init__(self, path, fetch_rows):
        self.path = path
        self.fetch_rows = fetch_rows


class _FakeCassandraReader(DataSourceReader):
    def __init__(self, options):
        self.options = dict(options)

    def partitions(self):
        import glob

        p = _table_path(self.options)
        files = sorted(glob.glob(os.path.join(p, "*.parquet"))) or [p]
        fetch = int(
            self.options.get("spark.cassandra.input.fetch.sizeinrows")
            or self.options.get("spark.cassandra.input.fetch.sizeInRows")
            or 5000
        )
        return [_FilePartition(f, fetch) for f in files]

    def read(self, partition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        # fetchSizeInRows IS the page size: one Arrow batch per "page"
        yield from pf.iter_batches(batch_size=partition.fetch_rows)


class _FakeCassandraWriter(DataSourceWriter):
    """Appends each task's rows as one parquet part under the table
    directory — the fake analogue of the connector's batched
    INSERTs.  Under overwrite, ``old_parts`` (snapshotted at planning
    time) are deleted in ``commit()``, after every task has written."""

    def __init__(self, schema, options, old_parts=None):
        self.schema = schema
        self.options = dict(options)
        self.old_parts = list(old_parts or [])

    def commit(self, messages):
        for f in self.old_parts:
            try:
                os.remove(f)
            except OSError:
                pass

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.datasource import WriterCommitMessage
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        rows = [tuple(r) for r in iterator]
        path = _table_path(self.options)
        os.makedirs(path, exist_ok=True)
        if rows:
            cols = list(zip(*rows))
            table = pa.table(
                {
                    f.name: pa.array(cols[i], type=f.type)
                    for i, f in enumerate(arrow_schema)
                }
            )
            pq.write_table(
                table, os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
            )
        return WriterCommitMessage()


class FakeCassandraDataSource(DataSource):
    """Serves fixture parquet under the Cassandra connector's format
    name.  ``schema()``/``reader()`` run in the data-source worker;
    state crosses process boundaries only via options and the log
    file."""

    @classmethod
    def name(cls):
        from cassandra_data_migration_spark.sources.connector import (
            CASSANDRA_FORMAT,
        )

        return CASSANDRA_FORMAT

    def schema(self):
        import glob

        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        _record_read(self.options)
        p = _table_path(self.options)
        if os.path.isdir(p):
            p = sorted(glob.glob(os.path.join(p, "*.parquet")))[0]
        return from_arrow_schema(pq.read_schema(p))

    def reader(self, schema):
        return _FakeCassandraReader(self.options)

    def writer(self, schema, overwrite):
        # honor mode("overwrite") by truncating in commit(), AFTER all
        # tasks succeed: the pre-existing parts are snapshotted here
        # (planning time) and deleted only once the new parts are all
        # on disk — a failed job leaves the old table intact, and an
        # overwrite whose input reads this same table still sees the
        # old files during the write
        import glob

        old_parts: list[str] = []
        if overwrite:
            p = _table_path(self.options)
            if os.path.isdir(p):
                old_parts = sorted(glob.glob(os.path.join(p, "*.parquet")))
        return _FakeCassandraWriter(schema, self.options, old_parts)


def register_fake_cassandra(spark):
    """Idempotently register the fake under the connector's format
    name and install the fake server-side CQL functions."""
    spark.dataSource.register(FakeCassandraDataSource)
    register_fake_cql_functions(spark)


def register_fake_cql_functions(spark):
    """``token()`` / ``writetime()`` as the fixture-semantics stand-ins
    for the functions a live cluster evaluates server-side.  Vectorized
    pandas UDFs (Arrow-batched) — and test-only: production plans never
    call these; they exist so the pushdown strings the connector seam
    phrases can run against fixtures."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _token(v: pd.Series) -> pd.Series:
        # fixture token convention: pmod(pk, 32) — matches
        # operators.filters.token_bucket and every token oracle
        return pd.to_numeric(v).astype("int64").mod(32)

    @pandas_udf("long")
    def _writetime(v: pd.Series) -> pd.Series:
        # epoch microseconds of the column's own timestamp value —
        # the fake's stand-in for the cell writetime
        return pd.to_datetime(v).astype("int64") // 1000

    spark.udf.register("token", _token)
    spark.udf.register("writetime", _writetime)
