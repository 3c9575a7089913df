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
    WriterCommitMessage,
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
    def __init__(self, path, fetch_rows, token_min=None, token_max=None):
        self.path = path
        self.fetch_rows = fetch_rows
        self.token_min = token_min
        self.token_max = token_max


def _opt(options, key, default=None):
    """Option lookup tolerant of Spark's key lower-casing."""
    return options.get(key.lower(), options.get(key, default))


class _FakeCassandraReader(DataSourceReader):
    def __init__(self, options):
        self.options = dict(options)

    def partitions(self):
        import glob

        p = _table_path(self.options)
        files = sorted(glob.glob(os.path.join(p, "*.parquet"))) or [p]
        fetch = int(
            _opt(self.options, "spark.cassandra.input.fetch.sizeInRows")
            or 5000
        )
        tmin = _opt(self.options, "spark.cdm.filter.cassandra.partition.min")
        tmax = _opt(self.options, "spark.cdm.filter.cassandra.partition.max")
        return [
            _FilePartition(
                f,
                fetch,
                int(tmin) if tmin is not None else None,
                int(tmax) if tmax is not None else None,
            )
            for f in files
        ]

    def read(self, partition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        # fetchSizeInRows IS the page size: one Arrow batch per "page"
        for batch in pf.iter_batches(batch_size=partition.fetch_rows):
            if partition.token_min is None and partition.token_max is None:
                yield batch
                continue
            # server-side token-range slice (the CDM partition.min/max
            # filter, docs/04-cdm-approach.md:290-316): the fake's
            # token convention is pmod(pk, 32) over the FIRST schema
            # column (fixture tables lead with their partition key) —
            # pruned here, before rows ever reach Spark, exactly where
            # a real cluster prunes token ranges
            import numpy as np

            pk = np.asarray(batch.column(0))
            tok = np.mod(pk.astype(np.int64), 32)
            mask = np.ones(len(tok), dtype=bool)
            if partition.token_min is not None:
                mask &= tok >= partition.token_min
            if partition.token_max is not None:
                mask &= tok <= partition.token_max
            if mask.any():
                import pyarrow as pa

                yield batch.filter(pa.array(mask))


class _PartCommit(WriterCommitMessage):
    """WriterCommitMessage carrying the task's written part path (None
    when the task had no rows) — what commit()/abort() reconcile
    against the job's on-disk parts."""

    def __init__(self, path=None):
        self.path = path


class _FakeCassandraWriter(DataSourceWriter):
    """Appends each task's rows as one parquet part under the table
    directory — the fake analogue of the connector's batched INSERTs.

    Job atomicity mirrors the DSv2 commit protocol: every part this
    job writes is named ``part-<job_id>-<task_uuid>.parquet`` and its
    path travels back in the task's :class:`_PartCommit`.  ``commit``
    keeps only committed paths (parts from retried/zombie attempts of
    this job are deleted) and, under overwrite, removes ``old_parts``
    (snapshotted at planning time) only after every task succeeded.
    ``abort`` deletes everything the failed job wrote, leaving the old
    table intact."""

    def __init__(self, schema, options, job_id, old_parts=None):
        self.schema = schema
        self.options = dict(options)
        self.job_id = job_id
        self.old_parts = list(old_parts or [])

    def _job_parts(self):
        import glob

        return glob.glob(
            os.path.join(
                _table_path(self.options), f"part-{self.job_id}-*.parquet"
            )
        )

    def commit(self, messages):
        committed = {m.path for m in messages if getattr(m, "path", None)}
        for f in self._job_parts():
            if f not in committed:
                try:
                    os.remove(f)
                except OSError:
                    pass
        for f in self.old_parts:
            try:
                os.remove(f)
            except OSError:
                pass

    def abort(self, messages):
        for f in self._job_parts():
            try:
                os.remove(f)
            except OSError:
                pass

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        rows = [tuple(r) for r in iterator]
        path = _table_path(self.options)
        os.makedirs(path, exist_ok=True)
        part = None
        if rows:
            cols = list(zip(*rows))
            table = pa.table(
                {
                    f.name: pa.array(cols[i], type=f.type)
                    for i, f in enumerate(arrow_schema)
                }
            )
            part = os.path.join(
                path, f"part-{self.job_id}-{uuid.uuid4().hex}.parquet"
            )
            pq.write_table(table, part)
        return _PartCommit(part)


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
        import uuid

        # the write twin of the read recording: the full option map
        # (batch size, rate limit, consistency — connector.py
        # cassandra_writer_options) plus the op marker, so tests and
        # the write audit can assert what a live cluster would receive
        _record_read({**dict(self.options), "_op": "write"})
        old_parts: list[str] = []
        if overwrite:
            p = _table_path(self.options)
            if os.path.isdir(p):
                old_parts = sorted(glob.glob(os.path.join(p, "*.parquet")))
        return _FakeCassandraWriter(
            schema, self.options, uuid.uuid4().hex, old_parts
        )


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
