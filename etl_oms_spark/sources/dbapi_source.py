"""Custom Python DataSource (Spark 4 API): partitioned DB-API reads.

The reference reads its dimension tables over a live DB connection
(`ETL_OMS_OPERATIONNEL.py:229-234`, pandas ``read_sql``) — the S5 seam.
`read_jdbc_dim` covers the JVM JDBC path but needs a server; this module
closes the seam natively with Spark 4's Python DataSource API: ANY
DB-API-2.0 database (DuckDB, SQLite, Postgres via psycopg2, ...) becomes
a first-class ``spark.read.format(...)`` source with

- **partitioned parallel reads**: an integer column + bounds split the
  query into range predicates, one DB cursor per Spark task (the same
  contract as JDBC's partitionColumn/numPartitions);
- executor-side connections (the driver never funnels rows): each task
  opens its own connection from a connect() callable resolved by module
  path, so the object shipped to workers is a string, not a socket.

Registration is per-session: ``register_dbapi_source(spark)`` then
``spark.read.format("dbapi").options(...)``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class _RangePartition(InputPartition):
    def __init__(self, lo, hi, last: bool) -> None:
        self.lo = lo
        self.hi = hi
        self.last = last


def _resolve(path: str):
    """Import ``pkg.mod:attr`` → the connect() callable."""
    mod_name, _, attr = path.partition(":")
    import importlib

    mod = importlib.import_module(mod_name)
    fn = mod
    for part in attr.split("."):
        fn = getattr(fn, part)
    return fn


class DBApiReader(DataSourceReader):
    def __init__(self, schema, options) -> None:
        self.schema = schema
        self.connect_path = options["connect"]
        self.connect_arg = options.get("connect_arg")
        self.query = options["query"]
        self.part_col = options.get("partition_column")
        self.n_parts = int(options.get("num_partitions", "4"))
        self.lower = options.get("lower_bound")
        self.upper = options.get("upper_bound")

    def partitions(self):
        if not self.part_col:
            return [_RangePartition(None, None, True)]
        lo, hi = int(self.lower), int(self.upper)
        step = max(1, (hi - lo + 1) // self.n_parts)
        parts = []
        start = lo
        for i in range(self.n_parts):
            end = hi if i == self.n_parts - 1 else start + step - 1
            parts.append(_RangePartition(start, end, i == self.n_parts - 1))
            start = end + 1
            if start > hi:
                break
        return parts

    def read(self, partition):
        connect = _resolve(self.connect_path)
        conn = connect(self.connect_arg) if self.connect_arg else connect()
        try:
            cur = conn.cursor() if hasattr(conn, "cursor") else conn
            sql = f"SELECT * FROM ({self.query}) __q"
            if self.part_col and partition.lo is not None:
                # last partition takes an open upper edge so bound
                # estimation errors can't drop rows
                upper_pred = (
                    f"{self.part_col} >= {partition.lo}"
                    if partition.last and partition.hi is None
                    else f"{self.part_col} BETWEEN {partition.lo} AND {partition.hi}"
                )
                sql += f" WHERE {upper_pred}"
            cur.execute(sql)
            while True:
                rows = cur.fetchmany(10_000)
                if not rows:
                    break
                yield from (tuple(r) for r in rows)
        finally:
            conn.close()


class DBApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dbapi"

    def schema(self) -> str:
        # user-declared schema is required: DB-API has no portable
        # schema discovery that Spark's planner can consume lazily
        raise NotImplementedError(
            "pass .schema(...) explicitly when reading format('dbapi')"
        )

    def reader(self, schema) -> DataSourceReader:
        return DBApiReader(schema, self.options)


def register_dbapi_source(spark) -> None:
    """Register the source for this session (idempotent)."""
    spark.dataSource.register(DBApiDataSource)


def duckdb_readonly(path: str):
    """Connect helper for file-backed DuckDB: read_only so N executor
    tasks can open the same file concurrently (DuckDB's write mode takes
    an exclusive lock). Use as ``connect='etl_oms_spark.sources.
    dbapi_source:duckdb_readonly'`` with ``connect_arg=<db path>``."""
    import duckdb

    return duckdb.connect(path, read_only=True)


class DBApiStreamReader(SimpleDataSourceStreamReader):
    """Incremental polling stream over a DB-API table: each micro-batch
    reads rows with ``offset_column`` strictly greater than the last
    committed high-water mark — the classic append-only CDC ingest
    (auto-increment id or monotonically increasing event time). Offsets
    are {"hwm": <long>}; replays between offsets are deterministic, so
    the source supports exactly-once with a checkpointed sink."""

    def __init__(self, schema, options) -> None:
        self.connect_path = options["connect"]
        self.connect_arg = options.get("connect_arg")
        self.query = options["query"]
        self.offset_col = options["offset_column"]
        self.start = int(options.get("start_offset", "-1"))

    def initialOffset(self):
        return {"hwm": self.start}

    def _fetch(self, lo: int, hi: int | None):
        connect = _resolve(self.connect_path)
        conn = connect(self.connect_arg) if self.connect_arg else connect()
        try:
            cur = conn.cursor() if hasattr(conn, "cursor") else conn
            pred = f"{self.offset_col} > {lo}"
            if hi is not None:
                pred += f" AND {self.offset_col} <= {hi}"
            cur.execute(f"SELECT * FROM ({self.query}) __q WHERE {pred}")
            return [tuple(r) for r in cur.fetchall()]
        finally:
            conn.close()

    def read(self, start):
        connect = _resolve(self.connect_path)
        conn = connect(self.connect_arg) if self.connect_arg else connect()
        try:
            cur = conn.cursor() if hasattr(conn, "cursor") else conn
            cur.execute(
                f"SELECT MAX({self.offset_col}) FROM ({self.query}) __q"
            )
            row = cur.fetchone()
            hwm = row[0] if row and row[0] is not None else start["hwm"]
        finally:
            conn.close()
        hwm = int(hwm)
        if hwm <= start["hwm"]:
            return iter([]), start
        rows = self._fetch(start["hwm"], hwm)
        return iter(rows), {"hwm": hwm}

    def readBetweenOffsets(self, start, end):
        # deterministic replay for recovery
        return iter(self._fetch(start["hwm"], end["hwm"]))

    def commit(self, end) -> None:
        pass  # nothing to clean up: the table itself is the log


class DBApiStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dbapi_stream"

    def schema(self) -> str:
        raise NotImplementedError(
            "pass .schema(...) explicitly when reading format('dbapi_stream')"
        )

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return DBApiStreamReader(schema, self.options)


def register_dbapi_stream_source(spark) -> None:
    spark.dataSource.register(DBApiStreamDataSource)


class _WroteRows(WriterCommitMessage):
    def __init__(self, n: int) -> None:
        self.n = n


class DBApiWriter(DataSourceWriter):
    """Executor-parallel INSERT loader: each partition opens its own
    connection and executemany-batches its rows into ``table`` — the
    parallel staging load (S8) as a native ``df.write.format('dbapi')``.
    Server databases (Postgres, MySQL) take the partitions concurrently;
    single-writer embedded files (DuckDB, SQLite) serialize via the
    lock-retry loop, correct either way. Commit messages carry row
    counts; the driver logs the total (no distributed transaction is
    pretended — make loads idempotent with staging + MERGE, see
    upsert_via_dbapi)."""

    def __init__(self, schema, options) -> None:
        self.connect_path = options["connect"]
        self.connect_arg = options.get("connect_arg")
        self.table = options["table"]
        self.n_cols = len(schema.fields)
        self.retries = int(options.get("lock_retries", "20"))

    def write(self, rows):
        import time as _time

        buf = [tuple(r) for r in rows]
        if not buf:
            return _WroteRows(0)
        placeholders = ",".join(["?"] * self.n_cols)
        connect = _resolve(self.connect_path)
        last_exc = None
        for attempt in range(self.retries):
            try:
                conn = connect(self.connect_arg) if self.connect_arg else connect()
                try:
                    cur = conn.cursor() if hasattr(conn, "cursor") else conn
                    cur.executemany(
                        f"INSERT INTO {self.table} VALUES ({placeholders})", buf
                    )
                    if hasattr(conn, "commit"):
                        conn.commit()
                    return _WroteRows(len(buf))
                finally:
                    conn.close()
            except Exception as exc:  # noqa: BLE001 - single-writer lock
                last_exc = exc
                _time.sleep(0.1 * (attempt + 1))
        raise last_exc

    def commit(self, messages):
        total = sum(m.n for m in messages if m is not None)
        import logging

        logging.getLogger(__name__).info("dbapi write committed %d rows", total)

    def abort(self, messages):
        import logging

        logging.getLogger(__name__).warning(
            "dbapi write aborted; partial partitions may persist — load into "
            "a staging table and MERGE for idempotence"
        )


class DBApiWriteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dbapi_write"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise NotImplementedError(
                "mode('overwrite') unsupported: truncate the target "
                "explicitly or load a staging table + MERGE"
            )
        return DBApiWriter(schema, self.options)


def register_dbapi_write_source(spark) -> None:
    spark.dataSource.register(DBApiWriteDataSource)


def duckdb_writable(path: str):
    """Connect helper for file-backed DuckDB in write mode (single writer
    at a time — DBApiWriter's retry loop serializes partitions)."""
    import duckdb

    return duckdb.connect(path)
