"""ibis_spark — a PySpark-native analytics engine with the reference's
(ibis-project/ibis) query surface.

Architecture (SURVEY.md §7): three thin layers —
``datatypes``/``schema`` (logical types), ``expr`` (Column/Table veneer
over pyspark expressions), and this Backend (session + IO + DDL). Spark's
logical plan is the IR; Catalyst is the sole optimizer.

Reference entry points mirrored here: ibis.connect / Backend
(ibis/backends/pyspark/__init__.py:164-510), read_parquet :838,
read_csv :871, read_json :914, memtable (expr/api.py:339).
"""

from __future__ import annotations

from typing import Any, Optional

from ibis_spark import datatypes  # noqa: F401
from ibis_spark import udf  # noqa: F401
from ibis_spark.datatypes import dtype  # noqa: F401
from ibis_spark.schema import Schema, schema  # noqa: F401
from ibis_spark.expr import (  # noqa: F401
    Column,
    Deferred,
    GroupedTable,
    Table,
    Window,
    _,
    asc,
    cumulative_window,
    desc,
    exists,
    literal,
    null,
    param,
    resolve,
    trailing_window,
    window,
)
from ibis_spark.functions import (  # noqa: F401
    array,
    case,
    cases,
    coalesce,
    cume_dist,
    date,
    dense_rank,
    e,
    greatest,
    ifelse,
    integer_range,
    interval,
    least,
    map_,
    now,
    ntile,
    percent_rank,
    pi,
    random,
    rank,
    row_number,
    struct,
    time,
    timestamp,
    timestamp_from_unix,
    timestamp_range,
    today,
    uuid,
)

# ibis spells the map constructor `ibis.map`; keep `map_` too (shadows the
# builtin only inside this namespace, exactly as the reference does)
map = map_  # noqa: A001

__version__ = "0.3.0"


class Backend:
    """Session + IO + DDL manager
    (reference: ibis/backends/pyspark/__init__.py Backend)."""

    def __init__(self, session=None, *, mode: str = "batch", **conf):
        from pyspark.sql import SparkSession

        if session is None:
            builder = SparkSession.builder.appName("ibis_spark")
            for k, v in conf.items():
                builder = builder.config(k, v)
            session = builder.getOrCreate()
        self._session = session
        if mode not in ("batch", "streaming"):
            raise ValueError("mode must be 'batch' or 'streaming'")
        self._mode = mode

    @property
    def spark(self):
        return self._session

    @property
    def mode(self) -> str:
        return self._mode

    # -- sources (PB:838-1306) ------------------------------------------------
    def table(self, name: str) -> Table:
        return Table(self._session.table(name))

    def read_parquet(self, path, table_name: Optional[str] = None) -> Table:
        if self._mode == "streaming":
            raise NotImplementedError("use read_parquet_dir for streaming mode")
        nanos = _nanos_timestamp_cols(path)
        if nanos:
            # Spark cannot read parquet TIMESTAMP(NANOS) natively; read the
            # raw int64 (legacy conf) and rebuild a TimestampNTZ from epoch
            # micros via interval arithmetic — exact and session-tz-free.
            self._session.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self._session.read.parquet(str(path))
        if nanos:
            from pyspark.sql import functions as F

            epoch = F.expr("CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)")
            cols = [
                (
                    epoch
                    + F.expr(
                        f"make_dt_interval(0, 0, 0, "
                        f"CAST(`{c}` div 1000 AS DECIMAL(20,0)) / 1000000)"
                    )
                ).alias(c)
                if c in nanos
                else df[c]
                for c in df.columns
            ]
            df = df.select(*cols)
        if table_name:
            df.createOrReplaceTempView(table_name)
        return Table(df)

    def read_csv(self, path, table_name: Optional[str] = None, **options) -> Table:
        options = {"header": "true", "inferSchema": "true", **options}
        df = self._session.read.options(**options).csv(str(path))
        if table_name:
            df.createOrReplaceTempView(table_name)
        return Table(df)

    def read_json(self, path, table_name: Optional[str] = None, **options) -> Table:
        df = self._session.read.options(**options).json(str(path))
        if table_name:
            df.createOrReplaceTempView(table_name)
        return Table(df)

    def read_delta(self, path, table_name: Optional[str] = None, **options) -> Table:
        df = self._session.read.format("delta").options(**options).load(str(path))
        if table_name:
            df.createOrReplaceTempView(table_name)
        return Table(df)

    # -- streaming sources (PB:1197-1306) ---------------------------------------
    def read_parquet_dir(self, path, schema=None, watermark=None, **options) -> Table:
        reader = self._session.readStream
        if schema is not None:
            reader = reader.schema(_as_spark_schema(schema))
        df = reader.options(**options).parquet(str(path))
        df = _apply_watermark(df, watermark)
        return Table(df)

    def read_csv_dir(self, path, schema=None, watermark=None, **options) -> Table:
        reader = self._session.readStream
        if schema is not None:
            reader = reader.schema(_as_spark_schema(schema))
        df = reader.options(**{"header": "true", **options}).csv(str(path))
        df = _apply_watermark(df, watermark)
        return Table(df)

    def read_json_dir(self, path, schema=None, watermark=None, **options) -> Table:
        reader = self._session.readStream
        if schema is not None:
            reader = reader.schema(_as_spark_schema(schema))
        df = reader.options(**options).json(str(path))
        df = _apply_watermark(df, watermark)
        return Table(df)

    def read_kafka(self, *, bootstrap_servers: str, topic: str, watermark=None, **options) -> Table:
        """Kafka streaming source (PB:1080)."""
        df = (
            self._session.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .options(**options)
            .load()
        )
        df = _apply_watermark(df, watermark)
        return Table(df)

    def to_kafka(self, table: Table, *, bootstrap_servers: str, topic: str, checkpoint: str, **options):
        """Kafka streaming sink (PB:1144) → StreamingQuery."""
        return (
            table.df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .options(**options)
            .start()
        )

    # -- memtable (expr/api.py:339; InMemoryTable relations.py:420) ---------------
    def memtable(self, data, schema=None, columns=None) -> Table:
        import pandas as pd
        import pyarrow as pa

        if isinstance(data, pa.Table):
            data = data.to_pandas()
        if isinstance(data, dict):
            data = pd.DataFrame(data)
        elif isinstance(data, (list, tuple)):
            data = pd.DataFrame(data, columns=columns)
        if schema is not None:
            df = self._session.createDataFrame(data, _as_spark_schema(schema))
        else:
            df = self._session.createDataFrame(data)
        return Table(df)

    # -- raw SQL (relations.py:4004) ------------------------------------------------
    def sql(self, query: str) -> Table:
        return Table(self._session.sql(query))

    raw_sql = sql

    # -- DDL (PB:512-795) -------------------------------------------------------------
    def create_table(
        self,
        name: str,
        obj: Table = None,
        *,
        temp: bool = True,
        overwrite: bool = True,
        partition_by=None,
        bucket_by=None,
        num_buckets: int = 16,
        sort_by=None,
    ) -> Table:
        """Create a (temp view or managed) table (PB:621).

        ``partition_by`` → hive partition directories (partition pruning);
        ``bucket_by``/``num_buckets``(+``sort_by``) → bucketed layout so
        joins and aggregations on the bucket keys need NO shuffle — the
        co-located-join strategy for repeatedly-joined 100 TB tables.
        """
        if obj is None:
            raise NotImplementedError("create_table requires a table expression")
        if temp:
            if partition_by or bucket_by:
                raise ValueError("partitioning/bucketing requires temp=False")
            if overwrite:
                obj.df.createOrReplaceTempView(name)
            else:
                obj.df.createTempView(name)
        else:
            w = obj.df.write.mode("overwrite" if overwrite else "error")
            if partition_by:
                pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
                w = w.partitionBy(*pb)
            if bucket_by:
                bb = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
                w = w.bucketBy(num_buckets, *bb)
                if sort_by:
                    sb = [sort_by] if isinstance(sort_by, str) else list(sort_by)
                    w = w.sortBy(*sb)
            w.saveAsTable(name)
        return self.table(name)

    def create_view(self, name: str, obj: Table, *, overwrite: bool = True) -> Table:
        if overwrite:
            obj.df.createOrReplaceTempView(name)
        else:
            obj.df.createTempView(name)
        return self.table(name)

    def drop_table(self, name: str, *, force: bool = False) -> None:
        self._session.sql(f"DROP TABLE IF EXISTS {name}")

    def drop_view(self, name: str, *, force: bool = False) -> None:
        self._session.catalog.dropTempView(name)

    def list_tables(self) -> list[str]:
        return [t.name for t in self._session.catalog.listTables()]

    def list_databases(self) -> list[str]:
        return [d.name for d in self._session.catalog.listDatabases()]

    def insert(self, name: str, obj: Table, *, overwrite: bool = False) -> None:
        """Append (or overwrite) rows into an existing table (BB insert)."""
        obj.df.write.insertInto(name, overwrite=overwrite)

    def cache_table(self, name: str) -> None:
        self._session.catalog.cacheTable(name)

    # -- sinks (BB:479-629) --------------------------------------------------------------
    def to_parquet(self, table: Table, path: str, **options) -> None:
        table.to_parquet(path, **options)

    def to_csv(self, table: Table, path: str, **options) -> None:
        table.to_csv(path, **options)

    def to_json(self, table: Table, path: str, **options) -> None:
        table.to_json(path, **options)

    def to_parquet_dir(self, table: Table, path: str, *, checkpoint: str, **options):
        """Streaming parquet sink (PB:1376) → StreamingQuery."""
        return (
            table.df.writeStream.format("parquet")
            .option("path", str(path))
            .option("checkpointLocation", checkpoint)
            .options(**options)
            .start()
        )

    def to_csv_dir(self, table: Table, path: str, *, checkpoint: str, **options):
        return (
            table.df.writeStream.format("csv")
            .option("path", str(path))
            .option("checkpointLocation", checkpoint)
            .options(**options)
            .start()
        )

    def disconnect(self) -> None:
        self._session.stop()


def connect(session=None, **conf) -> Backend:
    """Create a Backend from an existing SparkSession (or build one)."""
    return Backend(session, **conf)


def memtable(data, schema=None, columns=None) -> Table:
    """Module-level memtable using the active session (expr/api.py:339)."""
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession()
    if session is None:
        raise RuntimeError("no active SparkSession; use connect(...).memtable")
    return Backend(session).memtable(data, schema=schema, columns=columns)


def _apply_watermark(df, watermark):
    """Attach an event-time watermark; Spark requires TIMESTAMP (not NTZ)
    event time, so NTZ columns are cast first (session tz applies)."""
    if watermark is None:
        return df
    col, delay = watermark
    from pyspark.sql import types as st

    if isinstance(df.schema[col].dataType, st.TimestampNTZType):
        df = df.withColumn(col, df[col].cast("timestamp"))
    return df.withWatermark(col, delay)


def _nanos_timestamp_cols(path) -> set[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — read from the footer
    (one tiny metadata IO, no data scan) so read_parquet can shim them."""
    import os

    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
    except ImportError:
        return set()
    p = str(path)
    if os.path.isdir(p):
        files = sorted(
            f for f in os.listdir(p) if f.endswith(".parquet") and not f.startswith("_")
        )
        if not files:
            return set()
        p = os.path.join(p, files[0])
    try:
        sch = pq.read_schema(p)
    except Exception:
        return set()
    return {
        f.name
        for f in sch
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    }


def _as_spark_schema(s):
    from pyspark.sql import types as st

    if isinstance(s, st.StructType):
        return s
    if isinstance(s, Schema):
        return s.to_spark()
    if isinstance(s, dict):
        return schema(s).to_spark()
    raise TypeError(f"cannot interpret {s!r} as a schema")
