"""Loaders: file/S3, JDBC append/overwrite/upsert, Kafka.

Parity anchors:
- S3/file write:      loader/S3Loader.scala:27-119
- Kafka write:        loader/KafkaLoader.scala:26-98
- Postgres write:     loader/PostgresLoader.scala:54-185
- MySQL write:        loader/MySQLLoader.scala:54-184

Anti-pattern deliberately NOT copied (SURVEY §4): the reference
``count()``s the DataFrame inside every loader (``loader/S3Loader.scala:47``)
on top of the executor's two ``count()``s, so each run executes the whole
plan up to 3x. Here the write is the ONLY action; ``records_written``
comes from a ``pyspark.sql.Observation`` attached to the same action —
zero extra jobs, which is the difference between one pass and three over
100 TB of input.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from etl_spark_gradle_spark.plans.config import ConfigError, LoadResult, SinkConfig, ValidationResult

_FILE_FORMATS = {"parquet", "avro", "json", "csv", "orc", "text", "xml"}


def _observed(df: DataFrame) -> tuple[DataFrame, Observation]:
    obs = Observation(f"load_{uuid.uuid4().hex[:8]}")
    return df.observe(obs, F.count(F.lit(1)).alias("records_written")), obs


def load_file(
    df: DataFrame,
    options: dict[str, str],
    write_mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> LoadResult:
    """Write avro/parquet/json/csv/orc/xml (parity: ``loader/S3Loader.scala:27-119``):
    ``append``/``overwrite``, ``partitionBy`` columns, ``compression``
    codec, ``coalesce`` N output files, ``sortWithinPartitions``
    columns (shuffle-free local sort → tight row-group min/max stats →
    predicate-driven row-group skipping on read).

    ``coalesce`` narrows the final stage without a shuffle (correct for
    "fewer, bigger files"); when a full rebalance is wanted use the
    executor-level ``repartition`` knob instead. Target file size at
    scale: 128 MB–1 GB (``benchmark/PartitioningStrategySpec.scala:301-304``)
    — with AQE coalescing shuffle partitions, the default output sizing
    already lands there without manual tuning.
    """
    path = options.get("path")
    fmt = options.get("format", "parquet").lower()
    if not path:
        raise ConfigError("file sink requires 'path'")
    if fmt not in _FILE_FORMATS:
        raise ConfigError(f"unsupported file sink format '{fmt}'")
    if write_mode not in ("append", "overwrite"):
        raise ConfigError(f"file sink supports append|overwrite, got '{write_mode}'")
    bucket_cols = [c.strip() for c in (options.get("bucketBy") or "").split(",") if c.strip()]
    out, obs = _observed(df)
    zorder_cols = [
        c.strip() for c in (options.get("zorderBy") or "").split(",") if c.strip()
    ]
    if zorder_cols:
        # Multi-dimensional clustering (see operators/layout.py): range-
        # partition + local sort on the Morton key so EVERY listed
        # column gets tight per-file/row-group min-max stats — the
        # several-filter-columns sibling of sortWithinPartitions. Costs
        # one bounds agg + one range shuffle at write time.
        from etl_spark_gradle_spark.operators.layout import zorder

        out = zorder(
            out,
            zorder_cols,
            bits=int(options.get("zorderBits", "16")),
            num_partitions=int(options["zorderPartitions"])
            if options.get("zorderPartitions")
            else None,
        )
    if options.get("targetFileSizeMB"):
        # Small-files COMPACTION: pick the output file count from the
        # plan's estimated bytes instead of hand-tuning `coalesce`. At
        # 100 TB the failure mode this kills is thousands of KB-sized
        # files per partition strangling the namenode and every later
        # scan's task scheduler. The estimate is Catalyst's sizeInBytes
        # (exact for file sources, heuristic after joins/aggs).
        # Deliberately coalesce-only: coalesce never triggers a job or
        # a shuffle (so the plan is NOT executed twice under AQE, which
        # probing the live partition count via .rdd would cause), a
        # count above the current partitioning is a harmless no-op, and
        # it merges CONSECUTIVE partitions — so a zorderBy/range layout
        # upstream keeps its clustering at coarser granularity. To
        # SPLIT oversized partitions, repartition explicitly upstream.
        try:
            target = float(options["targetFileSizeMB"]) * 1024 * 1024
        except ValueError as exc:
            raise ConfigError(
                f"targetFileSizeMB must be numeric, got {options['targetFileSizeMB']!r}"
            ) from exc
        if not target > 0:  # also rejects NaN
            raise ConfigError("targetFileSizeMB must be > 0")
        est = float(str(out._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        if est < float(2**62):
            out = out.coalesce(min(100_000, max(1, int(est / target + 0.5))))
        # else: Catalyst reports defaultSizeInBytes (Long.Max) when it
        # has no statistics for a non-file source — no basis to size
        # output files, so leave the partitioning alone
    if options.get("coalesce"):
        out = out.coalesce(int(options["coalesce"]))
    sort_within = [
        c.strip()
        for c in (options.get("sortWithinPartitions") or "").split(",")
        if c.strip()
    ]
    if sort_within:
        # Narrow per-task sort (NO shuffle) before the write: parquet/orc
        # row-group min/max stats become tight, disjoint ranges on these
        # columns, so later range/point predicates skip whole row groups
        # at scan time. The 100 TB knob for "we always filter by ts/id":
        # pay one local sort at write, save the scan forever after.
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.format(fmt).mode(write_mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if options.get("compression"):
        writer = writer.option("compression", options["compression"])
    if fmt == "csv":
        writer = writer.option("header", options.get("header", "true"))
    if fmt == "xml":
        writer = writer.option("rowTag", options.get("rowTag", "row"))
        writer = writer.option("rootTag", options.get("rootTag", "rows"))
    if fmt == "text":
        # corpus-export path: text files hold exactly one string column;
        # single-column frames are cast rather than rejected
        if len(df.columns) != 1:
            raise ConfigError(
                f"text sink requires exactly one column, got {len(df.columns)} "
                f"({df.columns}) — project or map first"
            )
        out = out.select(out[out.columns[-1]].cast("string").alias("value"))
        writer = out.write.format(fmt).mode(write_mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if options.get("compression"):
            writer = writer.option("compression", options["compression"])
    pom = options.get("partitionOverwriteMode")
    if pom:
        # Dynamic partition overwrite: replace ONLY the partitions the
        # batch writes, leave every other partition intact — the
        # idempotent-rerun primitive. Paired with file_incremental's
        # at-least-once re-discovery this upgrades reruns to
        # exactly-once-EFFECTIVE *when each batch exclusively owns the
        # partitions it writes* (e.g. partitioning by batch/ingest
        # date): a reprocessed batch then clobbers its own partitions
        # with identical content. CAVEAT — if LATE data can land in a
        # partition an earlier batch already wrote (event-date
        # partitioning with stragglers), the overwrite REPLACES that
        # partition with only the new batch's rows; use append, or
        # read-merge-write, for late-arrival layouts. The per-write
        # DataFrameWriter option overrides the session conf, so
        # nothing global mutates.
        if pom not in ("static", "dynamic"):
            raise ConfigError(
                f"partitionOverwriteMode must be static|dynamic, got '{pom}'"
            )
        if pom == "dynamic" and (write_mode != "overwrite" or not partition_by):
            raise ConfigError(
                "partitionOverwriteMode=dynamic requires writeMode=overwrite "
                "AND partitionBy columns — without partitions there is "
                "nothing to scope the overwrite to"
            )
        if bucket_cols:
            # the bucketed saveAsTable path rebuilds its writer below
            # and catalog-table overwrite has its own semantics — a
            # silently DROPPED dynamic mode here would static-overwrite
            # and delete untouched partitions (review finding)
            raise ConfigError(
                "partitionOverwriteMode is not supported together with "
                "bucketBy (catalog-table overwrite semantics differ); "
                "drop one of the two options"
            )
        writer = writer.option("partitionOverwriteMode", pom)
    try:
        if bucket_cols:
            # Bucketed write (beyond-reference; 100 TB path): pre-hash the
            # data into N buckets on the join/agg key at WRITE time so
            # every later equi-join or groupBy on that key is co-located —
            # no Exchange at read time. Buckets only exist as catalog
            # metadata, so this goes through saveAsTable (path-backed
            # external table), not save(path).
            table = options.get("table")
            if not table:
                raise ConfigError(
                    "bucketed write requires 'table' — bucket metadata lives "
                    "in the catalog, not the files"
                )
            buckets = int(options.get("buckets", "0") or 0)
            if buckets <= 0:
                raise ConfigError("bucketed write requires 'buckets' > 0")
            sort_cols = [
                c.strip() for c in (options.get("sortBy") or "").split(",") if c.strip()
            ]
            if sort_cols:
                # Sorted buckets remove the per-task Sort under
                # sort-merge joins on the bucket key — but Spark only
                # trusts the ordering when each bucket is ONE file
                # (sortBy is a per-file guarantee), so route every
                # bucket's rows through a single writer task first.
                # bucketBy and repartition share the same Murmur3 hash
                # partitioning, so this adds no extra data movement
                # beyond the one shuffle the layout needs anyway.
                # Trade-off at extreme scale: one task per bucket —
                # size `buckets` to the cluster, or skip sortBy and
                # keep multi-file buckets (join stays Exchange-free
                # either way; only the Sort elision needs single-file).
                # The READ session must additionally opt in with
                # spark.sql.legacy.bucketedTableScan.outputOrdering=true
                # (Spark >= 3.0 ignores sortBy metadata by default);
                # proven end-to-end in tests/test_bucketed_join.py.
                out = out.repartition(buckets, *[out[c] for c in bucket_cols])
                writer = out.write.format(fmt).mode(write_mode)
                if partition_by:
                    writer = writer.partitionBy(*partition_by)
                if options.get("compression"):
                    writer = writer.option("compression", options["compression"])
                if fmt == "csv":
                    writer = writer.option("header", options.get("header", "true"))
                writer = writer.bucketBy(buckets, *bucket_cols)
                writer = writer.sortBy(*sort_cols)
            else:
                writer = writer.bucketBy(buckets, *bucket_cols)
            writer.option("path", path).saveAsTable(table)
        else:
            writer.save(path)
    except Exception as e:  # noqa: BLE001 — rewrap only the avro-package gap
        if fmt == "avro" and "avro" in str(e).lower() and "find" in str(e).lower():
            raise ConfigError(
                "avro support requires the spark-avro package on the session "
                "(spark-submit --packages org.apache.spark:spark-avro_2.13:<spark-version>); "
                "it is not bundled with pyspark"
            ) from e
        raise
    return LoadResult(
        records_written=int(obs.get["records_written"]),
        sink_type="file",
        write_mode=write_mode,
    )


def kafka_frame(df: DataFrame) -> DataFrame:
    """Row→record framing (parity: ``loader/KafkaLoader.scala:58-70``):
    if ``key``/``value`` columns exist they are cast to string; otherwise
    the whole row is packed as JSON (``key=null``,
    ``value=to_json(struct(*))``). Shared by the batch loader and the
    streaming Kafka sink."""
    cols = set(df.columns)
    if "value" in cols:
        return df.select(
            (F.col("key").cast("string") if "key" in cols else F.lit(None).cast("string")).alias(
                "key"
            ),
            F.col("value").cast("string").alias("value"),
        )
    return df.select(
        F.lit(None).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )


def load_kafka(df: DataFrame, options: dict[str, str], write_mode: str = "append") -> LoadResult:
    """Kafka write (parity: ``loader/KafkaLoader.scala:58-79``)."""
    servers = options.get("bootstrap.servers") or options.get("kafka.bootstrap.servers")
    topic = options.get("topic")
    if not servers or not topic:
        raise ConfigError("kafka sink requires 'bootstrap.servers' and 'topic'")
    out, obs = _observed(kafka_frame(df))
    try:
        (
            out.write.format("kafka")
            .option("kafka.bootstrap.servers", servers)
            .option("topic", topic)
            .save()
        )
    except Exception as e:  # noqa: BLE001 — rewrap only the kafka-package gap
        from etl_spark_gradle_spark.sources.extractors import _is_missing_datasource

        if _is_missing_datasource(e, "kafka"):
            raise ConfigError(
                "kafka support requires the spark-sql-kafka package on the "
                "session (spark-submit --packages "
                "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); "
                "it is not bundled with pyspark"
            ) from e
        raise
    return LoadResult(
        records_written=int(obs.get["records_written"]),
        sink_type="kafka",
        write_mode=write_mode,
    )


_UPSERT_TEMPLATES = {
    # loader/PostgresLoader.scala:170-174
    "postgres": (
        "INSERT INTO {table} ({cols}) SELECT {cols} FROM {tmp} "
        "ON CONFLICT ({pk}) DO UPDATE SET {updates_excluded}"
    ),
    # loader/MySQLLoader.scala:169-173
    "mysql": (
        "INSERT INTO {table} ({cols}) SELECT {cols} FROM {tmp} "
        "ON DUPLICATE KEY UPDATE {updates_values}"
    ),
    # beyond-reference: standard SQL:2003 MERGE for engines without a
    # vendor upsert (Derby, DB2, Oracle, SQL Server, lakehouse SQL)
    "ansi": (
        "MERGE INTO {table} t USING {tmp} s ON ({on_clause}) "
        "WHEN MATCHED THEN UPDATE SET {merge_updates} "
        "WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({src_cols})"
    ),
}

_JDBC_DRIVERS = {"postgres": "org.postgresql.Driver", "mysql": "com.mysql.cj.jdbc.Driver"}
_QUOTE_CHARS = {"postgres": '"', "mysql": "`"}


def _quote_ident(name: str, dialect: str) -> str:
    """Quote a table/column identifier for driver-side SQL (the JDBC
    writer path quotes on its own; only the hand-built merge statement
    needs this). Doubles embedded quote chars per SQL escaping rules."""
    q = _QUOTE_CHARS.get(dialect, '"')
    return q + name.replace(q, q + q) + q


_PLAIN_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _table_ref(name: str, dialect: str) -> str:
    """Table reference for driver-side merge SQL. Spark's JDBC writer
    passes table names through UNQUOTED, so the database case-folds them
    (Derby/Oracle → upper, Postgres → lower); quoting here would make
    the merge look for a case-exact name that was never created. Plain
    identifiers therefore stay unquoted (fold-consistent with the
    writer); anything else is quoted (injection hardening for names that
    could not have been created unquoted anyway)."""
    return name if _PLAIN_IDENT.fullmatch(name) else _quote_ident(name, dialect)


def build_upsert_sql(
    dialect: str, table: str, tmp: str, cols: list[str], pk_cols: list[str]
) -> str:
    """Render the two-phase merge statement with quoted identifiers
    (parity semantics: ``loader/PostgresLoader.scala:170-174`` /
    ``loader/MySQLLoader.scala:169-173``, which interpolate unquoted —
    hardened here)."""
    template = _UPSERT_TEMPLATES.get(dialect)
    if template is None:
        raise ConfigError(f"upsert not supported for dialect '{dialect}'")
    qi = lambda n: _quote_ident(n, dialect)  # noqa: E731
    non_pk = [c for c in cols if c not in pk_cols]
    return template.format(
        table=_table_ref(table, dialect),
        tmp=_table_ref(tmp, dialect),
        cols=", ".join(qi(c) for c in cols),
        pk=", ".join(qi(c) for c in pk_cols),
        updates_excluded=", ".join(f"{qi(c)} = EXCLUDED.{qi(c)}" for c in non_pk),
        updates_values=", ".join(f"{qi(c)} = VALUES({qi(c)})" for c in non_pk),
        on_clause=" AND ".join(f"t.{qi(c)} = s.{qi(c)}" for c in pk_cols),
        merge_updates=", ".join(f"{qi(c)} = s.{qi(c)}" for c in non_pk),
        src_cols=", ".join(f"s.{qi(c)}" for c in cols),
    )


def load_jdbc(
    df: DataFrame,
    options: dict[str, str],
    write_mode: str = "append",
    dialect: str = "postgres",
    run_id: str | None = None,
) -> LoadResult:
    """JDBC write (parity: ``loader/PostgresLoader.scala:54-185``).

    ``append``/``overwrite`` are straight parallel JDBC writes with
    ``batchsize`` (default 1000). ``upsert`` is the reference's two-phase
    pattern: bulk-write a temp table in parallel from executors, then one
    driver-side ``INSERT … SELECT … ON CONFLICT/ON DUPLICATE KEY`` —
    set-based merge, never row-at-a-time from the driver. Unlike the
    reference (temp name from ``System.currentTimeMillis()``,
    ``loader/PostgresLoader.scala:152``) the temp-table name derives from
    ``run_id`` so retries are idempotent, and cleanup runs in a finally.
    """
    url = options.get("url")
    table = options.get("table") or options.get("dbtable")
    if not url or not table:
        raise ConfigError("jdbc sink requires 'url' and 'table'")
    user = options.get("user", "")
    password = options.get("password", "")
    driver = options.get("driver") or _JDBC_DRIVERS.get(dialect)
    batchsize = options.get("batchsize", "1000")

    def writer_for(target: str, mode: str, frame: DataFrame):
        w = (
            frame.write.format("jdbc")
            .option("url", url)
            .option("dbtable", target)
            .option("user", user)
            .option("password", password)
            .option("batchsize", batchsize)
            .mode(mode)
        )
        if driver:
            w = w.option("driver", driver)
        return w

    if write_mode in ("append", "overwrite"):
        out, obs = _observed(df)
        writer_for(table, write_mode, out).save()
        return LoadResult(
            records_written=int(obs.get["records_written"]),
            sink_type=dialect,
            write_mode=write_mode,
        )

    if write_mode != "upsert":
        raise ConfigError(f"jdbc sink supports append|overwrite|upsert, got '{write_mode}'")

    pk = options.get("primaryKey")
    if not pk:  # loader/PostgresLoader.scala:127-129
        raise ConfigError("jdbc upsert requires 'primaryKey'")
    pk_cols = [c.strip() for c in pk.split(",") if c.strip()]
    tmp = f"{table}_staging_{(run_id or uuid.uuid4().hex)[:8]}"
    merge_sql = build_upsert_sql(dialect, table, tmp, df.columns, pk_cols)

    out, obs = _observed(df)
    spark = df.sparkSession
    jvm = spark._sc._jvm  # driver-side JDBC for the merge statement only
    writer_for(tmp, "overwrite", out).save()
    # The staging table is a real (not TEMPORARY) table on purpose: the
    # parallel JDBC write uses one connection per executor task, and a
    # session-scoped TEMPORARY table would vanish per-connection. The
    # runId-derived name + the finally-drop below bound orphan risk.
    if driver:
        # the JDBC jar usually lives in Spark's mutable classloader, which
        # java.sql.DriverManager does not search — load the class
        # explicitly or getConnection throws 'No suitable driver'
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        stmt = conn.createStatement()
        stmt.execute(merge_sql)
        stmt.close()
    finally:
        try:
            stmt = conn.createStatement()
            if dialect in ("postgres", "mysql"):
                stmt.execute(f"DROP TABLE IF EXISTS {_table_ref(tmp, dialect)}")
            else:
                # ANSI/Derby has no IF EXISTS; a missing staging table is
                # not an error worth masking the merge result for
                try:
                    stmt.execute(f"DROP TABLE {_table_ref(tmp, dialect)}")
                except Exception:
                    pass
            stmt.close()
        finally:
            conn.close()
    return LoadResult(
        records_written=int(obs.get["records_written"]),
        sink_type=dialect,
        write_mode="upsert",
    )


class _BaseLoader:
    """Contract (parity: ``core/DataLoader.scala:28-32``)."""

    def validate(self, config: SinkConfig) -> ValidationResult:
        raise NotImplementedError

    def load(self, df: DataFrame, config: SinkConfig, run_id: str | None = None) -> LoadResult:
        self.validate(config).raise_if_invalid(f"{type(self).__name__} config")
        return self._write(df, config, run_id)

    def _write(self, df: DataFrame, config: SinkConfig, run_id: str | None) -> LoadResult:
        raise NotImplementedError


class FileLoader(_BaseLoader):
    """Parity: ``loader/S3Loader.scala:27-119``."""

    def validate(self, config: SinkConfig) -> ValidationResult:
        errors = []
        if not config.options.get("path"):
            errors.append("file sink requires 'path'")
        if config.write_mode not in ("append", "overwrite"):
            errors.append(f"file sink supports append|overwrite, got {config.write_mode}")
        fmt = config.options.get("format", "parquet").lower()
        if fmt not in _FILE_FORMATS:
            errors.append(f"unsupported format: {fmt}")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _write(self, df, config, run_id):
        return load_file(df, config.options, config.write_mode, config.partition_by)


class JdbcLoader(_BaseLoader):
    """Parity: ``loader/PostgresLoader.scala`` / ``loader/MySQLLoader.scala``."""

    def __init__(self, dialect: str):
        self.dialect = dialect

    def validate(self, config: SinkConfig) -> ValidationResult:
        errors = []
        if not config.options.get("url", "").startswith("jdbc:"):
            errors.append("jdbc sink requires a 'jdbc:' url")
        if not (config.options.get("table") or config.options.get("dbtable")):
            errors.append("jdbc sink requires 'table'")
        if config.write_mode == "upsert" and not config.options.get("primaryKey"):
            errors.append("upsert requires 'primaryKey'")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _write(self, df, config, run_id):
        return load_jdbc(df, config.options, config.write_mode, self.dialect, run_id)


class KafkaLoader(_BaseLoader):
    """Parity: ``loader/KafkaLoader.scala:26-98``."""

    def validate(self, config: SinkConfig) -> ValidationResult:
        errors = []
        if not (
            config.options.get("bootstrap.servers")
            or config.options.get("kafka.bootstrap.servers")
        ):
            errors.append("kafka sink requires 'bootstrap.servers'")
        if not config.options.get("topic"):
            errors.append("kafka sink requires 'topic'")
        if config.write_mode not in ("append", "overwrite"):
            errors.append("kafka sink supports append|overwrite")
        return ValidationResult.ok() if not errors else ValidationResult.fail(*errors)

    def _write(self, df, config, run_id):
        return load_kafka(df, config.options, config.write_mode)
