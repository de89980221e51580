"""JDBC (PostgreSQL) source & sinks (SURVEY.md §2.1 S6-S8).

Reference parity:
  * append sink (calculate_daily_transactions.py:65-78) — defect D2: append
    into a table whose PK is ``transaction_date`` fails on retry. Fixed
    here with :func:`write_jdbc_upsert` (delete-then-append per key window,
    one transaction).
  * overwrite sink (calculate_top_taxi_zones.py:42-55) — Spark's plain
    overwrite drops the table and loses the DDL's types/PK; fixed with
    ``truncate=true`` so the DDL survives.
  * connection info came from Airflow's metadata DB via BaseHook
    (calculate_daily_transactions.py:67-69) — a hidden orchestration
    coupling. Replaced by an explicit :class:`JdbcConfig` (env/URI built).

Scale notes: ``numPartitions`` caps concurrent connections on the write
path (1000 executors must not open 1000 sessions against one Postgres);
``batchsize`` amortizes round-trips; reads partition on a numeric column to
parallelize the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcConfig:
    """Explicit JDBC connection config (replaces Airflow BaseHook lookup)."""

    url: str  # e.g. jdbc:postgresql://host:5432/db
    user: str = ""
    password: str = ""
    driver: str = "org.postgresql.Driver"
    #: max concurrent connections for reads/writes
    num_partitions: int = 8
    #: rows per INSERT batch on the write path
    batch_size: int = 10_000
    extra: dict = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "batchsize": str(self.batch_size),
        }
        opts.update({k: str(v) for k, v in self.extra.items()})
        return opts


def read_jdbc(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Read a table (or ``(subquery) q`` alias) over JDBC.

    With ``partition_column`` + bounds, the scan splits into
    ``cfg.num_partitions`` range predicates executed concurrently —
    without them JDBC reads are single-threaded.
    """
    reader = spark.read.format("jdbc").options(dbtable=table, **cfg.options())
    if partition_column is not None:
        reader = reader.options(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(cfg.num_partitions),
        )
    return reader.load()


def _writer(df: DataFrame, cfg: JdbcConfig, table: str):
    # Cap write concurrency so a wide cluster can't stampede the database.
    # coalesce is a plan-only cap: a no-op when the frame already has
    # at-or-below this many partitions (no RDD materialization to check).
    df = df.coalesce(cfg.num_partitions)
    return df.write.format("jdbc").options(dbtable=table, **cfg.options())


def write_jdbc_append(df: DataFrame, cfg: JdbcConfig, table: str) -> None:
    """S6: plain append (reference job-1 mode; non-idempotent — prefer upsert)."""
    _writer(df, cfg, table).mode("append").save()


def write_jdbc_overwrite(df: DataFrame, cfg: JdbcConfig, table: str, truncate: bool = True) -> None:
    """S7: overwrite. ``truncate=True`` TRUNCATEs instead of DROP+CREATE so
    the out-of-band DDL (types, PK) survives — divergence from the
    reference's drop-recreate, documented in SURVEY.md §7.4."""
    _writer(df, cfg, table).option("truncate", str(truncate).lower()).mode("overwrite").save()


def delete_where_sql(table: str, predicate: str) -> str:
    """SQL for the delete phase of an upsert (exposed for tests)."""
    return f"DELETE FROM {table} WHERE {predicate}"


def execute_statement(spark: SparkSession, cfg: JdbcConfig, sql: str) -> None:
    """Run one DDL/DML statement on the target database via the JVM driver.

    Uses java.sql.DriverManager through the Py4J gateway — no extra Python
    DB client needed; the JDBC driver jar is already on the Spark classpath
    for the read/write paths.
    """
    jvm = spark._jvm  # noqa: SLF001 — sanctioned Py4J escape hatch
    jvm.java.lang.Class.forName(cfg.driver)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def execute_statements_txn(
    spark: SparkSession, cfg: JdbcConfig, sqls: list[str]
) -> None:
    """Run several DML statements as ONE transaction (autocommit off,
    explicit commit; rollback on any failure). This is what makes the
    staged upsert's DELETE+INSERT atomic: a crash between the two can no
    longer leave the key window deleted-but-not-reinserted until a replay
    heals it, and a reader never observes the half-applied state."""
    jvm = spark._jvm  # noqa: SLF001 — sanctioned Py4J escape hatch
    jvm.java.lang.Class.forName(cfg.driver)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
    try:
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        try:
            for sql in sqls:
                stmt.execute(sql)
            conn.commit()
        except Exception:
            try:
                conn.rollback()
            except Exception:
                pass  # original failure is the one to surface
            raise
        finally:
            stmt.close()
    finally:
        conn.close()


def write_jdbc_upsert(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    key_predicate: str,
) -> None:
    """Idempotent keyed write: DELETE the key window, then append (D2 fix).

    ``key_predicate`` scopes the rows this run owns, e.g.
    ``"transaction_date = DATE '2024-06-01'"``. Retries converge to the
    same final state instead of violating the primary key the way the
    reference's bare append does (daily_transactions_dag.py:37 +
    calculate_daily_transactions.py:77).
    """
    execute_statement(df.sparkSession, cfg, delete_where_sql(table, key_predicate))
    write_jdbc_append(df, cfg, table)


#: Above this many distinct keys in one keyed write, prefer the staged
#: upsert over an O(keys) literal predicate (a 10^5-key batch would
#: otherwise build a multi-megabyte WHERE clause on the driver and make
#: the database parse it).
DEFAULT_STAGING_KEY_THRESHOLD = 1000


def staged_upsert_sqls(
    table: str, stage: str, key_cols: list[str], cols: list[str]
) -> list[str]:
    """The staged upsert's DELETE+INSERT statement pair (one transaction
    via :func:`execute_statements_txn`). Exposed so the dialect tests
    can run the EXACT statements against real engines (Derby in
    tests/test_jdbc_e2e.py; real Postgres in tests/test_postgres_real.py
    when the server binaries are present). Key match is null-safe."""
    match = " AND ".join(
        f'({table}."{c}" = s."{c}"'
        f' OR ({table}."{c}" IS NULL AND s."{c}" IS NULL))'
        for c in key_cols
    )
    collist = ", ".join(f'"{c}"' for c in cols)
    return [
        f"DELETE FROM {table} WHERE EXISTS"
        f" (SELECT 1 FROM {stage} s WHERE {match})",
        f"INSERT INTO {table} ({collist}) SELECT {collist} FROM {stage}",
    ]


#: Width for string KEY columns on the staging table. Spark's Derby
#: dialect maps StringType to CLOB and Derby rejects ``=`` comparisons on
#: CLOB, so the DELETE..WHERE EXISTS key match would throw; pinning the
#: staging key columns to VARCHAR fixes that on Derby and is a no-op
#: semantically on Postgres. Key values longer than this are rejected at
#: write time by the database rather than silently truncated.
DEFAULT_STRING_KEY_WIDTH = 4096


def write_jdbc_upsert_staged(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    key_cols: list[str],
    stage_table: str | None = None,
    batch_id: int | None = None,
    string_key_width: int = DEFAULT_STRING_KEY_WIDTH,
) -> None:
    """Many-key idempotent upsert: write ``df`` to a staging table, then
    one set-based ``DELETE ... WHERE EXISTS`` + ``INSERT ... SELECT`` —
    two constant-size statements regardless of key count, with the row
    data flowing executor→database through Spark's parallel JDBC writer
    instead of a literal SQL string built on the driver.

    ``WHERE EXISTS`` (not Postgres-only ``DELETE ... USING``) keeps the
    statement portable across Derby and Postgres; the key match is
    null-safe, and string key columns are pinned to
    ``VARCHAR(string_key_width)`` on the staging write (Derby's default
    StringType mapping is CLOB, which its ``=`` operator rejects).
    DELETE and INSERT run in ONE transaction
    (:func:`execute_statements_txn`), so no reader or crash window ever
    sees the key window deleted without its replacement rows.

    The staging name must be unique per writer: by default a random
    suffix (collision-free); with ``batch_id`` a replay-stable
    ``{table}_stg_{batch_id}`` (a replayed batch reuses and overwrites
    ITS OWN stage) — but batch ids are only unique WITHIN one streaming
    query, so a caller running multiple writers against the same target
    must pass ``stage_table`` carrying a per-writer discriminator (the
    streaming sink derives one from its checkpoint location). The stage
    is dropped in ``finally``; a hard crash can orphan one, which is
    harmless (unique names never collide with a later run) but worth a
    periodic ``DROP`` sweep on long-lived targets.

    Replays converge exactly like :func:`write_jdbc_upsert`: the staging
    overwrite, delete, and insert are all idempotent per batch. Primary
    consumer: the streaming keyed sink
    (streaming/jdbc_sink.stream_upsert_jdbc) above its key threshold.
    """
    import uuid

    from pyspark.sql.types import StringType

    spark = df.sparkSession
    if stage_table is not None:
        stage = stage_table
    elif batch_id is not None:
        stage = f"{table}_stg_{batch_id:x}"
    else:
        stage = f"{table}_stg_{uuid.uuid4().hex[:10]}"
    writer = df.coalesce(cfg.num_partitions).write.format("jdbc").options(
        dbtable=stage, **cfg.options()
    )
    string_keys = [
        f.name
        for f in df.schema.fields
        if f.name in key_cols and isinstance(f.dataType, StringType)
    ]
    if string_keys:
        # Parsed by Spark's DDL parser — backtick-quote the identifiers.
        writer = writer.option(
            "createTableColumnTypes",
            ", ".join(
                f"`{c}` VARCHAR({string_key_width})" for c in string_keys
            ),
        )
    # mode=overwrite drops and recreates the staging table from the
    # frame's schema — also what makes a replayed batch start clean.
    writer.mode("overwrite").save()
    try:
        execute_statements_txn(
            spark,
            cfg,
            staged_upsert_sqls(table, stage, key_cols, df.columns),
        )
    finally:
        try:
            execute_statement(spark, cfg, f"DROP TABLE {stage}")
        except Exception:
            pass  # orphaned stage is unique-named; never collides later


def upsert_sql_postgres(
    table: str, key_cols: list[str], cols: list[str]
) -> str:
    """PostgreSQL-dialect single-statement upsert template:
    ``INSERT ... ON CONFLICT (keys) DO UPDATE SET col = EXCLUDED.col``.

    The engine's default upsert (:func:`write_jdbc_upsert`) is the
    dialect-portable delete-then-append — proven e2e against embedded
    Derby in tests/test_jdbc_e2e.py. Against Postgres ≥ 9.5 (the
    reference runs Postgres 13 — docker-compose.yml:17-30) this
    per-batch statement does the same idempotent write in one round trip
    per row batch with no delete window; pass it to a JDBC batch
    executor with positional parameters. Generated SQL is validated
    statement-level in tests/test_jdbc_dialect.py (PG-grammar engine)
    AND against a REAL PostgreSQL 15 server — actual ON CONFLICT
    update/no-op behavior, staged-upsert transaction atomicity, TRUNCATE
    PK survival, CAST literal round-trips — in
    tests/test_postgres_real.py (skips when server binaries are absent;
    the Spark JDBC WIRE path remains Derby-proven since no PG JDBC jar
    ships in the sandbox)."""
    if not key_cols or not cols:
        raise ValueError("key_cols and cols must be non-empty")
    missing = [k for k in key_cols if k not in cols]
    if missing:
        raise ValueError(f"key_cols not in cols: {missing}")
    collist = ", ".join(f'"{c}"' for c in cols)
    params = ", ".join("?" for _ in cols)
    keylist = ", ".join(f'"{k}"' for k in key_cols)
    updates = ", ".join(
        f'"{c}" = EXCLUDED."{c}"' for c in cols if c not in key_cols
    )
    action = f"DO UPDATE SET {updates}" if updates else "DO NOTHING"
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({params}) "
        f"ON CONFLICT ({keylist}) {action}"
    )


def create_table_sql(table: str, columns_ddl: str) -> str:
    """S8: CREATE TABLE IF NOT EXISTS (the reference runs this from Airflow;
    the engine can run it in-band via :func:`execute_statement`)."""
    return f"CREATE TABLE IF NOT EXISTS {table} ({columns_ddl})"


def table_exists(spark: SparkSession, cfg: JdbcConfig, table: str) -> bool:
    """Probe for a table with a zero-row SELECT (portable — information
    schema layouts differ per database; a failed prepare does not)."""
    try:
        execute_statement(spark, cfg, f"SELECT 1 FROM {table} WHERE 1=0")
        return True
    except Exception:
        return False


def ensure_table(
    spark: SparkSession, cfg: JdbcConfig, table: str, columns_ddl: str
) -> None:
    """Dialect-portable CREATE-IF-ABSENT: plain ``CREATE TABLE`` and, on
    failure, accept the state only if the table exists (``IF NOT EXISTS``
    is not universal — Derby, used by the in-sandbox e2e tests, lacks it).
    Quote column names in ``columns_ddl`` so case-sensitive dialects match
    Spark's quoted-identifier INSERTs."""
    try:
        execute_statement(spark, cfg, f"CREATE TABLE {table} ({columns_ddl})")
    except Exception:
        if not table_exists(spark, cfg, table):
            raise
