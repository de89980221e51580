"""Engine-generated SQL exercised against a REAL PostgreSQL server
(VERDICT r6 task 8). The sandbox ships the Postgres 15 server binaries
and psql but no JDBC jar and no Python driver, so the Spark JDBC WIRE
path stays Derby-proven (tests/test_jdbc_e2e.py); what a real Postgres
adds — and what these tests pin — is the DIALECT SEMANTICS the engine
generates for its reference-parity target (the reference's only sink is
Postgres 13, /root/reference/docker-compose.yml:13-30):

* ``ON CONFLICT`` upsert behavior (upsert_sql_postgres),
* the staged upsert's DELETE+INSERT transaction (staged_upsert_sqls via
  one BEGIN/COMMIT — convergence on replay, rollback on failure),
* ``TRUNCATE`` preserving DDL/PK (what write_jdbc_overwrite relies on),
* the portable CAST literal forms (streaming/jdbc_sink.sql_literal),
  including sub-second timestamp key equality.

The server runs as the ``postgres`` system user (initdb refuses root)
on a private unix socket under tmp — no network, no fixed port. All
tests skip cleanly when the binaries or the unprivileged user are
unavailable.
"""

from __future__ import annotations

import datetime as dt
import shutil
import subprocess
import uuid

import pytest

pytestmark = pytest.mark.skipif(
    not (shutil.which("initdb") and shutil.which("pg_ctl") and shutil.which("psql")),
    reason="PostgreSQL server binaries not installed",
)


@pytest.fixture(scope="module")
def pg():
    """Start a scratch Postgres on a private unix socket; yield a
    run(sql) -> stdout helper; stop and delete on teardown."""
    base = f"/tmp/pg_e2e_{uuid.uuid4().hex[:8]}"
    data = f"{base}/data"

    def as_pg(*args: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            ["runuser", "-u", "postgres", "--", *args],
            capture_output=True,
            text=True,
        )

    subprocess.run(["mkdir", "-p", base], check=True)
    subprocess.run(["chown", "postgres:postgres", base], check=True)
    r = as_pg("initdb", "-D", data, "-U", "pguser", "--auth=trust")
    if r.returncode != 0:
        pytest.skip(f"initdb unavailable here: {r.stderr.strip()[:200]}")
    r = as_pg(
        "pg_ctl", "-D", data,
        "-o", f"-k {base} -c listen_addresses=''",
        "-l", f"{base}/log", "start",
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr.strip()[:200]}")

    def run(sql: str, dbname: str = "postgres") -> str:
        p = subprocess.run(
            ["psql", "-h", base, "-U", "pguser", "-d", dbname,
             "-v", "ON_ERROR_STOP=1", "-X", "-qAt", "-c", sql],
            capture_output=True,
            text=True,
        )
        if p.returncode != 0:
            raise RuntimeError(p.stderr.strip())
        return p.stdout.strip()

    try:
        run("SELECT 1")
        yield run
    finally:
        as_pg("pg_ctl", "-D", data, "stop", "-m", "fast")
        subprocess.run(["rm", "-rf", base], check=False)


def test_on_conflict_upsert_semantics(pg):
    """upsert_sql_postgres's generated statement against real ON
    CONFLICT: insert, then conflicting re-insert takes DO UPDATE."""
    from etl_platform_nyc_taxi_spark.sources.jdbc import upsert_sql_postgres

    pg('CREATE TABLE daily ("transaction_date" DATE PRIMARY KEY, "total" BIGINT)')
    sql = upsert_sql_postgres("daily", ["transaction_date"], ["transaction_date", "total"])
    assert "ON CONFLICT" in sql and "EXCLUDED" in sql
    # the JDBC form carries ? placeholders; bind literals for psql
    first = sql.replace("?", "{}", 1).format("DATE '2024-06-01'").replace("?", "5")
    pg(first)
    replay = sql.replace("?", "{}", 1).format("DATE '2024-06-01'").replace("?", "9")
    pg(replay)  # same key: must UPDATE, not raise
    assert pg('SELECT "total" FROM daily') == "9"
    assert pg("SELECT count(*) FROM daily") == "1"


def test_on_conflict_key_only_do_nothing(pg):
    from etl_platform_nyc_taxi_spark.sources.jdbc import upsert_sql_postgres

    pg('CREATE TABLE keyonly ("k" INT PRIMARY KEY)')
    sql = upsert_sql_postgres("keyonly", ["k"], ["k"])
    assert sql.endswith("DO NOTHING")
    pg(sql.replace("?", "1"))
    pg(sql.replace("?", "1"))  # replay: silently keeps the row
    assert pg("SELECT count(*) FROM keyonly") == "1"


def test_staged_upsert_txn_converges_and_rolls_back(pg):
    """The exact statement pair write_jdbc_upsert_staged executes, run
    inside one transaction on real Postgres: replay converges; a
    failing INSERT rolls the DELETE back too (no half-applied state)."""
    from etl_platform_nyc_taxi_spark.sources.jdbc import staged_upsert_sqls

    pg('CREATE TABLE tgt ("k" INT PRIMARY KEY, "v" INT)')
    pg('CREATE TABLE stg ("k" INT, "v" INT)')
    pg("INSERT INTO stg VALUES (1, 10), (2, 20)")
    delete_sql, insert_sql = staged_upsert_sqls("tgt", "stg", ["k"], ["k", "v"])
    txn = f"BEGIN; {delete_sql}; {insert_sql}; COMMIT;"
    pg(txn)
    pg(txn)  # replay: delete-then-insert converges, no PK violation
    assert pg('SELECT count(*), sum("v") FROM tgt') == "2|30"

    # keyed update through the same pair
    pg("UPDATE stg SET \"v\" = 99 WHERE \"k\" = 1")
    pg(txn)
    assert pg('SELECT "v" FROM tgt WHERE "k" = 1') == "99"

    # atomicity: duplicate keys in the stage make the INSERT violate the
    # target PK — the whole transaction must roll back, leaving the
    # pre-existing rows (not a deleted key window)
    pg("INSERT INTO stg VALUES (1, 7)")  # stage now has k=1 twice
    with pytest.raises(RuntimeError):
        pg(txn)
    assert pg('SELECT "v" FROM tgt WHERE "k" = 1') == "99"
    assert pg("SELECT count(*) FROM tgt") == "2"


def test_staged_upsert_null_safe_key_match(pg):
    from etl_platform_nyc_taxi_spark.sources.jdbc import staged_upsert_sqls

    pg('CREATE TABLE ntgt ("k" INT, "v" INT)')
    pg('CREATE TABLE nstg ("k" INT, "v" INT)')
    pg("INSERT INTO nstg VALUES (NULL, 1), (7, 2)")
    d, i = staged_upsert_sqls("ntgt", "nstg", ["k"], ["k", "v"])
    pg(f"BEGIN; {d}; {i}; COMMIT;")
    pg(f"BEGIN; {d}; {i}; COMMIT;")  # replay: NULL key must match itself
    assert pg("SELECT count(*) FROM ntgt") == "2"


def test_truncate_preserves_pk(pg):
    """write_jdbc_overwrite(truncate=True) relies on TRUNCATE keeping
    the out-of-band DDL: the PK must still fire after a truncate."""
    pg('CREATE TABLE trunc_t ("k" INT PRIMARY KEY)')
    pg("INSERT INTO trunc_t VALUES (1)")
    pg("TRUNCATE TABLE trunc_t")
    pg("INSERT INTO trunc_t VALUES (2)")
    with pytest.raises(RuntimeError):
        pg("INSERT INTO trunc_t VALUES (2)")  # PK survived the truncate


def test_sql_literal_cast_forms_and_subsecond_keys(pg):
    """sql_literal's CAST literal forms parse on real Postgres, and a
    sub-second timestamp key round-trips exactly — the delete predicate
    of write_jdbc_upsert must hit the previously inserted row."""
    from etl_platform_nyc_taxi_spark.sources.jdbc import delete_where_sql
    from etl_platform_nyc_taxi_spark.streaming.jdbc_sink import (
        keys_predicate,
        sql_literal,
    )

    t = dt.datetime(2024, 6, 1, 12, 0, 0, 123456)
    assert sql_literal(dt.date(2024, 6, 1)) == "CAST('2024-06-01' AS DATE)"
    pg('CREATE TABLE tsk ("ts" TIMESTAMP, "v" INT)')
    pg(f"INSERT INTO tsk VALUES ({sql_literal(t)}, 1)")
    pred = keys_predicate([{"ts": t}], ["ts"])
    assert pg(f'SELECT count(*) FROM tsk WHERE {pred}') == "1"
    pg(delete_where_sql("tsk", pred))
    assert pg("SELECT count(*) FROM tsk") == "0"


def test_create_table_grammar(pg):
    from etl_platform_nyc_taxi_spark.sources.jdbc import create_table_sql

    pg(create_table_sql("ct", '"a" INT, "b" VARCHAR(16)'))
    pg(create_table_sql("ct", '"a" INT, "b" VARCHAR(16)'))  # IF NOT EXISTS
    assert pg("SELECT count(*) FROM ct") == "0"
