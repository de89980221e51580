"""Postgres-dialect validation of the generated upsert/DDL SQL
(VERDICT r2 task 7). No Postgres server exists in the sandbox, so the
statements are (a) string-asserted and (b) EXECUTED under DuckDB, whose
SQL grammar implements the same ``ON CONFLICT`` clause Postgres 9.5+
defines — a statement that parses and behaves idempotently there is the
strongest in-sandbox check available. The delete-then-append path is
separately e2e-proven against embedded Derby in tests/test_jdbc_e2e.py.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_platform_nyc_taxi_spark.sources.jdbc import (
    create_table_sql,
    delete_where_sql,
    upsert_sql_postgres,
)


def test_upsert_sql_shape():
    sql = upsert_sql_postgres(
        "daily_transactions",
        key_cols=["transaction_date"],
        cols=["transaction_date", "total_transactions"],
    )
    assert sql == (
        'INSERT INTO daily_transactions ("transaction_date", "total_transactions") '
        "VALUES (?, ?) "
        'ON CONFLICT ("transaction_date") '
        'DO UPDATE SET "total_transactions" = EXCLUDED."total_transactions"'
    )


def test_upsert_sql_all_key_cols_degrades_to_do_nothing():
    sql = upsert_sql_postgres("t", key_cols=["a", "b"], cols=["a", "b"])
    assert sql.endswith("DO NOTHING")


def test_upsert_sql_validates_inputs():
    with pytest.raises(ValueError):
        upsert_sql_postgres("t", key_cols=[], cols=["a"])
    with pytest.raises(ValueError):
        upsert_sql_postgres("t", key_cols=["k"], cols=["a"])


def test_generated_statements_execute_under_pg_grammar():
    """The reference's daily_transactions table (docker-compose.yml
    Postgres 13 + DDL): create, upsert twice with changed values, delete a
    key window — every statement the engine generates, run verbatim."""
    con = duckdb.connect()
    con.execute(
        create_table_sql(
            "daily_transactions",
            '"transaction_date" DATE PRIMARY KEY, "total_transactions" BIGINT',
        )
    )
    upsert = upsert_sql_postgres(
        "daily_transactions",
        key_cols=["transaction_date"],
        cols=["transaction_date", "total_transactions"],
    )
    con.execute(upsert, ["2024-06-01", 10])
    con.execute(upsert, ["2024-06-02", 20])
    # retry with a corrected count: must update, not violate the PK
    con.execute(upsert, ["2024-06-01", 11])
    got = con.execute(
        "SELECT * FROM daily_transactions ORDER BY transaction_date"
    ).fetchall()
    assert [(str(d), n) for d, n in got] == [
        ("2024-06-01", 11),
        ("2024-06-02", 20),
    ]
    con.execute(
        delete_where_sql("daily_transactions", "transaction_date = DATE '2024-06-01'")
    )
    assert con.execute("SELECT count(*) FROM daily_transactions").fetchone()[0] == 1
