"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet fixtures, then compares row count, column names, and
an order-insensitive value multiset. Usage:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.10g}")  # tolerate last-ulp formatting noise only
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    return v


#: Spark simpleString -> acceptable DuckDB relation types. TIMESTAMP_NS
#: appears when nanos survive a passthrough; WITH TIME ZONE never should
#: (session is UTC-pinned NTZ end to end).
#: All plain integer widths hash as one family in the driver — proven by
#: corpus_top_ngrams' green r2/r3 rows with Spark int vs DuckDB BIGINT.
#: HUGEINT is NOT in the family (decimal128 on the Arrow wire — the r4
#: red-row class); neither are DECIMALs.
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_TYPE_MAP = {
    "bigint": _INTS,
    "int": _INTS,
    "smallint": _INTS,
    "tinyint": _INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP_NS"},
    "timestamp_ntz": {"TIMESTAMP", "TIMESTAMP_NS"},
    "boolean": {"BOOLEAN"},
}


def _types_compatible(spark_t: str, duck_t: str) -> bool:
    if spark_t.startswith("decimal"):
        return duck_t.replace(" ", "").upper() == spark_t.replace(
            "decimal", "DECIMAL"
        ).replace(" ", "")
    if spark_t.startswith("array<"):
        inner_s = spark_t[6:-1]
        if duck_t.endswith("[]"):
            return _types_compatible(inner_s, duck_t[:-2])
        return False
    allowed = _TYPE_MAP.get(spark_t)
    return duck_t in allowed if allowed is not None else True


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    import duckdb
    from etl_platform_nyc_taxi_spark.schema import FIXTURE_TABLES
    from etl_platform_nyc_taxi_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            otypes = [str(t) for t in rel.types]
            orows = [tuple(r) for r in rel.fetchall()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(exc).__name__}: {exc}")
            continue
        # Type lint: the driver's value hash is TYPED (Arrow-level), so a
        # DuckDB relation column promoted to HUGEINT (SUM over integers)
        # or any other width/kind mismatch vs the Spark schema
        # hash-mismatches even when every value is equal (the entire red
        # set of round 4 was SUM->HUGEINT). Python fetchall erases these
        # types, so without this lint the local gate passes where the
        # driver fails. The check is a full dtype-compatibility map, not
        # just the HUGEINT case — INTEGER-vs-BIGINT is the same class.
        spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        bad_types = []
        for c, t in zip(ocols, otypes):
            st = spark_types.get(c)
            if st is None:  # name mismatch reported separately below
                continue
            if not _types_compatible(st, t):
                bad_types.append((c, st, t))
        if bad_types:
            failures.append(name)
            print(
                f"FAIL  {name}: oracle type lint (spark vs duckdb): "
                f"{bad_types} — align with CASTs on whichever side is wrong"
            )
            continue
        sc, sm = df_multiset(scols, srows)
        oc, om = df_multiset(ocols, orows)
        dt = time.time() - t0
        if sc != oc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ spark={sc} duckdb={oc}")
        elif len(sm) != len(om):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sm)} duckdb={len(om)}")
        elif sm != om:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs: {diffs}")
        else:
            print(f"OK    {name}: {len(sm)} rows, {dt:.1f}s")
    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
