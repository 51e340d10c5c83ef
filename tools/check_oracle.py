"""Driver-mimic harness: run every queries() entry against its DuckDB oracle.

Usage: python tools/check_oracle.py [sf_dir] [name ...]

Mirrors the driver's comparison: row count, column names (sorted), and an
order-insensitive value comparison (rows sorted after stringifying values
with float rounding).
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 9):.9f}"
    if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
        return f"{float(v):.9f}"
    return str(v)


def df_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from jcpg_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    # FOLDED_REGISTRY entries are outside the driver's window but keep the
    # same oracle contract — cover them here too (they previously slipped
    # through silently: a requested folded name just never ran and the
    # harness printed ALL OK).
    from jcpg_spark.plans.driver_queries import FOLDED_REGISTRY

    for name, (fn, sql) in FOLDED_REGISTRY.items():
        qs[name] = fn
        if sql is not None:
            oracles[name] = sql
    unknown = [n for n in (only or []) if n not in qs]
    if unknown:
        print(f"FATAL: unknown entry names {unknown}")
        sys.exit(2)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        # The driver's canonicalizer (pandas sort_values over all columns)
        # crashes on array/map/struct cells — reject them here so the mimic
        # can't pass what the real harness would error on (CORRECTNESS_r01
        # a1/a2 regression class).
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols and name in oracles:
            failures.append(name)
            print(
                f"FAIL {name}: array/map/struct output columns {complex_cols} — "
                "driver canonicalizer cannot hash these; serialize to string "
                "(concat_ws/sort_array <-> array_to_string/list_sort)"
            )
            continue
        if complex_cols:
            print(f"warn {name}: rows-only entry has complex columns {complex_cols}")
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            continue
        a, b = df_rows(scols, srows), df_rows(dcols, drows)
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(a)} duckdb={len(b)}")
            continue
        if a != b:
            failures.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"OK   {name}: {len(a)} rows match")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
