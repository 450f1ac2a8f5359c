"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB (row count +
column names + order-insensitive value comparison)."""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TESTDATA = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm_cell(v):
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    return v


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(str(norm_cell(r[i])) for i in order) for r in rows
    )
    return out


def main(only: list[str] | None = None):
    import __spark_entry__ as E
    from graphrag_litex_spark.session import get_spark

    spark = get_spark(cores=16, extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{TESTDATA}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, TESTDATA)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}", flush=True)
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({dt:.1f}s) [rows-only]", flush=True)
            if len(rows) == 0 and name not in ("dedup_exact", "dedup_normalized"):
                print(f"WARN  {name}: zero rows", flush=True)
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {ex}", flush=True)
            failures.append(name)
            continue
        ok_schema = sorted(c.lower() for c in cols) == sorted(c.lower() for c in ocols)
        ok_count = len(rows) == len(orows)
        ok_vals = ok_schema and ok_count and frame_key(cols, rows) == frame_key(ocols, orows)
        status = "OK   " if (ok_schema and ok_count and ok_vals) else "FAIL "
        print(
            f"{status}{name}: spark {len(rows)} rows, duckdb {len(orows)} rows, "
            f"schema={'ok' if ok_schema else f'{sorted(cols)} vs {sorted(ocols)}'}, "
            f"values={'ok' if ok_vals else 'MISMATCH'} ({dt:.1f}s)",
            flush=True,
        )
        if not (ok_schema and ok_count and ok_vals):
            failures.append(name)
            if ok_schema and ok_count:
                a = frame_key(cols, rows)
                b = frame_key(ocols, orows)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"      spark={x}\n      duck ={y}", flush=True)
    print("\nFAILURES:", failures if failures else "none", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
