"""One-off replica of the driver's correctness gate at an arbitrary SF.

Runs every queries() entry against its oracle_sql() via DuckDB (row count,
sorted column names, order-insensitive normalized values) and prints one
line per query. Usage: python scripts/check_oracles.py [sf_dir]
"""

import math
import os
import sys
from datetime import datetime

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from frontier_engine.session import get_spark

    spark = get_spark("local[16]", app="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t)}.parquet'"
        )
    qs, oq = E.queries(), E.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        sql = oq.get(name)
        if sql is None:
            n = fn(spark, sf_dir).count()
            print(f"{name}: rows-only, {n} rows")
            continue
        df = fn(spark, sf_dir)
        cols = sorted(df.columns)
        s_rows = sorted(
            (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=repr
        )
        res = con.sql(sql)
        dcols = list(res.columns)
        order = sorted(range(len(dcols)), key=lambda i: dcols[i])
        d_rows = sorted(
            (tuple(_norm(row[i]) for i in order) for row in res.fetchall()),
            key=repr,
        )
        ok = cols == sorted(dcols) and s_rows == d_rows
        if not ok:
            bad += 1
            print(f"{name}: MISMATCH spark={len(s_rows)} duck={len(d_rows)} "
                  f"cols {cols} vs {sorted(dcols)}")
            for a, b in list(zip(s_rows, d_rows))[:3]:
                if a != b:
                    print("   spark:", a)
                    print("   duck :", b)
        else:
            print(f"{name}: OK ({len(s_rows)} rows)")
    print(f"\n{'ALL OK' if bad == 0 else f'{bad} MISMATCHES'} "
          f"({len(qs)} queries, sf_dir={sf_dir})")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
