"""One-off replica of the driver's correctness gate at an arbitrary SF.

Runs every queries() entry against its oracle_sql() via DuckDB (row count,
sorted column names, order-insensitive normalized values) and prints one
line per query. Usage: python scripts/check_oracles.py [sf_dir]

Canonicalization deliberately mirrors the DRIVER's harness: results go
through pandas and are sorted with DataFrame.sort_values over every column.
pandas' lexsort factorizes each column, which raises
``TypeError: unhashable type`` on list/map-valued cells — so a query that
returns a raw ARRAY/MAP column FAILS HERE exactly like it fails on the
driver (round-2 lesson: the old tuple-sort-by-repr replica tolerated lists
and masked the `robots_parse` driver error).
"""

import math
import os
import sys
from datetime import datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    """Normalize one cell to a comparison-stable scalar. Lists/maps are
    returned as-is so the pandas sort below throws on them, like the
    driver."""
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            # None, not the string "nan": a str cell next to floats makes
            # sort_values throw, flagging a MATCHING query as ERR. This
            # collapses the NaN/NULL distinction — fine for this replica,
            # no registry query emits NaN (they'd be nondeterministic
            # hashes on the driver anyway)
            return None
        return round(f, 6)
    if isinstance(v, Decimal):
        return round(float(v), 6)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        t = pd.Timestamp(v)
        if t is pd.NaT:
            return None
        if t.tz is not None:
            t = t.tz_localize(None)
        return t.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, np.ndarray):
        return v.tolist()  # still unhashable -> sort throws, as intended
    return v


def canon(pdf):
    """Driver-style canonical form: columns sorted by name, cells
    normalized, rows sorted by pandas sort_values (raises TypeError on
    unhashable cells). Returns (sorted_cols, list-of-row-tuples)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols].copy()
    for c in cols:
        pdf[c] = pdf[c].map(_norm).astype(object)
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    return cols, rows


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
        try:
            cols, s_rows = canon(fn(spark, sf_dir).toPandas())
            dcols, d_rows = canon(con.sql(sql).df())
        except TypeError as e:  # driver-parity: unhashable cell type
            bad += 1
            print(f"{name}: ERR driver-unhashable output ({e})")
            continue
        ok = cols == dcols and s_rows == d_rows
        if not ok:
            bad += 1
            print(f"{name}: MISMATCH spark={len(s_rows)} duck={len(d_rows)} "
                  f"cols {cols} vs {dcols}")
            # first three DIFFERING pairs (filter before slicing — the
            # old [:3] slice usually showed nothing when the first
            # divergence sat past row 3)
            diff = [p for p in zip(s_rows, d_rows) if p[0] != p[1]][:3]
            for a, b in diff:
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
