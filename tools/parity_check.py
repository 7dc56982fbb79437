"""Local stand-in for the driver's correctness gate: run every registered
query on Spark and its DuckDB oracle side-by-side, compare row count, schema
shape, and order-insensitive values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from curator_spark import queries as q
from curator_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(v)  # full precision — parity must be exact
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=8)
    failures = []
    for name, fn in q.Q.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            continue
        sql = q.ORACLE.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            opdf = con.sql(sql).df()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"FAIL {name}: oracle error {str(ex)[:300]}")
            continue
        if sorted(spdf.columns) != sorted(opdf.columns):
            failures.append((name, f"columns {sorted(spdf.columns)} vs {sorted(opdf.columns)}"))
            print(f"FAIL {name}: column mismatch {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
            continue
        if len(spdf) != len(opdf):
            failures.append((name, f"rows {len(spdf)} vs {len(opdf)}"))
            print(f"FAIL {name}: row count {len(spdf)} vs {len(opdf)}")
            continue
        a, b = canon(spdf), canon(opdf)
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark : {a[bad]}")
            print(f"  oracle: {b[bad]}")
            continue
        # dtype fingerprint (informational — driver may compare schemas)
        sdt = {c: str(spdf[c].dtype) for c in spdf.columns}
        odt = {c: str(opdf[c].dtype) for c in opdf.columns}
        dtw = {c: (sdt[c], odt[c]) for c in sdt if sdt[c] != odt[c]}
        note = f" [dtype diff {dtw}]" if dtw else ""
        print(f"PASS {name}: {len(spdf)} rows{note}")
    spark.stop()
    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
