"""Local replica of the driver's CORRECTNESS gate.

Runs every ``queries()`` entry at sf0.01 next to its ``oracle_sql()``
DuckDB twin and compares row count, column names, and values (columns
sorted by name, rows sorted, exact equality with a 1e-9 float
tolerance — slightly LOOSER than the driver's byte hash, so a pass
here is necessary-not-sufficient, but any mismatch is a guaranteed
driver failure).

Usage: PYTHONPATH=/root/repo python scripts/check_correctness.py [entry ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def eq(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


def main() -> None:
    only = set(sys.argv[1:])
    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CHECK_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF}/{t}.parquet'"
        )

    qs, osql = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {str(ex)[:160]}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"rows_only {name}: {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(osql[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = [tuple(r) for r in cur.fetchall()]
        except Exception as ex:
            print(f"FAIL {name}: oracle error {str(ex)[:160]}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, orr = canon(o_rows, o_cols)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} vs {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(orr)}")
            n_fail += 1
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(sr, orr)):
            if not all(eq(a, b) for a, b in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"pass {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
