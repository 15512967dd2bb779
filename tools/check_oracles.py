"""Local emulation of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet dir; compare row count, column names, and order-insensitive
values. Usage: python tools/check_oracles.py [sf_dir] [name ...]"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry
from iresearch_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_rows(cols, rows):
    out = []
    for r in rows:
        vals = dict(zip(cols, r))
        out.append(tuple(vals[c] for c in sorted(cols)))
    return sorted(
        out,
        key=lambda t: tuple(
            (x is None, str(type(x)), x if not isinstance(x, float) else round(x, 9))
            for x in t
        ),
    )


def values_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for xa, xb in zip(ra, rb):
            if isinstance(xa, float) or isinstance(xb, float):
                if not (
                    (xa is None and xb is None)
                    or math.isclose(float(xa), float(xb), rel_tol=1e-9, abs_tol=1e-9)
                ):
                    return False
            elif xa != xb:
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.sql(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {e}")
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
        ok_vals = values_equal(a, b)
        status = "OK" if (ok_schema and ok_vals and len(srows) == len(drows)) else "MISMATCH"
        print(
            f"[{status}] {name}: spark={len(srows)} duck={len(drows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'}"
        )
        if status != "OK":
            failures.append((name, "mismatch"))
            for i, (ra, rb) in enumerate(zip(a, b)):
                if ra != rb and not values_equal([ra], [rb]):
                    print(f"   first diff row {i}: spark={ra} duck={rb}")
                    break
            if len(a) != len(b):
                sa, sb = set(map(str, a)), set(map(str, b))
                print(f"   only-spark: {list(sa - sb)[:2]}")
                print(f"   only-duck:  {list(sb - sa)[:2]}")
    print(f"\n{len(failures)} failures: {[f[0] for f in failures]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
