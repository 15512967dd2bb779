"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet
tables, compare row count, schema (column names sorted) and a
value hash. Usage:

    python scripts/check_oracle.py [entry ...]   # default: all
    SF_DIR=/root/testdata/sf0.01 python scripts/check_oracle.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in sorted(tuple(str(row[i]) for i in order) for row in rows):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as ent

    qs = ent.queries()
    os_ = ent.oracle_sql()
    names = sys.argv[1:] or list(qs)

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("check_oracle")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT IN queries()")
            failures += 1
            continue
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in os_:
            print(f"{name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        ores = con.execute(os_[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = _hash_rows(scols, srows) == _hash_rows(ocols, orows)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows {len(srows)}/{len(orows)} "
            f"schema={ok_schema} hash={ok_hash}"
        )
        if not ok_hash and ok_rows and ok_schema:
            sset = {tuple(str(v) for v in r) for r in srows}
            oset = {tuple(str(v) for v in r) for r in orows}
            for d in list(sset - oset)[:3]:
                print("  spark-only:", d)
            for d in list(oset - sset)[:3]:
                print("  oracle-only:", d)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
