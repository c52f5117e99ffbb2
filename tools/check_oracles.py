#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compare row count, column
names, and a value hash (columns sorted by name, rows sorted by all
columns, floats rounded).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(int(v))
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from colly_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = build_session("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_cols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(s_rows):7d}  (no oracle: rows-only)")
            continue
        d = con.execute(oracles[name])
        d_cols = [c[0] for c in d.description]
        d_rows = d.fetchall()
        ok_n = len(s_rows) == len(d_rows)
        ok_c = sorted(s_cols) == sorted(d_cols)
        ok_v = ok_n and ok_c and canon(s_rows, s_cols) == canon(d_rows, d_cols)
        status = "OK" if ok_v else "FAIL"
        print(
            f"{name:24s} rows={len(s_rows):7d}/{len(d_rows):7d} "
            f"cols={'=' if ok_c else f'{sorted(s_cols)} vs {sorted(d_cols)}'} "
            f"hash={'=' if ok_v else 'X'}  {status}"
        )
        if not ok_v:
            failures += 1
            if not ok_c:
                continue
            # show a tiny diff sample to debug value mismatches
            ss = set(canon([r], s_cols) for r in s_rows)
            dd = set(canon([r], d_cols) for r in d_rows)
            sonly = [r for r in s_rows if canon([r], s_cols) not in dd][:3]
            donly = [r for r in d_rows if canon([r], d_cols) not in ss][:3]
            print(f"   spark-only: {sonly}\n   duck-only : {donly}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
