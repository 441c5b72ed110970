"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf dir; compare row count, schema (names+types), and an
order-insensitive value hash. Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(lambda v: repr(v))
    rows = sorted(tuple(r) for r in pdf.itertuples(index=False, name=None))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def canon_dtype(s: pd.Series) -> str:
    import numpy as np

    d = str(s.dtype)
    return {"int32": "i32", "Int32": "i32", "int64": "i64", "Int64": "i64",
            "float64": "f64", "float32": "f32", "object": "obj", "bool": "bool",
            "boolean": "bool"}.get(d, d)


def main(sf_dir: str, only: str | None = None) -> int:
    from arxiv_crawler_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    if only:
        pats = [p.strip() for p in only.split(",") if p.strip()]
        qs = {n: f for n, f in qs.items() if any(n.startswith(p) for p in pats)}
    failures = []
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc()
            failures.append(name)
            continue
        dt = time.monotonic() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            if len(got) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            want = con.sql(sqls[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised")
            traceback.print_exc()
            failures.append(name)
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        gs = {c: canon_dtype(got[c]) for c in sorted(got.columns)}
        ws = {c: canon_dtype(want[c]) for c in sorted(want.columns)}
        if gs != ws:
            problems.append(f"schema {gs} != {ws}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value-hash mismatch")
            merged = got.merge(want, how="outer", indicator=True,
                               on=list(sorted(got.columns)))
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(got)} rows match ({dt:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else None))
