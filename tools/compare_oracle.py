"""Dev harness mirroring the driver's correctness gate.

Runs each ``queries()`` entry and its ``oracle_sql()`` twin side by side
over an sf dir, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns). Usage:

    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.md5()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.fillna("\x00null").astype(str)
        else:
            vals = s.astype(str)
        h.update(("%s=%s" % (col, "|".join(vals))).encode())
    return h.hexdigest()


def run(sf_dir: str, only: list[str]) -> int:
    import os

    os.environ["GRAFT_ORACLE_SF"] = sf_dir
    sys.path.insert(0, ".")
    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
            # rows-only queries (no oracle twin) mirror the driver's weaker
            # check: count rows, never canon (vector columns don't sort)
            if name in sqls:
                mine = canon(mine)
        except Exception as e:
            print(f"[FAIL-run ] {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(mine)} rows")
            continue
        try:
            theirs = canon(con.sql(sqls[name]).df())
        except Exception as e:
            print(f"[FAIL-sql ] {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = list(mine.columns) == list(theirs.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(theirs)
        status = "OK        " if (ok_rows and ok_cols and ok_hash) else "MISMATCH  "
        print(f"[{status}] {name}: rows {len(mine)}/{len(theirs)} cols_ok={ok_cols} hash_ok={ok_hash}")
        if not (ok_rows and ok_cols and ok_hash):
            failures += 1
            print("  mine cols:", list(mine.columns), "dtypes:", [str(d) for d in mine.dtypes])
            print("  orcl cols:", list(theirs.columns), "dtypes:", [str(d) for d in theirs.dtypes])
            if ok_cols and ok_rows:
                for col in mine.columns:
                    a, b = mine[col], theirs[col]
                    try:
                        neq = (a.astype(str) != b.astype(str)).sum()
                    except Exception:
                        neq = "?"
                    if neq:
                        print(f"    col {col}: {neq} diffs; mine head {a.head(3).tolist()} orcl {b.head(3).tolist()}")
            else:
                print("  mine head:\n", mine.head(5))
                print("  orcl head:\n", theirs.head(5))
    return failures


if __name__ == "__main__":
    import ray

    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.001"
    only = [a for a in args if not a.startswith("/")]
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from cartography_ray.runtime import configure

    configure()
    rc = run(sf_dir, only)
    ray.shutdown()
    sys.exit(1 if rc else 0)
