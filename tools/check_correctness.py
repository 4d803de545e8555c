"""Local twin of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf dir, runs the
matching oracle_sql() in DuckDB over the same parquet views, and compares
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon_cell(v):
    import datetime as dt
    import math

    import numpy as np
    if v is None:
        return "NULL"
    # numpy scalars (from pandas .df() fetch) → python scalars, so the
    # oracle side canonicalizes identically to Spark's collect() output
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and fp noise; queries pre-round, this is a backstop
        r = round(v, 6)
        if r == 0:
            r = 0.0
        return repr(r)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return repr(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(canon_cell(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import os
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # kernel-derived VALUES oracles must be generated over the same sf rows
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import duckdb

    import __spark_entry__ as E
    from python_web_scraper_cleaner_spark.session import build_session

    spark = build_session(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            # fetch via Arrow like the driver does: DuckDB HUGEINT (bare
            # integer sum()) becomes decimal128 → python Decimal, which the
            # hasher renders differently from Spark's int — so dtype drift
            # that fails the driver's hash check fails locally too, while
            # NULL-bearing int columns stay ints (they pass the driver)
            tbl = con.execute(oracles[name]).arrow()
            dcols = tbl.column_names
            cols = [c.to_pylist() for c in tbl.columns]
            drows = list(zip(*cols)) if cols else []
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        if not problems:
            hs, hd = table_hash(srows, scols), table_hash(drows, dcols)
            if hs != hd:
                problems.append(f"value-hash {hs} != {hd}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            # show first diffs for debugging
            ss = sorted("\x1f".join(canon_cell(c) for c in r) for r in srows)
            dd = sorted("\x1f".join(canon_cell(c) for c in r) for r in drows)
            for a, b in list(zip(ss, dd))[:200]:
                if a != b:
                    print(f"  spark : {a[:200]}")
                    print(f"  duckdb: {b[:200]}")
                    break
        else:
            print(f"OK   {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    print("\n==", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
