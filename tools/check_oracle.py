"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9) + 0.0)  # + 0.0 collapses IEEE negative zero
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df_pandas[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from nhse_probabilistic_linkage_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {type(e).__name__}: {str(e)[:200]}"
            print(f"{name:35s} {results[name]}", flush=True)
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows)"
            print(f"{name:35s} {results[name]}  [{time.time()-t0:.1f}s]", flush=True)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"DUCKDB ERROR: {type(e).__name__}: {str(e)[:200]}"
            print(f"{name:35s} {results[name]}", flush=True)
            continue
        scols, srows = _canon(sdf)
        ocols, orows = _canon(odf)
        if scols != ocols:
            results[name] = f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ][:3]
            results[name] = f"VALUE MISMATCH ({len([1 for a,b in zip(srows,orows) if a!=b])} rows differ) e.g. {diff[:1]}"
        else:
            results[name] = f"OK ({len(srows)} rows)"
        print(f"{name:35s} {results[name]}  [{time.time()-t0:.1f}s]", flush=True)

    n_bad = sum(1 for v in results.values() if not v.startswith(("OK", "rows-only")))
    print(f"\n{len(results)} queries, {n_bad} failing")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
