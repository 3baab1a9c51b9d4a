"""Per-query driver-contract check: run named queries() entries at
sf0.01 against their oracle_sql() twins in DuckDB (the verify skill's
compare, scoped to the names given on argv — all queries if none).

Usage: python scripts/quick_verify.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb

    import __spark_entry__ as m
    from splade_spark.session import get_spark

    spark = get_spark(app="quick-verify", cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, osql = m.queries(), m.oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    failed = []
    for name in names:
        sp = qs[name](spark, SF_DIR).toPandas()
        spark.catalog.clearCache()
        if name not in osql:
            print(f"{name}: rows-only ({len(sp)})")
            continue
        od = con.sql(osql[name]).df()
        cols = sorted(sp.columns)
        ocols = sorted(od.columns)
        if cols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
            failed.append(name)
            continue
        a = sp[cols].round(6).sort_values(cols).reset_index(drop=True)
        try:
            b = (
                od[cols]
                .astype(dict(a.dtypes))
                .round(6)
                .sort_values(cols)
                .reset_index(drop=True)
            )
        except (TypeError, ValueError) as exc:
            print(f"{name}: CAST FAIL {exc}")
            failed.append(name)
            continue
        ok = a.equals(b)
        print(f"{name}: {len(a)} vs {len(b)} {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            failed.append(name)
            if len(a) == len(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                bad = diff.any(axis=1)
                print("  first diffs (spark | oracle):")
                print(a[bad].head(3))
                print(b[bad].head(3))
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
