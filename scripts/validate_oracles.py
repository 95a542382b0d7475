#!/usr/bin/env python
"""Side-by-side validation of queries() vs oracle_sql() — replicates the
driver's compare (rows, schema names, values after sorting columns by
name and rows by value) so new oracles can be proven locally before a
round runs.

Usage: python scripts/validate_oracles.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry
    from smart_ocr_spark.session import build_session

    spark = build_session("validate_oracles", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = dict(entry.queries())
    osql = dict(entry.oracle_sql())
    # overflow beyond the driver's 50-query cap: same compare, local gate
    qs.update(entry.extra_queries())
    osql.update(entry.extra_oracle_sql())
    keys = sys.argv[1:] or [k for k in qs if k in osql]
    failures = 0
    for k in keys:
        if k not in osql:
            print(f"{k}: NO ORACLE")
            continue
        try:
            sdf = qs[k](spark, SF_DIR).toPandas()
            odf = con.execute(osql[k]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{k}: ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        ok_rows = len(sdf) == len(odf)
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        ok_schema = s_cols == o_cols
        ok_vals = False
        if ok_rows and ok_schema:
            a = sdf[s_cols].sort_values(s_cols).reset_index(drop=True)
            b = odf[o_cols].sort_values(o_cols).reset_index(drop=True)
            b = b.astype(a.dtypes.to_dict(), errors="ignore")
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                detail = str(e).split("\n")[0]
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(
                f"{k}: FAIL rows {len(sdf)}/{len(odf)} "
                f"schema_match={ok_schema} vals={ok_vals}"
            )
            if not ok_schema:
                print(f"  spark cols: {s_cols}\n  oracle cols: {o_cols}")
            elif ok_rows and not ok_vals:
                print(f"  {detail}")
        else:
            print(f"{k}: OK ({len(sdf)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
