#!/usr/bin/env python
"""Driver-style verification: every declared query vs its DuckDB oracle at
sf0.01 (row count + sorted-column schema + rounded-value hash), plus the
rows-only queries and entry() smoke. Mirrors the grading driver's
canonicalization: df[sorted(cols)].sort_values(all cols), floats rounded.

Usage: python BENCH/r06/verify_oracle.py [name,...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(6)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    import __spark_entry__ as em
    from networkx_graph_spark.session import get_spark

    SF = "/root/testdata/sf0.01"
    subset = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    spark = get_spark(app_name="verify-r06", master="local[8]", shuffle_partitions=8)
    qs = em.queries()
    oracles = em.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    results = {}
    for name, fn in qs.items():
        if subset and name not in subset:
            continue
        try:
            sdf = canon(fn(spark, SF).toPandas())
            if name in oracles:
                odf = canon(con.execute(oracles[name]).df())
                rows = len(sdf) == len(odf)
                schema = list(sdf.columns) == list(odf.columns)
                if rows and schema and len(sdf):
                    a = sdf.astype(str).values.tolist()
                    b = odf.astype(str).values.tolist()
                    vals = a == b
                else:
                    vals = rows and schema
                results[name] = {"rows": rows, "schema": schema, "values": vals,
                                 "n": len(sdf), "err": None}
            else:
                results[name] = {"rows": True, "schema": True, "values": None,
                                 "n": len(sdf), "err": None, "rows_only": True}
        except Exception as exc:
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        r = results[name]
        ok = r.get("err") is None and r.get("rows") and r.get("schema") and (
            r.get("values") is not False
        )
        print(f"{'PASS' if ok else 'FAIL'} {name} {r}", file=sys.stderr)
    # entry() smoke
    try:
        n = em.entry(spark).count()
        results["_entry"] = {"rows": int(n), "err": None}
        print(f"PASS _entry rows={n}", file=sys.stderr)
    except Exception as exc:
        results["_entry"] = {"err": str(exc)[:300]}
        print(f"FAIL _entry {exc}", file=sys.stderr)
    bad = [k for k, r in results.items()
           if r.get("err") is not None
           or r.get("rows") is False or r.get("schema") is False
           or r.get("values") is False]
    print(json.dumps({"n_checked": len(results), "failures": bad}))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
