"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query at sf0.01 against its DuckDB oracle and compare
row count, column names, and (order-insensitively) values.

Usage: python scripts/verify_correctness.py [query ...]
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_entry():
    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> dict:
    out = {"rows_match": len(sdf) == len(ddf)}
    out["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
    out["rows"] = [len(sdf), len(ddf)]
    if not (out["rows_match"] and out["schema_match"]):
        out["hash_match"] = False
        return out
    a, b = norm(sdf), norm(ddf)
    mismatches = {}
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float)
                bv = bv.astype(float)
                neq = ~((av == bv) | (av.isna() & bv.isna()))
                if neq.any():
                    mismatches[c] = {
                        "n": int(neq.sum()),
                        "max_abs": float((av[neq] - bv[neq]).abs().max()),
                        "example": [float(av[neq].iloc[0]), float(bv[neq].iloc[0])],
                    }
            else:
                av2 = av.astype(str).where(~av.isna(), "<NULL>")
                bv2 = bv.astype(str).where(~bv.isna(), "<NULL>")
                neq = av2 != bv2
                if neq.any():
                    mismatches[c] = {
                        "n": int(neq.sum()),
                        "example": [str(av2[neq].iloc[0]), str(bv2[neq].iloc[0])],
                    }
        except Exception as e:  # noqa: BLE001
            mismatches[c] = {"error": str(e)[:120]}
    out["hash_match"] = not mismatches
    if mismatches:
        out["mismatches"] = mismatches
    return out


def main():
    import os

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(__import__("os").environ.get("VC_MASTER","local[8]"))
        .config("spark.sql.shuffle.partitions", __import__("os").environ.get("VC_SHUFFLE","8"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    m = load_entry()
    qs, oq = m.queries(), m.oracle_sql()
    only = set(sys.argv[1:])
    results = {}
    n_pass = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = {"spark_error": str(e)[:300]}
            print(f"FAIL {name}: SPARK ERROR {str(e)[:200]}")
            continue
        if name not in oq:
            results[name] = {"rows": len(sdf), "rows_only": True}
            print(f"ok   {name}: rows-only ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            ddf = con.execute(oq[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"oracle_error": str(e)[:300]}
            print(f"FAIL {name}: ORACLE ERROR {str(e)[:200]}")
            continue
        r = compare(name, sdf, ddf)
        results[name] = r
        ok = r["rows_match"] and r["schema_match"] and r["hash_match"]
        n_pass += ok
        print(
            f"{'ok  ' if ok else 'FAIL'} {name}: rows={r['rows']} "
            f"schema={r['schema_match']} hash={r['hash_match']} [{time.time()-t0:.1f}s]"
        )
        if not ok and "mismatches" in r:
            print("     ", json.dumps(r["mismatches"])[:400])
    total = len(results)
    print(f"\n{n_pass}/{total} queries pass")
    with open("/tmp/verify_correctness.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    spark.stop()
    return 0 if n_pass == total else 1


if __name__ == "__main__":
    sys.exit(main())
