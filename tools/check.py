#!/usr/bin/env python3
"""Local differential harness mirroring the driver's t2 gate:
run DuckDB on oracle_sql.json against the same parquet tables and compare
with the Spark parquet dumps produced by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, glob, json
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object and s.dropna().size and isinstance(s.dropna().iloc[0], (pd.Timestamp, __import__("datetime").date)):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_float_dtype(s):
            # width (f32 vs f64) is normalized; CLASS drift (int vs float)
            # is deliberately NOT — the dtype gate below must catch it
            df[c] = s.astype("float64")
        elif s.dtype == object and s.dropna().size and isinstance(s.dropna().iloc[0], (list, np.ndarray)):
            df[c] = s.map(lambda v: tuple(v.tolist() if isinstance(v, np.ndarray) else v) if v is not None else None)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        # Dtype-strict gate (mirrors the driver's type-sensitive hash): a
        # DuckDB HUGEINT/float widening vs Spark BIGINT is a FAIL even when
        # every value matches — this is the class that shipped the r5
        # pack_sequences false green under the old float-coercing compare.
        mism = [c for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
        if mism:
            print(f"FAIL {name}: dtype mismatch " + ", ".join(
                f"{c} spark={a[c].dtype} duck={b[c].dtype}" for c in mism))
            n_fail += 1
            continue
        bad = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av):
                av = av.astype(float); bv = bv.astype(float)
                eq = (av.values == bv.values) | (np.isnan(av.values) & np.isnan(bv.values))
                if not eq.all():
                    i = int(np.argmin(eq))
                    d = np.nanmax(np.abs(av.values - bv.values))
                    bad.append(f"{c}: row {i} spark={av.iloc[i]!r} duck={bv.iloc[i]!r} maxdiff={d:g} n={int((~eq).sum())}")
            else:
                eq = (av.values == bv.values) | (pd.isna(av).values & pd.isna(bv).values)
                if not np.asarray(eq).all():
                    i = int(np.argmin(np.asarray(eq)))
                    bad.append(f"{c}: row {i} spark={av.iloc[i]!r} duck={bv.iloc[i]!r} n={int((~np.asarray(eq)).sum())}")
        if bad:
            print(f"FAIL {name}: " + " | ".join(bad))
            n_fail += 1
        else:
            n_ok += 1
            print(f"ok   {name} ({len(a)} rows)")
    # queries with no oracle: report row presence
    declared = set(os.listdir(outdir)) - {"oracle_sql.json"}
    for name in sorted(declared - set(oracle)):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files) if files else 0
        print(f"noor {name}: rows={rows}")
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
