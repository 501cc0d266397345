#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: tools/check.py <verify_out_dir> <sf_dir>

For each query dir under <verify_out_dir>: load the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB against the sf
parquet tables, sort columns by name, sort rows, and compare values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    errs_path = f"{out_dir}/verify_errors.json"
    if os.path.exists(errs_path):
        for name, msg in json.load(open(errs_path)).items():
            print(f"VERIFY-ERROR {name}: {msg[:120]}")
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"EMPTY-OUTPUT {name}")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            print(f"NO-ORACLE    {name} rows={len(got)} (rows-only check)")
            n_noracle += 1
            continue
        try:
            res = con.sql(oracle[name])
            # HUGEINT/DECIMAL oracle outputs convert differently across
            # duckdb client versions (round-2 q66/q81/q99 driver-gate
            # failure mode): flag them HERE so the local replica catches
            # what the lenient dtype coercion below would mask.
            # res.types is metadata-only — it does not execute the query.
            bad = [c for c, t in zip(res.columns, res.types)
                   if str(t) in ("HUGEINT", "UHUGEINT")
                   or str(t).startswith("DECIMAL")]
            if bad:
                print(f"PORTABILITY  {name}: HUGEINT/DECIMAL output cols "
                      f"{bad} — CAST to BIGINT/DOUBLE in the oracle")
                n_fail += 1
                continue
            exp = res.df()
        except Exception as e:
            print(f"ORACLE-ERR   {name}: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"COLS-DIFF    {name}: spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"ROWS-DIFF    {name}: spark={len(g)} oracle={len(e)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            a, b = g[c], e[c]
            if a.dtype != b.dtype:
                try:
                    b = b.astype(a.dtype)
                except Exception:
                    print(f"DTYPE-DIFF   {name}.{c}: {a.dtype} vs {e[c].dtype}")
                    ok = False
                    continue
            if pd.api.types.is_float_dtype(a):
                same = (a.isna() == b.isna()) & (a.fillna(0) == b.fillna(0))
                if not same.all():
                    mx = (a.fillna(0) - b.fillna(0)).abs().max()
                    print(f"VAL-DIFF     {name}.{c}: max abs diff {mx} (exact compare)")
                    ok = False
            else:
                same = a.fillna("\x00") if a.dtype == object else a
                sb = b.fillna("\x00") if b.dtype == object else b
                if not (same.values == sb.values).all() and not a.equals(b):
                    idx = np.nonzero(~(a.values == b.values))[0][:3]
                    print(f"VAL-DIFF     {name}.{c}: first diffs at rows {idx}: "
                          f"{[(a.iloc[i], b.iloc[i]) for i in idx]}")
                    ok = False
        if ok:
            print(f"PASS         {name} rows={len(g)}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
