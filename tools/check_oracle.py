#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables,
and compares: row count, schema (column names), and a hash of the
column-name-sorted, row-sorted values (floats rounded to 9 dp defensively).
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def frames_equal(got: pd.DataFrame, exp: pd.DataFrame) -> bool:
    """Tolerance compare: both sides already round floats to ~6 dp but may
    use different rounding modes on ties (Spark HALF_UP vs DuckDB) — exact
    hashing of rounded values is a latent flaky gate (ADVICE r1). Floats use
    np.isclose; everything else exact."""
    import numpy as np
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns) or len(g) != len(e):
        return False
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(e[c]):
            if not np.allclose(g[c].astype("float64"), e[c].astype("float64"),
                               rtol=1e-6, atol=1e-8, equal_nan=True):
                return False
        else:
            if not g[c].equals(e[c]):
                return False
    return True

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            print(f"  {name:>24}: NO-ORACLE rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"  {name:>24}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        rows_ok = len(got) == len(exp)
        cols_ok = sorted(got.columns) == sorted(exp.columns)
        hash_ok = cols_ok and rows_ok and frames_equal(got, exp)
        status = "PASS" if hash_ok else "FAIL"
        if hash_ok: n_pass += 1
        else: n_fail += 1
        print(f"  {name:>24}: {status} rows={len(got)}/{len(exp)} cols_ok={cols_ok}")
        if not hash_ok and rows_ok and cols_ok:
            g = got.reindex(sorted(got.columns), axis=1).sort_values(by=sorted(got.columns)).reset_index(drop=True)
            e = exp.reindex(sorted(exp.columns), axis=1).sort_values(by=sorted(exp.columns)).reset_index(drop=True)
            diff = (g != e)
            try:
                bad = diff.any(axis=1)
                print("    first diffs (got | exp):")
                print(pd.concat([g[bad].head(3), e[bad].head(3)], axis=1).to_string())
            except Exception:
                pass
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
