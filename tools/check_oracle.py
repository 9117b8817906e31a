#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [--budget SECS] [--report-times]

Reads each <out_dir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables,
and compares: row count, schema (column names), and a hash of the
column-name-sorted, row-sorted values (floats rounded to 9 dp defensively).

Every oracle runs under a per-query time budget (default 120 s) in a
separate process: one pathological SQL must never hang the whole gate (the
r4 MST recursive-CTE oracle spun 32 cores for >25 min and zeroed the
round's CORRECTNESS artifact). A busted budget is a FAIL for that query;
the rest of the gate still runs. --report-times prints the slowest oracles
at the end so expensive tails are visible before they become outages.
"""
import sys, os, json, hashlib, time
import multiprocessing as mp
import duckdb
import pandas as pd


def _run_oracle(sf_dir, sql, q):
    """Child process: evaluate one oracle and ship the frame back."""
    try:
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        q.put(("ok", con.execute(sql).df()))
    except Exception as e:
        q.put(("err", str(e)))


def run_with_budget(sf_dir, sql, budget_s):
    """Returns ("ok", df) | ("err", msg) | ("timeout", budget_s)."""
    q = mp.Queue()
    proc = mp.Process(target=_run_oracle, args=(sf_dir, sql, q), daemon=True)
    proc.start()
    try:
        return q.get(timeout=budget_s)
    except Exception:
        proc.terminate()
        proc.join(5)
        if proc.is_alive():
            proc.kill()
        return ("timeout", budget_s)
    finally:
        if proc.is_alive():
            proc.join(1)

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

def main(out_dir, sf_dir, budget_s=120.0, report_times=False):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    times = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            print(f"  {name:>24}: NO-ORACLE rows={len(got)}")
            continue
        t0 = time.time()
        status_o, payload = run_with_budget(sf_dir, oracle[name], budget_s)
        times[name] = time.time() - t0
        if status_o == "timeout":
            print(f"  {name:>24}: ORACLE-TIMEOUT budget={budget_s}s — FAIL")
            n_fail += 1
            continue
        if status_o == "err":
            print(f"  {name:>24}: ORACLE-SQL-ERROR {payload}")
            n_fail += 1
            continue
        exp = payload
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
    if report_times and times:
        print("-- slowest oracles --")
        for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {name:>24}: {t:6.1f}s")
        print(f"-- total oracle time: {sum(times.values()):.1f}s --")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf_dir")
    ap.add_argument("--budget", type=float, default=120.0,
                    help="per-oracle wall-clock budget in seconds")
    ap.add_argument("--report-times", action="store_true")
    a = ap.parse_args()
    sys.exit(main(a.out_dir, a.sf_dir, budget_s=a.budget,
                  report_times=a.report_times))
