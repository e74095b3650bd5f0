#!/usr/bin/env python3
"""Driver-faithful correctness emulation: compares pandas-level dtypes
and values, the way a pandas/arrow-based harness would see them.

tools/selfcheck.py fetches python objects (fetchall) where a DuckDB
HUGEINT arrives as a plain int and str()s identically to Spark's
int64 — but a pandas fetch turns HUGEINT (any SUM over integers!)
into float64, so `1` hashes as `1.0` and the query fails driver-side
even though selfcheck passes. This script catches that class of bug:
it fetches BOTH sides through pandas and flags any column whose
numeric kind differs (int vs float vs object/Decimal) as well as any
value mismatch under a float-tolerant compare.

Usage: python3 tools/drivercheck.py <outDir-from-Verify> <sfDir>
"""
import sys, json, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    return df


def kind(s):
    k = s.dtype.kind  # i/u int, f float, O object, M datetime, b bool
    return {"u": "i"}.get(k, k)


def cell(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def sig(df):
    rows = ["\x01".join(cell(v) for v in r) for r in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # crashed queries must fail loudly, not vanish (see selfcheck.py)
    manifest_path = f"{out_dir}/queries.json"
    if os.path.exists(manifest_path):
        for name in json.load(open(manifest_path)):
            if not os.path.isdir(os.path.join(out_dir, name)):
                n_fail += 1
                print(f"FAIL {name}: MISSING output")
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or name not in oracle:
            continue
        got = canon(pq.read_table(qdir).to_pandas())
        exp = canon(con.sql(oracle[name]).df())
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols spark={list(got.columns)} oracle={list(exp.columns)}")
        else:
            for c in got.columns:
                kg, ke = kind(got[c]), kind(exp[c])
                if kg != ke:
                    problems.append(f"dtype[{c}] spark={got[c].dtype} oracle={exp[c].dtype}")
            if len(got) != len(exp):
                problems.append(f"rows {len(got)}/{len(exp)}")
            elif not problems and sig(got) != sig(exp):
                g, e = sig(got), sig(exp)
                diff = next((i for i in range(len(g)) if g[i] != e[i]), -1)
                problems.append(f"hash mismatch, first diff row {diff}:\n"
                                f"   spark:  {g[diff][:300]}\n   oracle: {e[diff][:300]}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"PASS {name}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
