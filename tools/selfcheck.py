#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <outDir-from-Verify> <sfDir>

For each <name>/ parquet dir in outDir, runs oracle_sql.json[name] in
DuckDB against views named after the tables in sfDir, then compares:
schema (sorted column names), row count, and an order-insensitive hash
of all values with columns sorted by name.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 15 significant digits — bit-identical doubles agree here
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def table_sig(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return sorted(cols), len(rows), h.hexdigest()

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # every query Verify ATTEMPTED must have produced an output dir —
    # a crashed query is a FAILURE, not a silently absent row (the
    # round-7 vanish: 7 crashed queries dropped out of the artifact)
    manifest_path = f"{out_dir}/queries.json"
    if os.path.exists(manifest_path):
        for name in json.load(open(manifest_path)):
            if not os.path.isdir(os.path.join(out_dir, name)):
                n_fail += 1
                errs = {}
                errs_path = f"{out_dir}/verify_errors.json"
                if os.path.exists(errs_path):
                    errs = json.load(open(errs_path))
                print(f"FAIL {name}: MISSING output ({errs.get(name, 'no error recorded')})")
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        gcols, gn, ghash = table_sig(got)
        if name not in oracle:
            print(f"ROWS-ONLY {name}: rows={gn} cols={gcols}")
            continue
        exp = con.sql(oracle[name])
        ecols, en, ehash = table_sig(exp)
        ok = (gcols == ecols) and (gn == en) and (ghash == ehash)
        n_pass += ok; n_fail += (not ok)
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: rows {gn}/{en} cols_match={gcols==ecols} hash_match={ghash==ehash}")
        if not ok:
            if gcols != ecols:
                print(f"   spark cols: {gcols}\n   oracle cols: {ecols}")
            else:
                grows = sorted(map(str, got.fetchall()))[:3]
                erows = sorted(map(str, exp.fetchall()))[:3]
                print(f"   spark: {grows}\n   oracle: {erows}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
