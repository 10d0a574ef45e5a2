#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then re-run each oracle SQL in DuckDB over the same parquet
tables and compare (column-name-sorted, row-sorted, exact values).

Usage: python3 tools/check.py [sfdir] [outdir]
Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first (or pass --run).
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0]).to_pandas()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize date-ish columns to pandas Timestamps so spark date32 and
    # duckdb DATE (fetched as datetime64) compare equal
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: v is None or hasattr(v, "toordinal")).all() \
                and df[c].notna().any():
            df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell(v):
    if v is None or v != v:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def table_hash(df):
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        rdir = os.path.join(outdir, name)
        got = load_result(rdir)
        if got is None:
            print(f"FAIL {name}: no spark result written")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} duckdb={list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duckdb={len(w)}")
            n_bad += 1
            continue
        hg, hw = table_hash(g), table_hash(w)
        if hg != hw:
            n_bad += 1
            print(f"FAIL {name}: hash mismatch ({len(g)} rows)")
            # show first differing row
            for i in range(len(g)):
                rg = [cell(v) for v in g.iloc[i]]
                rw = [cell(v) for v in w.iloc[i]]
                if rg != rw:
                    print(f"  row {i}: spark={rg}")
                    print(f"  row {i}: duckdb={rw}")
                    break
        else:
            n_ok += 1
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{n_ok} ok, {n_bad} failed of {len(oracle)}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
