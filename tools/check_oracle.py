#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each query dir under verify_out_dir: read the Spark parquet
result, run the matching oracle SQL from oracle_sql.json in DuckDB
(tables = parquet files in sf_dir), then compare with columns sorted
by name and rows sorted by all columns. Exact equality on values
(NaN==NaN allowed); reports dtype diffs separately.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def canon(v):
    if v is None:
        return None
    if isinstance(v, float) and np.isnan(v):
        return "NaN?"  # treat NaN/None uniformly-ish; report separately
    if isinstance(v, np.generic):
        v = v.item()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def main(out_dir, sf_dir, only=None, skip=None):
    import re
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for qname in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, qname)
        if not os.path.isdir(qdir):
            continue
        if only and not re.search(only, qname):
            continue
        if skip and re.search(skip, qname):
            print(f"  ~ {qname}: SKIPPED by filter")
            continue
        got = pd.read_parquet(qdir)
        if qname not in oracle:
            print(f"  ~ {qname}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.execute(oracle[qname]).df()
        except Exception as e:
            print(f"  ! {qname}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        problems = []
        if list(g.columns) != list(e.columns):
            problems.append(f"columns {list(g.columns)} vs {list(e.columns)}")
        elif len(g) != len(e):
            problems.append(f"rows {len(g)} vs {len(e)}")
        else:
            gv = [[canon(x) for x in row] for row in g.itertuples(index=False)]
            ev = [[canon(x) for x in row] for row in e.itertuples(index=False)]
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b]
            if bad:
                problems.append(f"{len(bad)} differing rows; first: {bad[0]}")
            dt_g = [str(t) for t in g.dtypes]
            dt_e = [str(t) for t in e.dtypes]
            if dt_g != dt_e:
                problems.append(f"dtypes spark={dt_g} duck={dt_e}")
        if problems:
            n_fail += 1
            print(f"  X {qname}: " + " | ".join(problems))
        else:
            n_pass += 1
            print(f"  . {qname}: OK ({len(g)} rows)")
    print(f"PASS {n_pass} FAIL {n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional: [3] only-regex, [4] skip-regex (e.g. for large-SF runs
    # where a recursive-CTE oracle is intractable in DuckDB and a
    # dedicated checker replays it instead — see check_components.py)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None,
                  sys.argv[4] if len(sys.argv) > 4 else None))
