#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each query's parquet
dump (written by graft.Verify), run the corresponding oracle SQL in DuckDB
over the same sf tables, and compare. Dev tool only — not part of the
shipped Scala library.

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def main(sf_dir, out_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        qdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pq.read_table(files[0]).to_pandas()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        ok = True
        msg = ""
        if list(got.columns) != list(want.columns):
            ok, msg = False, f"columns {list(got.columns)} vs {list(want.columns)}"
        elif len(got) != len(want):
            ok, msg = False, f"rows {len(got)} vs {len(want)}"
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                        a = a.astype(float); b = b.astype(float)
                        bad = ~((a == b) | (a.isna() & b.isna()))
                    else:
                        a = a.astype(str); b = b.astype(str)
                        bad = a != b
                    if bad.any():
                        i = bad.idxmax()
                        ok, msg = False, (f"col {c} differs at row {i}: "
                                          f"{got[c][i]!r} vs {want[c][i]!r} "
                                          f"({int(bad.sum())} diffs)")
                        break
                except Exception as e:
                    ok, msg = False, f"col {c}: {e}"
                    break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
