#!/usr/bin/env python3
"""Local correctness pre-check: compare Verify's parquet dumps against the
DuckDB oracles, mimicking the driver's compare (sort columns by name,
sort rows, hash values). Usage:
    python3 tools/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_dir = f"{outdir}/{name}"
        parts = glob.glob(f"{spark_dir}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        import pandas as pd
        diffs = []
        for c in g.columns:
            a, b = g[c], w[c]
            if str(a.dtype) != str(b.dtype):
                diffs.append(f"dtype[{c}]: {a.dtype} vs {b.dtype}")
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                bad = (~eq).sum()
                i = (~eq).idxmax()
                diffs.append(f"val[{c}]: {bad} rows differ, e.g. {a[i]!r} vs {b[i]!r}")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
