#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB correctness gate.

NOT part of the library (the Scala engine has zero Python deps) — this
uses the driver-side duckdb/pyarrow to pre-validate oracle parity
before the real gate runs.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_df()
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}"); n_fail += 1; continue
        g, w = got[gc], want[wc]
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        # The driver's hash is TYPE-SENSITIVE (round 1 shipped 8 failures
        # because DuckDB promotes SUM(int)->HUGEINT / floor->DOUBLE while
        # values stringified identically). Mirror that: dtypes must match
        # exactly, and values compare exactly with no str() fallback for
        # numeric columns.
        dt_mism = [(c, str(g[c].dtype), str(w[c].dtype))
                   for c in gc if str(g[c].dtype) != str(w[c].dtype)]
        if dt_mism:
            print(f"FAIL {name}: dtype {dt_mism[:3]}"); n_fail += 1; continue
        import numpy as _np
        mism = []
        for c in gc:
            numeric = _np.issubdtype(g[c].dtype, _np.number)
            a, b = g[c].tolist(), w[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                both_nan = (isinstance(x, float) and isinstance(y, float)
                            and _np.isnan(x) and _np.isnan(y))
                if x is None and y is None or both_nan:
                    continue
                if x != y and (numeric or str(x) != str(y)):
                    mism.append((c, i, x, y))
                    if len(mism) > 3: break
            if len(mism) > 3: break
        if mism:
            print(f"FAIL {name}: {mism[:3]}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
