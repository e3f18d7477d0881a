#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output against
DuckDB oracle SQL and compare (columns sorted by name, rows sorted, exact
values). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fail += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n{str(e)[:800]}"); fail += 1; continue
    # Hash-style compare: the driver hashes rendered values, so a DuckDB
    # HUGEINT (-> float64, "123.0") must not stand in for a Spark BIGINT
    # ("123"). Compare stringified cells too.
    #
    # KNOWN GAP (round-3 ADVICE): both frames pass through pandas before
    # astype(str), so this approximates — not replicates — the driver's
    # renderer. Differences that vanish in the duckdb->pandas conversion
    # (Java vs Python float repr, timestamp sub-precision) are invisible
    # here. Mitigation used by the queries themselves: doubles come from
    # decimal casts or deterministic folds, timestamps are µs-exact, so
    # both engines render identical canonical values by construction. If
    # the driver's rendered/hashed dump is ever available locally, diff
    # against it directly instead.
    gs, ws = g.astype(str), w.astype(str)
    if not gs.equals(ws):
        diff_cols = [c for c in gs.columns if not gs[c].equals(ws[c])]
        print(f"FAIL {name}: rendered-value mismatch in {diff_cols} "
              f"(dtypes got={[str(g[c].dtype) for c in diff_cols]} "
              f"want={[str(w[c].dtype) for c in diff_cols]})"); fail += 1; continue
    print(f"OK   {name}: {len(got)} rows")
sys.exit(1 if fail else 0)
