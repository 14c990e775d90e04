#!/usr/bin/env python3
"""Local t2 simulator (dev tool only — NOT part of the shipped library).

Mimics the driver's DuckDB-oracle compare: reads each Verify output
parquet, runs the corresponding oracleSql in DuckDB over the same corpus,
and compares values column-by-column (columns sorted by name, row order as
produced — queries must ORDER BY a unique key).

On any value mismatch, writes a value-level diff artifact
<verifyOutDir>/DIFF_<name>.json with the first DIFF_LIMIT differing
(row, column, spark_value, duck_value) tuples per column plus the engine
versions — so a driver-side red localizes to (row, column, digit) without
a rerun (round-16 verdict item 2; the r15 `agg_cdf` red was
unfalsifiable for a whole round without this).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import duckdb, glob, json, platform, sys

import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify"
DIFF_LIMIT = 20


def dump_diff(name, reason, tuples=None, extra=None):
    """Write the per-query diff artifact next to the Verify output."""
    art = {
        "query": name,
        "reason": reason,
        "duckdb_version": duckdb.__version__,
        "numpy_version": np.__version__,
        "python_version": platform.python_version(),
        "sf_dir": sf,
    }
    if tuples is not None:
        art["diffs"] = tuples
    if extra:
        art.update(extra)
    with open(f"{out}/DIFF_{name}.json", "w") as fh:
        json.dump(art, fh, indent=2, default=str)

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        bad.append(name); print(f"FAIL {name}: missing spark output"); continue
    try:
        got = con.execute(f"SELECT * FROM '{files[0]}'").fetchdf()
    except Exception as e:
        bad.append(name); print(f"FAIL {name}: cannot read spark output: {e}"); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append(name); print(f"FAIL {name}: ORACLE ERROR: {e}"); continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        bad.append(name)
        dump_diff(name, "schema", extra={
            "spark_columns": list(got.columns), "duck_columns": list(exp.columns)})
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); continue
    if len(got) != len(exp):
        bad.append(name)
        dump_diff(name, "rows", extra={"spark_rows": len(got), "duck_rows": len(exp)})
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
    mism, tuples = [], []
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            eq = (g == e) | (np.isnan(g.astype(float)) & np.isnan(e.astype(float)))
        else:
            eq = np.array([x == y or (x is None and y is None) for x, y in zip(g, e)])
        if not eq.all():
            i = int(np.argmin(eq))
            mism.append((c, i, g[i], e[i], int((~eq).sum())))
            for j in np.flatnonzero(~eq)[:DIFF_LIMIT]:
                tuples.append({"row": int(j), "column": c,
                               "spark_value": repr(g[j]), "duck_value": repr(e[j])})
    if mism:
        bad.append(name)
        dump_diff(name, "values", tuples=tuples,
                  extra={"diff_counts": {c: n for c, _, _, _, n in mism}})
        for c, i, gv, ev, n in mism:
            print(f"FAIL {name}: col={c} row={i} spark={gv!r} oracle={ev!r} ({n} diffs)")
    else:
        ok.append(name)
print(f"\nduckdb={duckdb.__version__}  {len(ok)}/{len(oracle)} oracle queries match; {len(bad)} failing: {bad}")
sys.exit(1 if bad else 0)
