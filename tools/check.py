#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev loop only; the
driver runs its own). Usage: check.py <sfDir> <verifyOutDir>

For each result parquet written by graft.Verify, runs the matching
oracle_sql.json query in DuckDB over the same testdata tables, sorts
columns by name, and compares cell-by-cell (exact for non-floats,
tiny-epsilon for floats so genuine mismatches still surface)."""
import json, sys, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if len(sys.argv) > 3:  # dev-only filter: comma-separated query names
    keep = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in keep}
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_df()
        want = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fail += 1
        continue
    for c in got.columns:
        if str(got[c].dtype) != str(want[c].dtype):
            print(f"  warn {name}.{c}: dtype {got[c].dtype} vs {want[c].dtype}")
    if got.shape != want.shape:
        print(f"FAIL {name}: shape {got.shape} != {want.shape}")
        fail += 1
        continue
    bad = None
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (g, w) in enumerate(zip(gv, wv)):
            gn = g is None or (isinstance(g, float) and math.isnan(g))
            wn = w is None or (isinstance(w, float) and math.isnan(w))
            if gn and wn:
                continue
            if gn != wn:
                bad = (c, i, g, w); break
            if isinstance(g, float) or isinstance(w, float):
                if g != w:  # exact first: the decimal scheme should be bit-equal
                    if abs(g - w) > 1e-9 * max(1.0, abs(g), abs(w)):
                        bad = (c, i, g, w); break
                    else:
                        print(f"  warn {name}.{c}[{i}]: {g} vs {w} (close, not exact)")
            elif str(g) != str(w):
                bad = (c, i, g, w); break
        if bad:
            break
    if bad:
        c, i, g, w = bad
        print(f"FAIL {name}: col {c} row {i}: got={g!r} want={w!r}")
        fail += 1
    else:
        print(f"ok   {name} ({got.shape[0]} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} matched")
sys.exit(1 if fail else 0)
