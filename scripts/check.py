#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped by
graft.Verify, re-run the oracle SQL in DuckDB over the same parquet tables and
compare values exactly (columns sorted by name, rows in dumped order).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b or abs(a-b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        qdir = os.path.join(out, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no verify output dir"); n_fail += 1; continue
        try:
            mine = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read dump: {e}"); n_fail += 1; continue
        try:
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        mc, rc = sorted(mine.columns), sorted(ref.columns)
        if mc != rc:
            print(f"FAIL {name}: columns {mc} vs oracle {rc}"); n_fail += 1; continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(ref)}"); n_fail += 1; continue
        mine, ref = mine[mc], ref[mc]
        bad = 0
        for i in range(len(mine)):
            for c in mc:
                a, b = mine[c].iloc[i], ref[c].iloc[i]
                a = a.item() if hasattr(a, "item") else a
                b = b.item() if hasattr(b, "item") else b
                if not eq(a, b):
                    if bad < 3:
                        print(f"  {name} row {i} col {c}: mine={a!r} oracle={b!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells / {len(mine)} rows"); n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
