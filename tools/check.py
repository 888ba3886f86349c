#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (builder-side tooling
only; NOT part of the engine). Usage:

    python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet dump produced by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB (views registered per
fixture table), sorts columns by name, and compares row-by-row.
"""
import sys, os, json, glob, math
import duckdb

def norm_cell(v):
    # Normalize across engines: decimals -> float-compatible strings,
    # timestamps -> isoformat, floats -> repr (exact).
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return v

def fetch_rows(rel):
    cols = sorted(rel.columns)
    quoted = ", ".join(f'"{c}"' for c in cols)
    rows = rel.project(quoted).fetchall()
    return cols, [tuple(norm_cell(c) for c in r) for r in rows]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # fixture tables are single files; at-scale (GenData) tables are
        # directories of part files — read whichever shape this is
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_cols, got = fetch_rows(con.read_parquet(files))
            exp_cols, exp = fetch_rows(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            print(f"  spark head: {got[:3]}\n  oracle head: {exp[:3]}")
            n_fail += 1
            continue
        bad = next((i for i, (g, e) in enumerate(zip(got, exp)) if g != e), None)
        if bad is not None:
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  cols:   {got_cols}")
            print(f"  spark:  {got[bad]}")
            print(f"  oracle: {exp[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
