#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
dumps written by graft.Verify plus oracle_sql.json, runs each oracle in
DuckDB against the same sf tables, and compares (column-name-sorted,
row-sorted) values."""
import sys, os, json, glob
import duckdb

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out), [cols[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        got_rows, got_cols = norm_rows(got.columns, got.fetchall())
        try:
            exp = con.sql(sql)
            exp_rows, exp_cols = norm_rows(exp.columns, exp.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_rows != exp_rows:
            print(f"FAIL {name}: {len(got_rows)} vs {len(exp_rows)} rows")
            for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
                if g != e:
                    print(f"  first diff at {i}:\n    got {g}\n    exp {e}")
                    break
            if len(got_rows) != len(exp_rows):
                print(f"    got head: {got_rows[:3]}\n    exp head: {exp_rows[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
