#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
same sfDir tables, sorts columns by name + rows by all columns, and compares
cell-by-cell (exact for ints/strings, approx 1e-9 rel for floats).
"""
import sys, os, json, math
import duckdb

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noora = 0
    for name in names:
        # DECIMAL output columns mean Spark decimal-literal arithmetic leaked
        # into the result — a type (and truncation) hazard for the driver's
        # hash compare even when values look close. Flag loudly.
        try:
            import pyarrow.parquet as _pq
            import glob as _glob
            for f in _glob.glob(os.path.join(out_dir, name, "*.parquet")):
                s = _pq.read_schema(f)
                decs = [n for n, t in zip(s.names, s.types) if "decimal" in str(t)]
                if decs:
                    print(f"  [WARN-dec ] {name}: decimal columns {decs}")
        except ImportError:
            pass
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{os.path.join(out_dir, name)}/*.parquet')")
        got_cols = [d[0] for d in got_rel.description]
        got = got_rel.fetchall()
        if name not in oracle:
            n_noora += 1
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            continue
        gc, g = norm(got, got_cols)
        ec, e = norm(exp, exp_cols)
        if gc != ec:
            n_fail += 1
            print(f"  [FAIL-cols] {name}: spark={gc} duckdb={ec}")
            continue
        if len(g) != len(e):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(g)} duckdb={len(e)}")
            continue
        bad = None
        for i, (rg, re_) in enumerate(zip(g, e)):
            for j, (x, y) in enumerate(zip(rg, re_)):
                if not cell_eq(x, y):
                    bad = (i, gc[j], x, y)
                    break
            if bad:
                break
        if bad:
            n_fail += 1
            print(f"  [FAIL-cell] {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
        else:
            n_pass += 1
            print(f"  [pass     ] {name}: {len(g)} rows")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
