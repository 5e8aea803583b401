#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
outputs against the oracle SQL in DuckDB over the same sf dir, compare
row-order-insensitively with exact value equality. Dev tooling only —
the shipped library has no Python dependency."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def load_result(rows, cols):
    # sort columns by name, then rows as string tuples (driver-style)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], data

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        spark_cols = tbl.column_names
        spark_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sc, sd = load_result(spark_rows, spark_cols)
        dc, dd = load_result(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        if len(sd) != len(dd):
            print(f"FAIL {name}: rowcount spark={len(sd)} duck={len(dd)}"); n_fail += 1; continue
        if sd != dd:
            bad = next(i for i in range(len(sd)) if sd[i] != dd[i])
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n  spark={sd[bad]}\n  duck ={dd[bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(sd)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
