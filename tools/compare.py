#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
outputs against the oracle SQL in DuckDB over the same sf dir, compare
row-order-insensitively with exact value equality. Dev tooling only —
the shipped library has no Python dependency.

Type-strict (round 3): DuckDB results are fetched via Arrow and each
column's type KIND (int/float/decimal/string/bool/...) must agree with
the Spark parquet column's kind before values are compared. This catches
the drift class that shipped red in round 2 — DuckDB `sum(BIGINT)` is
HUGEINT (Arrow decimal128) while Spark emits BIGINT (Arrow int64); the
old `str()` normalization made 42 == 42 regardless of type, so the
mismatch only surfaced in the driver's stricter hash. Any HUGEINT /
DECIMAL oracle column paired with a Spark integer/double column now
fails locally with a "type kind differs" message."""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def type_kind(t: pa.DataType) -> str:
    """Collapse an Arrow type to the kind the driver's hash is sensitive
    to. Widths within a kind (int32 vs int64) are tolerated — parquet
    writers disagree on narrow ints — but kind crossings (decimal vs
    int, float vs int) are exactly the HUGEINT drift we must catch."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + type_kind(t.value_type) + ">"
    return str(t)


def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def load_result(tbl: pa.Table):
    """(sorted col names, per-col type kinds in that order, sorted row
    tuples of normalized values)."""
    cols = tbl.column_names
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    kinds = [type_kind(tbl.schema.field(i).type) for i in order]
    rows = [tuple(r.values()) for r in tbl.to_pylist()]
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], kinds, data


def main(sfdir, outdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        stbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        try:
            dtbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sc, sk, sd = load_result(stbl)
        dc, dk, dd = load_result(dtbl)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        if sk != dk:
            bad = [(sc[i], sk[i], dk[i]) for i in range(len(sc)) if sk[i] != dk[i]]
            print(f"FAIL {name}: type kind differs (col, spark, duck): {bad}")
            n_fail += 1; continue
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
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))
