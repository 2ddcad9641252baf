#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet directory produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf parquet
tables, and compares: column names (sorted), dtypes (loose), row count,
and cell values (rows sorted by all columns).
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        # distinct from str(None): a NULL must never compare equal to
        # the literal string "None"
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_rowsonly = 0
    # an oracle entry with NO output directory means Verify silently
    # dropped a query — that must fail the gate, not shrink the total
    for missing in sorted(set(oracle) - set(names)):
        print(f"FAIL  {missing}: oracle entry has no Verify output dir")
        n_fail += 1
    for name in names:
        try:
            spark_tbl = pq.read_table(os.path.join(outdir, name))
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            ok = spark_tbl.num_rows > 0
            print(f"{'rows-only PASS' if ok else 'rows-only FAIL (0 rows)'}  {name} ({spark_tbl.num_rows} rows)")
            n_rowsonly += 1
            if not ok:
                n_fail += 1
            continue
        try:
            duck_tbl = con.sql(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_tbl.column_names)
        if s_cols != d_cols:
            print(f"FAIL  {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # numeric-class dtype check: norm() renders 1.0 and 1 identically,
        # so without this a double-vs-bigint schema drift would pass locally
        # while the driver's exact schema compare fails it.
        def tclass(t):
            import pyarrow.types as pt
            if pt.is_integer(t): return "int"
            if pt.is_floating(t): return "float"
            if pt.is_decimal(t): return "decimal"
            if pt.is_boolean(t): return "bool"
            if pt.is_temporal(t): return "temporal"
            if pt.is_string(t) or pt.is_large_string(t): return "str"
            return str(t)
        s_types = {c: tclass(spark_tbl.schema.field(c).type) for c in s_cols}
        d_types = {c: tclass(duck_tbl.schema.field(c).type) for c in d_cols}
        if s_types != d_types:
            bad = {c: (s_types[c], d_types[c])
                   for c in s_cols if s_types[c] != d_types[c]}
            print(f"FAIL  {name}: dtype class differs {bad}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"FAIL  {name}: rowcount spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
            n_fail += 1
            continue
        s_rows = sorted(tuple(norm(r[c]) for c in s_cols)
                        for r in spark_tbl.to_pylist())
        d_rows = sorted(tuple(norm(r[c]) for c in d_cols)
                        for r in duck_tbl.to_pylist())
        if s_rows != d_rows:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs (spark vs duck): {diffs}")
            n_fail += 1
            continue
        print(f"PASS  {name} ({spark_tbl.num_rows} rows)")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail, "
          f"{len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
