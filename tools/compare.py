#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's DuckDB-oracle compare.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, loads <outDir>/<name>/ parquet (Spark result) and runs the
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, then
compares schema/rowcount/values (columns sorted by name, rows sorted).
NOT part of the shipped library (driver-side python only).
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    # Type-sensitive canonical form: the driver hashes canonical value
    # encodings, so Decimal(5) vs int(5) vs float(5.0) must NOT compare
    # equal here (they hash differently there). Carry the type name.
    if isinstance(v, float):
        if math.isnan(v): return ("float", "NaN")
        return ("float", repr(v))
    return (type(v).__name__, repr(v))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = ds.dataset(f"{out_dir}/{name}").to_table()
            spark_cols = sorted(tbl.column_names)
            spark_types = {c: str(tbl.schema.field(c).type) for c in spark_cols}
            spark_rows = [tuple(norm(r[c]) for c in spark_cols) for r in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}"); n_fail += 1; continue
        try:
            res = con.execute(sql)
            duck_cols = sorted([d[0] for d in res.description])
            duck_tbl = res.fetch_arrow_table()
            duck_types = {c: str(duck_tbl.schema.field(c).type) for c in duck_cols}
            duck_rows = [tuple(norm(r[c]) for c in duck_cols) for r in duck_tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}"); n_fail += 1; continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}"); n_fail += 1; continue
        tdiff = {c: (spark_types[c], duck_types[c]) for c in spark_cols
                 if spark_types[c] != duck_types[c]}
        if tdiff:
            # warn only: tz-annotation / width representation can differ while
            # the canonical value encoding (checked below, type-sensitive)
            # still matches. Decimal-vs-int divergence WILL fail below.
            print(f"WARN {name}: arrow type diff {tdiff}")
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"); n_fail += 1; continue
        sr, dr = sorted(spark_rows, key=str), sorted(duck_rows, key=str)
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} mismatched rows; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
