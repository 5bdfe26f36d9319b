#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
run Verify's parquet dumps against DuckDB executing oracle_sql.json
on the same sf dir. Usage: check.py <sfDir> <verifyOutDir>
(Dev tooling only — not part of the shipped Scala library.)"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    spark = con.execute(f"SELECT * FROM '{spark_files[0]}'").fetchdf()
    # driver sorts columns by name before hashing values
    duck = duck[sorted(duck.columns)]
    spark = spark[sorted(spark.columns)]
    if list(duck.columns) != list(spark.columns):
        print(f"FAIL {name}: cols duck={list(duck.columns)} spark={list(spark.columns)}")
        fails += 1; continue
    dt = [(c, str(duck[c].dtype), str(spark[c].dtype)) for c in duck.columns
          if str(duck[c].dtype) != str(spark[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype mismatch {dt}")
        fails += 1; continue
    if len(duck) != len(spark):
        print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
        fails += 1; continue
    eq = duck.reset_index(drop=True).equals(spark.reset_index(drop=True))
    if not eq:
        diff = (duck.reset_index(drop=True) != spark.reset_index(drop=True))
        ncell = int(diff.sum().sum())
        print(f"FAIL {name}: {ncell} differing cells")
        for c in duck.columns:
            if diff[c].any():
                i = diff[c].idxmax()
                print(f"   col {c} row {i}: duck={duck[c][i]!r} spark={spark[c][i]!r}")
        fails += 1
    else:
        print(f"PASS {name} ({len(duck)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
