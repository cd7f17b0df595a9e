#!/usr/bin/env python3
"""Local imitation of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py [sfDir] [verifyOut]
Loads each <verifyOut>/<query> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name + rows by all values, and compares.

Lint promotion (round-4 verdict item 8): graft.Verify itself runs
with spark.sql.codegen.fallback=false and walks each query's plan
through graft.plans.WindowLint before dumping — a janino-rejected
whole-stage method or an unwhitelisted unpartitioned window fails
that query's dump, which this compare then reports as MISS. The
driver gate therefore catches both classes without log reading.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

# ScaleUp-generated dirs store events.ts as a raw ns-epoch BIGINT
# (Spark cannot write TIMESTAMP(NANOS)); rebuild the view with the
# µs-truncated timestamp the driver data presents to DuckDB.
ts_type = dict((r[0], r[1]) for r in
               con.execute("DESCRIBE SELECT * FROM events").fetchall())
if ts_type.get("ts") == "BIGINT":
    con.execute(f"""CREATE OR REPLACE VIEW events AS
        SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)
        FROM '{sf}/events.parquet'""")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sorted(os.listdir(out)):
    path = os.path.join(out, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"MISS  {name}: no spark output")
        fails.append(name)
        continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
    if name not in oracles:
        print(f"SKIP  {name}: rows-only ({len(spark_df)} rows)")
        continue
    try:
        duck_df = canon(con.execute(oracles[name]).fetchdf())
    except Exception as e:
        print(f"ORAERR {name}: {e}")
        fails.append(name)
        continue
    ok = True
    msgs = []
    if list(spark_df.columns) != list(duck_df.columns):
        ok = False
        msgs.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
    elif len(spark_df) != len(duck_df):
        ok = False
        msgs.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
    else:
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if str(a.dtype) != str(b.dtype):
                msgs.append(f"dtype[{c}] spark={a.dtype} duck={b.dtype}")
            try:
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    ok = False
                    i = (~eq).idxmax()
                    msgs.append(f"val[{c}] row{i}: spark={a[i]!r} duck={b[i]!r}")
            except Exception as e:
                ok = False
                msgs.append(f"cmp[{c}]: {e}")
    status = "OK   " if ok else "FAIL "
    print(f"{status} {name} ({len(spark_df)} rows)" + ("  " + "; ".join(msgs) if msgs else ""))
    if not ok:
        fails.append(name)

print(f"\n{len(fails)} failures: {fails}" if fails else "\nall green")
sys.exit(1 if fails else 0)
