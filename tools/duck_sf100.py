#!/usr/bin/env python3
"""DuckDB side of the sf100 tpch decade (round-8, r7 verdict item 5).

Runs each requested oracle query with a per-query wall timeout and a
bounded temp-spill directory, so a single runaway spill (the sf10
graph-family DNFs wrote >78 GB before being killed) can neither fill
the disk nor stall the session. A query that times out / errors /
exceeds the spill cap records DNF with the reason — that is grading
evidence, not a failure of the harness.

Usage: duck_sf100.py <sfDir> <oracleDir> <runs> q1,q2,...
Prints one JSON line: {"duckdb_sf100": {...per query...}, "runs": N}
"""
import sys, json, time, os, multiprocessing as mp


def run_one(sf, sql, q, conn_kwargs, out):
    # the WHOLE body is guarded (review fix): an import/connect/SET/
    # CREATE VIEW failure outside a narrower try would die silently and
    # the parent would record bare null — the silent DNF this tool
    # exists to avoid
    try:
        import duckdb
        con = duckdb.connect()
        con.execute(f"SET temp_directory='{conn_kwargs['tmp']}'")
        con.execute(f"SET max_temp_directory_size='{conn_kwargs['tmp_cap']}'")
        con.execute(f"SET memory_limit='{conn_kwargs['mem']}'")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            # partial scale fixtures (round-9 ScaleUp `tables` arg) carry
            # only the tables a family reads; DuckDB binds views eagerly,
            # so an absent parquet must be skipped, not fatal for every
            # query in the run
            if os.path.exists(f"{sf}/{t}.parquet"):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out[q] = time.perf_counter() - t0
    except Exception as e:  # spill-cap / OOM-policy / setup errors
        out[q] = f"ERR: {type(e).__name__}: {str(e)[:120]}"


def main():
    sf, oracle_dir, runs_s, names_s = sys.argv[1:5]
    runs = int(runs_s)
    timeout_s = int(os.environ.get("DUCK_TIMEOUT_S", "600"))
    oracles = json.load(open(os.path.join(oracle_dir, "oracle_sql.json")))
    kw = {"tmp": os.environ.get("DUCK_TMP", "/tmp/duck_spill"),
          "tmp_cap": os.environ.get("DUCK_TMP_CAP", "30GiB"),
          "mem": os.environ.get("DUCK_MEM", "96GiB")}
    os.makedirs(kw["tmp"], exist_ok=True)
    result = {}
    for q in names_s.split(","):
        sql = oracles.get(q)
        if sql is None:
            result[q] = "ERR: no oracle"
            continue
        best = None
        for _ in range(runs):
            with mp.Manager() as m:
                out = m.dict()
                p = mp.Process(target=run_one, args=(sf, sql, q, kw, out))
                p.start()
                p.join(timeout_s)
                if p.is_alive():
                    p.terminate()
                    p.join()
                    best = best if isinstance(best, float) else f"DNF: >{timeout_s}s"
                    break
                got = out.get(q)
                if got is None:  # child died outside Python (e.g. OOM kill)
                    got = f"DNF: child exit {p.exitcode} with no result"
            if isinstance(got, float):
                best = got if not isinstance(best, float) else min(best, got)
            else:
                best = best if isinstance(best, float) else got
                break
        result[q] = best
        print(f"[duck_sf100] {q}: {best}", file=sys.stderr)
    print(json.dumps({"duckdb_sf100": result, "runs": runs}))


if __name__ == "__main__":
    main()
