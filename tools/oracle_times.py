#!/usr/bin/env python3
"""Time every oracle in <verifyOutDir>/oracle_sql.json against <sfDir>
in DuckDB (fresh connection per entry, like the driver's replay) and
print the slowest tail. Usage:
  python3 tools/oracle_times.py <sfDir> <verifyOutDir> [minSecToPrint]
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    times = {}
    for name, sql in sorted(oracles.items()):
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sfdir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            dt = time.time() - t0
            times[name] = dt
            if dt >= floor:
                print(f"{name:32s} {dt:7.1f} s  ({n} rows)", flush=True)
        except Exception as e:
            print(f"{name:32s} ERROR {str(e)[:100]}", flush=True)
        con.close()
    total = sum(times.values())
    print(f"== total replay {total:.1f} s over {len(times)} entries ==")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  slowest: {name:32s} {dt:7.1f} s")

if __name__ == "__main__":
    main()
