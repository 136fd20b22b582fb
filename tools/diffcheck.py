#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/diffcheck.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ (Spark parquet) and oracle_sql.json, runs each
oracle SQL in DuckDB with views over <sfDir>/*.parquet, and compares:
  - schema: column names (sorted)
  - rows: values, columns sorted by name, rows sorted by all columns
Reports exact match / near-miss (float tolerance) / mismatch per query.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def load_spark(outdir, name):
    con = duckdb.connect()
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None, None, None
    rel = con.execute(f"SELECT * FROM read_parquet({files!r})")
    cols = [d[0] for d in rel.description]
    types = [str(d[1]) for d in rel.description]
    rows = rel.fetchall()
    con.close()
    return cols, types, rows

def run_oracle(sfdir, sql):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    types = [str(d[1]) for d in rel.description]
    rows = rel.fetchall()
    con.close()
    return cols, types, rows

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ccols = [cols[i] for i in order]
    crows = sorted(
        [tuple(norm_cell(r[i]) for i in order) for r in rows],
        key=lambda t: tuple((x is None, str(x)) for x in t))
    return ccols, crows

def approx_eq(a, b):
    if a == b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return False

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        scols, stypes, srows = load_spark(outdir, name)
        if scols is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ocols, otypes, orows = run_oracle(sfdir, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: schema {sc} vs {oc}")
            n_fail += 1
            continue
        # column TYPES must match too: the driver hashes typed values, so
        # e.g. an uncast DuckDB SUM(BIGINT) -> HUGEINT hash-mismatches a
        # Spark BIGINT even when every value compares equal in Python.
        st = dict(zip(scols, stypes))
        ot = dict(zip(ocols, otypes))
        tdiff = [(c, st[c], ot[c]) for c in sc if st[c] != ot[c]]
        if tdiff:
            print(f"FAIL {name}: column type drift (spark vs oracle): {tdiff}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(orr)}")
            n_fail += 1
            continue
        exact = sr == orr
        near = exact or all(
            all(approx_eq(a, b) for a, b in zip(r1, r2))
            for r1, r2 in zip(sr, orr))
        if exact:
            print(f"PASS {name}: {len(sr)} rows exact")
            n_pass += 1
        elif near:
            print(f"NEAR {name}: {len(sr)} rows within tolerance (HASH WOULD FAIL)")
            for r1, r2 in list(zip(sr, orr)):
                if r1 != r2:
                    print(f"  spark={r1}\n  duck ={r2}")
                    break
            n_fail += 1
        else:
            bad = [(r1, r2) for r1, r2 in zip(sr, orr) if r1 != r2]
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first:")
            for r1, r2 in bad[:3]:
                print(f"  spark={r1}\n  duck ={r2}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
