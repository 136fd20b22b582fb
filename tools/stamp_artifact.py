#!/usr/bin/env python3
"""Assemble a correctness artifact JSON from a diffcheck-style pass.

Usage: python3 tools/stamp_artifact.py <sfDir> <verifyOutDir> <outJson>
         <sfLabel> <layout> <note>

Re-runs the diffcheck comparison (same canonicalization) and writes
{sf, layout, entries, pass, fail, note, rows} with per-entry Spark row
counts. Exits non-zero if any entry fails.
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


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    ccols = [cols[i] for i in order]
    crows = sorted(
        [tuple(norm_cell(r[i]) for i in order) for r in rows],
        key=lambda t: tuple((x is None, str(x)) for x in t))
    return ccols, crows


def main():
    sfdir, outdir, outjson, sflabel, layout, note = sys.argv[1:7]
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    rows_out, n_pass, n_fail, failed = {}, 0, 0, []
    for name, sql in sorted(oracles.items()):
        con = duckdb.connect()
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            n_fail += 1
            failed.append(name + ":no-spark-output")
            con.close()
            continue
        rel = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in rel.description]
        stypes = [str(d[1]) for d in rel.description]
        srows = rel.fetchall()
        for t in TABLES:
            p = os.path.join(sfdir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        try:
            rel = con.execute(sql)
            ocols = [d[0] for d in rel.description]
            otypes = [str(d[1]) for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            n_fail += 1
            failed.append(f"{name}:oracle-error:{str(e)[:80]}")
            con.close()
            continue
        con.close()
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        types_ok = dict(zip(scols, stypes)) == dict(zip(ocols, otypes))
        if sc == oc and types_ok and sr == orr:
            n_pass += 1
            rows_out[name] = len(sr)
        else:
            n_fail += 1
            failed.append(name + ":mismatch")
    art = {"sf": sflabel, "layout": layout, "entries": n_pass + n_fail,
           "pass": n_pass, "fail": n_fail, "note": note, "rows": rows_out}
    if failed:
        art["failed"] = failed
    with open(outjson, "w") as f:
        json.dump(art, f, indent=1, sort_keys=False)
    print(f"{outjson}: {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
