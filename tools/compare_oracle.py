#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle_sql.json entry
in DuckDB over the same parquet tables, compare against the Spark result
parquet written by graft.Verify (columns sorted by name, rows sorted,
floats canonicalized). Usage: compare_oracle.py <sfDir> <verifyOutDir>.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            o = con.sql(sql)
            ocols, orows = o.columns, o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        try:
            srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols, srows = srel.columns, srel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark read error {e}")
            n_bad += 1
            continue
        oc, orw = canon_rows(ocols, orows)
        sc, srw = canon_rows(scols, srows)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch oracle={oc} spark={sc}")
            n_bad += 1
        elif orw != srw:
            diff = [(a, b) for a, b in zip(orw, srw) if a != b][:3]
            print(f"FAIL {name}: rows oracle={len(orw)} spark={len(srw)} first diffs={diff}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(orw)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
