#!/usr/bin/env python3
"""Time each oracle_sql.json entry in DuckDB over the sf parquet tables.
This mirrors what the judge measures as the baseline side of the 2x gate.
Usage: time_oracle.py <sfDir> <oracleSqlJson> [runs=3] [jsonOut]
Prints per-query median seconds and the total, slowest first. When
jsonOut is given, also writes {"<query>": medianSec, ...} there so
graft.Bench can embed the oracle timings in the same bench artifact
(same session, same box — the 2x gate becomes computable from the
artifact alone).
"""
import sys, os, json, time
import duckdb

def main(sf_dir, oracle_json, runs=3, json_out=None):
    con = duckdb.connect()
    # CREATE TABLE (not VIEW): load each fixture into DuckDB's in-memory
    # storage once, outside the timed loop. graft.Bench pre-materializes
    # the same ten scans into Spark's columnar cache (fixture_cache=1),
    # so both sides of the 2x gate measure warm-data steady state —
    # views here would re-decode parquet on every timed run and the
    # comparison would no longer be like-for-like (round-13 protocol
    # change; GRAFT_ORACLE_VIEWS=1 restores the old cold-scan regime
    # for A/B against pre-r13 artifacts).
    rel = "VIEW" if os.environ.get("GRAFT_ORACLE_VIEWS") == "1" else "TABLE"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE {rel} {t} AS SELECT * FROM read_parquet('{p}')"
                    if rel == "TABLE" else
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_json))
    res = {}
    # Guard rails mirroring tools/bench_sfbig.duck_bench: a per-run wall
    # cap (con.interrupt via Timer) and a one-sample-is-plenty rule for
    # slow queries — without these, an uncapped 3-run loop over a scaled
    # corpus can grind for hours on the heavy dedup oracles (observed:
    # the embedded 10x pass wedging the whole rehearsal chain).
    import threading
    TIMEOUT_S = 300
    SLOW_S = 30
    for name, sql in sorted(oracles.items()):
        ts = []
        for _ in range(runs):
            timer = threading.Timer(TIMEOUT_S, con.interrupt)
            timer.start()
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                kind = ("TIMEOUT" if time.time() - t0 >= TIMEOUT_S * 0.98
                        else "FAIL")
                print(f"{kind} {name}: {e}")
                break
            finally:
                timer.cancel()
            ts.append(time.time() - t0)
            if ts[-1] >= SLOW_S:
                break
        if ts:
            res[name] = sorted(ts)[len(ts) // 2]
    for name, sec in sorted(res.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.3f}  {name}")
    print(f"{sum(res.values()):8.3f}  TOTAL ({len(res)} queries)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(res, f)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         sys.argv[4] if len(sys.argv) > 4 else None)
