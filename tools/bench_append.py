#!/usr/bin/env python3
"""Incrementally append rehearsal rows to the committed scale
artifacts (BENCH_sfbig.json / BENCH_sf100x.json) instead of re-running
the full multi-hour sweeps: runs ONLY the named queries' Spark and
DuckDB legs at the relevant scales and merges them in, recomputing the
per-query scaling/curve fields. Driver-side tooling; run from the repo
root AFTER build_sfbig.py has produced /tmp/sfbig (and with /tmp/sf100x
present for the 100x leg).

    python3 tools/bench_append.py sfbig x12_ann_ivf x70_ann_pq ...
    python3 tools/bench_append.py sf100x x69_corpus_diff ...
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_sfbig import duck_bench, spark_bench  # noqa: E402
from bench_sf100x import duck_bench_isolated  # noqa: E402


def oracle_sql(tag):
    out = f"/tmp/{tag}_oracle"
    subprocess.run(["sbt", "-batch",
                    f"runMain graft.Verify /root/testdata/sf0.001 {out}"],
                   env=dict(os.environ, SPARK_GRAFT_VERIFY_ONLY="__none__"),
                   check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    return json.load(open(os.path.join(out, "oracle_sql.json")))


def ratio(a, b):
    ok = all(isinstance(v, (int, float)) and v for v in (a, b))
    return round(b / a, 2) if ok else None


def append_sfbig(names, sf1="/root/testdata/sf0.1", sf10="/tmp/sfbig",
                 out="BENCH_sfbig.json"):
    oracles = oracle_sql("append_sfbig")
    art = json.load(open(out))
    legs = {
        "spark_1x": spark_bench(sf1, names),
        "spark_10x": spark_bench(sf10, names),
        "duckdb_1x": duck_bench(sf1, oracles, names),
        "duckdb_10x": duck_bench(sf10, oracles, names),
    }
    for key, vals in legs.items():
        art.setdefault(key, {}).update(
            {q: vals[q] for q in names if q in vals})
    art["queries"] = sorted(set(art["queries"]) | set(names))
    for q in names:
        art.setdefault("spark_scaling", {})[q] = ratio(
            art["spark_1x"].get(q), art["spark_10x"].get(q))
        art.setdefault("duckdb_scaling", {})[q] = ratio(
            art["duckdb_1x"].get(q), art["duckdb_10x"].get(q))
    with open(out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    for q in names:
        print(f"{q:24s} spark {art['spark_1x'].get(q)!s:>7} -> "
              f"{art['spark_10x'].get(q)!s:>7}  duckdb "
              f"{art['duckdb_1x'].get(q)!s:>7} -> "
              f"{art['duckdb_10x'].get(q)!s:>7}")
    print(f"merged {len(names)} rows into {out}")


def append_sf100x(names, sf100="/tmp/sf100x", sfbig_json="BENCH_sfbig.json",
                  out="BENCH_sf100x.json"):
    oracles = oracle_sql("append_sf100x")
    art = json.load(open(out))
    base = json.load(open(sfbig_json))
    spark = spark_bench(sf100, names)
    duck = duck_bench_isolated(sf100, oracles, names)
    art.setdefault("spark_100x", {}).update(spark)
    art.setdefault("duckdb_100x", {}).update(duck)
    art["queries"] = sorted(set(art["queries"]) | set(names))
    for q in names:
        art.setdefault("spark_curve", {})[q] = [
            base["spark_1x"].get(q), base["spark_10x"].get(q),
            art["spark_100x"].get(q)]
        art.setdefault("duckdb_curve", {})[q] = [
            base["duckdb_1x"].get(q), base["duckdb_10x"].get(q),
            art["duckdb_100x"].get(q)]
        art.setdefault("spark_scaling_100x", {})[q] = ratio(
            base["spark_1x"].get(q), art["spark_100x"].get(q))
        art.setdefault("duckdb_scaling_100x", {})[q] = ratio(
            base["duckdb_1x"].get(q), art["duckdb_100x"].get(q))
    with open(out, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    for q in names:
        sc, dc = art["spark_curve"][q], art["duckdb_curve"][q]
        print(f"{q:24s} spark {sc[0]!s:>7} {sc[1]!s:>7} {sc[2]!s:>8}  "
              f"duckdb {dc[0]!s:>7} {dc[1]!s:>7} {dc[2]!s:>8}")
    print(f"merged {len(names)} rows into {out}")


if __name__ == "__main__":
    which, names = sys.argv[1], sys.argv[2:]
    if not names:
        sys.exit("usage: bench_append.py sfbig|sf100x <query> [...]")
    if which == "sfbig":
        append_sfbig(names)
    elif which == "sf100x":
        append_sf100x(names)
    else:
        sys.exit(f"unknown target {which}")
