#!/usr/bin/env python3
"""Degenerate-corpus gate (round-13 verdict ask #7): run the DuckDB
compare over the FULL gated inventory on an empty corpus and a 1-row
corpus (fixtures from `sbt "runMain graft.tools.Fuzz empty|one <dir>"`,
Spark dumps from `sbt "runMain graft.Verify <dir> <dir>_out"`), and
write one committable JSON artifact with per-query status.

Empty-aggregate and NULL semantics are where engines classically
diverge — every row must be OK, or appear in SKIPS with a reason.

Usage: degenerate_gate.py <emptyDir> <oneDir> <jsonOut>
"""
import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare_oracle

# Rows where the degenerate fixture, not the engine, makes the oracle
# comparison meaningless. Each skip names the mechanism; the row is
# still REQUIRED to run without throwing (graft.Verify fails it
# otherwise and parse() reports the missing output dir as FAIL).
SKIPS = {}


def parse(sf_dir, out_dir):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        compare_oracle.main(sf_dir, out_dir)
    res = {}
    for line in buf.getvalue().splitlines():
        m = re.match(r"(OK|FAIL)\s+(\S+?):\s*(.*)", line)
        if m:
            res[m.group(2)] = {"status": m.group(1).lower(),
                               "detail": m.group(3)[:200]}
    return res


def main(empty_dir, one_dir, json_out):
    out = {"skips": SKIPS, "regimes": {}}
    bad = []
    for regime, d in [("empty", empty_dir), ("one_row", one_dir)]:
        res = parse(d, os.path.join(d, "_out")
                    if os.path.isdir(os.path.join(d, "_out"))
                    else d + "_out")
        for name, r in sorted(res.items()):
            if r["status"] == "fail" and name not in SKIPS:
                bad.append(f"{regime}:{name} {r['detail'][:120]}")
        n_ok = sum(1 for r in res.values() if r["status"] == "ok")
        out["regimes"][regime] = {
            "ok": n_ok, "fail": len(res) - n_ok, "rows": res}
        print(f"{regime}: {n_ok}/{len(res)} ok")
    with open(json_out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if bad:
        print("FAILING (not skipped):")
        for b in bad:
            print(" ", b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
