#!/usr/bin/env python3
"""Differential fuzz gate: compare every seed dumped by
`sbt "runMain graft.tools.Fuzz <lo> <hi> <base>"` against DuckDB.

Each seed directory is laid out exactly like a driver fixture dir
(single-file tables) with the Spark results under `_out/`, so this is
just compare_oracle.main per seed.

Usage: fuzz_gate.py <base>            # e.g. /tmp/graft_fuzz
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare_oracle


def main(base):
    seeds = sorted(glob.glob(os.path.join(base, "seed*")),
                   key=lambda p: int(p.rsplit("seed", 1)[1]))
    if not seeds:
        print(f"no seed dirs under {base}")
        return 2
    bad = []
    for sd in seeds:
        print(f"--- {os.path.basename(sd)} ---")
        rc = compare_oracle.main(sd, os.path.join(sd, "_out"))
        if rc:
            bad.append(os.path.basename(sd))
    print(f"== fuzz: {len(seeds) - len(bad)}/{len(seeds)} seeds green"
          + (f", FAILING: {bad}" if bad else " =="))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
