#!/usr/bin/env python3
"""Round-close helper: aggregate the ScalaTest report XMLs so the README
test count is generated, not typed (it drifted by hand two rounds in a
row). Prints the count line and, with --patch, rewrites the README's
`sbt test` comment in place.

Usage: test_counts.py [--patch] [reports_dir] [readme]
"""
import re
import sys
import xml.etree.ElementTree as ET
from pathlib import Path


def counts(reports_dir):
    suites = tests = failures = errors = 0
    for p in sorted(Path(reports_dir).glob("TEST-*.xml")):
        root = ET.parse(p).getroot()
        for ts in ([root] if root.tag == "testsuite"
                   else root.iter("testsuite")):
            suites += 1
            tests += int(ts.get("tests", 0))
            failures += int(ts.get("failures", 0))
            errors += int(ts.get("errors", 0))
    return suites, tests, failures, errors


def main(argv):
    patch = "--patch" in argv
    argv = [a for a in argv if a != "--patch"]
    reports = argv[0] if argv else "target/test-reports"
    readme = argv[1] if len(argv) > 1 else "README.md"
    suites, tests, failures, errors = counts(reports)
    line = f"{tests} tests / {suites} suites"
    print(f"{line} ({failures} failures, {errors} errors)")
    if failures or errors:
        return 1
    if patch:
        text = Path(readme).read_text()
        new = re.sub(r"\d+ tests / \d+ suites", line, text)
        if new != text:
            Path(readme).write_text(new)
            print(f"patched {readme}")
        else:
            print(f"{readme} already current")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
