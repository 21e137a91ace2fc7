#!/usr/bin/env python3
"""Sync README.md's test-count line from the committed JUnit reports
(target/test-reports/TEST-*.xml) — the count went stale at round close
three rounds running when maintained by hand. Run after `sbt test`:

    python3 tools/readme_counts.py
"""
import glob
import os
import re
import sys
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    reports = sorted(glob.glob(f"{ROOT}/target/test-reports/TEST-*.xml"))
    if not reports:
        sys.exit("no JUnit reports under target/test-reports — run `sbt test`")
    tests = failures = 0
    for r in reports:
        s = ET.parse(r).getroot()
        tests += int(s.get("tests", 0))
        failures += int(s.get("failures", 0)) + int(s.get("errors", 0))
    if failures:
        sys.exit(f"refusing to stamp a red suite: {failures} failures")
    path = f"{ROOT}/README.md"
    src = open(path).read()
    line = f"sbt test                                                       # {tests} tests, {len(reports)} suites"
    out, n = re.subn(r"^sbt test\s+# \d+ tests, \d+ suites$", line, src,
                     flags=re.M)
    if n != 1:
        sys.exit(f"expected exactly one test-count line in README.md, found {n}")
    if out != src:
        open(path, "w").write(out)
        print(f"README.md updated: {tests} tests, {len(reports)} suites")
    else:
        print(f"README.md already current: {tests} tests, {len(reports)} suites")


if __name__ == "__main__":
    main()
