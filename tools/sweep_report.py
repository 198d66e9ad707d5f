"""Aggregate check_oracle sweep chunk logs into a markdown summary.

Usage:
    python tools/sweep_report.py /tmp/sf10_sweep_0.log [...]

Parses the PASS/FAIL/rows-only lines (tolerating Spark progress-bar
carriage returns) and prints totals, the slowest N queries, and the
largest result sets — the numbers SF1_PROOF.md records per rung.
"""

from __future__ import annotations

import re
import sys

LINE = re.compile(
    r"^(PASS|FAIL|rows-only)\s+(\S+?):\s+(?:(\d+) rows\s+)?(?:\[(\d+\.\d+)s\])?(.*)$"
)


def main() -> None:
    rows: list[tuple[str, str, int | None, float | None, str]] = []
    for path in sys.argv[1:]:
        with open(path, errors="replace") as f:
            text = f.read().replace("\r", "\n")
        for line in text.splitlines():
            m = LINE.match(line.strip())
            if m:
                status, name, n, dt, extra = m.groups()
                rows.append(
                    (status, name, int(n) if n else None, float(dt) if dt else None, extra.strip())
                )
    n_pass = sum(1 for r in rows if r[0] == "PASS")
    n_fail = sum(1 for r in rows if r[0] == "FAIL")
    n_ro = sum(1 for r in rows if r[0] == "rows-only")
    print(f"{n_pass} PASS, {n_fail} FAIL, {n_ro} rows-only  ({len(rows)} total)")
    for r in rows:
        if r[0] == "FAIL":
            print(f"  FAIL {r[1]}: {r[4]}")
    timed = sorted((r for r in rows if r[3]), key=lambda r: -r[3])
    print("\nslowest 15 (wall includes the DuckDB twin + row digesting):")
    for r in timed[:15]:
        print(f"  {r[1]}: {r[3]:.1f}s  ({r[2]} rows)")
    big = sorted((r for r in rows if r[2]), key=lambda r: -r[2])
    print("\nlargest 10 result sets:")
    for r in big[:10]:
        print(f"  {r[1]}: {r[2]:,} rows  [{r[3]:.1f}s]")


if __name__ == "__main__":
    main()
