"""Summarize an sf1_registry_sweep.sh log directory into the SCALE.md
results table: one row per chunk (gates checked / bad / wall seconds /
slowest gate), plus a flat list of any non-MATCH lines so a divergence
is impossible to miss.

Usage::

    python scripts/sweep_log_table.py /tmp/sf1_sweep
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

GATE = re.compile(
    r"^([a-z][a-z0-9_]*)\s+(MATCH|MISMATCH|ERROR|ORACLE-ERROR|FP-MATCH"
    r"|FP-MISMATCH|pinned-skip)\b.*?([0-9.]+)s?\s*$"
)
DONE = re.compile(r"^(?:SWEEP|FINGERPRINT) DONE .*bad=(\d+)")


def main() -> int:
    logdir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_sweep")
    rows, problems, grand = [], [], 0
    for log in sorted(logdir.glob("*.log")):
        checked = skipped = 0
        bad = None
        slowest = (0.0, "")
        total = 0.0
        for line in log.read_text().splitlines():
            g = GATE.match(line)
            if g:
                name, status, sec = g.group(1), g.group(2), g.group(3)
                if status == "pinned-skip":
                    skipped += 1
                    continue
                checked += 1
                try:
                    s = float(sec)
                    total += s
                    if s > slowest[0]:
                        slowest = (s, name)
                except ValueError:
                    pass
                if status not in ("MATCH", "FP-MATCH"):
                    problems.append(f"{log.stem}: {line.strip()}")
            d = DONE.match(line)
            if d:
                bad = int(d.group(1))
        if bad is None:
            problems.append(f"{log.stem}: NO DONE LINE (chunk crashed or timed out)")
        grand += checked
        rows.append(
            f"| {log.stem} | {checked} | {bad if bad is not None else '?'} "
            f"| {total:.0f} | {slowest[1]} {slowest[0]:.0f}s |"
        )
    print("| chunk | gates | bad | wall s | slowest |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(r)
    print(f"\ntotal value-compared gates: {grand}")
    if problems:
        print("\nPROBLEMS:")
        for p in problems:
            print(" ", p)
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
