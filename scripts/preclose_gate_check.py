"""Round-close enforcement of the changed-gates-preempt rule
(COVERAGE.md §"Driver-window slot policy" rule 2; VERDICT r11 #3).

The committed baseline ``data/gate_digests.json`` records, for every
registry gate, the md5 of its canonicalized sf0.01 engine output at the
most recent round close — i.e. the last tree the driver certified.  A
gate whose digest AT HEAD differs from the baseline has had a VALUE
change since its last driver evidence, and the slot policy says it MUST
occupy a window-head slot in the upcoming round.  r10 missed exactly
this for nine rewritten gates; this script makes the rule mechanical
instead of a session habit.

Usage (round close, after the last engine change)::

    python scripts/engine_hash.py > /tmp/hash_head.txt   # ~15 min full
    python scripts/preclose_gate_check.py /tmp/hash_head.txt
    # fix any violation (re-list the gate in _GATE_PRIORITY's window)
    python scripts/preclose_gate_check.py /tmp/hash_head.txt --stamp
    git add data/gate_digests.json && git commit ...

Checks, each fatal:

1. Every gate whose HEAD digest differs from the baseline is inside the
   upcoming driver window (the first ``WINDOW`` names of
   ``_GATE_PRIORITY`` present in the registry).
2. Every gate NEW at HEAD (in the registry, absent from the baseline)
   is inside the window (slot-policy rule 1: never-driver-checked
   gates always take a slot).
3. No gate hashed ``ERROR`` at HEAD, and no baseline gate vanished
   from the hash file (a crash or a silent registry drop must fail the
   close, not slide by as "no diff").

``--stamp`` rewrites the baseline from the hash file AFTER the checks
pass (violations must be fixed first, not papered over) so the next
round diffs against this round's close.  The un-stamped baseline plus
the committed SHA in ``_meta`` remain the audit artifact: a judge can
regenerate either side.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASELINE = os.path.join(REPO, "data", "gate_digests.json")
WINDOW = 50  # the driver checks the first ~50 registered queries


def window_head() -> list[str]:
    import __spark_entry__ as m

    registry = m.queries()  # runs load_all(): gate-priority order
    return list(registry)[:WINDOW]


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 2
    hash_file, stamp = argv[0], "--stamp" in argv[1:]
    head: dict[str, str] = {}
    errors: list[str] = []
    with open(hash_file) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                if parts[1] == "ERROR":
                    errors.append(line.strip())
                else:
                    head[parts[0]] = parts[1]
    base = json.load(open(BASELINE))["digests"]
    window = set(window_head())

    changed = sorted(g for g in head if g in base and head[g] != base[g])
    new = sorted(g for g in head if g not in base)
    vanished = sorted(g for g in base if g not in head and not any(
        e.startswith(g + " ") for e in errors
    ))

    violations: list[str] = []
    for g in changed:
        if g not in window:
            violations.append(
                f"VALUE-CHANGED gate outside the window head: {g} "
                f"(baseline {base[g][:8]} -> head {head[g][:8]}) — "
                f"re-list it in _GATE_PRIORITY's window (slot-policy rule 2)"
            )
    for g in new:
        if g not in window:
            violations.append(
                f"NEW gate outside the window head: {g} — never "
                f"driver-checked gates always take a slot (rule 1)"
            )
    for e in errors:
        violations.append(f"gate ERRORED during hashing: {e}")
    for g in vanished:
        violations.append(
            f"baseline gate missing from the hash file: {g} — registry "
            f"drop or partial hash run; hash the full registry at close"
        )

    print(
        f"gates hashed={len(head)} changed={len(changed)} new={len(new)} "
        f"errors={len(errors)} vanished={len(vanished)} "
        f"window_head={len(window)}"
    )
    for g in changed:
        mark = "in-window" if g in window else "VIOLATION"
        print(f"  changed: {g} [{mark}]")
    for g in new:
        mark = "in-window" if g in window else "VIOLATION"
        print(f"  new:     {g} [{mark}]")
    if violations:
        print("\nFAIL — the upcoming window head does not cover:")
        for v in violations:
            print(f"  - {v}")
        return 1
    if stamp:
        doc = json.load(open(BASELINE))
        doc["digests"] = dict(sorted(head.items()))
        doc["_meta"]["stamped_round"] = os.environ.get(
            "STAMP_NOTE", doc["_meta"].get("stamped_round", "")
        )
        with open(BASELINE, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
        print(f"stamped {len(head)} digests into {BASELINE}")
    print("OK — every value-changed/new gate is in the upcoming window head")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
