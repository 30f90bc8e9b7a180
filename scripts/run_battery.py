#!/usr/bin/env python
"""One-command seven-surface verification battery (VERDICT r7 item 7).

Generates the adversarial fixture family from a clean scale-factor dir,
runs the full oracle sweep against every surface (clean / adv / empty /
signmag / timeshift / longtext / unicode), optionally the pytest suite,
and prints one per-surface summary table.  Each sweep is a FRESH
subprocess (the same isolation the grading driver uses); surfaces run
sequentially because each sweep already saturates local[8] and the
longtext surface is a wall-clock gate whose timings must not be
polluted by a sibling sweep.

Usage::

    python scripts/run_battery.py                    # full battery, ~45 min
    python scripts/run_battery.py --no-suite         # sweeps only
    python scripts/run_battery.py --surfaces clean,adv,empty
    python scripts/run_battery.py --src /root/testdata/sf0.01 --out /tmp/advfix

Exit code 0 iff every selected sweep (and the suite, when run) passed.

The per-surface expectations encoded here mirror README "The full
verification battery" and SCALE.md: pinned-parquet oracles are
value-compared only on the clean corpus (digest-selected expected rows)
and run as crash-checks elsewhere, and on the TIMESHIFT surface exactly
the five pure-watermark streaming gates legitimately diverge (wildly
out-of-order arrival crosses the watermark, so the stream drops rows
the batch oracle keeps — the r7-documented by-design set).  Those five
are allow-listed for that surface only; any OTHER divergence anywhere,
including a sixth streaming divergence on timeshift, is a failure.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: surface name -> (fixture subdir under --out, pinned-skip?)
SURFACES: dict[str, tuple[str | None, bool]] = {
    "clean": (None, False),        # --src itself; pinned oracles value-compare
    "adv": ("adv", True),
    "empty": ("empty", True),
    "signmag": ("signmag", False),  # documents untouched: pinned still valid
    "timeshift": ("timeshift", True),
    "longtext": ("longtext", True),
    "unicode": ("unicode", True),
}

DONE_RE = re.compile(r"SWEEP DONE checked=(\d+) bad=(\d+)")

#: surface -> gates whose MISMATCH is documented by-design (SCALE.md §r7
#: timeshift: watermark late-drop on out-of-order arrival; the batch
#: oracle keeps rows the stream must evict).  Applies to MISMATCH only —
#: an ERROR on these gates still fails the surface.
ALLOWED_DIVERGENCE: dict[str, frozenset[str]] = {
    # streaming_rollup_merge left this set in round 8: its "by-design"
    # divergence was actually a sign-modulo row-vanish bug in the
    # landing-zone split (fixed; it now MATCHES on timeshift) — the
    # same lesson as r7's running_totals.  The four remaining are pure
    # watermark late-drop, and since round 9 that claim is MACHINE-
    # CHECKED: scripts/timeshift_waiver_check.py derives the exact
    # drop set (epoch-0 initial watermark) per gate and the battery
    # fails if the observed divergence is anything else.
    "timeshift": frozenset({
        "streaming_dedup",
        "streaming_enriched_windows",
        "streaming_hourly_windows",
        "streaming_sessionize",
    }),
}


def run_sweep(name: str, sf_dir: str, pinned_skip: bool) -> dict:
    env = dict(os.environ, SWEEP_SF=sf_dir)
    # a scoped SWEEP_ONLY left exported in the shell would silently
    # shrink every surface to a near-zero-coverage sweep that still
    # prints BATTERY PASS (review finding, round 8) — the battery is
    # by definition full-registry
    env.pop("SWEEP_ONLY", None)
    if pinned_skip:
        env["SWEEP_PINNED_SKIP"] = "1"
    else:
        env.pop("SWEEP_PINNED_SKIP", None)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "oracle_sweep.py")],
        env=env,
        cwd="/tmp",  # surface any repo-relative cwd assumptions
        capture_output=True,
        text=True,
    )
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    m = DONE_RE.search(out)
    # match the sweep's own per-gate line shapes ("<gate> MISMATCH ...",
    # "<gate> ERROR ...", "<gate> ORACLE-ERROR ...") rather than any
    # line containing ERROR — Spark log4j noise on a passing surface
    # must not read as findings (review finding, round 8)
    gate_line = re.compile(r"^([a-z][a-z0-9_]*)\s+(MISMATCH|ERROR|ORACLE-ERROR)\b")
    allowed = ALLOWED_DIVERGENCE.get(name, frozenset())
    mismatches, waived = [], []
    for line in out.splitlines():
        hit = gate_line.match(line)
        if not hit:
            continue
        if hit.group(2) == "MISMATCH" and hit.group(1) in allowed:
            waived.append(hit.group(1))
        else:
            mismatches.append(line)
    bad = int(m.group(2)) if m else -1
    return {
        "surface": name,
        # ok requires: summary line present, no unwaived gate lines,
        # every reported-bad gate accounted for by an allow-listed
        # waiver, AND a nonzero exit explained by those gate failures —
        # a crash AFTER "SWEEP DONE" (teardown, atexit) exits nonzero
        # with bad == 0 and previously read as PASS whenever the waiver
        # count happened to equal bad (review finding, round 9)
        "ok": m is not None and not mismatches
        and bad == len(waived)
        and (proc.returncode == 0 or bad > 0),
        "checked": int(m.group(1)) if m else 0,
        "bad": bad,
        "waived": waived,
        "wall_s": round(wall, 1),
        "mismatches": mismatches,
        "tail": out[-2000:] if proc.returncode != 0 and not m else "",
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", default="/root/testdata/sf0.01",
                    help="clean scale-factor dir the variants derive from")
    ap.add_argument("--out", default="/tmp/advfix",
                    help="fixture-family output dir")
    ap.add_argument("--surfaces", default=",".join(SURFACES),
                    help="comma-separated subset of: " + ", ".join(SURFACES))
    ap.add_argument("--no-suite", action="store_true",
                    help="skip the pytest suite")
    ap.add_argument("--no-gen", action="store_true",
                    help="reuse fixtures already present under --out")
    args = ap.parse_args()

    selected = [s for s in args.surfaces.split(",") if s]
    unknown = set(selected) - set(SURFACES)
    if unknown:
        ap.error(f"unknown surfaces: {sorted(unknown)}")

    if not args.no_gen and any(SURFACES[s][0] for s in selected):
        print(f"[battery] generating fixture family {args.src} -> {args.out}",
              flush=True)
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "gen_adversarial_fixture.py"),
             args.src, args.out],
            check=True,
        )

    results = []
    for name in selected:
        subdir, pinned_skip = SURFACES[name]
        sf_dir = args.src if subdir is None else os.path.join(args.out, subdir)
        print(f"[battery] sweep {name} @ {sf_dir} ...", flush=True)
        r = run_sweep(name, sf_dir, pinned_skip)
        if name == "timeshift":
            # every waiver must be DERIVED, not eyeballed: assert the
            # observed divergence equals exactly the epoch-initial-
            # watermark late-drop set (r7 and r8 each turned one
            # "by-design" waiver into a bug fix; round-9 item 3)
            print(f"[battery] timeshift waiver derivation @ {sf_dir} ...",
                  flush=True)
            t0 = time.time()
            wproc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "timeshift_waiver_check.py"),
                 sf_dir],
                cwd="/tmp", capture_output=True, text=True,
            )
            r["waiver_derivation_ok"] = wproc.returncode == 0
            r["ok"] = r["ok"] and r["waiver_derivation_ok"]
            tail = [ln for ln in wproc.stdout.splitlines()
                    if "DERIVED-MATCH" in ln or "FAIL" in ln or "!!" in ln
                    or ln.startswith("WAIVER CHECK")]
            for ln in tail[-10:]:
                print("   ", ln, flush=True)
            if wproc.returncode != 0 and not tail:
                print((wproc.stdout + wproc.stderr)[-1500:], flush=True)
            print(f"[battery] waiver derivation: "
                  f"{'OK' if r['waiver_derivation_ok'] else 'FAIL'} "
                  f"{round(time.time() - t0, 1)}s", flush=True)
        results.append(r)
        status = "OK" if r["ok"] else "FAIL"
        waived = f" waived={len(r['waived'])}" if r["waived"] else ""
        print(f"[battery] {name}: {status} checked={r['checked']} "
              f"bad={r['bad']}{waived} {r['wall_s']}s", flush=True)
        for line in r["mismatches"][:20]:
            print("   ", line, flush=True)
        if r["tail"]:
            print(r["tail"], flush=True)

    suite_ok = True
    if not args.no_suite:
        print("[battery] pytest tests/ -q ...", flush=True)
        suite_ok = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=REPO
        ).returncode == 0

    print("\n=== BATTERY SUMMARY ===")
    print(f"{'surface':<10} {'status':<6} {'checked':>7} {'bad':>4} "
          f"{'waived':>6} {'wall':>8}")
    for r in results:
        print(f"{r['surface']:<10} {'OK' if r['ok'] else 'FAIL':<6} "
              f"{r['checked']:>7} {r['bad']:>4} {len(r['waived']):>6} "
              f"{r['wall_s']:>7}s")
    if not args.no_suite:
        print(f"{'suite':<10} {'OK' if suite_ok else 'FAIL':<6}")
    all_ok = suite_ok and all(r["ok"] for r in results)
    print("BATTERY", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
