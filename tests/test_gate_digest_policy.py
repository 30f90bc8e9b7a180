"""CI side of the changed-gates-preempt rule (VERDICT r11 #3).

The full value check (run every gate, diff digests against
``data/gate_digests.json``) needs a ~15-minute Spark pass and lives in
``scripts/preclose_gate_check.py`` — mandatory at round close.  These
tests are the fast invariants that hold the mechanism together between
closes: the baseline's bookkeeping must track the registry exactly
(a new gate missing a stamp must sit in the window head; a stamped
gate must still exist), and the checker's violation logic itself is
pinned against synthetic hash files so a regression in the script
can't silently pass everything.
"""

from __future__ import annotations

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "data", "gate_digests.json")


def _registry():
    sys.path.insert(0, REPO)
    import __spark_entry__ as m

    return m.queries()  # load_all() has run: gate-priority order


def _checker():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    return importlib.import_module("preclose_gate_check")


def test_baseline_tracks_registry_exactly():
    doc = json.load(open(BASELINE))
    digests = doc["digests"]
    registry = _registry()
    window = set(list(registry)[:50])

    # every stamped gate still exists (no orphan digests masking drops)
    orphans = sorted(set(digests) - set(registry))
    assert not orphans, f"baseline stamps gates no longer registered: {orphans}"

    # every registry gate is stamped OR is a new gate in the window
    # head (slot-policy rule 1) awaiting its first round-close stamp
    unstamped = sorted(set(registry) - set(digests))
    outside = [g for g in unstamped if g not in window]
    assert not outside, (
        f"gates with no baseline digest outside the window head: "
        f"{outside} — new gates must take a window slot and be stamped "
        f"at round close (scripts/preclose_gate_check.py --stamp)"
    )

    # digest values look like md5 hex — a truncated/garbled stamp file
    # would otherwise flag every gate as changed at the next close
    assert all(
        isinstance(h, str) and len(h) == 32 for h in digests.values()
    ), "malformed digest in baseline"


def test_checker_flags_out_of_window_changes(tmp_path, monkeypatch):
    chk = _checker()
    base = {
        "_meta": {"stamped_round": "test"},
        "digests": {"g_in": "a" * 32, "g_out": "b" * 32, "g_same": "c" * 32},
    }
    bp = tmp_path / "base.json"
    bp.write_text(json.dumps(base))
    monkeypatch.setattr(chk, "BASELINE", str(bp))
    monkeypatch.setattr(chk, "window_head", lambda: ["g_in", "g_new_in"])

    # change inside the window + unchanged gate: OK
    hf = tmp_path / "ok.txt"
    hf.write_text(f"g_in {'d' * 32}\ng_out {'b' * 32}\ng_same {'c' * 32}\n")
    assert chk.main([str(hf)]) == 0

    # change OUTSIDE the window: violation
    hf2 = tmp_path / "bad.txt"
    hf2.write_text(f"g_in {'a' * 32}\ng_out {'e' * 32}\ng_same {'c' * 32}\n")
    assert chk.main([str(hf2)]) == 1

    # new gate outside the window: violation; inside: OK
    hf3 = tmp_path / "new_out.txt"
    hf3.write_text(
        f"g_in {'a' * 32}\ng_out {'b' * 32}\ng_same {'c' * 32}\n"
        f"g_new_out {'f' * 32}\n"
    )
    assert chk.main([str(hf3)]) == 1
    hf4 = tmp_path / "new_in.txt"
    hf4.write_text(
        f"g_in {'a' * 32}\ng_out {'b' * 32}\ng_same {'c' * 32}\n"
        f"g_new_in {'f' * 32}\n"
    )
    assert chk.main([str(hf4)]) == 0

    # ERROR line or a vanished gate: violation (a crash must not read
    # as "no diff")
    hf5 = tmp_path / "err.txt"
    hf5.write_text(
        f"g_in ERROR SomeException: boom\ng_out {'b' * 32}\n"
        f"g_same {'c' * 32}\n"
    )
    assert chk.main([str(hf5)]) == 1
    hf6 = tmp_path / "vanish.txt"
    hf6.write_text(f"g_in {'a' * 32}\ng_same {'c' * 32}\n")
    assert chk.main([str(hf6)]) == 1


def test_checker_stamp_rewrites_baseline(tmp_path, monkeypatch):
    chk = _checker()
    base = {"_meta": {"stamped_round": "test"}, "digests": {"g_in": "a" * 32}}
    bp = tmp_path / "base.json"
    bp.write_text(json.dumps(base))
    monkeypatch.setattr(chk, "BASELINE", str(bp))
    monkeypatch.setattr(chk, "window_head", lambda: ["g_in"])

    hf = tmp_path / "head.txt"
    hf.write_text(f"g_in {'d' * 32}\n")
    assert chk.main([str(hf), "--stamp"]) == 0
    assert json.load(open(bp))["digests"] == {"g_in": "d" * 32}
