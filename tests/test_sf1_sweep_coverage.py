"""The sf1 registry sweep must enumerate every gate, mechanically.

Round-12 finding: ``dedup_exact_casefold`` (added r12) was registered
and driver-gated but absent from every ``run_chunk`` list in
``scripts/sf1_registry_sweep.sh`` — nothing failed, the gate simply
never acquired sf1 evidence.  The sweep's completeness was a session
habit; this test makes it CI: every registry gate must either appear
in the sweep script (a ``run_chunk`` member or a special-routing arg —
ladders, fingerprint chunk, engine probe) or carry a documented
exclusion in ``scripts/sweep_log_table.py::BY_DESIGN``.
"""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _by_design() -> dict[str, str]:
    spec = importlib.util.spec_from_file_location(
        "sweep_log_table", os.path.join(REPO, "scripts", "sweep_log_table.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.BY_DESIGN


def test_every_gate_swept_or_excluded():
    from eventbridge_etl_spark import queries

    queries.load_all()
    script = open(
        os.path.join(REPO, "scripts", "sf1_registry_sweep.sh")
    ).read()
    # Only EXECUTABLE routing counts: strip comments and echo lines
    # before tokenizing, or a gate whose name survives in a narrative
    # comment after losing its run_chunk slot would still "pass" —
    # precisely the silent-evidence-loss this test exists to catch.
    code_lines = []
    for line in script.splitlines():
        line = line.split("#", 1)[0]
        if line.strip().startswith("echo"):
            continue
        code_lines.append(line)
    code = "\n".join(code_lines)
    mentioned = set(re.findall(r"[a-z0-9_]+", code))
    by_design = _by_design()

    # Gates whose sf1 evidence comes from a dedicated ladder script
    # that does not take the gate name as an argument.  The mapping is
    # only honored if the ladder is actually INVOKED on a code line —
    # a commented-out ladder stops counting.
    ladder_routed = {"graph_triangle_census": "census_ladder_sf1.py"}
    for gate, ladder in ladder_routed.items():
        if ladder in code:
            mentioned.add(gate)

    unrouted = [
        n
        for n in queries.QUERIES
        if n not in mentioned and n not in by_design
    ]
    assert not unrouted, (
        "registry gates with NO sf1 sweep routing and no documented "
        f"BY_DESIGN exclusion: {unrouted} — add them to a run_chunk "
        "list in scripts/sf1_registry_sweep.sh or document the "
        "exclusion in scripts/sweep_log_table.py"
    )

    # an exclusion for a gate that no longer exists is stale bookkeeping
    stale = [n for n in by_design if n not in queries.QUERIES]
    assert not stale, f"BY_DESIGN exclusions for unknown gates: {stale}"
