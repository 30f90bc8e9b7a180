"""Pin the verification scripts' shared contracts.

scripts/engine_hash.py must build its SparkSession EXACTLY like
scripts/oracle_sweep.py — same timezone, parquet-nanos handling, and
shuffle partitioning — or its engine hashes stop being comparable with
sweep behavior and the driver-window value-identity check silently
skews.  The scripts stay deliberately self-contained (engine_hash.py is
copied into worktrees of OLD commits where a shared helper module may
not exist), so this test is the anti-drift mechanism: it extracts the
builder chain from both sources and asserts literal identity.
"""

from __future__ import annotations

import re
from pathlib import Path

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _session_block(source: str) -> list[tuple[str, str]]:
    """(key, value-expression) pairs of the SparkSession builder chain."""
    m = re.search(
        r"SparkSession\.builder\.master\((?P<master>[^\n]+)\)\n"
        r"(?P<confs>(?:\s*\.config\([^\n]+\)\n)+)",
        source,
    )
    assert m, "SparkSession builder chain not found"
    pairs = [("master", m.group("master").strip())]
    for cm in re.finditer(r'\.config\("([^"]+)",\s*([^\n]+?)\)\n', m.group("confs")):
        pairs.append((cm.group(1), cm.group(2).strip()))
    return pairs


def test_engine_hash_session_config_matches_oracle_sweep():
    sweep = _session_block((SCRIPTS / "oracle_sweep.py").read_text())
    ehash = _session_block((SCRIPTS / "engine_hash.py").read_text())
    assert ehash == sweep, (
        "engine_hash.py's SparkSession config drifted from oracle_sweep.py's —"
        " value-identity hashes are only meaningful under the sweep config;"
        f" sweep={sweep} engine_hash={ehash}"
    )


def test_both_scripts_validate_sweep_only_loudly():
    for name in ("oracle_sweep.py", "engine_hash.py"):
        src = (SCRIPTS / name).read_text()
        assert "SWEEP_ONLY names not in the registry" in src, name
