"""Property-based tests: chunk_dedup and fuzzy_match_blocked must agree
with independent brute-force Python oracles on arbitrary tiny corpora.

Hypothesis generates the corpora; each example costs one Spark pass, so
example counts stay small (the pinned-value unit tests carry the fast
regression load; these sweep the edge-case space)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from eventbridge_etl_spark.operators.dedup import chunk_dedup
from eventbridge_etl_spark.operators.linkage import fuzzy_match_blocked

WORDS = ["aa", "bb", "cc", "dd", "x"]

texts = st.lists(st.sampled_from(WORDS), min_size=1, max_size=11).map(" ".join)
corpora = st.lists(texts, min_size=1, max_size=5)


def _chunks(text: str, c: int = 4) -> list[str]:
    toks = re.split(r"\s+", text.strip())
    n = max(-(-len(toks) // c), 1)
    return [" ".join(toks[i * c:(i + 1) * c]) for i in range(n)]


def _chunk_dedup_oracle(docs: dict[int, str], c: int = 4):
    winner: dict[str, tuple[int, int]] = {}
    for did in sorted(docs):
        for idx, ch in enumerate(_chunks(docs[did], c)):
            if ch not in winner:
                winner[ch] = (did, idx)
    out = {}
    for did in sorted(docs):
        chs = _chunks(docs[did], c)
        kept = [ch for idx, ch in enumerate(chs) if winner[ch] == (did, idx)]
        out[did] = (" ".join(kept), len(chs) - len(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(corpora)
def test_chunk_dedup_matches_bruteforce(spark, docs_list):
    docs = {i + 1: t for i, t in enumerate(docs_list)}
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["new_text"], r["n_removed"])
        for r in chunk_dedup(df, chunk_tokens=4).collect()
    }
    assert got == _chunk_dedup_oracle(docs)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


names = st.lists(
    st.tuples(st.sampled_from(["red", "rad", "ted", "blue"]),
              st.sampled_from(["gear", "gears", "bolt"])).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None)
@given(names)
def test_fuzzy_match_matches_bruteforce(spark, name_list):
    rows = [(i + 1, n) for i, n in enumerate(name_list)]
    df = spark.createDataFrame(rows, "pid long, name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_match_blocked(df, "pid", "name", max_dist=2).collect()
    }
    distinct = sorted(set(name_list))
    expect = set()
    for i, a in enumerate(distinct):
        for b in distinct[i + 1:]:
            if a.split()[-1] != b.split()[-1]:
                continue
            d = _lev(a, b)
            if 1 <= d <= 2:
                x, y = sorted((a, b))
                expect.add((x, y, d))
    assert got == expect


# ------------------------------------------------- SCD2 vs brute force

from eventbridge_etl_spark.operators.scd import scd2_from_changelog  # noqa: E402

_scd_logs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),            # key
        st.integers(min_value=0, max_value=9),            # ts offset (days)
        st.sampled_from(["a", "b", None]),                # state (nullable)
    ),
    min_size=1,
    max_size=12,
)


def _scd2_oracle(rows):
    """Brute-force SCD2: per key, order by (ts, state with None first —
    matching Spark/DuckDB NULLS FIRST asc), collapse equal-adjacent,
    emit intervals."""
    import datetime as dt

    by_key = {}
    for k, off, seg in rows:
        by_key.setdefault(k, []).append((dt.datetime(2024, 1, 1 + off), seg))
    out = []
    for k, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1] is not None, e[1] or ""))
        runs = []
        for ts, seg in evs:
            if not runs or runs[-1][1] != seg:
                runs.append([ts, seg])
        for i, (ts, seg) in enumerate(runs):
            valid_to = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append((k, seg, ts, valid_to, i + 1, valid_to is None))
    return set(out)


@settings(max_examples=12, deadline=None)
@given(_scd_logs)
def test_scd2_matches_bruteforce(spark, rows):
    import datetime as dt

    df = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1 + off), seg) for k, off, seg in rows],
        "k long, ts timestamp, seg string",
    )
    got = {
        (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["version"],
         r["is_current"])
        for r in scd2_from_changelog(df, ["k"], "ts", ["seg"]).collect()
    }
    assert got == _scd2_oracle(rows)
