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


# ------------------------------------------- OHLC bars vs brute force

from eventbridge_etl_spark.operators.timeseries import ohlc_bars  # noqa: E402

_ev_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),     # hour
        st.integers(min_value=0, max_value=59),    # minute
        st.sampled_from(["a", "b"]),               # type
        st.integers(min_value=-5, max_value=50),   # value (int-valued double)
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=10, deadline=None)
@given(_ev_rows)
def test_ohlc_matches_bruteforce(spark, rows):
    import datetime as dt

    data = [
        (i, dt.datetime(2024, 1, 1, h, m), 1, t, float(v), None)
        for i, (h, m, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    got = {
        (r["event_type"], r["bucket"].hour): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"], r["volume"]
        )
        for r in ohlc_bars(df).collect()
    }
    expect = {}
    for t in {r[2] for r in rows}:
        for h in {r[0] for r in rows if r[2] == t}:
            grp = sorted(
                (i, v) for i, (hh, m, tt, v) in enumerate(rows)
                if tt == t and hh == h
            )
            ordered = sorted(
                grp,
                key=lambda iv: (data[iv[0]][1], iv[0]),  # (ts, event_id)
            )
            vals = [float(v) for _, v in grp]
            expect[(t, h)] = (
                float(ordered[0][1]), max(vals), min(vals),
                float(ordered[-1][1]), len(vals), round(sum(vals), 2),
            )
    assert got == expect


# ----------------------------------------- gap-fill grid vs brute force

from eventbridge_etl_spark.operators.timeseries import gap_fill_hourly  # noqa: E402

_gap_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),     # user
        st.integers(min_value=0, max_value=8),     # hour
        st.integers(min_value=0, max_value=59),    # minute
        st.integers(min_value=0, max_value=9),     # value
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=10, deadline=None)
@given(_gap_rows)
def test_gap_fill_matches_bruteforce(spark, rows):
    import datetime as dt

    # one observation per (user, timestamp); the enumerated event_id is
    # the tiebreak key gap_fill_hourly requires for deterministic picks
    uniq = {(u, h, m): v for u, h, m, v in rows}
    data = [
        (i, u, dt.datetime(2024, 1, 1, h, m), float(v))
        for i, ((u, h, m), v) in enumerate(sorted(uniq.items()))
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )
    data = [(u, ts, v) for _, u, ts, v in data]
    got = {
        (r["user_id"], r["hour"].hour): (r["n_events"], r["last_value"], r["filled_value"])
        for r in gap_fill_hourly(df).collect()
    }
    expect = {}
    for u in {r[0] for r in rows}:
        obs = sorted((ts, v) for uu, ts, v in data if uu == u)
        h0, h1 = obs[0][0].hour, obs[-1][0].hour
        carry = None
        for h in range(h0, h1 + 1):
            in_hour = [(ts, v) for ts, v in obs if ts.hour == h]
            last = max(in_hour)[1] if in_hour else None
            if last is not None:
                carry = last
            expect[(u, h)] = (len(in_hour), last, carry)
    assert got == expect


# --------------------------------------------- funnel vs brute force

from eventbridge_etl_spark.operators.funnel import funnel_steps  # noqa: E402

_funnel_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),                  # user
        st.integers(min_value=0, max_value=30),                 # minute
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=16,
)


def _funnel_oracle(data, steps=("view", "click", "purchase")):
    """First qualifying ts per step, step i strictly after step i-1."""
    out = {}
    by_user = {}
    for eid, (u, ts, tp) in enumerate(data):
        by_user.setdefault(u, []).append((ts, tp))
    for u, evs in by_user.items():
        prev, times = None, []
        for step in steps:
            cands = [ts for ts, tp in evs
                     if tp == step and (prev is None or ts > prev)]
            cur = min(cands) if cands else None
            times.append(cur)
            if cur is None:
                break
            prev = cur
        if times[0] is None:
            continue
        times += [None] * (len(steps) - len(times))
        out[u] = (tuple(times), sum(1 for t in times if t is not None))
    return out


@settings(max_examples=12, deadline=None)
@given(_funnel_rows)
def test_funnel_matches_bruteforce(spark, rows):
    import datetime as dt

    # unique (user, ts): ties between different step types at the same
    # instant make "strictly after" order-dependent — out of contract
    uniq = {(u, m): tp for u, m, tp in rows}
    data = [
        (u, dt.datetime(2024, 1, 1, 0, m), tp)
        for (u, m), tp in sorted(uniq.items())
    ]
    df = spark.createDataFrame(
        [(i, u, ts, tp, 0.0) for i, (u, ts, tp) in enumerate(data)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {
        r["user_id"]: (
            (r["step_1_ts"], r["step_2_ts"], r["step_3_ts"]), r["n_steps"]
        )
        for r in funnel_steps(df).collect()
    }
    assert got == _funnel_oracle(data)


# ------------------------------- weighted PPS sampling vs brute force

from eventbridge_etl_spark.operators.sampling import (  # noqa: E402
    weighted_systematic_sample,
)

_pps_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=40),   # doc id (dedup below)
        st.sampled_from(["s1", "s2"]),            # source
        st.integers(min_value=1, max_value=500),  # weight
    ),
    min_size=1,
    max_size=12,
)


def _pps_oracle(rows, k):
    import hashlib

    out = set()
    for src in {r[1] for r in rows}:
        grp = [(i, w) for i, s, w in rows if s == src]
        grp.sort(key=lambda iw: (hashlib.md5(str(iw[0]).encode()).hexdigest(), iw[0]))
        total = sum(w for _, w in grp)
        wi = 0
        for i, w in grp:
            lo, hi = wi, wi + w
            n_hi = (hi * k + total - 1) // total
            n_lo = (lo * k + total - 1) // total
            if n_hi > n_lo:
                out.add(i)
            wi = hi
    return out


@settings(max_examples=12, deadline=None)
@given(_pps_rows)
def test_weighted_pps_matches_bruteforce(spark, rows):
    uniq = {r[0]: r for r in rows}.values()  # unique ids
    rows = sorted(uniq)
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    got = {
        r["doc_id"]
        for r in weighted_systematic_sample(
            df, "doc_id", "w", k=4, group_col="source"
        ).collect()
    }
    assert got == _pps_oracle(rows, 4)


@settings(max_examples=8, deadline=None)
@given(_pps_rows)
def test_weighted_pps_ungrouped_matches_bruteforce(spark, rows):
    """The two-pass global path must equal the naive global cumsum."""
    rows = sorted({r[0]: (r[0], "g", r[2]) for r in rows}.values())
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    got = {
        r["doc_id"]
        for r in weighted_systematic_sample(df, "doc_id", "w", k=3).collect()
    }
    assert got == _pps_oracle(rows, 3)


def test_weighted_pps_ungrouped_scales_without_global_sort(spark):
    """1e6 rows through the ungrouped two-pass path: the selection must
    equal the single-machine reference cumsum AND be identical under a
    different input partitioning (range boundaries are internal detail).
    The full-data windows partition by _pid — the only single-partition
    window runs over the P subtotal rows."""
    import hashlib

    from pyspark.sql import functions as F

    n, k = 1_000_000, 1000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100 + 1).cast("long").alias("w"),
    )
    out = weighted_systematic_sample(df, "doc_id", "w", k=k)
    # plan shape: the data-sized window partitions by the md5-prefix
    # bucket (256-way hash exchange); no global sort of the fact
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_bkt" in plan
    got = {r["doc_id"] for r in out.collect()}

    # reference: global order by (md5(key), key), integer selection
    order = sorted(range(n), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    total = sum(i % 100 + 1 for i in range(n))
    expect, wi = set(), 0
    for i in order:
        w = i % 100 + 1
        if ((wi + w) * k + total - 1) // total > (wi * k + total - 1) // total:
            expect.add(i)
        wi += w
    assert got == expect
    assert len(got) <= k

    got2 = {
        r["doc_id"]
        for r in weighted_systematic_sample(
            df.repartition(7), "doc_id", "w", k=k
        ).collect()
    }
    assert got2 == expect


# ------------------------------------ sessionize vs brute force

from eventbridge_etl_spark.operators.timeseries import sessionize  # noqa: E402

_sess_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),      # user
        st.integers(min_value=0, max_value=7200),   # second offset
        st.integers(min_value=0, max_value=9),      # value
    ),
    min_size=1,
    max_size=18,
)


@settings(max_examples=12, deadline=None)
@given(_sess_rows)
def test_sessionize_matches_bruteforce(spark, rows):
    import datetime as dt

    gap = 600
    uniq = sorted({(u, s): v for u, s, v in rows}.items())
    data = [
        (i, u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), float(v))
        for i, ((u, s), v) in enumerate(uniq)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["session_seq"]): (
            r["session_start"], r["session_end"], r["n_events"],
            r["duration_secs"], r["sum_value"],
        )
        for r in sessionize(df, gap_seconds=gap).collect()
    }
    expect = {}
    for u in {d[1] for d in data}:
        obs = sorted((ts, v) for _, uu, ts, v in data if uu == u)
        seq, cur = 0, []
        sessions = []
        for ts, v in obs:
            if cur and (ts - cur[-1][0]).total_seconds() > gap:
                sessions.append(cur)
                cur = []
            cur.append((ts, v))
        sessions.append(cur)
        for k, sess in enumerate(sessions, start=1):
            tss = [t for t, _ in sess]
            expect[(u, k)] = (
                min(tss), max(tss), len(sess),
                int((max(tss) - min(tss)).total_seconds()),
                round(sum(v for _, v in sess), 4),
            )
    assert got == expect


# ----------------------------- round-5 tail: NB / triangle / heavy hitters

import math as _math

from eventbridge_etl_spark.operators.classify import naive_bayes_self_score
from eventbridge_etl_spark.operators.graph import triangle_count
from eventbridge_etl_spark.operators.sketch import heavy_hitters

_nb_texts = st.lists(st.sampled_from(WORDS), min_size=1, max_size=6).map(" ".join)
_nb_corpora = st.lists(
    st.tuples(_nb_texts, st.sampled_from(["p", "q"])), min_size=2, max_size=6
).filter(lambda rows: len({lbl for _, lbl in rows}) == 2)


def _nb_oracle(docs):
    """Independent add-one multinomial NB with the operator's rounding
    discipline (per-term round-6, exact decimal-free integer sums)."""
    from collections import Counter
    from decimal import Decimal

    ct: Counter = Counter()
    ctot: Counter = Counter()
    pri: Counter = Counter()
    vocab = set()
    for did, (text, lbl) in docs.items():
        toks = re.split(r"\s+", text.strip().lower())
        pri[lbl] += 1
        for t in toks:
            ct[(lbl, t)] += 1
            ctot[lbl] += 1
            vocab.add(t)
    v = len(vocab)
    ndocs = sum(pri.values())
    out = {}
    for did, (text, _) in docs.items():
        toks = re.split(r"\s+", text.strip().lower())
        best = None
        for lbl in sorted(pri):
            s = Decimal(str(round(_math.log(pri[lbl] / ndocs), 6)))
            zero = Decimal(str(round(_math.log(1.0 / (ctot[lbl] + v)), 6)))
            for t in toks:
                if ct[(lbl, t)]:
                    s += Decimal(
                        str(round(_math.log((ct[(lbl, t)] + 1) / (ctot[lbl] + v)), 6))
                    )
                else:
                    s += zero
            if best is None or s > best[1]:
                best = (lbl, s)
        out[did] = (best[0], float(best[1]))
    return out


@settings(max_examples=10, deadline=None)
@given(_nb_corpora)
def test_naive_bayes_matches_bruteforce(spark, rows):
    docs = {i + 1: rc for i, rc in enumerate(rows)}
    df = spark.createDataFrame(
        [(k, t, l) for k, (t, l) in docs.items()], "doc_id long, text string, lang string"
    )
    got = {
        r.doc_id: (r.pred_label, r.nb_score)
        for r in naive_bayes_self_score(df).collect()
    }
    exp = _nb_oracle(docs)
    assert set(got) == set(exp)
    for did in exp:
        assert got[did][0] == exp[did][0], (did, got[did], exp[did])
        assert abs(got[did][1] - exp[did][1]) < 1e-9


_edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=0, max_size=20
)


def _triangle_oracle(pairs):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = {n for e in edges for n in e}
    tri = 0
    ns = sorted(nodes)
    for i, x in enumerate(ns):
        for y in ns[i + 1:]:
            for z in ns[ns.index(y) + 1:]:
                if (
                    (x, y) in edges and tuple(sorted((y, z))) in edges
                    and tuple(sorted((x, z))) in edges
                ):
                    tri += 1
    return len(nodes), len(edges), tri


@settings(max_examples=12, deadline=None)
@given(_edge_lists)
def test_triangle_count_matches_bruteforce(spark, pairs):
    df = spark.createDataFrame(
        pairs + [(99, 98)], "a long, b long"  # ensure non-empty frame
    )
    row = triangle_count(df).collect()[0]
    n_nodes, n_edges, tri = _triangle_oracle(pairs + [(99, 98)])
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (n_nodes, n_edges, tri)


_hh_streams = st.lists(st.sampled_from(["h", "w", "c1", "c2", "c3", "c4"]),
                       min_size=1, max_size=60)


@settings(max_examples=10, deadline=None)
@given(_hh_streams, st.integers(2, 5))
def test_heavy_hitters_matches_exact(spark, vals, parts):
    from collections import Counter

    df = spark.createDataFrame([(v,) for v in vals], ["v"]).repartition(parts)
    out = heavy_hitters(df, "v", threshold_ratio=0.25, sketch_counters=8)
    got = {(r.value, r.n) for r in out.collect()}
    cnt = Counter(vals)
    n = len(vals)
    exp = {(k, c) for k, c in cnt.items() if c > n * 0.25}
    assert got == exp
