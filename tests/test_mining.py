"""Unit tests for the corpus-mining operators: Naive Bayes self-scoring,
BM25 retrieval, and the degree-oriented triangle census."""

from __future__ import annotations

import math

import pytest

from eventbridge_etl_spark.operators.classify import naive_bayes_self_score
from eventbridge_etl_spark.operators.graph import triangle_count
from eventbridge_etl_spark.operators.retrieval import bm25_topk


# ------------------------------------------------------- Naive Bayes

def test_naive_bayes_separable_corpus(spark):
    """Clearly separable vocabularies -> every doc classified back to
    its own label, scores strictly ordered."""
    rows = [
        (1, "aaa aaa bbb", "x"),
        (2, "aaa bbb bbb", "x"),
        (3, "ccc ddd ccc", "y"),
        (4, "ddd ccc ddd", "y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = naive_bayes_self_score(df).collect()
    assert len(out) == 4
    assert all(r.is_correct for r in out)
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].pred_label == "x" and by_id[3].pred_label == "y"


def test_naive_bayes_score_formula(spark):
    """Pin the closed-form score on a one-doc-per-class corpus."""
    rows = [(1, "a a", "x"), (2, "b b", "y")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r for r in naive_bayes_self_score(df).collect()}
    # For doc 1 scored under class x: prior ln(1/2); V=2 tokens {a,b},
    # N_x=2; logp(a|x) = ln(3/4) rounded; both tokens matched.
    expect = round(math.log(0.5), 6) + 2 * round(math.log(3.0 / 4.0), 6)
    assert out[1].pred_label == "x"
    assert out[1].nb_score == pytest.approx(expect, abs=1e-9)


def test_naive_bayes_tiebreak_deterministic(spark):
    """Identical class likelihoods -> argmax breaks on label asc."""
    rows = [(1, "t", "x"), (2, "t", "y")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r for r in naive_bayes_self_score(df).collect()}
    # Both classes see the same counts, so scores tie; 'x' < 'y' wins.
    assert out[1].pred_label == "x" and out[2].pred_label == "x"
    assert out[1].is_correct and not out[2].is_correct


def test_naive_bayes_fixture_accuracy(spark, tables):
    """On the synthetic documents table the self-trained classifier
    beats the majority-class baseline (the fixture text is generated
    noise with only a weak lang signal, so this is the meaningful
    bound — separability itself is pinned by the hand-built corpora
    above)."""
    doc = tables["documents"]
    out = naive_bayes_self_score(doc).toPandas()
    assert len(out) == doc.count()
    acc = out["is_correct"].mean()
    majority = doc.groupBy("lang").count().toPandas()["count"].max() / len(out)
    assert acc > float(majority)


# ------------------------------------------------------------- BM25

def test_bm25_prefers_term_dense_docs(spark):
    rows = [
        (1, "apple apple apple banana"),
        (2, "apple banana cherry durian"),
        (3, "cherry durian elderberry fig"),
        (4, "apple apple banana banana"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(df, n_terms=2, k=10).collect()
    # Ranks are 1..n, contiguous, deterministic.
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    ids = [r.doc_id for r in out]
    # Doc 3 matches at most one query term weakly; never first.
    assert ids[0] != 3
    scores = [r.bm25_score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_k_bounds_output(spark):
    rows = [(i, "common filler") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(df, n_terms=1, k=5).collect()
    assert len(out) == 5
    # All-identical docs: scores tie, so the tie-break is doc_id asc.
    assert [r.doc_id for r in out] == [0, 1, 2, 3, 4]


# --------------------------------------------------- triangle census

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["a", "b"])


def test_triangle_count_k4(spark):
    """Complete graph on 4 nodes: 4 triangles, C(4,2)=6 edges."""
    pairs = [(i, j) for i in range(4) for j in range(4) if i < j]
    row = triangle_count(_edges(spark, pairs)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)


def test_triangle_count_square_no_diagonal(spark):
    """4-cycle: wedges exist, zero triangles."""
    row = triangle_count(
        _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    ).collect()[0]
    assert row.n_triangles == 0
    assert row.n_edges == 4 and row.n_nodes == 4
    assert row.n_wedges > 0


def test_triangle_count_normalizes_input(spark):
    """Duplicates, reversed orientation, and self-loops don't change
    the census."""
    messy = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3)]
    row = triangle_count(_edges(spark, messy)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        3,
        3,
        1,
        1,
    )


def test_triangle_count_star_skew(spark):
    """A hub of degree 12 with no closing edges: orientation sends all
    hub edges INTO the hub (leaves have lower degree), so wedge count
    is 0 — the skew-resistance property, not just correctness."""
    pairs = [(0, i) for i in range(1, 13)]
    row = triangle_count(_edges(spark, pairs)).collect()[0]
    assert row.n_triangles == 0
    assert row.n_wedges == 0


# ----------------------------------------------- perceptual hashing

import os as _os

import numpy as np

from eventbridge_etl_spark.operators.multimodal import (
    attach_payload,
    perceptual_hash,
    phash_near_dup_pairs,
)

FIXTURE_DIR = _os.path.join(_os.path.dirname(__file__), "data")


def _pgm(w, h, fn):
    vals = bytes(fn(x, y) for y in range(h) for x in range(w))
    return b"P5\n%d %d\n255\n" % (w, h) + vals


def _ref_ahash(vals, w, h):
    """Independent reference aHash (same spec, separate code path)."""
    px = np.asarray(vals, dtype=np.float64).reshape(h, w)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    cells = px[ys][:, xs].ravel()
    bits = cells > cells.mean()
    return int.from_bytes(np.packbits(bits.astype(np.uint8)).tobytes(), "big", signed=True)


def _hash_df(spark, rows, mime="image/x-portable-graymap", fake=False):
    df = spark.createDataFrame(
        [(i, bytearray(d)) for i, d in rows], "doc_id long, raw binary"
    )
    wrapped = attach_payload(df, "raw", mime=mime)
    return {r.id: r.phash for r in perceptual_hash(wrapped, "doc_id", fake=fake).collect()}


def test_phash_matches_reference_on_committed_fixture(spark):
    with open(_os.path.join(FIXTURE_DIR, "fixture_gray.pgm"), "rb") as f:
        data = f.read()
    got = _hash_df(spark, [(1, data)])
    vals = [(x * 5 + y * 11) % 256 for y in range(6) for x in range(8)]
    assert got[1] == _ref_ahash(vals, 8, 6)


def test_phash_identical_images_collide_distorted_do_not(spark):
    base = _pgm(16, 16, lambda x, y: (x * 16 + y * 3) % 256)
    inverted = _pgm(16, 16, lambda x, y: 255 - (x * 16 + y * 3) % 256)
    rows = [(1, base), (2, base), (3, inverted)]
    h = _hash_df(spark, rows)
    assert h[1] == h[2]
    assert bin((h[1] ^ h[3]) & (2**64 - 1)).count("1") > 3


def test_phash_pairs_match_bruteforce(spark):
    """Banded candidate generation is lossless for Hamming<=3: compare
    against the all-pairs brute force on 40 related images."""
    rng_imgs = []
    for i in range(40):
        fam = i % 8
        # family base pattern with a per-image single-pixel tweak for
        # every third image
        def f(x, y, fam=fam, i=i):
            v = (x * (fam + 3) + y * (2 * fam + 5)) % 256
            if i % 3 == 0 and x == (i % 16) and y == (i % 16):
                v = (v + 128) % 256
            return v
        rng_imgs.append((i, _pgm(16, 16, f)))
    h = _hash_df(spark, rng_imgs)
    brute = sorted(
        (a, b, bin((h[a] ^ h[b]) & (2**64 - 1)).count("1"))
        for a in h for b in h
        if a < b and bin((h[a] ^ h[b]) & (2**64 - 1)).count("1") <= 3
    )
    df = spark.createDataFrame([(k, v) for k, v in h.items()], "id long, phash long")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_dup_pairs(df, max_hamming=3).collect()
    )
    assert got == brute
    assert len(got) > 0


def test_phash_wav_and_fake_paths(spark):
    with open(_os.path.join(FIXTURE_DIR, "fixture_tone.wav"), "rb") as f:
        wav = f.read()
    h1 = _hash_df(spark, [(1, wav), (2, wav)], mime="audio/wav")
    assert h1[1] == h1[2] != 0
    h2 = _hash_df(spark, [(1, b"arbitrary bytes here" * 20)], mime="video/mp4", fake=True)
    assert isinstance(h2[1], int)


def test_phash_unknown_mime_raises(spark):
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        _hash_df(spark, [(1, b"\x00" * 64)], mime="video/mp4", fake=False)
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_phash_empty_payload_is_zero(spark):
    h = _hash_df(spark, [(1, b"")], mime="image/x-portable-graymap")
    assert h[1] == 0


# ------------------------------------------------- heavy hitters

from eventbridge_etl_spark.operators.sketch import heavy_hitters


def test_heavy_hitters_exact_and_partition_independent(spark):
    """Zipf-ish stream across several partitions: output equals the
    exact GROUP BY answer and is identical under different layouts."""
    rows = (
        [("hot",)] * 400
        + [("warm",)] * 120
        + [(f"cold_{i}",) for i in range(480)]
    )
    df = spark.createDataFrame(rows, ["v"])
    expect = {("hot", 400), ("warm", 120)}  # n=1000, threshold 5% -> >50

    for parts in (1, 7):
        out = heavy_hitters(df.repartition(parts), "v", threshold_ratio=0.05)
        got = {(r.value, r.n) for r in out.collect()}
        assert got == expect, parts
        shares = {r.value: r.share for r in out.collect()}
        assert shares["hot"] == 0.4


def test_heavy_hitters_sketch_memory_bound_still_lossless(spark):
    """Tiny counter budget (k=12 for a 10% threshold) against 300
    distinct cold values: the MG superset guarantee must still surface
    the single hot value."""
    rows = [("hot",)] * 60 + [(f"c{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, ["v"]).repartition(5)
    out = heavy_hitters(df, "v", threshold_ratio=0.1, sketch_counters=12).collect()
    assert {(r.value, r.n) for r in out} == {("hot", 60)}


def test_heavy_hitters_nulls_excluded(spark):
    rows = [("a",)] * 8 + [(None,)] * 20 + [("b",)] * 2
    df = spark.createDataFrame(rows, "v string")
    out = heavy_hitters(df, "v", threshold_ratio=0.5).collect()
    # denominator is non-null rows (10): only 'a' (8/10) passes 50%
    assert {(r.value, r.n, r.share) for r in out} == {("a", 8, 0.8)}


def test_heavy_hitters_validates_params(spark):
    df = spark.createDataFrame([("x",)], ["v"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", threshold_ratio=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "v", threshold_ratio=0.01, sketch_counters=5)


# ------------------------------------- leakage-safe train/test split

from eventbridge_etl_spark.operators.sampling import leakage_safe_split


def test_leakage_safe_split_never_straddles(spark):
    """Every near-dup pair lands wholly on one side of the split; a
    plain per-doc hash split would straddle ~2f(1-f) of them."""
    nodes = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(i, i + 50) for i in range(50)], ["id_a", "id_b"]
    )
    out = leakage_safe_split(nodes, pairs, "doc_id", test_fraction=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 100
    for i in range(50):
        assert rows[i].split == rows[i + 50].split, i
        assert rows[i].cluster_id == rows[i + 50].cluster_id == i
    splits = {r.split for r in rows.values()}
    assert splits == {"train", "test"}


def test_leakage_safe_split_stable_under_growth(spark):
    """A cluster's side never changes when unrelated docs are added."""
    nodes_small = spark.createDataFrame([(i,) for i in range(20)], ["doc_id"])
    nodes_big = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (2, 3)], ["id_a", "id_b"])
    small = {
        r.doc_id: r.split
        for r in leakage_safe_split(nodes_small, pairs, "doc_id", 0.3).collect()
    }
    big = {
        r.doc_id: r.split
        for r in leakage_safe_split(nodes_big, pairs, "doc_id", 0.3).collect()
    }
    assert all(big[k] == v for k, v in small.items())


# --------------------------------------------- corpus source overlap

from eventbridge_etl_spark.operators.dedup import source_overlap


def test_source_overlap_exact_values(spark):
    """Hand-computable token sets: A={a,b,c}, B={b,c,d}, C={x}."""
    rows = [
        (1, "a b c", "A"),
        (2, "b c d", "B"),
        (3, "x", "C"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {(r.source_a, r.source_b): r for r in source_overlap(df, "source", "text").collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert out[("A", "B")].exact_jaccard == 0.5  # 2 / 4
    assert out[("A", "C")].exact_jaccard == 0.0
    # zero-overlap estimate is 0 unless two mins collide (chance ~0)
    assert out[("A", "C")].est_jaccard == 0.0
    # identical sets estimate exactly 1
    df2 = spark.createDataFrame(
        [(1, "p q r", "S1"), (2, "r q p", "S2")], ["doc_id", "text", "source"]
    )
    row = source_overlap(df2, "source", "text").collect()[0]
    assert row.est_jaccard == 1.0 and row.exact_jaccard == 1.0


def test_source_overlap_estimator_tracks_exact_on_fixture(spark, tables):
    """On the documents fixture the 16-hash estimate should be within
    0.35 absolute of exact for every pair (s.d. of the estimator is
    sqrt(j(1-j)/16) <= 0.125; 0.35 is ~3 sigma headroom)."""
    out = source_overlap(tables["documents"], "source", "text").toPandas()
    n_src = tables["documents"].select("source").distinct().count()
    assert len(out) == n_src * (n_src - 1) // 2
    assert (abs(out["est_jaccard"] - out["exact_jaccard"]) <= 0.35).all()


# ------------------------------------------------ null-input contracts

def test_new_operators_drop_null_rows(spark):
    nb = spark.createDataFrame(
        [(1, "a a", "x"), (2, "b b", "y"), (None, "c", "x"), (3, None, "y"), (4, "d", None)],
        "doc_id long, text string, lang string",
    )
    out = naive_bayes_self_score(nb).collect()
    assert {r.doc_id for r in out} == {1, 2}

    bm = spark.createDataFrame(
        [(1, "w w"), (None, "w"), (2, None)], "doc_id long, text string"
    )
    got = bm25_topk(bm, n_terms=1, k=5).collect()
    assert [r.doc_id for r in got] == [1]

    so = spark.createDataFrame(
        [(1, "a", "A"), (2, "a b", "B"), (3, None, "A"), (4, "c", None)],
        "doc_id long, text string, source string",
    )
    pairs = source_overlap(so, "source", "text").collect()
    assert {(r.source_a, r.source_b) for r in pairs} == {("A", "B")}

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (None, 1), (2, None)],
        "a long, b long",
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)


# ------------------------------------------------ compaction planner

from eventbridge_etl_spark.operators.compaction import plan_compaction


def test_compaction_next_fit_bins(spark):
    """Small files fill a bin until the preceding small total crosses
    the target; every oversized file gets a bin of its own in a
    disjoint id range."""
    rows = [
        ("p1", "a", 40), ("p1", "b", 40), ("p1", "c", 40),  # 0,0,0 (prec 0,40,80<100)
        ("p1", "d", 40),                                     # small prec 120 -> bin 1
        ("p2", "x", 250),                                    # oversized alone
        ("p2", "y", 10),                                     # small prec 0 -> bin 0
    ]
    df = spark.createDataFrame(rows, ["pt", "f", "sz"])
    out = {(r.partition, r.bin): r for r in
           plan_compaction(df, "pt", "f", "sz", target_bytes=100).collect()}
    assert out[("p1", 0)].n_files == 3 and out[("p1", 0)].total_bytes == 120
    assert out[("p1", 1)].files == ["d"]
    assert out[("p2", 0)].files == ["y"] and not out[("p2", 0)].already_compact
    # large bin id = floor(total_small/target)+1 + preceding larges = 1
    assert out[("p2", 1)].files == ["x"] and out[("p2", 1)].already_compact


def test_compaction_oversized_never_shares_a_bin(spark):
    """r6 review fix: an oversized file PRECEDED by small files used to
    share their bin (floor(10/100)=0), producing an oversized rewrite
    group containing an already-compact file."""
    rows = [("p", "a", 10), ("p", "x", 250), ("p", "z", 10)]
    df = spark.createDataFrame(rows, ["pt", "f", "sz"])
    out = {tuple(r.files): r for r in
           plan_compaction(df, "pt", "f", "sz", target_bytes=100).collect()}
    assert ("x",) in out and out[("x",)].already_compact
    assert ("a", "z") in out  # smalls pack together, skipping over x
    assert len(out) == 2


def test_compaction_rejects_bad_target(spark):
    df = spark.createDataFrame([("p", "f", 1)], ["pt", "f", "sz"])
    with pytest.raises(ValueError):
        plan_compaction(df, "pt", "f", "sz", target_bytes=0)


# ------------------------------------------------- bigram LM scoring

from eventbridge_etl_spark.operators.text import bigram_logprob


def test_bigram_logprob_closed_form(spark):
    """Two-doc corpus, hand-computed interpolated probabilities."""
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], ["doc_id", "text"]
    )
    out = {r.id: r for r in bigram_logprob(df, lam=0.7).collect()}
    # corpus: tokens a:3 b:3, N=6 V=2; bigrams: (a,b):3, (b,a):1
    # p(b|a) = .7*(3/3) + .3*(4/8);  p(a|b) = .7*(1/3) + .3*(4/8)
    import math
    p_ab = 0.7 * 1.0 + (1 - 0.7) * 0.5
    p_ba = 0.7 * (1 / 3) + (1 - 0.7) * 0.5
    exp1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    assert out[1].n_bigrams == 3
    assert out[1].avg_logprob == pytest.approx(exp1, abs=1e-9)
    assert out[2].n_bigrams == 1
    assert out[2].avg_logprob == pytest.approx(round(math.log(p_ab), 4), abs=1e-9)


def test_bigram_logprob_short_docs_absent(spark):
    df = spark.createDataFrame([(1, "only"), (2, "two tokens")], ["doc_id", "text"])
    out = bigram_logprob(df).collect()
    assert [r.id for r in out] == [2]


# ---------------------------------------------------- char entropy

from eventbridge_etl_spark.operators.text import char_entropy


def test_char_entropy_hand_values(spark):
    df = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaaa")], ["doc_id", "text"]
    )
    out = {r.id: r for r in char_entropy(df).collect()}
    assert out[1].n_chars == 4
    assert out[1].entropy == pytest.approx(round(math.log(2), 4), abs=1e-9)
    assert out[2].entropy == pytest.approx(round(math.log(4), 4), abs=1e-9)
    assert out[3].entropy == 0.0
    # high-entropy (uniform) > natural-ish > degenerate ordering holds
    assert out[2].entropy > out[1].entropy > out[3].entropy


# ----------------------------------- diff / k-anonymity / balancing

from eventbridge_etl_spark.operators.expectations import check_k_anonymity
from eventbridge_etl_spark.operators.sampling import balanced_class_sample
from eventbridge_etl_spark.operators.scd import snapshot_diff


def test_snapshot_diff_labels(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, v string, p double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k long, v string, p double",
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    # 3 removed, 5 added, 2 changed (b->B), 4 changed (NULL->d, null-safe),
    # 1 unchanged
    assert out == {
        1: "unchanged", 2: "changed", 3: "removed", 4: "changed", 5: "added"
    }
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])


def test_k_anonymity_summary(spark):
    rows = [("us", "a")] * 5 + [("us", "b")] * 2 + [("fr", "a")] * 1
    df = spark.createDataFrame(rows, "nat string, seg string")
    r = check_k_anonymity(df, ["nat", "seg"], k=3).collect()[0]
    assert (r.n_groups, r.n_violating_groups, r.n_rows_at_risk) == (3, 2, 3)
    assert not r.passed
    ok = check_k_anonymity(df.limit(0), ["nat"], k=2).collect()[0]
    assert ok.passed  # vacuously: no groups below k
    with pytest.raises(ValueError):
        check_k_anonymity(df, ["nat"], k=1)


def test_balanced_class_sample_exact_counts(spark):
    rows = [(i, "big") for i in range(90)] + [(i + 100, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = balanced_class_sample(df, "lang", "doc_id")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(__import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")).collect()}
    assert counts == {"big": 7, "small": 7}
    # determinism: same selection twice
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in balanced_class_sample(df, "lang", "doc_id").collect())
    assert a == b


# ------------------------------------------- incremental admission

from eventbridge_etl_spark.operators.dedup import exact_dedup, incremental_dedup


def test_incremental_dedup_stages(spark):
    """Both stages: within-batch dup keeps min id; content already in
    history is rejected; fresh content admitted with its digest."""
    hist_src = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], ["doc_id", "text"]
    )
    hist = exact_dedup(hist_src, "doc_id", ["text"]).select("content_digest")
    batch = spark.createDataFrame(
        [
            (10, "brand new"),
            (11, "brand new"),      # in-batch dup of 10
            (12, "seen before"),    # historical dup
            (13, "fresh too"),
        ],
        ["doc_id", "text"],
    )
    out = incremental_dedup(batch, hist, "doc_id", ["text"]).collect()
    got = {(r.doc_id, r.text) for r in out}
    assert got == {(10, "brand new"), (13, "fresh too")}
    digests = {r.content_digest for r in out}
    assert len(digests) == 2 and all(len(d) == 32 for d in digests)


# ------------------------------------------------ containment pairs

from eventbridge_etl_spark.operators.dedup import containment_pairs


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc fully inside a long one: containment 1.0 one way,
    low the other way, low Jaccard both ways."""
    short = "alpha beta gamma"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(20))
    df = spark.createDataFrame([(1, short), (2, long_)], ["doc_id", "text"])
    out = {(r.id_a, r.id_b): r.containment for r in
           containment_pairs(df, "doc_id", "text", tau=0.8).collect()}
    assert out == {(1, 2): 1.0}  # only short-in-long passes 0.8


def test_containment_matches_bruteforce(spark):
    """Recall-1.0 claim: prefix-filtered result == all-pairs brute force
    on a corpus with partial overlaps either side of tau."""
    rows = [
        (1, "a b c d e"),
        (2, "a b c d e f g h i j"),
        (3, "a b c x y"),
        (4, "p q r"),
        (5, "p q r"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.id_a, r.id_b, r.containment)
        for r in containment_pairs(df, "doc_id", "text", tau=0.6).collect()
    )
    sets = {i: set(t.split()) for i, t in rows}
    brute = sorted(
        (a, b, round(len(sets[a] & sets[b]) / len(sets[a]), 6))
        for a in sets for b in sets
        if a != b and len(sets[a] & sets[b]) / len(sets[a]) >= 0.6
    )
    assert got == brute and len(got) >= 4


def test_hll_mergeable_estimate_shard_invariant(spark):
    # unioning per-shard sketches must equal sketching the whole: the
    # property that lets a 100 TB pipeline persist one sketch per batch
    from pyspark.sql import functions as F

    from eventbridge_etl_spark.operators.sketch import (
        mergeable_distinct_estimate,
    )

    rows = [(i, f"s{i % 3}") for i in range(300)] + [
        (i, f"s{(i + 1) % 3}") for i in range(150)
    ]
    df = spark.createDataFrame(rows, "key long, shard string")
    by_shard = mergeable_distinct_estimate(df, "shard", "key").collect()[0]
    one_shard = mergeable_distinct_estimate(
        df.withColumn("shard", F.lit("all")), "shard", "key"
    ).collect()[0]
    assert by_shard["n_shards"] == 3 and one_shard["n_shards"] == 1
    assert by_shard["merged_estimate"] == one_shard["merged_estimate"]
    # 300 distinct keys; HLL lgk=12 is near-exact at this cardinality
    assert abs(by_shard["merged_estimate"] - 300) <= 3
