"""Deduplication operators (E1): exact, prefix-filtered n-gram Jaccard,
MinHash-LSH, SimHash, and embedding-cosine near-dup.

Scale design (the point of each algorithm):

- **Exact** — hash-groupBy on a content digest: one shuffle of (digest,
  id), never the payload.
- **Jaccard AllPairs** — naive token inverted-index join explodes on
  frequent tokens ("the" pairs everything).  We implement *lossless
  prefix filtering* (AllPairs/PPJoin family): order each doc's tokens by
  ascending document frequency and join only on the first
  ``n - ceil(tau*n) + 1`` tokens — any pair with Jaccard >= tau MUST
  share a prefix token, so recall is exactly 1.0 while the join input
  shrinks by ~tau/(1+tau) and, critically, the hottest tokens (highest
  df) fall out of the prefixes.  Candidates are then verified exactly.
- **MinHash-LSH** — fixed-size signatures (k affine hashes over ONE
  md5-derived base value per token), banded so probability of candidacy
  is a sharp sigmoid around the target similarity; cost is O(docs *
  tokens) digests + O(docs * tokens * k) integer multiply-adds + a join
  on band buckets.  Deterministic => reproducible in the SQL oracle.
- **SimHash** — 32-bit fingerprints; near-dups = small Hamming distance,
  candidate generation by exact match on one of 4 8-bit bands (any pair
  within Hamming<=3 must agree on >=1 band — pigeonhole; lossless for
  d<=3).
- **Embedding cosine** — exact threshold join; the scale path buckets by
  LSH sign patterns first (see operators.similarity).

Everything below is built-in DataFrame ops (higher-order array
functions, explode/groupBy/join) — no Python UDFs anywhere.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventbridge_etl_spark.operators.partitioning import fan_out as _fan_out
from eventbridge_etl_spark.cache import scoped_persist
from eventbridge_etl_spark.operators.text import distinct_gram_hashes, tokens


def _token_sets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct-token set per doc.  NULL-text rows are excluded by
    contract: they have no token set to compare, and keeping them made
    the minhash exact-dup collapse fuse them with blank docs — a NULL
    set and the legitimate ``['']`` set both ``concat_ws`` to the same
    ``md5('')`` digest, so contentless docs emitted C(k,2) fabricated
    jaccard-1.0 pairs (r7 adversarial-fixture finding).  Downstream
    cluster queries still assign null-text docs their own singleton
    (they start from the full doc table and left-join the pair graph).
    """
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.array_distinct(tokens(text_col)).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))


def _int_encode(token_sets: DataFrame) -> DataFrame:
    """Dictionary-encode a token-set frame's ``_toks`` to 64-bit ids
    (xxhash64 per token) — the ONE implementation every verify path
    uses (review r6: this body was inlined three times).

    Pair-verification (array_intersect over millions of candidate pairs)
    is ~20% faster end-to-end on long-array comparisons when the
    elements are fixed-width ints instead of strings (measured at
    sf0.1).  Intersection/union SIZES are preserved because the encoding
    is injective modulo a ~n^2/2^64 collision chance — negligible at any
    realistic vocabulary.  xxhash64 (not a row_number dictionary) keeps
    the encoding shuffle-free and scale-safe: no global sort, no
    broadcast of a 100 TB corpus's vocabulary."""
    return token_sets.withColumn(
        "_toks", F.transform("_toks", lambda tok: F.xxhash64(tok))
    )


def _content_digest(content_cols: list[str]):
    """Digest format v2 (round 6): md5 over \x1f-joined columns with a
    \x00 sentinel for NULLs.  ONE definition — exact_dedup and
    incremental_dedup must digest bit-identically or an admitted row
    would not match its own digest in a persisted store (the copies
    previously drifted only by code review; review r7).  A payload
    containing the literal sentinel/separator bytes can still alias;
    binary-clean payloads should digest a struct hash instead."""
    return F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in content_cols
            ],
        )
    )


def exact_dedup(
    df: DataFrame, id_col: str, content_cols: list[str], keep: str = "min"
) -> DataFrame:
    """Exact dedup by content digest: one representative id per distinct
    content (md5 over the concatenated columns), plus the duplicate
    count.  The digest shuffle carries ~48 bytes/row however wide the
    payload is.

    NULL columns encode as a \\x00 sentinel before concatenation —
    bare ``concat_ws`` SKIPS nulls, which would collide ('x', NULL)
    with (NULL, 'x') and merge distinct contents (review finding r6).
    A payload containing the literal sentinel/separator bytes can
    still alias; binary-clean payloads should digest a struct hash
    instead."""
    digest = _content_digest(content_cols)
    if keep not in ("min", "max"):
        raise ValueError(f"keep must be 'min' or 'max', got {keep!r}")
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.withColumn("_digest", digest)
        .groupBy("_digest")
        .agg(agg.alias(id_col), F.count("*").alias("n_duplicates"))
        .select(id_col, "_digest", "n_duplicates")
        .withColumnRenamed("_digest", "content_digest")
    )


def exact_dedup_casefold(
    df: DataFrame, id_col: str, text_col: str, keep: str = "min"
) -> DataFrame:
    """Case-insensitive exact dedup: one representative id per distinct
    CASE-FOLDED text (``upper(text)``), plus the duplicate count — the
    C4-style "exact dedup modulo case" a training corpus runs before
    the near-dup ladder (capitalization variants of boilerplate are the
    single most common trivial duplicate class).

    Folding is Java ``upper()``, not ``lower()``, deliberately: upper
    is the direction where Unicode one-to-many SpecialCasing expansions
    (ß→SS, ﬁ→FI) MERGE spellings that differ only by ligature/sharp-s
    typography — 'Fußball' and 'FUSSBALL' fold together here and would
    not under lower().  Same scale shape as ``exact_dedup``: the digest
    shuffle carries ~48 bytes/row regardless of document width, one
    exchange, no sort.  Oracle alignment for the fold lives in
    ``queries/_sqlfrag.SQL_UPPER`` (probed boundary — see its note)."""
    folded = df.select(
        F.col(id_col).alias(id_col),
        F.upper(F.col(text_col)).alias("_folded"),
    )
    return exact_dedup(folded, id_col, ["_folded"], keep)


def jaccard_pairs_prefix_filtered(
    df: DataFrame, id_col: str, text_col: str, tau: float
) -> DataFrame:
    """All pairs with token-set Jaccard >= tau — exact result via
    lossless prefix filtering (module docstring).  Returns
    (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp."""
    t = _token_sets(df, id_col, text_col)
    ex = t.select("_id", "_n", F.explode("_toks").alias("_tok"))
    dfreq = ex.groupBy("_tok").agg(F.count("*").alias("_df"))
    # rank tokens per doc by ascending global df (rare first), tie on token
    w = Window.partitionBy("_id").orderBy("_df", "_tok")
    ranked = ex.join(dfreq, "_tok").withColumn("_rn", F.row_number().over(w))
    # prefix length n - ceil(tau*n) + 1.  The epsilon keeps the ceil
    # EXACT-boundary-safe in IEEE: 0.9*10 evaluates to
    # 9.000000000000002, whose bare ceil is 10 — one token short of a
    # lossless prefix, silently dropping pairs with Jaccard exactly
    # tau (review finding r6).  Subtracting 1e-9 can only LENGTHEN the
    # prefix (more candidates, never fewer), preserving recall 1.0.
    prefix = ranked.filter(
        F.col("_rn")
        <= F.col("_n") - F.ceil(F.lit(tau) * F.col("_n") - F.lit(1e-9)) + 1
    )
    a = prefix.select(F.col("_id").alias("_ida"), "_tok")
    b = prefix.select(F.col("_id").alias("_idb"), "_tok")
    cand = (
        a.join(b, "_tok")
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    # verify on int-encoded sets (same sizes, faster intersects)
    return _verify_jaccard(cand, _int_encode(t), tau)


def _verify_jaccard(cand: DataFrame, token_sets: DataFrame, tau: float) -> DataFrame:
    ta = token_sets.select(
        F.col("_id").alias("_ida"), F.col("_toks").alias("_ta"), F.col("_n").alias("_na")
    )
    tb = token_sets.select(
        F.col("_id").alias("_idb"), F.col("_toks").alias("_tb"), F.col("_n").alias("_nb")
    )
    common = F.size(F.array_intersect("_ta", "_tb"))
    jac = common / (F.col("_na") + F.col("_nb") - common)
    # Lossless size prefilter: jaccard <= min(|A|,|B|)/max(|A|,|B|), so a
    # pair whose set sizes are too far apart can never reach tau — drop it
    # BEFORE the array_intersect (the expensive part of verification).
    # Compared in the SAME round-to-6 form as the final filter below:
    # the raw `least >= tau*greatest` form rejected 9 >= 0.9*10
    # (= 9.000000000000002 in IEEE) — a pair at exactly tau (review
    # finding r6).  round(J,6) <= round(min/max,6) by monotonicity, so
    # this prune can never drop a pair the final filter would keep.
    size_ok = (
        F.round(
            F.least("_na", "_nb").cast("double") / F.greatest("_na", "_nb"), 6
        )
        >= tau
    )
    return (
        cand.join(ta, "_ida")
        .join(tb, "_idb")
        .filter(size_ok)
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= tau)
        .select(
            F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), F.col("jaccard")
        )
    )


#: Modulus and frozen affine coefficients for the MinHash family
#: h_i(x) = (a_i * x + b_i) mod P over the md5-derived base value x.
#: P = 2^31 - 1 (Mersenne prime) keeps every a*x+b product < 2^62 — no
#: 64-bit overflow under ANSI mode.  The coefficients are arbitrary
#: fixed draws, frozen as literals so the SQL oracle can inline the
#: exact same family.
MINHASH_PRIME = (1 << 31) - 1
MINHASH_A: tuple[int, ...] = (
    319860338, 1945836713, 1956143625, 717436825, 137232829, 1802335203,
    2025738368, 386381433, 1644055472, 1048108785, 1094126957, 1802194359,
    1676998832, 909307023, 864914510, 2063853270,
)
MINHASH_B: tuple[int, ...] = (
    560999184, 492388557, 1695263976, 1875936893, 1176880739, 1301073852,
    1217190994, 1970997088, 940730612, 1969702949, 1634523527, 1057290752,
    632048985, 135477598, 1975904768, 1998987651,
)


def _sign_token_sets(t: DataFrame, num_hashes: int) -> DataFrame:
    """Attach ``_sig array<long>`` to a ``(_id, _toks, _n)`` frame.

    Built as ONE ``F.expr`` string: the 16 array_min/transform lambdas
    constructed Column-by-Column cost ~1 s of Py4J round-trips per plan
    build — measurable in a per-query cold benchmark — while a single
    SQL string parses JVM-side in one call."""
    assert num_hashes <= len(MINHASH_A)
    xs = (
        "transform(_toks, t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)"
        f" % {MINHASH_PRIME})"
    )
    mins = ", ".join(
        f"array_min(transform(_xs, x -> ({MINHASH_A[i]}L * x + {MINHASH_B[i]}L)"
        f" % {MINHASH_PRIME}))"
        for i in range(num_hashes)
    )
    return (
        t.withColumn("_xs", F.expr(xs))
        .withColumn("_sig", F.expr(f"array({mins})"))
        .drop("_xs")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16
) -> DataFrame:
    """Deterministic MinHash: ONE md5 per token yields a 32-bit base
    value x (first 8 hex chars), then each of the ``num_hashes`` hashes
    is the cheap affine map (a_i*x + b_i) mod 2^31-1 — the classic
    universal family, so the seeds stay pairwise-independent while the
    expensive digest is paid once instead of once per seed (the previous
    md5('{i}|'+tok) formulation was 16 md5 calls per token and dominated
    the whole LSH pipeline's cost).  min over tokens per seed is a
    uniform min-hash.  Returns (_id, _toks, _n, _sig array<long>)."""
    return _sign_token_sets(_token_sets(df, id_col, text_col), num_hashes)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tau: float,
    num_hashes: int = 16,
    bands: int = 2,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: banded signature buckets generate
    candidates; exact Jaccard verification keeps only pairs >= tau.
    With r = num_hashes/bands rows per band, P(candidate | j) =
    1-(1-j^r)^bands — steep around tau for r=8, b=2 at tau≈0.9.

    Exact-duplicate collapse first: documents with IDENTICAL token sets
    have identical signatures, identical band buckets, and identical
    pairwise Jaccard with everything else, so LSH + verification runs
    once per DISTINCT set (one representative), and the result expands
    back to member pairs afterwards (cross pairs carry the rep pair's
    jaccard; within-group pairs are jaccard 1.0 by construction).  This
    is equivalence-preserving — the output is bit-identical to running
    on the full corpus — but the candidate volume shrinks by the
    duplication factor SQUARED per group pair, which is decisive on
    boilerplate-heavy corpora where the largest exact-dup cluster is
    10^2-10^4 documents (the common case in web-scale training data)."""
    assert num_hashes % bands == 0
    df = _fan_out(df)
    t = _token_sets(df, id_col, text_col)
    # Group key = the SORTED token array itself (r13).  The previous
    # md5(to_json(array_sort)) digest existed to keep the group shuffle
    # thin, but selecting each group's representative TOKEN SET then
    # required a second full corpus scan+tokenize plus a rep join (a
    # corpus-sized SMJ shuffle once groups outgrow broadcast).  Carrying
    # the sorted array through the ONE aggregate the rep selection
    # already pays removes that scan and that join outright (guide
    # §2.4): every group member has the identical set, so the key IS
    # the representative's token set.  Array-equality grouping is also
    # structurally collision-free — the r7 to_json-vs-concat_ws
    # aliasing class cannot exist without a serialized key.  Sorting is
    # result-neutral downstream: signatures take array_min over the
    # set, verification takes array_intersect SIZES — both
    # order-independent (proved bit-identical old-vs-new, r13).
    groups = scoped_persist(
        t.select("_id", F.array_sort("_toks").alias("_toks"))
        .groupBy("_toks")
        .agg(F.min("_id").alias("_rep"), F.collect_list("_id").alias("_members"))
    )
    # representatives' token-set frame is now a pure projection of the
    # persisted groups frame — the banding branch and both verify
    # branches (ta, tb) each re-read the cache, never the corpus
    rep_t = groups.select(
        F.col("_rep").alias("_id"), "_toks", F.size("_toks").alias("_n")
    )
    rep_pairs = _minhash_lsh_rep_pairs(rep_t, tau, num_hashes, bands)
    # expansion: rep-level pair -> all member cross pairs (same jaccard);
    # groups with >1 member additionally emit their C(k,2) internal
    # pairs at jaccard 1.0 (identical sets always collide and verify)
    ga = groups.select(F.col("_rep").alias("id_a"), F.col("_members").alias("_ma"))
    gb = groups.select(F.col("_rep").alias("id_b"), F.col("_members").alias("_mb"))
    cross = (
        rep_pairs.join(ga, "id_a")
        .join(gb, "id_b")
        .select("jaccard", F.explode("_ma").alias("_i"), "_mb")
        .select("jaccard", "_i", F.explode("_mb").alias("_j"))
        .select(
            F.least("_i", "_j").alias("id_a"),
            F.greatest("_i", "_j").alias("id_b"),
            "jaccard",
        )
    )
    within = (
        groups.filter(F.size("_members") > 1)
        .select(F.explode("_members").alias("_i"), F.col("_members").alias("_m"))
        .select("_i", F.explode("_m").alias("_j"))
        .filter(F.col("_i") < F.col("_j"))
        .select(
            F.col("_i").alias("id_a"),
            F.col("_j").alias("id_b"),
            F.round(F.lit(1.0), 6).alias("jaccard"),
        )
    )
    if tau > 1.0:  # degenerate: nothing can verify, incl. identical sets
        return cross
    return cross.unionByName(within)


def _minhash_lsh_rep_pairs(
    rep_t: DataFrame,
    tau: float,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """The banded-LSH core over an already-deduplicated ``(_id, _toks,
    _n)`` token-set frame."""
    # band encoding delegated to _band_rows — the SAME function the
    # admission-index store builds with, so buckets collide identically
    # by construction (review r6: this body was previously inlined
    # here, leaving the shared-encoding invariant to a comment).
    # ``_n`` (token-set size, one int) rides along so the lossless size
    # bound prunes candidates AT THE BAND JOIN, before the distinct's
    # exchange and the two verify joins ever see them (r12: jaccard <=
    # min|A|,|B| / max|A|,|B| drops 698k -> 441k candidate pairs at
    # sf0.1/tau=0.9 — 37% fewer rows shuffled into distinct+verify —
    # measured ~10% off the whole query; the SAME rounded-comparison
    # form as _verify_jaccard's prefilter, so it can never drop a pair
    # the final jaccard filter would keep).
    banded = _band_rows(rep_t, num_hashes, bands, keep_n=True)
    # Persist the banded rows: the self-join otherwise evaluates the
    # signature subtree TWICE (once per branch).  Lazy persist — the
    # first action's left branch populates the cache, the right branch
    # reuses it.  Footprint is tiny (bands rows/doc x ~50 B) and
    # MEMORY_AND_DISK self-evicts.
    banded = scoped_persist(banded)
    left = banded.select(
        F.col("_id").alias("_ida"), F.col("_n").alias("_na"), "_band", "_bh"
    )
    right = banded.select(
        F.col("_id").alias("_idb"), F.col("_n").alias("_nb"), "_band", "_bh"
    )
    size_ok = (
        F.round(
            F.least("_na", "_nb").cast("double") / F.greatest("_na", "_nb"), 6
        )
        >= tau
    )
    # The distinct's exchange does double duty: besides dedup it
    # REBALANCES the candidate pairs, which leave the band join
    # partitioned by (band, bucket-hash) — heavily skewed when the corpus
    # has large near-dup clusters.  A pipelined first-matching-band dedup
    # filter (no shuffle) measured 3x SLOWER at sf0.1 because the
    # array_intersect verification then runs on the skewed partitions.
    # (An in-bucket collect_list+pair-explode variant — one exchange
    # fewer — also measured ~10% SLOWER at sf0.1, r12: the quadratic
    # explode concentrates in the bucket tasks the distinct exists to
    # rebalance away from.)
    cand = (
        left.join(right, ["_band", "_bh"])
        .filter((F.col("_ida") < F.col("_idb")) & size_ok)
        .select("_ida", "_idb")
        .distinct()
    )
    # int-encode the already-computed token sets for faster intersects
    # — no re-tokenization
    t_int = _int_encode(rep_t)
    return _verify_jaccard(cand, t_int, tau)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Bit j's vote for a token is the parity of hex digit j of the token's
    md5 (an unbiased pseudo-random bit); the fingerprint bit is the sign
    of the vote sum over the doc's tokens.  Computed as explode ->
    groupBy(sum of per-bit votes) — one shuffle of (id, 32 ints).
    Returns (id_col, simhash_bits string, plus 4 band columns for
    candidate generation)."""
    assert bits <= 32
    t = _token_sets(df, id_col, text_col)
    ex = t.select("_id", F.explode("_toks").alias("_tok")).withColumn(
        "_h", F.md5("_tok")
    )
    votes = [
        F.sum(
            F.when(F.ascii(F.substring("_h", j + 1, 1)) % 2 == 1, 1).otherwise(-1)
        ).alias(f"_v{j}")
        for j in range(bits)
    ]
    summed = ex.groupBy("_id").agg(*votes)
    bit_chars = [F.when(F.col(f"_v{j}") > 0, "1").otherwise("0") for j in range(bits)]
    fp = summed.select(
        F.col("_id").alias(id_col), F.concat(*bit_chars).alias("simhash_bits")
    )
    band_w = bits // 4
    for b in range(4):
        fp = fp.withColumn(f"band_{b}", F.substring("simhash_bits", b * band_w + 1, band_w))
    return fp


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Candidates: exact match on any of the 4 bands (pigeonhole-lossless
    for max_hamming <= 3); verification compares the 32 fingerprint
    chars.  Returns (id_a, id_b, hamming)."""
    fp = scoped_persist(simhash(_fan_out(df), id_col, text_col))
    cands = None
    for b in range(4):
        left = fp.select(F.col(id_col).alias("_ida"), F.col(f"band_{b}").alias("_bh"))
        right = fp.select(F.col(id_col).alias("_idb"), F.col(f"band_{b}").alias("_bh"))
        c = left.join(right, "_bh").filter(F.col("_ida") < F.col("_idb")).select("_ida", "_idb")
        cands = c if cands is None else cands.union(c)
    cands = cands.distinct()
    fa = fp.select(F.col(id_col).alias("_ida"), F.col("simhash_bits").alias("_fa"))
    fb = fp.select(F.col(id_col).alias("_idb"), F.col("simhash_bits").alias("_fb"))
    chars_a = F.split(F.col("_fa"), "(?!^)")  # split into chars
    chars_b = F.split(F.col("_fb"), "(?!^)")
    hamming = F.size(
        F.filter(
            F.zip_with(chars_a, chars_b, lambda x, y: x != y), lambda d: d
        )
    )
    return (
        cands.join(fa, "_ida")
        .join(fb, "_idb")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), "hamming")
    )


def near_dup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Collapse a near-dup pair graph into clusters: every node gets the
    minimum id reachable through the pairs as its ``cluster_id``.

    This is the step that turns pair enumeration (minhash/simhash/
    jaccard output) into an actual deduped corpus: keep the one row per
    cluster where ``doc_id == cluster_id``, drop the rest.

    Min-label propagation to a fixpoint: each iteration joins current
    labels across the (symmetrized) edge list and keeps the elementwise
    min.  Iteration count is bounded by the cluster graph's diameter —
    near-dup clusters are dense (most members pair directly with the
    minimum), so 2-3 rounds converge in practice; ``max_iter`` bounds
    the pathological chain.  Each round is one shuffle join + one
    aggregate, with ``localCheckpoint`` truncating the lineage so plans
    stay flat; the driver-side loop itself moves no data (only a
    converged? count crosses to the driver).  At 1000-executor scale
    the same loop runs with durable ``checkpoint`` and the
    large-star/small-star edge rewriting variant — the shape here is
    the small-diameter core of that algorithm.

    Returns (id_col, cluster_id) — one row per input node, singletons
    included (their own id).
    """
    ids = nodes.select(F.col(id_col).alias("_id")).distinct()
    fwd = pairs.select(F.col("id_a").alias("_src"), F.col("id_b").alias("_dst"))
    edges = fwd.union(
        fwd.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))
    ).localCheckpoint(eager=False)
    labels = ids.withColumn("_lbl", F.col("_id"))
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            labels.join(edges, labels["_id"] == edges["_src"])
            .groupBy(F.col("_dst").alias("_id"))
            .agg(F.min("_lbl").alias("_nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, "_id", "left")
            .select(
                "_id",
                F.least(F.col("_lbl"), F.coalesce("_nlbl", "_lbl")).alias("_lbl"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "_id")
            .filter(F.col("n._lbl") != F.col("o._lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"near_dup_clusters did not converge within max_iter={max_iter} "
            "iterations (pair-graph diameter exceeds it); raise max_iter — "
            "returning partial labels would silently split clusters"
        )
    return labels.select(F.col("_id").alias(id_col), F.col("_lbl").alias("cluster_id"))


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs at 100 TB scale: hyperplane-LSH bucketed
    candidate generation + within-bucket exact cosine verification.

    Instead of the O(n^2) self-join of ``embedding_near_dup_pairs``, each
    vector is hashed into ``n_tables`` sign-pattern buckets (all tables
    in ONE pass over the corpus — an array of (table, bucket) structs,
    exploded); candidates are the pairs that collide in at least one
    table, and only those pairs pay the exact cosine.  Per-table bucket
    population ~ n/2^n_planes, so candidate volume is ~n^2 *
    n_tables/2^n_planes vs n^2 — the pruning factor.  Recall for pairs
    with cosine >= tau is 1-(1-(1-theta/pi)^n_planes)^n_tables
    (probabilistic, not lossless — the deliberate trade at scale).

    The hyperplanes are deterministic (seeded), so an oracle can
    replicate bucket assignment exactly with the planes as literals.
    """
    from eventbridge_etl_spark.operators.similarity import (
        cosine,
        hyperplane_lsh_bucket,
    )

    v = _fan_out(df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")))
    tb = F.array(
        *[
            F.struct(
                F.lit(t).alias("_tbl"),
                hyperplane_lsh_bucket(F.col("_v"), dim, n_planes, seed=seed + t).alias(
                    "_bkt"
                ),
            )
            for t in range(n_tables)
        ]
    )
    banded = v.select("_id", F.explode(tb).alias("_tb")).select(
        "_id", "_tb._tbl", "_tb._bkt"
    )
    left = banded.select(F.col("_id").alias("id_a"), "_tbl", "_bkt")
    right = banded.select(F.col("_id").alias("id_b"), "_tbl", "_bkt")
    cand = (
        left.join(right, ["_tbl", "_bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", F.round(cosine(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )


#: Largest ``max_df`` cap that exempts ``tfidf_cosine_pairs`` from the
#: quadratic guard.  A df cap of m bounds candidate pairs to (m/2) x
#: total postings — linear in corpus size — but only if m is a real cap:
#: exempting ANY non-None max_df let max_df=10**12 (larger than any df)
#: bypass the guard while bounding nothing (ADVICE r11).
_MAX_DF_GUARD_EXEMPT = 10_000


def _quadratic_guard(
    df: DataFrame, op: str, row_budget: int | None, within_buckets: bool
) -> None:
    """Mechanical enforcement of the quadratic-verifier contract
    (VERDICT r10 item 4): the all-pairs verifiers document "run this
    within LSH buckets / blocks only", but a docstring does not stop a
    caller from handing the raw 100 M-row corpus to an O(n²) plan.
    Raise unless the caller either declared the input pre-blocked
    (``within_buckets=True``) or the input row count fits the budget.

    The probe is ``limit(budget+1).count()`` — it stops scanning at
    budget+1 rows, so the guard costs one bounded job, never a full
    count of the input.  Same enforcement family as the CI bans on
    ``F.udf`` and unbounded driver-side materialization (the word
    "collect" is avoided here verbatim: tests/test_bounded_collects.py
    greps the package for that call pattern).
    """
    if within_buckets or row_budget is None:
        return
    if df.limit(row_budget + 1).count() > row_budget:
        raise ValueError(
            f"{op}: input exceeds the quadratic-verifier row budget "
            f"({row_budget}).  This operator is the within-bucket/"
            f"verification-grade O(n²) path; at scale generate "
            f"candidates first (minhash_lsh_pairs / "
            f"lsh_candidate_pairs / similarity.hyperplane_lsh_buckets) "
            f"and verify those, or pass within_buckets=True / a larger "
            f"row_budget if the input really is a bounded block."
        )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    *,
    within_buckets: bool = False,
    row_budget: int | None = 100_000,
) -> DataFrame:
    """Exact cosine-threshold self-join: pairs with cosine(a,b) >= tau.

    This is the *verification-grade* operator (O(n^2) comparisons but
    only arithmetic per pair — fine to run within LSH buckets or blocks).
    For the 100 TB path, generate candidates first with
    similarity.hyperplane_lsh_buckets and run this within buckets.
    That contract is mechanical, not advisory: unless the caller passes
    ``within_buckets=True`` (input already blocked) the input must fit
    ``row_budget`` rows or the operator raises (``_quadratic_guard``)."""
    from eventbridge_etl_spark.operators.similarity import cosine

    _quadratic_guard(df, "embedding_near_dup_pairs", row_budget, within_buckets)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("_va"), F.col("_vb")), 6))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------------- decontamination

def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``n``-gram with a benchmark/eval set — the standard guard against
    test-set leakage into training data.

    Returns ``(id_col, n_contaminated)`` for flagged documents only,
    where ``n_contaminated`` counts the document's distinct offending
    n-grams.

    Scale design: each side reduces to DISTINCT n-gram hashes per doc
    BEFORE any join (``array_distinct`` map-side, so the shuffle — if
    any — moves 64-bit ints, not strings).  The benchmark side is tiny
    by nature (eval sets are thousands of docs against a corpus of
    billions), so its distinct-hash set broadcasts and the corpus never
    shuffles: the whole operator is scan -> hash -> broadcast-join ->
    partial-agg.  xxhash64 collisions could in principle conflate two
    n-grams (odds ~m^2/2^64); acceptable for a flagging operator whose
    hits get human/exact review anyway.
    """
    def grams(df: DataFrame) -> DataFrame:
        # tokenize in a SEPARATE projection: a HOF lambda referencing
        # the raw split() re-evaluates it per element (HOFs are
        # interpreted, no codegen CSE) — O(tokens²) per doc, measured
        # 43 s at 40k tokens vs linear with the materialized column
        # (longtext probe, round 7)
        tokenized = df.select(
            F.col(id_col), tokens(F.col(text_col)).alias("_toks")
        )
        gs = distinct_gram_hashes(F.col("_toks"), n)
        return tokenized.select(F.col(id_col), F.explode(gs).alias("_g"))

    bench = grams(benchmark).select("_g").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(bench), "_g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 4,
) -> DataFrame:
    """Chunk-level corpus dedup (the C4/RefinedWeb line-dedup shape):
    split every document into fixed-width token chunks, keep only the
    corpus-wide FIRST occurrence of each distinct chunk (ordered by
    (doc, position) — deterministic), and reassemble the surviving
    chunks per document.

    Returns ``(id_col, new_text, n_removed)`` for every document;
    unaffected documents round-trip verbatim.

    Scale shape: one explode (bounded by token count / chunk width),
    then the corpus-wide winner per chunk comes from a hash aggregate —
    ``min(struct(_id, _idx))``, lexicographically identical to
    first-by-(doc, position) — whose partial combines map-side, so a
    boilerplate chunk repeated a billion times contributes ONE row per
    map partition to the shuffle, not a billion.  (A ``row_number``
    window over the chunk key would instead sort the whole hot chunk in
    a single task — verified in the physical plan and rejected.)  The
    winner table (one row per distinct chunk) joins back on the chunk
    key — skewed chunk keys split under AQE skew-join — and one per-doc
    aggregate reassembles.  The equivalent of the banded-LSH "never
    all-pairs" rule for exact chunk matching.
    """
    c = chunk_tokens
    # NULL text coalesces to '' so the doc still ROUND-TRIPS (one empty
    # chunk) — a NULL chunk key would never equi-join the winner table
    # and the document would silently vanish from the output (review
    # finding r6).  The split lives in its OWN projection: referencing
    # it from the HOF lambda re-evaluates the split per chunk (HOFs are
    # interpreted, no codegen CSE) — O(tokens²) per doc; one MB-scale
    # document ground for 25+ minutes before this barrier (longtext
    # probe, round 7; linear 0.5 s after).
    tokenized = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+").alias(
            "_toks"
        ),
    )
    toks = F.col("_toks")
    n_chunks = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(c))).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * c + 1, c), " "),
    )
    ex = tokenized.select(
        F.col("_id"), F.posexplode(chunks).alias("_idx", "_chunk")
    )
    winners = ex.groupBy("_chunk").agg(
        F.min(F.struct("_id", "_idx")).alias("_w")
    )
    keep = (F.col("_id") == F.col("_w._id")) & (F.col("_idx") == F.col("_w._idx"))
    return (
        ex.join(winners, "_chunk")
        .withColumn("_keep", keep)
        .groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("_idx"), F.col("_chunk")),
                            )
                        )
                    ),
                    lambda s: s.getField("_chunk"),
                ),
                " ",
            ).alias("new_text"),
            (F.count("*") - F.count(F.when(F.col("_keep"), 1))).alias("n_removed"),
        )
        .withColumnRenamed("_id", id_col)
    )


def source_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    num_hashes: int = 16,
) -> DataFrame:
    """Corpus-level overlap between sources: per-group token-set MinHash
    signatures plus the exact group-pair Jaccard — the "how much does
    crawl A duplicate crawl B" diagnostic that decides mixing weights
    and dedup order in a multi-source training pipeline.

    Returns ``(source_a, source_b, est_jaccard, exact_jaccard,
    n_hashes)`` for every unordered group pair (zero-overlap pairs
    included).  The estimate is the fraction of agreeing signature
    minima (the standard unbiased MinHash estimator, same frozen affine
    family as document minhash); the exact value comes from distinct-
    token counts.  Both are deterministic, so an oracle replicates them
    bit-for-bit — and their agreement in the gated output doubles as
    accuracy evidence for the estimator.

    Scale: the (group, token) distinct is the only corpus-sized
    shuffle, keyed the same as the signature aggregate; signatures are
    |groups| x num_hashes longs (broadcastable); the exact-intersection
    join moves (token, group) pairs only.  At 100 TB with millions of
    groups, drop the exact columns and keep the sketch path — the
    estimator is the scale answer; the exact join here is the
    verification-grade companion (same pattern as
    dedup_embedding_cosine vs the LSH path).
    """
    assert num_hashes <= len(MINHASH_A)
    # null group/text rows carry no set information — drop up front
    df = df.filter(F.col(group_col).isNotNull() & F.col(text_col).isNotNull())
    # the (group, token) distinct is read by THREE consumers (the
    # signature aggregate and both sides of the exact-intersection
    # self-join); persist so the corpus is scanned, tokenized and
    # deduplicated ONCE per action tree (r12 — the self-join's two
    # aliases share one exchange via reuse, but the signature branch's
    # groupBy(_g) exchange re-derived the whole scan subtree)
    st = scoped_persist(
        df.select(
            F.col(group_col).alias("_g"),
            F.explode(tokens(F.col(text_col))).alias("_tok"),
        ).distinct()
    )

    xs = st.withColumn(
        "_x",
        F.expr(
            f"CAST(conv(substring(md5(_tok), 1, 8), 16, 10) AS BIGINT)"
            f" % {MINHASH_PRIME}"
        ),
    )
    mins = [
        F.min(
            (F.lit(MINHASH_A[i]) * F.col("_x") + F.lit(MINHASH_B[i]))
            % F.lit(MINHASH_PRIME)
        ).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    sig = xs.groupBy("_g").agg(
        F.count("*").alias("_n_toks"), *mins
    ).select(
        "_g", "_n_toks", F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("_sig")
    )

    a = sig.select(
        F.col("_g").alias("source_a"),
        F.col("_n_toks").alias("_na"),
        F.col("_sig").alias("_siga"),
    )
    b = sig.select(
        F.col("_g").alias("source_b"),
        F.col("_n_toks").alias("_nb"),
        F.col("_sig").alias("_sigb"),
    )
    pairs = a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))

    inter = (
        st.alias("x")
        .join(st.alias("y"), F.col("x._tok") == F.col("y._tok"))
        .filter(F.col("x._g") < F.col("y._g"))
        .groupBy(F.col("x._g").alias("source_a"), F.col("y._g").alias("source_b"))
        .agg(F.count("*").alias("_ninter"))
    )

    agree = F.size(
        F.filter(
            F.zip_with("_siga", "_sigb", lambda p, q: p == q), lambda eq: eq
        )
    )
    ninter = F.coalesce(F.col("_ninter"), F.lit(0))
    return (
        pairs.join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.round(agree.cast("double") / F.lit(float(num_hashes)), 6).alias(
                "est_jaccard"
            ),
            F.round(
                ninter.cast("double")
                / (F.col("_na") + F.col("_nb") - ninter).cast("double"),
                6,
            ).alias("exact_jaccard"),
            F.lit(num_hashes).cast("long").alias("n_hashes"),
        )
    )


def incremental_dedup(
    new_batch: DataFrame,
    history_digests: DataFrame,
    id_col: str,
    content_cols: list[str],
    digest_col: str = "content_digest",
) -> DataFrame:
    """Admit only genuinely-new content from an incoming batch — the
    incremental-ingest dedup of a continuously-growing corpus: dedup the
    batch against ITSELF (exact digest, min-id representative), then
    anti-join the survivors against the historical digest store.

    ``history_digests`` is the running store of already-admitted
    digests (the output of previous rounds' ``exact_dedup``, persisted
    — 48 bytes/row no matter how wide the corpus rows are).  Returns
    the admitted rows of ``new_batch`` (original columns) plus their
    ``content_digest`` for appending to the store.

    Scale: the batch shuffles once on digest (self-dedup); the
    anti-join keys on the same digest — Catalyst plans it as a shuffled
    or broadcast anti join depending on store size, and a Bloom-pruned
    one under the runtime-filter confs.  The full history's CONTENT is
    never read, only its digest column — that is the point: ingest cost
    is O(batch + digest store), not O(corpus).

    .. note:: **Digest format v2 (round 6).**  Null content columns now
       digest through an explicit ``\\x00`` sentinel; the previous
       format (plain ``concat_ws``, which *skips* nulls) produced a
       different md5 for any row containing a NULL content column.  A
       digest store persisted by the v1 code no longer matches those
       rows' v2 digests, so previously-admitted null-containing rows
       would be re-admitted once after upgrade.  Rebuild (or migrate
       via one ``exact_dedup`` pass over the retained corpus) any
       persisted digest store that may contain null-column rows before
       resuming incremental ingest.
    """
    # same null-sentinel encoding as exact_dedup (concat_ws skips
    # nulls; the two operators MUST digest identically or an admitted
    # row would not match its own exact_dedup digest in the store)
    digest = _content_digest(content_cols)
    batch = new_batch.withColumn("_digest", digest)
    # min-id representative per digest via one window on the digest key
    # (same shuffle a groupBy would take, no ambiguous self-join)
    w = Window.partitionBy("_digest").orderBy(id_col)
    self_deduped = (
        batch.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    admitted = self_deduped.join(
        history_digests.select(F.col(digest_col).alias("_digest")),
        "_digest",
        "left_anti",
    )
    return admitted.withColumnRenamed("_digest", digest_col)


def containment_pairs(
    df: DataFrame, id_col: str, text_col: str, tau: float
) -> DataFrame:
    """All ordered pairs where token-set CONTAINMENT |A∩B| / |A| >= tau
    — the subset-duplication detector Jaccard cannot be: a short
    document fully quoted inside a long one has containment 1.0 but
    arbitrarily low Jaccard (boilerplate wrappers, quote farms,
    re-posts with commentary).

    Lossless asymmetric prefix filter: rank each doc's tokens by
    ascending global df; if |A∩B| >= ceil(tau*|A|) then at least one of
    A's first ``|A| - ceil(tau*|A|) + 1`` (rarest) tokens is in B —
    pigeonhole, recall exactly 1.0.  So candidates join A-prefix tokens
    against B's full token index, BUT the index is first semi-joined to
    the distinct prefix-token set: hot tokens ("the") almost never rank
    into a prefix, so the containment join runs on the rare end of the
    Zipf curve just like the Jaccard prefix filter.  No size-ratio
    prune exists here (a tiny doc CAN be contained in a huge one) —
    that asymmetry is the honest extra cost vs jaccard_pairs.

    Returns ordered ``(id_a, id_b, containment)`` with id_a != id_b,
    containment of A in B rounded to 6 (exact-verified).
    """
    t = _token_sets(df, id_col, text_col)
    ex = t.select("_id", "_n", F.explode("_toks").alias("_tok"))
    dfreq = ex.groupBy("_tok").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "_tok")
    ranked = ex.join(dfreq, "_tok").withColumn("_rn", F.row_number().over(w))
    # epsilon-guarded ceil: same IEEE boundary hazard (and fix) as
    # jaccard_pairs_prefix_filtered — can only lengthen the prefix
    prefix = ranked.filter(
        F.col("_rn")
        <= F.col("_n") - F.ceil(F.lit(tau) * F.col("_n") - F.lit(1e-9)) + 1
    )
    ptoks = prefix.select("_tok").distinct()
    index_b = ex.join(ptoks, "_tok", "left_semi")
    cand = (
        prefix.select(F.col("_id").alias("_ida"), "_tok")
        .join(index_b.select(F.col("_id").alias("_idb"), "_tok"), "_tok")
        .filter(F.col("_ida") != F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    t_int = _int_encode(t)
    ta = t_int.select(
        F.col("_id").alias("_ida"), F.col("_toks").alias("_ta"), F.col("_n").alias("_na")
    )
    tb = t_int.select(F.col("_id").alias("_idb"), F.col("_toks").alias("_tb"))
    common = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(ta, "_ida")
        .join(tb, "_idb")
        .withColumn("containment", F.round(common / F.col("_na"), 6))
        .filter(F.col("containment") >= tau)
        .select(
            F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), "containment"
        )
    )


def _tfidf_unit_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_df: int | None = None,
) -> DataFrame:
    """L2-normalized tf-idf postings ``(_id, _tid, _u)`` — the shared
    weighting recipe of ``tfidf_cosine_pairs`` (all-pairs verifier) and
    ``tfidf_cosine_on_candidates`` (the composed 100 TB path).  One
    implementation so the two gates can never drift on a rounding step:
    tf·ln(N/df) rounded to 6, norms summed as DECIMAL(38,12), unit
    weights rounded to 9, tokens xxhash64-encoded to fixed width."""
    toks = (
        df.select(
            F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_tok")
        )
        .groupBy("_id", "_tok")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # N = rankable documents (non-null id AND text), the shared IDF
    # contract with text.document_frequency / retrieval.bm25 (review r7)
    n_docs = df.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.countDistinct(id_col).alias("_n"))
    dfreq = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("_df") <= max_df)
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "_tok",
        F.round(
            F.log(F.col("_n").cast("double") / F.col("_df").cast("double")), 6
        ).alias("_idf"),
    )
    # w feeds both the norm aggregate and the unit-weight join; persist
    # so tokenization + the idf join run once per action tree
    w = scoped_persist(toks.join(idf, "_tok").select(
        "_id",
        "_tok",
        F.round(F.col("_tf").cast("double") * F.col("_idf"), 6).alias("_w"),
    ))
    norms = w.groupBy("_id").agg(
        F.sqrt(
            F.sum(F.round(F.col("_w") * F.col("_w"), 12).cast("decimal(38,12)")).cast(
                "double"
            )
        ).alias("_norm")
    )
    return (
        w.join(norms, "_id")
        .where(F.col("_norm") > 0)
        .select(
            "_id",
            F.xxhash64("_tok").alias("_tid"),
            F.round(F.col("_w") / F.col("_norm"), 9).alias("_u"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.3,
    max_df: int | None = None,
    *,
    within_buckets: bool = False,
    row_budget: int | None = 100_000,
) -> DataFrame:
    """EXACT weighted-cosine near-dup pairs over tf-idf vectors, computed
    as an inverted-index self-join — no dense vectors, no cartesian
    product: a pair is generated only if it shares at least one token,
    which for any ``tau > 0`` loses nothing (disjoint documents have
    cosine exactly 0).

    Weighting: tf·ln(N/df) rounded to 6 decimals, L2-normalized per doc
    (unit weights rounded to 9), per-pair contributions summed as
    DECIMAL(38,15) so accumulation order is immaterial; the DuckDB
    oracle replicates every rounding step.

    Scale shape: candidate volume is Σ_token df(token)² — the hot end of
    the Zipf curve pays quadratically, which is exactly the stop-word
    mass idf already declares worthless.  ``max_df`` drops tokens whose
    document frequency exceeds it from BOTH weighting and pairing
    (lossy BY CONTRACT — a df-capped cosine, the standard production
    trade; Bayardo-style cosine prefix filtering is the lossless
    alternative and its Jaccard sibling lives in
    ``jaccard_pairs_prefix_filtered``).  The default gate runs uncapped
    for oracle exactness.  Join keys are xxhash64 token ids (fixed
    width), the pair aggregate is one shuffle on (id_a, id_b).

    The "verifier, not generator" contract is mechanical: unless the
    caller passes ``within_buckets=True`` (or a ``max_df`` cap at or
    below ``_MAX_DF_GUARD_EXEMPT``) the input must fit ``row_budget``
    rows or the operator raises (``_quadratic_guard``).  Why the cap
    bound: with ``max_df <= m``, candidate pairs are bounded by
    ``(m/2) x total postings`` — LINEAR in corpus size with constant
    ``m/2`` — so a modest cap genuinely de-quadratifies the plan,
    whereas an astronomically large ``max_df`` (> any real df) bounds
    nothing and must NOT bypass the guard (ADVICE r11).  The scale-path
    candidate GENERATOR is ``lsh_candidate_pairs``.
    """
    _quadratic_guard(
        df,
        "tfidf_cosine_pairs",
        row_budget,
        within_buckets or (max_df is not None and max_df <= _MAX_DF_GUARD_EXEMPT),
    )
    unit = _tfidf_unit_weights(df, id_col, text_col, max_df)
    a, b = unit.alias("a"), unit.alias("b")
    return (
        a.join(b, (F.col("a._tid") == F.col("b._tid")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(
            # decimal-round the exact decimal sum, THEN cast: rounding
            # the double image can flip pair ADMISSION when the true
            # sum sits on a 6dp half edge (the tau >= filter below)
            F.round(
                F.sum(
                    F.round(F.col("a._u") * F.col("b._u"), 15).cast("decimal(38,15)")
                ),
                6,
            ).cast("double").alias("cosine")
        )
        .where(F.col("cosine") >= tau)
    )


def tfidf_cosine_on_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.8,
    num_hashes: int = 16,
    bands: int = 2,
) -> DataFrame:
    """The composed 100 TB near-dup recipe: MinHash-LSH banded buckets
    GENERATE candidate pairs; exact tf-idf cosine (the
    ``tfidf_cosine_pairs`` weighting, bit-identical via the shared
    ``_tfidf_unit_weights``) VERIFIES only those pairs.

    Why the composition exists (SCALE.md round 8): the all-pairs tf-idf
    verifier's candidate volume is Σ_token df(token)² — measured 4.5M →
    448M → 45.1B per ×10 on the replica fixture — so it cannot be the
    candidate GENERATOR at scale.  Banded LSH generates O(docs × bands)
    bucket rows and pairs only within buckets, so the expensive weighted
    cosine runs on a set whose size tracks the true near-dup density,
    not the vocabulary's Zipf head.

    Output contract: ``(id_a, id_b, cosine)`` for candidate pairs with
    cosine >= tau.  Recall is the LSH sigmoid (P(candidate | jaccard j)
    = 1-(1-j^r)^b), NOT 1.0 — by contract, same as ``minhash_lsh_pairs``.
    In production, run ``exact_dedup`` collapse upstream so identical
    docs pay the banding once; this operator bands the raw frame, which
    is equivalent on exact-dup-free corpora and keeps the oracle 1:1.

    Scale shape: one shuffle to band (docs × bands rows, ~50 B each), a
    bucket self-join, a distinct to rebalance band-skew, then the
    verify joins shuffle candidate×token rows on (pair, token-id) —
    bounded by |candidates| × doc length, never df².
    """
    cand = lsh_candidate_pairs(df, id_col, text_col, num_hashes, bands)
    return tfidf_cosine_verify_candidates(df, cand, id_col, text_col, tau)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 2,
) -> DataFrame:
    """Candidate-GENERATION half of ``tfidf_cosine_on_candidates``:
    distinct ``(id_a, id_b)`` pairs sharing at least one MinHash band
    bucket.  Exposed separately so a production run can CHECKPOINT the
    candidate set to parquet between generation and verification — the
    candidate table is small (16 bytes/pair; 148.85M pairs ≈ 2 GiB at
    the sf1 replica) while the verify join's shuffle scratch is
    |candidates| × doc length, so staging bounds peak scratch to
    max(stage) instead of sum and makes the expensive half resumable.
    """
    t = _token_sets(df, id_col, text_col)
    # banded rows feed the self-join twice; persist so tokenization +
    # signing run once (same rationale as _minhash_lsh_rep_pairs)
    banded = scoped_persist(_band_rows(t, num_hashes, bands))
    left = banded.select(F.col("_id").alias("id_a"), "_band", "_bh")
    right = banded.select(F.col("_id").alias("id_b"), "_band", "_bh")
    # the distinct's exchange rebalances pairs off the (band, bucket)
    # partitioning — heavily skewed when near-dup clusters are large
    return (
        left.join(right, ["_band", "_bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def tfidf_cosine_verify_candidates(
    df: DataFrame,
    cand: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.8,
) -> DataFrame:
    """Verification half of ``tfidf_cosine_on_candidates``: exact
    tf-idf cosine over an EXPLICIT candidate-pair frame ``cand``
    (columns ``id_a``, ``id_b``) — which may come straight from
    ``lsh_candidate_pairs`` (the fused gate) or be read back from a
    parquet checkpoint, including a hash-partitioned SLICE of it: the
    verify is per-pair independent, so verifying disjoint candidate
    chunks and unioning the outputs is value-identical to one pass
    (scripts/staged_tfidf_sf1.py runs exactly that shape at sf1).
    """
    unit = _tfidf_unit_weights(df, id_col, text_col)
    a = unit.select(
        F.col("_id").alias("id_a"), "_tid", F.col("_u").alias("_ua")
    )
    b = unit.select(
        F.col("_id").alias("id_b"), "_tid", F.col("_u").alias("_ub")
    )
    return (
        cand.join(a, "id_a")
        .join(b, ["id_b", "_tid"])
        .groupBy("id_a", "id_b")
        .agg(
            # decimal-round the exact decimal sum, THEN cast — same
            # half-edge admission contract as tfidf_cosine_pairs
            F.round(
                F.sum(
                    F.round(F.col("_ua") * F.col("_ub"), 15).cast("decimal(38,15)")
                ),
                6,
            ).cast("double").alias("cosine")
        )
        .where(F.col("cosine") >= tau)
    )


def tfidf_cosine_staged(
    df: DataFrame,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    tau: float = 0.8,
    num_hashes: int = 16,
    bands: int = 2,
    shards: int = 8,
) -> DataFrame:
    """The composed 100 TB dedup recipe in its PRODUCTION shape —
    ``tfidf_cosine_on_candidates`` with a durable candidate checkpoint
    and sharded verification, the resumable staging that completed the
    sf1 run where the fused plan died three times at ~90 GiB of shuffle
    scratch (SCALE.md r10; scripts/staged_tfidf_sf1.py is the fresh-JVM
    batch form this API encodes).

    Stages, each skipped when its output already exists (``_SUCCESS``
    marker via the Hadoop FS API, so resume works on any filesystem):

    1. ``{checkpoint_dir}/candidates`` — distinct LSH candidate pairs
       (``lsh_candidate_pairs``), hash-partitioned into ``shards``
       chunks on ``xxhash64(id_a, id_b)``.  Pairs are 16 B each; the
       partition column lets every verify stage read exactly 1/N of
       them via partition pruning.
    2. ``{checkpoint_dir}/verified/chunk=k`` — shard k's pairs verified
       with the exact tf-idf cosine (``tfidf_cosine_verify_candidates``).
       Per-pair verification is independent, so the union over disjoint
       shards is value-identical to the fused operator (pinned by
       tests/test_dedup.py::test_tfidf_staged_equals_fused); peak
       shuffle scratch is ~1/N of the fused run's and a killed shard
       re-runs alone.

    Returns the unioned verified pairs ``(id_a, id_b, cosine)`` read
    back from the checkpoint.  In a single session the shards run
    sequentially; at 100 TB run each shard as its own job (one JVM per
    shard reclaims scratch deterministically — the staged_tfidf_sf1
    loop) and call this afterwards: every completed stage is skipped.

    Resume is parameter-checked (ADVICE r11, medium): the first run
    persists ``(tau, num_hashes, bands, shards, id_col, text_col)`` to
    ``{checkpoint_dir}/_manifest`` (a one-row JSON dataset, so it works
    on any Hadoop filesystem); a resume whose arguments differ RAISES
    instead of silently reusing stale stages.  The sharpest such trap:
    resuming with a smaller ``shards`` would skip candidate
    regeneration (its ``_SUCCESS`` exists) but read only chunks
    ``0..shards-1`` of a checkpoint whose ``_chunk`` values span the
    old modulus — silently dropping candidate pairs.  Changed
    ``tau``/``num_hashes``/``bands`` likewise invalidate the cached
    stages (different candidates or admission threshold).  Pre-manifest
    checkpoints (written before r12) adopt the CURRENT call's
    parameters on first touch — the caller owning such a checkpoint is
    the caller who created it with the original script loop.
    """
    spark = df.sparkSession

    def _done(path: str) -> bool:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/_SUCCESS")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(p)

    manifest_path = f"{checkpoint_dir}/_manifest"
    manifest_schema = (
        "tau double, num_hashes int, bands int, shards int, "
        "id_col string, text_col string"
    )
    params = {
        "tau": float(tau),
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "shards": int(shards),
        "id_col": id_col,
        "text_col": text_col,
    }
    if _done(manifest_path):
        stamped = spark.read.schema(manifest_schema).json(manifest_path).first()
        drift = {
            k: (stamped[k], v) for k, v in params.items() if stamped[k] != v
        }
        if drift:
            raise ValueError(
                f"tfidf_cosine_staged: resume parameters differ from the "
                f"ones this checkpoint was written with — "
                f"{ {k: f'checkpoint={old!r} call={new!r}' for k, (old, new) in drift.items()} }. "
                f"Cached stages under {checkpoint_dir!r} are only valid "
                f"for the original parameters (a different `shards` "
                f"modulus silently drops pairs; different tau/num_hashes/"
                f"bands change the candidate set).  Point the run at a "
                f"fresh checkpoint_dir, or delete this one to rebuild."
            )
    else:
        spark.createDataFrame([params], manifest_schema).coalesce(1).write.mode(
            "overwrite"
        ).json(manifest_path)

    cand_path = f"{checkpoint_dir}/candidates"
    cand = lsh_candidate_pairs(df, id_col, text_col, num_hashes, bands).withColumn(
        "_chunk", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(shards))
    )
    if not _done(cand_path):
        cand.write.mode("overwrite").partitionBy("_chunk").parquet(cand_path)
    # explicit schemas on every read-back: a partitionBy write of ZERO
    # candidate rows (empty/degenerate corpus) emits only _SUCCESS, and
    # schema inference on a file-less parquet dir raises — caught by
    # the empty-fixture battery, r11
    cand_read = spark.read.schema(cand.schema).parquet(cand_path)
    verify_schema = None
    for k in range(shards):
        out = f"{checkpoint_dir}/verified/chunk={k}"
        cand_k = cand_read.where(F.col("_chunk") == k).select("id_a", "id_b")
        res = tfidf_cosine_verify_candidates(df, cand_k, id_col, text_col, tau)
        verify_schema = res.schema
        if _done(out):
            continue
        res.write.mode("overwrite").parquet(out)
    return spark.read.schema(verify_schema).parquet(
        *[f"{checkpoint_dir}/verified/chunk={k}" for k in range(shards)]
    )


def _band_rows(
    t: DataFrame, num_hashes: int, bands: int, keep_n: bool = False
) -> DataFrame:
    """(_id, _band, _bh) banded-signature rows for a token-set frame —
    the same band encoding as ``_minhash_lsh_rep_pairs`` (r signature
    ints joined verbatim), so indexes built here collide identically.
    ``keep_n=True`` additionally carries the token-set size ``_n`` (one
    int per row) so the LSH pair path can size-prune candidates at the
    band join itself."""
    r = num_hashes // bands
    signed = _sign_token_sets(t, num_hashes)
    band_cols = F.array(
        *[
            F.concat_ws(",", *[F.col("_sig")[b * r + i] for i in range(r)])
            for b in range(bands)
        ]
    )
    cols = ["_id", "_n"] if keep_n else ["_id"]
    return signed.select(*cols, F.posexplode(band_cols).alias("_band", "_bh"))


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 2,
) -> DataFrame:
    """The persistable LSH index of a corpus: DISTINCT ``(_band, _bh)``
    band buckets.  ~2 short strings per document REGARDLESS of document
    size — the store a 100 TB corpus leaves behind is gigabytes, and
    admission never re-reads the corpus text."""
    assert num_hashes % bands == 0
    t = _token_sets(df, id_col, text_col)
    return _band_rows(t, num_hashes, bands).select("_band", "_bh").distinct()


def minhash_admission(
    batch: DataFrame,
    store_index: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 2,
) -> DataFrame:
    """Incremental near-dup ADMISSION: screen a new batch against a
    historical corpus's banded-MinHash index (``minhash_band_index``).

    A document is rejected when ANY of its band buckets already exists
    in the store — the signature-level screen (P[collide] =
    1-(1-j^r)^b), with no exact verify: the store deliberately keeps no
    token sets, because retaining them would mean re-shipping corpus
    content on every ingest.  That asymmetry is the production trade:
    admission cost is O(batch x bands) probe rows semi-joined against a
    compact key — Bloom-prunable under the runtime-filter confs — and
    the false-positive rate is the banding curve's, bounded and
    tunable, while false negatives match plain MinHash-LSH.

    Returns the batch's ``(id, admitted)`` verdict for every input row
    (order-free; join it back to the batch to route).  Batch-INTERNAL
    duplicates are out of scope by contract — run ``minhash_lsh_pairs``
    or ``incremental_dedup`` within the batch first.  Rows with NULL
    text admit trivially — a content screen has no bands to collide for
    a contentless row; pair with a validity filter upstream if absent
    payloads must not pass (the verdict base is the BATCH, not the
    token-set frame, so the contract above holds for them too).
    """
    assert num_hashes % bands == 0
    t = _token_sets(batch, id_col, text_col)
    probes = _band_rows(t, num_hashes, bands)
    rejected = (
        probes.join(store_index, ["_band", "_bh"], "left_semi")
        .select("_id")
        .distinct()
        .withColumn("_rej", F.lit(True))
    )
    return (
        batch.select(F.col(id_col).alias("_id"))
        .join(rejected, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(~F.col("_rej"), F.lit(True)).alias("admitted"),
        )
    )
