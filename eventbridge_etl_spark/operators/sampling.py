"""Deterministic sampling and dataset splits.

Training-data pipelines need samples that are REPRODUCIBLE (same rows on
every run, every cluster size, every engine) and KEY-STABLE (a document
keeps its split assignment when the corpus is re-processed).  Spark's
``df.sample`` is neither — it seeds per-partition RNGs, so results
change with partitioning.  These operators derive the sampling decision
from a hash of the key itself:

    bucket(key) = int(md5(key)[:8], 16) / 2^32   in [0, 1)

- md5 (not xxhash64) so any engine can reproduce the decision — the
  DuckDB oracles replicate it bit-for-bit;
- the decision is a pure projection: sampling never shuffles, never
  collects, and composes with pushdown (a sampled scan stays a scan).

At 100 TB a 1% deterministic sample is a full scan that keeps 1% of
rows; to avoid even reading the other 99%, persist the bucket as a
partition/bucket column at ingest (sinks.write_partitioned) and prune.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 2^32, the denominator of the md5-derived uniform bucket.
_DENOM = float(2**32)


def hash_fraction(key: Column | str) -> Column:
    """Uniform [0,1) value derived from md5 of the key (engine-portable).

    NULL keys hash to NULL, which every comparison treats as unknown —
    so a filter on this column DROPS null-key rows, a when() routes
    them to the otherwise() branch, and a window ORDER BY sorts them
    first.  Each caller documents which of those it means.
    """
    col = F.col(key) if isinstance(key, str) else key
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(_DENOM)


def _guard_internal(df: DataFrame, names: list[str]) -> None:
    """Raise when input columns collide with internal temp names — the
    transforms would silently overwrite then drop them (the
    features._guard_temp_columns contract, applied here; review r7)."""
    clash = sorted(set(names) & set(df.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with internal temp columns; "
            "rename them before calling this transform"
        )


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — stable across
    runs, partitionings, and engines.  NULL-key rows are never kept at
    any fraction (null hash fails the filter); assign surrogate keys
    first if they must participate."""
    return df.filter(hash_fraction(key) < fraction)


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-balancing step of
    a training-data pipeline (e.g. keep 100% of low-resource languages,
    5% of English).  Each stratum gets its own keep-fraction; rows in
    strata absent from ``fractions`` keep ``default_fraction``.

    Same md5-key bucketing as ``deterministic_sample`` (key-stable,
    engine-portable, pure projection+filter — no shuffle, composes with
    pushdown), so growing or re-partitioning the corpus never changes
    which rows a stratum keeps."""
    frac: Column = F.lit(float(default_fraction))
    for value, fraction in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == value, float(fraction)).otherwise(frac)
    return df.filter(hash_fraction(key) < frac)


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Tag each row 'train' or 'test' by key hash.  A key's assignment
    never changes as the corpus grows — the property that keeps test
    sets uncontaminated across dataset versions.  NULL-key rows all
    land in 'train' (null hash routes to the otherwise branch) — the
    conservative side, since an unidentifiable row in the test set
    could silently duplicate training text; note the asymmetry with
    ``deterministic_sample``, which DROPS null keys."""
    if split_col in df.columns:
        raise ValueError(
            f"split_col {split_col!r} already exists in the input; this "
            "transform appends a new column — pick another name"
        )
    return df.withColumn(
        split_col,
        F.when(hash_fraction(key) < test_fraction, "test").otherwise("train"),
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_cols: list[Column | str], n: int
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen by a deterministic
    order — the per-domain/per-source cap of a crawl pipeline (no single
    domain may dominate the corpus).

    ``row_number`` over ``(group, order)``: Spark 4's WindowGroupLimit
    rule pushes the rank<=n filter below the shuffle as a per-partition
    partial top-n, so a hot domain holding 10% of a crawl contributes at
    most n rows *per map partition* to the exchange instead of its full
    volume — the skew case this operator exists for is exactly the case
    the plan handles.  Order columns must be a total order (include a
    unique key) or the cap is nondeterministic across runs.
    """
    if n <= 0:
        raise ValueError("cap must be positive")
    _guard_internal(df, ["_rn"])
    w = Window.partitionBy(group_col).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def temperature_resample(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    total: int = 300,
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-LM
    sampling rule, p_s ∝ n_s^alpha): allocate a ``total`` budget across
    sources by tempered share, then take each source's quota
    deterministically by key hash.

    alpha=1 reproduces natural proportions; alpha=0 gives uniform
    per-source; 0.5 is the common compromise that up-weights small
    sources without letting them dominate.

    Engine-portable determinism: the tempered weights are summed as
    DECIMAL images of sqrt(n) (double summation order varies across
    engines; decimal summation cannot), the quota is floor(share*total
    + 0.5) on pure IEEE doubles, and within-source selection orders by
    md5(key) — the same key-stable hash as ``hash_fraction``.

    Scale shape: the per-source histogram is a tiny agg (sources are
    few); it broadcasts back onto the corpus, and the per-source pick is
    one ranked window guarded by a LITERAL ``rn <= total`` filter —
    every per-source quota is <= ``total``, and the literal bound is
    what lets Spark's WindowGroupLimit run a partial top-k below the
    exchange, so no map partition ships more than ``total`` rows per
    source into the sort.  (The exact ``rn <= quota`` filter compares
    against a joined column and cannot push down on its own — verified
    in the physical plan.)
    """
    _guard_internal(df, ["_n", "_d", "_k", "_rn"])
    # a null source would contribute tempered mass to the normalizer
    # and then vanish at the quota equi-join (null never equi-joins),
    # silently deflating every real source's quota; a null ROW KEY has
    # md5(null)=null, sorts FIRST in the selection window, and ties with
    # every other null key — preferentially selected in nondeterministic
    # order (review, r7).  Drop both up front.
    df = df.filter(F.col(group_col).isNotNull() & F.col(key_col).isNotNull())
    # alpha=0.5 routes through F.sqrt, not pow: Math.pow is specified
    # only to 1 ulp and does not special-case y=0.5, while the oracle's
    # sqrt is correctly rounded — a 1-ulp gap landing on a
    # DECIMAL(18,6) half-boundary would flip a source's quota by one
    base = F.col("_n").cast("double")
    d = (
        F.sqrt(base) if alpha == 0.5 else F.pow(base, F.lit(alpha))
    ).cast("decimal(18,6)")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n")).select(
        group_col, d.alias("_d")
    )
    z = counts.agg(F.sum("_d").alias("_z"))
    quota = counts.crossJoin(F.broadcast(z)).select(
        group_col,
        F.floor(
            F.col("_d").cast("double") / F.col("_z").cast("double") * total + 0.5
        )
        .cast("int")
        .alias("_k"),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), key_col
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(total))  # literal → WindowGroupLimit
        .join(F.broadcast(quota), group_col)
        .filter(F.col("_rn") <= F.col("_k"))
        .drop("_rn", "_k")
    )


def weighted_systematic_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
) -> DataFrame:
    """Weighted (probability-proportional-to-size) systematic sampling:
    lay k evenly-spaced points over the cumulative INTEGER weight line
    (rows ordered by key hash) and keep every row an arrival point
    lands in — inclusion probability ∝ weight, exactly k points per
    group, deterministic.

    Selection is pure integer arithmetic — ``points_below(x) =
    (x*k + total - 1) div total`` — so any engine reproduces the same
    sample bitwise (no float division anywhere).  Weights must be an
    INTEGRAL column (byte/short/int/long) — a fractional weight would
    silently mix truncated (running-sum) and untruncated (row-weight)
    arithmetic, so it raises instead.  With 64-bit intermediates the
    math is exact to ``total * k < 2^63`` — beyond that, widen to
    decimal.

    Scale shape — grouped (the normal corpus case: per-source budgets):
    two window passes over ONE group partitioning (running and total
    weight), then a map-side filter; no global sort.  Ungrouped: a
    distributed two-pass prefix sum over LOGICAL buckets — the first
    two hex chars of the md5 order key (256 buckets, uniform by
    construction, and a PREFIX of the sort key, so bucket order equals
    global order).  Pass 1: local running sums per bucket (one hash
    shuffle).  Pass 2: the 256 bucket subtotals broadcast back as
    offsets; the only single-partition window runs over those 256
    rows.  Buckets are content-derived — never ``spark_partition_id``,
    which AQE coalescing can evaluate differently in the window branch
    vs the subtotal branch of the same plan.  Verified by property test
    against the naive single-machine cumsum at 1e6 rows under multiple
    input partitionings.
    """
    if k < 1:
        raise ValueError(
            f"k must be >= 1, got {k} — a nonpositive k would silently "
            "return an empty sample (no arrival point lands anywhere)"
        )
    dtype = df.schema[weight_col].dataType.simpleString()
    if dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"weight column {weight_col!r} must be integral, got {dtype}; "
            "round or rescale weights to integers first"
        )
    # PPS contract: inclusion probability ∝ weight, so nonpositive
    # weights select nothing BY DEFINITION — but left in the frame a
    # negative weight makes the running sum non-monotone (intervals
    # overlap, grid points double-select) and a null KEY feeds phantom
    # mass into the bucket offsets that the _bkt equi-join then drops.
    # Both are excluded up front; an all-filtered input returns empty.
    df = df.filter(
        F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
        & F.col(key_col).isNotNull()
    )
    key, w = F.col(key_col), F.col(weight_col).cast("long")
    # points_below(x) = ceil(x*k/total) via integer arithmetic only;
    # _w is the SAME long image used in the running sum, so the lower
    # bound subtracts exactly what the running sum added
    n_hi = F.expr(f"(_wi * {k} + _tot - 1) div _tot")
    n_lo = F.expr(f"((_wi - _w) * {k} + _tot - 1) div _tot")

    if group_col is not None:
        order = [F.md5(key.cast("string")), key]
        run = Window.partitionBy(group_col).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        whole = Window.partitionBy(group_col).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return (
            df.withColumn("_w", w)
            .withColumn("_wi", F.sum("_w").over(run))
            .withColumn("_tot", F.sum("_w").over(whole))
            .filter(n_hi > n_lo)
            .drop("_w", "_wi", "_tot")
        )

    # ungrouped: two-pass global prefix sum over md5-prefix buckets.
    # bucket asc + (_ord, key) asc within bucket == global (_ord, key)
    # order, because the bucket IS the first two chars of _ord.
    bucketed = (
        df.withColumn("_w", w)
        .withColumn("_ord", F.md5(key.cast("string")))
        .withColumn("_bkt", F.substring("_ord", 1, 2))
    )
    local = Window.partitionBy("_bkt").orderBy("_ord", key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bucketed = bucketed.withColumn("_lwi", F.sum("_w").over(local))
    subtotals = bucketed.groupBy("_bkt").agg(F.sum("_w").alias("_ps"))
    prior = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    everything = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = subtotals.select(
        "_bkt",
        F.coalesce(F.sum("_ps").over(prior), F.lit(0)).alias("_off"),
        F.sum("_ps").over(everything).alias("_tot"),
    )
    return (
        bucketed.join(F.broadcast(offsets), "_bkt")
        .withColumn("_wi", F.col("_off") + F.col("_lwi"))
        .filter(n_hi > n_lo)
        .drop("_w", "_ord", "_bkt", "_lwi", "_off", "_wi", "_tot")
    )


def leakage_safe_split(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    test_fraction: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Train/test split that assigns whole NEAR-DUP CLUSTERS to a side,
    never individual documents — the leakage-safe version of
    ``train_test_split``.  A hash split on doc ids puts ~2·f·(1−f) of
    every duplicate pair across the boundary, silently leaking training
    text into eval; splitting on the cluster label makes that
    impossible by construction.

    ``pairs`` is any near-dup pair frame (minhash/simhash/embedding —
    (id_a, id_b) columns); clusters come from the same min-label
    propagation as ``dedup.near_dup_clusters``, then the md5 hash-
    fraction split is applied to ``cluster_id``.  Returns
    ``(id_col, cluster_id, split)`` — one row per input node, split
    stable under corpus growth exactly like ``train_test_split``.

    Scale: cluster collapse is the bounded-iteration label propagation
    (see near_dup_clusters); the split itself is a map-only projection.
    """
    from eventbridge_etl_spark.operators.dedup import near_dup_clusters

    clusters = near_dup_clusters(nodes, pairs, id_col)
    return clusters.withColumn(
        split_col,
        F.when(hash_fraction(F.col("cluster_id")) < test_fraction, "test").otherwise(
            "train"
        ),
    )


def balanced_class_sample(
    df: DataFrame, class_col: str, key: str
) -> DataFrame:
    """Downsample every class to the size of the SMALLEST class —
    exact-count class balancing (the eval-set construction rule, and
    the hard version of temperature resampling's soft rebalance).

    Selection is deterministic and growth-stable per class: rows rank
    by (md5 hash-fraction of ``key``, ``key``) and the first
    ``min_class_count`` survive.  The min count rides a broadcast
    1-row aggregate; the rank is one window keyed on the class.  The
    data-dependent bound means Spark cannot push a WindowGroupLimit
    partial top-k here (contrast temperature_resample's literal bound)
    — the full per-class rank is computed, one key shuffle, which is
    the honest cost of an exact data-dependent quota.
    """
    # null is NOT a class: a handful of unlabeled rows would otherwise
    # become the smallest "class" and cap every real class at their
    # count, collapsing the output (and hash_fraction(null) sorts
    # first, preferentially retaining null keys) — drop both up front
    df = df.filter(F.col(class_col).isNotNull() & F.col(key).isNotNull())
    sizes = df.groupBy(class_col).agg(F.count("*").alias("_cn"))
    min_n = sizes.agg(F.min("_cn").alias("_min_n"))
    w = Window.partitionBy(class_col).orderBy(
        hash_fraction(key), F.col(key)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(min_n))
        .filter(F.col("_rk") <= F.col("_min_n"))
        .drop("_rk", "_min_n")
    )
