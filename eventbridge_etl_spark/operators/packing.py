"""Training-set assembly: deterministic global shuffle and sequence
packing — the last mile of an LLM data pipeline, after curation picks
WHICH documents to train on, these decide ORDER and LAYOUT.

Both operators are engine-portable by construction (md5-derived
ordering, pure integer window math) so the DuckDB oracles hash-match,
and both are sharded so no step ever needs a global sort:

- ``shuffle_shards``: a seeded, reproducible corpus shuffle.  The
  classic failure mode at 100 TB is ``ORDER BY rand()`` — a global
  sort with a nondeterministic key.  Instead each row gets a stable
  position ``(shard, rank)`` from md5(key, seed): the shard is a hash
  bucket (one shuffle, cluster-width parallelism), the rank a window
  within the shard.  Readers stream shards in any order and get the
  same shuffled dataset on every run, every cluster size.

- ``pack_sequences``: concat-and-chunk packing.  Training consumes
  fixed-length token sequences; documents are concatenated per shard
  (in deterministic key order) and the resulting token stream is cut
  every ``capacity`` tokens.  Each document learns which sequence its
  first token lands in (``seq_id``) and at which offset — enough for a
  writer to materialize packed sequences without ever holding more
  than one shard's stream.  Pure integer cumsum over a window; the
  only shuffle is the hash-partition by shard.

At scale the shard count is the parallelism knob: 100 TB / n_shards
must fit a single task's window comfortably (shards are independent,
so overshooting n_shards costs nothing but small files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_u32(key: Column, seed: int) -> Column:
    """First 32 bits of md5(key || ':' || seed) as a bigint — the
    engine-portable hash every decision here derives from."""
    salted = F.concat(key.cast("string"), F.lit(f":{seed}"))
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def shuffle_shards(
    df: DataFrame,
    key: str,
    seed: int = 0,
    n_shards: int = 64,
    shard_col: str = "shard",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic seeded shuffle: assign every row a stable
    ``(shard, rank)`` position derived from md5(key, seed).

    One hash-partition shuffle; the per-shard rank is a window ordered
    by the full md5 hex (key appended as tie-break for the truncated
    u32).  Changing ``seed`` produces an independent permutation;
    re-running, re-partitioning, or growing the cluster does not.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    # null keys hash to NULL (NULL shard, arbitrary rank) — exclude
    # them up front, same contract as the sampling family (review r6)
    df = df.filter(F.col(key).isNotNull())
    k = F.col(key).cast("string")
    h = F.md5(F.concat(k, F.lit(f":{seed}")))
    out = df.withColumn("_h", h).withColumn(
        # shard derives from the SAME _h expression (one md5 per row,
        # one place for the salt format — review r6)
        shard_col,
        (
            F.conv(F.substring("_h", 1, 8), 16, 10).cast("long") % n_shards
        ).cast("int"),
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_h"), k)
    return out.withColumn(rank_col, F.row_number().over(w)).drop("_h")


def pack_sequences(
    df: DataFrame,
    key: str,
    token_count_col: str,
    capacity: int,
    n_shards: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are streamed per
    shard in key order; the concatenated token stream is cut every
    ``capacity`` tokens.

    Adds columns:

    - ``shard``        — hash bucket (md5-derived, engine-portable)
    - ``start_offset`` — first-token position of this doc in the
      shard's concatenated stream
    - ``seq_id``       — index of the fixed-length sequence the doc's
      first token lands in (``start_offset // capacity``); a doc longer
      than ``capacity`` spans ``ceil`` further sequences

    Integer-exact (no float anywhere), one shuffle (hash by shard),
    one window per shard.  Deterministic because the within-shard
    order is the key itself — which therefore MUST be unique: with
    duplicate keys the relative order of the duplicates (and so their
    offsets) would differ across runs, the exact failure the module
    exists to prevent (review r6).  Null keys are excluded up front
    (NULL shard + arbitrary rank otherwise).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    df = df.filter(F.col(key).isNotNull())
    toks = F.col(token_count_col).cast("long")
    out = df.withColumn(
        "shard", (_md5_u32(F.col(key), seed) % n_shards).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        out.withColumn("_cum", F.sum(toks).over(w))
        .withColumn("start_offset", (F.col("_cum") - toks))
        .withColumn(
            "seq_id", F.floor(F.col("start_offset") / F.lit(int(capacity)))
        )
        .drop("_cum")
    )
