"""Training-set assembly operators: deterministic splits and sequence
packing — the last mile of a pretraining data pipeline, downstream of
dedup/quality (operators/dedup.py, operators/text.py).

Both operators are scan-local (no shuffle beyond the window partition for
packing) and oracle-exact: the split hash is plain integer arithmetic and
the packing is a window cumulative sum, so DuckDB reproduces them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Knuth multiplicative hash constant (2654435761 = 2^32 * golden ratio);
#: spreads sequential ids uniformly over the bucket space.
_KNUTH = 2654435761
_BUCKETS = 1000


def split_bucket(id_col: Column | str) -> Column:
    """Deterministic per-row bucket in [0, 1000) from a numeric id.

    Multiplicative hashing in plain 64-bit integer arithmetic — portable
    across engines (the DuckDB oracle runs the same expression), stable
    across runs/partitions, and O(0 bytes) of state. For string keys or
    adversarial id distributions swap in `F.xxhash64` (engine-specific, so
    rows-only checkable). 64-bit safety: ids up to ~3.4e9 stay under 2^63
    before the mod; beyond that, pre-mod the id first.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (c.cast("long") * F.lit(_KNUTH)) % F.lit(2**32) % F.lit(_BUCKETS)


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Assign every row a stable train/val/test label from its id hash.

    Membership is a pure function of the id — re-running on grown data
    never moves an existing document between splits (the property that
    makes eval sets trustworthy across dataset versions). No shuffle: the
    label is computed inside the scan.
    """
    bucket = split_bucket(id_col)
    val_lo = _BUCKETS - (val_pct + test_pct) * _BUCKETS // 100
    test_lo = _BUCKETS - test_pct * _BUCKETS // 100
    return df.withColumn(
        "split",
        F.when(bucket < val_lo, "train")
        .when(bucket < test_lo, "val")
        .otherwise("test"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_col: str | None = None,
) -> DataFrame:
    """Segment packing: assign docs to fixed-token-budget bins via a single
    window cumulative sum — `bin_id = floor(cumsum_before / budget)`.

    This is the fully data-parallel packing used at scale: one pass, no
    sequential bin state, deterministic given the (group, id) order. A bin
    may overflow `budget` by at most one document's tokens (the straddling
    doc belongs to the bin its cumsum starts in); true first-fit would need
    sequential state per bin and shuffles per iteration for a marginal
    packing-density win. Emits (id, group, n_tokens, bin_id, bin_offset):
    `bin_offset` is the doc's token start position inside its bin's stream.

    Partitioned by `group_col` (e.g. source/shard) so each group packs
    independently — at 100 TB the window runs per-partition after one
    shuffle on the group key; with `group_col=None` a single global
    ordering is used (fine for bounded inputs, not the 100 TB path).
    """
    order = F.col(id_col).asc()
    w = (
        Window.partitionBy(group_col).orderBy(order)
        if group_col is not None
        else Window.partitionBy().orderBy(order)
    )
    cum_before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    cols = [id_col] + ([group_col] if group_col else []) + [tokens_col]
    return df.select(
        *cols,
        (cum_before / F.lit(budget)).cast("long").alias("bin_id"),
        (cum_before % F.lit(budget)).alias("bin_offset"),
    )
