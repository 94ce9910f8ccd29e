"""Sketch-driven join planning: pick broadcast / shuffle / salted from
count-min evidence BEFORE running the join.

Catalyst already picks broadcast-vs-SMJ from byte-size statistics, and AQE
re-plans mid-query — but both reason about INPUT sizes. The failure mode
they miss until runtime is output-size skew: a modest-looking equi-join
whose hot keys multiply into a runaway pair count. The count-min
inner-product estimate (operators/sketch.join_size_estimate, Cormode &
Muthukrishnan 2005 §4.2) upper-bounds |L ⋈ R| from two d×w sketches — no
shuffle of the data, nothing key-sized ever moves — so a pipeline can size
the join it is ABOUT to run and choose its strategy (or refuse a runaway
cross-ish join) while the job is still cheap to re-plan.

At 100 TB the two sketch builds are partial-combined scan-local aggregates
(often already materialized per-partition/per-day and merged with
countmin_merge); the decision itself reads three scalars.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..operators import sketch


@dataclass(frozen=True)
class JoinDecision:
    """The chooser's output: strategy + the sketch evidence it read."""

    strategy: str  # 'broadcast' | 'shuffle' | 'salted'
    build_side: str | None  # 'left' | 'right' for broadcast, else None
    n_left: int
    n_right: int
    est_pairs: int

    @property
    def est_multiplicity(self) -> float:
        """Estimated average output rows per row of the larger side —
        the skew signal (1.0 ≈ FK-join-shaped, >>1 ≈ hot keys)."""
        big = max(self.n_left, self.n_right)
        return self.est_pairs / big if big else 0.0


def choose_join_strategy(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    broadcast_max_rows: int = 1_000_000,
    skew_factor: float = 4.0,
    d: int = 4,
    w: int = 4096,
) -> JoinDecision:
    """Decide how to run ``left ⋈ right`` on an equality key from sketch
    evidence alone. Both sides reduce to d×w count-min sketches (one
    scan-local aggregate each); side row counts fall out of the same
    sketches for free (any sketch row's bucket total counts every input
    row exactly once), and the CM inner product upper-bounds the join
    output. Decision ladder:

    1. ``min(|L|, |R|) <= broadcast_max_rows`` → **broadcast** the small
       side (row-count proxy for Catalyst's byte threshold; the caller
       sets the dial to match executor memory).
    2. ``est_pairs > skew_factor * max(|L|, |R|)`` → **salted**: the
       output multiplies, which with an equi-key means hot keys —
       pre-salt instead of discovering the straggler at runtime. The CM
       estimate only ever OVERSHOOTS (collisions add), so this trigger
       can fire early but never miss real blow-up beyond the factor.
    3. else → plain **shuffle** (sort-merge / shuffled-hash, Spark's
       choice), the right default for FK-shaped joins.

    Cost: three scalar aggregates (bounded single-row collects — the
    sample_pps / IVF-centroid driver-side pattern). Nothing about the
    actual join runs.
    """
    cml = sketch.countmin_build(
        left.select(F.col(left_col).alias("_k")), "_k", d=d, w=w
    ).localCheckpoint()
    cmr = sketch.countmin_build(
        right.select(F.col(right_col).alias("_k")), "_k", d=d, w=w
    ).localCheckpoint()
    # row 0's bucket total counts every input row once: |side| for free
    n_left = int(
        cml.where(F.col("row") == 0).agg(
            F.coalesce(F.sum("cnt"), F.lit(0))
        ).collect()[0][0]
    )
    n_right = int(
        cmr.where(F.col("row") == 0).agg(
            F.coalesce(F.sum("cnt"), F.lit(0))
        ).collect()[0][0]
    )
    prod = (
        cml.alias("a")
        .join(F.broadcast(cmr.alias("b")), ["row", "bucket"])
        .select("row", (F.col("a.cnt") * F.col("b.cnt")).alias("_p"))
        .groupBy("row")
        .agg(F.sum("_p").alias("_ip"))
        .agg(F.coalesce(F.min("_ip"), F.lit(0)).cast("long"))
    )
    est_pairs = int(prod.collect()[0][0])

    if min(n_left, n_right) <= broadcast_max_rows:
        build = "left" if n_left <= n_right else "right"
        return JoinDecision("broadcast", build, n_left, n_right, est_pairs)
    if est_pairs > skew_factor * max(n_left, n_right):
        return JoinDecision("salted", None, n_left, n_right, est_pairs)
    return JoinDecision("shuffle", None, n_left, n_right, est_pairs)


def plan_equi_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    how: str = "inner",
    decision: JoinDecision | None = None,
    salt: int = 8,
    **dials,
) -> tuple[DataFrame, JoinDecision]:
    """Execute the equi-join the way the sketches say: broadcast hint on
    the small side, salted replication for skew, or the plain shuffle
    join. Pass a precomputed ``decision`` to skip re-sketching (e.g. when
    sketches are maintained incrementally); ``**dials`` forward to
    `choose_join_strategy`. Returns (joined frame, decision) so callers
    can log the evidence next to the plan."""
    if decision is None:
        decision = choose_join_strategy(left, right, left_col, right_col, **dials)
    cond = left[left_col] == right[right_col]
    if decision.strategy == "broadcast":
        if decision.build_side == "left":
            return F.broadcast(left).join(right, cond, how), decision
        return left.join(F.broadcast(right), cond, how), decision
    if decision.strategy == "salted":
        from ..operators.relational import salted_join

        # salted_join keys on one shared column name; align the right side
        r = right.withColumnRenamed(right_col, left_col) if right_col != left_col else right
        return salted_join(left, r, left_col, salt=salt, how=how), decision
    return left.join(right, cond, how), decision


def assert_join_bounded(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_pairs: int,
    **dials,
) -> JoinDecision:
    """The runaway-join circuit breaker: estimate |L ⋈ R| from the CM
    sketches and raise BEFORE any shuffle is scheduled if the upper
    bound exceeds ``max_pairs`` — the guard a pipeline puts in front of
    a join whose key cardinality it does not control (user-supplied
    group columns, hot-key telemetry joins). Because the CM estimate
    only ever overshoots, a pass here is a hard guarantee: the true
    join size is <= max_pairs. Returns the decision (with evidence) on
    success."""
    decision = choose_join_strategy(left, right, left_col, right_col, **dials)
    if decision.est_pairs > max_pairs:
        raise ValueError(
            f"join upper bound {decision.est_pairs} pairs exceeds "
            f"max_pairs={max_pairs} (|L|={decision.n_left}, "
            f"|R|={decision.n_right}, est multiplicity "
            f"{decision.est_multiplicity:.1f}); salting won't save an "
            "output this size — rethink the key or pre-aggregate"
        )
    return decision
