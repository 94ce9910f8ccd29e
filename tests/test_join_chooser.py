"""Sketch-driven join chooser: the decision flips at each documented
threshold, the estimate evidence is sane, and plan_equi_join executes
the decided shape (broadcast hint honored, salted result == plain)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.plans.explain import physical_plan
from crypto_data_service_loader_spark.plans.join_chooser import (
    choose_join_strategy,
    plan_equi_join,
)


@pytest.fixture(scope="module")
def fk_frames(spark):
    """FK-shaped: 3000-row fact, 100-row dim, ~uniform key."""
    fact = spark.range(3000).select(
        F.col("id").alias("fid"), (F.col("id") % 100).alias("k")
    ).localCheckpoint()
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    ).localCheckpoint()
    return fact, dim


@pytest.fixture(scope="module")
def skew_frames(spark):
    """One hot key on both sides: 2000 x 500 on k=1 -> 1M output pairs
    from 2500 input rows."""
    left = spark.range(2000).select(
        F.col("id").alias("lid"), F.lit(1).alias("k")
    ).localCheckpoint()
    right = spark.range(500).select(
        F.col("id").alias("rid"), F.lit(1).alias("kk")
    ).localCheckpoint()
    return left, right


def test_decision_flips_at_broadcast_threshold(fk_frames):
    fact, dim = fk_frames
    d1 = choose_join_strategy(fact, dim, "k", "k", broadcast_max_rows=100)
    assert d1.strategy == "broadcast" and d1.build_side == "right"
    assert d1.n_left == 3000 and d1.n_right == 100

    # one row under the dim size -> the broadcast rung no longer fires
    d2 = choose_join_strategy(fact, dim, "k", "k", broadcast_max_rows=99)
    assert d2.strategy == "shuffle"  # uniform key: no skew rung either
    # CM estimate upper-bounds and tracks the true 3000-pair FK join
    assert 3000 <= d2.est_pairs <= 3600


def test_decision_flips_at_skew_threshold(skew_frames):
    left, right = skew_frames
    d1 = choose_join_strategy(
        left, right, "k", "kk", broadcast_max_rows=0, skew_factor=4.0
    )
    assert d1.strategy == "salted"
    assert d1.est_pairs >= 2000 * 500  # never underestimates
    assert d1.est_multiplicity > 400

    # raising the factor above the true multiplicity flips it back
    d2 = choose_join_strategy(
        left, right, "k", "kk", broadcast_max_rows=0, skew_factor=1000.0
    )
    assert d2.strategy == "shuffle"


def test_empty_side_decides_broadcast_with_zero_estimate(spark, fk_frames):
    fact, dim = fk_frames
    d = choose_join_strategy(fact, dim.limit(0), "k", "k")
    assert d.strategy == "broadcast" and d.build_side == "right"
    assert d.n_right == 0 and d.est_pairs == 0 and d.est_multiplicity == 0.0


def test_plan_equi_join_executes_the_decision(spark, fk_frames, skew_frames):
    fact, dim = fk_frames
    joined, dec = plan_equi_join(fact, dim, "k", "k", broadcast_max_rows=100)
    assert dec.strategy == "broadcast"
    assert "BroadcastHashJoin" in physical_plan(joined)
    assert joined.count() == 3000

    left, right = skew_frames
    salted, dec2 = plan_equi_join(
        left, right, "k", "kk", broadcast_max_rows=0, skew_factor=4.0, salt=4
    )
    assert dec2.strategy == "salted"
    plain = left.join(right, left["k"] == right["kk"]).count()
    assert salted.count() == plain == 2000 * 500


def test_assert_join_bounded_trips_on_runaway(spark, fk_frames, skew_frames):
    from crypto_data_service_loader_spark.plans.join_chooser import (
        assert_join_bounded,
    )

    fact, dim = fk_frames
    dec = assert_join_bounded(fact, dim, "k", "k", max_pairs=5000)
    assert dec.est_pairs <= 5000  # FK join: ~3000 + CM overshoot

    left, right = skew_frames
    with pytest.raises(ValueError, match="exceeds max_pairs"):
        assert_join_bounded(left, right, "k", "kk", max_pairs=100_000)
