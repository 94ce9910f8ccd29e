"""Record-linkage semantics: blocked fuzzy join recall vs brute force,
pigeonhole blocking guarantees, agreement-score arithmetic, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import linkage


def _sides(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex inc"), (3, "initech llc"),
         (4, "umbrella co"), (5, "acme corq")],  # 5 is a typo'd 1
        "l_id int, l_name string",
    )
    right = spark.createDataFrame(
        [(10, "acme corp"), (11, "globex onc"), (12, "hooli io"),
         (13, "umbrella co")],
        "r_id int, r_name string",
    )
    return left, right


def _half_blocks(lc, rc):
    """Two complementary-half passes: pigeonhole for 1 substitution on
    equal-length strings."""
    lh1 = F.substring(F.col(lc), 1, 5)
    rh1 = F.substring(F.col(rc), 1, 5)
    lh2 = F.substring(F.col(lc), 6, 100)
    rh2 = F.substring(F.col(rc), 6, 100)
    return [
        (F.concat(F.lit("A|"), lh1), F.concat(F.lit("A|"), rh1)),
        (F.concat(F.lit("B|"), lh2), F.concat(F.lit("B|"), rh2)),
    ]


def test_blocked_join_matches_brute_force_for_substitutions(spark):
    left, right = _sides(spark)
    got = {
        (r["l_id"], r["r_id"], r["lev_dist"])
        for r in linkage.blocked_fuzzy_join(
            left, right, "l_name", "r_name", _half_blocks("l_name", "r_name"),
            max_dist=1,
        ).collect()
    }
    # brute force (test-only cross join) over same-length pairs: the
    # pigeonhole guarantee covers substitution-only edits
    brute = {
        (r["l_id"], r["r_id"], r["d"])
        for r in left.crossJoin(right)
        .withColumn("d", F.levenshtein("l_name", "r_name"))
        .where((F.col("d") <= 1)
               & (F.length("l_name") == F.length("r_name")))
        .collect()
    }
    assert brute <= got  # blocking may also catch length-changing edits
    assert (1, 10, 0) in got and (5, 10, 1) in got and (2, 11, 1) in got
    assert (4, 13, 0) in got
    assert not any(l == 3 for l, _, _ in got)  # initech matches nothing


def test_multi_pass_dedupes_candidates(spark):
    left, right = _sides(spark)
    out = linkage.blocked_fuzzy_join(
        left, right, "l_name", "r_name", _half_blocks("l_name", "r_name"),
        max_dist=1,
    )
    # exact-equal names land in BOTH half blocks — must appear once
    rows = out.where((F.col("l_id") == 1) & (F.col("r_id") == 10)).collect()
    assert len(rows) == 1


def test_guards(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="disjoint"):
        linkage.blocked_fuzzy_join(
            left, left, "l_name", "l_name",
            _half_blocks("l_name", "l_name"),
        )
    with pytest.raises(ValueError, match="blocking pass"):
        linkage.blocked_fuzzy_join(left, right, "l_name", "r_name", [])
    bad = left.withColumnRenamed("l_name", "_blk")
    with pytest.raises(ValueError, match="_blk"):
        linkage.blocked_fuzzy_join(
            bad, right, "_blk", "r_name", _half_blocks("_blk", "r_name")
        )


def test_agreement_score_arithmetic(spark):
    pairs = spark.createDataFrame(
        [("acme corp", "acme corq", 5, 5, "X", "Y"),
         ("acme corp", "acme corp", 5, 5, "X", "X"),
         (None, None, 1, 2, "X", "X")],
        "a string, b string, na int, nb int, sa string, sb string",
    )
    out = {
        (r["a"], r["match_score"])
        for r in linkage.agreement_score(
            pairs,
            [
                {"left": "a", "right": "b", "weight": 0.5, "kind": "fuzzy"},
                {"left": "na", "right": "nb", "weight": 0.3, "kind": "exact"},
                {"left": "sa", "right": "sb", "weight": 0.2, "kind": "exact"},
            ],
        ).collect()
    }
    # fuzzy: 1 - 1/9; exact name & segment as listed
    assert ("acme corp", round(0.5 * (1 - 1 / 9) + 0.3, 6)) in out
    assert ("acme corp", 1.0) in out
    # null-safe on BOTH rule kinds: fuzzy(null, null) agrees 1.0
    assert (None, round(0.5 * 1.0 + 0.3 * 0.0 + 0.2 * 1.0, 6)) in out

    with pytest.raises(ValueError, match="unknown rule"):
        linkage.agreement_score(pairs, [{"left": "a", "right": "b",
                                         "weight": 1, "kind": "soundex"}])


def test_plan_has_no_cartesian(spark):
    left, right = _sides(spark)
    plan = linkage.blocked_fuzzy_join(
        left, right, "l_name", "r_name", _half_blocks("l_name", "r_name")
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
