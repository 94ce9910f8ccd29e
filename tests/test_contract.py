"""data-contract semantics on crafted frames: every rule kind, null
handling, FK orphans, empty input, unknown rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import contract


@pytest.fixture()
def frame(spark):
    rows = [
        # id, val, status, ref_key
        (1, 10.0, "OK", 100),
        (2, None, "OK", 100),
        (2, 500.0, "BAD", 101),   # dup id, out-of-range, bad status
        (4, 50.0, "OK", 999),     # orphan fk
        (5, -3.0, None, None),    # negative, null status, null fk
    ]
    return spark.createDataFrame(rows, "id int, val double, status string, ref int")


@pytest.fixture()
def ref(spark):
    return spark.createDataFrame([(100,), (101,)], "k int")


def _report(frame, ref):
    rules = [
        {"rule": "not_null", "col": "val"},
        {"rule": "unique", "cols": ["id"]},
        {"rule": "range", "col": "val", "lo": 0.0, "hi": 100.0},
        {"rule": "in_set", "col": "status", "values": ["OK"]},
        {"rule": "fk", "col": "ref", "ref": ref, "ref_col": "k"},
        {"rule": "regex", "col": "status", "pattern": "^[A-Z]+$"},
        {"rule": "expr", "expr": "val > 5", "col": "val"},
    ]
    return {r["rule_id"]: r for r in contract.contract_report(frame, rules).collect()}


def test_rule_semantics(frame, ref):
    got = _report(frame, ref)
    assert got[0]["n_violations"] == 1          # one null val
    assert got[1]["n_violations"] == 1          # one duplicate id
    assert got[2]["n_violations"] == 2          # 500.0 and -3.0; null ignored
    assert got[3]["n_violations"] == 1          # BAD; null ignored
    assert got[4]["n_violations"] == 1          # 999; null ignored
    assert got[5]["n_violations"] == 0          # OK/BAD both match; null ignored
    assert got[6]["n_violations"] == 2          # null val and -3.0 fail val > 5
    assert all(r["n_rows"] == 5 for r in got.values())
    assert got[5]["passed"] and not got[0]["passed"]


def test_expr_null_counts_as_violation(spark):
    df = spark.createDataFrame([(None,), (1.0,), (10.0,)], "x double")
    rep = contract.contract_report(df, [{"rule": "expr", "expr": "x > 5", "col": "x"}])
    assert rep.collect()[0]["n_violations"] == 2  # null and 1.0


def test_empty_frame(spark, ref):
    df = spark.createDataFrame([], "id int, val double, status string, ref int")
    rules = [
        {"rule": "not_null", "col": "val"},
        {"rule": "unique", "cols": ["id"]},
        {"rule": "fk", "col": "ref", "ref": ref, "ref_col": "k"},
    ]
    rows = contract.contract_report(df, rules).collect()
    assert len(rows) == 3
    assert all(r["n_violations"] == 0 and r["passed"] and r["n_rows"] == 0 for r in rows)


def test_unknown_rule_raises(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError):
        contract.contract_report(df, [{"rule": "positive", "col": "x"}]).collect()


def test_multi_col_unique(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "x int, y string"
    )
    rep = contract.contract_report(df, [{"rule": "unique", "cols": ["x", "y"]}])
    assert rep.collect()[0]["n_violations"] == 1


def test_unique_null_keys_exempt(spark):
    """Regression (r7 ADVICE): countDistinct skips null-keyed rows, so
    comparing it against count(*) flagged every null-keyed row as a
    duplicate. SQL UNIQUE semantics: nulls are exempt — two null ids and
    three distinct non-null ids is a clean table; one real duplicate
    still counts."""
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (2,), (3,)], "id int"
    )
    rep = contract.contract_report(df, [{"rule": "unique", "cols": ["id"]}])
    row = rep.collect()[0]
    assert row["n_violations"] == 0 and row["passed"]

    dup = spark.createDataFrame([(None,), (1,), (1,), (2,)], "id int")
    assert contract.contract_report(
        dup, [{"rule": "unique", "cols": ["id"]}]
    ).collect()[0]["n_violations"] == 1

    # multi-col: a null in ANY key column exempts the row
    mc = spark.createDataFrame(
        [(1, None), (1, None), (1, "a"), (1, "a")], "x int, y string"
    )
    assert contract.contract_report(
        mc, [{"rule": "unique", "cols": ["x", "y"]}]
    ).collect()[0]["n_violations"] == 1
