"""Relational operator behavior pins (SCD2 history, dataset diff)."""

from __future__ import annotations


def test_scd2_history_versions_and_validity(spark):
    """Consecutive same-attribute rows collapse; validity intervals chain
    [valid_from, valid_to) with exactly one current version per key;
    null attributes are values (null-safe change detection)."""
    import datetime as dt

    from crypto_data_service_loader_spark.operators import relational as rel

    t = lambda s: dt.datetime(2024, 1, 1, s)
    rows = [
        (1, t(1), 10, "A"), (1, t(2), 11, "A"),   # run of A collapses
        (1, t(3), 12, "B"), (1, t(4), 13, None),  # -> B -> NULL
        (1, t(5), 14, None),                      # null run collapses too
        (2, t(1), 20, "X"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, status string"
    )
    out = rel.scd2_history(
        df, "user_id", ["ts", "event_id"], ["status"]
    ).collect()
    u1 = sorted([r for r in out if r["user_id"] == 1],
                key=lambda r: r["version"])
    assert [(r["status"], r["version"]) for r in u1] == [
        ("A", 1), ("B", 2), (None, 3)
    ]
    # validity chains: each valid_to equals the next valid_from
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None and u1[2]["is_current"]
    assert sum(r["is_current"] for r in u1) == 1
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] and u2[0]["version"] == 1


def test_scd2_apply_equals_full_rebuild(spark, tmp_path):
    """Incremental apply == full rebuild on the union, across the tricky
    cases: a batch change equal to the current version (collapses, no
    new version), a key seen only in the batch, a LATE-arriving change
    older than the key's current version (whole timeline re-slots), and
    untouched keys passing through verbatim."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators import relational as rel

    t = lambda s: dt.datetime(2024, 1, 1, s)
    old_rows = [
        (1, t(1), 10, "A"), (1, t(3), 12, "B"),
        (2, t(1), 20, "X"), (2, t(2), 21, "Y"),
        (3, t(1), 30, "K"),                      # untouched by the batch
    ]
    new_rows = [
        (1, t(5), 14, "B"),    # equals current -> collapses
        (1, t(6), 15, "C"),    # real new version
        (2, dt.datetime(2024, 1, 1, 2, 30), 22, "Z"),
        (4, t(2), 40, "N"),    # key only in the batch
        (5, t(4), 50, "P"), (5, t(2), 51, "Q"),  # late arrival within batch
    ]
    schema = "user_id long, ts timestamp, event_id long, status string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    dim = rel.scd2_history(old, "user_id", ["ts", "event_id"], ["status"])
    applied = rel.scd2_apply(
        dim, new, "user_id", ["status"], "ts",
        change_order_cols=["event_id"],
    )
    full = rel.scd2_history(
        old.unionByName(new), "user_id", ["ts", "event_id"], ["status"]
    )
    key = lambda r: (r["user_id"], r["version"])
    a = sorted(map(tuple, applied.collect()), key=lambda x: (x[0], x[-2]))
    b = sorted(map(tuple, full.collect()), key=lambda x: (x[0], x[-2]))
    assert a == b
    # the untouched key's row is literally the dim row (no re-derive)
    u3 = [r for r in applied.collect() if r["user_id"] == 3]
    d3 = [r for r in dim.collect() if r["user_id"] == 3]
    assert [tuple(r) for r in u3] == [tuple(r) for r in d3]
    # production shape — dim persisted as a table: the whole apply plans
    # exactly 4 window passes (1 batch tie-break + 3 re-derive), i.e.
    # the untouched passthrough branch carries NO window/sort of its own
    dim_path = str(tmp_path / "dim")
    dim.write.parquet(dim_path)
    stored = spark.read.parquet(dim_path)
    applied2 = rel.scd2_apply(
        stored, new, "user_id", ["status"], "ts",
        change_order_cols=["event_id"],
    )
    a2 = sorted(map(tuple, applied2.collect()), key=lambda x: (x[0], x[-2]))
    assert a2 == b
    plan = applied2._jdf.queryExecution().optimizedPlan().toString()
    assert 1 <= plan.count("Window") <= 4
    # the passthrough branch is the anti-join side: everything before
    # the first Window mention must contain the LeftAnti join (i.e. the
    # untouched branch plans no window of its own)
    assert "LeftAnti" in plan.split("Window")[0]


def test_dataset_diff_classification(spark):
    """added/removed/changed classification with null-safe compares;
    unchanged rows never appear; old/new value pairs ride along."""
    from crypto_data_service_loader_spark.operators import relational as rel

    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, None), (3, 30, "c"), (4, 40, "d")],
        "id long, v long, tag string",
    )
    new = spark.createDataFrame(
        [(1, 10, "a"),          # unchanged -> dropped
         (2, 20, "b"),          # null -> value = changed (null-safe)
         (3, 31, "c"),          # value changed
         (5, 50, "e")],         # added; 4 removed
        "id long, v long, tag string",
    )
    out = {r["id"]: r for r in
           rel.dataset_diff(old, new, ["id"], ["v", "tag"]).collect()}
    assert set(out) == {2, 3, 4, 5}
    assert out[2]["change_type"] == "changed"
    assert (out[2]["old_tag"], out[2]["new_tag"]) == (None, "b")
    assert out[3]["change_type"] == "changed"
    assert (out[3]["old_v"], out[3]["new_v"]) == (30, 31)
    assert out[4]["change_type"] == "removed" and out[4]["new_v"] is None
    assert out[5]["change_type"] == "added" and out[5]["old_v"] is None


def test_new_operator_dial_guards(spark, tmp_path):
    """Edge-case guards: exact_quantiles refuses empty/out-of-range qs;
    scd2 refuses empty column lists; a zero-doc postings index answers
    queries with an empty frame instead of dividing by zero."""
    import pytest

    from crypto_data_service_loader_spark.operators import relational as rel
    from crypto_data_service_loader_spark.operators.profile import (
        exact_quantiles,
    )
    from crypto_data_service_loader_spark.sources import text_index

    df = spark.createDataFrame([("g", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="at least one"):
        exact_quantiles(df, "g", "v", {})
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        exact_quantiles(df, "g", "v", {"p": 1.5})
    ev = spark.createDataFrame([(1, 1, "x")], "user_id long, id long, s string")
    with pytest.raises(ValueError, match="order_cols"):
        rel.scd2_history(ev, "user_id", [], ["s"])
    with pytest.raises(ValueError, match="attr_cols"):
        rel.scd2_history(ev, "user_id", ["id"], [])
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    path = str(tmp_path / "pidx0")
    assert text_index.write_postings_index(empty_docs, path) == 0
    out = text_index.postings_index_bm25(spark, path, [(1, "anything")])
    assert out.count() == 0
