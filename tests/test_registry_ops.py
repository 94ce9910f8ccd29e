"""Unit tests for the control-plane operators (mirrors the reference's
step-level tests, SURVEY.md §5.1: dedup keeps only DB-absent files; status
rules for today/past; retention guards; rollup semantics)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import registry as R
from crypto_data_service_loader_spark.schemas import REGISTRY, STATUSES

D = datetime.date


@pytest.fixture()
def reg(spark):
    rows = [
        ("a", D(2024, 3, 13), "DISCOVERED"),    # past -> READY
        ("b", D(2024, 3, 14), "DISCOVERED"),    # today -> DOWNLOADING
        ("c", D(2024, 3, 13), "DOWNLOADING"),   # past -> READY
        ("d", D(2024, 3, 14), "DOWNLOADING"),   # today, not DISCOVERED -> keep
        ("e", D(2024, 3, 12), "ERROR"),         # ERROR never transitions
        ("f", D(2024, 3, 10), "FINISHED"),
        ("g", D(2024, 3, 12), "FINISHED"),
    ]
    return spark.createDataFrame(rows, REGISTRY)


TODAY = "2024-03-14"


def test_status_transitions(reg):
    out = {r["filename"]: r["status"] for r in R.transition_statuses(reg, TODAY).collect()}
    assert out == {
        "a": "READY_FOR_PROCESSING",
        "b": "DOWNLOADING",
        "c": "READY_FOR_PROCESSING",
        "d": "DOWNLOADING",  # unchanged (was already DOWNLOADING today)
        "e": "ERROR",
        "f": "FINISHED",
        "g": "FINISHED",
    }


def test_dedup_anti_join(spark, reg):
    cands = spark.createDataFrame(
        [("a", D(2024, 3, 14), "DISCOVERED"), ("z", D(2024, 3, 14), "DISCOVERED")],
        REGISTRY,
    )
    kept = [r["filename"] for r in R.dedup_new_files(cands, reg).collect()]
    assert kept == ["z"]  # 'a' already registered -> dropped


def test_filter_status_in(reg):
    names = {r["filename"] for r in R.filter_status_in(reg, ["FINISHED", "ERROR"]).collect()}
    assert names == {"e", "f", "g"}


def test_point_lookup_missing_and_present(reg):
    assert R.point_lookup(reg, "a").collect()[0]["status"] == "DISCOVERED"
    assert R.point_lookup(reg, "nope").count() == 0


def test_min_max_finished(reg):
    row = R.min_max_finished_dates(reg).collect()[0]
    assert row["min_date"] == D(2024, 3, 10)
    assert row["max_date"] == D(2024, 3, 12)


@pytest.mark.parametrize(
    "dates,today,skip",
    [
        ([D(2024, 3, 10), D(2024, 3, 12)], "2024-03-14", False),
        ([D(2024, 3, 10), D(2024, 3, 10)], "2024-03-14", True),   # min==max
        ([D(2024, 3, 14), D(2024, 3, 15)], "2024-03-14", True),   # min==today
        ([D(2024, 3, 13), D(2024, 3, 15)], "2024-03-14", True),   # min+1==today
    ],
)
def test_retention_guard(spark, dates, today, skip):
    reg = spark.createDataFrame(
        [(f"f{i}", d, "FINISHED") for i, d in enumerate(dates)], REGISTRY
    )
    assert R.retention_guard(reg, today).collect()[0]["skip_cleanup"] is skip


def test_upload_status_rollup(spark):
    parts = spark.createDataFrame(
        [("a", True), ("a", True), ("b", True), ("b", False), ("c", False)],
        "filename string, ok boolean",
    )
    out = {r["filename"]: r["status"] for r in R.upload_status_rollup(parts).collect()}
    assert out == {"a": "FINISHED", "b": "ERROR", "c": "ERROR"}


def test_event_log_current_state_and_forward_only(spark):
    """Property from SURVEY.md §5: statuses only move forward; latest wins."""
    from crypto_data_service_loader_spark.schemas import REGISTRY_EVENTS

    events = spark.createDataFrame(
        [
            ("a", D(2024, 3, 13), "DISCOVERED", 0, 0),
            ("a", D(2024, 3, 13), "READY_FOR_PROCESSING", 1, 1),
            ("a", D(2024, 3, 13), "IN_PROGRESS", 2, 2),
            ("a", D(2024, 3, 13), "FINISHED", 3, 3),
            ("b", D(2024, 3, 13), "DISCOVERED", 0, 0),
        ],
        REGISTRY_EVENTS,
    )
    cur = {r["filename"]: r["status"] for r in R.current_state(events).collect()}
    assert cur == {"a": "FINISHED", "b": "DISCOVERED"}
    # forward-only property over the event history
    order = {s: i for i, s in enumerate(STATUSES)}
    hist = [r["status"] for r in events.filter(F.col("filename") == "a").orderBy("seq").collect()]
    assert all(order[a] <= order[b] for a, b in zip(hist, hist[1:]))


def test_apply_status_update_claims_only_expected(spark):
    from crypto_data_service_loader_spark.schemas import REGISTRY_EVENTS

    events = spark.createDataFrame(
        [
            ("a", D(2024, 3, 13), "READY_FOR_PROCESSING", 0, 0),
            ("b", D(2024, 3, 13), "ERROR", 0, 0),
        ],
        REGISTRY_EVENTS,
    )
    wanted = spark.createDataFrame([("a",), ("b",)], "filename string")
    out = R.apply_status_update(
        events, wanted, "IN_PROGRESS", expected_status="READY_FOR_PROCESSING",
        seq=1, batch_id=1,
    )
    cur = {r["filename"]: r["status"] for r in R.current_state(out).collect()}
    assert cur == {"a": "IN_PROGRESS", "b": "ERROR"}  # ERROR not claimable
