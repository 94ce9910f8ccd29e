"""Time-series fill operators (interpolate_fill — the asof module's
numeric gap-fill)."""

from __future__ import annotations


def test_interpolate_fill_semantics(spark):
    """Linear interpolation between neighbors; back-fill before the first
    observation, carry-forward after the last; observed values pass
    through untouched."""
    from crypto_data_service_loader_spark.operators import asof

    rows = [("k", 0, None), ("k", 1, 10.0), ("k", 2, None), ("k", 3, None),
            ("k", 4, 40.0), ("k", 5, None)]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    out = {r["t"]: r["v_interp"] for r in
           asof.interpolate_fill(df, "key", "t", "v").collect()}
    assert out[0] == 10.0          # back-fill before first obs
    assert out[1] == 10.0          # observed passes through
    assert out[2] == 20.0          # 10 + (40-10) * (2-1)/(4-1)
    assert out[3] == 30.0
    assert out[4] == 40.0
    assert out[5] == 40.0          # carry forward after last obs
    # all-null key: stays null (nothing to anchor on)
    empty = spark.createDataFrame(
        [("e", 0, None), ("e", 1, None)], "key string, t int, v double"
    )
    vals = [r["v_interp"] for r in
            asof.interpolate_fill(empty, "key", "t", "v").collect()]
    assert vals == [None, None]


def test_interpolate_fill_duplicate_timestamp(spark):
    """A null-value row co-timestamped with an observation has pt == nt
    (zero divisor); it must take the observed value, not NULL."""
    from crypto_data_service_loader_spark.operators import asof

    rows = [("k", 1, 10.0), ("k", 1, None), ("k", 2, 20.0)]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    out = asof.interpolate_fill(df, "key", "t", "v").collect()
    by = {(r["t"], r["v"]): r["v_interp"] for r in out}
    assert by[(1, None)] == 10.0   # co-timestamped observed value
    assert by[(1, 10.0)] == 10.0
    assert by[(2, 20.0)] == 20.0
