"""Differential oracle FUZZ: hypothesis-generated corpora (including the
Unicode-whitespace class that produced a real probe-tokenization bug, and
duplicate-heavy small-text spaces) staged as parquet and run through real
key/oracle pairs — proving cross-engine exactness over input
DISTRIBUTIONS, not just the fixed testdata. Deliberately few examples:
each example is a full Spark-vs-DuckDB round trip."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from crypto_data_service_loader_spark.suite import ORACLES, QUERIES
from tests.test_suite_oracle import _normalize

FUZZ_KEYS = [
    "dedup_exact",
    "ngram_lm_score",
    "split_by_content",
    "mixture_rebalance",
    "corpus_report",
    "token_count",
]

#: words with tricky tokenizer surface: unicode whitespace (NBSP, LINE
#: SEPARATOR, NEL — the class a real round-6 bug mis-split), case,
#: punctuation, digits, empties, repeats
WORD = st.sampled_from(
    ["the", "THE", "model", "data", "x1", "2x", "a,b", "\u00e9",
     "na\u00efve", "zz", "", "\u00a0", "\u2028", "\u0085",
     "tab\there"]
)
TEXT = st.lists(WORD, min_size=0, max_size=12).map(" ".join)

CORPUS = st.lists(
    st.tuples(TEXT, st.sampled_from(["src0", "src1", "src2", "weird"])),
    min_size=1,
    max_size=14,
)

FUZZ = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture, HealthCheck.too_slow,
    ],
)


@FUZZ
@given(rows=CORPUS)
def test_fuzzed_corpus_stays_oracle_exact(spark, tmp_path_factory, rows):
    docs = pd.DataFrame({
        "doc_id": range(len(rows)),
        "text": [t for t, _ in rows],
        "lang": ["en"] * len(rows),
        "source": [s for _, s in rows],
        "n_chars": [len(t) for t, _ in rows],
    })
    d = tmp_path_factory.mktemp("fuzz")
    pq = str(d / "documents.parquet")
    spark.createDataFrame(docs).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "_stage"))
    # single-file layout like the testdata (tables.load reads the path)
    part = next(
        f for f in os.listdir(str(d / "_stage")) if f.startswith("part-")
    )
    os.replace(str(d / "_stage" / part), pq)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    for key in FUZZ_KEYS:
        sdf = QUERIES[key](spark, str(d)).toPandas()
        odf = con.execute(ORACLES[key]).fetch_arrow_table().to_pandas()
        s, o = _normalize(sdf), _normalize(odf)
        assert list(s.columns) == list(o.columns), key
        pd.testing.assert_frame_equal(s, o, obj=key)
