"""local_values_df must be value- and schema-identical to
spark.createDataFrame for every literal-table shape the package builds
(round 16, guide §4: the Python-RDD scan behind createDataFrame was the
dominant wall cost of the retrieval/similarity bench keys)."""

import math

import pytest

from crypto_data_service_loader_spark.functions.localrel import local_values_df

CASES = [
    # the BM25 query workload shape
    (
        [(1, "what is spark sql"), (2, "broadcast join tuning")],
        "query_id int, query_text string",
    ),
    # centroid / codebook shapes
    ([(0, [1.5, -0.25, 0.1]), (1, [0.0, 2.0, -3.5])], "cid int, cvec array<double>"),
    ([(0, 1, [0.5, 0.5])], "s int, cid int, cvec array<double>"),
    # block task map
    ([(0, 0, 0), (1, 0, 1), (2, 1, 1)], "tid int, ba int, bb int"),
    # mixed wide row (join_strategy_choice result shape)
    (
        [("small_dim", "broadcast", "right", 100000, 64, 6400000)],
        "scenario string, strategy string, build_side string, "
        "n_left long, n_right long, est_pairs long",
    ),
    # single-column string table
    ([("spark",), ("merge",), ("window",)], "term string"),
    # empties (the guard returns of the similarity family)
    ([], "doc_id bigint, pagerank double"),
    ([], "id_a bigint, id_b bigint, score double"),
]


def _norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return repr(x)
    if isinstance(x, list):
        return tuple(_norm_cell(v) for v in x)
    return x


@pytest.mark.parametrize("rows,schema", CASES, ids=[c[1][:40] for c in CASES])
def test_matches_createdataframe(spark, rows, schema):
    a = spark.createDataFrame(rows, schema)
    b = local_values_df(spark, rows, schema)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]
    ra = [tuple(_norm_cell(x) for x in r) for r in a.collect()]
    rb = [tuple(_norm_cell(x) for x in r) for r in b.collect()]
    assert ra == rb


def test_special_floats_and_strings(spark):
    rows = [
        (1, float("nan"), "o'quote"),
        (2, float("inf"), "back\\slash"),
        (3, float("-inf"), "new\nline\ttab"),
        (4, -0.0, ""),
        (5, 0.1 + 0.2, "unicode ✓ ß"),
        (None, None, None),
    ]
    schema = "k int, x double, s string"
    a = spark.createDataFrame(rows, schema)
    b = local_values_df(spark, rows, schema)
    ra = [tuple(_norm_cell(x) for x in r) for r in a.collect()]
    rb = [tuple(_norm_cell(x) for x in r) for r in b.collect()]
    assert ra == rb
    # -0.0 keeps its sign bit through the literal path
    assert math.copysign(1.0, b.collect()[3][1]) == -1.0


def test_is_local_relation(spark):
    """The point of the helper: a LocalRelation plan (zero Python at
    execution; broadcast builds need no job)."""
    df = local_values_df(spark, [(1, "a")], "k int, s string")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in executed and "ExistingRDD" not in executed
