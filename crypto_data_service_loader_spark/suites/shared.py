"""Shared base for the suite family modules: the common import
surface (operators, tables, Spark/pandas) plus the SQL fragments and
fixtures referenced by more than one family. ``__all__`` deliberately
includes the underscore names so family modules can ``from .shared
import *`` and see the fragments — they are private to the suite
package, not to this module.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import (
    asof,
    contract,
    dedup,
    linkage,
    profile,
    registry as R,
    relational as rel,
    similarity,
    sketch,
    text,
    training,
)
from ..functions.localrel import local_values_df
from ..operators.relational import davg, dsum
from ..sources.csv_ingest import line_is_valid
from ..tables import (
    DISCOVERED_SQL,
    FS_FILES_SQL,
    REGISTRY_SQL,
    TODAY,
    discovered_candidates,
    fs_files,
    load,
    register_views,
    registry,
)

__all__ = ['local_values_df', 'pd', 'DataFrame', 'SparkSession', 'Window', 'F', 'asof', 'contract', 'dedup', 'linkage', 'profile', 'R', 'rel', 'similarity', 'sketch', 'text', 'training', 'davg', 'dsum', 'line_is_valid', 'DISCOVERED_SQL', 'FS_FILES_SQL', 'REGISTRY_SQL', 'TODAY', 'discovered_candidates', 'fs_files', 'load', 'register_views', 'registry', '_REG', '_REG_FS', '_EVENTS_SQL', '_events_fixture', '_DSUM', '_TOKS', '_TOKS_CLEAN', '_SHINGLES', '_SHINGLES13', '_KNN_SQL', '_pagerank_sql', '_query_vector']



# --------------------------------------------------------------------------
# shared SQL fragments
# --------------------------------------------------------------------------

_REG = f"WITH registry AS ({REGISTRY_SQL})"
_REG_FS = f"WITH registry AS ({REGISTRY_SQL}), fs AS ({FS_FILES_SQL})"

#: registry event log fixture: initial statuses (seq 0) + one update wave
#: (seq 1) flipping IN_PROGRESS -> FINISHED.
_EVENTS_SQL = f"""
WITH registry AS ({REGISTRY_SQL}),
events AS (
    SELECT filename, create_date, status, 0 AS seq FROM registry
    UNION ALL
    SELECT filename, create_date, 'FINISHED' AS status, 1 AS seq
    FROM registry WHERE status = 'IN_PROGRESS'
)
"""


def _events_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = registry(spark, sf_dir)
    base = reg.withColumn("seq", F.lit(0).cast("int"))
    update = (
        reg.filter(F.col("status") == "IN_PROGRESS")
        .withColumn("status", F.lit("FINISHED"))
        .withColumn("seq", F.lit(1).cast("int"))
    )
    return base.unionByName(update)


_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"

_TOKS = "regexp_split_to_array(lower(trim(text, ' ')), '\\s+')"

#: same tokenizer over the boilerplate-cleaned text column (the curation
#: pipeline's downstream stages all run on text_clean)
_TOKS_CLEAN = _TOKS.replace("trim(text, ' ')", "trim(text_clean, ' ')")

_SHINGLES = (
    "CASE WHEN len({t}) < 3 THEN [] "
    "ELSE list_transform(range(1, len({t}) - 1), "
    "i -> array_to_string(list_slice({t}, i, i + 2), ' ')) END"
).format(t=_TOKS)


#: 13-word windows for the substring-dedup approximation (same shape as
#: _SHINGLES at k=13: len-12 windows, empty below 13 tokens)
_SHINGLES13 = (
    "CASE WHEN len({t}) < 13 THEN [] "
    "ELSE list_transform(range(1, len({t}) - 11), "
    "i -> array_to_string(list_slice({t}, i, i + 12), ' ')) END"
).format(t=_TOKS)


#: LSH kNN graph oracle — shared by knn_graph_lsh and pagerank_knn
_KNN_SQL = """
        WITH planes AS (
            SELECT p.p, i.i,
                   CASE WHEN substr(md5(CAST(p.p AS VARCHAR) || ':' ||
                                        CAST(i.i AS VARCHAR)), 8, 1)
                             IN ('0','2','4','6','8','a','c','e')
                        THEN 1.0 ELSE -1.0 END AS w
            FROM (SELECT unnest(range(4)) AS p) p,
                 (SELECT unnest(range((SELECT max(len(embedding))
                                       FROM embeddings))) AS i) i),
        normed AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   sqrt(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
            FROM embeddings),
        dots AS (
            SELECT nv.vec_id, pl.p,
                   sum(nv.v[pl.i + 1] * pl.w) AS d
            FROM normed nv JOIN planes pl ON TRUE
            GROUP BY nv.vec_id, pl.p),
        buckets AS (
            SELECT vec_id,
                   CAST(sum(CASE WHEN d >= 0
                            THEN CAST(power(2, p) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id),
        bv AS (
            SELECT nv.vec_id, nv.v, nv.n, bk.bucket
            FROM normed nv JOIN buckets bk USING (vec_id)),
        pairs AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                   round(CASE WHEN a.n * b.n > 0
                         THEN list_sum(list_transform(range(1, len(a.v) + 1),
                              i -> a.v[i] * b.v[i])) / (a.n * b.n)
                         ELSE 0.0 END, 6) AS score
            FROM bv a JOIN bv b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
        SELECT vec_id, neighbor_id, score, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY score DESC, neighbor_id) AS rn FROM pairs)
        WHERE rn <= 3"""


def _pagerank_sql(iters: int = 3) -> str:
    """Chained-CTE mirror of graph.pagerank over the LSH kNN edge set:
    same teleport/damping literals, same DECIMAL(38,18) contribution
    accumulation, one CTE per power iteration."""
    step = """it{i} AS (
        SELECT ids.id,
               CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * coalesce(s.s, CAST(0.0 AS DOUBLE))
                   AS pr
        FROM ids LEFT JOIN (
            SELECT e.dst AS id,
                   CAST(SUM(CAST(p.pr / d.deg AS DECIMAL(38,18))) AS DOUBLE)
                       AS s
            FROM edges e JOIN {prev} p ON e.src = p.id
                         JOIN deg d ON e.src = d.src
            GROUP BY e.dst) s ON ids.id = s.id)"""
    its, prev = [], "pr0"
    for i in range(1, iters + 1):
        its.append(step.format(i=i, prev=prev))
        prev = f"it{i}"
    return f"""
        WITH knn AS ({_KNN_SQL}),
        edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM knn),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        ids AS (SELECT vec_id AS id FROM embeddings),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
        pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr
                FROM ids),
        {', '.join(its)}
        SELECT id AS vec_id, round(pr, 9) AS pagerank FROM {prev}"""


def _query_vector(spark, sf_dir, vec_id: int = 0) -> list[float]:
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]
