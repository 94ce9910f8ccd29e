"""JVM-side construction of small literal DataFrames (round 16, guide §4).

`spark.createDataFrame(<python list>, schema)` plans as an `ExistingRDD`
over `applySchemaToPythonRDD`: a PYTHON-backed scan with
defaultParallelism (32 here) partitions, each of whose tasks runs a
Python-worker handshake (~100-300 ms measured on this box) to
deserialize a handful of rows — and the scan re-executes for EVERY
reference, including each broadcast-exchange build. A thread-dump sweep
of the bm25 bench path showed 33 of 44 busy executor samples blocked in
`BasePythonRunner.read` on exactly these scans; they were the dominant
wall cost of bm25_topk/hybrid_search (task run 77.8 s vs CPU 2.9 s,
zero GC, zero spill, zero fetch wait at sf0.1).

`local_values_df` builds the SAME rows as a SQL `VALUES` inline table
instead, which the analyzer resolves to a `LocalRelation`:

- zero Python at execution time (guide §4.1 — the boundary is gone, not
  amortized);
- `LocalTableScanExec.executeCollect` feeds broadcast builds WITHOUT
  launching a job, so every `F.broadcast(tiny_table)` join drops its
  per-trial job+stage cycle;
- the optimizer can fold projections/filters over it at plan time.

Value fidelity is exact: ints render as integral literals, floats
through `repr` → `CAST(... AS DOUBLE)` (shortest-round-trip parse,
covers NaN/±Infinity/-0.0), strings escape backslash+quote, arrays
recurse element-wise, None is a typed NULL. The unit battery in
tests/test_localrel.py pins schema- and value-equality against
`createDataFrame` for every shape the package uses.

Production note: these relations are the bounded dimension/config/probe
tables of the engine (query workloads, centroid codebooks, block task
maps). At 100 TB they stay bounded by construction (limit(k) /
n_blocks² / fixed workloads), so a LocalRelation broadcast is the right
cluster shape too — not a local-mode trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["local_values_df"]

_INT_TYPES = {"int", "integer", "bigint", "long", "smallint", "tinyint"}


def _split_top(schema: str) -> list[str]:
    """Split a DDL column list on top-level commas (array<...> aware)."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in schema:
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


def _sql_lit(v, t: str) -> str:
    """Render one Python value as a Spark SQL literal of DDL type `t`."""
    if v is None:
        return f"CAST(NULL AS {t})"
    lt = t.strip().lower()
    if lt.startswith("array<"):
        inner = t.strip()[6:-1]
        items = ", ".join(_sql_lit(x, inner) for x in v)
        # empty arrays still need the element type
        return f"ARRAY({items})" if items else f"CAST(ARRAY() AS {t})"
    if lt in ("double", "float"):
        # repr is the shortest round-trip form; parse is exact (and
        # handles nan / inf / -0.0 spellings)
        return f"CAST('{float(v)!r}' AS {t})"
    if lt in _INT_TYPES:
        return f"CAST({int(v)} AS {t})"
    if lt == "boolean":
        return "true" if v else "false"
    if lt == "string":
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    raise TypeError(f"local_values_df: unsupported DDL type {t!r}")


def local_values_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Drop-in for `spark.createDataFrame(rows, schema)` on SMALL literal
    row lists: same column names, types and values, but planned as a
    `LocalRelation` (JVM inline table) instead of a Python-RDD scan.

    `schema` is the same DDL string createDataFrame takes
    (`"query_id int, query_text string"`); `rows` an iterable of
    tuples/lists in field order. Intended for bounded control tables
    (query workloads, codebooks, task maps) — NOT for bulk data.
    """
    if not isinstance(schema, str):  # StructType → DDL (empty frames etc.)
        fields = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    else:
        fields = []
        for part in _split_top(schema):
            name, t = part.strip().split(None, 1)
            fields.append((name, t.strip()))
    names = ", ".join(f"c{i}" for i in range(len(fields)))
    sel = ", ".join(f"c{i} AS {name}" for i, (name, _) in enumerate(fields))
    rows = list(rows)
    if not rows:
        nulls = ", ".join(f"CAST(NULL AS {t})" for _, t in fields)
        return spark.sql(
            f"SELECT {sel} FROM (VALUES ({nulls})) t({names}) LIMIT 0"
        )
    vals = ", ".join(
        "("
        + ", ".join(_sql_lit(v, fields[i][1]) for i, v in enumerate(row))
        + ")"
        for row in rows
    )
    return spark.sql(f"SELECT {sel} FROM (VALUES {vals}) t({names})")
