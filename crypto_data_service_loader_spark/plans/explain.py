"""Physical-plan assertions.

The charter's scale bar is plan-shaped, not just value-shaped: filters must
reach the parquet scan, small dims must broadcast, codegen must span the hot
expressions. These helpers let tests assert exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if `fragment` appears in the scan's PushedFilters list."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def reads_only_columns(df: DataFrame, columns: set[str]) -> bool:
    """True if every parquet scan's ReadSchema is a subset of `columns`."""
    import re

    plan = formatted_plan(df)
    ok = True
    for line in plan.splitlines():
        if "ReadSchema" in line:
            read = set(re.findall(r"(\w+):", line.split("ReadSchema")[1]))
            ok &= read <= columns
    return ok


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_sortmerge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def whole_stage_codegen_spans(df: DataFrame, execute: bool = True) -> int:
    """Number of distinct WholeStageCodegen spans (the `*(n)` markers).

    Under AQE no codegen markers exist before execution (the adaptive
    plan is not final — the old formatted-string count was always 0), so
    by default this EXECUTES the frame once (collect) and reads the final
    plan; pass execute=False only for a frame already run through its own
    queryExecution."""
    import re

    if execute:
        df.collect()
    p = physical_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", p)))


def file_scan_metrics(df: DataFrame) -> list[dict[str, int]]:
    """Execute `df` once and return, for every file-source scan in the
    final physical plan, its actual scan metrics (numFiles, filesSize,
    numOutputRows where present). The executable form of "this read
    pruned its input": a selective, index-driven read must show fewer
    files / bytes scheduled than the full scan of the same dataset —
    asserted by tests, not narrated (round 16, VERDICT r15 #3)."""
    df.collect()  # populate SQL metrics on this frame's own queryExecution
    root = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    results: list[dict[str, int]] = []

    def walk(node):
        node = _resolve(node)
        if "FileSourceScan" in node.getClass().getSimpleName():
            m = node.metrics()
            row = {}
            for key in ("numFiles", "filesSize", "numOutputRows"):
                if m.contains(key):
                    row[key] = int(m.apply(key).value())
            results.append(row)
        for c in _children(node):
            walk(c)

    walk(root)
    return results


def _resolve(node):
    # AQE roots/stages wrap the real plan; descend to it
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        return _resolve(node.executedPlan())
    return node


def _children(node):
    name = node.getClass().getSimpleName()
    if name.endswith("QueryStageExec"):
        return [node.plan()]
    out = []
    ch = node.children()
    for i in range(ch.length()):
        out.append(ch.apply(i))
    if name == "ReusedExchangeExec":
        out.append(node.child())
    return out


def nested_loop_build_rows(df: DataFrame) -> list[int]:
    """Execute `df` once and return, for EVERY nested-loop-shaped join in
    the final physical plan, the actual row count of its build side
    (BroadcastNestedLoopJoin: the declared build side's broadcast;
    CartesianProduct: the smaller input). This turns "that broadcast is
    provably tiny" from a code comment into an executable assertion —
    the plan-audit allowlist ratchet: if a future edit fattens an
    allowlisted build side past its documented bound, the audit fails
    instead of the comment silently going stale."""
    df.collect()  # populate SQL metrics on this frame's own queryExecution
    root = df._jdf.queryExecution().executedPlan()  # noqa: SLF001

    def subtree_rows(node):
        # first numOutputRows metric down this subtree (the broadcast
        # exchange / the stage's own output counter)
        queue = [node]
        while queue:
            n = _resolve(queue.pop(0))
            m = n.metrics()
            if m.contains("numOutputRows"):
                return int(m.apply("numOutputRows").value())
            queue.extend(_children(n))
        return None

    results: list[int] = []

    def walk(node):
        node = _resolve(node)
        name = node.getClass().getSimpleName()
        kids = _children(node)
        if name == "BroadcastNestedLoopJoinExec":
            build = kids[0] if node.buildSide().toString() == "BuildLeft" else kids[1]
            results.append(subtree_rows(build))
        elif name == "CartesianProductExec":
            rows = [r for r in (subtree_rows(k) for k in kids) if r is not None]
            results.append(min(rows) if rows else None)
        for k in kids:
            walk(k)

    walk(root)
    return results


def scan_output_rows(df: DataFrame) -> list[tuple[str, int]]:
    """Execute `df` once and return (source_label, numOutputRows) for
    every file-source scan in the final physical plan — the label is the
    parquet file/dir stem pulled from the scan's location string. The
    pinned-dial ratchet reads this: a gate key that pins an LSH/centroid
    dial for oracle determinism is safe only while its input fixture
    stays bounded, and this makes that bound executable (a pinned dial
    silently attached to an unbounded scan fails the audit instead of
    going quadratic at scale — the measured 30x regime in SCALE_NOTES)."""
    import re

    df.collect()
    root = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    results: list[tuple[str, int]] = []

    def walk(node):
        node = _resolve(node)
        name = node.getClass().getSimpleName()
        if name in ("FileSourceScanExec", "BatchScanExec"):
            text = node.toString()
            m = re.search(r"([A-Za-z0-9_.-]+)\.parquet", text)
            label = m.group(1) if m else "unknown"
            met = node.metrics()
            rows = (
                int(met.apply("numOutputRows").value())
                if met.contains("numOutputRows") else -1
            )
            results.append((label, rows))
        for k in _children(node):
            walk(k)

    walk(root)
    return results
