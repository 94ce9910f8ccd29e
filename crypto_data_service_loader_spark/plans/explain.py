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
