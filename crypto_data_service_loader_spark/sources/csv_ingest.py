"""Validated CSV tick ingestion (reference O17/O18, SURVEY.md §2A).

The reference reads tick CSVs line-by-line, keeps lines with exactly 9
comma-separated fields, logs-and-drops the rest
(CompressionHandler.java:43-46, drop at :81-83). Spark-first version:

- schema'd CSV read in PERMISSIVE mode with a corrupt-record column — the
  scan stays vectorized, bad rows are data, not exceptions;
- the column-count predicate for raw text inputs, as a plain Column;
- `input_file_name()` lineage so per-file success rollup (O19) works.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..schemas import TICKS, TICKS_RAW

EXPECTED_COLUMNS = 9  # reference TickersDataConfig.java:70 `validExpectedColumns`


def line_is_valid(line: Column, expected: int = EXPECTED_COLUMNS) -> Column:
    """O17 predicate on a raw text line: exactly `expected` comma fields.

    `split` with -1 limit keeps trailing empty fields, matching Java's
    `String.split(",")`... which *drops* trailing empties — the reference
    therefore treats 'a,b,' (trailing comma) as 2 fields. We count all
    fields (limit=-1): stricter, and consistent with the DuckDB oracle.
    """
    return F.size(F.split(line, ",", -1)) == expected


def read_ticks_csv(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """Schema'd, validated tick read with per-file lineage.

    PERMISSIVE + _corrupt_record: a malformed line yields nulls + the raw
    line in _corrupt_record; we drop it exactly like the reference drops
    invalid lines. Typed columns are cast after the raw read so a bad
    number in one field doesn't discard the row silently.
    """
    raw = (
        spark.read.schema(TICKS_RAW)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(paths)
    )
    valid = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    cols = []
    for f in TICKS.fields:
        if f.name == "transactionTime":
            # KuCoin epoch millis (FIXTURES.md F1), not an ISO string
            cols.append(
                F.timestamp_millis(F.col(f.name).try_cast("long")).alias(f.name)
            )
        else:
            # try_cast: a malformed numeric nulls the field, never fails the
            # batch (the reference is schema-blind; strictly better here)
            cols.append(F.col(f.name).try_cast(f.dataType.simpleString()).alias(f.name))
    typed = valid.select(*cols)
    return typed.withColumn("_source_file", F.input_file_name())


def validate_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Split a raw-lines DataFrame into the valid subset (reference behavior:
    invalid lines are dropped, never fail the batch)."""
    return lines.filter(line_is_valid(F.col(line_col)))
