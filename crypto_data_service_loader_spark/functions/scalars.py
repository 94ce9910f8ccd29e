"""Scalar helpers mirroring the reference's inline scalar ops
(SURVEY.md §2A "supporting scalar operations"): date parse/format/add,
TSV/CSV string assembly, filename<->date parsing, JSON log events, and a
Pandas-UDF example proving the vectorized-UDF surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DoubleType


def to_tsv_line(*cols: Column) -> Column:
    """TickerFile TSV serialization `filename\\tcreate_date\\tstatus`
    (reference TickerFile.java:61-71)."""
    return F.concat_ws("\t", *cols)


def filename_date(path: Column) -> Column:
    """Parse the date-dir component out of a path (…/<YYYY-MM-DD>/<file>)."""
    return F.to_date(F.element_at(F.split(path, "/"), -2))


def ticker_from_filename(filename: Column) -> Column:
    """`<TICKER>_PST_<DATE>` -> TICKER (reference README.md:6-9 naming)."""
    return F.element_at(F.split(filename, "_PST_"), 1)


def log_event_json(
    severity: Column, thread: Column, message: Column, mdc: Column
) -> Column:
    """O29 — JSON log-event assembly (LogMsgLayout.json:1-30 shape)."""
    return F.to_json(
        F.struct(
            severity.alias("severity"),
            thread.alias("thread"),
            message.alias("message"),
            mdc.alias("mdc_fields"),
        )
    )


@F.pandas_udf(DoubleType())
def mid_price(best_bid: pd.Series, best_ask: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) mid-price — the §2B EXT pandas-UDF surface
    proof. Built-in `(bid+ask)/2` is preferred in production plans; this
    exists to exercise/benchmark the Pandas-UDF path."""
    return (best_bid + best_ask) / 2.0


try:  # Python UDTFs need PySpark >= 3.5; gate the import like the charter asks
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="component string, amount double")
    class ChargeLegsUDTF:
        """Python UDTF surface proof (§2B EXT, completing the
        UDF/UDAF/UDTF row): expand each lineitem into its charge
        components — (base, e), (discount, e*d), (tax, e*(1-d)*t).

        Row-at-a-time Python is the SLOW path — the declarative twin is a
        3-way stack()/UNION ALL and is what production plans should use;
        this class exists to exercise and verify the lateral-UDTF
        machinery end-to-end (registered, driver-gated, oracle-exact:
        the arithmetic mirrors the SQL twin's operation order on IEEE
        doubles, and rounding happens OUTSIDE the UDTF in engine SQL so
        Python's banker's rounding never touches the values)."""

        def eval(self, extendedprice: float, discount: float, tax: float):
            if extendedprice is None:
                return
            # null discount/tax propagate as null amounts — SQL semantics,
            # mirroring the UNION ALL twin (Python would otherwise raise)
            yield ("base", extendedprice)
            yield (
                "discount",
                None if discount is None else extendedprice * discount,
            )
            yield (
                "tax",
                None if discount is None or tax is None
                else (extendedprice * (1.0 - discount)) * tax,
            )

except ImportError:  # pragma: no cover - PySpark < 3.5
    ChargeLegsUDTF = None
