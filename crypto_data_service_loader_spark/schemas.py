"""Explicit StructTypes for every table the engine touches.

The reference's schema system is fixed-and-implicit (SURVEY.md §1.2: the
client streams CSV bytes and only checks column count,
CompressionHandler.java:43-46). Here every schema is explicit — schema
inference is banned on the 100 TB path because it forces a full pre-scan.

Citations point into /root/reference/ for parity checking.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Tick payload — 9 CSV fields (reference README.md:12-21; FIXTURES.md F1).
#: Prices as DECIMAL(38,18): exchange decimals drift under DOUBLE aggregation
#: (SURVEY.md §7). Bench paths may cast to DOUBLE explicitly.
TICKS = T.StructType(
    [
        T.StructField("ticker", T.StringType(), False),
        T.StructField("sequence", T.LongType(), True),
        T.StructField("price", T.DecimalType(38, 18), True),
        T.StructField("size", T.DecimalType(38, 18), True),
        T.StructField("bestAsk", T.DecimalType(38, 18), True),
        T.StructField("bestAskSize", T.DecimalType(38, 18), True),
        T.StructField("bestBid", T.DecimalType(38, 18), True),
        T.StructField("bestBidSize", T.DecimalType(38, 18), True),
        T.StructField("transactionTime", T.TimestampType(), True),
    ]
)

#: Tick payload as raw strings + corrupt-record column, for PERMISSIVE CSV
#: reads that replicate the reference's drop-invalid-lines behavior
#: (CompressionHandler.java:81-83 — log & drop, never fail).
TICKS_RAW = T.StructType(
    [T.StructField(f.name, T.StringType(), True) for f in TICKS.fields]
    + [T.StructField("_corrupt_record", T.StringType(), True)]
)

#: File registry — the control-plane state machine table `ticker_files`
#: (reference README.md:33-36; TickerFile.java:8-43).
REGISTRY = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("create_date", T.DateType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

#: Registry as an append-only event log (SURVEY.md §7 "mutable registry"
#: decision): current state = latest event per filename. `seq` breaks ties
#: within one batch; `batch_id` gives epoch idempotence.
REGISTRY_EVENTS = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("create_date", T.DateType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
        T.StructField("batch_id", T.LongType(), True),
    ]
)

#: Six-state status machine (TickerFile.java:13-19). Order matters: it is the
#: forward-progress order used by property tests.
STATUSES = [
    "DISCOVERED",
    "DOWNLOADING",
    "READY_FOR_PROCESSING",
    "IN_PROGRESS",
    "FINISHED",
    "ERROR",
]

#: Log-event table `tickers_logs` (LogMsgLayout.json:1-30; README.md:63-68).
LOG_EVENT = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("severity", T.StringType(), True),
        T.StructField("thread", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("mdc_fields", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("exception_class", T.StringType(), True),
        T.StructField("exception_message", T.StringType(), True),
    ]
)

#: Multimodal blob column convention: payload is opaque binary + typed
#: metadata. Decoders are Pandas-UDF stubs (container lacks image/audio libs).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
