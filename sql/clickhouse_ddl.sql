-- ClickHouse DDL for running this engine against a real ClickHouse server
-- (the reference's target store; README.md:33-36 and Tables.java name the
-- tables). Not exercised in the hermetic test environment (no server/JDBC
-- driver jar); the ParquetSink/IdempotentParquetSink carry local runs.

-- control-plane registry (reference `ticker_files`). The engine treats the
-- registry as an append-only event log with latest-wins compaction, which
-- maps exactly onto ReplacingMergeTree keyed by the event sequence.
CREATE TABLE IF NOT EXISTS ticker_files
(
    filename     String,
    create_date  Date,
    status       Enum8('DISCOVERED' = 0, 'DOWNLOADING' = 1,
                       'READY_FOR_PROCESSING' = 2, 'IN_PROGRESS' = 3,
                       'FINISHED' = 4, 'ERROR' = 5),
    seq          UInt64,
    batch_id     UInt64
)
ENGINE = ReplacingMergeTree(seq)
PARTITION BY toYYYYMM(create_date)
ORDER BY (filename);

-- tick-data fact table (reference `tickers_data`; field list README.md:12-21)
CREATE TABLE IF NOT EXISTS tickers_data
(
    ticker           LowCardinality(String),
    sequence         UInt64,
    price            Decimal(38, 18),
    size             Decimal(38, 18),
    bestAsk          Decimal(38, 18),
    bestAskSize      Decimal(38, 18),
    bestBid          Decimal(38, 18),
    bestBidSize      Decimal(38, 18),
    transactionTime  DateTime64(3),
    batch_id         UInt64
)
-- version = batch_id: a replayed epoch re-inserts the same (ticker, time,
-- sequence) keys with a higher batch_id; merges keep the newest copy.
-- Note ReplacingMergeTree dedup is eventual (per-partition, at merge time);
-- exact reads use FINAL.
ENGINE = ReplacingMergeTree(batch_id)
PARTITION BY toDate(transactionTime)
ORDER BY (ticker, transactionTime, sequence);

-- log events (reference `tickers_logs`; LogMsgLayout.json:1-30)
CREATE TABLE IF NOT EXISTS tickers_logs
(
    ts                 DateTime64(3),
    severity           LowCardinality(String),
    thread             String,
    message            String,
    mdc_fields         Map(String, String),
    exception_class    Nullable(String),
    exception_message  Nullable(String)
)
ENGINE = MergeTree
PARTITION BY toDate(ts)
ORDER BY (ts);

-- connection tuning the reference ships (application.origin.yaml:8):
--   jdbc:clickhouse://host:8443/db?async_insert=1&wait_for_async_insert=1&compress=1
