"""Flagship query + the reference's control-plane operators (SURVEY.md §2A: registry scans, status transitions, rollups) and their DuckDB oracles."""

from __future__ import annotations

from .shared import *  # noqa: F401,F403



# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the reference's fact-table volume
    aggregate shape (filter + multi-agg groupBy), exercising O7/O12/O22."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_FLAGSHIP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)       AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)  AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_quantity)  AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(l_discount)  AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------------
# registry / control-plane operators (SURVEY.md §2A)
# --------------------------------------------------------------------------

def q_file_registry_scan(spark, sf_dir):
    return registry(spark, sf_dir)


def q_agg_max_date(spark, sf_dir):
    return R.max_create_date(registry(spark, sf_dir))


def q_dedup_anti_join(spark, sf_dir):
    return R.dedup_new_files(
        discovered_candidates(spark, sf_dir), registry(spark, sf_dir)
    )


def q_filter_status_in(spark, sf_dir):
    return R.filter_status_in(registry(spark, sf_dir), ["DISCOVERED", "DOWNLOADING"])


def q_status_transition_case(spark, sf_dir):
    return R.transition_statuses(registry(spark, sf_dir), TODAY)


def q_status_update_merge(spark, sf_dir):
    return R.current_state(_events_fixture(spark, sf_dir)).select(
        "filename", "create_date", "status"
    )


def _events3_fixture(spark, sf_dir):
    """Three-generation event log: base (seq 0), IN_PROGRESS->FINISHED
    (seq 1), then odd-suffixed DISCOVERED->DOWNLOADING (seq 2) — a log
    with updates BOTH before and after the mid-stream compaction point."""
    reg = registry(spark, sf_dir)
    two = _events_fixture(spark, sf_dir)
    tail = (
        reg.filter(
            (F.col("status") == "DISCOVERED")
            & F.substring("filename", -1, 1).isin("1", "3", "5", "7", "9")
        )
        .withColumn("status", F.lit("DOWNLOADING"))
        .withColumn("seq", F.lit(2).cast("int"))
    )
    return two.unionByName(tail)


def q_registry_compaction(spark, sf_dir):
    """Compaction equivalence on the driver record (VERDICT r11 #8): the
    registry's latest-wins state must be IDENTICAL whether computed from
    the full append-only event log or from a mid-stream compacted
    snapshot plus the events that arrived after it. The Spark side runs
    the COMPACTION path — compact after seq 1 (current_state keeps each
    file's winning event and its seq), union the seq-2 tail, compact
    again. The oracle computes the state DIRECTLY from the full
    three-generation log, so the driver's hash match IS the equivalence
    proof. At 100x the event log is the unbounded thing
    (streaming/service.py RegistryLog.compact bounds it on disk); this
    key pins the algebra that makes that rewrite safe."""
    events3 = _events3_fixture(spark, sf_dir)
    compacted = R.current_state(events3.filter(F.col("seq") <= 1))
    replay = compacted.unionByName(events3.filter(F.col("seq") == 2))
    return R.current_state(replay).select("filename", "create_date", "status")


def q_point_lookup(spark, sf_dir):
    return R.point_lookup(registry(spark, sf_dir), "file_42")


def q_filter_date_eq(spark, sf_dir):
    return R.filter_date_eq(registry(spark, sf_dir), "1997-06-15")


def q_groupby_collect_set(spark, sf_dir):
    return R.files_by_date(registry(spark, sf_dir)).select(
        "create_date", F.concat_ws(",", "filenames").alias("filenames")
    )


def q_registry_fs_inner_join(spark, sf_dir):
    return R.registry_fs_join(fs_files(spark, sf_dir), registry(spark, sf_dir))


def q_sort_by_filename(spark, sf_dir):
    return R.sort_by_filename(registry(spark, sf_dir))


def q_agg_min_max_filtered(spark, sf_dir):
    return R.min_max_finished_dates(registry(spark, sf_dir))


def q_retention_guard(spark, sf_dir):
    return R.retention_guard(registry(spark, sf_dir), TODAY)


def q_agg_count_star(spark, sf_dir):
    return R.count_rows(registry(spark, sf_dir))


def q_csv_validate_filter(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    line = F.concat_ws(
        ",",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.lit("f7"), F.lit("f8"), F.lit("f9"),
    )
    line = F.when(F.col("l_orderkey") % 10 == 0, F.concat(line, F.lit(",zz"))).otherwise(line)
    lines = li.select(line.alias("line"))
    valid = line_is_valid(F.col("line"))
    return lines.agg(
        F.sum(F.when(valid, 1).otherwise(0)).cast("bigint").alias("n_valid"),
        F.sum(F.when(valid, 0).otherwise(1)).cast("bigint").alias("n_invalid"),
    )


def q_cleanup_candidates(spark, sf_dir):
    return R.cleanup_candidates(
        fs_files(spark, sf_dir), registry(spark, sf_dir), "1999-01-01"
    )


def q_upload_status_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    parts = li.select(
        F.concat(F.lit("file_"), F.col("l_orderkey").cast("string")).alias("filename"),
        (~((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 11 == 0))).alias("ok"),
    )
    return R.upload_status_rollup(parts)


_REGISTRY_ORACLES = {
    "file_registry_scan": f"{_REG} SELECT filename, create_date, status FROM registry",
    "agg_max_date": f"{_REG} SELECT MAX(create_date) AS max_create_date FROM registry",
    "dedup_anti_join": f"""{_REG}, discovered AS ({DISCOVERED_SQL})
        SELECT d.filename, d.create_date FROM discovered d
        WHERE NOT EXISTS (SELECT 1 FROM registry r WHERE r.filename = d.filename)""",
    "filter_status_in": f"""{_REG} SELECT filename, create_date, status FROM registry
        WHERE status IN ('DISCOVERED','DOWNLOADING')""",
    "status_transition_case": f"""{_REG}
        SELECT filename, create_date,
               CASE WHEN create_date = DATE '{TODAY}' AND status = 'DISCOVERED'
                         THEN 'DOWNLOADING'
                    WHEN create_date < DATE '{TODAY}'
                         AND status IN ('DISCOVERED','DOWNLOADING')
                         THEN 'READY_FOR_PROCESSING'
                    ELSE status END AS status
        FROM registry""",
    "status_update_merge": f"""{_EVENTS_SQL}
        SELECT filename, create_date, status FROM (
            SELECT filename, create_date, status,
                   ROW_NUMBER() OVER (PARTITION BY filename ORDER BY seq DESC) AS rn
            FROM events) WHERE rn = 1""",
    # the oracle deliberately takes the NON-compacted path: direct
    # latest-wins over the full three-generation log — hash equality
    # with the Spark side's compact-then-replay output proves
    # compaction-equivalence (VERDICT r11 #8)
    "registry_compaction": f"""{_REG},
        events AS (
            SELECT filename, create_date, status, 0 AS seq FROM registry
            UNION ALL
            SELECT filename, create_date, 'FINISHED' AS status, 1 AS seq
            FROM registry WHERE status = 'IN_PROGRESS'
            UNION ALL
            SELECT filename, create_date, 'DOWNLOADING' AS status, 2 AS seq
            FROM registry
            WHERE status = 'DISCOVERED'
              AND right(filename, 1) IN ('1','3','5','7','9'))
        SELECT filename, create_date, status FROM (
            SELECT filename, create_date, status,
                   ROW_NUMBER() OVER (PARTITION BY filename
                                      ORDER BY seq DESC) AS rn
            FROM events) WHERE rn = 1""",
    "point_lookup": f"""{_REG} SELECT filename, status FROM registry
        WHERE filename = 'file_42'""",
    "filter_date_eq": f"""{_REG} SELECT filename, create_date, status FROM registry
        WHERE create_date = DATE '1997-06-15'""",
    "groupby_collect_set": f"""{_REG}
        SELECT create_date,
               string_agg(DISTINCT filename, ',' ORDER BY filename) AS filenames
        FROM registry GROUP BY create_date""",
    "registry_fs_inner_join": f"""{_REG_FS}
        SELECT f.create_date, f.filename, r.status
        FROM fs f JOIN registry r
          ON f.filename = r.filename AND f.create_date = r.create_date""",
    "sort_by_filename": f"""{_REG} SELECT filename, create_date, status
        FROM registry ORDER BY filename""",
    "agg_min_max_filtered": f"""{_REG}
        SELECT MIN(create_date) AS min_date, MAX(create_date) AS max_date
        FROM registry WHERE status = 'FINISHED'""",
    "retention_guard": f"""{_REG}
        SELECT MIN(create_date) AS min_date, MAX(create_date) AS max_date,
               (MIN(create_date) = MAX(create_date)
                OR MIN(create_date) = DATE '{TODAY}'
                OR MIN(create_date) + 1 = DATE '{TODAY}')
               AS skip_cleanup
        FROM registry WHERE status = 'FINISHED'""",
    "agg_count_star": f"{_REG} SELECT COUNT(*) AS n FROM registry",
    "csv_validate_filter": """
        WITH lines AS (
            SELECT CASE WHEN l_orderkey % 10 = 0 THEN base || ',zz' ELSE base END AS line
            FROM (SELECT concat_ws(',', CAST(l_orderkey AS VARCHAR),
                         CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
                         CAST(l_linenumber AS VARCHAR), l_returnflag, l_linestatus,
                         'f7', 'f8', 'f9') AS base, l_orderkey
                  FROM lineitem))
        SELECT CAST(SUM(CASE WHEN len(string_split(line, ',')) = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
               CAST(SUM(CASE WHEN len(string_split(line, ',')) = 9 THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
        FROM lines""",
    "cleanup_candidates": f"""{_REG_FS}
        SELECT f.create_date, f.filename
        FROM fs f JOIN registry r
          ON f.filename = r.filename AND f.create_date = r.create_date
        WHERE r.status = 'FINISHED'
          AND r.create_date < DATE '1999-01-01' - INTERVAL 1 DAY""",
    "upload_status_rollup": """
        SELECT filename,
               CASE WHEN bool_and(ok) THEN 'FINISHED' ELSE 'ERROR' END AS status
        FROM (SELECT 'file_' || CAST(l_orderkey AS VARCHAR) AS filename,
                     NOT (l_linenumber = 1 AND l_orderkey % 11 = 0) AS ok
              FROM lineitem)
        GROUP BY filename""",
}
