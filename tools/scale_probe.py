"""Scale-up probe: replicate testdata Nx into a temp dir and compare
per-query wall time against the base scale — the empirical check behind
every "would this survive 100x" claim in the operator docstrings.

Usage: python tools/scale_probe.py [factor] [sf_dir] [q1,q2,...]
Prints one JSON line: base vs scaled timings + scaling ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.session import get_spark
from crypto_data_service_loader_spark.suite import QUERIES
from crypto_data_service_loader_spark.tables import TABLES, load

PROBE_QUERIES = [
    "flagship_pricing_summary",
    "join_sortmerge",
    "join_broadcast_dim",
    "asof_last_tick",
    "dedup_exact",
    "dedup_minhash_lsh",
    "win_moving_avg",
    "sessionize_events",
    "sim_cosine_topk",
    "dedup_simhash",
    "text_chunking",
    "text_top_terms",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "range_join_events",
    "docs_prep_pipeline",
    "text_repetition",
    "ohlc_bars",
    "dedup_clusters",
    "train_val_split",
    "pack_sequences",
    "training_set_pipeline",
]

#: key columns that must stay unique when replicating (dedup/minhash pair
#: semantics depend on distinct ids)
SHIFT_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def stage(spark, sf_dir: str, out_dir: str, factor: int) -> None:
    for t in TABLES:
        df = load(spark, sf_dir, t)
        if t in SHIFT_KEYS and factor > 1:
            key = SHIFT_KEYS[t]
            n = df.agg(F.max(key)).first()[0] + 1
            parts = [
                df.withColumn(key, F.col(key) + F.lit(i * n)) for i in range(factor)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.repartition(max(4, factor * 2)).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in PROBE_QUERIES:
        print(f"[probe] {name} @ {sf_dir}", file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    if len(sys.argv) > 3:  # optional comma-separated query subset
        global PROBE_QUERIES
        PROBE_QUERIES = [q for q in sys.argv[3].split(",") if q in QUERIES]
    spark = get_spark("scale_probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    base = time_queries(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        stage(spark, sf_dir, tmp, factor)
        scaled = time_queries(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    ratios = {k: round(scaled[k] / base[k], 2) if base[k] > 0 else None for k in base}
    print(json.dumps({
        "factor": factor, "base_sf": sf_dir,
        "base_sec": base, "scaled_sec": scaled, "ratio": ratios,
    }))


if __name__ == "__main__":
    main()
