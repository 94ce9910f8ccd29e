"""Round-16 evidence capture: the community_lpa EDGE-DERIVATION sub-plan.

label_propagation localCheckpoints the symmetrized edge list, so the
registered query's .explain() only shows the post-checkpoint iterations
(Scan ExistingRDD). This captures the pre-checkpoint derivation plan for
both shapes:

- before: the r15 shape — lineitem self-joined on l_orderkey (two scans,
  two exchanges), every ORDERED pair pushed through canonicalize+distinct
- after:  the r16 shape — one groupBy(l_orderkey).collect_set and the
  a<b pairs exploded from each order's supplier array (one scan, one
  exchange, already-canonical pairs)

Writes plans/r16/community_lpa_edges_{before,after}.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.plans.explain import formatted_plan
from crypto_data_service_loader_spark.session import get_spark
from crypto_data_service_loader_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _canon(edges):
    """The canonicalize+distinct head of label_propagation, inlined so the
    captured plan covers everything up to the localCheckpoint barrier."""
    s, d = F.col("src"), F.col("dst")
    return (
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )


def main() -> int:
    spark = get_spark("opt_capture_lpa_edges")
    li = load(spark, SF_DIR, "lineitem")

    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("dst"))
    before = _canon(
        a.join(b, "ok").filter(F.col("src") != F.col("dst")).select("src", "dst")
    )

    per_order = li.groupBy(F.col("l_orderkey")).agg(
        F.collect_set("l_suppkey").alias("_ss")
    )
    after = _canon(
        per_order.select(F.explode("_ss").alias("src"), F.col("_ss").alias("_ss"))
        .select(
            "src",
            F.explode(F.filter("_ss", lambda x: x > F.col("src"))).alias("dst"),
        )
    )

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    for name, df in [("before", before), ("after", after)]:
        path = os.path.join(out_dir, f"community_lpa_edges_{name}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
