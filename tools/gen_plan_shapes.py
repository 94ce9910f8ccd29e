"""Generate PLAN_SHAPES.json — a coarse physical-plan fingerprint for
every registered query, the plan-REGRESSION gate's snapshot.

The fingerprint counts the scale-relevant operator classes (exchanges,
join strategies, nested loops, windows, generates) in the pre-execution
plan. tests/test_plan_shapes.py re-derives the same fingerprints and
diffs them against this snapshot, so an edit that silently degrades a
plan — a broadcast falling back to sort-merge, an extra shuffle, a new
nested loop — fails CI with a named key instead of shipping as a
latent 100-TB regression.

Regenerate deliberately after an intended plan change:
    python tools/gen_plan_shapes.py
(uses the SAME session shape as tests/conftest.py: local[4], 4 shuffle
partitions, AQE on — fingerprints are partition-count-free so the
counts are stable across hosts).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_SHAPES.json",
)

#: operator classes whose COUNT is load-bearing for scale; names are
#: matched as whole words at line starts of the plan tree
SHAPE_NODES = [
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "Generate",
]

_NODE_RE = re.compile(
    r"^[\s:+*\-()0-9]*(" + "|".join(SHAPE_NODES) + r")\b"
)


def shape_of(plan: str) -> dict[str, int]:
    counts: dict[str, int] = {}
    for line in plan.splitlines():
        m = _NODE_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        # "Exchange" must not also count each BroadcastExchange line
        if name == "Exchange" and "BroadcastExchange" in line:
            name = "BroadcastExchange"
        counts[name] = counts.get(name, 0) + 1
    return dict(sorted(counts.items()))


def generate(spark=None) -> dict[str, dict[str, int]]:
    from crypto_data_service_loader_spark.plans.explain import physical_plan
    from crypto_data_service_loader_spark.session import get_spark
    from crypto_data_service_loader_spark.suite import QUERIES

    if spark is None:
        spark = get_spark(
            "plan_shapes", master="local[4]", shuffle_partitions=4
        )
    shapes = {}
    for name in sorted(QUERIES):
        shapes[name] = shape_of(physical_plan(QUERIES[name](spark, SF_DIR)))
    return shapes


def main() -> None:
    shapes = generate()
    with open(OUT, "w") as fh:
        json.dump(shapes, fh, indent=1, sort_keys=True)
    print(f"PLAN_SHAPES.json written ({len(shapes)} keys)")


if __name__ == "__main__":
    main()
