"""Plan-shape regression gate: every registered query's coarse physical
plan fingerprint (exchanges, join strategies, nested loops, windows,
generates) must match the committed PLAN_SHAPES.json snapshot — an edit
that silently degrades a plan (broadcast -> sort-merge, an extra
shuffle, a new nested loop) fails here with the key named, instead of
shipping as a latent 100-TB regression. After an INTENDED plan change,
regenerate with `python tools/gen_plan_shapes.py` and commit the diff."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import gen_plan_shapes


def test_plan_shapes_match_snapshot(spark):
    snap_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_SHAPES.json",
    )
    with open(snap_path) as fh:
        want = json.load(fh)
    got = gen_plan_shapes.generate(spark)
    assert set(got) == set(want), (
        f"key set drift: +{sorted(set(got) - set(want))} "
        f"-{sorted(set(want) - set(got))} — regenerate PLAN_SHAPES.json"
    )
    diffs = {
        k: {"want": want[k], "got": got[k]}
        for k in sorted(got)
        if got[k] != want[k]
    }
    assert not diffs, (
        f"{len(diffs)} plan shape(s) changed: "
        + json.dumps(diffs, indent=1, sort_keys=True)
        + "\nIf intended, regenerate with python tools/gen_plan_shapes.py"
    )
