"""One-shot mechanical splitter: suite.py -> suites/ family modules.

Zero behavior change: every top-level node moves verbatim (with its
leading comment block) into exactly one family module; suite.py keeps
the QUERIES/ORACLES assembly and the rotation. Used once in round 8;
kept for the record of how the split was derived.
"""

from __future__ import annotations

import ast

SRC = "crypto_data_service_loader_spark/suite.py"
PKG = "crypto_data_service_loader_spark/suites"

src = open(SRC).read()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)

# ---- classification ------------------------------------------------------

def node_name(n):
    if isinstance(n, ast.FunctionDef):
        return n.name
    if isinstance(n, ast.Assign) and isinstance(n.targets[0], ast.Name):
        return n.targets[0].id
    if isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
        return n.target.id
    return None

SHARED = {
    "_REG", "_REG_FS", "_EVENTS_SQL", "_events_fixture", "_DSUM",
    "_TOKS", "_TOKS_CLEAN", "_SHINGLES", "_SHINGLES13", "_KNN_SQL",
    "_pagerank_sql", "_query_vector",
}
TPCH = {"_vol", "_partsupp", "_PARTSUPP_SQL", "_DAVG", "_TPCH_ORACLES"}

def classify(n):
    if isinstance(n, ast.Assign) and not isinstance(n.targets[0], ast.Name):
        return "suite"  # ORACLES['x'] = ... subscript assigns
    name = node_name(n)
    if name is None:
        return None  # docstring/imports handled separately
    if name in SHARED:
        return "shared"
    if name in TPCH or (name.startswith("q_tpch_")):
        return "tpch"
    if (name in {"QUERIES", "ORACLES"} or name.endswith("_FRONT")
            or name.startswith("ORACLES[")):
        return "suite"
    if isinstance(n, ast.Assign) and not isinstance(n.targets[0], ast.Name):
        return "suite"  # ORACLES['x'] = ... subscript assigns
    lo = n.lineno
    if lo < 115:
        return "shared" if name in SHARED else "control"
    if lo < 290:
        return "control"
    if lo < 1670:
        return "relational"
    if lo < 2290:
        return "relational"  # _RELATIONAL_ORACLES
    if lo < 2490:
        return "tpch"
    if lo < 3830:
        return "llm"
    if lo < 4628:
        return "analytics"
    return "suite"

# ---- segment extraction (node + leading comments) -------------------------

nodes = [n for n in tree.body]
segs = []  # (start_line0, end_line0_exclusive, target)
prev_end = 0
for i, n in enumerate(nodes):
    tgt = classify(n)
    start = n.lineno - 1
    # pull in contiguous comment/blank lines directly above
    j = start - 1
    while j >= prev_end and (lines[j].strip() == "" or lines[j].lstrip().startswith("#")):
        j -= 1
    seg_start = j + 1
    end = n.end_lineno
    segs.append((seg_start, end, tgt, node_name(n)))
    prev_end = end

out = {k: [] for k in
       ["shared", "control", "relational", "tpch", "llm", "analytics", "suite"]}
header = None  # module docstring + imports stay with suite.py AND shared
for (s, e, tgt, name) in segs:
    text = "".join(lines[s:e])
    if tgt is None:
        continue
    out[tgt].append((name, text))

import json
print(json.dumps({k: [n for n, _ in v] for k, v in out.items()}, indent=1))
open("/tmp/split_plan.json", "w").write(
    json.dumps({k: [n for n, _ in v] for k, v in out.items()}, indent=1))
import pickle
pickle.dump(out, open("/tmp/split_segments.pkl", "wb"))
