"""JSONL source/sink: validated read with corrupt-line quarantine,
ordered-shard write round-trip."""

from __future__ import annotations

import glob
import gzip
import json

from pyspark.sql import functions as F

from crypto_data_service_loader_spark.sources.jsonl import (
    read_documents_jsonl,
    write_jsonl_shards,
)
from crypto_data_service_loader_spark.tables import load


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "good one", "lang": "en",
                    "source": "s0", "n_chars": 8}),
        "{this is not json",
        json.dumps({"doc_id": 2, "text": "also good", "lang": "en",
                    "source": "s0", "n_chars": 9}),
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad, scan = read_documents_jsonl(spark, str(p))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    quarantined = [r["line"] for r in bad.collect()]
    assert quarantined == ["{this is not json"]
    assert scan.storageLevel.useMemory  # shared cached scan is live...
    scan.unpersist()
    assert not scan.storageLevel.useMemory  # ...and releasable by callers


def test_open_documents_jsonl_unpersists_on_exit(spark, tmp_path):
    from crypto_data_service_loader_spark.sources.jsonl import (
        open_documents_jsonl,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(json.dumps({"doc_id": 7, "text": "x", "lang": "en",
                             "source": "s0", "n_chars": 1}) + "\n")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    with open_documents_jsonl(spark, str(p)) as (good, bad):
        assert good.count() == 1 and bad.count() == 0
        during = spark.sparkContext._jsc.getPersistentRDDs().size()
        assert during == before + 1  # the shared scan is cached inside...
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before  # ...and released on exit (no storage leak)


def test_jsonl_shard_roundtrip_ordered(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    out = str(tmp_path / "shards")
    write_jsonl_shards(docs, out, shards=4)
    files = sorted(glob.glob(out + "/part-*.json.gz"))
    assert len(files) == 4
    # global order across shards: each file's ids precede the next file's
    last = -1
    for f in files:
        with gzip.open(f, "rt") as fh:
            ids = [json.loads(line)["doc_id"] for line in fh if line.strip()]
        assert ids == sorted(ids)          # in-shard order
        if ids:
            assert ids[0] > last           # cross-shard range order
            last = ids[-1]
    # round-trip: same rows come back through the validated reader
    good, bad, scan = read_documents_jsonl(spark, out)
    assert bad.count() == 0
    assert good.count() == docs.count()
    orig = {r["doc_id"] for r in docs.select("doc_id").collect()}
    got = {r["doc_id"] for r in good.select("doc_id").collect()}
    assert got == orig
    scan.unpersist()


def test_training_pipeline_to_jsonl_release(spark, sf_dir, tmp_path):
    """End-to-end release path: the composed training pipeline's packed
    output written as ordered JSONL shards and read back losslessly — the
    full assemble -> release -> consume loop a trainer runs."""
    import gzip as _gzip
    import json as _json

    from crypto_data_service_loader_spark.sources.jsonl import write_jsonl_shards
    from crypto_data_service_loader_spark.suite import q_training_set_pipeline

    packed = q_training_set_pipeline(spark, sf_dir)
    out = str(tmp_path / "release")
    write_jsonl_shards(packed, out, shards=3, order_col="doc_id")
    files = sorted(glob.glob(out + "/part-*.json.gz"))
    assert len(files) == 3
    rows = []
    for f in files:
        with _gzip.open(f, "rt") as fh:
            rows += [_json.loads(line) for line in fh if line.strip()]
    expected = {r["doc_id"]: (r["split"], r["bin_id"])
                for r in packed.collect()}
    got = {r["doc_id"]: (r["split"], r["bin_id"]) for r in rows}
    assert got == expected
    assert len(rows) == len(expected)
