"""Materialize-once policies for reused intermediates (VERDICT r12 #7).

Several operators compute an expensive intermediate that the rest of the
plan references more than once (the MinHash candidate set, the stride-1
window explode, the centroid assignment). Without materialization,
Catalyst re-executes the whole producing subplan per reference (measured
29 s -> 7 s on duplicated_ngram_spans at sf0.1). Two policies:

- ``reliable=False`` (default): ``localCheckpoint()`` — eager, fastest,
  truncates lineage. The copy lives on executor local storage ONLY: if
  an executor dies at cluster scale, the truncated lineage cannot
  recompute the lost partitions and the JOB fails. Fine on local[*] and
  for short-lived intermediates.
- ``reliable=True``: survives executor loss. If the session has a
  checkpoint directory configured (``sc.setCheckpointDir`` — normally
  durable storage: HDFS/S3), use an eager reliable ``checkpoint()``;
  otherwise fall back to ``persist(DISK_ONLY)`` + an eager count —
  persisted partitions also live on executor disks, but persist KEEPS
  the lineage, so a lost partition recomputes instead of killing the
  job (availability at the price of recomputation, never correctness).

Either way the intermediate is materialized exactly ONCE — the
downstream plan reads the materialized copy, never the producer.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize_once(df: DataFrame, reliable: bool = False) -> DataFrame:
    if not reliable:
        return df.localCheckpoint()
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():  # noqa: SLF001
        return df.checkpoint(eager=True)
    out = df.persist(StorageLevel.DISK_ONLY)
    out.count()  # eager: downstream references must hit the cache, not race it
    return out
