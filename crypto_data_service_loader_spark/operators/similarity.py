"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the scale path is an
LSH-bucketed variant (deterministic md5-derived hyperplanes, so results are
reproducible across runs and engines — no RNG in the data plane).

All vector math uses built-in higher-order functions (zip_with/aggregate)
on DOUBLE — JVM-side, codegen'd, no Python in the scan. For very wide
vectors a Pandas-UDF/numpy path can win on SIMD; see
``cosine_scores_pandas`` in tests for the benchmarked alternative.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.localrel import local_values_df
from ..functions.windows import bounded_partition_key


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


#: SQL-string twins of _dot/_as_double (round 17, guide §1.2 — the r16 §9
#: fingerprint finding again: driver-side Column-tree construction, one
#: py4j round trip per node, dominated several builds). One F.expr parses
#: JVM-side in a single call and resolves to the SAME trees the lambda
#: builders produce (aggregate/zip_with/transform with identical lambda
#: bodies and the identical DOUBLE literal), so results are unchanged.
def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )


def _as_double_sql(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


#: first-row vector length per analyzed-plan hash (round 17): the
#: head(1) dim probe is a Spark JOB paid on every DataFrame build of the
#: LSH family; gate/bench inputs are immutable within a session and a
#: fresh temp path hashes fresh (same memo contract as dedup._spread's
#: partition guard and sources/pread's pinned schemas). The EMPTY
#: outcome is deliberately never memoized — an empty probe re-runs, so
#: a test that appends to a just-created empty table stays correct.
_VEC_DIM_MEMO: dict[tuple, int] = {}


def _vec_dim(embeddings: DataFrame, vec_col: str) -> int | None:
    """len(first row's vec_col), or None when the input is empty."""
    key = None
    try:
        key = (
            embeddings._jdf.queryExecution().analyzed().semanticHash(),  # noqa: SLF001
            vec_col,
        )
    except Exception:  # noqa: BLE001 — fall back to the probe
        pass
    if key is not None and key in _VEC_DIM_MEMO:
        return _VEC_DIM_MEMO[key]
    head = embeddings.select(vec_col).head(1)
    if not head:
        return None
    dim = len(head[0][0])
    if key is not None:
        _VEC_DIM_MEMO[key] = dim
    return dim


def _shuffle_parallelism(df: DataFrame) -> int:
    """The session's shuffle partition count (defaultParallelism when
    the conf is non-numeric, e.g. 'auto' on managed platforms) — used to
    pin compute-dense exchanges that AQE's byte-based coalescing would
    otherwise serialize."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _cosine(dot: Column, denom: Column, scale: int) -> Column:
    """Cosine score with the zero-norm convention: a zero-norm vector
    scores 0.0 against everything. The raw ratio is 0/0 there — ANSI
    Spark aborts the job, DuckDB yields NaN — so every oracle carries
    the same CASE WHEN denom > 0 guard (fuzzer-found class, round 8)."""
    return F.when(denom > 0, F.round(dot / denom, scale)).otherwise(F.lit(0.0))


def cosine_scores(
    embeddings: DataFrame,
    query: Sequence[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Cosine similarity of every row against a literal query vector.

    The query norm is computed driver-side (one small literal broadcast into
    the plan); per-row work is a fused zip_with+aggregate fold — one scan,
    no shuffle. Scores rounded to `scale` decimals to make top-k ordering
    reproducible across engines (doubles differ in the last ulp).
    """
    qnorm = math.sqrt(sum(float(x) * float(x) for x in query))
    q = F.array(*[F.lit(float(x)) for x in query])
    v = _as_double(F.col(vec_col))
    dot = _dot(v, q)
    vnorm = F.sqrt(_dot(v, v))
    return embeddings.select(
        F.col(id_col),
        _cosine(dot, vnorm * F.lit(qnorm), scale).alias("score"),
    )


def cosine_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k: scan + TakeOrderedAndProject (per-partition
    k-heaps, driver merge) — the exact baseline every ANN variant is
    measured against. Deterministic tie-break on id."""
    return (
        cosine_scores(embeddings, query, vec_col, id_col)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_near_dups_bruteforce(
    embeddings: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """TEST BASELINE ONLY: theta self-join (BroadcastNestedLoopJoin) —
    the simplest exact formulation, kept so tests can diff the distributed
    paths against it. Never the production path: a nested-loop join
    concentrates the whole O(n²) on however many partitions the broadcast
    lands on and OOMs the moment neither side fits in one executor."""
    v = _as_double(F.col(vec_col))
    normed = embeddings.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
    )
    a = normed.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"), F.col("_n").alias("na")
    )
    b = normed.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_n").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"), "inner")
        .select(
            "id_a",
            "id_b",
            _cosine(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"), scale,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
    n_blocks: int = 16,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    score >= threshold), as a block-partitioned distributed all-pairs join.

    Exact all-pairs at a low threshold is irreducibly O(n²) compute, but it
    does NOT have to be a nested-loop join: ids hash into `n_blocks`
    blocks; a tiny (block_a <= block_b) task table (broadcast twice) fans
    each vector out to its row/column of block-pair tasks; the pair stage
    is then an EQUI-join on task id, so the n² work is spread evenly over
    B(B+1)/2 shuffle partitions, streams through sort-merge join (spilling
    per key group rather than buffering a broadcast side), and scales
    horizontally with executors. Each unordered pair is produced exactly
    once: an off-diagonal pair appears only in its one (min-block,
    max-block) task; a same-block pair only on the diagonal task, deduped
    by id order. Norms are computed once per row scan-side.

    Size `n_blocks` so n/B vectors fit one task comfortably (B(B+1)/2
    tasks ≥ cluster cores). For corpora where n² itself is infeasible
    (true 100 TB embedding stores), exact low-threshold all-pairs is
    impossible in any engine — use embedding_near_dups_lsh at a high
    threshold, which this function's verify stage shares.
    """
    spark = embeddings.sparkSession
    v = _as_double(F.col(vec_col))
    normed = embeddings.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_blocks)).alias("_blk"),
    )
    tasks = [
        (t, i, j)
        for t, (i, j) in enumerate(
            (i, j) for i in range(n_blocks) for j in range(i, n_blocks)
        )
    ]
    tdf = local_values_df(spark, tasks, "tid int, ba int, bb int")
    left = normed.join(F.broadcast(tdf), normed["_blk"] == tdf["ba"]).select(
        F.col("_id").alias("ia"), F.col("_v").alias("va"),
        F.col("_n").alias("na"), F.col("_blk").alias("blk_a"), "tid",
    )
    right = normed.join(F.broadcast(tdf), normed["_blk"] == tdf["bb"]).select(
        F.col("_id").alias("ib"), F.col("_v").alias("vb"),
        F.col("_n").alias("nb"), F.col("_blk").alias("blk_b"), "tid",
    )
    return (
        left.join(right, "tid")
        .filter(
            (F.col("blk_a") != F.col("blk_b")) | (F.col("ia") < F.col("ib"))
        )
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            _cosine(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"), scale,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
    n_vectors_hint: int | None = None,
) -> DataFrame:
    """Scale twin of embedding_near_dups: candidate pairs only within the
    same sign-LSH bucket (equi-join on bucket id), then the exact cosine
    verify. Recall < 1 (tested against the brute-force baseline); the n²
    stage becomes per-bucket n²/2^planes.

    `n_planes=None` (the default) derives the dial from the corpus size
    via `auto_planes` — pass `n_vectors_hint` to skip the count job, or an
    explicit `n_planes` to pin it (tests / oracle twins do)."""
    dim = _vec_dim(embeddings, vec_col)
    if dim is None:  # empty corpus -> empty pair set (match the brute twin)
        id_type = embeddings.schema[id_col].dataType.simpleString()
        return local_values_df(
            embeddings.sparkSession,
            [], f"id_a {id_type}, id_b {id_type}, score double"
        )
    n_planes = _resolve_planes(embeddings, n_planes, n_vectors_hint)
    v = _as_double(F.col(vec_col))
    bucketed = lsh_bucket_ids(embeddings, dim, n_planes, vec_col).select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        "bucket",
    )
    a = bucketed.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                        F.col("_n").alias("na"), "bucket")
    b = bucketed.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                        F.col("_n").alias("nb"), "bucket")
    return (
        a.join(b, ["bucket"], "inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _cosine(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"), scale,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def _assign_to_centroids(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Nearest-centroid assignment. For bounded centroid sets (<= 128)
    the argmin is a SCAN-LOCAL expression (round 16, guide §2.4): an
    array of (dist, cid) structs over literal centroid vectors,
    `array_min` picking the lexicographic minimum — the same
    (dist, cid) ordering as the min_by tie-break below, with ZERO
    exchange and no k-per-row replication. Larger centroid sets (the
    auto-dialed 100 TB case) fall back to broadcast-join + min_by: one
    narrow (id) shuffle whose bytes are bounded by map-side partial
    min_by, while the inline form's plan would grow with k·dim."""
    from .dedup import _spread

    v = _as_double(F.col(vec_col))
    # _spread (round 16): the embeddings fixture reads as ONE parquet
    # split, so the k-per-row distance fold otherwise runs on a single
    # core; no-op once the scan has enough partitions (production)
    spread = _spread(embeddings)
    if len(centroids) <= 128:
        def _dist(cvec: list[float]) -> Column:
            carr = F.array(*[F.lit(float(x)) for x in cvec])
            return F.aggregate(
                F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        best = F.array_min(
            F.array(*[
                F.struct(_dist(cvec).alias("dist"), F.lit(cid).alias("cid"))
                for cid, cvec in centroids
            ])
        )["cid"]
        return spread.select(
            F.col(id_col), best.alias("centroid_id"), F.col(vec_col)
        )
    cdf = local_values_df(
        embeddings.sparkSession,
        [(i, v_) for i, v_ in centroids], "cid int, cvec array<double>"
    )
    dist = F.aggregate(
        F.zip_with(v, F.col("cvec"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = spread.join(F.broadcast(cdf), F.lit(True), "inner").select(
        F.col(id_col), F.col(vec_col), F.col("cid"), dist.alias("dist")
    )
    return scored.groupBy(id_col).agg(
        F.min_by("cid", F.struct("dist", "cid")).alias("centroid_id"),
        F.first(vec_col).alias(vec_col),
    )


def _seed_centroids(
    embeddings: DataFrame, k_centroids: int, vec_col: str, id_col: str
) -> list[tuple[int, list[float]]]:
    """Deterministic seed set: the first `k_centroids` vectors by id (no
    RNG state — identical across runs/engines)."""
    seeds = (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(k_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    return [(i, [float(x) for x in r["cvec"]]) for i, r in enumerate(seeds)]


def ivf_train(
    embeddings: DataFrame,
    k_centroids: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Lloyd refinement of the deterministic seed centroids.

    Each iteration: (1) nearest-centroid assignment (broadcast + min_by, one
    scan); (2) recompute each centroid as the elementwise mean of its
    members — posexplode to (cid, pos, x), avg per (cid, pos) (a k×dim-row
    shuffle, independent of table size after the partial agg), rebuild the
    array with sort_array(collect_list(struct(pos, m))). Clusters that lose
    all members keep their previous centroid. At 100 TB, train on a sample
    (`.sample(fraction)`) — Lloyd needs only a representative quantizer,
    not the full table; assignment cost is unchanged either way.
    """
    centroids = _seed_centroids(embeddings, k_centroids, vec_col, id_col)
    for _ in range(iters):
        assigned = _assign_to_centroids(embeddings, centroids, vec_col, id_col)
        rows = (
            assigned.select(
                "centroid_id",
                F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x"),
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                "centroid_id",
                F.transform("pm", lambda s: s["m"]).alias("cvec"),
            )
            .collect()
        )
        updated = {r["centroid_id"]: [float(x) for x in r["cvec"]] for r in rows}
        centroids = [(cid, updated.get(cid, vec)) for cid, vec in centroids]
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    k_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_iters: int = 0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse quantizer: deterministic centroids + nearest-centroid
    assignment.

    With `train_iters=0` centroids are the deterministic seed set; with
    `train_iters>0` they are Lloyd-refined first (`ivf_train`), which
    tightens clusters and so raises recall at fixed nprobe. Returns
    (assigned_df, centroids) so the query side can reuse the centroid list
    driver-side.
    """
    if train_iters > 0:
        centroids = ivf_train(embeddings, k_centroids, train_iters, vec_col, id_col)
    else:
        centroids = _seed_centroids(embeddings, k_centroids, vec_col, id_col)
    return _assign_to_centroids(embeddings, centroids, vec_col, id_col), centroids


def ivf_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    k_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_iters: int = 0,
) -> DataFrame:
    """IVF ANN top-k: probe only the `nprobe` centroids nearest the query.

    At 100 TB the assignment is precomputed and the table is partitioned by
    centroid_id, so the probe is partition pruning; here assignment runs
    inline. Recall grows with nprobe (nprobe == k_centroids is exact) and
    with `train_iters` (Lloyd-refined centroids cluster tighter).
    """
    assigned, centroids = ivf_assign(
        embeddings, k_centroids, vec_col, id_col, train_iters
    )

    def d2(a: Sequence[float], b: Sequence[float]) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    probe = sorted(centroids, key=lambda c: d2(c[1], [float(x) for x in query]))
    probe_ids = [c[0] for c in probe[:nprobe]]
    cands = assigned.filter(F.col("centroid_id").isin(probe_ids)).select(
        id_col, vec_col
    )
    return cosine_topk(cands, query, k, vec_col, id_col)


def ivf_tune_nprobe(
    embeddings: DataFrame,
    sample_queries: list[Sequence[float]],
    target_recall: float = 0.9,
    k: int = 10,
    k_centroids: int = 16,
    train_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Pick the smallest nprobe whose mean recall@k over `sample_queries`
    (vs the exact brute-force top-k) meets `target_recall`.

    Train/assign once, then sweep nprobe driver-side — each probe level
    only re-filters the cached assignment, so the sweep costs one
    assignment plus |queries| x |levels| cheap top-k scans over candidate
    subsets. At 100 TB this runs on a sample table offline; the chosen
    nprobe is then a query-time constant. Returns k_centroids (exact
    search) if the target is never met earlier.
    """
    assigned, centroids = ivf_assign(
        embeddings, k_centroids, vec_col, id_col, train_iters
    )
    assigned = assigned.cache()
    try:
        truth = [
            {r[id_col] for r in cosine_topk(embeddings, q, k, vec_col, id_col).collect()}
            for q in sample_queries
        ]

        def d2(a: Sequence[float], b: Sequence[float]) -> float:
            return sum((x - y) * (x - y) for x, y in zip(a, b))

        for nprobe in range(1, k_centroids + 1):
            recalls = []
            for q, expect in zip(sample_queries, truth):
                probe = sorted(centroids, key=lambda c: d2(c[1], [float(x) for x in q]))
                probe_ids = [c[0] for c in probe[:nprobe]]
                cands = assigned.filter(
                    F.col("centroid_id").isin(probe_ids)
                ).select(id_col, vec_col)
                got = {r[id_col] for r in cosine_topk(cands, q, k, vec_col, id_col).collect()}
                recalls.append(len(got & expect) / max(len(expect), 1))
            if sum(recalls) / len(recalls) >= target_recall:
                return nprobe
        return k_centroids
    finally:
        assigned.unpersist()


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.35,
    k_centroids: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
    n_vectors_hint: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (public recipe: Abbas et al.
    2023, "SemDeDup" — cluster first, compare only within clusters).

    1. Quantize every vector to its nearest centroid (deterministic seed
       centroids = the k lowest-id vectors; broadcast + min_by — one scan).
    2. Pairwise cosine ONLY within a cluster (equi-join on centroid_id), so
       the O(n²) pair stage becomes Σ per-cluster n_c² — the published trick
       that makes semantic dedup tractable at corpus scale.
    3. The higher-id member of every pair at/above `threshold` is flagged a
       semantic duplicate (keep-lowest-id policy, matching exact_dedup).

    Returns one row per vector: (id, centroid_id, is_dup). At 100 TB:
    centroids come from `ivf_train` on a sample, the table is written
    partitioned by centroid_id, and the pair join is partition-local.

    `k_centroids=None` (the default) derives the dial from the corpus size
    via `auto_centroids` so per-cluster pair work stays bounded as the
    corpus grows (measured: 10x data at fixed k=8 cost 21x; with k scaled,
    ~2x — SCALE_NOTES). Pass `n_vectors_hint` to skip the count job, or an
    explicit `k_centroids` to pin it (tests / oracle twins do).
    """
    if k_centroids is None:
        k_centroids = auto_centroids(corpus_count(embeddings, n_vectors_hint))
    centroids = _seed_centroids(embeddings, k_centroids, vec_col, id_col)
    # materialize the assignment once: the plan references it three times
    # (result rows + both sides of the pair join) and would otherwise run
    # the centroid scan+min_by 3x. reliable=True swaps localCheckpoint
    # (lost with its executor at cluster scale) for a lineage-keeping /
    # checkpoint-dir policy — see functions.materialize (VERDICT r12 #7).
    from ..functions.materialize import materialize_once

    assigned = materialize_once(
        _assign_to_centroids(embeddings, centroids, vec_col, id_col),
        reliable=reliable,
    )
    v = _as_double(F.col(vec_col))
    normed = assigned.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        "centroid_id",
    )
    a = normed.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"),
        F.col("_n").alias("na"), "centroid_id",
    )
    b = normed.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
        F.col("_n").alias("nb"), "centroid_id",
    )
    # sub-salt the per-cluster pair join (round 16, guide §2.5): the join
    # key has only k_centroids distinct values, so the compute-dense
    # quadratic pair stage otherwise lands on at most k tasks (8 of 32
    # cores for the pinned gate dial). The a-side gets a deterministic
    # block id, the b-side replicates via a literal explode (no join, no
    # nested loop), and every (a, b) pair still meets exactly once — in
    # a's one block. S auto-degrades to 1 once k_centroids reaches the
    # cluster's parallelism (the auto-dialed 100 TB case: k scales with
    # the corpus, so this is a small-k local/bench affordance that
    # vanishes at scale).
    n_salts = max(1, _shuffle_parallelism(embeddings) // max(int(k_centroids), 1))
    keys = ["centroid_id"]
    if n_salts > 1:
        a = a.withColumn(
            "_sb", F.pmod(F.hash(F.col("id_a")), F.lit(n_salts))
        )
        b = b.withColumn(
            "_sb",
            F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
        )
        keys = ["centroid_id", "_sb"]
    dups = (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_b",
            _cosine(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"), scale,
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return (
        assigned.select(id_col, "centroid_id")
        .join(dups, [id_col], "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


def knn_graph(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
    n_vectors_hint: int | None = None,
) -> DataFrame:
    """Approximate k-NN graph: per-vector top-k cosine neighbors, candidates
    restricted to the vector's sign-LSH bucket (equi-join, no all-pairs).

    The standard input to graph-based corpus analyses (semantic clustering,
    label propagation, graph dedup). Recall < 1 by construction — a vector's
    true neighbor in another bucket is missed (tested against brute force).
    Rank is dense within (score desc, neighbor id asc), deterministic.
    At 100 TB the per-bucket candidate join shuffles on bucket id and the
    top-k is a per-source-id window — both partition-parallel; more planes
    shrink buckets (recall vs. cost dial).

    `n_planes=None` (the default) derives the dial from the corpus size
    via `auto_planes` so per-bucket pair work stays bounded as the corpus
    grows; pass `n_vectors_hint` to skip the count job, or an explicit
    `n_planes` to pin it (tests / oracle twins do).
    """
    from pyspark.sql import Window

    dim = _vec_dim(embeddings, vec_col)
    if dim is None:
        id_type = embeddings.schema[id_col].dataType.simpleString()
        return local_values_df(
            embeddings.sparkSession,
            [], f"{id_col} {id_type}, neighbor_id {id_type}, score double, rank int"
        )
    n_planes = _resolve_planes(embeddings, n_planes, n_vectors_hint)
    v = _as_double(F.col(vec_col))
    bucketed = lsh_bucket_ids(embeddings, dim, n_planes, vec_col).select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        "bucket",
    )
    # pin the pair-join exchange to the session's shuffle parallelism:
    # the bucket self-join is compute-dense (quadratic per-bucket dot
    # products) on FEW input bytes, so AQE's byte-based coalescing would
    # otherwise collapse it onto one task (measured 2.8x on the bench
    # box, VERDICT r13 #4). Same data movement the join needs anyway —
    # the explicit repartition only fixes the partition COUNT.
    # (round 16: sub-salting this join like semantic_dedup's was tried
    # and measured ~1.2x WORSE here — the doubled exchange + b-side
    # replication outweigh the extra key spread at 2^planes buckets;
    # reverted to the r13 pinned shape.)
    bucketed = bucketed.repartition(_shuffle_parallelism(embeddings), "bucket")
    a = bucketed.select(F.col("_id").alias("_src"), F.col("_v").alias("va"),
                        F.col("_n").alias("na"), "bucket")
    b = bucketed.select(F.col("_id").alias("neighbor_id"),
                        F.col("_v").alias("vb"), F.col("_n").alias("nb"),
                        "bucket")
    pairs = (
        a.join(b, ["bucket"])
        .filter(F.col("_src") != F.col("neighbor_id"))
        .select(
            "_src",
            "neighbor_id",
            _cosine(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"), scale,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_src").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_src").alias(id_col), "neighbor_id", "score", "rank")
    )


def hard_negatives(
    embeddings: DataFrame,
    k: int = 2,
    n_planes: int | None = None,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
    n_vectors_hint: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training (round 12): per
    vector, the top-k most-cosine-similar vectors carrying a DIFFERENT
    label — the "similar but wrong" examples that make contrastive /
    embedding-finetune batches informative (the standard mining recipe:
    ANN candidates, filter same-label, keep the nearest few). Same
    bucketed shape as `knn_graph` — candidates restricted to the
    vector's sign-LSH bucket (equi-join, never all-pairs), labels ride
    the bucketed table so the cross-label filter runs inside the join,
    and the top-k is a per-source window. Approximate by construction
    (a cross-bucket negative is missed — the recall/cost dial is
    n_planes, auto-derived from corpus size like the other LSH ops).
    Returns (id, negative_id, neg_label, score, rank)."""
    from pyspark.sql import Window

    dim = _vec_dim(embeddings, vec_col)
    if dim is None:
        id_type = embeddings.schema[id_col].dataType.simpleString()
        lbl_type = embeddings.schema[label_col].dataType.simpleString()
        return local_values_df(
            embeddings.sparkSession,
            [],
            f"{id_col} {id_type}, negative_id {id_type}, "
            f"neg_label {lbl_type}, score double, rank int",
        )
    n_planes = _resolve_planes(embeddings, n_planes, n_vectors_hint)
    v = _as_double(F.col(vec_col))
    bucketed = lsh_bucket_ids(embeddings, dim, n_planes, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        "bucket",
    )
    a = bucketed.select(
        F.col("_id").alias("_src"), F.col("_lbl").alias("_src_lbl"),
        F.col("_v").alias("va"), F.col("_n").alias("na"), "bucket",
    )
    b = bucketed.select(
        F.col("_id").alias("negative_id"), F.col("_lbl").alias("neg_label"),
        F.col("_v").alias("vb"), F.col("_n").alias("nb"), "bucket",
    )
    pairs = (
        a.join(b, ["bucket"])
        .filter(F.col("_src_lbl") != F.col("neg_label"))
        .select(
            "_src",
            "negative_id",
            "neg_label",
            _cosine(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"), scale,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_src").orderBy(
        F.col("score").desc(), F.col("negative_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_src").alias(id_col), "negative_id", "neg_label",
            "score", "rank",
        )
    )


def contrastive_triplets(
    embeddings: DataFrame,
    n_negatives: int = 2,
    n_planes: int | None = None,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 6,
    n_vectors_hint: int | None = None,
) -> DataFrame:
    """Contrastive training batch assembly (round 12): one row per
    anchor with its mined positive (nearest SAME-label vector) and its
    hard negatives (nearest cross-label vectors, comma-joined id list in
    rank order) — the (anchor, positive, negatives) triplet every
    contrastive/embedding-finetune loader consumes. Anchors with no
    same-label bucket partner or no cross-label partner are dropped (a
    triplet needs both sides).

    One bucketed candidate join feeds BOTH mines: the same-label top-1
    and the cross-label top-k are two windows over one pair set, so the
    expensive part (the LSH equi-join) is paid once. Output:
    (id, positive_id, pos_score, negative_ids, neg_score_micros)."""
    from pyspark.sql import Window

    dim = _vec_dim(embeddings, vec_col)
    if dim is None:
        id_type = embeddings.schema[id_col].dataType.simpleString()
        return local_values_df(
            embeddings.sparkSession,
            [],
            f"{id_col} {id_type}, positive_id {id_type}, "
            "pos_score double, negative_ids string, neg_score_micros string",
        )
    n_planes = _resolve_planes(embeddings, n_planes, n_vectors_hint)
    v = _as_double(F.col(vec_col))
    bucketed = lsh_bucket_ids(embeddings, dim, n_planes, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        v.alias("_v"),
        F.sqrt(_dot(v, v)).alias("_n"),
        "bucket",
    )
    a = bucketed.select(
        F.col("_id").alias("_src"), F.col("_lbl").alias("_src_lbl"),
        F.col("_v").alias("va"), F.col("_n").alias("na"), "bucket",
    )
    b = bucketed.select(
        F.col("_id").alias("_cand"), F.col("_lbl").alias("_cand_lbl"),
        F.col("_v").alias("vb"), F.col("_n").alias("nb"), "bucket",
    )
    pairs = (
        a.join(b, ["bucket"])
        .filter(F.col("_src") != F.col("_cand"))
        .select(
            "_src", "_src_lbl", "_cand", "_cand_lbl",
            _cosine(
                _dot(F.col("va"), F.col("vb")),
                F.col("na") * F.col("nb"), scale,
            ).alias("score"),
        )
        # one candidate set, two consumers (positive + negative windows)
        .localCheckpoint()
    )
    same = F.col("_src_lbl") == F.col("_cand_lbl")
    wp = Window.partitionBy("_src").orderBy(
        F.col("score").desc(), F.col("_cand").asc()
    )
    pos = (
        pairs.filter(same)
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_src"),
            F.col("_cand").alias("positive_id"),
            F.col("score").alias("pos_score"),
        )
    )
    neg = (
        pairs.filter(~same)
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= int(n_negatives))
        .groupBy("_src")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_rn", "_cand"))
                    ),
                    lambda s: s["_cand"].cast("string"),
                ),
            ).alias("negative_ids"),
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_rn", "score"))
                    ),
                    # micro-integer serialization: double->string casts
                    # are NOT format-stable across engines; floor(x*1e6
                    # + 0.5) is the identical IEEE op sequence on both
                    lambda s: F.floor(s["score"] * 1e6 + 0.5)
                    .cast("long").cast("string"),
                ),
            ).alias("neg_score_micros"),
        )
    )
    return pos.join(neg, "_src").select(
        F.col("_src").alias(id_col),
        "positive_id", "pos_score", "negative_ids", "neg_score_micros",
    )


#: memoized dial-resolution counts, keyed by (session, analyzed-plan
#: semanticHash) — see corpus_count. The session component is the
#: Spark application id, a stable identifier: id(sparkSession) can be
#: recycled by CPython GC, letting a new session read a dead session's
#: stale count (ADVICE r11).
_CORPUS_COUNT_MEMO: dict[tuple[str, int], int] = {}


def corpus_count(df: DataFrame, hint: int | None = None) -> int:
    """The SHARED corpus-count for dial resolution: explicit hint wins;
    otherwise one count-only scan (column-pruned to parquet metadata),
    memoized per (session, analyzed-plan semanticHash) so a pipeline that
    composes several dial-resolved operators over the SAME corpus
    (semantic_dedup + knn_graph + media_near_dup_pairs...) pays for at
    most ONE count job instead of one per operator.

    The memo is a session-lifetime cache for DIAL resolution only —
    dials need the order of magnitude, not freshness, so a re-appended
    table under an identical plan reusing a slightly stale count is by
    design (pass a hint to override). Bounded: cleared past 256 entries."""
    if hint is not None:
        return hint
    key = (
        df.sparkSession.sparkContext.applicationId,
        df._jdf.queryExecution().analyzed().semanticHash(),
    )
    n = _CORPUS_COUNT_MEMO.get(key)
    if n is None:
        n = df.count()
        if len(_CORPUS_COUNT_MEMO) > 256:
            _CORPUS_COUNT_MEMO.clear()
        _CORPUS_COUNT_MEMO[key] = n
    return n


def _resolve_planes(
    embeddings: DataFrame, n_planes: int | None, n_vectors_hint: int | None
) -> int:
    """Production default for the LSH dial: explicit value wins; otherwise
    derive from the corpus size via the shared memoized corpus_count."""
    if n_planes is not None:
        return n_planes
    return auto_planes(corpus_count(embeddings, n_vectors_hint))


def auto_planes(n_vectors: int, target_bucket: int = 256) -> int:
    """The n_planes dial as a function of corpus size: enough sign-LSH
    planes that the EXPECTED bucket population is ~`target_bucket`
    (buckets = 2^planes; per-bucket pair work is n_b², so holding n_b
    constant keeps total pair work linear in the corpus). Verified
    empirically in SCALE_NOTES — at fixed planes a 4x corpus costs ~16x;
    with planes scaled by this rule it stays ~linear. Clamped to [1, 24]
    (2^24 buckets ~ the useful ceiling before recall collapses)."""
    planes = max(1, math.ceil(math.log2(max(n_vectors, 2) / target_bucket)))
    return min(planes, 24)


def auto_centroids(n_vectors: int, target_cluster: int = 256) -> int:
    """The k_centroids dial for semantic_dedup / IVF: one centroid per
    ~`target_cluster` vectors, so per-cluster pair work stays bounded as
    the corpus grows (measured: 10x data at fixed k=8 cost 21x; with k
    scaled 10x, ~2x). At very large k, train centroids on a sample via
    `ivf_train` and persist the table partitioned by centroid_id."""
    return max(2, math.ceil(n_vectors / target_cluster))


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes.

    Public trick: md5(seed:i) first 8 hex chars -> uniform in [0,1) -> ±.
    Avoids RNG state entirely; identical planes on every executor/run.
    """
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]
        out.append(1.0 if int(h, 16) % 2 == 0 else -1.0)
    return out


def lsh_bucket_ids(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection LSH: bucket = bit-vector of sign(v·plane).

    Scan-side only (no shuffle); downstream ANN search probes the query's
    bucket (and optionally neighbors) instead of the full corpus.
    """
    # ONE F.expr for the whole bucket (round 17, guide §1.2): the Column
    # loop built n_planes x (dim literals + two HOF lambdas) driver-side
    # — hundreds of py4j round trips per invocation (~0.3 s at dim 64).
    # The string parses JVM-side in a single call and resolves to the
    # same sign-projection tree; planes are exact +-1.0 literals.
    v_sql = _as_double_sql(f"`{vec_col}`")
    terms = ["cast(0 as bigint)"]
    for p in range(n_planes):
        plane = ", ".join(
            "1.0D" if x > 0 else "-1.0D" for x in _hyperplane(dim, p)
        )
        terms.append(
            f"(case when {_dot_sql(v_sql, f'array({plane})')} >= 0 "
            f"then {2 ** p} else 0 end)"
        )
    return embeddings.withColumn("bucket", F.expr(" + ".join(terms)))


def cosine_topk_lsh(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: restrict the brute-force scan to the query's LSH bucket.

    Recall < 1.0 by construction (tested against the brute-force baseline);
    at 100 TB this turns a full-corpus scan into a single-bucket scan —
    with bucket files partitioned by `bucket`, partition pruning does it.
    """
    dim = len(query)
    qbucket = 0
    for p in range(n_planes):
        plane = _hyperplane(dim, p)
        dot = sum(float(a) * b for a, b in zip(query, plane))
        if dot >= 0:
            qbucket += 2**p
    bucketed = lsh_bucket_ids(embeddings, dim, n_planes, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbucket).drop("bucket"),
        query,
        k,
        vec_col,
        id_col,
    )


def quantize_vectors_int8(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard embedding
    compression for ANN storage (4x smaller than float32, 8x smaller
    than float64; IVF/product-quantization systems' scalar baseline).
    scale = max|x| / 127; q_i = floor(x_i / scale + 0.5) in [-127, 127]
    (floor(x + 0.5) is round-half-up — deterministic on BOTH engines,
    unlike native round's half-even/half-away split). A zero vector
    quantizes to zeros with scale 0. Dequantization is q_i * scale;
    cosine distortion at 64 dims is pinned < 1e-3 in tests.

    The emitted scale is deliberately UNROUNDED: it is the exact IEEE
    quotient max|x|/127 (identical on every engine), and consumers
    dequantize with it — a display-rounded scale would shift q_i * scale
    by up to 127 rounding-ulps per element and report 0.0 for
    tiny-magnitude vectors (a property test caught exactly that).

    Scan-local array math — no shuffle, no UDF; the output column is the
    thing a 100-TB vector store actually persists.
    """
    scale, q = quantize_exprs(_as_double(F.col(vec_col)))
    return embeddings.select(
        F.col(id_col),
        scale.alias("scale"),
        q.alias("qvec"),
    )


def quantize_exprs(v: Column) -> tuple[Column, Column]:
    """(scale, qvec) column pair for symmetric int8 quantization of a
    double-array column — shared by `quantize_vectors_int8` and the
    persisted ANN index's int8 storage mode so both quantize
    identically."""
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = maxabs / F.lit(127.0)
    q = F.when(
        maxabs > 0,
        F.transform(
            v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return scale, q


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """Reconstruct the double vector from (qvec, scale)."""
    return F.transform(qvec, lambda x: x.cast("double") * scale)


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    id_col: str | list[str] = "vec_id",
) -> DataFrame:
    """Recall of an approximate result set against the exact one — THE
    number an approximate method's dials are tuned by (ANN planes /
    nprobe / int8 storage; MinHash bands for pair sets). `id_col` may be
    a composite key (e.g. ["id_a", "id_b"] for near-dup pairs). Output
    is one row: k_exact, n_hit, recall (= |approx ∩ exact| / |exact|,
    duplicates ignored).

    The identity join runs on the two RESULT sets — the heavy work
    already happened inside the queries being compared; the pair sets a
    dedup recall audits are the post-banding survivors, never the n²
    candidate space.
    """
    keys = [id_col] if isinstance(id_col, str) else list(id_col)
    hits = approx.select(*keys).join(
        exact.select(*keys).distinct(), keys, "left_semi"
    )
    ex_n = exact.select(*keys).distinct().agg(
        F.count(F.lit(1)).alias("k_exact")
    )
    hit_n = hits.distinct().agg(F.count(F.lit(1)).alias("n_hit"))
    return ex_n.crossJoin(hit_n).select(
        "k_exact",
        "n_hit",
        F.round(
            F.col("n_hit").cast("double") / F.col("k_exact"), 6
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Product quantization (round 13): the IVF-PQ compression/search kernel —
# the standard way ANN indexes hold 100 TB of vectors in memory (Jégou et
# al. 2011, "Product Quantization for Nearest Neighbor Search"). Vectors
# split into m subvectors; each subvector is replaced by the id of its
# nearest codebook centroid (m small ints instead of dim floats — a
# 64-dim float32 vector compresses 64x at m=4/256 codes). Search scores
# compressed vectors WITHOUT decompression via the asymmetric distance
# table (query-to-centroid distances, summed by code lookup).


def pq_train_codebook(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[tuple[int, int, list[float]]], int]:
    """Deterministic PQ codebook: the `n_codes` lowest-id vectors, each
    split into `m` subvectors — the `_seed_centroids` determinism rule
    applied per subspace (no RNG; identical across runs/engines; a
    production deployment would Lloyd-refine per subspace exactly like
    `ivf_train`, on a sample). Returns ([(subspace, code_id, centroid
    subvector)], subvector_dim); the codebook is m*n_codes rows —
    control-plane sized, broadcastable at any corpus scale."""
    seeds = (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_codes)
        .select(vec_col)
        .collect()
    )
    dim = len(seeds[0][0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    book = []
    for s in range(m):
        for cid, r in enumerate(seeds):
            v = [float(x) for x in r[0]]
            book.append((s, cid, v[s * sub:(s + 1) * sub]))
    return book, sub


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance as the same left-to-right fold `_dot` uses —
    the summation order both engines reproduce."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ-encode every vector: per subspace, the nearest codebook
    centroid by squared L2 (rank = (micro-int distance, code id) — the
    engine-stable float-ranking rule). Returns one row per vector:
    (id, codes — the m code ids comma-joined in subspace order,
    err_micro — the total quantization error in 1e-6 units, the metric
    a production deployment watches to size n_codes).

    Plan shape: ONE scan explodes each vector into m subvectors, the
    codebook equi-joins on the subspace id (constant m*n_codes rows —
    broadcast hash join, not a nested loop), one (id, s) min-struct agg,
    one (id) reassembly agg. Everything linear in the corpus; nothing
    quadratic anywhere, so no dial to pin."""
    book, sub = pq_train_codebook(embeddings, m, n_codes, vec_col, id_col)
    cdf = local_values_df(
        embeddings.sparkSession,
        book, "s int, cid int, cvec array<double>"
    )
    v = _as_double(F.col(vec_col))
    subs = embeddings.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(v, s * sub + 1, sub),
            )
        ).alias("s", "svec"),
    )
    di = F.floor(_sq_l2(F.col("svec"), F.col("cvec")) * 1e6).cast("long")
    scored = subs.join(F.broadcast(cdf), "s").select(
        F.col(id_col), F.col("s"), F.col("cid"), di.alias("di")
    )
    per = scored.groupBy(id_col, "s").agg(
        F.min(F.struct("di", "cid")).alias("best")
    )
    return per.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("s", F.col("best.cid").alias("cid")))
                ),
                lambda x: x["cid"].cast("string"),
            ),
            ",",
        ).alias("codes"),
        F.sum("best.di").alias("err_micro"),
    )


def pq_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 5,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (the IVF-PQ search
    kernel): the query stays UNquantized; each encoded vector's distance
    is the sum over subspaces of the query-to-centroid distance its code
    points at. The m*n_codes distance table is computed JVM-side from
    the broadcast codebook (never in Python, so the oracle mirrors the
    exact expression tree), and scoring an encoded corpus is a code
    lookup — no vector arithmetic per candidate, which is what lets a
    1000-executor cluster hold the whole index in RAM.

    Returns (id, adc_micro, rank) for the k nearest by (micro-int ADC
    distance, id). Approximation error vs exact L2 is bounded by the
    quantization error pq_encode reports."""
    book, sub = pq_train_codebook(embeddings, m, n_codes, vec_col, id_col)
    cdf = local_values_df(
        embeddings.sparkSession,
        book, "s int, cid int, cvec array<double>"
    )
    v = _as_double(F.col(vec_col))
    subs = embeddings.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(v, s * sub + 1, sub),
            )
        ).alias("s", "svec"),
    )
    di = F.floor(_sq_l2(F.col("svec"), F.col("cvec")) * 1e6).cast("long")
    codes = (
        subs.join(F.broadcast(cdf), "s")
        .select(F.col(id_col), F.col("s"), F.col("cid"), di.alias("di"))
        .groupBy(id_col, "s")
        .agg(F.min(F.struct("di", "cid")).alias("best"))
        .select(id_col, "s", F.col("best.cid").alias("code"))
    )
    qsubs = [query[s * sub:(s + 1) * sub] for s in range(m)]
    qdf = local_values_df(
        embeddings.sparkSession,
        [(s, [float(x) for x in qs]) for s, qs in enumerate(qsubs)],
        "s int, qvec array<double>",
    )
    # the ADC table: distance of the query's subvector to every centroid
    dt = (
        cdf.join(qdf, "s")
        .select(
            "s", "cid",
            F.floor(_sq_l2(F.col("qvec"), F.col("cvec")) * 1e6)
            .cast("long").alias("dq"),
        )
    )
    adc = (
        codes.join(F.broadcast(dt), (codes["s"] == dt["s"]) & (codes["code"] == dt["cid"]))
        .groupBy(id_col)
        .agg(F.sum("dq").alias("adc_micro"))
    )
    # global top-k rides TakeOrderedAndProject (per-partition k-heaps,
    # driver merge — never a one-partition corpus sort); the rank window
    # then orders only the k survivors
    top = adc.orderBy(F.col("adc_micro").asc(), F.col(id_col).asc()).limit(k)
    # rank window input = the k survivors of TakeOrderedAndProject —
    # bounded by construction; pin the single partition explicitly so
    # the plan doesn't trip the global WindowExec alarm (VERDICT r13 #8)
    w = Window.partitionBy(bounded_partition_key(id_col)).orderBy(
        F.col("adc_micro").asc(), F.col(id_col).asc()
    )
    return top.select(
        id_col, "adc_micro", F.row_number().over(w).cast("int").alias("rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ (round 13): the complete IVFADC recipe (Jégou et al. 2011 §IV) —
# a coarse quantizer routes each vector to an inverted list, PQ encodes
# only the RESIDUAL to the list's centroid (residuals cluster far tighter
# than raw vectors, so the same code budget buys much lower quantization
# error), and search probes the nprobe nearest lists with a per-list
# asymmetric distance table. This is the index layout FAISS ships for
# billion-vector corpora and the natural 100-TB shape on Spark: the
# encoded table is partitioned by centroid_id, so a probe IS partition
# pruning, and every quantizer artifact (coarse centroids, residual
# codebook, ADC tables) is control-plane sized and broadcast.


def _ivfpq_parts(
    embeddings: DataFrame,
    k_centroids: int,
    m: int,
    n_codes: int,
    vec_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Shared IVF-PQ build: coarse assignment (micro-int argmin with a
    centroid-id tie-break — the engine-stable float-ranking rule),
    residual computation, residual-seeded PQ codebook, and the
    per-(id, subspace) best-code table. Returns (best_codes_df, book_df,
    coarse_df, sub).

    The codebook seeds are the residuals of the `n_codes` lowest-id
    vectors AFTER skipping the `k_centroids` coarse seeds: the coarse
    seeds' own residuals are exactly zero (each IS its centroid), so
    seeding from them would collapse the codebook to n_codes copies of
    the zero subvector and reduce IVFADC to bare IVF. The skip keeps the
    `_seed_centroids` determinism rule (no RNG, identical across
    runs/engines) while guaranteeing non-degenerate codes; a production
    deployment would Lloyd-refine both quantizers on a sample.

    Plan shape: ONE nested-loop broadcast of the k_centroids coarse rows
    (constant size, ratchet-asserted), a min_by argmin per vector, one
    posexplode into m subvectors, an equi-join against the m*n_codes-row
    broadcast codebook, and a min-struct agg — everything linear in the
    corpus, nothing quadratic."""
    spark = embeddings.sparkSession
    centroids = _seed_centroids(embeddings, k_centroids, vec_col, id_col)
    dim = len(centroids[0][1])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    assigned = _ivfpq_assign(embeddings, centroids, vec_col, id_col)
    seeds = (
        assigned.orderBy(F.col(id_col).asc())
        .limit(k_centroids + n_codes)
        .select("rvec")
        .collect()
    )[k_centroids:]
    if len(seeds) < n_codes:
        raise ValueError(
            f"need at least k_centroids + n_codes = {k_centroids + n_codes} "
            f"vectors to seed a non-degenerate residual codebook"
        )
    book = []
    for s in range(m):
        for cid, r in enumerate(seeds):
            rv = [float(x) for x in r["rvec"]]
            book.append((s, cid, rv[s * sub:(s + 1) * sub]))
    bdf = local_values_df(spark, book, "s int, cid int, cvec array<double>")
    cdf = local_values_df(
        spark,
        [(i, v) for i, v in centroids], "ccid int, ccvec array<double>"
    )
    best = _ivfpq_codes(assigned, bdf, sub, m, id_col)
    return best, bdf, cdf, sub


def _ivfpq_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Coarse assignment against a GIVEN (possibly frozen/persisted)
    centroid list: micro-int argmin with the centroid-id tie-break.
    Returns (id, centroid_id, rvec — the residual to the winning
    centroid). The factored form exists so the persisted index path
    (sources/ann_index.py) encodes appends with the index's frozen
    quantizers, never re-training."""
    spark = embeddings.sparkSession
    cdf = local_values_df(
        spark,
        [(i, v) for i, v in centroids], "ccid int, ccvec array<double>"
    )
    v = _as_double(F.col(vec_col))
    di = F.floor(_sq_l2(v, F.col("ccvec")) * 1e6).cast("long")
    return (
        embeddings.join(F.broadcast(cdf), F.lit(True), "inner")
        .select(
            F.col(id_col), F.col(vec_col), F.col("ccid"), F.col("ccvec"),
            di.alias("di"),
        )
        .groupBy(id_col)
        .agg(
            F.min_by(F.struct("ccid", "ccvec"), F.struct("di", "ccid"))
            .alias("bc"),
            F.first(vec_col).alias(vec_col),
        )
        .select(
            id_col,
            F.col("bc.ccid").alias("centroid_id"),
            F.zip_with(
                _as_double(F.col(vec_col)), F.col("bc.ccvec"),
                lambda x, y: x - y,
            ).alias("rvec"),
        )
    )


def _ivfpq_codes(
    assigned: DataFrame,
    bdf: DataFrame,
    sub: int,
    m: int,
    id_col: str,
) -> DataFrame:
    """PQ-encode residuals against a GIVEN codebook DataFrame: subvector
    explode, equi-join on the subspace id, micro-int min-struct agg.
    Returns one row per (id, centroid_id, s) with `best` = (di, cid)."""
    subs = assigned.select(
        F.col(id_col),
        F.col("centroid_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col("rvec"), s * sub + 1, sub),
            )
        ).alias("s", "svec"),
    )
    dpq = F.floor(_sq_l2(F.col("svec"), F.col("cvec")) * 1e6).cast("long")
    return (
        subs.join(F.broadcast(bdf), "s")
        .select(
            F.col(id_col), F.col("centroid_id"), F.col("s"), F.col("cid"),
            dpq.alias("di"),
        )
        .groupBy(id_col, "centroid_id", "s")
        .agg(F.min(F.struct("di", "cid")).alias("best"))
    )


def ivfpq_encode(
    embeddings: DataFrame,
    k_centroids: int = 8,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ encode: every vector becomes (inverted-list id, m residual
    code ids, quantization error). Because codes quantize the residual,
    err_micro here is the dial that shows WHY IVFADC beats flat PQ at
    the same code budget. Returns one row per vector: (id, centroid_id,
    codes — comma-joined in subspace order, err_micro)."""
    best, _, _, _ = _ivfpq_parts(
        embeddings, k_centroids, m, n_codes, vec_col, id_col
    )
    return best.groupBy(id_col, "centroid_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("s", F.col("best.cid").alias("cid")))
                ),
                lambda x: x["cid"].cast("string"),
            ),
            ",",
        ).alias("codes"),
        F.sum("best.di").alias("err_micro"),
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 5,
    k_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    n_codes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC search: probe the `nprobe` coarse lists nearest the query
    (micro-int rank, centroid-id tie-break), build ONE asymmetric
    distance table per probed list from the query's residual to THAT
    list's centroid (nprobe*m*n_codes rows — broadcastable at any
    scale), and score candidates by code lookup. The equi-join on
    (centroid_id, s, code) against the probe tables IS the inverted-list
    prune: vectors in unprobed lists never join, which on a
    centroid-partitioned 100-TB table is partition pruning, not a scan.

    Returns (id, adc_micro, rank) for the k nearest by (micro-int ADC
    distance, id)."""
    best, bdf, cdf, sub = _ivfpq_parts(
        embeddings, k_centroids, m, n_codes, vec_col, id_col
    )
    spark = embeddings.sparkSession
    qdf = local_values_df(
        spark,
        [([float(x) for x in query],)], "qv array<double>"
    )
    qd = F.floor(_sq_l2(F.col("qv"), F.col("ccvec")) * 1e6).cast("long")
    probes = (
        cdf.join(F.broadcast(qdf), F.lit(True), "inner")
        .select("ccid", "ccvec", "qv", qd.alias("qd"))
        .orderBy(F.col("qd").asc(), F.col("ccid").asc())
        .limit(nprobe)
    )
    dtq = F.floor(_sq_l2(F.col("qsv"), F.col("cvec")) * 1e6).cast("long")
    dt = (
        probes.select(
            F.col("ccid"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.slice(
                        F.zip_with(
                            F.col("qv"), F.col("ccvec"), lambda x, y: x - y
                        ),
                        s * sub + 1,
                        sub,
                    ),
                )
            ).alias("s", "qsv"),
        )
        .join(F.broadcast(bdf), "s")
        .select(F.col("ccid"), F.col("s"), F.col("cid"), dtq.alias("dq"))
    )
    codes = best.select(
        F.col(id_col), F.col("centroid_id"), F.col("s"),
        F.col("best.cid").alias("code"),
    )
    adc = (
        codes.join(
            F.broadcast(dt),
            (codes["centroid_id"] == dt["ccid"])
            & (codes["s"] == dt["s"])
            & (codes["code"] == dt["cid"]),
        )
        .groupBy(id_col)
        .agg(F.sum("dq").alias("adc_micro"))
    )
    # global top-k rides TakeOrderedAndProject; the rank window orders
    # only the k survivors
    top = adc.orderBy(F.col("adc_micro").asc(), F.col(id_col).asc()).limit(k)
    # rank window input = the k survivors of TakeOrderedAndProject —
    # bounded by construction; pin the single partition explicitly so
    # the plan doesn't trip the global WindowExec alarm (VERDICT r13 #8)
    w = Window.partitionBy(bounded_partition_key(id_col)).orderBy(
        F.col("adc_micro").asc(), F.col(id_col).asc()
    )
    return top.select(
        id_col, "adc_micro", F.row_number().over(w).cast("int").alias("rank")
    )
