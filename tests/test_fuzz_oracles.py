"""Differential oracle FUZZ: hypothesis-generated corpora (including the
Unicode-whitespace class that produced a real probe-tokenization bug, and
duplicate-heavy small-text spaces) staged as parquet and run through real
key/oracle pairs — proving cross-engine exactness over input
DISTRIBUTIONS, not just the fixed testdata. Deliberately few examples:
each example is a full Spark-vs-DuckDB round trip."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from crypto_data_service_loader_spark.suite import ORACLES, QUERIES
from tests.test_suite_oracle import _normalize

FUZZ_KEYS = [
    "dedup_exact",
    "ngram_lm_score",
    "split_by_content",
    "mixture_rebalance",
    "corpus_report",
    "token_count",
    # round 8: prefix-filter exact Jaccard — the unicode-whitespace WORD
    # corpus stresses the tokenizer parity and the integer threshold math
    "dedup_jaccard_prefix",
    # round 9: codec-free media keys — md5-hex payload derivation, the
    # 64-substr grid-fingerprint arithmetic, and the banded near-dup
    # join all replay over every fuzzed corpus (unicode text included)
    "media_fingerprint",
    "media_format_audit",
    "dedup_media_near",
    # round 11: the REAL BMP decode/resize round-trips — header build,
    # mapInPandas parse, nearest-neighbor selection, and the DuckDB
    # pixel-index mirrors all replay over every fuzzed corpus
    "media_decode_stats",
    "media_resize_stats",
    "media_decode_mixed",
    "media_audio_stats",
    "dedup_video_frames",
    "url_canonical_dedup",
    # round 12: the REAL PNG deflate->inflate->unfilter round trip (all
    # five PNG filters in every payload), the PNG resize + WAV resample
    # round-trips, and both ExactSubstr forms replay over every corpus
    "media_decode_png",
    "media_decode_png_mixed",
    "media_resize_png",
    "media_audio_resample",
    "dedup_exact_substrings",
    "dedup_exact_substr_staged",
    # round 13: the REAL baseline-JPEG encode->decode round trip (the
    # closed-form quantization chain must hold for EVERY md5-derived
    # block color), the mixed lossless/lossy dispatch, the span-removal
    # rebuild under the threshold-islands merge, within-doc line dedup,
    # the gzip read twin, and the full trained-BPE chain (training ties
    # and unicode-whitespace tokenization both live in the fuzz space)
    "media_decode_jpeg",
    "media_decode_jpeg_mixed",
    "dedup_substr_removal",
    "dedup_intra_doc_lines",
    "gzip_corpus_roundtrip",
    "bpe_tokenize",
    # round 13: the REAL GIF LZW compress->decompress->palette round
    # trip (variable-width codes + the closed-form palette arithmetic
    # must hold for EVERY md5-derived index stream)
    "media_decode_gif",
    "media_resize_gif",
    "media_decode_multi_format",
    "tar_corpus_members",
    "compressed_corpus_mixed",
    # round 13: blocklist join over fuzzed unicode tokens; curriculum
    # ntile + hash-position over degenerate corpora (1-row, all-equal
    # difficulty — the tie space the fixtures never generate)
    "blocklist_filter",
    "curriculum_order",
    # round 14: subsampled baseline JPEG (4:2:0 / 4:2:2) — the
    # constant-MCU closed form must hold for EVERY md5-derived color,
    # interleaved DC prediction and chroma box-mean/replication
    # included; the audit twin of the renamed blocklist key
    "media_decode_jpeg_420",
    "media_decode_jpeg_422",
    "media_decode_jpeg_progressive",
    "media_decode_png_adam7",
    "media_decode_gif_interlaced",
    "blocklist_audit",
    # round 14: the WebDataset sample-grouping contract over the same
    # fuzzed corpora (stems/exts ride md5 text, so unicode lives here)
    "tar_corpus_samples",
    # round 14: animated GIF — per-frame LZW streams + GCE delays must
    # reconstruct for EVERY md5-derived index chain; the frame-voting
    # dedup twin replays the decode + fingerprint join end-to-end
    "media_decode_gif_frames",
    "dedup_gif_frames",
    # round 15: the multimodal WebDataset flagship — tar pack/explode,
    # sample grouping, the real PNG decode, bounded gzip text, the
    # fingerprint anti self-join and the packing cumsum all replay over
    # every fuzzed corpus (content rides md5('wds'||id%100), so the
    # dedup stage bites whenever ids cross 100)
    "webdataset_pipeline",
    # round 15: the WRITE side — byte-budget shard assignment + real tar
    # round trip replay over every fuzzed corpus
    "webdataset_write_pipeline",
    # round 15: paletted(+tRNS) / 16-bit PNG decode — the palette
    # arithmetic and high-byte rescale replay for every md5 chain
    "media_decode_png_palette",
    # round 16: restart-marker JPEG — DRI/RSTn segmentation, predictor
    # resets, and the index wraparound replay for every md5 chain
    "media_decode_jpeg_restart",
    # round 16: the persisted member-offset index + byte-range fetch —
    # header-walk offsets, stem/ext rules, and the partition-pruned
    # slice replay over every fuzzed corpus (each fuzz dir builds its
    # own index keyed on the corpus epoch)
    "tar_corpus_members_indexed",
]
# NOT fuzzed here: pq_encode / sim_topk_pq / ivfpq_encode /
# sim_topk_ivfpq — their oracles hard-code the 64-dim fixture slicing;
# the hypothesis reference-equivalence tests in test_properties.py fuzz
# the PQ and IVFADC math instead.

#: words with tricky tokenizer surface: unicode whitespace (NBSP, LINE
#: SEPARATOR, NEL — the class a real round-6 bug mis-split), case,
#: punctuation, digits, empties, repeats
WORD = st.sampled_from(
    ["the", "THE", "model", "data", "x1", "2x", "a,b", "\u00e9",
     "na\u00efve", "zz", "", "\u00a0", "\u2028", "\u0085",
     "tab\there"]
)
TEXT = st.lists(WORD, min_size=0, max_size=12).map(" ".join)

CORPUS = st.lists(
    st.tuples(TEXT, st.sampled_from(["src0", "src1", "src2", "weird"])),
    min_size=1,
    max_size=14,
)

FUZZ = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "5")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture, HealthCheck.too_slow,
    ],
)


@FUZZ
@given(rows=CORPUS)
def test_fuzzed_corpus_stays_oracle_exact(spark, tmp_path_factory, rows):
    docs = pd.DataFrame({
        "doc_id": range(len(rows)),
        "text": [t for t, _ in rows],
        "lang": ["en"] * len(rows),
        "source": [s for _, s in rows],
        "n_chars": [len(t) for t, _ in rows],
    })
    d = tmp_path_factory.mktemp("fuzz")
    pq = str(d / "documents.parquet")
    spark.createDataFrame(docs).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "_stage"))
    # single-file layout like the testdata (tables.load reads the path)
    part = next(
        f for f in os.listdir(str(d / "_stage")) if f.startswith("part-")
    )
    os.replace(str(d / "_stage" / part), pq)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    for key in FUZZ_KEYS:
        sdf = QUERIES[key](spark, str(d)).toPandas()
        odf = con.execute(ORACLES[key]).fetch_arrow_table().to_pandas()
        s, o = _normalize(sdf), _normalize(odf)
        assert list(s.columns) == list(o.columns), key
        # empty results keep native dtypes (ns vs us timestamps) through
        # the stringifying _normalize — values are what matters
        pd.testing.assert_frame_equal(s, o, check_dtype=False, obj=key)


EVENT_KEYS = [
    "agg_corr",
    "events_cusum",
    "events_ols_trend",
    "events_winsorized",
    "equi_depth_histogram",
    "category_drift",
    # round 8: the rest of the events-only monitoring family
    "events_acf",
    "events_control_chart",
    "events_seasonal",
    "histogram_drift",
    "events_mad_outliers",
    "events_zscore",
    # round 9: duplicate timestamps + identical intervals stress the
    # islands tie-break; tiny user sets stress the rolling-HLL day join;
    # duplicate-ts zero-duration holdings stress the TWAP weights
    "interval_islands",
    "interval_gaps",
    "hll_rolling_distinct",
    "twap_bars",
]

#: grid-valued doubles (multiples of 0.5) spanning the histogram keys'
#: boundary bins (< 0 underflow and >= 500 overflow included), plus a
#: small time grid that produces duplicate timestamps and 1-row windows
EVENTS = st.lists(
    st.tuples(
        st.integers(0, 2),          # day
        st.integers(0, 5),          # hour
        st.sampled_from([-2.0, 0.0, 0.5, 49.5, 50.0, 250.25, 499.5,
                         500.0, 510.0]),
        st.sampled_from(["click", "view", "error"]),
    ),
    min_size=1,
    max_size=40,
)


@FUZZ
@given(rows=EVENTS)
def test_fuzzed_events_stay_oracle_exact(spark, tmp_path_factory, rows):
    import datetime as dt

    ev = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": [dt.datetime(2024, 1, 1 + d, h) for d, h, _, _ in rows],
        "user_id": [i % 5 for i in range(len(rows))],
        "event_type": [c for _, _, _, c in rows],
        "value": [v for _, _, v, _ in rows],
        "props": ["{}"] * len(rows),
    })
    d = tmp_path_factory.mktemp("fuzz_ev")
    pq = str(d / "events.parquet")
    spark.createDataFrame(ev).coalesce(1).write.mode("overwrite").parquet(
        str(d / "_stage")
    )
    part = next(
        f for f in os.listdir(str(d / "_stage")) if f.startswith("part-")
    )
    os.replace(str(d / "_stage" / part), pq)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}'")
    for key in EVENT_KEYS:
        sdf = QUERIES[key](spark, str(d)).toPandas()
        odf = con.execute(ORACLES[key]).fetch_arrow_table().to_pandas()
        s, o = _normalize(sdf), _normalize(odf)
        assert list(s.columns) == list(o.columns), key
        # empty results keep native dtypes (ns vs us timestamps) through
        # the stringifying _normalize — values are what matters
        pd.testing.assert_frame_equal(s, o, check_dtype=False, obj=key)


EMB_KEYS = [
    "sim_cosine_topk",
    "dedup_embedding_cosine",
    "vector_quantize_int8",
    # round 8: the whole cosine family — every oracle now carries the
    # zero-norm CASE guard (Spark's _cosine twin); the all-zero vector
    # in VEC is what catches a missing guard (ANSI Spark aborts on the
    # division, DuckDB emits NaN which compares GREATER than any number,
    # so thresholds/rankings diverge instead of erroring)
    "sim_cosine_topk_lsh",
    "sim_cosine_topk_ivf",
    "sim_topk_lsh_multiprobe",
    "dedup_embedding_lsh",
    "dedup_embedding_clusters",
    "semantic_dedup",
    "knn_graph_lsh",
    "ann_recall_at_k",
    # round 12: label-aware mining — varied labels (i % 3) in the
    # fixture make cross-label pairs exist; the all-zero vector still
    # stresses the zero-norm guard through both windows
    "hard_negative_mining",
    "contrastive_triplets",
]

#: grid-valued small vectors INCLUDING the all-zero vector (zero norm:
#: every cosine divides by it — Spark's div-by-zero yields NULL, DuckDB
#: yields NaN/inf unless guarded)
VEC = st.lists(
    st.sampled_from([-1.0, -0.25, 0.0, 0.25, 1.0]), min_size=4, max_size=4
)
EMBS = st.lists(VEC, min_size=2, max_size=12)


@FUZZ
@given(vecs=EMBS)
def test_fuzzed_embeddings_stay_oracle_exact(spark, tmp_path_factory, vecs):
    emb = pd.DataFrame({
        "vec_id": range(len(vecs)),
        "embedding": [[float(x) for x in v] for v in vecs],
        "label": [i % 3 for i in range(len(vecs))],
    })
    d = tmp_path_factory.mktemp("fuzz_emb")
    pq = str(d / "embeddings.parquet")
    spark.createDataFrame(emb).coalesce(1).write.mode("overwrite").parquet(
        str(d / "_stage")
    )
    part = next(
        f for f in os.listdir(str(d / "_stage")) if f.startswith("part-")
    )
    os.replace(str(d / "_stage" / part), pq)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{pq}'")
    for key in EMB_KEYS:
        sdf = QUERIES[key](spark, str(d)).toPandas()
        odf = con.execute(ORACLES[key]).fetch_arrow_table().to_pandas()
        s, o = _normalize(sdf), _normalize(odf)
        assert list(s.columns) == list(o.columns), key
        # empty results keep native dtypes (ns vs us timestamps) through
        # the stringifying _normalize — values are what matters
        pd.testing.assert_frame_equal(s, o, check_dtype=False, obj=key)


#: relational-family fuzz (round 8): lineitem/orders grids that provoke
#: the cross-engine divergence classes — duplicate keys, zero
#: quantities (ratio denominators), values landing on .5 rounding
#: boundaries at 2 dp, filter-edge discounts (the tpch_q6 BETWEEN
#: bounds), ranking ties, and grouping-set null semantics
LINE_KEYS = [
    "flagship_pricing_summary",
    "tpch_q6",
    "vwap_bars",
    "agg_percentile",
    "rolling_corr",
    "agg_rollup",
    "agg_cube",
    "unpivot_metrics",
    "topk_by_price",
    "agg_incremental_merge",
    # control-plane keys: the registry is derived deterministically from
    # lineitem+orders, so the same fixture fuzzes the status machine,
    # collect_set canonicalization, and filename sort/rollup string logic
    "file_registry_scan",
    "status_transition_case",
    "groupby_collect_set",
    "upload_status_rollup",
    "agg_min_max_filtered",
    "scalar_dates",
]

LINES = st.lists(
    st.tuples(
        st.integers(1, 6),                                  # orderkey
        st.sampled_from([0.0, 1.0, 2.5, 24.5, 49.5, 50.0]),  # quantity
        st.sampled_from([0.01, 100.005, 950.5, 104949.5]),   # extendedprice
        st.sampled_from([0.0, 0.05, 0.06, 0.07, 0.1]),       # discount
        st.sampled_from([0.0, 0.04, 0.08]),                  # tax
        st.sampled_from(["A", "N", "R"]),
        st.sampled_from(["O", "F"]),
        st.integers(0, 3),                                   # date slot
    ),
    min_size=1,
    max_size=30,
)


@FUZZ
@given(rows=LINES)
def test_fuzzed_lineitem_stays_oracle_exact(spark, tmp_path_factory, rows):
    import datetime as dt

    dates = [dt.datetime(1994, 1, 1), dt.datetime(1994, 12, 31),
             dt.datetime(1995, 1, 1), dt.datetime(1997, 6, 15)]
    li = pd.DataFrame({
        "l_orderkey": [r[0] for r in rows],
        "l_partkey": [i % 4 for i in range(len(rows))],
        "l_suppkey": [i % 3 for i in range(len(rows))],
        "l_linenumber": [i + 1 for i in range(len(rows))],
        "l_quantity": [r[1] for r in rows],
        "l_extendedprice": [r[2] for r in rows],
        "l_discount": [r[3] for r in rows],
        "l_tax": [r[4] for r in rows],
        "l_returnflag": [r[5] for r in rows],
        "l_linestatus": [r[6] for r in rows],
        "l_shipdate": [dates[r[7]] for r in rows],
    })
    od = pd.DataFrame({
        "o_orderkey": list(range(1, 7)),
        "o_custkey": [k % 3 for k in range(6)],
        "o_orderstatus": ["F", "O", "P", "F", "O", "F"],
        "o_totalprice": [0.01, 950.5, 100.005, 104949.5, 950.5, 1.0],
        "o_orderdate": [dates[k % 4] for k in range(6)],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT",
                            "5-LOW", "1-URGENT"],
    })
    d = tmp_path_factory.mktemp("fuzz_li")
    for name, pdf in (("lineitem", li), ("orders", od)):
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite").parquet(str(d / "_stage"))
        part = next(f for f in os.listdir(str(d / "_stage"))
                    if f.startswith("part-"))
        os.replace(str(d / "_stage" / part), str(d / f"{name}.parquet"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    for key in LINE_KEYS:
        sdf = QUERIES[key](spark, str(d)).toPandas()
        odf = con.execute(ORACLES[key]).fetch_arrow_table().to_pandas()
        s, o = _normalize(sdf), _normalize(odf)
        assert list(s.columns) == list(o.columns), key
        pd.testing.assert_frame_equal(s, o, check_dtype=False, obj=key)


#: TPC-H join fuzz (round 8, late): static tiny dims + the fuzzed
#: lineitem/orders flow through multi-table joins — exercises join
#: null/empty-group semantics, revenue decimal chains, EXISTS rewrites
JOIN_KEYS = [
    "tpch_q3",
    "tpch_q5",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",
    "join_broadcast_dim",
    "join_semi",
    # subquery_exists omitted: its register_views() eagerly registers
    # every table incl. events, which this fixture doesn't stage;
    # EXISTS/NOT-EXISTS coverage rides tpch_q21/q22
    "tpch_q13",
]


@FUZZ
@given(rows=LINES)
def test_fuzzed_tpch_joins_stay_oracle_exact(spark, tmp_path_factory, rows):
    import datetime as dt

    dates = [dt.datetime(1994, 1, 1), dt.datetime(1994, 12, 31),
             dt.datetime(1995, 1, 1), dt.datetime(1997, 6, 15)]
    li = pd.DataFrame({
        "l_orderkey": [r[0] for r in rows],
        "l_partkey": [i % 4 for i in range(len(rows))],
        "l_suppkey": [i % 3 for i in range(len(rows))],
        "l_linenumber": [i + 1 for i in range(len(rows))],
        "l_quantity": [r[1] for r in rows],
        "l_extendedprice": [r[2] for r in rows],
        "l_discount": [r[3] for r in rows],
        "l_tax": [r[4] for r in rows],
        "l_returnflag": [r[5] for r in rows],
        "l_linestatus": [r[6] for r in rows],
        "l_shipdate": [dates[r[7]] for r in rows],
    })
    od = pd.DataFrame({
        "o_orderkey": list(range(1, 7)),
        "o_custkey": [k % 3 for k in range(6)],
        "o_orderstatus": ["F", "O", "P", "F", "O", "F"],
        "o_totalprice": [0.01, 950.5, 100.005, 104949.5, 950.5, 1.0],
        "o_orderdate": [dates[k % 4] for k in range(6)],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT",
                            "5-LOW", "1-URGENT"],
    })
    cust = pd.DataFrame({
        "c_custkey": [0, 1, 2, 3],  # 3 never ordered; customer 0 has no name match
        "c_name": ["Customer#000000000", "Customer#000000001",
                   "Customer#000000002", "Customer#000000003"],
        "c_nationkey": [0, 1, 1, 0],
        "c_acctbal": [-5.5, 0.0, 750.25, 9999.99],
        "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING", "AUTOMOBILE"],
    })
    nat = pd.DataFrame({
        "n_nationkey": [0, 1], "n_name": ["ALPHA", "BETA"],
        "n_regionkey": [0, 0],
    })
    reg = pd.DataFrame({"r_regionkey": [0], "r_name": ["WEST"]})
    sup = pd.DataFrame({
        "s_suppkey": [0, 1, 2],
        "s_name": ["Supplier#0", "Supplier#1", "Supplier#2"],
        "s_nationkey": [0, 1, 0],
        "s_acctbal": [10.0, -3.25, 0.0],
    })
    prt = pd.DataFrame({
        "p_partkey": [0, 1, 2, 3],
        "p_name": ["small ring", "red widget", "blue bolt", "hot gear"],
        "p_brand": ["B1", "B2", "B1", "B3"],
        "p_type": ["PROMO BRUSHED", "STANDARD POLISHED",
                   "PROMO PLATED", "ECONOMY BURNISHED"],
        "p_size": [1, 14, 23, 45],
        "p_retailprice": [901.0, 902.0, 903.0, 904.0],
    })
    d = tmp_path_factory.mktemp("fuzz_tpch")
    for name, pdf in (("lineitem", li), ("orders", od), ("customer", cust),
                      ("nation", nat), ("region", reg), ("supplier", sup),
                      ("part", prt)):
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite").parquet(str(d / "_stage"))
        part = next(f for f in os.listdir(str(d / "_stage"))
                    if f.startswith("part-"))
        os.replace(str(d / "_stage" / part), str(d / f"{name}.parquet"))

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "supplier", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    for key in JOIN_KEYS:
        sdf = QUERIES[key](spark, str(d)).toPandas()
        odf = con.execute(ORACLES[key]).fetch_arrow_table().to_pandas()
        s, o = _normalize(sdf), _normalize(odf)
        assert list(s.columns) == list(o.columns), key
        pd.testing.assert_frame_equal(s, o, check_dtype=False, obj=key)


# ---------------------------------------------------------------------------
# Sixth fuzz family (round 9): sketch PROBE frames — the fold-back class
# two r8 ADVICE items lived in (duplicate probes collapsing, reserved-name
# collisions, null keys). Small w forces hash collisions on purpose.
# ---------------------------------------------------------------------------

_SKETCH_KEY = st.sampled_from(
    ["a", "A", "", " ", "key|with|pipes", "0", "None", "naïve",
     "dup", "dup2", " ", "tab\there"]
)
_BUILD_VALS = st.lists(_SKETCH_KEY, min_size=0, max_size=30)
_PROBE_VALS = st.lists(
    st.one_of(_SKETCH_KEY, st.none()), min_size=1, max_size=15
)


@FUZZ
@given(build=_BUILD_VALS, probes=_PROBE_VALS)
def test_fuzzed_sketch_probes_hold_contracts(spark, build, probes):
    from collections import Counter

    from crypto_data_service_loader_spark.operators import sketch

    bdf = spark.createDataFrame(
        [(v,) for v in build], "k string"
    ) if build else spark.createDataFrame([], "k string")
    pdf = spark.createDataFrame([(v,) for v in probes], "k string")
    truth = Counter(build)

    # count-min: every probe row returns (duplicates 1:1), est >= truth,
    # null keys estimate 0, and merged halves answer EXACTLY like the
    # whole build (cell-wise sum equality carries to every lookup)
    d, w = 3, 16  # tiny w: force collisions
    cm = sketch.countmin_build(bdf, "k", d=d, w=w)
    got = sketch.countmin_lookup(cm, pdf, "k", d=d, w=w).collect()
    assert len(got) == len(probes)
    assert Counter(r["k"] for r in got) == Counter(probes)
    by_key = {}
    for r in got:
        by_key.setdefault(r["k"], set()).add(r["est_count"])
    for key, ests in by_key.items():
        assert len(ests) == 1  # duplicate probes agree
        est = next(iter(ests))
        if key is None:
            assert est == 0
        else:
            assert est >= truth[key]

    halves = [
        spark.createDataFrame(
            [(v,) for v in build[i::2]], "k string"
        ) for i in (0, 1)
    ]
    merged = sketch.countmin_merge(
        [sketch.countmin_build(h, "k", d=d, w=w) for h in halves]
    )
    got_m = {
        (r["k"], r["est_count"])
        for r in sketch.countmin_lookup(merged, pdf, "k", d=d, w=w).collect()
    }
    assert got_m == {(r["k"], r["est_count"]) for r in got}

    # bloom: no false negatives, null keys never member, duplicates 1:1
    bl = sketch.bloom_build(bdf, "k", n_words=4, k=3)
    flags = sketch.bloom_probe(bl, pdf, "k", n_words=4, k=3).collect()
    assert len(flags) == len(probes)
    for r in flags:
        if r["k"] is None:
            assert not r["in_bloom"]
        elif truth[r["k"]] > 0:
            assert r["in_bloom"]  # no false negatives, ever


# Seventh fuzz family (round 15, VERDICT r14 #8): the histogram-ntile
# phase cut. The distributed plan (counts-not-rows prefix sums, bucketed
# tie rank, integer-DIV tile formula) has exactly the boundary surface
# fuzz catches before the gate does: n % k transitions, constant and
# two-value degenerate difficulty distributions, NULL difficulties
# (nulls-first), negative values through the coarse floor-bucket, and
# tie groups spanning many id-range buckets (bucket size pinned small).
NTILE_DIFFS = st.lists(
    st.one_of(st.none(), st.integers(-3, 3)), min_size=1, max_size=60
)


@FUZZ
@given(
    diffs=NTILE_DIFFS,
    k=st.integers(min_value=1, max_value=7),
    bucket=st.sampled_from([1, 3, 7, 1 << 20]),
)
def test_fuzzed_histogram_ntile_matches_duckdb(spark, diffs, k, bucket):
    from crypto_data_service_loader_spark.operators import training as TR

    rows = [(i * 5 + 2, d) for i, d in enumerate(diffs)]  # sparse ids
    old = TR._RANK_BUCKET_DOCS
    TR._RANK_BUCKET_DOCS = bucket
    try:
        docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
        got = {
            r["doc_id"]: r["phase"]
            for r in TR.curriculum_phases(docs, n_phases=k).collect()
        }
    finally:
        TR._RANK_BUCKET_DOCS = old
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT doc_id, ntile({int(k)}) OVER "
            "(ORDER BY d NULLS FIRST, doc_id) FROM t"
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Family 8 (round 16, VERDICT r15 #9): the WebDataset WRITE side —
# random member-name sets (degenerate stems included), byte budgets
# 1 / 2048 / 2^20, sparse ids. The shard ASSIGNMENT must equal the
# DuckDB integer-cumsum oracle (the exact `shard*2^32 + cum DIV budget`
# formula the streaming twins #25/#26 also pin), and every emitted
# shard must round-trip through STDLIB tarfile with exactly its
# assigned members, byte-identical, in the writer's sorted-name order.
# ---------------------------------------------------------------------------

WDS_NAMES = st.sampled_from([
    "a.txt", "b.json", ".hidden", "foo.", "plain", "dir/y.seg.json",
    "000001.txt", "z" * 40 + ".bin", "x.tar.gz", "trail.",
])


@FUZZ
@given(
    data=st.data(),
    budget=st.sampled_from([1, 2048, 1 << 20]),
    shard_docs=st.sampled_from([4, 1 << 20]),
)
def test_fuzzed_webdataset_write_matches_tarfile_and_cumsum(
    spark, data, budget, shard_docs
):
    import io
    import tarfile

    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators.training import (
        pack_sequences,
    )
    from crypto_data_service_loader_spark.sources.tar_blobs import (
        encode_tar_shards,
    )

    n_docs = data.draw(st.integers(1, 8))
    docs = []
    for i in range(n_docs):
        doc_id = i * 3 + 1  # sparse ids
        names = data.draw(st.lists(WDS_NAMES, min_size=1, max_size=3,
                                   unique=True))
        members = []
        for j, name in enumerate(names):
            size = data.draw(st.integers(0, 600))
            members.append((name, bytes([(doc_id * 7 + j) % 256]) * size))
        docs.append((doc_id, members))

    member_rows = [
        (doc_id, name, bytearray(content), len(content))
        for doc_id, members in docs
        for name, content in members
    ]
    mdf = spark.createDataFrame(
        member_rows,
        "doc_id long, member_name string, content binary, n_bytes int",
    )
    sized = mdf.groupBy("doc_id").agg(
        F.sum("n_bytes").cast("long").alias("n_bytes"))
    packed = pack_sequences(
        sized, budget=budget, tokens_col="n_bytes", id_col="doc_id",
        shard_docs=shard_docs,
    ).select("doc_id", F.col("bin_id").alias("shard_id"))
    got_assign = {r["doc_id"]: r["shard_id"] for r in packed.collect()}

    # DuckDB integer-cumsum oracle of the assignment formula
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, n BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(d, sum(len(c) for _, c in m)) for d, m in docs],
    )
    want_assign = dict(con.execute(f"""
        SELECT doc_id,
               (doc_id // {shard_docs}) * 4294967296 +
               COALESCE(SUM(n) OVER (
                   PARTITION BY doc_id // {shard_docs} ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // {budget}
        FROM t""").fetchall())
    assert got_assign == want_assign

    # framing: every emitted shard round-trips through stdlib tarfile
    # with exactly its assigned members, sorted by name, byte-identical
    shards = encode_tar_shards(
        mdf.join(packed, "doc_id").select("shard_id", "member_name",
                                          "content"),
        id_col="shard_id",
    ).collect()
    want_members: dict = {}
    for doc_id, members in docs:
        want_members.setdefault(got_assign[doc_id], []).extend(members)
    assert {r["shard_id"] for r in shards} == set(want_members)
    for r in shards:
        with tarfile.open(fileobj=io.BytesIO(bytes(r["payload"]))) as tf:
            got = [(m.name, tf.extractfile(m).read())
                   for m in tf.getmembers()]
        # two docs in one shard may carry the SAME member name with
        # different content — the writer's name sort is stable on
        # arrival order there, so compare the (name, content) multiset
        # exactly and the name ordering separately
        assert sorted(got) == sorted(want_members[r["shard_id"]])
        names = [n for n, _ in got]
        assert names == sorted(names)
