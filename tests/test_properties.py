"""Property-based tests (hypothesis) — SURVEY.md §5: state-machine
invariants (statuses only move forward, no file both FINISHED and ERROR),
as-of join vs pandas merge_asof on random series, and the CSV validation
predicate vs its Python definition."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators.asof import asof_join
from crypto_data_service_loader_spark.operators.registry import transition_statuses
from crypto_data_service_loader_spark.schemas import REGISTRY, STATUSES
from crypto_data_service_loader_spark.sources.csv_ingest import line_is_valid

TODAY = datetime.date(2024, 3, 14)
SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

registry_rows = st.lists(
    st.tuples(
        st.integers(-5, 2),  # create_date offset from TODAY (incl. future)
        st.sampled_from(STATUSES),
    ),
    min_size=1,
    max_size=30,
)


@SLOW
@given(rows=registry_rows)
def test_status_transitions_forward_only(spark, rows):
    # enumerate -> unique filenames (filename is the registry key)
    data = [
        (f"f{i}", TODAY + datetime.timedelta(days=off), status)
        for i, (off, status) in enumerate(rows)
    ]
    reg = spark.createDataFrame(data, REGISTRY)
    out = transition_statuses(reg, str(TODAY)).collect()
    order = {s: i for i, s in enumerate(STATUSES)}
    by_name = {(r["filename"], str(r["create_date"])): r["status"] for r in out}
    for name, date, old in data:
        new = by_name[(name, str(date))]
        # never backward, never into ERROR, terminal states never leave
        assert order[new] >= order[old] or new == old
        if old in ("FINISHED", "ERROR", "IN_PROGRESS", "READY_FOR_PROCESSING"):
            assert new == old
        if old == "DISCOVERED" and date > TODAY:
            assert new == "DISCOVERED"  # future files never advance
        assert not (old != "ERROR" and new == "ERROR")  # only uploads set ERROR


@SLOW
@given(
    quotes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.floats(1, 100)),
        min_size=0, max_size=25, unique_by=lambda q: (q[0], q[1]),
    ),
    trades=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1, max_size=25, unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_asof_join_matches_merge_asof(spark, quotes, trades):
    base = datetime.datetime(2024, 1, 1)
    qrows = [(k, base + datetime.timedelta(seconds=s), round(v, 3)) for k, s, v in quotes]
    trows = [(i, k, base + datetime.timedelta(seconds=s)) for i, (k, s) in enumerate(trades)]
    l = spark.createDataFrame(trows, "trade_id long, k int, ts timestamp")
    r = spark.createDataFrame(qrows, "k int, ts timestamp, px double") if qrows else (
        spark.createDataFrame([], "k int, ts timestamp, px double"))
    got = {
        row["trade_id"]: row["px_asof"]
        for row in asof_join(l, r, ["k"], "ts", "ts", ["px"]).collect()
    }
    lp = pd.DataFrame(trows, columns=["trade_id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(qrows, columns=["k", "ts", "px"]).sort_values("ts")
    rp["ts"] = pd.to_datetime(rp["ts"])  # empty frame needs explicit dtypes
    rp["k"] = rp["k"].astype("int64")
    lp["k"] = lp["k"].astype("int64")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    for t, p in zip(exp["trade_id"], exp["px"]):
        expected = None if pd.isna(p) else p
        assert got[int(t)] == expected

    got_f = {
        row["trade_id"]: row["px_asof"]
        for row in asof_join(
            l, r, ["k"], "ts", "ts", ["px"], direction="forward"
        ).collect()
    }
    exp_f = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    for t, p in zip(exp_f["trade_id"], exp_f["px"]):
        expected = None if pd.isna(p) else p
        assert got_f[int(t)] == expected

    got_n = {
        row["trade_id"]: row["px_asof"]
        for row in asof_join(
            l, r, ["k"], "ts", "ts", ["px"], direction="nearest"
        ).collect()
    }
    exp_n = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    for t, p in zip(exp_n["trade_id"], exp_n["px"]):
        expected = None if pd.isna(p) else p
        assert got_n[int(t)] == expected


@SLOW
@given(
    lines=st.lists(
        st.text(
            alphabet=st.sampled_from(list("abc,123")), min_size=0, max_size=40
        ),
        min_size=1, max_size=50,
    )
)
def test_csv_validation_predicate_matches_python(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    got = [r["ok"] for r in df.select(line_is_valid(F.col("line")).alias("ok")).collect()]
    # Spark split(limit=-1) keeps trailing empties -> Python str.split(',')
    exp = [len(l.split(",")) == 9 for l in lines]
    assert got == exp


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab c")), min_size=0, max_size=60),
        min_size=1, max_size=12,
    )
)
def test_exact_dedup_partitions_by_normalized_text(spark, texts):
    from crypto_data_service_loader_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = exact_dedup(docs).collect()
    # invariants: group sizes sum to n; canonical id is a real doc id;
    # same normalized text -> same group
    assert sum(r["n_docs"] for r in out) == len(texts)
    norm = lambda t: " ".join(t.lower().strip().split())
    n_groups = len({norm(t) for t in texts})
    assert len(out) == n_groups


def test_stratified_sample_proportions_and_determinism(spark):
    from crypto_data_service_loader_spark.operators.relational import (
        sample_stratified,
    )

    n = 4000
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, "a").otherwise("b").alias("stratum"),
    )
    fractions = {"a": 0.8, "b": 0.1}
    s1 = sample_stratified(df, "stratum", fractions, seed=7, id_col="id")
    s2 = sample_stratified(df, "stratum", fractions, seed=7, id_col="id")
    rows1 = sorted(r["id"] for r in s1.collect())
    rows2 = sorted(r["id"] for r in s2.collect())
    assert rows1 == rows2  # same seed -> identical sample
    s3 = sample_stratified(df, "stratum", fractions, seed=8, id_col="id")
    rows3 = sorted(r["id"] for r in s3.collect())
    assert rows1 != rows3  # different seed -> different draw
    counts = {r["stratum"]: r["n"] for r in
              s1.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    # hash-gate spread: n_a=1000 p=.8; n_b=3000 p=.1 (binomial-like bounds)
    assert abs(counts["a"] - 800) < 65
    assert abs(counts["b"] - 300) < 85


# --------------------------------------------------------------------------
# round-4 session-3 operator invariants
# --------------------------------------------------------------------------

doc_texts = st.lists(
    st.text(alphabet="ab cd", min_size=1, max_size=60), min_size=1, max_size=12
)


@SLOW
@given(texts=doc_texts)
def test_containment_bounds_and_dominates_jaccard(spark, texts):
    """For every pair: 0 <= jaccard <= min(containment_a, containment_b)
    <= max(...) <= 1 — containment is jaccard's upper bound by definition
    (|A∩B|/|A| >= |A∩B|/|A∪B|). Pairs restricted to docs with shingles."""
    from crypto_data_service_loader_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    with_sh = [
        i for i, t in enumerate(texts) if len(t.split()) >= 3
    ]
    if len(with_sh) < 2:
        return
    pairs = spark.createDataFrame(
        [(with_sh[0], with_sh[1])], "id_a long, id_b long"
    )
    j = dedup.ngram_jaccard(docs, pairs).collect()[0]["jaccard"]
    c = dedup.ngram_containment(docs, pairs).collect()[0]
    ca, cb = c["containment_a"], c["containment_b"]
    assert 0.0 <= j <= min(ca, cb) + 1e-9
    assert max(ca, cb) <= 1.0


@SLOW
@given(
    shift=st.floats(-100, 100, allow_nan=False),
    scale=st.floats(0.5, 10, allow_nan=False),
)
def test_zscore_invariant_under_affine_transform(spark, shift, scale):
    """z-scores are invariant under y = a*x + b (a > 0): the outlier set
    must not change when the series is shifted/scaled."""
    from crypto_data_service_loader_spark.operators import relational as rel

    base = [(i, "t", 10.0 + (i % 7) + (25.0 if i == 13 else 0.0))
            for i in range(40)]
    ev = spark.createDataFrame(base, "event_id long, event_type string, value double")
    ev2 = ev.withColumn("value", F.col("value") * float(scale) + float(shift))
    z1 = {r["event_id"]: r["is_outlier"]
          for r in rel.zscore_outliers(ev).collect()}
    z2 = {r["event_id"]: r["is_outlier"]
          for r in rel.zscore_outliers(ev2).collect()}
    assert z1 == z2
    assert z1[13] is True  # the planted spike is flagged


@SLOW
@given(extra=st.integers(0, 3))
def test_funnel_stage_monotone_in_events(spark, extra):
    """Adding MORE events to a user can never LOWER their funnel stage."""
    from crypto_data_service_loader_spark.operators import relational as rel

    base = [
        (1, "view", datetime.datetime(2024, 1, 1, 0, 1)),
        (2, "click", datetime.datetime(2024, 1, 1, 0, 2)),
    ]
    added = [
        (10 + i, t, datetime.datetime(2024, 1, 1, 0, 3 + i))
        for i, t in enumerate(["purchase", "view", "click"][:extra])
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(eid, 1, ty, ts) for eid, ty, ts in rows],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    s0 = rel.funnel(mk(base)).collect()[0]["funnel_stage"]
    s1 = rel.funnel(mk(base + added)).collect()[0]["funnel_stage"]
    assert s1 >= s0


@SLOW
@given(freq=st.integers(1, 3))
def test_boilerplate_removal_is_idempotent(spark, freq):
    """Removing boilerplate from an already-cleaned corpus removes nothing:
    surviving lines keep ALL their occurrences in pass 1 (their corpus
    frequency was already <= max_doc_freq), so pass 2 sees the same
    frequencies and drops zero lines."""
    from crypto_data_service_loader_spark.operators import dedup

    hdr = "shared header line"
    docs = spark.createDataFrame(
        [(i, f"{hdr}\nbody {i} alpha\nbody {i} beta") for i in range(5)]
        + [(10, "unique one\nunique two")],
        "doc_id long, text string",
    )
    once = dedup.remove_boilerplate_lines(docs, max_doc_freq=freq)
    again = dedup.remove_boilerplate_lines(
        once.select("doc_id", F.col("text_clean").alias("text")),
        max_doc_freq=freq,
    )
    pass1 = {r["doc_id"]: r["text_clean"] for r in once.collect()}
    pass2 = {r["doc_id"]: r["text_clean"] for r in again.collect()}
    assert pass1 == pass2
    removed_again = sum(r["n_removed"] for r in again.collect())
    assert removed_again == 0


@SLOW
@given(budget=st.integers(1, 400))
def test_token_budget_fill_keeps_a_per_group_prefix(spark, budget):
    """The kept set is always an id-ordered PREFIX of each group (never a
    gap), and every kept doc's pre-total is under budget."""
    from crypto_data_service_loader_spark.operators import training

    docs = spark.createDataFrame(
        [(i, "ab"[i % 2], 10 + (i * 37) % 90) for i in range(20)],
        "doc_id long, source string, n_chars long",
    )
    kept = training.token_budget_fill(docs, budget=budget).collect()
    assert all(r["cum_before"] < budget for r in kept)
    by_group: dict = {}
    for r in kept:
        by_group.setdefault(r["source"], []).append(r["doc_id"])
    all_ids = {g: sorted(r["doc_id"] for r in docs.collect()
                         if r["source"] == g) for g in ("a", "b")}
    for g, ids in by_group.items():
        ids = sorted(ids)
        assert ids == all_ids[g][: len(ids)]  # an exact prefix


def test_stratified_sample_edge_ids_and_empty_fractions(spark):
    """ADVICE r5: the gate must be int64-safe for ANY long id (pmod
    pre-reduction — no wrap-to-negative buckets), fraction 0 must exclude
    every row including huge/negative ids, and an empty fractions dict
    selects nothing instead of raising."""
    from crypto_data_service_loader_spark.operators.relational import (
        sample_stratified,
    )

    rows = [(2**62, "a"), (2**33 + 7, "a"), (-5, "a"),
            (2**62 - 1, "b"), (-(2**40), "b"), (123, "b")]
    df = spark.createDataFrame(rows, "id long, stratum string")
    # fraction 0 -> empty, even for ids that used to wrap negative
    assert sample_stratified(
        df, "stratum", {"a": 0.0, "b": 0.0}, id_col="id"
    ).count() == 0
    # fraction 1 -> everything, and reruns are identical
    s1 = sample_stratified(df, "stratum", {"a": 1.0, "b": 1.0}, id_col="id")
    assert sorted(r["id"] for r in s1.collect()) == sorted(r[0] for r in rows)
    mixed = sample_stratified(df, "stratum", {"a": 0.5, "b": 0.5}, id_col="id")
    assert sorted(r["id"] for r in mixed.collect()) == \
        sorted(r["id"] for r in mixed.collect())
    # empty fractions: no rows, schema preserved, no AttributeError
    empty = sample_stratified(df, "stratum", {}, id_col="id")
    assert empty.count() == 0
    assert empty.columns == df.columns


def test_sample_reservoir_fixed_size_and_stability(spark):
    """Exactly min(k, group size) rows per group; a grown corpus keeps a
    deterministic (possibly displaced) sample; different seeds differ."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators.relational import (
        sample_reservoir,
    )

    df = spark.range(300).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = sample_reservoir(df, "g", k=7, seed=1, id_col="id")
    sizes = {r["g"]: r["n"] for r in
             out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"0": 7, "1": 7, "2": 7}
    # rerun-stable
    ids1 = sorted(r["id"] for r in out.collect())
    ids2 = sorted(r["id"] for r in
                  sample_reservoir(df, "g", k=7, seed=1, id_col="id").collect())
    assert ids1 == ids2
    # seed changes the draw
    ids3 = sorted(r["id"] for r in
                  sample_reservoir(df, "g", k=7, seed=2, id_col="id").collect())
    assert ids1 != ids3
    # undersized group: keeps everything
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, g string")
    assert sample_reservoir(tiny, "g", k=7, id_col="id").count() == 2


@SLOW
@given(
    vec=st.lists(
        st.floats(-100.0, 100.0, allow_nan=False, allow_infinity=False,
                  width=32),
        min_size=2, max_size=16,
    )
)
def test_int8_quantization_error_bound(spark, vec):
    """Per-element reconstruction error of symmetric int8 quantization is
    bounded by scale/2 (round-half-up property) for every random vector,
    and quantized magnitudes never exceed 127."""
    from crypto_data_service_loader_spark.operators.similarity import (
        quantize_vectors_int8,
    )

    df = spark.createDataFrame(
        [(0, [float(x) for x in vec])], "vec_id long, embedding array<float>"
    )
    r = quantize_vectors_int8(df).collect()[0]
    scale, q = r["scale"], r["qvec"]
    assert max(abs(x) for x in q) <= 127
    if scale == 0.0:
        assert all(x == 0 for x in q)
        return
    # compare against the float32 values Spark actually read
    read = [float(x) for x in df.collect()[0]["embedding"]]
    for x, qi in zip(read, q):
        assert abs(x - qi * scale) <= scale / 2 + 1e-9


@SLOW
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=40,
    ),
    q=st.floats(0.0, 1.0),
)
def test_exact_quantiles_match_numpy_percentile(spark, vals, q):
    """The distributed frequency-table quantile equals numpy's linear
    (percentile_cont) interpolation for random data and random q."""
    import numpy as np

    from crypto_data_service_loader_spark.operators.profile import (
        exact_quantiles,
    )

    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "k string, v double"
    )
    got = exact_quantiles(df, "k", "v", {"qq": q}).collect()[0]["qq"]
    want = float(np.percentile(vals, q * 100, method="linear"))
    assert got == pytest.approx(round(want, 6), abs=2e-6)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    color=st.sampled_from([0, 2, 4, 6]),
    data=st.data(),
)
def test_png_roundtrip_any_size_filters_colortype(w, h, color, data):
    """PNG encode/decode is an exact round trip for EVERY size, filter
    assignment, and color type: the decoded channel sums equal the
    source bytes' sums under each type's channel rule (gray expands to
    three equal sums, RGBA drops alpha). Pure-Python property — no
    Spark session, so it runs wide."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    n = w * h * bpp
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    filters = data.draw(st.lists(
        st.integers(0, 4), min_size=h, max_size=h))
    png = M._encode_png(px, w, h, filters=filters, color=color)
    got = M._decode_png(png)
    if color == 0:
        s = sum(px)
        want = (w, h, w * h, s, s, s)
    elif color == 2:
        want = (w, h, w * h,
                sum(px[2::3]), sum(px[1::3]), sum(px[0::3]))
    elif color == 4:  # gray+alpha: alpha dropped, gray expands
        s = sum(px[0::2])
        want = (w, h, w * h, s, s, s)
    else:
        want = (w, h, w * h,
                sum(px[2::4]), sum(px[1::4]), sum(px[0::4]))
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    channels=st.integers(1, 3),
    rate=st.sampled_from([1000, 8000, 44100]),
    out_rate=st.sampled_from([500, 2000, 8000, 16000]),
    data=st.data(),
)
def test_wav_roundtrip_and_resample_property(channels, rate, out_rate, data):
    """WAV encode/decode round-trips exactly for any channel count and
    sample values, and nearest-frame resampling keeps exactly the frames
    (arange(n_out)*n_in)//n_out — channels never de-interleave. Pure
    Python, no Spark session."""
    import struct

    from crypto_data_service_loader_spark.operators import multimodal as M

    n_frames = data.draw(st.integers(1, 12))
    samples = data.draw(st.lists(
        st.integers(-32768, 32767),
        min_size=n_frames * channels, max_size=n_frames * channels))
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(samples) * 2) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * channels * 2, channels * 2, 16)
        + b"data" + struct.pack("<I", len(samples) * 2)
        + b"".join(struct.pack("<h", s) for s in samples)
    )
    got = M._decode_wav16(payload)
    assert got == (channels, rate, len(samples), sum(samples),
                   min(samples), max(samples),
                   sum(s * s for s in samples))
    out = M._resample_wav16(payload, out_rate)
    n_out = n_frames * out_rate // rate
    if n_out <= 0:
        assert out is None
        return
    frames = [samples[i * channels:(i + 1) * channels]
              for i in range(n_frames)]
    kept = [s for i in range(n_out)
            for s in frames[(i * n_frames) // n_out]]
    assert M._decode_wav16(out) == (
        channels, out_rate, len(kept), sum(kept), min(kept), max(kept),
        sum(s * s for s in kept))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(data=st.data())
def test_exact_substring_spans_matches_bruteforce(spark, data):
    """exact_substring_spans equals a brute-force Python reference on
    random corpora built from a tiny alphabet (so duplicated windows are
    COMMON): every maximal duplicated span, within-doc repeats included,
    with exact boundaries."""
    from crypto_data_service_loader_spark.operators import dedup

    L = 6  # small window so tiny docs still produce spans
    texts = data.draw(st.lists(
        st.text(alphabet="abc", min_size=0, max_size=24),
        min_size=1, max_size=6))
    # brute force: corpus-wide window frequency, then islands per doc
    from collections import Counter

    freq = Counter()
    for t in texts:
        for i in range(len(t) - L + 1):
            freq[t[i:i + L]] += 1
    # islands close when the gap reaches L: closer duplicated windows
    # cover overlapping characters, so spans stay maximal AND disjoint
    want = set()
    for did, t in enumerate(texts):
        dup_pos = [i for i in range(len(t) - L + 1)
                   if freq[t[i:i + L]] > 1]
        run = []
        for i in dup_pos + [None]:
            if run and (i is None or i - run[-1] >= L):
                want.add((did, run[0] + 1, run[-1] + L - run[0],
                          len(run)))
                run = []
            if i is not None:
                run.append(i)
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_windows"])
        for r in dedup.exact_substring_spans(docs, min_len=L).collect()
    }
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    mw=st.integers(1, 3),
    mh=st.integers(1, 2),
    gray=st.booleans(),
    restart=st.sampled_from([0, 1, 2]),
    data=st.data(),
)
def test_jpeg_constant_block_closed_form(mw, mh, gray, restart, data):
    """Baseline JPEG encode/decode reconstructs constant-per-8x8-block
    images EXACTLY by the closed form the gate oracles mirror: with the
    flat q=16 tables only the DC survives quantization, and each YCbCr
    channel comes back as min(v + v%2, 255). Any block-grid size, color
    or grayscale, with or without restart markers (DC prediction resets
    at every RSTn). Pure Python, no Spark session."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    w, h = mw * 8, mh * 8
    nch = 1 if gray else 3
    colors = [
        data.draw(st.lists(st.integers(0, 255), min_size=nch, max_size=nch))
        for _ in range(mw * mh)
    ]
    img = np.zeros((h, w, nch), np.uint8)
    for i, c in enumerate(colors):
        by, bx = divmod(i, mw)
        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = c
    jp = M._encode_jpeg(
        img.tobytes(), w, h, gray=gray, restart_interval=restart
    )
    parsed = M._parse_jpeg(jp)
    assert parsed is not None
    pw, ph, rgb = parsed
    assert (pw, ph) == (w, h)
    dec = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)

    def q16(v):
        return min(int(v) + int(v) % 2, 255)

    for i, c in enumerate(colors):
        by, bx = divmod(i, mw)
        blk = dec[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
        if gray:
            want = (q16(c[0]),) * 3
        else:
            import numpy as _np

            y, cb, cr = M._rgb_to_ycbcr_int(
                _np.int64(c[0]), _np.int64(c[1]), _np.int64(c[2])
            )
            er, eg, eb = M._ycbcr_to_rgb_int(
                _np.int64(q16(y)), _np.int64(q16(cb)), _np.int64(q16(cr))
            )
            want = (int(er), int(eg), int(eb))
        assert (blk[:, :, 0] == want[0]).all()
        assert (blk[:, :, 1] == want[1]).all()
        assert (blk[:, :, 2] == want[2]).all()


@settings(max_examples=30, deadline=None)
@given(
    w=st.sampled_from([5, 8, 10, 16]),
    h=st.sampled_from([6, 8, 9]),
    restart=st.sampled_from([0, 2]),
    data=st.data(),
)
def test_jpeg_roundtrip_tolerance_any_image(w, h, restart, data):
    """Arbitrary (non-constant) images survive the JPEG round trip
    within the quantization error budget: with q=1 tables the DCT round
    trip is near-lossless (|err| <= 6 incl. the two fixed-point color
    conversions); non-multiple-of-8 sizes pad by edge replication and
    crop back to the exact requested dimensions."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    n = w * h * 3
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    q1 = [1] * 64
    jp = M._encode_jpeg(px, w, h, quant_y=q1, quant_c=q1,
                        restart_interval=restart)
    parsed = M._parse_jpeg(jp)
    assert parsed is not None
    pw, ph, rgb = parsed
    assert (pw, ph) == (w, h)
    src = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
    dec = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(dec - src).max() <= 6


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(data=st.data())
def test_pq_matches_python_reference(spark, data):
    """PQ encode + ADC top-k equal a pure-Python reference on random
    grid-valued vectors (the all-zero vector included — L2 needs no norm
    guard, but zero distances stress the (di, cid) tie-break): same
    deterministic codebook rule, same micro-int floor, same ordering.
    Fuzzes the PQ math the oracle fuzzer can't (its SQL twins hard-code
    the 64-dim fixture slicing)."""
    import math

    from crypto_data_service_loader_spark.operators import similarity

    m = data.draw(st.sampled_from([1, 2, 4]))
    sub = data.draw(st.sampled_from([1, 2]))
    dim = m * sub
    n = data.draw(st.integers(2, 9))
    n_codes = data.draw(st.integers(2, 4))
    vecs = {
        i: data.draw(st.lists(
            st.sampled_from([-1.0, -0.25, 0.0, 0.25, 1.0]),
            min_size=dim, max_size=dim))
        for i in range(n)
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    nc = min(n_codes, n)
    book = {(s, c): vecs[c][s * sub:(s + 1) * sub]
            for s in range(m) for c in range(nc)}

    def d_micro(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return math.floor(acc * 1e6)

    codes, errs = {}, {}
    for i, v in vecs.items():
        cs, e = [], 0
        for s in range(m):
            sv = v[s * sub:(s + 1) * sub]
            c = min(range(nc), key=lambda c: (d_micro(sv, book[(s, c)]), c))
            cs.append(str(c))
            e += d_micro(sv, book[(s, c)])
        codes[i] = ",".join(cs)
        errs[i] = e
    got = {r["vec_id"]: r for r in
           similarity.pq_encode(emb, m=m, n_codes=n_codes).collect()}
    assert {i: (r["codes"], r["err_micro"]) for i, r in got.items()} == {
        i: (codes[i], errs[i]) for i in vecs
    }

    query = vecs[data.draw(st.integers(0, n - 1))]
    scores = {}
    for i in vecs:
        total = 0
        for s, c in enumerate(int(x) for x in codes[i].split(",")):
            total += d_micro(query[s * sub:(s + 1) * sub], book[(s, c)])
        scores[i] = total
    k = 3
    want = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    topk = [(r["vec_id"], r["adc_micro"]) for r in
            similarity.pq_topk(emb, query, k=k, m=m, n_codes=n_codes)
            .orderBy("rank").collect()]
    assert topk == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(data=st.data())
def test_ivfpq_matches_python_reference(spark, data):
    """IVF-PQ encode + IVFADC search equal a pure-Python reference on
    random grid-valued vectors: same micro-int coarse argmin with the
    centroid-id tie-break, same residual arithmetic, same skip-the-
    coarse-seeds codebook rule, same per-probed-list ADC tables. Fuzzes
    the full IVFADC pipeline the oracle fuzzer can't (its SQL twin
    hard-codes the 64-dim fixture slicing)."""
    import math

    from crypto_data_service_loader_spark.operators import similarity

    m = data.draw(st.sampled_from([1, 2]))
    sub = data.draw(st.sampled_from([1, 2]))
    dim = m * sub
    kc = data.draw(st.integers(2, 3))
    n_codes = data.draw(st.integers(2, 3))
    nprobe = data.draw(st.integers(1, kc))
    n = data.draw(st.integers(kc + n_codes, kc + n_codes + 6))
    vecs = {
        i: data.draw(st.lists(
            st.sampled_from([-1.0, -0.25, 0.0, 0.25, 1.0]),
            min_size=dim, max_size=dim))
        for i in range(n)
    }
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )

    def d_micro(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return math.floor(acc * 1e6)

    # coarse assignment: micro-int argmin, centroid-id tie-break
    coarse = {c: vecs[c] for c in range(kc)}
    assign, resid = {}, {}
    for i, v in vecs.items():
        c = min(coarse, key=lambda c: (d_micro(v, coarse[c]), c))
        assign[i] = c
        resid[i] = [x - y for x, y in zip(v, coarse[c])]
    # codebook: residuals of ids kc..kc+n_codes-1 (skip the coarse seeds)
    book = {(s, c): resid[kc + c][s * sub:(s + 1) * sub]
            for s in range(m) for c in range(n_codes)}
    codes, errs = {}, {}
    for i in vecs:
        cs, e = [], 0
        for s in range(m):
            sv = resid[i][s * sub:(s + 1) * sub]
            c = min(range(n_codes),
                    key=lambda c: (d_micro(sv, book[(s, c)]), c))
            cs.append(str(c))
            e += d_micro(sv, book[(s, c)])
        codes[i] = ",".join(cs)
        errs[i] = e
    got = {r["vec_id"]: r for r in similarity.ivfpq_encode(
        emb, k_centroids=kc, m=m, n_codes=n_codes).collect()}
    assert {i: (r["centroid_id"], r["codes"], r["err_micro"])
            for i, r in got.items()} == {
        i: (assign[i], codes[i], errs[i]) for i in vecs
    }

    # IVFADC search: probe the nprobe nearest lists, ADC per list
    query = vecs[data.draw(st.integers(0, n - 1))]
    probe = sorted(range(kc),
                   key=lambda c: (d_micro(query, coarse[c]), c))[:nprobe]
    scores = {}
    for i in vecs:
        if assign[i] not in probe:
            continue
        qr = [x - y for x, y in zip(query, coarse[assign[i]])]
        total = 0
        for s, c in enumerate(int(x) for x in codes[i].split(",")):
            total += d_micro(qr[s * sub:(s + 1) * sub], book[(s, c)])
        scores[i] = total
    k = 3
    want = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    topk = [(r["vec_id"], r["adc_micro"]) for r in similarity.ivfpq_topk(
        emb, query, k=k, k_centroids=kc, nprobe=nprobe, m=m,
        n_codes=n_codes).orderBy("rank").collect()]
    assert topk == want


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    npal=st.sampled_from([2, 3, 4, 16, 250, 256]),
    data=st.data(),
)
def test_gif_lzw_roundtrip_any_size_palette(w, h, npal, data):
    """GIF encode/decode is an exact round trip for EVERY size and
    palette size (2..256 — mcs 2 through 8, non-power-of-two palettes
    padded): the decoded RGB equals the palette lookup of the source
    indices, exercising variable-width LZW code growth, the KwKwK case
    (runs of repeated indices), and sub-block framing. Pure-Python
    property — no Spark session, so it runs wide."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    pal = [((i * 7) % 256, (i * 13) % 256, (255 - i) % 256)
           for i in range(npal)]
    n = w * h
    # mix of random indices and runs — runs force the KwKwK decode case
    run_heavy = data.draw(st.booleans())
    if run_heavy:
        v = data.draw(st.integers(0, npal - 1))
        idx = bytes([v]) * n
    else:
        idx = bytes(data.draw(st.lists(
            st.integers(0, npal - 1), min_size=n, max_size=n)))
    gif = M._encode_gif(idx, w, h, pal)
    parsed = M._parse_gif(gif)
    assert parsed is not None
    pw, ph, rgb = parsed
    assert (pw, ph) == (w, h)
    assert rgb == b"".join(bytes(pal[i]) for i in idx)
    # stats dispatch agrees byte-for-byte with the parsed pixels
    stats = M._decode_gif(gif)
    assert stats == (
        w, h, n,
        sum(pal[i][2] for i in idx),
        sum(pal[i][1] for i in idx),
        sum(pal[i][0] for i in idx),
    )
    # every proper prefix that cuts more than the trailer must decline
    cut = data.draw(st.integers(10, len(gif) - 2))
    assert M._parse_gif(gif[:cut]) is None


@settings(max_examples=30, deadline=None)
@given(
    w0=st.integers(1, 10), h0=st.integers(1, 10),
    w1=st.integers(1, 10), h1=st.integers(1, 10),
    data=st.data(),
)
def test_gif_resize_is_exact_index_selection(w0, h0, w1, h1, data):
    """GIF resize stays in index space: for ANY source/target size pair
    the resized payload's indices equal the nearest-neighbor selection
    of the source indices (no second quantization generation), against
    the SAME color table."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    pal = [(i, (i * 5) % 256, (i * 11) % 256) for i in range(256)]
    n = w0 * h0
    idx = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    gif = M._encode_gif(idx, w0, h0, pal)
    out = M._resize_gif(gif, w1, h1)
    assert out is not None
    pw, ph, ridx, table = M._parse_gif(out, native=True)
    assert (pw, ph) == (w1, h1)
    px = np.frombuffer(idx, np.uint8).reshape(h0, w0)
    rows = (np.arange(h1) * h0) // h1
    cols = (np.arange(w1) * w0) // w1
    assert ridx == px[rows][:, cols].tobytes()
    assert table == b"".join(bytes(p) for p in pal)


@settings(max_examples=40, deadline=None)
@given(
    mw=st.integers(1, 2),
    mh=st.integers(1, 2),
    sub=st.sampled_from(["422", "420"]),
    restart=st.sampled_from([0, 1, 2]),
    data=st.data(),
)
def test_jpeg_subsampled_constant_mcu_closed_form(mw, mh, sub, restart, data):
    """4:2:2 / 4:2:0 JPEG (round 14, VERDICT r13 #3) reconstructs
    constant-per-MCU images EXACTLY by the SAME closed form as 4:4:4:
    the chroma box mean is exact on constant cells, replication
    upsample keeps it constant, and with flat q=16 each YCbCr channel
    comes back min(v + v%2, 255). Any MCU grid, with or without
    restart markers (DC prediction resets at every RSTn, interleaved
    components included)."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    mcw, mch = (16, 8) if sub == "422" else (16, 16)
    w, h = mw * mcw, mh * mch
    colors = [
        data.draw(st.lists(st.integers(0, 255), min_size=3, max_size=3))
        for _ in range(mw * mh)
    ]
    img = np.zeros((h, w, 3), np.uint8)
    for i, c in enumerate(colors):
        by, bx = divmod(i, mw)
        img[by * mch:(by + 1) * mch, bx * mcw:(bx + 1) * mcw] = c
    jp = M._encode_jpeg(
        img.tobytes(), w, h, subsample=sub, restart_interval=restart
    )
    parsed = M._parse_jpeg(jp)
    assert parsed is not None
    pw, ph, rgb = parsed
    assert (pw, ph) == (w, h)
    dec = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)

    def q16(v):
        return min(int(v) + int(v) % 2, 255)

    for i, c in enumerate(colors):
        by, bx = divmod(i, mw)
        blk = dec[by * mch:(by + 1) * mch, bx * mcw:(bx + 1) * mcw]
        y, cb, cr = M._rgb_to_ycbcr_int(
            np.int64(c[0]), np.int64(c[1]), np.int64(c[2])
        )
        er, eg, eb = M._ycbcr_to_rgb_int(
            np.int64(q16(y)), np.int64(q16(cb)), np.int64(q16(cr))
        )
        assert (blk[:, :, 0] == int(er)).all()
        assert (blk[:, :, 1] == int(eg)).all()
        assert (blk[:, :, 2] == int(eb)).all()


@settings(max_examples=25, deadline=None)
@given(
    w=st.sampled_from([6, 16, 21, 32]),
    h=st.sampled_from([5, 13, 16]),
    sub=st.sampled_from(["422", "420"]),
    data=st.data(),
)
def test_jpeg_subsampled_roundtrip_chroma_constant_cells(w, h, sub, data):
    """Arbitrary-luma images whose chroma is constant per subsampling
    cell survive the 4:2:2/4:2:0 round trip within the SAME q=1 error
    budget as 4:4:4 (|err| <= 6): the box mean is exact on such cells,
    so subsampling adds zero error and the remaining error is the DCT +
    two fixed-point color conversions. Odd dimensions pad by edge
    replication and crop back exactly."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    cw, ch = (2, 1) if sub == "422" else (2, 2)
    cells_w, cells_h = (w + cw - 1) // cw, (h + ch - 1) // ch
    n = cells_w * cells_h * 3
    flat = data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    cells = np.array(flat, np.uint8).reshape(cells_h, cells_w, 3)
    img = np.repeat(np.repeat(cells, ch, 0), cw, 1)[:h, :w]
    q1 = [1] * 64
    jp = M._encode_jpeg(img.tobytes(), w, h, quant_y=q1, quant_c=q1,
                        subsample=sub)
    parsed = M._parse_jpeg(jp)
    assert parsed is not None
    pw, ph, rgb = parsed
    assert (pw, ph) == (w, h)
    dec = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(dec - img.astype(int)).max() <= 6


def test_jpeg_declines_exotic_sampling_grids():
    """Sampling factors outside the profile (3x1, 1x2, 4x4 luma, or
    subsampled CHROMA grids) decline whole — never misread as 4:2:x."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    img = np.zeros((16, 16, 3), np.uint8)
    jp = bytearray(M._encode_jpeg(img.tobytes(), 16, 16, subsample="420"))
    sof = jp.index(b"\xff\xc0")
    # luma hv byte lives at SOF body offset 7 (prec 1 + dims 4 + nc 1 +
    # cid 1); forge exotic grids
    for hv in (0x31, 0x12, 0x44, 0x13):
        forged = bytearray(jp)
        forged[sof + 4 + 7] = hv
        assert M._parse_jpeg(bytes(forged)) is None
    # chroma subsampled below luma(2,2) is also outside the profile
    forged = bytearray(jp)
    forged[sof + 4 + 10] = 0x21  # cb hv
    assert M._parse_jpeg(bytes(forged)) is None
    # sanity: the unforged payload still parses
    assert M._parse_jpeg(bytes(jp)) is not None


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    nf=st.integers(1, 4),
    npal=st.sampled_from([2, 5, 16, 256]),
    data=st.data(),
)
def test_gif_anim_full_canvas_roundtrip(w, h, nf, npal, data):
    """Animated GIF (round 14): full-canvas disposal-1 frames round-trip
    losslessly through the real multi-frame LZW streams — every frame
    composites to its own palette lookup and delays survive exactly."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    pal = [(i % 256, (i * 7) % 256, (255 - i) % 256) for i in range(npal)]
    frames = []
    for f in range(nf):
        idx = bytes(data.draw(st.lists(
            st.integers(0, npal - 1), min_size=w * h, max_size=w * h)))
        frames.append((idx, 5 * f + 1))
    gif = M._encode_gif_frames(frames, w, h, pal)
    parsed = M._parse_gif_frames(gif)
    assert parsed is not None
    lsw, lsh, got = parsed
    assert (lsw, lsh) == (w, h) and len(got) == nf
    pa = np.array(pal, np.uint8)
    for (idx, delay), (gd, rgb) in zip(frames, got):
        assert gd == delay
        exp = pa[np.frombuffer(idx, np.uint8)].reshape(h, w, 3)
        assert (np.frombuffer(rgb, np.uint8).reshape(h, w, 3) == exp).all()


@settings(max_examples=30, deadline=None)
@given(
    lsw=st.integers(2, 8),
    lsh=st.integers(2, 8),
    nf=st.integers(1, 3),
    data=st.data(),
)
def test_gif_anim_compositing_matches_numpy_reference(lsw, lsh, nf, data):
    """The compositing semantics (sub-rect frames at (left, top),
    transparent-index skip, disposal 0/1 leave vs 2 restore-to-
    background) match an independent numpy compositor on hand-built
    payloads — the surface the encoder's full-canvas profile never
    emits, so only this test pins it."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    npal = 4
    pal = [(10, 20, 30), (200, 100, 50), (0, 0, 255), (255, 255, 0)]
    bgidx = data.draw(st.integers(0, npal - 1))
    specs = []
    for _ in range(nf):
        fw = data.draw(st.integers(1, lsw))
        fh = data.draw(st.integers(1, lsh))
        left = data.draw(st.integers(0, lsw - fw))
        top = data.draw(st.integers(0, lsh - fh))
        disposal = data.draw(st.sampled_from([0, 1, 2]))
        trans = data.draw(st.one_of(st.none(), st.integers(0, npal - 1)))
        idx = [data.draw(st.integers(0, npal - 1)) for _ in range(fw * fh)]
        specs.append((left, top, fw, fh, disposal, trans, idx))

    out = bytearray(b"GIF89a")
    out += lsw.to_bytes(2, "little") + lsh.to_bytes(2, "little")
    out += bytes([0x80 | (1 << 4) | 1, bgidx, 0])
    for c in pal:
        out += bytes(c)
    for left, top, fw, fh, disposal, trans, idx in specs:
        flags = (disposal << 2) | (0x01 if trans is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags, 9, 0,
                      trans if trans is not None else 0, 0])
        out += b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little") + b"\x00"
        out += bytes([2])
        lzw = M._lzw_compress(bytes(idx), 2)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"

    parsed = M._parse_gif_frames(bytes(out))
    assert parsed is not None
    _, _, got = parsed
    assert len(got) == nf

    pa = np.array(pal, np.uint8)
    canvas = np.zeros((lsh, lsw, 3), np.uint8)
    canvas[:, :] = pal[bgidx]
    for (left, top, fw, fh, disposal, trans, idx), (gd, rgb) in zip(specs, got):
        assert gd == 9
        ia = np.array(idx, np.uint8).reshape(fh, fw)
        rect = canvas[top:top + fh, left:left + fw]
        mask = ia != trans if trans is not None else np.ones_like(ia, bool)
        rect[mask] = pa[ia][mask]
        assert (np.frombuffer(rgb, np.uint8).reshape(lsh, lsw, 3)
                == canvas).all()
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = pal[bgidx]


def test_gif_anim_profile_declines():
    """Disposal 3 (restore-to-previous), frame rects outside the
    canvas, and frame counts past the cap decline whole."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    pal = [(v, v, v) for v in range(4)]
    base = M._encode_gif_frames([(bytes(4), 1)], 2, 2, pal)
    b = bytearray(base)
    gce = b.index(bytes([0x21, 0xF9]))
    b[gce + 3] = 3 << 2  # disposal 3
    assert M._parse_gif_frames(bytes(b)) is None
    b = bytearray(base)
    desc = b.index(0x2C, 13)
    b[desc + 1] = 9  # left=9 pushes the rect outside a 2x2 canvas
    assert M._parse_gif_frames(bytes(b)) is None
    many = M._encode_gif_frames([(bytes(4), 1)] * 65, 2, 2, pal)
    assert M._parse_gif_frames(many) is None
    ok = M._encode_gif_frames([(bytes(4), 1)] * 64, 2, 2, pal)
    assert M._parse_gif_frames(ok) is not None


@settings(max_examples=30, deadline=None)
@given(
    w=st.sampled_from([5, 8, 16, 21]),
    h=st.sampled_from([6, 8, 13]),
    gray=st.booleans(),
    sub=st.sampled_from(["444", "422", "420"]),
    flat=st.booleans(),
    data=st.data(),
)
def test_jpeg_progressive_equals_baseline(w, h, gray, sub, flat, data):
    """Progressive JPEG (round 14): for ANY image, sampling mode, quant
    table, and RANDOM valid scan script (spectral-selection band splits
    + successive-approximation chains for both DC and AC), the
    progressive decode is BIT-IDENTICAL to the baseline decode of the
    same coefficients — the strongest possible oracle for the
    refinement paths, no external reference needed."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    if gray:
        sub = "444"
    nch = 1 if gray else 3
    n = w * h * nch
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    q = [1] * 64 if flat else None

    # random valid scan script
    ncomp = 1 if gray else 3
    dc_al = data.draw(st.integers(0, 2))
    scans = [(None, 0, 0, 0, dc_al)]
    for al in range(dc_al - 1, -1, -1):
        scans.append((None, 0, 0, al + 1, al))
    ac_scans = []
    for c in range(ncomp):
        n_bands = data.draw(st.integers(1, 3))
        cuts = sorted(data.draw(st.lists(
            st.integers(2, 63), min_size=n_bands - 1,
            max_size=n_bands - 1, unique=True)))
        bounds = [1] + cuts + [64]
        for i in range(len(bounds) - 1):
            ss, se = bounds[i], bounds[i + 1] - 1
            al0 = data.draw(st.integers(0, 2))
            band = [(c, ss, se, 0, al0)]
            for al in range(al0 - 1, -1, -1):
                band.append((c, ss, se, al + 1, al))
            ac_scans.append(band)
    # interleave bands' scans across components, preserving band order
    order = data.draw(st.permutations(range(len(ac_scans))))
    cursors = [0] * len(ac_scans)
    flat_ac = []
    remaining = sum(len(b) for b in ac_scans)
    while remaining:
        for bi in order:
            if cursors[bi] < len(ac_scans[bi]):
                flat_ac.append(ac_scans[bi][cursors[bi]])
                cursors[bi] += 1
                remaining -= 1
    scans += flat_ac

    base = M._encode_jpeg(px, w, h, gray=gray, subsample=sub,
                          quant_y=q, quant_c=q)
    prog = M._encode_jpeg_progressive(px, w, h, gray=gray, subsample=sub,
                                      quant_y=q, quant_c=q, scans=scans)
    pb = M._parse_jpeg(base)
    pp = M._parse_jpeg(prog)
    assert pb is not None and pp is not None
    assert pp == pb


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 19),
    npal=st.sampled_from([2, 16, 256]),
    data=st.data(),
)
def test_gif_interlaced_decode_matches_display_order(w, h, npal, data):
    """GIF 4-pass interlace (round 14): an interlaced encode of
    display-order indices decodes back to EXACTLY the non-interlaced
    decode — the row permutation round-trips for every height class
    (heights 1..19 cover passes that are empty, partial, and full)."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    pal = [(i, (255 - i) % 256, (i * 5) % 256) for i in range(npal)]
    idx = bytes(data.draw(st.lists(
        st.integers(0, npal - 1), min_size=w * h, max_size=w * h)))
    plain = M._parse_gif(M._encode_gif(idx, w, h, pal))
    inter = M._parse_gif(M._encode_gif(idx, w, h, pal, interlace=True))
    assert plain is not None and inter == plain
    # the row order is a permutation covering every row exactly once
    order = M._gif_interlace_order(h)
    assert sorted(order) == list(range(h))


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    color=st.sampled_from([0, 2, 4, 6]),
    data=st.data(),
)
def test_png_adam7_decode_matches_plain(w, h, color, data):
    """PNG Adam7 interlace (round 14): the interlaced encode of any
    image decodes BIT-IDENTICAL to the plain encode — per-pass
    filtering (all five types via the default r%5 script, restarting
    per pass) + the scatter both round-trip, including dimensions where
    some passes are empty (w or h < 5)."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    n = w * h * bpp
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    plain = M._parse_png(M._encode_png(px, w, h, color=color))
    inter = M._parse_png(M._encode_png(px, w, h, color=color,
                                       interlace=True))
    assert plain is not None and inter == plain
    nat = M._parse_png(M._encode_png(px, w, h, color=color,
                                     interlace=True), native=True)
    assert nat == M._parse_png(M._encode_png(px, w, h, color=color),
                               native=True)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    n_entries=st.integers(1, 256),
    use_trns=st.booleans(),
    interlace=st.booleans(),
    data=st.data(),
)
def test_png_palette_trns_roundtrip(w, h, n_entries, use_trns, interlace,
                                    data):
    """Round 15 (VERDICT r14 #6): paletted PNG encode/decode is an exact
    round trip for EVERY size, palette, filter assignment, tRNS length,
    and interlace mode — decoded channel sums equal the palette-resolved
    sums; alpha is validated but never leaks into stats."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    pal = [
        tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        for _ in range(n_entries)
    ]
    idx = bytes(data.draw(st.lists(
        st.integers(0, n_entries - 1), min_size=w * h, max_size=w * h)))
    filters = data.draw(st.lists(
        st.integers(0, 4), min_size=h, max_size=h))
    trns = None
    if use_trns:
        k = data.draw(st.integers(1, n_entries))
        trns = bytes(data.draw(st.lists(
            st.integers(0, 255), min_size=k, max_size=k)))
    png = M._encode_png(idx, w, h, filters=filters, color=3,
                        palette=pal, trns=trns, interlace=interlace)
    got = M._decode_png(png)
    rgb = [pal[v] for v in idx]
    want = (w, h, w * h,
            sum(c[2] for c in rgb), sum(c[1] for c in rgb),
            sum(c[0] for c in rgb))
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    color=st.sampled_from([0, 2, 4, 6]),
    interlace=st.booleans(),
    data=st.data(),
)
def test_png_16bit_high_byte_rescale(w, h, color, interlace, data):
    """Round 15 (VERDICT r14 #6): 16-bit PNG decode applies the spec's
    sample-depth rescale — the HIGH byte of each big-endian pair — for
    every size/color/interlace; low bytes are drawn independently so a
    decoder reading the wrong byte (or averaging the pair) fails."""
    from crypto_data_service_loader_spark.operators import multimodal as M

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    n = w * h * ch
    hi = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    lo = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    raw16 = bytes(b for pair in zip(hi, lo) for b in pair)
    png16 = M._encode_png(raw16, w, h, color=color, depth=16,
                          interlace=interlace)
    png8 = M._encode_png(hi, w, h, color=color)
    assert M._decode_png(png16) == M._decode_png(png8)
    # native mode also returns the rescaled 8-bit raster
    assert M._parse_png(png16, native=True) == (w, h, color, ch, hi)


def test_png_new_profile_declines():
    """Decline-never-misread for the round-15 PNG surface: 16-bit
    palette header, tRNS after IDAT, tRNS longer than the palette,
    tRNS on RGBA, wrong gray/RGB tRNS width."""
    import struct
    import zlib

    from crypto_data_service_loader_spark.operators import multimodal as M

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    pal = [(v, v, v) for v in range(16)]
    good = M._encode_png(bytes(range(16)), 4, 4, color=3, palette=pal)
    assert M._parse_png(good) is not None
    sig, rest = good[:8], good[8:]
    ihdr16 = chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0))
    assert M._parse_png(sig + ihdr16 + rest[25:]) is None
    # tRNS AFTER IDAT: append before IEND
    iend = chunk(b"IEND", b"")
    assert good.endswith(iend)
    late = good[:-len(iend)] + chunk(b"tRNS", b"\x00") + iend
    assert M._parse_png(late) is None
    # tRNS longer than the palette (17 > 16 entries)
    assert M._encode_png(bytes(range(16)), 4, 4, color=3, palette=pal,
                         trns=bytes(16)) is not None
    head = good[:8 + 25 + 12 + len(pal) * 3]  # sig+IHDR+PLTE
    tail = good[8 + 25 + 12 + len(pal) * 3:]
    oversized = head + chunk(b"tRNS", bytes(17)) + tail
    assert M._parse_png(oversized) is None
    # tRNS on RGBA / wrong widths on gray and RGB
    rgba = M._encode_png(bytes(80), 4, 5, color=6)
    h6, t6 = rgba[:8 + 25], rgba[8 + 25:]
    assert M._parse_png(h6 + chunk(b"tRNS", b"\x00\x01") + t6) is None
    gray = M._encode_png(bytes(20), 4, 5, color=0)
    hg, tg = gray[:8 + 25], gray[8 + 25:]
    assert M._parse_png(hg + chunk(b"tRNS", b"\x00\x01") + tg) is not None
    assert M._parse_png(hg + chunk(b"tRNS", b"\x00\x01\x02") + tg) is None
    rgbp = M._encode_png(bytes(60), 4, 5, color=2)
    hr, tr = rgbp[:8 + 25], rgbp[8 + 25:]
    assert M._parse_png(hr + chunk(b"tRNS", bytes(6)) + tr) is not None
    assert M._parse_png(hr + chunk(b"tRNS", bytes(5)) + tr) is None


@settings(max_examples=40, deadline=None)
@given(
    mw=st.integers(1, 6),
    mh=st.integers(1, 2),
    restart=st.integers(1, 14),
    data=st.data(),
)
def test_jpeg_restart_any_interval_and_declines(mw, mh, restart, data):
    """Restart markers, the full surface (round 16, VERDICT r15 #6):
    ANY interval — including one larger than the MCU count (no markers
    emitted) and intervals forcing the RST0..RST7 index wraparound —
    round-trips the constant-block closed form; and the two hostile
    mutations DECLINE whole: truncation at/inside a restart marker,
    and a mis-sequenced RSTn index."""
    import numpy as np

    from crypto_data_service_loader_spark.operators import multimodal as M

    w, h = mw * 8, mh * 8
    colors = [
        data.draw(st.lists(st.integers(0, 255), min_size=3, max_size=3))
        for _ in range(mw * mh)
    ]
    img = np.zeros((h, w, 3), np.uint8)
    for i, c in enumerate(colors):
        by, bx = divmod(i, mw)
        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = c
    jp = M._encode_jpeg(img.tobytes(), w, h, restart_interval=restart)
    parsed = M._parse_jpeg(jp)
    assert parsed is not None and parsed[:2] == (w, h)
    dec = np.frombuffer(parsed[2], np.uint8).reshape(h, w, 3)

    def q16(v):
        return min(int(v) + int(v) % 2, 255)

    for i, c in enumerate(colors):
        by, bx = divmod(i, mw)
        y, cb, cr = M._rgb_to_ycbcr_int(
            np.int64(c[0]), np.int64(c[1]), np.int64(c[2]))
        er, eg, eb = M._ycbcr_to_rgb_int(
            np.int64(q16(y)), np.int64(q16(cb)), np.int64(q16(cr)))
        blk = dec[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
        assert (blk == np.array([int(er), int(eg), int(eb)])).all()

    # locate every RSTn marker in the entropy stream
    rsts = [i for i in range(2, len(jp) - 1)
            if jp[i] == 0xFF and 0xD0 <= jp[i + 1] <= 0xD7]
    n_mcu = mw * mh
    expected = (n_mcu - 1) // restart if restart else 0
    assert len(rsts) == expected
    if rsts:
        pos = data.draw(st.sampled_from(rsts))
        # truncated AT a restart marker: the decoder's marker check
        # runs off the payload end -> decline whole
        assert M._parse_jpeg(jp[:pos]) is None
        assert M._parse_jpeg(jp[:pos + 1]) is None
        # mis-sequenced RSTn: flip the marker to the WRONG index
        # (T.81 requires the cyclic sequence RST0..RST7)
        wrong = 0xD0 + ((jp[pos + 1] - 0xD0 + 1) % 8)
        mut = jp[:pos + 1] + bytes([wrong]) + jp[pos + 2:]
        assert M._parse_jpeg(mut) is None

