"""Tests for the LLM-pipeline EXT operators: dedup recall/precision on
planted duplicates, ANN recall vs brute force, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.operators import dedup, multimodal, similarity
from crypto_data_service_loader_spark.tables import load


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog again and anew"),  # near dup of 0
        (3, "completely different text about spark shuffle partitions here"),
        (4, "totally unrelated content regarding clickhouse inserts and gzip"),
        (5, "THE QUICK  brown fox jumps over the lazy dog again and again"),  # ws/case dup of 0
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup_groups_normalized_dups(docs_with_dups):
    out = dedup.exact_dedup(docs_with_dups).collect()
    groups = {r["keep_id"]: r["n_docs"] for r in out}
    assert groups[0] == 3  # 0, 1, 5 share a normalized fingerprint
    assert sum(groups.values()) == 6


def test_minhash_lsh_finds_near_dup_pair(docs_with_dups):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs_with_dups).collect()}
    assert (0, 1) in pairs and (0, 5) in pairs  # exact dups always collide
    assert (0, 2) in pairs or (1, 2) in pairs   # near dup shares most shingles
    assert (3, 4) not in pairs                   # unrelated never collide


def test_ngram_jaccard_scores(docs_with_dups, spark):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (3, 4)], "id_a long, id_b long")
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard(docs_with_dups, pairs).collect()}
    assert j[(0, 1)] == 1.0
    assert 0.3 < j[(0, 2)] < 1.0
    assert j[(3, 4)] == 0.0


def test_simhash_near_dups_hamming(docs_with_dups):
    out = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           dedup.simhash_near_dups(docs_with_dups, max_hamming=3).collect()}
    assert out.get((0, 1)) == 0  # identical text -> identical simhash
    assert out.get((0, 5)) == 0  # normalization-invariant


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    """ANN contract: the LSH bucket variant returns a subset of plausible
    neighbors; recall@10 against brute force must be meaningfully > 0 and
    every returned id must score identically to the brute-force scorer."""
    from crypto_data_service_loader_spark.suite import _query_vector

    emb = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    brute = similarity.cosine_topk(emb, q, k=10).collect()
    ann = similarity.cosine_topk_lsh(emb, q, k=10).collect()
    brute_scores = {r["vec_id"]: r["score"] for r in brute}
    assert len(ann) >= 1
    # the query vector itself (vec_id 0) is always in its own bucket
    assert any(r["vec_id"] == 0 for r in ann)
    for r in ann:
        if r["vec_id"] in brute_scores:
            assert r["score"] == brute_scores[r["vec_id"]]


def test_embedding_near_dups_blocked_matches_bruteforce(spark, sf_dir):
    """The production block-partitioned all-pairs join is EXACT: identical
    pair set and scores to the nested-loop baseline, with an equi-join plan
    (no BroadcastNestedLoopJoin / CartesianProduct)."""
    from crypto_data_service_loader_spark.plans.explain import physical_plan

    emb = load(spark, sf_dir, "embeddings")
    blocked_df = similarity.embedding_near_dups(emb, threshold=0.35, n_blocks=5)
    plan = physical_plan(blocked_df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    blocked = {(r["id_a"], r["id_b"]): r["score"] for r in blocked_df.collect()}
    brute = {(r["id_a"], r["id_b"]): r["score"]
             for r in similarity.embedding_near_dups_bruteforce(
                 emb, threshold=0.35).collect()}
    assert blocked == brute
    assert len(brute) > 0


def test_embedding_lsh_near_dups_subset_of_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    brute = {(r["id_a"], r["id_b"]): r["score"]
             for r in similarity.embedding_near_dups(emb, threshold=0.35).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["score"]
           for r in similarity.embedding_near_dups_lsh(emb, threshold=0.35).collect()}
    assert set(lsh) <= set(brute)          # bucketing never invents pairs
    for k, v in lsh.items():
        assert v == brute[k]               # scores identical where found
    if brute:
        assert len(lsh) / len(brute) > 0.1  # sanity recall floor


def test_ivf_topk_recall_and_exactness(spark, sf_dir):
    """IVF contract: nprobe == k_centroids is exact (same result as brute
    force); small nprobe returns a subset scoring identically."""
    from crypto_data_service_loader_spark.suite import _query_vector

    emb = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    brute = similarity.cosine_topk(emb, q, k=10).collect()
    exact = similarity.ivf_topk(emb, q, k=10, k_centroids=8, nprobe=8).collect()
    assert [(r["vec_id"], r["score"]) for r in exact] == [
        (r["vec_id"], r["score"]) for r in brute
    ]
    partial = similarity.ivf_topk(emb, q, k=10, k_centroids=8, nprobe=2).collect()
    brute_scores = {r["vec_id"]: r["score"] for r in brute}
    assert 1 <= len(partial) <= 10
    hits = [r for r in partial if r["vec_id"] in brute_scores]
    for r in hits:
        assert r["score"] == brute_scores[r["vec_id"]]


def test_ivf_lloyd_centroids_are_cluster_means(spark):
    """One Lloyd iteration on two obvious clusters must move the seed
    centroids to the exact cluster means (empty clusters keep their seed)."""
    rows = [
        (0, [0.0, 0.0]), (1, [2.0, 0.0]),       # cluster around x-axis
        (2, [100.0, 100.0]), (3, [102.0, 100.0]),  # far cluster
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = similarity.ivf_train(emb, k_centroids=2, iters=1)
    got = {cid: vec for cid, vec in cents}
    # seeds are vec 0 and vec 1; members split {0} / {1,2,3} on iter 1's
    # assignment against the seeds, means = [0,0] and [68,66.67]
    assert got[0] == [0.0, 0.0]
    assert [round(x, 4) for x in got[1]] == [68.0, 66.6667]


def test_ivf_lloyd_recall_not_worse(spark, sf_dir):
    """Lloyd-refined IVF at the same nprobe must match brute-force scores
    where it hits, and recall must not degrade vs the untrained quantizer."""
    from crypto_data_service_loader_spark.suite import _query_vector

    emb = load(spark, sf_dir, "embeddings")
    q = _query_vector(spark, sf_dir)
    brute_ids = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
    seed = similarity.ivf_topk(emb, q, k=10, k_centroids=8, nprobe=3).collect()
    lloyd = similarity.ivf_topk(
        emb, q, k=10, k_centroids=8, nprobe=3, train_iters=2
    ).collect()
    seed_recall = len({r["vec_id"] for r in seed} & brute_ids)
    lloyd_recall = len({r["vec_id"] for r in lloyd} & brute_ids)
    assert lloyd_recall >= seed_recall
    assert lloyd_recall >= 5  # refined quantizer finds most true neighbors


def test_gopher_flags_rules(spark):
    from crypto_data_service_loader_spark.operators.text import gopher_quality_flags

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "a b"),                      # too short
            (3, "!! ?? ## $$ %% ^^ && ** (( )) [[ ]]"),  # all symbols
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert out[1]["passes_gopher"] is True
    assert out[2]["ok_word_count"] is False and out[2]["passes_gopher"] is False
    assert out[3]["ok_alpha_ratio"] is False
    assert out[3]["ok_symbol_ratio"] is False
    assert out[3]["symbol_word_ratio"] == 1.0


def test_repetition_stats_math(spark):
    from crypto_data_service_loader_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # 5 bigrams: "a b" x3, "b a" x2
            (2, "x y z"),         # 2 distinct bigrams
            (3, "solo"),          # shorter than one bigram -> omitted
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_grams"] == 5
    assert out[1]["top_gram_frac"] == 3 / 5
    assert out[1]["dup_gram_frac"] == (5 - 2) / 5
    assert out[2]["top_gram_frac"] == 1 / 2
    assert out[2]["dup_gram_frac"] == 0.0


def test_chunking_windows_and_overlap(spark):
    from crypto_data_service_loader_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([(1, words), (2, "short doc only")],
                                 "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=64, overlap=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
    c1 = sorted(by_doc[1])
    assert len(c1) == 2  # ceil((100-16)/48) = 2
    assert c1[0][1].split()[0] == "w0" and c1[1][1].split()[0] == "w48"
    # overlap: last 16 tokens of chunk 0 == first 16 of chunk 1
    assert c1[0][1].split()[48:] == c1[1][1].split()[:16]
    assert by_doc[2] == [(0, "short doc only")]  # short doc -> one chunk


def test_pii_redaction(spark):
    from crypto_data_service_loader_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [(1, "contact alice@example.com or +1 (555) 123-4567 now"),
         (2, "no pii here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert "<EMAIL>" in out[1]["redacted_text"]
    assert "<PHONE>" in out[1]["redacted_text"]
    assert "alice@" not in out[1]["redacted_text"]
    assert out[1]["n_emails"] == 1
    assert out[2]["redacted_text"] == "no pii here" and out[2]["n_emails"] == 0


def test_multimodal_decode_plumbing(spark):
    import hashlib

    rows = [(i, "image", hashlib.md5(str(i).encode()).digest(), "image/png", 64, 64, None)
            for i in range(10)]
    media = spark.createDataFrame(rows, multimodal_schema())
    feats = multimodal.decode_and_featurize(media, fake=True)
    got = feats.collect()
    assert len(got) == 10
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in got)
    assert all(r["decode_ok"] for r in got)
    # determinism: same payload -> same feature
    f0 = [r["feature"] for r in got if r["media_id"] == 0][0]
    again = [r["feature"] for r in multimodal.decode_and_featurize(media, fake=True).collect()
             if r["media_id"] == 0][0]
    assert list(f0) == list(again)


def test_multimodal_real_codec_is_stubbed(spark):
    media = spark.createDataFrame(
        [(0, "image", b"x", "image/png", 1, 1, None)], multimodal_schema()
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        multimodal.decode_and_featurize(media, fake=False).collect()


def _make_bmp(width, height, pixels_bgr, extra_tail=b""):
    """Build a real uncompressed 24-bpp BMP: header + bottom-up padded
    rows (pixels_bgr is a flat top-down list of (b, g, r) tuples)."""
    import struct

    row_size = (width * 3 + 3) // 4 * 4
    n_rows = abs(height)
    img = bytearray()
    rows = [pixels_bgr[r * width:(r + 1) * width] for r in range(n_rows)]
    stored = rows[::-1] if height > 0 else rows  # positive height = bottom-up
    for row in stored:
        line = b"".join(bytes(p) for p in row)
        img += line + b"\x00" * (row_size - len(line))
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(img), 0, 0, 0, 0)
    return bytes(hdr + dib + img) + extra_tail


def test_bmp_decode_real_with_padding_and_orientation():
    """_decode_bmp24 is a REAL parser: row padding stripped (width=3 →
    9 pixel bytes + 3 pad per row), bottom-up vs top-down both handled,
    channel sums in BGR order."""
    px = [(i, 10 + i, 100 + i) for i in range(6)]  # 3x2, distinct channels
    want = (3, 2, 6, sum(p[0] for p in px), sum(p[1] for p in px),
            sum(p[2] for p in px))
    assert multimodal._decode_bmp24(_make_bmp(3, 2, px)) == want
    assert multimodal._decode_bmp24(_make_bmp(3, -2, px)) == want
    # padding bytes (0xFF would shift sums if leaked into the pixels)
    raw = bytearray(_make_bmp(3, 2, px))
    for r in range(2):
        raw[54 + r * 12 + 9:54 + r * 12 + 12] = b"\xff\xff\xff"
    assert multimodal._decode_bmp24(bytes(raw)) == want


def test_bmp_decode_rejects_corrupt():
    px = [(1, 2, 3)] * 4
    good = _make_bmp(2, 2, px)
    assert multimodal._decode_bmp24(good) is not None
    assert multimodal._decode_bmp24(None) is None
    assert multimodal._decode_bmp24(b"") is None
    assert multimodal._decode_bmp24(b"x" * 60) is None        # no magic
    assert multimodal._decode_bmp24(good[:-1]) is None        # truncated
    bad_bpp = bytearray(good); bad_bpp[28] = 8                # 8-bpp
    assert multimodal._decode_bmp24(bytes(bad_bpp)) is None
    bad_comp = bytearray(good); bad_comp[30] = 1              # BI_RLE8
    assert multimodal._decode_bmp24(bytes(bad_comp)) is None


def test_decode_and_featurize_real_bmp_branch(spark):
    """BMP payloads decode FOR REAL (fake=False no longer raises for
    them); mixed batches with fake=True route BMP → real, other → fake."""
    px = [(0, 0, 255)] * 4  # pure red 2x2: mean_b=0, mean_g=0, mean_r=255
    bmp = _make_bmp(2, 2, px)
    media = spark.createDataFrame(
        [(1, "image", bmp, "image/bmp", 2, 2, None)], multimodal_schema()
    )
    row = multimodal.decode_and_featurize(media, fake=False).collect()[0]
    assert row["decode_ok"]
    assert list(row["feature"]) == [2.0, 2.0, 4.0, 0.0, 0.0, 255.0,
                                    299 * 255 / 1000.0, 1.0]
    mixed = spark.createDataFrame(
        [(1, "image", bmp, "image/bmp", 2, 2, None),
         (2, "image", b"not-a-bmp", "image/png", 1, 1, None)],
        multimodal_schema(),
    )
    got = {r["media_id"]: r for r in
           multimodal.decode_and_featurize(mixed, fake=True).collect()}
    assert got[1]["feature"][5] == 255.0          # real branch
    assert all(0.0 <= v <= 1.0 for v in got[2]["feature"])  # md5 fake


def test_decode_bmp_stats_matches_hand_computed(spark):
    px = [(i % 7, (3 * i) % 11, (5 * i) % 13) for i in range(12)]  # 4x3
    media = spark.createDataFrame(
        [(9, _make_bmp(4, 3, px)), (10, b"junk")],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in
           multimodal.decode_bmp_stats(media).collect()}
    ok = got[9]
    sb, sg, sr = (sum(p[c] for p in px) for c in range(3))
    assert (ok["width"], ok["height"], ok["n_pixels"]) == (4, 3, 12)
    assert (ok["sum_b"], ok["sum_g"], ok["sum_r"]) == (sb, sg, sr)
    assert ok["luma_milli"] == (299 * sr + 587 * sg + 114 * sb) // 12
    assert ok["decode_ok"]
    bad = got[10]
    assert not bad["decode_ok"] and bad["width"] is None


def test_frame_sampling_cadence(spark):
    media = spark.createDataFrame(
        [(7, "video", b"v", "video/mp4", None, None, 3500)], multimodal_schema()
    )
    frames = multimodal.sample_frames(media, every_ms=1000, fake=True).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]


def test_frame_sampling_negative_duration_yields_zero_frames(spark):
    """A corrupt negative duration must produce zero frames for THAT row
    (as the old per-row loop did) — not a np.repeat ValueError that poisons
    the whole Arrow batch."""
    media = spark.createDataFrame(
        [
            (1, "video", b"v", "video/mp4", None, None, -500),
            (2, "video", b"v", "video/mp4", None, None, 2500),
        ],
        multimodal_schema(),
    )
    frames = multimodal.sample_frames(media, every_ms=1000, fake=True).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in frames) == [
        (2, 0), (2, 1),
    ]


def multimodal_schema():
    from crypto_data_service_loader_spark.schemas import MEDIA

    return MEDIA


def test_lang_id_trigram_discriminates(spark):
    from crypto_data_service_loader_spark.operators.text import lang_id_trigram

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog are singing for their dinner"),
            (2, "der schnelle braune fuchs springt und die hunde schlafen nicht"),
            (3, "les enfants que nous avons vus dans la rue chantent pour tout le monde"),
            (4, "los ninos estaban cantando en la ciudad que conocemos desde hace anos"),
            (5, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in lang_id_trigram(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "es"
    assert out[5] == "und"


def test_ivf_tune_nprobe_contract(spark, sf_dir):
    """Auto-tune contract: target 1.0 recall reaches exactness (possibly at
    nprobe == k_centroids); a lax target picks a smaller-or-equal nprobe;
    the picked nprobe actually delivers the target on the tuning queries."""
    from crypto_data_service_loader_spark.suite import _query_vector

    emb = load(spark, sf_dir, "embeddings")
    qs = [_query_vector(spark, sf_dir, i) for i in (0, 3)]
    strict = similarity.ivf_tune_nprobe(
        emb, qs, target_recall=1.0, k=10, k_centroids=8
    )
    lax = similarity.ivf_tune_nprobe(
        emb, qs, target_recall=0.5, k=10, k_centroids=8
    )
    assert 1 <= lax <= strict <= 8
    # replay: the strict choice must reproduce brute-force results
    for q in qs:
        brute = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
        got = {r["vec_id"] for r in similarity.ivf_topk(
            emb, q, k=10, k_centroids=8, nprobe=strict, train_iters=1).collect()}
        assert len(got & brute) / 10 >= 0.99 or strict == 8


def test_connected_components_transitive_chain(spark):
    """A path graph needs multiple propagation rounds: 1-2-3-4 must all
    collapse to cluster 1 even though 1 and 4 share no direct edge."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 7, 8, 9)], "doc_id long"
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup.connected_components(pairs, nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7, 9: 9}


def test_decontaminate_flags_shared_ngrams(spark):
    """A training doc containing a benchmark 5-gram verbatim is flagged;
    clean docs report 0 overlap. Counts are distinct-gram counts."""
    from crypto_data_service_loader_spark.operators import text

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains two distinct 5-grams of the benchmark sentence
            (1, "well the quick brown fox jumps over everything"),
            (2, "completely unrelated words with no overlap at all here"),
            (3, "tiny doc"),  # shorter than one 5-gram
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in text.decontaminate(train, bench, n=5).collect()
    }
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)


def test_tfidf_ranks_rare_terms_above_common(spark):
    """A term appearing in every doc gets the minimum idf; a doc-unique
    term outranks it at equal tf."""
    from crypto_data_service_loader_spark.operators import text

    docs = spark.createDataFrame(
        [
            (1, "common zebra common"),
            (2, "common yak common"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = text.tf_idf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["term_rank"], r["term"]))
    # doc 1: zebra (unique, tf=1) must outrank common (everywhere, tf=2)?
    # smoothed idf: common df=3 -> ln(4/4)+1 = 1, tf=2 -> score 2.0;
    # zebra df=1 -> ln(4/2)+1 ~= 1.693, tf=1 -> score ~1.693 < 2.0.
    # So common ranks 1 by tf weight; zebra is rank 2 — assert exactly.
    assert sorted(by_doc[1]) == [(1, "common"), (2, "zebra")]
    assert sorted(by_doc[2]) == [(1, "common"), (2, "yak")]
    assert by_doc[3] == [(1, "common")]


def test_split_stable_under_corpus_growth(spark):
    """The property that makes eval sets trustworthy: adding documents must
    never move an existing document between splits."""
    from crypto_data_service_loader_spark.operators import training

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    grown = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"]
          for r in training.train_val_test_split(small, "doc_id").collect()}
    s2 = {r["doc_id"]: r["split"]
          for r in training.train_val_test_split(grown, "doc_id").collect()}
    assert all(s2[k] == v for k, v in s1.items())
    # and the proportions are near the 90/5/5 request
    from collections import Counter
    c = Counter(s2.values())
    assert 0.85 < c["train"] / 5000 < 0.95
    assert 0.02 < c["val"] / 5000 < 0.08
    assert 0.02 < c["test"] / 5000 < 0.08


def test_pack_sequences_invariants(spark):
    """Segment packing: bin stream positions are contiguous per group, a
    bin never starts a doc at/after the budget boundary, and every doc is
    packed exactly once."""
    from crypto_data_service_loader_spark.operators import training

    docs = spark.createDataFrame(
        [(i, "s" + str(i % 2), 10 + (i * 37) % 900) for i in range(200)],
        "doc_id long, source string, n_tokens long",
    )
    out = training.pack_sequences(
        docs, budget=1000, tokens_col="n_tokens", group_col="source"
    ).collect()
    assert len(out) == 200  # every doc packed once
    by_group: dict = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        pos = by_group.get(r["source"], 0)
        # bin_id/bin_offset are exactly the doc's running start position
        assert r["bin_id"] * 1000 + r["bin_offset"] == pos
        assert r["bin_offset"] < 1000  # a doc never starts past the budget
        by_group[r["source"]] = pos + r["n_tokens"]


def test_pack_sequences_sharded_bounds_window_partitions(spark):
    """The 100 TB skew guard: sub-sharding by id range must keep every
    doc packed exactly once, keep offsets under budget, and never collide
    bin ids across shards."""
    from crypto_data_service_loader_spark.operators import training

    docs = spark.createDataFrame(
        [(i, 10 + (i * 37) % 900) for i in range(500)],
        "doc_id long, n_tokens long",
    )
    out = training.pack_sequences(
        docs, budget=1000, tokens_col="n_tokens", shard_docs=100
    ).collect()
    assert len(out) == 500
    seen_bins_by_shard: dict = {}
    for r in out:
        assert r["bin_offset"] < 1000
        shard = r["doc_id"] // 100
        seen_bins_by_shard.setdefault(shard, set()).add(r["bin_id"])
    shards = sorted(seen_bins_by_shard)
    for a, b in zip(shards, shards[1:]):
        assert max(seen_bins_by_shard[a]) < min(seen_bins_by_shard[b])


def test_pack_sequences_sharded_docs_bigger_than_budget(spark):
    """Regression: a doc larger than the budget consumes multiple bins, so
    per-shard bin counts can exceed shard_docs — bin ids must still never
    collide across shards (the old shard_docs+1 stride merged them)."""
    from crypto_data_service_loader_spark.operators import training

    # 40 docs of 5000 tokens each, budget 1000 -> ~5 bins per doc, 10-doc
    # shards -> ~50 bins per shard >> shard_docs
    docs = spark.createDataFrame(
        [(i, 5000) for i in range(40)], "doc_id long, n_tokens long"
    )
    out = training.pack_sequences(
        docs, budget=1000, tokens_col="n_tokens", shard_docs=10
    ).collect()
    assert len(out) == 40
    seen_bins_by_shard: dict = {}
    for r in out:
        seen_bins_by_shard.setdefault(r["doc_id"] // 10, set()).add(r["bin_id"])
    shards = sorted(seen_bins_by_shard)
    for a, b in zip(shards, shards[1:]):
        assert max(seen_bins_by_shard[a]) < min(seen_bins_by_shard[b])


def test_pack_sequences_exact_integer_quotient_near_2e53(spark):
    """ADVICE r15: bin_id and bin_offset must derive from the same EXACT
    integer quotient. Token counts chosen so the cumulative total crosses
    2^53 (where doubles lose integer exactness): the old float-rounded
    `(cum / budget).cast('long')` disagrees with the exact `%` remainder
    there; the `div` form matches Python's `cum // budget` bit-for-bit."""
    from crypto_data_service_loader_spark.operators import training

    budget = (1 << 21) + 7  # odd budget near 2^21 — maximizes rounding risk
    big = (1 << 53) - 3     # one doc puts the cumsum right at the 2^53 edge
    rows = [(0, big)] + [(i, 1_000_003 + i) for i in range(1, 12)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"])
        for r in training.pack_sequences(
            docs, budget=budget, tokens_col="n_tokens", shard_docs=1 << 20
        ).collect()
    }
    cum = 0
    for doc_id, n in rows:
        shard = doc_id // (1 << 20)
        expect = (shard * (1 << 32) + cum // budget, cum % budget)
        assert out[doc_id] == expect, (doc_id, out[doc_id], expect)
        cum += n
    # the two derived fields stay mutually consistent by construction:
    # offset == cum_before - bin_local*budget for every row
    for doc_id, (b, off) in out.items():
        assert 0 <= off < budget


def test_mix_corpora_deterministic_rates(spark):
    """Hash-gated mixing: reproducible membership (same rows every run),
    per-source keep rates near the requested weights, unlisted sources
    dropped by default."""
    from crypto_data_service_loader_spark.operators import training

    docs = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(3000)],
        "doc_id long, source string",
    )
    kept1 = {r["doc_id"] for r in
             training.mix_corpora(docs, {"a": 1.0, "b": 0.3}).collect()}
    kept2 = {r["doc_id"] for r in
             training.mix_corpora(docs, {"a": 1.0, "b": 0.3}).collect()}
    assert kept1 == kept2  # deterministic
    a_total = b_total = 1000
    a_kept = sum(1 for i in kept1 if i % 3 == 0)
    b_kept = sum(1 for i in kept1 if i % 3 == 1)
    c_kept = sum(1 for i in kept1 if i % 3 == 2)
    assert a_kept == a_total          # weight 1.0 keeps everything
    assert 0.2 < b_kept / b_total < 0.4
    assert c_kept == 0                # unlisted source dropped


def test_write_sorted_shards_global_order(spark, tmp_path):
    """Range-sharded write: every shard internally sorted AND shard ranges
    non-overlapping — concatenating shards in order yields the global
    order without any single-node sort."""
    import glob as globmod

    from crypto_data_service_loader_spark.operators import training

    df = spark.range(0, 10000).withColumnRenamed("id", "doc_id").select(
        F.col("doc_id"), (F.col("doc_id") * 7 % 100).alias("payload")
    )
    out = str(tmp_path / "shards")
    training.write_sorted_shards(df, out, shards=8)
    files = sorted(globmod.glob(out + "/part-*"))
    assert len(files) == 8
    prev_max = -1
    total = 0
    for f in files:
        ids = [r["doc_id"] for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids)          # sorted within shard
        assert ids[0] > prev_max           # ranges are disjoint + ordered
        prev_max = ids[-1]
        total += len(ids)
    assert total == 10000


def test_mix_corpora_upsampled_expected_copies(spark):
    """Weight 2.5 must yield exactly 2 or 3 copies per row (mean ~2.5),
    weight 1.0 exactly one, weight 0 zero; copy ids are 1..n."""
    from collections import Counter

    from crypto_data_service_loader_spark.operators import training

    docs = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(2000)],
        "doc_id long, source string",
    )
    out = training.mix_corpora_upsampled(docs, {"a": 2.5, "b": 1.0}).collect()
    per_doc = Counter(r["doc_id"] for r in out)
    a_counts = [per_doc[i] for i in range(0, 2000, 2)]
    b_counts = [per_doc[i] for i in range(1, 2000, 2)]
    assert set(a_counts) == {2, 3}
    assert 2.3 < sum(a_counts) / len(a_counts) < 2.7
    assert set(b_counts) == {1}
    for r in out:
        assert 1 <= r["copy_id"] <= per_doc[r["doc_id"]]


def test_connected_components_deep_chain(spark):
    """Regression: a chain graph's diameter exceeds any fixed small round
    cap for plain propagation (the sf0.1 embedding graph's diameter-16
    silently beat the old max_iter=15). Pointer jumping must converge a
    200-deep chain to a single min-labeled component within the 64-round
    valve — and in far fewer rounds than the diameter."""
    from crypto_data_service_loader_spark.operators import dedup

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    nodes = spark.range(201).withColumnRenamed("id", "doc_id")
    out = dedup.connected_components(chain, nodes).collect()
    assert len(out) == 201
    assert {r["cluster_id"] for r in out} == {0}  # one component, min label


# ---------------------------------------------------------------------------
# round-4 third-session additions: semantic dedup, kNN graph, incremental
# dedup, classifier gate, corpus report, z-score outliers
# ---------------------------------------------------------------------------


def test_semantic_dedup_flags_match_within_cluster_bruteforce(spark, sf_dir):
    """Every flagged vector must have a smaller-id same-cluster partner at
    >= threshold cosine, and only those — re-derived via the brute-force
    pair scorer restricted to the operator's own cluster assignment."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 120)
    out = similarity.semantic_dedup(emb, threshold=0.35, k_centroids=4)
    rows = out.collect()
    assert len(rows) == 120
    cluster = {r["vec_id"]: r["centroid_id"] for r in rows}
    brute = similarity.embedding_near_dups_bruteforce(emb, threshold=0.35)
    expected_dups = {
        r["id_b"]
        for r in brute.collect()
        if cluster[r["id_a"]] == cluster[r["id_b"]]
    }
    assert {r["vec_id"] for r in rows if r["is_dup"]} == expected_dups


def test_semantic_dedup_cluster_count_bounded(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    out = similarity.semantic_dedup(emb, k_centroids=4).collect()
    assert {r["centroid_id"] for r in out} <= set(range(4))


def test_knn_graph_scores_agree_with_bruteforce_and_recall(spark, sf_dir):
    """Every (src, neighbor) edge's score must equal the brute-force cosine
    for that pair, ranks must be 1..k dense per source, and bucket-limited
    recall@3 vs the unrestricted top-3 must clear a sanity floor."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    edges = similarity.knn_graph(emb, k=3, n_planes=2).collect()
    per_src = {}
    for r in edges:
        per_src.setdefault(r["vec_id"], []).append(r)
    for src, rs in per_src.items():
        assert sorted(x["rank"] for x in rs) == list(range(1, len(rs) + 1))
    # scores match the exact pairwise cosine
    brute = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in similarity.embedding_near_dups_bruteforce(
            emb, threshold=-1.0
        ).collect()
    }
    for r in edges:
        key = (min(r["vec_id"], r["neighbor_id"]), max(r["vec_id"], r["neighbor_id"]))
        assert brute[key] == r["score"]
    # recall floor: deterministic hyperplanes -> stable measured recall.
    # On these near-random vectors recall@3 is 0.58/0.33/0.19 at 1/2/3
    # planes (the cost-vs-recall dial); 2 planes with a 0.2 floor leaves
    # real margin while still proving buckets beat chance (3/99 ~ 3%).
    import heapq

    truth_hits = total = 0
    for src, rs in per_src.items():
        scored = [
            (s, b if a == src else a)
            for (a, b), s in brute.items()
            if src in (a, b)
        ]
        top3 = {i for _, i in heapq.nlargest(3, scored)}
        truth_hits += len(top3 & {x["neighbor_id"] for x in rs})
        total += 3
    assert truth_hits / total > 0.2


def test_incremental_dedup_consistent_with_full_rebuild(spark, sf_dir):
    """Survivors of (index ∪ batch-dedup-vs-index) must cover exactly the
    fingerprint space of a from-scratch dedup over everything."""
    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 < 2)
    index = docs.filter(F.col("doc_id") % 10 >= 2)
    survivors = dedup.incremental_dedup(batch, index)
    idx_fps = {r["fingerprint"] for r in dedup.exact_dedup(index).collect()}
    new_fps = {r["fingerprint"] for r in survivors.collect()}
    all_fps = {r["fingerprint"] for r in dedup.exact_dedup(docs).collect()}
    assert new_fps.isdisjoint(idx_fps)
    assert idx_fps | new_fps == all_fps


def test_quality_classifier_flag_consistent(spark, sf_dir):
    from crypto_data_service_loader_spark.operators import text

    out = text.quality_classifier(load(spark, sf_dir, "documents")).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r["lm_quality"] <= 1.0
        assert r["keep"] == (r["lm_quality"] >= 0.5)


def test_corpus_report_reconciles(spark, sf_dir):
    from crypto_data_service_loader_spark.operators import training

    docs = load(spark, sf_dir, "documents")
    rep = training.corpus_report(docs).collect()
    assert sum(r["n_docs"] for r in rep) == docs.count()
    for r in rep:
        assert 0 < r["n_unique_docs"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] < 1.0


def test_zscore_degenerate_groups_flag_false_not_null(spark):
    """n == 1 and zero-variance groups have no defined z — they must come
    back with z null and is_outlier FALSE (not null): a single-member or
    constant series is never anomalous vs itself."""
    from crypto_data_service_loader_spark.operators import relational as rel

    ev = spark.createDataFrame(
        [
            (1, "solo", 42.0),               # n == 1
            (2, "flat", 7.0), (3, "flat", 7.0), (4, "flat", 7.0),  # var 0
            (5, "ok", 1.0), (6, "ok", 2.0), (7, "ok", 30.0),
        ],
        "event_id long, event_type string, value double",
    )
    rows = {r["event_id"]: r for r in rel.zscore_outliers(ev).collect()}
    assert len(rows) == 7
    for eid in (1, 2, 3, 4):
        assert rows[eid]["z"] is None
        assert rows[eid]["is_outlier"] is False  # false, never null
    assert all(rows[eid]["z"] is not None for eid in (5, 6, 7))


def test_zscore_outliers_moments(spark, sf_dir):
    """Per-group z scores must be standardized (mean ~0, std ~1) and the
    flag must match |z| >= threshold exactly."""
    from crypto_data_service_loader_spark.operators import relational as rel

    ev = load(spark, sf_dir, "events")
    out = rel.zscore_outliers(ev, z_threshold=2.5)
    agg = out.groupBy("event_type").agg(
        F.avg("z").alias("mz"), F.stddev("z").alias("sz")
    ).collect()
    for r in agg:
        assert abs(r["mz"]) < 1e-3
        assert abs(r["sz"] - 1.0) < 1e-3
    bad = out.filter(
        (F.abs(F.col("z")) >= 2.5) != F.col("is_outlier")
    ).count()
    assert bad == 0


def test_duplicated_ngram_spans_planted(spark):
    """Exact-dup docs: every window duplicated; a unique doc: none; a doc
    sharing only a 13-token prefix with another: exactly the windows inside
    the shared span. Short docs (< n tokens) report zero windows."""
    w = [f"w{i}" for i in range(30)]
    shared = " ".join(w[:13])
    base = [
        (0, " ".join(w)),                       # full 30-token doc
        (1, " ".join(w)),                       # exact dup of 0
        (2, shared + " unique tail of doc two only here now indeed"),
        (3, "totally different words " + " ".join(f"x{i}" for i in range(20))),
        (4, "tiny doc"),                        # < 13 tokens -> 0 windows
    ]
    from crypto_data_service_loader_spark.operators import dedup

    docs = spark.createDataFrame(base, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.duplicated_ngram_spans(docs, n=13).collect()}
    assert out[0]["n_windows"] == 30 - 12
    assert out[0]["n_dup_windows"] == out[0]["n_windows"]  # dup of doc 1
    assert out[1]["n_dup_windows"] == out[1]["n_windows"]
    assert out[2]["n_dup_windows"] == 1  # only the shared 13-token prefix
    assert out[3]["n_dup_windows"] == 0
    assert out[4]["n_windows"] == 0 and out[4]["dup_window_ratio"] == 0.0


def test_exact_substring_spans_planted(spark):
    """ExactSubstr semantics on hand-computed spans: a 60-char sentence
    shared by two docs (different surroundings) yields exactly the
    maximal span covering the sentence — span_start at the sentence's
    1-based offset, span_len 60, n_windows 60-50+1 = 11 — in BOTH docs;
    a within-doc repeat is found with no cross-doc partner; a unique doc
    and a doc shorter than min_len emit nothing."""
    from crypto_data_service_loader_spark.operators import dedup

    s = "S" + "hared sentence exactly sixty characters long padpadpad"  # noqa: E501
    s = (s + "X" * 60)[:60]
    assert len(s) == 60
    pre_a, pre_b = "A" * 17, "B" * 23
    rep = "R" * 11 + s + "M" * 7 + s + "Z" * 5  # within-doc repeat
    # unique filler with NO repeated 50-window of its own: an all-repeat
    # run like "n"*70 would self-duplicate (correct ExactSubstr
    # semantics — every window of a homogeneous run is identical)
    unique = "".join(chr(33 + i) for i in range(71))
    base = [
        (0, pre_a + s + "Q" * 9),
        (1, pre_b + s + "W" * 3),
        (2, rep),
        (3, unique),                 # unique; no duplicated window
        (4, "short"),                # < 50 chars
    ]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    out = dedup.exact_substring_spans(docs, min_len=50).collect()
    spans = {(r["doc_id"], r["span_start"]): (r["span_len"], r["n_windows"])
             for r in out}
    assert spans[(0, len(pre_a) + 1)] == (60, 11)
    assert spans[(1, len(pre_b) + 1)] == (60, 11)
    # doc 2 has two copies of s at offsets 12 and 12+60+7=79
    assert spans[(2, 12)] == (60, 11)
    assert spans[(2, 79)] == (60, 11)
    assert len(spans) == 4
    assert not any(r["doc_id"] in (3, 4) for r in out)


def test_exact_substring_spans_merges_adjacent_runs(spark):
    """Adjacent duplicated sentences merge into ONE maximal span: when
    doc 0 contains s1+s2 and docs 1/2 contain s1/s2 separately, every
    50-window inside s1, inside s2, AND crossing the junction of an
    exact two-doc pair is duplicated only where a partner exists — the
    junction windows exist only in doc 0, so spans stay separate; but
    two docs both containing s1+s2 merge the whole region."""
    from crypto_data_service_loader_spark.operators import dedup

    s1 = ("first shared sentence padded to sixty characters "
          + "a" * 60)[:60]
    s2 = ("second shared sentence padded to sixty characters "
          + "b" * 60)[:60]
    sep = "".join(chr(123 - i) for i in range(55))  # non-repeating gap
    base = [
        (0, "C" * 5 + s1 + s2 + "D" * 5),
        (1, "E" * 9 + s1 + s2 + "F" * 3),   # same concatenation
        (2, "G" * 7 + s1 + sep + s2),       # separated copies
    ]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    out = dedup.exact_substring_spans(docs, min_len=50).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_len"]))
    # docs 0/1 share the full 120-char concatenation -> ONE merged span
    assert by_doc[0] == [(6, 120)]
    assert by_doc[1] == [(10, 120)]
    # doc 2 shares s1 and s2 individually -> TWO 60-char spans
    assert sorted(by_doc[2]) == [(8, 60), (8 + 60 + 55, 60)]


def test_select_top_quality_percent_semantics(spark):
    """Exactly the best half of each group survives (percent_rank is a
    closed [0,1] rank: the <= frac cut keeps ceil-ish top share), the cut
    is per-group not global, and ties break deterministically on id."""
    from crypto_data_service_loader_spark.operators import training

    rows = [(i, "a", float(i)) for i in range(10)]          # quality 0..9
    rows += [(100 + i, "b", 5.0) for i in range(4)]         # all tied
    scored = spark.createDataFrame(rows, "doc_id long, source string, quality double")
    out = training.select_top_quality_percent(scored, frac=0.5).collect()
    got_a = sorted(r["doc_id"] for r in out if r["source"] == "a")
    # group a: pct_rank = (rank-1)/9 -> scores 9..5 at 0, 1/9..4/9 <= 0.5
    assert got_a == [5, 6, 7, 8, 9]
    got_b = sorted(r["doc_id"] for r in out if r["source"] == "b")
    # group b all tied: ranks 0, 1/3, 2/3, 1 -> ids 100,101 survive (<= .5)
    assert got_b == [100, 101]


def test_token_budget_fill_semantics(spark):
    """Docs fill in id order until the pre-doc running total hits the
    budget; the overflowing doc is kept once (fill-until-full), later
    docs are cut; groups fill independently."""
    from crypto_data_service_loader_spark.operators import training

    docs = spark.createDataFrame(
        [(1, "a", 40), (2, "a", 50), (3, "a", 30), (4, "a", 10),
         (5, "b", 200), (6, "b", 1)],
        "doc_id long, source string, n_chars long",
    )
    out = {r["doc_id"]: r["cum_before"] for r in
           training.token_budget_fill(docs, budget=100).collect()}
    # a: 1 (0) + 2 (40) + 3 (90 < 100, overflows once) kept; 4 (120) cut
    # b: 5 (0) kept; 6 (200 >= 100) cut
    assert out == {1: 0, 2: 40, 3: 90, 5: 0}


def test_token_budget_fill_quality_priority(spark):
    """ADVICE r5: priority must arrive as a column — order_col (with
    descending) makes the fill keep the BEST docs that fit, with id as
    the deterministic tie-break; input row order never matters."""
    from crypto_data_service_loader_spark.operators import training

    docs = spark.createDataFrame(
        [(1, "a", 60, 0.1), (2, "a", 60, 0.9), (3, "a", 60, 0.5),
         (4, "a", 60, 0.9)],
        "doc_id long, source string, n_chars long, quality double",
    )
    out = {r["doc_id"]: r["cum_before"] for r in
           training.token_budget_fill(
               docs, budget=100, order_col="quality", descending=True
           ).collect()}
    # fill order: q .9 id 2 (0), q .9 id 4 (60 < 100 overflows once);
    # q .5 id 3 (120) and q .1 id 1 cut
    assert out == {2: 0, 4: 60}
    # no order_col -> id asc (back-compat with the registered oracle)
    out2 = {r["doc_id"] for r in
            training.token_budget_fill(docs, budget=100).collect()}
    assert out2 == {1, 2}


def test_corpus_curation_pipeline_invariants(spark, sf_dir):
    """Composition invariants of the curation flagship: output ids unique
    (dedup held), per-source budget respected, and cum_before is exactly
    the running sum of the prior kept docs per source (the kept set is an
    id-ordered prefix of the survivors)."""
    from crypto_data_service_loader_spark.suite import (
        q_corpus_curation_pipeline,
    )

    rows = q_corpus_curation_pipeline(spark, sf_dir).collect()
    assert len(rows) > 0
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    by_src: dict = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        run = 0
        for r in rs:
            assert r["cum_before"] == run
            assert r["cum_before"] < 5000
            run += r["n_chars_clean"]


def test_remove_boilerplate_lines_planted(spark):
    """Shared header/footer lines (in > max_doc_freq docs) vanish from
    every doc; body lines survive in original order; a doc that was all
    boilerplate comes back empty; within-doc repetition alone does not
    make a line boilerplate."""
    from crypto_data_service_loader_spark.operators import dedup

    hdr, ftr = "SITE NAV HOME ABOUT", "(c) 2024 example inc"
    docs = spark.createDataFrame(
        [
            (0, f"{hdr}\nalpha body one\nbeta body two\n{ftr}"),
            (1, f"{hdr}\ngamma body\n{ftr}"),
            (2, f"{hdr}\ndelta body\n{ftr}"),
            (3, f"{hdr}\n{ftr}"),                      # all boilerplate
            (4, "solo\nsolo\nsolo"),                   # within-doc repeat only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.remove_boilerplate_lines(docs, max_doc_freq=2).collect()}
    assert out[0]["text_clean"] == "alpha body one\nbeta body two"
    assert out[0]["n_lines"] == 4 and out[0]["n_removed"] == 2
    assert out[1]["text_clean"] == "gamma body"
    assert out[3]["text_clean"] == "" and out[3]["n_removed"] == 2
    assert out[4]["text_clean"] == "solo\nsolo\nsolo"  # freq is per-DOC
    assert out[4]["n_removed"] == 0


def test_ngram_spans_sampled_approximates_exact(spark, sf_dir):
    """rate=1.0 reproduces the exact operator's numbers column-for-column;
    rate=0.25 keeps roughly a quarter of the windows and its corpus-level
    duplicated fraction lands near the exact one (the gram-hash gate keeps
    all occurrences of a kept gram together, so cross-doc detection is
    exact within the sample)."""
    from crypto_data_service_loader_spark.operators import dedup

    docs = load(spark, sf_dir, "documents")
    exact = {r["doc_id"]: r for r in
             dedup.duplicated_ngram_spans(docs, n=13).collect()}
    full = {r["doc_id"]: r for r in
            dedup.duplicated_ngram_spans_sampled(docs, n=13, rate=1.0).collect()}
    assert set(full) == set(exact)
    for did, r in full.items():
        assert r["n_windows_sampled"] == exact[did]["n_windows"]
        assert r["n_dup_windows_sampled"] == exact[did]["n_dup_windows"]

    sampled = dedup.duplicated_ngram_spans_sampled(docs, n=13, rate=0.25)
    agg = sampled.agg(
        F.sum("n_windows_sampled").alias("w"),
        F.sum("n_dup_windows_sampled").alias("d"),
    ).first()
    tot_w = sum(r["n_windows"] for r in exact.values())
    tot_d = sum(r["n_dup_windows"] for r in exact.values())
    # ~25% of window volume kept (hash spread, not Bernoulli variance)
    assert 0.15 * tot_w < agg["w"] < 0.35 * tot_w
    est = agg["d"] / agg["w"]
    true = tot_d / tot_w
    assert abs(est - true) < max(0.05, 0.5 * true)


def test_pagerank_empty_node_set_returns_empty(spark):
    """No nodes -> empty (id, pagerank) frame, not ZeroDivisionError."""
    from crypto_data_service_loader_spark.operators import graph

    edges = spark.createDataFrame([], "src string, dst string")
    nodes = spark.createDataFrame([], "vid string")
    out = graph.pagerank(edges, nodes, iters=2, id_col="vid")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vid", "pagerank"]
    assert out.schema["vid"].dataType.simpleString() == "string"


def test_pagerank_semantics(spark):
    """Ring graph -> uniform rank (symmetry); star graph -> the hub
    dominates; total rank stays <= 1 (dangling mass leaks, never grows)."""
    from crypto_data_service_loader_spark.operators import graph

    n = 10
    ring = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    nodes = spark.range(n).withColumnRenamed("id", "vid")
    pr = {r["vid"]: r["pagerank"] for r in
          graph.pagerank(ring, nodes, iters=5, id_col="vid").collect()}
    assert len(set(pr.values())) == 1            # symmetric -> uniform
    assert abs(sum(pr.values()) - 1.0) < 1e-6    # ring has no dangling mass

    star = spark.createDataFrame(
        [(i, 0) for i in range(1, n)], "src long, dst long"
    )
    spr = {r["vid"]: r["pagerank"] for r in
           graph.pagerank(star, nodes, iters=3, id_col="vid").collect()}
    # hub is dangling, so its collected mass leaks each round — assert
    # relative dominance (0.12975 vs 0.015 spokes), not absolute share
    assert spr[0] == max(spr.values())
    assert spr[0] > 5 * max(v for k, v in spr.items() if k != 0)
    assert sum(spr.values()) <= 1.0 + 1e-9       # hub dangles -> mass leaks


def test_ngram_containment_catches_excerpts(spark):
    """A short doc fully contained in a long one: containment for the
    short side is 1.0 while Jaccard is low — the asymmetric signal that
    justifies this operator beside the Jaccard verify."""
    long_doc = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10, 18))  # 8 tokens inside
    docs = spark.createDataFrame(
        [(0, long_doc), (1, excerpt)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    out = dedup.ngram_containment(docs, pairs).collect()[0]
    jac = dedup.ngram_jaccard(docs, pairs).collect()[0]["jaccard"]
    assert out["containment_b"] == 1.0   # excerpt fully inside the long doc
    assert out["containment_a"] < 0.2    # long doc barely covered
    assert jac < 0.2                     # Jaccard alone would miss it


def test_auto_dials_scale_with_corpus():
    """Bucket dials must hold expected bucket/cluster population constant:
    corpus x4 -> planes +2, centroids x4."""
    assert similarity.auto_planes(1024, target_bucket=256) == 2
    assert similarity.auto_planes(4096, target_bucket=256) == 4
    assert similarity.auto_planes(10, target_bucket=256) == 1  # floor
    assert similarity.auto_planes(10**12) == 24                # ceiling
    assert similarity.auto_centroids(1024, target_cluster=256) == 4
    assert similarity.auto_centroids(4096, target_cluster=256) == 16
    assert similarity.auto_centroids(1) == 2                   # floor


def test_auto_dials_are_the_default_and_grow_with_corpus(spark, sf_dir):
    """Production default: omitting the dial derives it from corpus size.
    knn_graph/embedding_near_dups_lsh bucket counts and semantic_dedup
    cluster counts must GROW as the corpus grows (the property that keeps
    per-bucket pair work linear at 100 TB)."""
    emb = load(spark, sf_dir, "embeddings")
    small = emb.filter(F.col("vec_id") < 40)
    # the dial the default resolves to, at two corpus sizes
    p_small = similarity._resolve_planes(small, None, None)
    p_big = similarity._resolve_planes(emb, None, 10_000_000)
    assert p_big > p_small
    assert similarity.auto_centroids(10_000_000) > similarity.auto_centroids(40)
    # no-dial calls run end-to-end (auto path), hint skips the count job
    edges = similarity.knn_graph(small, k=2, n_vectors_hint=40)
    assert edges.count() >= 0
    out = similarity.semantic_dedup(small, n_vectors_hint=40)
    assert out.count() == 40
    k_used = max(r["centroid_id"] for r in out.collect()) + 1
    assert k_used <= similarity.auto_centroids(40)
    pairs = similarity.embedding_near_dups_lsh(
        small, threshold=0.35, n_vectors_hint=40
    )
    assert pairs.count() >= 0


def test_semantic_dedup_with_auto_centroids(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 128)
    k = similarity.auto_centroids(128, target_cluster=32)
    out = similarity.semantic_dedup(emb, k_centroids=k).collect()
    assert len(out) == 128
    assert {r["centroid_id"] for r in out} <= set(range(k))


def test_bm25_topk_ranking_semantics(spark):
    """BM25 invariants on a crafted corpus: a doc matching more query
    terms outranks single-term matches; a corpus-ubiquitous term carries
    near-zero idf; ranks are dense 1..k with deterministic tie-break."""
    from crypto_data_service_loader_spark.operators import text

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"),
         (2, "alpha delta delta"),
         (3, "beta beta beta epsilon"),
         (4, "zeta eta theta"),
         (5, "alpha beta")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "alpha beta")], "query_id int, query_text string"
    )
    out = text.bm25_topk(docs, q, k=3).orderBy("rank").collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    # docs 1 and 5 match BOTH terms -> they occupy the top two slots
    assert {out[0]["doc_id"], out[1]["doc_id"]} == {1, 5}
    assert out[0]["score"] >= out[1]["score"] >= out[2]["score"]
    # doc 4 matches nothing -> never retrieved even with a larger k
    all_ids = {r["doc_id"] for r in text.bm25_topk(docs, q, k=10).collect()}
    assert 4 not in all_ids


def test_bm25_topk_prunes_postings_with_broadcast(spark):
    """Scale contract: the query-term join must be a broadcast (the tiny
    side) — the corpus postings never shuffle for the pruning step."""
    from crypto_data_service_loader_spark.operators import text

    docs = spark.createDataFrame(
        [(i, f"term{i % 7} filler words here") for i in range(100)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "term1 term2")], "query_id int, query_text string"
    )
    plan = text.bm25_topk(docs, q)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_triangle_counts_on_known_graph(spark):
    """K4 minus one edge: triangles {1,2,3} and {1,2,4}; coefficients
    2*tri/(deg*(deg-1)); isolated node gets zeros."""
    from crypto_data_service_loader_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 2), (4, 2)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    got = {r["id"]: (r["n_triangles"], r["degree"], r["clustering_coeff"])
           for r in graph.triangle_counts(edges, nodes).collect()}
    assert got == {
        1: (2, 3, 0.666667), 2: (2, 3, 0.666667),
        3: (1, 2, 1.0), 4: (1, 2, 1.0), 5: (0, 0, 0.0),
    }
    # direction/duplicate invariance: reversed + duplicated edges give
    # the same undirected answer
    rev = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 1), (2, 3), (2, 4), (1, 2)],
        "src long, dst long",
    )
    got2 = {r["id"]: (r["n_triangles"], r["degree"], r["clustering_coeff"])
            for r in graph.triangle_counts(rev, nodes).collect()}
    assert got2 == got


def test_hybrid_topk_rerank_semantics(spark, sf_dir):
    """Hybrid retrieval: every hit comes from the BM25 candidate pool,
    the final order is cosine (not BM25), and shrinking the candidate
    pool can only shrink (never reorder-above) the semantic ceiling."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators import text
    from crypto_data_service_loader_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    qdf = spark.createDataFrame(
        [(1, "fast table scan"), (3, "customer join query")],
        "query_id int, query_text string",
    )
    out = text.hybrid_topk(docs, emb, qdf, k=5, n_candidates=20)
    rows = out.collect()
    assert rows
    pool = {
        (r["query_id"], r["doc_id"])
        for r in text.bm25_topk(docs, qdf, k=20).collect()
    }
    for r in rows:
        assert (r["query_id"], r["doc_id"]) in pool
    # final ranking is by cosine desc (doc id tie-break), per query
    for qid in (1, 3):
        got = sorted(
            [r for r in rows if r["query_id"] == qid],
            key=lambda r: r["rank"],
        )
        assert [(-r["cosine"], r["doc_id"]) for r in got] == sorted(
            (-r["cosine"], r["doc_id"]) for r in got
        )
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    # with n_candidates == k the rerank degenerates to BM25's pool
    tight = text.hybrid_topk(docs, emb, qdf, k=5, n_candidates=5)
    tight_pool = {
        (r["query_id"], r["doc_id"])
        for r in text.bm25_topk(docs, qdf, k=5).collect()
    }
    assert {(r["query_id"], r["doc_id"]) for r in tight.collect()} == tight_pool


def test_ngram_lm_score_hand_computed(spark):
    """Hand-checkable bigram MLE corpus: c('a b')=3, c('b a')=1,
    c(a)=3 -> d0 = mean(1, 1, 1/3) = 0.777778, d1 = 1.0; the
    bigram-less doc gets a null score and a FALSE gate (not null)."""
    from crypto_data_service_loader_spark.operators import text as T

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "z")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in T.ngram_lm_score(docs, min_prob=0.9).collect()
    }
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["lm_score"] == pytest.approx(0.777778, abs=1e-6)
    assert rows[0]["ok_fluency"] is False
    assert rows[1]["lm_score"] == 1.0 and rows[1]["ok_fluency"] is True
    assert rows[2]["n_bigrams"] == 0
    assert rows[2]["lm_score"] is None
    assert rows[2]["ok_fluency"] is False


def test_ngram_lm_score_ranks_disfluent_text_lower(spark):
    """The deliverable: shuffled/gibberish text scores below natural
    repetition of corpus-frequent transitions — the perplexity-filter
    ordering, transcendental-free."""
    from crypto_data_service_loader_spark.operators import text as T

    fluent = "the model reads the data and the model writes the data"
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(8)]
        + [(8, "data writes and reads model the data the model the and")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["lm_score"] for r in T.ngram_lm_score(docs).collect()}
    assert rows[8] < rows[0]


def test_mixture_rebalance_math_and_composition(spark, sf_dir):
    """Weights are exactly target_share * total / source_tokens, and
    feeding them to mix_corpora_upsampled moves realized token shares to
    the target (within the 1/1000-bucket hash-gate granularity)."""
    from crypto_data_service_loader_spark.operators import training as TR

    docs = load(spark, sf_dir, "documents")
    targets = {"src0": 0.4, "src1": 0.4, "src2": 0.2}
    plan = TR.mixture_rebalance(docs, targets)
    rows = {r["source"]: r for r in plan.collect()}
    total = sum(r["n_tokens"] for r in rows.values())
    for src, tgt in targets.items():
        r = rows[src]
        assert r["target_share"] == tgt
        assert r["weight"] == pytest.approx(
            tgt * total / r["n_tokens"], abs=1e-6
        )
        assert r["repeat_epochs"] >= 1
    # unlisted sources: dropped (weight 0, zero epochs)
    others = [r for s, r in rows.items() if s not in targets]
    assert others and all(r["weight"] == 0.0 for r in others)
    # shares sum to 1 (rounding aside) and current numbers are consistent
    assert sum(r["current_share"] for r in rows.values()) == pytest.approx(
        1.0, abs=1e-3
    )

    mixed = TR.mix_corpora_upsampled(
        docs, {s: rows[s]["weight"] for s in targets}
    )
    n_tok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    got = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source").agg(F.sum(n_tok).alias("t")).collect()
    }
    mixed_total = sum(got.values())
    assert set(got) == set(targets)
    for src, tgt in targets.items():
        assert got[src] / mixed_total == pytest.approx(tgt, abs=0.05)


def test_hybrid_rrf_union_semantics(spark, sf_dir):
    """RRF is union-shaped: every fused row's score equals the sum of
    its member contributions, docs surfaced by a single retriever carry
    exactly one term, and both single-list cases appear at sf0.001
    (lexical-only and semantic-only hits)."""
    from crypto_data_service_loader_spark.operators import text as T

    qdf = spark.createDataFrame(
        [(1, "fast table scan"), (2, "stream window agg")],
        "query_id int, query_text string",
    )
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    out = T.hybrid_rrf(docs, emb, qdf, k=10, n_candidates=10).collect()
    assert out
    for r in out:
        want = 0.0
        if r["r_lex"] is not None:
            want += 1.0 / (60 + r["r_lex"])
        if r["r_sem"] is not None:
            want += 1.0 / (60 + r["r_sem"])
        assert r["rrf_score"] == pytest.approx(want, abs=1e-6)
        assert r["r_lex"] is not None or r["r_sem"] is not None
    # ranks are 1..k dense per query, ordered by score
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["rrf_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
    # both single-list shapes actually occur
    assert any(r["r_sem"] is None for r in out)
    assert any(r["r_lex"] is None for r in out)


def test_split_leakage_check_exact_and_gram_modes(spark):
    """Planted leak: two identical docs whose ids hash into different
    splits are reported exactly once in exact mode; gram mode catches
    an excerpt-level leak (shared 3-gram) that exact fingerprints miss;
    a clean corpus reports nothing."""
    from crypto_data_service_loader_spark.operators import training as TR
    from crypto_data_service_loader_spark.operators.training import (
        split_bucket,
    )

    # find two doc ids landing in different splits (train vs test)
    probe = spark.createDataFrame(
        [(i,) for i in range(400)], "doc_id long"
    ).select("doc_id", split_bucket("doc_id").alias("b")).collect()
    train_id = next(r["doc_id"] for r in probe if r["b"] < 900)
    test_id = next(r["doc_id"] for r in probe if r["b"] >= 950)

    leak = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (train_id, leak),
            (test_id, leak),
            (next(r["doc_id"] for r in probe if r["b"] < 900 and r["doc_id"] != train_id),
             "totally different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    exact = TR.split_leakage_check(docs).collect()
    assert [(r["split_a"], r["split_b"], r["n_shared_contents"]) for r in exact] == [
        ("test", "train", 1)
    ]
    # excerpt leak: only the first 3 tokens shared -> invisible to exact mode
    docs2 = spark.createDataFrame(
        [(train_id, "alpha beta gamma delta"), (test_id, "alpha beta gamma zeta")],
        "doc_id long, text string",
    )
    assert TR.split_leakage_check(docs2).collect() == []
    grams = TR.split_leakage_check(docs2, gram_n=3).collect()
    assert [(r["split_a"], r["split_b"], r["n_shared_contents"]) for r in grams] == [
        ("test", "train", 1)
    ]


def test_vector_quantize_int8_roundtrip(spark, sf_dir):
    """Quantized values stay in [-127, 127] with the max-magnitude
    element pinned at ±127; dequantized cosine vs the original is
    > 0.999 on the real embedding corpus; a zero vector quantizes to
    zeros with scale 0."""
    import math

    from crypto_data_service_loader_spark.operators.similarity import (
        quantize_vectors_int8,
    )

    emb = load(spark, sf_dir, "embeddings")
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    out = quantize_vectors_int8(emb).collect()
    assert len(out) == len(orig)
    worst = 1.0
    for r in out:
        q, s, v = r["qvec"], r["scale"], orig[r["vec_id"]]
        assert max(abs(x) for x in q) <= 127
        assert max(abs(x) for x in q) == 127  # max element saturates
        deq = [x * s for x in q]
        dot = sum(a * float(b) for a, b in zip(deq, v))
        na = math.sqrt(sum(a * a for a in deq))
        nb = math.sqrt(sum(float(b) * float(b) for b in v))
        worst = min(worst, dot / (na * nb))
    assert worst > 0.999

    z = spark.createDataFrame(
        [(0, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    zr = quantize_vectors_int8(z).collect()[0]
    assert zr["scale"] == 0.0 and zr["qvec"] == [0] * 8


def test_int8_search_preserves_topk_recall(spark, sf_dir):
    """Searching over dequantized int8 vectors reproduces >= 9 of the
    exact float top-10 — the measured justification for shipping the
    4x-smaller corpus to the ANN index."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators.similarity import (
        cosine_topk,
        quantize_vectors_int8,
    )

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact = {r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()}
    deq = quantize_vectors_int8(emb).select(
        "vec_id",
        F.transform(
            "qvec", lambda x: x.cast("double") * F.col("scale")
        ).alias("embedding"),
    )
    viaq = {r["vec_id"] for r in cosine_topk(deq, query, k=10).collect()}
    assert len(exact & viaq) >= 9


def test_mixture_temperature_upweights_low_resource(spark):
    """alpha < 1 moves the mix toward parity: a 90/10 corpus lands
    strictly between 90/10 and 50/50 at alpha 0.5 (sqrt smoothing),
    exactly at the analytic sqrt-normalized shares; alpha 1.0 is the
    identity (target == current); invalid alphas reject."""
    import math

    from crypto_data_service_loader_spark.operators import training as TR

    docs = spark.createDataFrame(
        [(i, "w " * 10, "big") for i in range(90)]
        + [(i + 90, "w " * 10, "small") for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in TR.mixture_temperature(docs, 0.5).collect()}
    big, small = out["big"], out["small"]
    # analytic: shares 0.9/0.1 -> sqrt 0.9487/0.3162 -> 0.75/0.25
    t_b, t_s = math.sqrt(0.9), math.sqrt(0.1)
    assert big["target_share"] == pytest.approx(t_b / (t_b + t_s), abs=1e-6)
    assert small["target_share"] == pytest.approx(t_s / (t_b + t_s), abs=1e-6)
    assert 0.1 < small["target_share"] < 0.5  # strictly toward parity
    assert small["weight"] > 1.0 > big["weight"]  # up- vs down-sample

    ident = {r["source"]: r for r in TR.mixture_temperature(docs, 1.0).collect()}
    for s in ("big", "small"):
        assert ident[s]["target_share"] == ident[s]["current_share"]

    with pytest.raises(ValueError):
        TR.mixture_temperature(docs, 0.7)


def test_recall_at_k_definition(spark):
    """recall = |approx ∩ exact| / |exact| with duplicates ignored; a
    perfect result reads 1.0, a disjoint one 0.0."""
    from crypto_data_service_loader_spark.operators.similarity import (
        recall_at_k,
    )

    exact = spark.createDataFrame([(i,) for i in range(10)], "vec_id long")
    part = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 3, 99]], "vec_id long"
    )
    r = recall_at_k(part, exact).collect()[0]
    assert (r["k_exact"], r["n_hit"], r["recall"]) == (10, 4, 0.4)
    full = recall_at_k(exact, exact).collect()[0]
    assert full["recall"] == 1.0
    miss = spark.createDataFrame([(100,), (101,)], "vec_id long")
    assert recall_at_k(miss, exact).collect()[0]["recall"] == 0.0


def test_recall_at_k_composite_pair_keys(spark):
    """Composite-key recall: pair sets compare on (id_a, id_b); order of
    rows and duplicate pairs don't matter."""
    from crypto_data_service_loader_spark.operators.similarity import (
        recall_at_k,
    )

    exact = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    approx = spark.createDataFrame(
        [(1, 2), (1, 2), (4, 5), (7, 9)], "id_a long, id_b long"
    )
    r = recall_at_k(approx, exact, id_col=["id_a", "id_b"]).collect()[0]
    assert (r["k_exact"], r["n_hit"], r["recall"]) == (4, 2, 0.5)


def test_split_by_content_closes_the_leak(spark):
    """The constructive fix for split leakage: two identical docs whose
    IDS hash into different splits land in the SAME split under the
    content-keyed assignment (both carry the cluster canonical id), and
    an exact-mode leakage re-audit over the content splits is empty;
    unique docs keep a stable id-derived assignment."""
    from crypto_data_service_loader_spark.operators import training as TR
    from crypto_data_service_loader_spark.operators.training import (
        split_bucket,
    )

    probe = spark.createDataFrame(
        [(i,) for i in range(400)], "doc_id long"
    ).select("doc_id", split_bucket("doc_id").alias("b")).collect()
    train_id = next(r["doc_id"] for r in probe if r["b"] < 900)
    test_id = next(r["doc_id"] for r in probe if r["b"] >= 950)
    leak = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(train_id, leak), (test_id, leak),
         (next(r["doc_id"] for r in probe
               if r["b"] < 900 and r["doc_id"] != train_id), "something else")],
        "doc_id long, text string",
    )
    # id-hash split leaks (sanity: the audit sees it) ...
    assert TR.split_leakage_check(docs).collect() != []
    # ... the content split does not
    out = {r["doc_id"]: r for r in TR.split_by_content(docs).collect()}
    assert out[train_id]["split"] == out[test_id]["split"]
    assert out[train_id]["canonical_id"] == out[test_id]["canonical_id"] == min(
        train_id, test_id
    )
    # no fingerprint spans two splits
    by_canon = {}
    for r in out.values():
        by_canon.setdefault(r["canonical_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_canon.values())


def test_jaccard_prefix_join_equals_bruteforce(spark, sf_dir):
    """Prefix filtering is EXACT: result == all-pairs exact Jaccard at
    the threshold (100% recall, no FPs); edge cases: empty docs and
    sub-threshold pairs drop out; integer threshold guard raises."""
    import pytest
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators import dedup
    from crypto_data_service_loader_spark.tables import load

    docs = load(spark, sf_dir, "documents").limit(300)
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.jaccard_prefix_join(docs, 7, 10).collect()
    }
    sets = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != ""
            )
        ).alias("tk"),
    )
    brute = (
        sets.alias("a")
        .join(sets.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.size(F.array_intersect("a.tk", "b.tk")).cast("long").alias("i"),
            (F.size("a.tk") + F.size("b.tk")).cast("long").alias("ss"),
        )
        .where(10 * F.col("i") >= 7 * (F.col("ss") - F.col("i")))
        .select(
            "id_a", "id_b",
            F.round(
                F.col("i").cast("double") / (F.col("ss") - F.col("i")), 6
            ).alias("jaccard"),
        )
    )
    want = {(r["id_a"], r["id_b"], r["jaccard"]) for r in brute.collect()}
    assert got == want and want  # non-trivial: sf docs repeat phrases

    edge = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "a b c x"), (4, ""), (5, "zz")],
        "doc_id int, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_prefix_join(edge, 7, 10).collect()
    }
    assert pairs == {(1, 2)}  # (1,3): J = 3/5 = 0.6 < 0.7; empty/singleton drop
    # J exactly at the threshold is kept (integer predicate, no float edge)
    at = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g w y z")],
        "doc_id int, text string",
    )  # inter 7, union 13 -> 0.538 < 0.7; use 5/10: 7/13 >= 0.5 -> kept
    assert dedup.jaccard_prefix_join(at, 5, 10).count() == 1

    with pytest.raises(ValueError, match="threshold"):
        dedup.jaccard_prefix_join(edge, 11, 10)


def test_dsir_importance_prefers_target_like_docs(spark):
    """Integerized DSIR: candidates sharing the target's bigrams score
    above candidates that don't; gramless docs score 0; composing with
    sample_pps keeps everything integer-exact."""
    from pyspark.sql import functions as F

    from crypto_data_service_loader_spark.operators import relational as rel
    from crypto_data_service_loader_spark.operators import training

    target = spark.createDataFrame(
        [(100, "alpha beta gamma alpha beta")], "doc_id int, text string"
    )
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"),      # target-like
         (2, "delta epsilon zeta"),    # disjoint
         (3, "alpha beta alpha beta"), # very target-like
         (4, "solo")],                 # no bigrams
        "doc_id int, text string",
    )
    imp = {r["doc_id"]: r["importance"]
           for r in training.dsir_importance(docs, target).collect()}
    assert imp[3] > imp[1] > imp[2] > 0
    assert imp[4] == 0

    drawn = rel.sample_pps(
        training.dsir_importance(docs, target), "doc_id", "importance", k=2
    ).collect()
    assert sum(r["multiplicity"] for r in drawn) == 2
    assert all(r["doc_id"] != 4 for r in drawn)  # zero weight never drawn


def test_byte_grid_fingerprint_locality_fixed_threshold(spark):
    """Fixed-threshold (blockhash-style) fingerprints are LOCAL: changing
    the last byte of a payload can only flip the cell containing it —
    Hamming distance <= 1 — while the mean rule may flip distant
    borderline cells. Also pins n_cells validation."""
    base = b"deadbeefcafef00d" * 4  # 64 bytes -> 128 hex chars, 32 cells
    pert = base[:-1] + b"X"
    media = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(pert))],
        "media_id long, payload binary",
    )
    fps = {
        r["media_id"]: r["fp"]
        for r in multimodal.byte_grid_fingerprint(
            media, n_cells=32, threshold=9
        ).collect()
    }
    ham = bin(fps[0] ^ fps[1]).count("1")
    assert ham <= 1
    with pytest.raises(ValueError, match="n_cells"):
        multimodal.byte_grid_fingerprint(media, n_cells=64)


def test_fingerprint_near_dup_pigeonhole_recall(spark):
    """Every pair within Hamming < bands MUST be found (pigeonhole: some
    whole band agrees), and pairs beyond max_hamming are rejected by the
    exact verify even when a band collides."""
    from pyspark.sql import functions as F

    # fp pairs: (0,1) ham=2 (found), (2,3) ham=8 but share band 0
    # (rejected by verify), (4,5) identical (ham 0)
    rows = [
        (0, 0b0011), (1, 0b1100_0000_0000_0011 ^ 0b0011_0000_0000_0000),
        (2, 0xFF00_00AA), (3, 0x00FF_00AA),
        (4, 0x1234_5678), (5, 0x1234_5678),
    ]
    # fix pair (0,1) to true hamming 2: flip two adjacent low bits
    rows[1] = (1, rows[0][1] ^ 0b0110)
    fps = spark.createDataFrame(rows, "media_id long, fp long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal.fingerprint_near_dup_join(
            fps, n_cells=32, bands=4, max_hamming=3
        ).collect()
    }
    assert got.get((0, 1)) == 2
    assert got.get((4, 5)) == 0
    assert (2, 3) not in got  # band collision but hamming 16 > 3
    with pytest.raises(ValueError, match="bands"):
        multimodal.fingerprint_near_dup_join(fps, n_cells=32, bands=5)


def test_sniff_media_format_signatures(spark):
    """Magic sniffing: every documented signature detects, mp4 detects at
    byte offset 4, unknown payloads and unmapped mimes audit false."""
    payloads = [
        (0, bytes.fromhex("89504E47") + b"rest", "image/png", "png", True),
        (1, bytes.fromhex("FFD8FF") + b"rest", "image/png", "jpeg", False),
        (2, b"GIF89a...", "image/gif", "gif", True),
        (3, b"RIFF....WAVE", "audio/wav", "riff", True),
        (4, bytes.fromhex("00000018") + b"ftypisom", "video/mp4", "mp4", True),
        (5, b"%PDF-1.7", "application/pdf", "pdf", True),
        (6, b"plain text", "image/png", "unknown", False),
        # correct png magic under a mime the audit has no signature for:
        # unauditable is NOT ok
        (7, bytes.fromhex("89504E47") + b"x", "image/webp", "png", False),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(p), m) for i, p, m, _, _ in payloads],
        "media_id long, payload binary, mime string",
    )
    got = {r["media_id"]: r for r in multimodal.sniff_media_format(media).collect()}
    for i, _, _, want_fmt, want_ok in payloads:
        assert got[i]["detected_format"] == want_fmt, i
        assert got[i]["magic_ok"] == want_ok, i


def test_auto_grid_cells_dial():
    """Width dial: pinned 32 below the small-corpus knee, grows with the
    corpus so 2^(cells/bands) tracks n/target, clamps at 60 (int64 pack),
    always divisible by bands."""
    assert multimodal.auto_grid_cells(100) == 32
    assert multimodal.auto_grid_cells(256 * 256) == 32        # knee
    assert multimodal.auto_grid_cells(256 * 512) == 36        # r=9
    assert multimodal.auto_grid_cells(256 * (2 ** 12)) == 48  # r=12
    assert multimodal.auto_grid_cells(10 ** 12) == 60         # clamp
    for n in (10, 10**4, 10**6, 10**9):
        c = multimodal.auto_grid_cells(n)
        assert c % 4 == 0 and 32 <= c <= 60


def test_media_near_dup_pairs_dial_and_recall(spark):
    """The composed entry point: (a) with the dial active on a small
    corpus it resolves to the pinned 32 cells, so results equal the
    explicit-32 call; (b) at a WIDER explicit dial every constructed
    twin is still found (locality: a 2-byte perturbation flips <= 2
    cells at any width, Hamming < bands)."""
    import hashlib

    rows = []
    for i in range(40):
        base = hashlib.md5(f"doc{i}".encode()).hexdigest().encode()
        rows.append((i, base))
        rows.append((i + 1000, base[:-2] + b"zz"))  # tail-perturbed twin
    media = spark.createDataFrame(rows, "media_id long, payload binary")

    dialed = {
        (r["id_a"], r["id_b"])
        for r in multimodal.media_near_dup_pairs(
            media, bands=4, max_hamming=3
        ).collect()
    }
    pinned = {
        (r["id_a"], r["id_b"])
        for r in multimodal.media_near_dup_pairs(
            media, bands=4, n_cells=32, max_hamming=3
        ).collect()
    }
    assert dialed == pinned  # dial resolves to 32 below the knee
    for i in range(40):
        assert (i, i + 1000) in dialed, i

    wide = {
        (r["id_a"], r["id_b"])
        for r in multimodal.media_near_dup_pairs(
            media, bands=4, n_cells=60, max_hamming=3
        ).collect()
    }
    for i in range(40):
        assert (i, i + 1000) in wide, i


def test_corpus_count_shared_across_dials(spark, monkeypatch):
    """The dial-resolution count is ONE job per corpus per session:
    _resolve_planes, semantic_dedup's auto k, and the media width dial
    all route through similarity.corpus_count, memoized on the analyzed
    plan — composing them over the same corpus triggers a single count.
    An explicit hint skips the job entirely."""
    import hashlib

    from crypto_data_service_loader_spark.operators import similarity

    similarity._CORPUS_COUNT_MEMO.clear()
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cls = type(emb)  # Spark 4: the classic DataFrame subclass owns count()
    calls = {"n": 0}
    orig = cls.count

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "count", counting)
    assert similarity.corpus_count(emb, hint=7) == 7
    assert calls["n"] == 0  # hint skips the job
    assert similarity._resolve_planes(emb, None, None) >= 1
    assert calls["n"] == 1
    similarity.semantic_dedup(emb)  # auto k_centroids, same corpus
    assert calls["n"] == 1  # memo hit — no second count job
    media = spark.createDataFrame(
        [(i, hashlib.md5(str(i).encode()).hexdigest().encode())
         for i in range(20)],
        "media_id long, payload binary",
    )
    multimodal.media_near_dup_pairs(media)  # different corpus
    assert calls["n"] == 2
    multimodal.media_near_dup_pairs(media)  # same corpus again: memo hit
    assert calls["n"] == 2
    # VERDICT r11 #5 — the COMPOSED production pipelines: an auto-dialed
    # kNN graph plus a second semantic-dedup pass over the same corpus
    # must ride the same memo entry: zero additional count jobs (the r11
    # memoization REMOVED the per-operator count, it didn't move it)
    similarity.knn_graph(emb, k=2)          # auto n_planes, same corpus
    similarity.semantic_dedup(emb)          # auto k_centroids, same corpus
    assert calls["n"] == 2
    # the round-12 mining ops default to the SAME auto dial + memo (the
    # 30x probe showed the pinned dial is quadratic; the production
    # default must stay dialed and must not re-count). The labeled
    # projection is a DIFFERENT plan -> one new memo entry, shared by
    # both mining ops.
    labeled = emb.withColumn("label", (F.col("vec_id") % 2).cast("int"))
    similarity.hard_negatives(labeled, k=1)
    assert calls["n"] == 3
    similarity.contrastive_triplets(labeled, n_negatives=1)
    assert calls["n"] == 3
    # and a hinted composed run never counts at all
    similarity._CORPUS_COUNT_MEMO.clear()
    similarity.knn_graph(emb, k=2, n_vectors_hint=20)
    similarity.semantic_dedup(emb, n_vectors_hint=20)
    assert calls["n"] == 3  # unchanged from the labeled-corpus count
    similarity._CORPUS_COUNT_MEMO.clear()


def test_resize_bmp24_nearest_neighbor():
    """Real resize: 4x3 -> 2x2 nearest-neighbor picks logical rows
    {0*3//2, 1*3//2} = {0, 1} and cols {0, 2}; output is itself a valid
    BMP whose decode equals the hand-selected pixels. Top-down input
    (negative height) resolves to the same logical grid."""
    px = [(10 * r + c, 100 + r, 200 + c) for r in range(3) for c in range(4)]
    src = _make_bmp(4, 3, px)
    out = multimodal._resize_bmp24(src, 2, 2)
    want_px = [px[0 * 4 + 0], px[0 * 4 + 2], px[1 * 4 + 0], px[1 * 4 + 2]]
    got = multimodal._decode_bmp24(out)
    assert got == (2, 2, 4,
                   sum(p[0] for p in want_px),
                   sum(p[1] for p in want_px),
                   sum(p[2] for p in want_px))
    top_down = multimodal._resize_bmp24(_make_bmp(4, -3, px), 2, 2)
    assert multimodal._decode_bmp24(top_down) == got
    assert multimodal._resize_bmp24(b"junk", 2, 2) is None
    assert multimodal._resize_bmp24(None, 2, 2) is None


def test_resize_images_real_and_fake_dispatch(spark):
    px = [(1, 2, 3)] * 16
    bmp = _make_bmp(4, 4, px)
    media = spark.createDataFrame(
        [(1, "image", bmp, "image/bmp", 4, 4, None),
         (2, "image", b"not-bmp", "image/png", 1, 1, None)],
        multimodal_schema(),
    )
    got = {r["media_id"]: r for r in
           multimodal.resize_images(media, 2, 2, fake=True).collect()}
    assert multimodal._decode_bmp24(bytes(got[1]["payload"]))[:3] == (2, 2, 4)
    assert bytes(got[2]["payload"]) == b"not-bmp"  # fake passthrough
    only_bmp = spark.createDataFrame(
        [(1, "image", bmp, "image/bmp", 4, 4, None)], multimodal_schema()
    )
    real = multimodal.resize_images(only_bmp, 2, 2, fake=False).collect()
    assert len(real) == 1  # BMP no longer needs the fake
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.resize_images(media, 2, 2, fake=False).collect()


def _make_ppm(width, height, pixels_rgb, header_extra=b""):
    body = b"".join(bytes(p) for p in pixels_rgb)
    return (b"P6" + header_extra + f"\n{width} {height}\n255\n".encode()
            + body)


def test_ppm_decode_real_and_corrupt():
    """_decode_ppm6 is a real P6 parser: header comments, arbitrary
    whitespace, RGB channel order (B and R swap vs the BMP tuple),
    corrupt rejection."""
    px = [(i, 10 + i, 100 + i) for i in range(6)]  # RGB tuples, 3x2
    want = (3, 2, 6, sum(p[2] for p in px), sum(p[1] for p in px),
            sum(p[0] for p in px))  # tuple is (.., sum_b, sum_g, sum_r)
    assert multimodal._decode_ppm6(_make_ppm(3, 2, px)) == want
    commented = (b"P6\n# a comment\n3 # widths\n2\n255\n"
                 + b"".join(bytes(p) for p in px))
    assert multimodal._decode_ppm6(commented) == want
    assert multimodal._decode_ppm6(None) is None
    assert multimodal._decode_ppm6(b"P5\n3 2\n255\n" + b"x" * 18) is None
    assert multimodal._decode_ppm6(_make_ppm(3, 2, px)[:-1]) is None
    assert multimodal._decode_ppm6(b"P6\n3 2\n70000\n" + b"x" * 18) is None
    # magic dispatch routes each format to its parser
    assert multimodal._decode_image(_make_ppm(3, 2, px)) == ("ppm", want)
    bmp = _make_bmp(2, 2, [(1, 2, 3)] * 4)
    assert multimodal._decode_image(bmp)[0] == "bmp"
    assert multimodal._decode_image(b"junk") == (None, None)


def test_decode_image_stats_mixed_formats(spark):
    """One table, both formats: the fmt column reports which parser ran
    and the channel sums prove it (same bytes, swapped B/R)."""
    raw = bytes(range(48))
    bmp = _make_bmp(4, 4, [tuple(raw[i:i + 3]) for i in range(0, 48, 3)])
    ppm = b"P6\n4 4\n255\n" + raw
    media = spark.createDataFrame(
        [(1, bmp), (2, ppm), (3, b"junk")], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in
           multimodal.decode_image_stats(media).collect()}
    assert got[1]["fmt"] == "bmp" and got[2]["fmt"] == "ppm"
    # identical pixel bytes: G sums agree, B/R swap between formats
    assert got[1]["sum_g"] == got[2]["sum_g"]
    assert got[1]["sum_b"] == got[2]["sum_r"]
    assert got[1]["sum_r"] == got[2]["sum_b"]
    assert not got[3]["decode_ok"] and got[3]["fmt"] is None


def test_decode_and_featurize_real_ppm_branch(spark):
    ppm = b"P6\n2 2\n255\n" + bytes([255, 0, 0] * 4)  # pure red, RGB
    media = spark.createDataFrame(
        [(1, "image", ppm, "image/x-portable-pixmap", 2, 2, None)],
        multimodal_schema(),
    )
    row = multimodal.decode_and_featurize(media, fake=False).collect()[0]
    assert row["decode_ok"]
    # mean_b, mean_g, mean_r — red ends up in the R slot despite RGB disk order
    assert list(row["feature"])[3:6] == [0.0, 0.0, 255.0]


def test_resize_ppm6_real():
    """PPM resize: same nearest-neighbor rule as BMP, P6 back out; the
    resized payload decodes to the hand-selected pixels (RGB order)."""
    px = [(10 * r + c, 100 + r, 200 + c) for r in range(3) for c in range(4)]
    src = _make_ppm(4, 3, px)
    out = multimodal._resize_ppm6(src, 2, 2)
    want_px = [px[0 * 4 + 0], px[0 * 4 + 2], px[1 * 4 + 0], px[1 * 4 + 2]]
    # decoder tuple is (w, h, n, sum_b, sum_g, sum_r); PPM tuples are RGB
    assert multimodal._decode_ppm6(out) == (
        2, 2, 4,
        sum(p[2] for p in want_px),
        sum(p[1] for p in want_px),
        sum(p[0] for p in want_px),
    )
    # header comments survive re-location of the pixel offset
    commented = (b"P6\n# c\n4 3\n255\n" + b"".join(bytes(p) for p in px))
    assert multimodal._resize_ppm6(commented, 2, 2) == out
    assert multimodal._resize_ppm6(b"junk", 2, 2) is None


def test_media_index_auto_dial(spark, tmp_path):
    """write_media_index(n_cells=None) resolves the width dial from the
    corpus and FREEZES it in the metadata; append + probe use the stored
    dial."""
    import hashlib

    from crypto_data_service_loader_spark.sources import media_index

    rows = [(i, hashlib.md5(str(i).encode()).hexdigest().encode())
            for i in range(30)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    path = str(tmp_path / "midx")
    n = media_index.write_media_index(media, path, n_cells=None)
    assert n == 30
    meta = media_index._read_meta(path)
    assert meta["n_cells"] == 32  # below the knee -> pinned default
    twin = spark.createDataFrame(
        [(1000, rows[0][1][:-2] + b"zz")], "media_id long, payload binary"
    )
    got = media_index.near_dups_against_media_index(spark, path, twin)
    assert {r["dup_of"] for r in got.collect()} == {0}


def _make_wav(samples, channels=1, rate=8000, extra_chunk=False):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<IHHIIHH", 16, 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + fmt
    if extra_chunk:  # odd-sized chunk exercises word alignment
        chunks = b"LIST" + struct.pack("<I", 3) + b"abc\x00" + chunks
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav16_decode_real_and_corrupt():
    """_decode_wav16 walks RIFF chunks for real: negative samples,
    word-aligned odd chunks before fmt/data, non-PCM rejection."""
    samples = [0, 1, -1, 32767, -32768, 100]
    want = (1, 8000, 6, sum(samples), -32768, 32767,
            sum(s * s for s in samples))
    assert multimodal._decode_wav16(_make_wav(samples)) == want
    assert multimodal._decode_wav16(
        _make_wav(samples, extra_chunk=True)) == want
    assert multimodal._decode_wav16(None) is None
    assert multimodal._decode_wav16(b"RIFFxxxxWAVE") is None  # no chunks
    assert multimodal._decode_wav16(_make_wav(samples)[:-1]) is None
    bad = bytearray(_make_wav(samples))
    bad[20] = 3  # IEEE-float format, not PCM
    assert multimodal._decode_wav16(bytes(bad)) is None
    # multi-'data' file: standard readers take the FIRST data chunk
    # (ADVICE r11) — a second one appended after the valid WAV is ignored
    import struct as _st
    extra = [7, 7]
    tail = b"data" + _st.pack("<I", 4) + b"".join(
        _st.pack("<h", s) for s in extra)
    two = bytearray(_make_wav(samples))
    two += tail
    _st.pack_into("<I", two, 4, len(two) - 8)
    assert multimodal._decode_wav16(bytes(two)) == want


def test_decode_audio_stats(spark):
    samples = [10, -20, 30]
    media = spark.createDataFrame(
        [(1, _make_wav(samples, channels=1, rate=44100)), (2, b"nope")],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in
           multimodal.decode_audio_stats(media).collect()}
    ok = got[1]
    assert (ok["channels"], ok["sample_rate"], ok["n_samples"]) == (1, 44100, 3)
    assert (ok["sum_amp"], ok["min_amp"], ok["max_amp"]) == (20, -20, 30)
    assert ok["sum_sq"] == 100 + 400 + 900
    assert not got[2]["decode_ok"]


# --- decoder property fuzz (round 11): random dimensions/payloads vs an
# --- independent per-test reference; no Spark in the loop, so these are
# --- cheap enough to run many examples.

from hypothesis import given, settings, strategies as st  # noqa: E402

_DECODE_FUZZ = settings(max_examples=60, deadline=None)

_DIM = st.integers(1, 8)
_PIX = st.integers(0, 255)


@_DECODE_FUZZ
@given(w=_DIM, h=_DIM, flat=st.data(), topdown=st.booleans(),
       tail=st.integers(0, 5))
def test_bmp_decode_property(w, h, flat, topdown, tail):
    px = flat.draw(st.lists(
        st.tuples(_PIX, _PIX, _PIX), min_size=w * h, max_size=w * h))
    payload = _make_bmp(w, -h if topdown else h, px, extra_tail=b"x" * tail)
    got = multimodal._decode_bmp24(payload)
    assert got == (w, h, w * h,
                   sum(p[0] for p in px), sum(p[1] for p in px),
                   sum(p[2] for p in px))
    # truncating into the pixel array must reject, never mis-sum
    # (the slice endpoint is absolute, so it cuts pixels even when a
    # tail was appended)
    assert multimodal._decode_bmp24(
        payload[:54 + (w * 3 + 3) // 4 * 4 * h - 1]) is None


@_DECODE_FUZZ
@given(w=_DIM, h=_DIM, tw=_DIM, th=_DIM, flat=st.data())
def test_bmp_resize_property(w, h, tw, th, flat):
    px = flat.draw(st.lists(
        st.tuples(_PIX, _PIX, _PIX), min_size=w * h, max_size=w * h))
    out = multimodal._resize_bmp24(_make_bmp(w, h, px), tw, th)
    want = [px[(r * h // th) * w + (c * w // tw)]
            for r in range(th) for c in range(tw)]
    assert multimodal._decode_bmp24(out) == (
        tw, th, tw * th,
        sum(p[0] for p in want), sum(p[1] for p in want),
        sum(p[2] for p in want))


@_DECODE_FUZZ
@given(w=_DIM, h=_DIM, flat=st.data())
def test_ppm_bmp_agree_property(w, h, flat):
    """The SAME logical pixels through both real paths: PPM stores RGB,
    BMP stores BGR — decoders must agree after the swap."""
    px = flat.draw(st.lists(
        st.tuples(_PIX, _PIX, _PIX), min_size=w * h, max_size=w * h))
    bmp = multimodal._decode_bmp24(_make_bmp(w, h, px))
    rgb = [(p[2], p[1], p[0]) for p in px]  # same pixels, RGB tuples
    ppm = multimodal._decode_ppm6(_make_ppm(w, h, rgb))
    assert bmp == ppm


@_DECODE_FUZZ
@given(samples=st.lists(st.integers(-32768, 32767), min_size=1,
                        max_size=40),
       channels=st.integers(1, 2), rate=st.sampled_from([8000, 44100]),
       extra=st.booleans())
def test_wav_decode_property(samples, channels, rate, extra):
    got = multimodal._decode_wav16(
        _make_wav(samples, channels=channels, rate=rate, extra_chunk=extra))
    assert got == (channels, rate, len(samples), sum(samples),
                   min(samples), max(samples),
                   sum(s * s for s in samples))


def _png_case(seed=b"seed", w=4, h=5):
    import hashlib

    chain = b""
    x = seed
    while len(chain) < w * h * 3:
        x = hashlib.md5(x).digest()
        chain += x
    return chain[: w * h * 3]


def test_png_decode_all_filters():
    """_decode_png reverses every PNG filter type: the encoder applies
    r % 5 per row (None/Sub/Up/Average/Paeth all present at h=5), and a
    per-filter encode (all rows same type) must reproduce identical
    stats — the un-filter is exact, not approximate."""
    import numpy as np

    rgb = _png_case()
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    want = (4, 5, 20, int(a[:, 2].sum()), int(a[:, 1].sum()),
            int(a[:, 0].sum()))
    assert multimodal._decode_png(multimodal._encode_png(rgb, 4, 5)) == want
    for ftype in range(5):
        one = multimodal._encode_png(rgb, 4, 5, filters=[ftype] * 5)
        assert multimodal._decode_png(one) == want, f"filter {ftype}"


def test_png_decode_rejects_corruption():
    """CRC damage, truncation, non-RGB color types, unknown filter
    bytes, and garbage all decode to None — never a wrong answer."""
    import struct
    import zlib

    png = multimodal._encode_png(_png_case(), 4, 5)
    assert multimodal._decode_png(None) is None
    assert multimodal._decode_png(b"\x89PNG") is None
    assert multimodal._decode_png(png[:40]) is None
    bad_crc = bytearray(png)
    bad_crc[-5] ^= 0xFF  # IEND crc
    assert multimodal._decode_png(bytes(bad_crc)) is None

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    # RGBA color type is rejected (not misread as RGB)
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 6, 0, 0, 0)
    idat = png[41:-12 - 12]  # not even parsed — IHDR rejects first
    rgba = multimodal._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", idat) + chunk(b"IEND", b"")
    assert multimodal._decode_png(rgba) is None
    # unknown filter type inside a valid zlib stream
    stride = 4 * 3
    raw = bytes([7]) + bytes(stride)  # filter 7 does not exist
    bad_filter = multimodal._PNG_SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 0)
    ) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    assert multimodal._decode_png(bad_filter) is None
    # short IDAT (valid zlib, wrong length)
    short = multimodal._PNG_SIG + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    ) + chunk(b"IDAT", zlib.compress(bytes(5))) + chunk(b"IEND", b"")
    assert multimodal._decode_png(short) is None


def test_png_grayscale_and_rgba():
    """Color-type coverage: 8-bit grayscale (bpp 1) expands to RGB with
    all channels equal, RGBA (bpp 4) drops the alpha — and the bpp-aware
    un-filter handles Sub/Paeth at bpp=1 (left neighbor is the adjacent
    BYTE, not 3 back). 16-bit depth and palette stay rejected."""
    import struct
    import zlib

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF))

    def png(color, w, h, lines):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (multimodal._PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))

    gray = bytes([10, 20, 30, 40, 50, 60])
    lines = bytes([0]) + gray[:3] + bytes([0]) + gray[3:]
    assert multimodal._decode_png(png(0, 3, 2, lines)) == (3, 2, 6, 210, 210, 210)
    # Sub filter at bpp=1: deltas against the PREVIOUS BYTE
    sub0 = bytes([1, 10, 10, 10])          # decodes to 10,20,30
    up1 = bytes([2, 30, 30, 30])           # up-deltas -> 40,50,60
    assert multimodal._decode_png(png(0, 3, 2, sub0 + up1)) == (
        3, 2, 6, 210, 210, 210)
    rgba = bytes([1, 2, 3, 255, 4, 5, 6, 0, 7, 8, 9, 128, 10, 11, 12, 7])
    lines = bytes([0]) + rgba[:8] + bytes([0]) + rgba[8:]
    assert multimodal._decode_png(png(6, 2, 2, lines)) == (2, 2, 4, 30, 26, 22)
    # grayscale resizes through the shared RGB path
    g = png(0, 3, 2, bytes([0]) + gray[:3] + bytes([0]) + gray[3:])
    assert multimodal._decode_png(multimodal._resize_png(g, 1, 1)) == (
        1, 1, 1, 10, 10, 10)
    # 16-bit depth / palette color types rejected
    ihdr16 = struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0)
    bad = (multimodal._PNG_SIG + chunk(b"IHDR", ihdr16)
           + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))
    assert multimodal._decode_png(bad) is None
    ihdr_pal = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    bad = (multimodal._PNG_SIG + chunk(b"IHDR", ihdr_pal)
           + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))
    assert multimodal._decode_png(bad) is None


def test_png_palette_decode():
    """Color type 3: indices resolve through the PLTE chunk; a missing
    PLTE, an out-of-range index, and a malformed (non-multiple-of-3)
    palette are all rejected rather than misread."""
    import struct
    import zlib

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF))

    plte = bytes([10, 20, 30, 200, 100, 50])
    lines = bytes([0]) + bytes([0, 1, 1]) + bytes([0]) + bytes([1, 0, 0])
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)

    def png(palette, idat):
        out = multimodal._PNG_SIG + chunk(b"IHDR", ihdr)
        if palette is not None:
            out += chunk(b"PLTE", palette)
        return out + chunk(b"IDAT", zlib.compress(idat)) + chunk(b"IEND", b"")

    got = multimodal._decode_png(png(plte, lines))
    assert got == (3, 2, 6, 3 * 30 + 3 * 50, 3 * 20 + 3 * 100,
                   3 * 10 + 3 * 200)
    oob = bytes([0]) + bytes([0, 1, 2]) + bytes([0]) + bytes([1, 0, 0])
    assert multimodal._decode_png(png(plte, oob)) is None
    assert multimodal._decode_png(png(None, lines)) is None
    assert multimodal._decode_png(png(plte[:5], lines)) is None
    # resize works through the shared RGB path
    small = multimodal._resize_png(png(plte, lines), 1, 1)
    assert multimodal._decode_png(small) == (1, 1, 1, 30, 20, 10)


def test_png_multi_idat_and_resize():
    """IDAT may be split across chunks (the spec allows any split) and
    the nearest-neighbor resize round-trips through a genuine PNG."""
    import struct
    import zlib

    import numpy as np

    rgb = _png_case()
    png = multimodal._encode_png(rgb, 4, 5)
    stats = multimodal._decode_png(png)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    # re-assemble with the IDAT split in two
    pos, parts = 8, {}
    while pos + 12 <= len(png):
        ln = struct.unpack_from(">I", png, pos)[0]
        parts[png[pos + 4:pos + 8]] = png[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    idat = parts[b"IDAT"]
    two = (multimodal._PNG_SIG + chunk(b"IHDR", parts[b"IHDR"])
           + chunk(b"IDAT", idat[:7]) + chunk(b"IDAT", idat[7:])
           + chunk(b"IEND", b""))
    assert multimodal._decode_png(two) == stats

    small = multimodal._resize_png(png, 2, 2)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(5, 4, 3)
    sel = px[(np.arange(2) * 5) // 2][:, (np.arange(2) * 4) // 2]
    flat = sel.reshape(-1, 3)
    assert multimodal._decode_png(small) == (
        2, 2, 4, int(flat[:, 2].sum()), int(flat[:, 1].sum()),
        int(flat[:, 0].sum()))
    assert multimodal._resize_png(b"not a png", 2, 2) is None


def test_image_codec_registry_injection(spark):
    """VERDICT r11 #7: the decode dispatch is a pluggable magic->parser
    registry — an environment with PIL/ffmpeg can inject real codecs
    without touching operator code. A stub 'webp' codec registered at
    runtime makes decode_image_stats decode a payload every built-in
    declines (JPEG and GIF are REAL built-ins since round 13, so the
    stub uses a format the engine does not parse); removal restores the
    old behavior; re-registering a fmt replaces in place rather than
    duplicating."""
    fake_webp = b"RIFF\x00\x00\x00\x00WEBP" + b"x" * 10

    def stub(payload):
        if payload is None or bytes(payload)[8:12] != b"WEBP":
            return None
        return (2, 1, 2, 10, 20, 30)

    n0 = len(multimodal.IMAGE_CODECS)
    assert multimodal._decode_image(fake_webp) == (None, None)
    multimodal.register_image_codec("webp", stub)
    try:
        assert len(multimodal.IMAGE_CODECS) == n0 + 1
        assert multimodal._decode_image(fake_webp) == ("webp", (2, 1, 2, 10, 20, 30))
        # built-ins still win for their own formats
        png = multimodal._encode_png(_png_case(), 4, 5)
        assert multimodal._decode_image(png)[0] == "png"
        # the Spark operator picks the injected codec up with no changes
        media = spark.createDataFrame(
            [(1, fake_webp)], "media_id long, payload binary")
        row = multimodal.decode_image_stats(media).collect()[0]
        assert (row["fmt"], row["decode_ok"]) == ("webp", True)
        assert (row["sum_b"], row["sum_g"], row["sum_r"]) == (10, 20, 30)
        # replace in place: same registry size, new behavior
        multimodal.register_image_codec("webp", lambda p: None)
        assert len(multimodal.IMAGE_CODECS) == n0 + 1
        assert multimodal._decode_image(fake_webp) == (None, None)
    finally:
        multimodal.IMAGE_CODECS[:] = [
            e for e in multimodal.IMAGE_CODECS if e[0] != "webp"]
    assert len(multimodal.IMAGE_CODECS) == n0


def test_hard_negatives_cross_label_only(spark):
    """Hard negatives never share the source's label, the nearest
    SAME-label vector is excluded even when it is the global nearest,
    and ranking is (score desc, id asc) within each source. One bucket
    (identical-direction vectors) so LSH recall is total here."""
    from crypto_data_service_loader_spark.operators import similarity

    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.01, 0.0], 0),   # same label: nearest but excluded
        (2, [0.9, 0.1, 0.0], 1),
        (3, [0.8, 0.2, 0.0], 1),
        (4, [0.7, 0.3, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = similarity.hard_negatives(emb, k=2, n_planes=2).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["vec_id"], []).append(r)
    labels = dict((i, l) for i, _, l in rows)
    for src, negs in by_src.items():
        for r in negs:
            assert labels[r["negative_id"]] != labels[src]
            assert r["neg_label"] == labels[r["negative_id"]]
        assert [r["rank"] for r in sorted(negs, key=lambda x: x["rank"])] \
            == list(range(1, len(negs) + 1))
    # vector 0's negatives are 2 then 3 — never same-label vector 1
    got0 = [r["negative_id"] for r in sorted(by_src[0], key=lambda x: x["rank"])]
    assert got0 == [2, 3]


def test_resample_wav16_nearest_frames():
    """Audio resample semantics: 2:1 downsample keeps even FRAME indices
    (channels stay interleaved — a stereo frame moves as a unit), the
    output is itself a valid WAV at the new rate, upsampling repeats
    frames by the same nearest rule, and invalid payloads return None."""
    samples = [0, 1, -1, 32767, -32768, 100, 7, -7]
    wav = _make_wav(samples, channels=1, rate=8000)
    out = multimodal._resample_wav16(wav, 4000)
    got = multimodal._decode_wav16(out)
    kept = [samples[(i * 8) // 4] for i in range(4)]  # even indices
    assert got == (1, 4000, 4, sum(kept), min(kept), max(kept),
                   sum(s * s for s in kept))
    # stereo: frames (L,R) move as units
    st = [10, -10, 20, -20, 30, -30]  # 3 frames of (L,R)
    wav2 = _make_wav(st, channels=2, rate=6000)
    out2 = multimodal._resample_wav16(wav2, 2000)  # keep frame 0 only
    got2 = multimodal._decode_wav16(out2)
    assert got2 == (2, 2000, 2, 0, -10, 10, 200)
    # upsample 2x: nearest repeats each frame twice
    up = multimodal._resample_wav16(_make_wav([5, 6], rate=1000), 2000)
    assert multimodal._decode_wav16(up) == (1, 2000, 4, 22, 5, 6, 122)
    assert multimodal._resample_wav16(b"nope", 4000) is None
    assert multimodal._resample_wav16(None, 4000) is None


def test_canonical_url_edges(spark):
    from crypto_data_service_loader_spark.operators.text import canonical_url

    cases = [
        # (input, expected)
        ("https://WWW.Ex.com/Doc/A?b=2&a=1#frag", "https://www.ex.com/Doc/A?a=1&b=2"),
        ("https://Ex.com/p?utm_source=x&gclid=1&ref=t", "https://ex.com/p"),
        ("https://Ex.com/p", "https://ex.com/p"),            # no query
        ("https://Ex.com", "https://ex.com"),                # no path
        ("HTTPS://Ex.com/CaseSensitive/Path", "https://ex.com/CaseSensitive/Path"),
        ("https://ex.com/p#only-frag", "https://ex.com/p"),
        ("https://ex.com/a/b/c?z=1", "https://ex.com/a/b/c?z=1"),
        # multi-'?': limit-2 split keeps the second '?' inside its param
        ("https://ex.com/p?a=x?y&b=1", "https://ex.com/p?a=x?y&b=1"),
        ("https://ex.com/p?utm_a=x?y&b=1", "https://ex.com/p?b=1"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_canonical_url_multi_question_matches_oracle(spark):
    """ADVICE r11: the '?' split uses limit 2 in Spark; the DuckDB
    mirror must rejoin string_split parts 2..end with '?'. Differential
    check over URLs with zero, one, and two '?' plus tracking params —
    and the SQL filter is GENERATED from TRACKING_PARAM_PREFIXES, so the
    blocklist can't drift between engines."""
    import duckdb

    from crypto_data_service_loader_spark.operators.text import (
        canonical_url, tracking_filter_sql)

    urls = [
        "https://Ex.com/p?a=x?y&b=1",
        "https://Ex.com/p?utm_s=x?y&b=1&gclid=2?3",
        "https://EX.com/A/B?z=9?9&a=1#f?g",
        "https://ex.com/plain",
        "https://ex.com/q?only=1",
        "https://ex.com/q?ref=tw",
        "https://ex.com/q?fbclid=a?b",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    con = duckdb.connect()
    sql = f"""
        WITH c AS (
            SELECT string_split(string_split(url, '#')[1], '?') AS qparts
            FROM u),
        e AS (
            SELECT string_split(qparts[1], '/') AS parts,
                   list_filter(
                       string_split(array_to_string(qparts[2:], '?'), '&'),
                       p -> {tracking_filter_sql('p')}) AS kept,
                   len(qparts) AS nq
            FROM c)
        SELECT lower(parts[1] || '//' || parts[3])
               || CASE WHEN len(parts) > 3
                  THEN '/' || array_to_string(parts[4:], '/') ELSE '' END
               || CASE WHEN nq > 1 AND len(kept) > 0
                  THEN '?' || array_to_string(list_sort(kept), '&')
                  ELSE '' END AS c
        FROM e"""
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    want = [r[0] for r in con.execute(sql).fetchall()]
    assert got == want


def _jpeg_case(w=16, h=8):
    """Two-constant-block RGB image (the gate fixture shape)."""
    import numpy as np

    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = (37, 201, 90)
    img[:, w // 2:] = (250, 12, 128)
    return img


def test_jpeg_decode_rejects_corruption():
    """Truncation, progressive SOF, subsampled components, a missing
    quant table, early EOI, and garbage all decode to None — never a
    wrong answer (the PNG rejection contract, applied to JPEG)."""
    img = _jpeg_case()
    jp = multimodal._encode_jpeg(img.tobytes(), 16, 8)
    assert multimodal._parse_jpeg(jp) is not None
    assert multimodal._parse_jpeg(None) is None
    assert multimodal._parse_jpeg(b"") is None
    assert multimodal._parse_jpeg(b"\xff\xd8\xff\xd9") is None
    assert multimodal._parse_jpeg(jp[:40]) is None
    assert multimodal._parse_jpeg(jp[:-8]) is None  # truncated entropy data
    # progressive SOF flag (0xC2) must be rejected, not misread
    bad = bytearray(jp)
    bad[bad.find(b"\xff\xc0") + 1] = 0xC2
    assert multimodal._parse_jpeg(bytes(bad)) is None
    # 2x2 chroma subsampling (HV byte of component 1 in SOF0)
    bad = bytearray(jp)
    sof = bad.find(b"\xff\xc0")
    assert bad[sof + 11] == 0x11
    bad[sof + 11] = 0x22
    assert multimodal._parse_jpeg(bytes(bad)) is None
    # drop the luma DQT segment -> quant table 0 missing at SOS time
    dqt = jp.find(b"\xff\xdb")
    ln = int.from_bytes(jp[dqt + 2:dqt + 4], "big")
    assert multimodal._parse_jpeg(jp[:dqt] + jp[dqt + 2 + ln:]) is None
    # flip one entropy byte: either rejected or decoded to a DIFFERENT
    # (but well-formed) result — never an exception
    bad = bytearray(jp)
    bad[-12] ^= 0x55
    multimodal._parse_jpeg(bytes(bad))


def test_jpeg_registry_dispatch_and_resize():
    """The codec registry routes JPEG magic to _decode_jpeg (fmt tag
    'jpeg'), and _resize_jpeg re-encodes a decodable baseline JPEG of
    the requested size; resize_images' real-path chain picks it up after
    BMP/PPM/PNG decline."""
    import numpy as np

    img = _jpeg_case()
    jp = multimodal._encode_jpeg(img.tobytes(), 16, 8)
    fmt, stats = multimodal._decode_image(jp)
    assert fmt == "jpeg"
    assert stats[:3] == (16, 8, 128)
    small = multimodal._resize_jpeg(jp, 8, 8)
    assert small is not None
    w, h, rgb = multimodal._parse_jpeg(small)
    assert (w, h) == (8, 8)
    # constant halves survive nearest-neighbor then re-encode close to
    # the first-generation decode values (second lossy generation)
    first = np.frombuffer(
        multimodal._parse_jpeg(jp)[2], np.uint8
    ).reshape(8, 16, 3).astype(int)
    second = np.frombuffer(rgb, np.uint8).reshape(8, 8, 3).astype(int)
    cols = (np.arange(8) * 16) // 8
    assert np.abs(second - first[:, cols]).max() <= 24
    assert multimodal._resize_jpeg(b"notajpeg", 4, 4) is None


def test_resize_png_preserves_color_type():
    """ADVICE r12: resize_images' PNG path re-encodes the SAME color
    type — grayscale stays grayscale (bpp 1), RGBA keeps its alpha plane
    through the nearest-neighbor resample; palette re-encodes truecolor
    (documented, the encoder has no palette writer)."""
    import struct

    import numpy as np

    # grayscale 4x4 -> 2x2
    gray = bytes(range(16))
    png = multimodal._encode_png(gray, 4, 4, color=0)
    small = multimodal._resize_png(png, 2, 2)
    w, h, color, bpp, raw = multimodal._parse_png(small, native=True)
    assert (w, h, color, bpp) == (2, 2, 0, 1)
    src = np.frombuffer(gray, np.uint8).reshape(4, 4)
    assert raw == src[::2, ::2].tobytes()
    # RGBA 4x4 -> 2x2 keeps the alpha channel's own values
    rgba = bytes((i * 7) % 256 for i in range(64))
    png = multimodal._encode_png(rgba, 4, 4, color=6)
    small = multimodal._resize_png(png, 2, 2)
    w, h, color, bpp, raw = multimodal._parse_png(small, native=True)
    assert (w, h, color, bpp) == (2, 2, 6, 4)
    src = np.frombuffer(rgba, np.uint8).reshape(4, 4, 4)
    assert raw == src[::2, ::2].tobytes()


def test_reliable_materialization_policies(spark, tmp_path):
    """reliable=True must change ONLY the materialization policy
    (VERDICT r12 #7): identical results, still materialized once. With
    no checkpoint dir the fallback is persist(DISK_ONLY) — lineage kept,
    so a lost partition recomputes instead of failing the job; with a
    checkpoint dir configured the copy goes to durable storage."""
    from crypto_data_service_loader_spark.functions.materialize import (
        materialize_once,
    )
    from crypto_data_service_loader_spark.plans.explain import physical_plan

    docs = spark.createDataFrame(
        [(0, "abcdefgh" * 3), (1, "abcdefgh" * 3), (2, "zz unique zz")],
        "doc_id long, text string",
    )

    def spans(**kw):
        return {
            (r["doc_id"], r["span_start"], r["span_len"], r["n_windows"])
            for r in dedup.exact_substring_spans(
                docs, min_len=6, **kw
            ).collect()
        }

    assert spans(reliable=True) == spans()

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, float(i)]) for i in range(12)],
        "vec_id long, embedding array<float>",
    )
    a = {tuple(r) for r in similarity.semantic_dedup(
        emb, k_centroids=3).collect()}
    b = {tuple(r) for r in similarity.semantic_dedup(
        emb, k_centroids=3, reliable=True).collect()}
    assert a == b

    # persist fallback: DISK_ONLY, lineage kept, exactly-once eager
    src = spark.range(100).withColumnRenamed("id", "x")
    m = materialize_once(src, reliable=True)
    lvl = m.storageLevel
    assert lvl.useDisk and not lvl.useMemory
    assert m.count() == 100
    m.unpersist()

    # checkpoint-dir policy: the plan rebases onto the checkpointed RDD
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    m2 = materialize_once(src, reliable=True)
    assert "ExistingRDD" in physical_plan(m2) or "Scan ExistingRDD" in (
        physical_plan(m2)
    )
    assert m2.count() == 100


def test_pq_encode_seed_vectors_are_exact(spark):
    """PQ sanity anchored in the math: the codebook IS the first
    n_codes vectors' subvectors, so those vectors must encode to their
    own code ids with ZERO quantization error; other vectors report the
    error in micro units and codes within range."""
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(8)])
         for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in
           similarity.pq_encode(emb, m=2, n_codes=4).collect()}
    assert len(out) == 20
    for i in range(4):
        assert out[i]["codes"] == f"{i},{i}"
        assert out[i]["err_micro"] == 0
    for i in range(20):
        assert all(0 <= int(c) < 4 for c in out[i]["codes"].split(","))
        assert out[i]["err_micro"] >= 0


def test_pq_topk_ranks_by_adc_and_matches_reference(spark):
    """pq_topk equals a pure-Python ADC reference (same codebook rule,
    same micro-int floor): nearest centroids per subspace, per-vector
    score = sum of the query's table lookups, top-k by (score, id)."""
    import math

    vecs = {i: [float((i * 5 + j) % 7) for j in range(8)]
            for i in range(16)}
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    m, n_codes, sub, k = 2, 4, 4, 5
    query = vecs[0]
    book = {(s, c): vecs[c][s * sub:(s + 1) * sub]
            for s in range(m) for c in range(n_codes)}

    def d_micro(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return math.floor(acc * 1e6)

    scores = {}
    for i, v in vecs.items():
        total = 0
        for s in range(m):
            sv = v[s * sub:(s + 1) * sub]
            code = min(range(n_codes),
                       key=lambda c: (d_micro(sv, book[(s, c)]), c))
            total += d_micro(query[s * sub:(s + 1) * sub], book[(s, code)])
        scores[i] = total
    want = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:k]
    got = [(r["vec_id"], r["adc_micro"], r["rank"]) for r in
           similarity.pq_topk(emb, query, k=k, m=m, n_codes=n_codes)
           .orderBy("rank").collect()]
    assert got == [(i, s, rk + 1) for rk, (i, s) in enumerate(want)]


def test_dedup_intra_doc_lines_keep_first_and_plan(spark):
    """Keep-first semantics with exact rebuild, and the promised plan
    shape: map-only, zero exchanges (the fold is document-local)."""
    import hashlib

    from crypto_data_service_loader_spark.plans.explain import physical_plan

    docs = spark.createDataFrame(
        [(0, "a\nb\na\nc\nb"), (1, "x"), (2, "\n\n"), (3, "s\ns\ns")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup.dedup_intra_doc_lines(docs).collect()}
    want = {0: ("a\nb\nc", 5, 3), 1: ("x", 1, 1),
            2: ("", 3, 1), 3: ("s", 3, 1)}
    for i, (clean, n_lines, n_kept) in want.items():
        assert out[i]["n_lines"] == n_lines
        assert out[i]["n_kept"] == n_kept
        assert out[i]["clean_md5"] == hashlib.md5(
            clean.encode()).hexdigest()
    plan = physical_plan(dedup.dedup_intra_doc_lines(docs))
    assert "Exchange" not in plan  # document-local: zero shuffles


def test_ivfpq_encode_invariants(spark):
    """IVFADC structure anchored in the math: (1) the coarse seeds
    (ids 0..k-1) are their own centroids — zero residual, so their
    err_micro is the norm of the nearest book subvector, NOT zero;
    (2) the book-seed vectors (ids k..k+n_codes-1) encode to their own
    code ids with ZERO error; (3) every centroid_id/code is in range.
    This is exactly the degeneracy the skip-the-coarse-seeds codebook
    rule exists to prevent (seeding from ids 0..n-1 would make every
    book entry the zero subvector)."""
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(8)])
         for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in similarity.ivfpq_encode(
        emb, k_centroids=4, m=2, n_codes=4).collect()}
    assert len(out) == 20
    for i in range(4):
        assert out[i]["centroid_id"] == i  # own coarse list
    for j in range(4):
        r = out[4 + j]
        assert r["err_micro"] == 0  # its residual IS book entry j
        # equal residual subvectors tie; the (di, cid) rule then picks
        # the LOWEST code id, so the code is j or an equal earlier entry
        assert all(int(c) <= j for c in r["codes"].split(","))
    assert any(out[i]["err_micro"] > 0 for i in range(4)), (
        "coarse seeds must NOT have zero PQ error — that would mean the "
        "codebook contains the zero subvector (degenerate seeding)"
    )
    for i in range(20):
        assert 0 <= out[i]["centroid_id"] < 4
        assert all(0 <= int(c) < 4 for c in out[i]["codes"].split(","))


def test_ivfpq_topk_full_probe_covers_all_lists(spark):
    """With nprobe == k_centroids every list is probed, so IVFADC must
    return k results scored over the whole corpus; with nprobe=1 the
    candidate set shrinks to one list (the query's own), never errors."""
    emb = spark.createDataFrame(
        [(i, [float((i * 5 + j) % 7) for j in range(8)])
         for i in range(16)],
        "vec_id long, embedding array<float>",
    )
    q = [float(j % 7) for j in range(8)]
    full = similarity.ivfpq_topk(
        emb, q, k=5, k_centroids=4, nprobe=4, m=2, n_codes=4).collect()
    assert len(full) == 5
    assert [r["rank"] for r in full] == [1, 2, 3, 4, 5]
    assert all(full[i]["adc_micro"] <= full[i + 1]["adc_micro"]
               for i in range(4))
    one = similarity.ivfpq_topk(
        emb, q, k=5, k_centroids=4, nprobe=1, m=2, n_codes=4).collect()
    assert 1 <= len(one) <= 5
    full_ids = {r["vec_id"] for r in full}
    assert {r["vec_id"] for r in one} <= {r["vec_id"] for r in emb.collect()}
    assert len({r["vec_id"] for r in one}) == len(one)


def test_label_propagation_two_cliques_bridge(spark):
    """LPA semantics on the canonical shape: two triangles joined by one
    bridge edge. After 2 synchronous iterations each triangle converges
    to its own minimum label (majority vote inside the clique outweighs
    the single bridge vote); self-loops are dropped; every node in the
    edge set gets exactly one community."""
    from crypto_data_service_loader_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3),          # triangle A
         (4, 5), (5, 6), (4, 6),          # triangle B
         (3, 4),                          # bridge
         (2, 2)],                         # self-loop: must be ignored
        "src long, dst long",
    )
    out = {r["node"]: r["community"]
           for r in graph.label_propagation(edges, iters=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # iteration 1: every node takes its neighborhood min; iteration 2:
    # majority vote — the triangles stabilize on their side's labels
    assert out[1] == out[2] == 1
    assert out[5] == out[6]
    assert len(set(out.values())) >= 2  # the bridge does not merge all


def test_label_propagation_tie_breaks_to_lowest_label(spark):
    """A node with exactly two neighbors carrying different labels is a
    tie (count 1 vs 1): the engine-stable rule must pick the LOWEST
    label, in every iteration."""
    from crypto_data_service_loader_spark.operators import graph

    # path 7-8-9: node 8 sees labels {7, 9} in iteration 1 -> picks 7
    edges = spark.createDataFrame([(7, 8), (8, 9)], "src long, dst long")
    out = {r["node"]: r["community"]
           for r in graph.label_propagation(edges, iters=1).collect()}
    assert out[8] == 7
    assert out[7] == 8 and out[9] == 8  # their only neighbor's label


def test_blocklist_audit_and_filter(spark):
    """Audit counts DISTINCT banned tokens per doc (repeats count once),
    sorts the hit list, flags clean docs kept=true; the filter twin
    drops exactly the flagged ids with schema unchanged; an empty
    blocklist keeps everything."""
    from crypto_data_service_loader_spark.operators.text import (
        blocklist_audit, blocklist_filter)

    docs = spark.createDataFrame(
        [(1, "the bad bad word here"), (2, "all clean text"),
         (3, "worse and bad together"), (4, "")],
        "doc_id long, text string",
    )
    blk = spark.createDataFrame([("bad",), ("worse",)], "term string")
    audit = {r["doc_id"]: r for r in blocklist_audit(docs, blk).collect()}
    assert audit[1]["n_hits"] == 1 and audit[1]["hit_terms"] == "bad"
    assert audit[3]["n_hits"] == 2 and audit[3]["hit_terms"] == "bad,worse"
    assert audit[2]["kept"] and audit[4]["kept"]
    assert not audit[1]["kept"] and not audit[3]["kept"]
    kept = blocklist_filter(docs, blk)
    assert kept.columns == docs.columns
    assert {r["doc_id"] for r in kept.collect()} == {2, 4}
    empty = spark.createDataFrame([], "term string")
    assert blocklist_filter(docs, empty).count() == 4


def test_k_anonymity_audit_semantics(spark):
    """Class below k flags k_ok=false; constant sensitive value flags
    l_ok=false even in a large class (the leak k-anonymity alone
    misses); both thresholds are inclusive."""
    from crypto_data_service_loader_spark.operators.contract import (
        k_anonymity_audit)

    rows = (
        [("a", "x", i) for i in range(5)]          # size 5, 5 distinct
        + [("b", "x", 7), ("b", "x", 7), ("b", "x", 7)]  # size 3, constant
        + [("c", "y", 1), ("c", "y", 2)]           # size 2 < k
    )
    df = spark.createDataFrame(rows, "qa string, qb string, s int")
    out = {(r["qa"], r["qb"]): r for r in
           k_anonymity_audit(df, ["qa", "qb"], "s", k=3, l=2).collect()}
    a = out[("a", "x")]
    assert a["class_size"] == 5 and a["n_sensitive"] == 5
    assert a["k_ok"] and a["l_ok"]
    b = out[("b", "x")]
    assert b["class_size"] == 3 and b["k_ok"]      # inclusive: 3 >= 3
    assert b["n_sensitive"] == 1 and not b["l_ok"]  # constant leaks
    c = out[("c", "y")]
    assert not c["k_ok"] and c["l_ok"]


def test_curriculum_phases_semantics(spark):
    """Phases are equal-count (+-1), difficulty never decreases ACROSS
    phase boundaries, and the within-phase order is the seeded hash
    shuffle, not difficulty order (ordered-within-phase is the known
    curriculum failure mode the shuffle exists to avoid)."""
    from crypto_data_service_loader_spark.operators.training import (
        curriculum_phases)

    docs = spark.createDataFrame(
        [(i, (i * 37) % 200 + 10) for i in range(40)],
        "doc_id long, n_chars long",
    )
    out = curriculum_phases(docs, n_phases=4).collect()
    assert len(out) == 40
    by_phase = {}
    for r in out:
        by_phase.setdefault(r["phase"], []).append(r)
    assert set(by_phase) == {1, 2, 3, 4}
    assert all(len(v) == 10 for v in by_phase.values())
    for k in range(1, 4):
        assert max(r["difficulty"] for r in by_phase[k]) <= min(
            r["difficulty"] for r in by_phase[k + 1])
    for k, rows in by_phase.items():
        rows = sorted(rows, key=lambda r: r["phase_pos"])
        assert [r["phase_pos"] for r in rows] == list(range(1, 11))
        diffs = [r["difficulty"] for r in rows]
        assert diffs != sorted(diffs)  # shuffled, not difficulty-ordered
    # determinism: same seed -> identical assignment
    again = curriculum_phases(docs, n_phases=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_curriculum_phases_bucketed_tie_rank_matches_ntile(spark, monkeypatch):
    """VERDICT r14 #5: the within-tie rank partitions by (difficulty,
    id DIV _RANK_BUCKET_DOCS) so a LOW-cardinality difficulty column
    (here: two values over 120 docs, bucket size pinned to 7 so every
    tie group spans many buckets, ids deliberately sparse/unordered)
    still cuts phases bit-identical to ntile over (difficulty, id)."""
    from crypto_data_service_loader_spark.operators import training as TR

    monkeypatch.setattr(TR, "_RANK_BUCKET_DOCS", 7)
    rows = [((i * 13) % 120 * 3 + 1, i % 2) for i in range(120)]
    assert len({r[0] for r in rows}) == 120
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        r["doc_id"]: (r["phase"], r["difficulty"])
        for r in TR.curriculum_phases(docs, n_phases=5).collect()
    }
    # reference: exact ntile semantics in plain python
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    n, k = len(order), 5
    want = {}
    for pos, (doc_id, diff) in enumerate(order):
        cut = (n % k) * (n // k + 1)
        tile = (pos // (n // k + 1) + 1) if pos < cut else (
            n % k + (pos - cut) // (n // k) + 1)
        want[doc_id] = (tile, diff)
    assert got == want
