"""TAR shard ingestion (WebDataset layout): the ustar codec must
round-trip against the STDLIB tarfile module in BOTH directions (our
writer -> stdlib reader, stdlib writer -> our parser), reject corrupt
archives whole, and the Spark exploder/packer pair must be inverse on
real DataFrames."""

from __future__ import annotations

import io
import tarfile

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from crypto_data_service_loader_spark.sources import tar_blobs as T


def test_tar_interop_with_stdlib_both_directions():
    members = [("000001.txt", b"hello world"), ("000001.json", b'{"a":1}'),
               ("empty.txt", b""), ("x" * 100, b"Z" * 513)]
    tar = T._encode_tar(members)
    with tarfile.open(fileobj=io.BytesIO(tar)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for n, c in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(c)
            tf.addfile(ti, io.BytesIO(c))
    assert T._parse_tar(buf.getvalue()) == members


def test_tar_rejects_corruption_whole():
    tar = T._encode_tar([("a.txt", b"abc"), ("b.txt", b"d" * 600)])
    # any header-byte flip breaks the verified checksum
    b = bytearray(tar)
    b[50] ^= 0xFF
    assert T._parse_tar(bytes(b)) is None
    # truncation anywhere before the end-of-archive marker rejects whole
    for cut in (100, 512, 700, len(tar) - 1024 - 1):
        assert T._parse_tar(tar[:cut]) is None
    assert T._parse_tar(None) is None
    assert T._parse_tar(b"short") is None


def test_tar_skips_non_regular_members():
    """Dirs/links are skipped but their blocks consumed — stdlib-written
    archive with a directory entry still yields only the files."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ti = tarfile.TarInfo("dir/f.txt")
        ti.size = 2
        tf.addfile(ti, io.BytesIO(b"ok"))
    got = T._parse_tar(buf.getvalue())
    assert got == [("dir/f.txt", b"ok")]


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_tar_roundtrip_property(data):
    n = data.draw(st.integers(1, 6))
    members = []
    for i in range(n):
        name = f"{i:06d}.{data.draw(st.sampled_from(['txt', 'json', 'bin']))}"
        size = data.draw(st.integers(0, 1400))
        members.append((name, bytes(data.draw(st.binary(
            min_size=size, max_size=size)))))
    tar = T._encode_tar(members)
    assert T._parse_tar(tar) == members
    with tarfile.open(fileobj=io.BytesIO(tar)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


def test_spark_pack_explode_inverse(spark):
    """encode_tar_shards -> explode_tar_members is the identity on
    (shard, sorted member) rows; a corrupt shard contributes zero rows
    rather than half-parsed members."""
    rows = [(1, "b.txt", b"bbb"), (1, "a.txt", b"aa"),
            (2, "only.bin", b"\x00\x01\x02" * 200)]
    df = spark.createDataFrame(
        rows, "shard_id long, member_name string, content binary")
    shards = T.encode_tar_shards(df, id_col="shard_id")
    back = T.explode_tar_members(shards, id_col="shard_id")
    got = sorted((r["shard_id"], r["member_name"], bytes(r["content"]))
                 for r in back.collect())
    assert got == [(1, "a.txt", b"aa"), (1, "b.txt", b"bbb"),
                   (2, "only.bin", b"\x00\x01\x02" * 200)]
    corrupt = spark.createDataFrame(
        [(9, b"not a tar at all" * 100)], "shard_id long, payload binary")
    assert T.explode_tar_members(corrupt, id_col="shard_id").count() == 0


def test_tar_declines_prefix_field_instead_of_truncating():
    """ADVICE r13: a ustar archive that stores a long path via the
    prefix field (offset 345) passes checksum validation, but emitting
    members under the 100-char suffix would silently misname them —
    the parser must decline the archive whole."""
    buf = io.BytesIO()
    long_name = "a" * 120 + "/file.txt"  # forces USTAR prefix splitting
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo(long_name)
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"abc"))
    assert T._parse_tar(buf.getvalue()) is None
    # sanity: the same content under a short name still parses
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo("file.txt")
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"abc"))
    assert T._parse_tar(buf2.getvalue()) == [("file.txt", b"abc")]


def test_group_tar_samples_webdataset_contract(spark):
    """Round 14 (VERDICT r13 #5): members grouped by basename stem into
    samples — multi-dot extensions split at the FIRST dot, directory
    prefixes stay in the key, members come back ext-sorted. Interop:
    the shard is packed by STDLIB tarfile, not our encoder."""
    members = [
        ("000123.jpg", b"\xff\xd8fakejpg"),
        ("000123.txt", b"a caption"),
        ("000123.seg.json", b"{}"),
        ("000124.txt", b"solo"),
        ("dir/000123.txt", b"different sample: dir prefix"),
        ("noext", b"extensionless"),
    ]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for n, c in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(c)
            tf.addfile(ti, io.BytesIO(c))
    blobs = spark.createDataFrame(
        [(7, buf.getvalue())], "shard_id long, payload binary")
    out = T.group_tar_samples(
        T.explode_tar_members(blobs, id_col="shard_id"), id_col="shard_id")
    got = {r["sample_key"]: r for r in out.collect()}
    assert set(got) == {"000123", "000124", "dir/000123", "noext"}
    s = got["000123"]
    assert s["n_members"] == 3
    assert [m["ext"] for m in s["members"]] == ["jpg", "seg.json", "txt"]
    assert bytes(s["members"][1]["content"]) == b"{}"
    assert s["total_bytes"] == len(b"\xff\xd8fakejpg") + 9 + 2
    assert got["noext"]["members"][0]["ext"] == ""
    assert got["dir/000123"]["n_members"] == 1


def _members_df(spark, rows):
    return spark.createDataFrame(
        rows, "shard_id long, member_name string, n_bytes int, content binary"
    )


def test_group_tar_samples_degenerate_basenames(spark):
    """ADVICE r14: hidden files ('.json', '.idx') must NOT collapse into
    one empty-stem pseudo-sample, and a trailing-dot basename ('foo.')
    must not alias the extension-less 'foo'. Both degenerate shapes key
    as extension-less members under their full basename."""
    rows = [
        (1, "d/.json", 2, b"{}"),
        (1, "d/.idx", 3, b"idx"),
        (1, "foo.", 1, b"a"),
        (1, "foo", 1, b"b"),
        (1, "ok.txt", 2, b"ok"),
    ]
    out = T.group_tar_samples(_members_df(spark, rows), id_col="shard_id")
    got = {r["sample_key"]: r for r in out.collect()}
    assert set(got) == {"d/.json", "d/.idx", "foo.", "foo", "ok"}
    for k in ("d/.json", "d/.idx", "foo.", "foo"):
        assert got[k]["n_members"] == 1
        assert got[k]["members"][0]["ext"] == ""
    assert got["ok"]["members"][0]["ext"] == "txt"


def test_group_tar_samples_member_count_bomb_declined(spark):
    """VERDICT r14 #4, fallback guard (member relations NOT built by the
    exploder): a stem holding more members than the cap is declined
    whole (the member-count sibling of _MAX_DECODE_PIXELS); well-formed
    samples in the same shard are untouched, and the declined key never
    appears truncated."""
    bomb = [(1, f"bomb.{i:06d}", 1, b"x") for i in range(300)]
    good = [(1, "good.txt", 3, b"abc"), (1, "good.json", 2, b"{}")]
    out = T.group_tar_samples(
        _members_df(spark, bomb + good), id_col="shard_id", max_members=16
    )
    got = {r["sample_key"]: r for r in out.collect()}
    assert set(got) == {"good"}
    assert got["good"]["n_members"] == 2
    # default (no cap): the primary guard lives in explode_tar_members
    out2 = T.group_tar_samples(_members_df(spark, bomb + good),
                               id_col="shard_id")
    assert {r["sample_key"]: r["n_members"] for r in out2.collect()} == {
        "bomb": 300, "good": 2,
    }


def test_explode_tar_members_stem_bomb_declined_scan_locally(spark):
    """VERDICT r14 #4, primary guard: a HOSTILE ustar shard packing 300
    members under one stem is declined at the explode edge (scan-local,
    zero extra passes — the whole tar is in hand); the well-formed
    sample in the same shard survives, so the downstream sample groupBy
    can never see a giant group."""
    members = [(f"bomb.{i:06d}", b"x") for i in range(300)]
    members += [("good.txt", b"abc"), ("good.json", b"{}")]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for n, c in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(c)
            tf.addfile(ti, io.BytesIO(c))
    blobs = spark.createDataFrame(
        [(5, buf.getvalue())], "shard_id long, payload binary")
    exploded = T.explode_tar_members(blobs, id_col="shard_id",
                                     max_sample_members=16)
    out = {r["sample_key"]: r["n_members"]
           for r in T.group_tar_samples(exploded,
                                        id_col="shard_id").collect()}
    assert out == {"good": 2}
    # cap None passes everything through (caller validated upstream)
    n_all = T.explode_tar_members(blobs, id_col="shard_id",
                                  max_sample_members=None).count()
    assert n_all == 302


def test_sample_stem_python_twin_matches_sql_rule(spark):
    """The exploder's Python `_sample_stem` and `group_tar_samples`' SQL
    column expressions implement the SAME key rule — pinned on every
    tricky shape (hidden files, trailing dots, dirs, multi-dot exts,
    extension-less, dotted directories)."""
    names = [
        "000123.jpg", "000123.seg.json", "noext", "dir/a.txt",
        "d/.json", "d/.idx", "foo.", "a/b/c.tar.gz", ".hidden",
        "x.y.z.", "dir.v2/file.txt", "dir.v2/noext", "a/.b.c",
    ]
    # one shard per name so each row's SQL sample_key is recoverable
    rows = [(i, n, 1, b"x") for i, n in enumerate(names)]
    out = T.group_tar_samples(_members_df(spark, rows), id_col="shard_id")
    got = {r["shard_id"]: r["sample_key"] for r in out.collect()}
    want = {i: T._sample_stem(n) for i, n in enumerate(names)}
    assert got == want


def test_group_tar_samples_tie_order_is_md5(spark):
    """ADVICE r14: two members of one sample tying on (ext, n_bytes) but
    differing in content must sort by md5(content) — the key the
    streaming twin can reproduce from pointer-only state."""
    import hashlib

    # a same-key same-ext tie needs duplicate member names (tar allows)
    rows = [(1, "s.txt", 3, b"bbb"), (1, "s.txt", 3, b"aaa")]
    out = T.group_tar_samples(_members_df(spark, rows), id_col="shard_id")
    [r] = out.collect()
    contents = [bytes(m["content"]) for m in r["members"]]
    want = sorted([b"bbb", b"aaa"],
                  key=lambda c: hashlib.md5(c).hexdigest())
    assert contents == want


def test_explode_tar_members_1e5_member_stem_bomb(spark):
    """VERDICT r14 #4, at the ordered scale: a forged shard carrying a
    100,000-member stem (51 MB of tar headers) is declined at the
    explode edge under the DEFAULT cap — scan-locally, before any
    shuffle — while the two-member sample in the same shard survives.
    The guard's cost is one Counter pass over names already in hand."""
    n = 100_000
    bomb = b"".join(
        T._encode_tar([(f"bomb.{i:06d}", b"")])[:-1024] for i in range(n)
    )
    good = T._encode_tar([("good.txt", b"abc"), ("good.json", b"{}")])
    payload = bomb + good  # headers concatenate; good's end-marker closes
    blobs = spark.createDataFrame(
        [(9, payload)], "shard_id long, payload binary")
    exploded = T.explode_tar_members(blobs, id_col="shard_id")
    out = {r["sample_key"]: r["n_members"]
           for r in T.group_tar_samples(exploded,
                                        id_col="shard_id").collect()}
    assert out == {"good": 2}
