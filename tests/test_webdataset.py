"""WebDataset-style tar shard reading: distributed member explode,
sample regrouping, shard manifest."""

from __future__ import annotations

import io
import tarfile

import pytest

from citibike_deep_dive_spark.sources.webdataset import (
    group_samples,
    iter_tar_members,
    read_tar_shards,
    shard_manifest,
)


def _make_shard(samples: dict[str, dict[str, bytes]], extra=()) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, comps in samples.items():
            for ext, payload in comps.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
        for name in extra:
            if name.endswith("/"):
                info = tarfile.TarInfo(name=name)
                info.type = tarfile.DIRTYPE
                tf.addfile(info)
            else:
                info = tarfile.TarInfo(name=name)
                info.size = 2
                tf.addfile(info, io.BytesIO(b"xx"))
    return buf.getvalue()


SAMPLES_A = {
    "000000": {"txt": b"hello world", "json": b'{"label": 1}'},
    "000001": {"txt": b"second doc", "jpg": b"\xff\xd8fakejpeg"},
}
SAMPLES_B = {
    "000002": {"txt": b"third", "json": b'{"label": 0}', "jpg": b"\xff\xd8x",
               # multi-part extension: one COMPONENT of sample 000002,
               # not a separate sample "000002.gt"
               "gt.txt": b"ground truth"},
}


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds")
    (d / "shard-000000.tar").write_bytes(
        _make_shard(SAMPLES_A, extra=("subdir/", "._appledouble"))
    )
    (d / "shard-000001.tar").write_bytes(_make_shard(SAMPLES_B))
    return d


def test_iter_tar_members_skips_dirs_and_appledouble():
    blob = _make_shard(SAMPLES_A, extra=("subdir/", "._junk"))
    names = [n for n, _ in iter_tar_members(blob)]
    assert "subdir/" not in names and "._junk" not in names
    assert sorted(names) == ["000000.json", "000000.txt", "000001.jpg", "000001.txt"]


def test_read_tar_shards_distributed(spark, shard_dir):
    members = read_tar_shards(spark, f"{shard_dir}/*.tar")
    rows = members.collect()
    assert len(rows) == 8
    by_key = {(r.key, r.ext): r for r in rows}
    assert bytes(by_key[("000000", "txt")].payload) == b"hello world"
    assert all(r.shard.endswith(".tar") for r in rows)


def test_group_samples_pivots_components(spark, shard_dir):
    members = read_tar_shards(spark, f"{shard_dir}/*.tar")
    samples = group_samples(
        members, exts=("txt", "json", "jpg", "gt.txt")
    ).collect()
    assert len(samples) == 3  # multi-dot member does NOT fork a sample
    s = {r.key: r for r in samples}
    assert bytes(s["000000"].json) == b'{"label": 1}'
    assert s["000000"].jpg is None  # absent component -> null
    assert bytes(s["000002"].jpg) == b"\xff\xd8x"
    assert bytes(s["000002"]["gt.txt"]) == b"ground truth"


def test_duplicate_member_resolves_last_wins(spark, tmp_path):
    """tar update semantics: a member appended twice supersedes on
    extract — the regrouped payload must be the LATER one even when the
    earlier bytes compare greater."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for payload in (b"zzzz-old", b"aaaa-new"):  # old is bytewise-greater
            info = tarfile.TarInfo(name="0009.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    (tmp_path / "dup.tar").write_bytes(buf.getvalue())
    members = read_tar_shards(spark, f"{tmp_path}/dup.tar")
    [row] = group_samples(members, exts=("txt",)).collect()
    assert bytes(row.txt) == b"aaaa-new"


def test_subdir_members_stay_distinct_samples(spark, tmp_path):
    """The sample key includes the member's directory: a/000123.jpg and
    b/000123.txt in one shard are DIFFERENT samples — keying on the bare
    basename stem would silently conflate them through group_samples'
    last-wins max_by."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, payload in (
            ("a/000123.jpg", b"jpeg-bytes"),
            ("a/000123.txt", b"caption-a"),
            ("b/000123.txt", b"caption-b"),
        ):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    (tmp_path / "nested.tar").write_bytes(buf.getvalue())
    members = read_tar_shards(spark, f"{tmp_path}/nested.tar")
    keys = {r.key for r in members.collect()}
    assert keys == {"a/000123", "b/000123"}
    samples = {r.key: r for r in
               group_samples(members, exts=("txt", "jpg")).collect()}
    assert len(samples) == 2
    assert bytes(samples["a/000123"].txt) == b"caption-a"
    assert bytes(samples["a/000123"].jpg) == b"jpeg-bytes"
    assert bytes(samples["b/000123"].txt) == b"caption-b"
    assert samples["b/000123"].jpg is None


def test_shard_manifest_counts(spark, shard_dir):
    members = read_tar_shards(spark, f"{shard_dir}/*.tar")
    m = {r.shard.rsplit("/", 1)[-1]: r for r in shard_manifest(members).collect()}
    assert m["shard-000000.tar"].n_samples == 2
    assert m["shard-000000.tar"].n_members == 4
    assert m["shard-000001.tar"].n_samples == 1
    assert m["shard-000001.tar"].n_members == 4
    total_payload = sum(
        len(p) for s in (SAMPLES_A, SAMPLES_B) for c in s.values() for p in c.values()
    )
    assert sum(r.n_bytes for r in m.values()) == total_payload


def test_samples_chain_into_multimodal_ops(spark, shard_dir):
    """The regrouped binary columns feed the multimodal operators
    directly — the point of keeping samples as plain binary columns."""
    from pyspark.sql import functions as F

    from citibike_deep_dive_spark.operators.multimodal import image_dimensions

    members = read_tar_shards(spark, f"{shard_dir}/*.tar")
    samples = group_samples(members, exts=("jpg",)).filter(
        F.col("jpg").isNotNull()
    )
    media = samples.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.col("jpg").alias("payload"),
    )
    out = image_dimensions(media).collect()
    # the fake jpegs aren't full SOF frames: parser keeps rows, nulls dims
    assert len(out) == 2
    assert all(r.width is None for r in out)
