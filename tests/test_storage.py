"""Object-store spill tier tests (filesystem backend; s3/mod.rs parity)."""

import time

import pytest

from fugu_tpu.engine.dataset import Dataset
from fugu_tpu.records import ObjectRecord
from fugu_tpu.storage.spill import (
    CachePolicy,
    FileSystemLocation,
    RemoteLocation,
    S3Location,
    SegmentSpiller,
)


def test_s3_location_url_codec():
    loc = S3Location.from_url("s3://mybucket/path/to/key.npz")
    assert loc.bucket == "mybucket"
    assert loc.key == "path/to/key.npz"
    assert loc.to_url() == "s3://mybucket/path/to/key.npz"


def test_s3_location_http_codec():
    loc = S3Location.from_url("https://fugu.sfo3.digitaloceanspaces.com/seg/abc")
    assert loc.bucket == "fugu"
    assert loc.endpoint == "https://sfo3.digitaloceanspaces.com"
    assert loc.key == "seg/abc"
    assert loc.to_http_url() == "https://fugu.sfo3.digitaloceanspaces.com/seg/abc"


def test_s3_location_env(monkeypatch):
    monkeypatch.setenv("S3_FUGU_BUCKET", "envbucket")
    monkeypatch.setenv("S3_ENDPOINT", "https://example.com")
    loc = S3Location.from_env("k")
    assert loc.bucket == "envbucket"
    assert loc.endpoint == "https://example.com"


@pytest.mark.parametrize("bad", ["s3://", "s3://onlybucket", "ftp://x/y"])
def test_bad_urls(bad):
    with pytest.raises(ValueError):
        S3Location.from_url(bad)


def test_filesystem_roundtrip(tmp_path):
    loc = RemoteLocation.from_url(str(tmp_path / "sub" / "file.bin"))
    loc.raw_upload(b"hello spill")
    assert loc.raw_fetch() == b"hello spill"


def test_cache_policy_ttl(tmp_path):
    cache = CachePolicy(tmp_path / "cache", ttl=0.2)
    cache.put("name", b"data1")
    assert cache.get("name") == b"data1"
    time.sleep(0.25)
    assert cache.get("name") is None  # stale


def test_cache_hash_mismatch_rejected(tmp_path):
    cache = CachePolicy(tmp_path / "cache", ttl=100)
    cache.put("n", b"data")
    # corrupt the data file
    k = cache._key("n")
    (cache.root / "data" / k).write_bytes(b"tampered")
    assert cache.get("n") is None


class _FakeClientError(Exception):
    """Shape-compatible with botocore.exceptions.ClientError."""

    def __init__(self, code: str):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


class _FakeBody:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class _FakeS3Client:
    """In-memory stand-in for a boto3 s3 client (get_object/put_object)."""

    def __init__(self):
        self.objects = {}
        self.get_calls = 0

    def put_object(self, Bucket, Key, Body):
        self.objects[(Bucket, Key)] = bytes(Body)

    def get_object(self, Bucket, Key):
        self.get_calls += 1
        if (Bucket, Key) not in self.objects:
            raise _FakeClientError("NoSuchKey")
        return {"Body": _FakeBody(self.objects[(Bucket, Key)])}


@pytest.fixture
def fake_s3(monkeypatch):
    import fugu_tpu.storage.spill as spill_mod

    client = _FakeS3Client()
    monkeypatch.setattr(spill_mod, "make_s3_client", lambda: client)
    return client


def test_s3_transport_roundtrip(fake_s3):
    loc = RemoteLocation.from_url("s3://bucket/seg/file.npz")
    loc.raw_upload(b"payload")
    assert fake_s3.objects[("bucket", "seg/file.npz")] == b"payload"
    assert loc.raw_fetch() == b"payload"


def test_s3_missing_key_maps_to_file_not_found(fake_s3):
    loc = RemoteLocation.from_url("s3://bucket/absent")
    with pytest.raises(FileNotFoundError):
        loc.raw_fetch()


def test_s3_fetch_uses_ttl_cache(tmp_path, fake_s3):
    cache = CachePolicy(tmp_path / "cache", ttl=100)
    loc = RemoteLocation.from_url("s3://bucket/k", cache)
    loc.raw_upload(b"v1")  # upload also primes the cache
    assert fake_s3.get_calls == 0
    assert loc.raw_fetch() == b"v1"
    assert fake_s3.get_calls == 0  # served from cache, no transport hit
    # expire the cache: next fetch goes to the transport and re-primes
    cache.ttl = 0.0
    assert loc.raw_fetch() == b"v1"
    assert fake_s3.get_calls == 1


def test_segment_spill_restore_over_s3(tmp_path, fake_s3):
    """Full cold-tier lifecycle with the S3 transport (fake client)."""
    data_dir = tmp_path / "data"
    ds = Dataset("cold", data_dir, use_device=False)
    ds.ingest(
        [ObjectRecord(id=f"s{i}", text=f"remote tier doc {i}", namespace="cold") for i in range(3)]
    )
    ds.spill("s3://bucket/spill/cold")
    assert any(k[1].startswith("spill/cold/") for k in fake_s3.objects)
    docs_dir = data_dir / "cold" / "docs"
    assert not list(docs_dir.glob("seg-*.npz"))

    ds.restore("s3://bucket/spill/cold")
    assert ds.stats().docs_count == 3
    assert len(ds.search("remote tier", [], 0, 10)) == 3


def test_segment_spill_restore(tmp_path):
    data_dir = tmp_path / "data"
    remote = tmp_path / "remote"
    ds = Dataset("cold", data_dir, use_device=False)
    ds.ingest(
        [ObjectRecord(id=f"c{i}", text=f"cold storage doc {i}", namespace="cold") for i in range(5)]
    )
    assert ds.search("cold storage", [], 0, 10)

    ds.spill(str(remote))
    # local segment files gone, spilled markers present
    docs_dir = data_dir / "cold" / "docs"
    assert not list(docs_dir.glob("seg-*.npz"))
    assert list(docs_dir.glob("seg-*.spilled"))
    # cold entries keep their live counts: an offloaded namespace is not
    # "empty" to stats/health
    assert ds.stats().docs_count == 5
    assert ds.has_cold_segments

    ds.restore(str(remote))
    assert ds.stats().docs_count == 5
    res = ds.search("cold storage", [], 0, 10)
    assert len(res) == 5


def test_spilled_namespace_reopens_after_restart(tmp_path):
    data_dir = tmp_path / "data"
    remote = tmp_path / "remote"
    ds = Dataset("ns", data_dir, use_device=False)
    ds.ingest([ObjectRecord(id="a", text="alpha beta", namespace="ns")])
    ds.spill(str(remote))

    ds2 = Dataset("ns", data_dir, use_device=False)
    # segments are spilled: not loadable until restore
    ds2.restore(str(remote))
    assert [r.id for r in ds2.search("alpha", [], 0, 10)] == ["a"]

def test_write_to_spilled_index_preserves_cold_segments(tmp_path):
    """Commits while segments are cold must keep their manifest entries
    (an upsert used to rewrite meta.json from in-memory segments only,
    permanently orphaning the spilled data)."""
    data_dir = tmp_path / "data"
    remote = tmp_path / "remote"
    ds = Dataset("ns", data_dir, use_device=False)
    ds.ingest([ObjectRecord(id="old", text="archived alpha", namespace="ns")])
    ds.spill(str(remote))

    # reopen cold, then WRITE without restoring first
    ds2 = Dataset("ns", data_dir, use_device=False)
    ds2.ingest([ObjectRecord(id="new", text="fresh beta", namespace="ns")])
    # the cold segment id must still be in the manifest
    manifest_ids = set(ds2.docs().manifest.segment_ids)
    assert set(ds2.docs().cold_segments) <= manifest_ids
    assert len(ds2.docs().cold_segments) == 1

    # restore brings the old doc back alongside the new one
    ds2.restore(str(remote))
    ids = {r.id for r in ds2.search("alpha beta archived fresh", [], 0, 10)}
    assert ids == {"old", "new"}


def test_delete_and_merge_preserve_cold_segments(tmp_path):
    data_dir = tmp_path / "data"
    remote = tmp_path / "remote"
    ds = Dataset("ns", data_dir, use_device=False)
    ds.ingest([ObjectRecord(id="old", text="cold gamma", namespace="ns")])
    ds.spill(str(remote))

    ds2 = Dataset("ns", data_dir, use_device=False)
    cold_id = next(iter(ds2.docs().cold_segments))
    ds2.ingest([ObjectRecord(id="h1", text="hot one", namespace="ns")])
    ds2.ingest([ObjectRecord(id="h2", text="hot two", namespace="ns")])
    ds2.delete_document("h1")
    ds2.docs().maybe_merge(force=True)
    assert cold_id in ds2.docs().manifest.segment_ids
    # the spilled marker must survive merge gc
    assert (data_dir / "ns" / "docs" / f"seg-{cold_id}.spilled").exists()
    ds2.restore(str(remote))
    ids = {r.id for r in ds2.search("cold hot gamma one two", [], 0, 10)}
    assert ids == {"old", "h2"}


def test_spill_marker_durable_before_unlink(tmp_path, monkeypatch):
    """A crash between upload and local-file removal must leave the
    .spilled marker (the only durable pointer to the remote copy)
    already on disk — marker+files coexisting is recoverable, a
    vanished segment with no marker is not."""
    from pathlib import Path

    sp = SegmentSpiller(f"file://{tmp_path}/remote")
    d = tmp_path / "idx"
    d.mkdir()
    (d / "seg-abc.npz").write_bytes(b"payload")

    real_unlink = Path.unlink

    def crash(self, *a, **k):
        raise OSError("simulated crash mid-spill")

    monkeypatch.setattr(Path, "unlink", crash)
    with pytest.raises(OSError):
        sp.spill(d, "abc")
    monkeypatch.setattr(Path, "unlink", real_unlink)
    assert (d / "seg-abc.spilled").exists()  # pointer survived
    assert (d / "seg-abc.npz").exists()  # local copy survived too
    # restore over the coexisting state is clean and clears the marker
    sp.restore(d, "abc")
    assert (d / "seg-abc.npz").read_bytes() == b"payload"
    assert not (d / "seg-abc.spilled").exists()


def test_spill_unknown_segment_writes_no_marker(tmp_path):
    sp = SegmentSpiller(f"file://{tmp_path}/remote")
    d = tmp_path / "idx"
    d.mkdir()
    assert sp.spill(d, "ghost") == []
    assert not (d / "seg-ghost.spilled").exists()
    assert not sp.is_spilled(d, "ghost")


def test_http_urls_route_to_s3_not_filesystem():
    """Any endpoint-qualified http(s) URL is S3 — treating one as a
    local path would 'spill' into a junk directory then delete the
    real segment files."""
    loc = RemoteLocation.from_url("https://bucket.minio.internal:9000/cold/x")
    assert isinstance(loc.location, S3Location)
    assert loc.location.bucket == "bucket"
    assert loc.location.endpoint == "https://minio.internal:9000"
    # file:// and bare paths still route to the filesystem
    assert isinstance(
        RemoteLocation.from_url("/tmp/x").location, FileSystemLocation
    )


def test_delete_namespace_removes_remote_objects(tmp_path):
    """Deleting a spilled namespace must delete the cold-tier objects:
    the rmtree'd .spilled markers are the only pointers to those keys."""
    from fugu_tpu.config import ServerConfig
    from fugu_tpu.engine.manager import DatasetManager

    remote = tmp_path / "remote"
    cfg = ServerConfig(
        data_path=str(tmp_path / "data"), default_namespace="delns"
    )
    mgr = DatasetManager(cfg, use_device=False)
    ds = mgr.get_or_create_dataset("delns")
    ds.ingest([ObjectRecord(id="r1", text="orphan check", namespace="delns")])
    ds.spill(f"file://{remote}")
    assert any(remote.rglob("seg-*.npz"))  # objects landed remotely
    assert mgr.delete_namespace("delns")
    assert not any(remote.rglob("seg-*"))  # ...and were cleaned up


def test_cold_upsert_no_duplicate_after_restore(tmp_path):
    """Re-upserting an id while its namespace is cold must not leave
    two live copies after restore — the cold copy is tombstoned via the
    manifest's pending-delete queue."""
    data_dir = tmp_path / "data"
    remote = tmp_path / "remote"
    ds = Dataset("cw", data_dir, use_device=False)
    ds.ingest([ObjectRecord(id="dup", text="version one alpha", namespace="cw")])
    ds.spill(f"file://{remote}")
    # write the SAME id while cold (no restore forced)
    ds.ingest([ObjectRecord(id="dup", text="version two beta", namespace="cw")])
    assert ds.docs().has_cold  # still lazy
    ds.restore(f"file://{remote}")
    hits = ds.search("version alpha beta", [], 0, 10)
    assert [h.id for h in hits] == ["dup"], [(h.id, h.text) for h in hits]
    assert "two" in hits[0].text  # the NEW copy won
    assert ds.get("dup")[0]["text"] == "version two beta"
    ds.close()


def test_cold_delete_applies_at_restore(tmp_path):
    """delete_document on a cold namespace must not silently no-op: the
    id is queued and the doc stays dead after restore (and across a
    restart-before-restore crash)."""
    data_dir = tmp_path / "data"
    remote = tmp_path / "remote"
    ds = Dataset("cd", data_dir, use_device=False)
    ds.ingest(
        [
            ObjectRecord(id="gone", text="ephemeral doc", namespace="cd"),
            ObjectRecord(id="kept", text="permanent doc", namespace="cd"),
        ]
    )
    ds.spill(f"file://{remote}")
    ds.delete_document("gone")
    ds.close()

    # restart BEFORE restore: the pending delete must be durable
    ds2 = Dataset("cd", data_dir, use_device=False)
    assert ds2.has_cold_segments
    ids = {h.id for h in ds2.search("ephemeral permanent doc", [], 0, 10)}
    assert ids == {"kept"}, ids
    assert ds2.get("gone") == []
    # a second spill/restore cycle must NOT re-kill a reborn id
    ds2.ingest([ObjectRecord(id="gone", text="reborn doc", namespace="cd")])
    ds2.spill(f"file://{remote}")
    ds2.restore(f"file://{remote}")
    assert {h.id for h in ds2.search("reborn permanent doc", [], 0, 10)} == {
        "gone",
        "kept",
    }
    ds2.close()
