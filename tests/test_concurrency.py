"""Concurrent writer/reader stress over the Dataset layer.

The reference serves axum handlers concurrently over a Tantivy
IndexReader while a single writer commits per batch (core.rs writer
mutex + reader reloads).  Here the writer lock lives in NamedIndex and
searchers snapshot the segment list, so searches must never observe a
torn state while upserts, deletes, and compaction run underneath.
"""

import threading

import pytest

from fugu_tpu.config import ServerConfig
from fugu_tpu.engine.manager import DatasetManager
from fugu_tpu.records import ObjectRecord


def rec(i, text):
    return ObjectRecord(id=f"doc{i}", text=text, namespace="default")


@pytest.fixture()
def ds(tmp_path):
    cfg = ServerConfig.with_defaults(str(tmp_path), "default")
    mgr = DatasetManager(cfg, use_device=False)
    return mgr.get_dataset("default")


def test_search_during_ingest(ds):
    """Readers race a writer ingesting 40 batches; every search must
    return a consistent (possibly stale) view and never raise."""
    errors = []
    stop = threading.Event()

    def writer():
        try:
            for b in range(40):
                ds.ingest([rec(b * 5 + j, f"common token{b}") for j in range(5)])
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def reader():
        try:
            while not stop.is_set():
                hits = ds.search("common", [], 0, 300)
                ids = [h.id for h in hits]
                assert len(ids) == len(set(ids)), "duplicate ids in one view"
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert len(ds.search("common", [], 0, 300)) == 200


def test_search_during_compaction(ds):
    for b in range(6):
        ds.ingest([rec(b * 3 + j, "stable corpus words") for j in range(3)])
    assert len(ds.docs().segments) > 1
    errors = []
    stop = threading.Event()

    def compactor():
        try:
            ds.compact()
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def reader():
        try:
            while not stop.is_set():
                hits = ds.search("stable", [], 0, 50)
                assert len(hits) == 18
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=compactor)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert len(ds.docs().segments) == 1
    assert len(ds.search("stable", [], 0, 50)) == 18


def test_delete_during_search(ds):
    ds.ingest([rec(i, "ephemeral data point") for i in range(30)])
    errors = []
    stop = threading.Event()

    def deleter():
        try:
            for i in range(15):
                ds.delete_document(f"doc{i}")
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop.set()

    def reader():
        try:
            while not stop.is_set():
                hits = ds.search("ephemeral", [], 0, 60)
                assert 15 <= len(hits) <= 30
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=deleter), threading.Thread(target=reader)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    assert len(ds.search("ephemeral", [], 0, 60)) == 15


def test_concurrent_upserts_same_ids(ds):
    """Two writers upserting overlapping id ranges must serialize on the
    writer lock; the winner for each id is whichever batch committed
    last, and no id may appear twice."""
    errors = []

    def writer(tag):
        try:
            for b in range(10):
                ds.upsert([rec(b * 4 + j, f"{tag} payload") for j in range(4)])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in ("alpha", "beta")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    hits = ds.search("payload", [], 0, 200)
    ids = [h.id for h in hits]
    assert len(ids) == len(set(ids)) == 40


def test_search_during_ingest_sharded(tmp_path):
    """Mesh mode: readers race ingest while the sharded two-phase engine's
    per-segment pack caches (ShardedBlockMajor / PallasShardedPack) get
    invalidated by every commit — searches must stay consistent."""
    from fugu_tpu.parallel.sharded import make_mesh

    cfg = ServerConfig.with_defaults(str(tmp_path), "default")
    mgr = DatasetManager(cfg, use_device=True)
    ds = mgr.get_dataset("default")
    ds.upsert([rec(i, f"seed body w{i % 6}") for i in range(200)])
    ds.docs().enable_sharding(make_mesh(4))

    errors = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                hits = ds.search("body w1", [], 0, 10)
                for h in hits:
                    assert h.score > 0
        except Exception as e:
            errors.append(e)

    def writer():
        try:
            for b in range(6):
                ds.upsert(
                    [rec(200 + b * 20 + j, f"fresh body w{j % 6}") for j in range(20)]
                )
        except Exception as e:
            errors.append(e)

    rt = [threading.Thread(target=reader) for _ in range(2)]
    wt = threading.Thread(target=writer)
    for t in rt:
        t.start()
    wt.start()
    wt.join(120)
    stop.set()
    for t in rt:
        t.join(60)
    assert not errors, errors
    hits = ds.search("fresh", [], 0, 200)
    assert len(hits) == 120


def test_concurrent_get_or_create_single_instance(tmp_path):
    """Dataset construction now runs OUTSIDE the registry lock (with a
    _creating guard): racing creators of the same namespace must all get
    the SAME instance, and other namespaces must not block."""
    import threading

    from fugu_tpu.config import ServerConfig
    from fugu_tpu.engine.manager import DatasetManager

    mgr = DatasetManager(
        ServerConfig.with_defaults(str(tmp_path), "default"), use_device=False
    )
    results = [None] * 8
    barrier = threading.Barrier(8)

    def create(i):
        barrier.wait()
        ns = "shared" if i < 6 else f"other{i}"
        results[i] = (ns, mgr.get_or_create_dataset(ns))

    threads = [threading.Thread(target=create, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    shared = {id(ds) for ns, ds in results if ns == "shared"}
    assert len(shared) == 1, "racing creators built distinct datasets"
    assert all(ds is not None for _, ds in results)
    mgr.close()
