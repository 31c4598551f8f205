"""Crash-consistency of the commit protocol (SURVEY §5 checkpoint/
resume): a crash between segment-file writes and the atomic meta.json
publish must leave the index serving the LAST COMMITTED state on
reopen — torn orphan files are ignored and garbage-collected, stale
manifest tmp files never shadow the real manifest.

Reference analog: Tantivy's open_or_create + per-batch commit
(`/root/reference/src/db/core.rs:238-245`, `db/document.rs:65`) —
durability there is Tantivy's meta.json atomic replace; this is ours.
"""

import os
from pathlib import Path

import numpy as np
import pytest

from fugu_tpu.engine.manager import DatasetManager
from fugu_tpu.records import ObjectRecord


def _mk(tmp_path):
    mgr = DatasetManager.with_defaults(str(tmp_path), "crashns")
    ds = mgr.get_or_create_dataset("crashns")
    ds.ingest(
        [
            ObjectRecord(id="a", text="the quick brown fox"),
            ObjectRecord(id="b", text="lazy dogs sleep"),
            ObjectRecord(id="c", text="quick dogs and foxes"),
        ]
    )
    return mgr, ds


def _search_ids(ds, q):
    return [r.id for r in ds.search(q, [], 0, 10)]


def _docs_dir(tmp_path) -> Path:
    return Path(tmp_path) / "crashns" / "docs"


def test_torn_uncommitted_files_ignored_on_reopen(tmp_path):
    mgr, ds = _mk(tmp_path)
    want = _search_ids(ds, "quick")
    assert want  # committed state serves

    d = _docs_dir(tmp_path)
    assert (d / "meta.json").exists()
    # crash mid-commit: a torn, manifest-unreferenced segment pack...
    (d / "seg-deadbeefdeadbeef.npz").write_bytes(b"PK\x03\x04 torn!")
    # ...a torn doc store for the same orphan...
    (d / "seg-deadbeefdeadbeef.store.msgpack").write_bytes(b"\x93tor")
    # ...a stale manifest tmp from the dying process...
    (d / f"meta.json.tmp{os.getpid() + 1}").write_bytes(b'{"generation"')
    # ...and a torn tombstone tmp
    (d / "seg-deadbeefdeadbeef.tomb.tmp99.npy").write_bytes(b"\x93NUM")

    mgr2 = DatasetManager.with_defaults(str(tmp_path), "crashns")
    ds2 = mgr2.get_or_create_dataset("crashns")
    assert _search_ids(ds2, "quick") == want
    # startup gc reclaimed the orphan pack (it was never published)
    assert not (d / "seg-deadbeefdeadbeef.npz").exists()
    # and writes still work after recovery
    ds2.ingest([ObjectRecord(id="e", text="quick recovery doc")])
    assert set(_search_ids(ds2, "recovery")) == {"e"}


def test_stale_manifest_tmp_never_shadows(tmp_path):
    mgr, ds = _mk(tmp_path)
    want = _search_ids(ds, "dogs")
    d = _docs_dir(tmp_path)
    real = (d / "meta.json").read_bytes()
    # a crashed writer's half-written manifest tmp must not be read
    (d / "meta.json.tmp424242").write_bytes(real[: len(real) // 2])
    mgr2 = DatasetManager.with_defaults(str(tmp_path), "crashns")
    ds2 = mgr2.get_or_create_dataset("crashns")
    assert _search_ids(ds2, "dogs") == want


def test_truncated_committed_pack_fails_loudly(tmp_path):
    """Real data loss (a COMMITTED pack torn on disk) must raise on
    reopen, not silently serve partial results."""
    mgr, ds = _mk(tmp_path)
    d = _docs_dir(tmp_path)
    packs = sorted(d.glob("seg-*.npz"))
    assert packs
    data = packs[0].read_bytes()
    packs[0].write_bytes(data[: max(len(data) // 3, 8)])
    with pytest.raises(Exception):
        mgr2 = DatasetManager.with_defaults(str(tmp_path), "crashns")
        ds2 = mgr2.get_or_create_dataset("crashns")
        ds2.search("quick", [], 0, 10)
