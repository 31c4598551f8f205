"""Dataset-level sharded search: full engine path over a virtual mesh."""

import numpy as np
import pytest

from fugu_tpu.engine.dataset import Dataset
from fugu_tpu.engine.named_index import DEVICE_MIN_ENTRIES
from fugu_tpu.parallel.sharded import make_mesh
from fugu_tpu.records import ObjectRecord


@pytest.fixture(scope="module")
def mesh():
    import jax

    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh(n)


def test_dataset_search_through_mesh(tmp_path, mesh):
    ds = Dataset("mesh", tmp_path, use_device=True)
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(50)]
    records = [
        ObjectRecord(
            id=f"m{i}",
            text=" ".join(rng.choice(vocab, size=20)),
            namespace="mesh",
        )
        for i in range(600)
    ]
    ds.ingest(records)
    assert ds.docs().segments[0].n_entries >= DEVICE_MIN_ENTRIES

    base = ds.search("w0 w1", [], 0, 10)
    ds.docs().enable_sharding(mesh)
    sharded = ds.search("w0 w1", [], 0, 10)
    assert [r.id for r in sharded] == [r.id for r in base]
    assert [round(r.score, 5) for r in sharded] == [
        round(r.score, 5) for r in base
    ]


def test_mesh_with_filters(tmp_path, mesh):
    ds = Dataset("meshf", tmp_path, use_device=True)
    records = [
        ObjectRecord(
            id=f"f{i}",
            text=f"shared word item{i}",
            namespace="meshf",
            data_type="even" if i % 2 == 0 else "odd",
        )
        for i in range(400)
    ]
    ds.ingest(records)
    ds.docs().enable_sharding(mesh)
    res = ds.search("shared", ["/namespace/meshf/data/even"], 0, 5)
    assert res
    assert all(int(r.id[1:]) % 2 == 0 for r in res)


def test_delete_invalidates_cached_sharded_pack(tmp_path, mesh):
    """delete_document mutates segment.tombstones in place (same segment
    identity) — the cached sharded pack's device tombstones must not
    keep serving the deleted doc."""
    ds = Dataset("meshd", tmp_path, use_device=True)
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    records = [
        ObjectRecord(
            id=f"d{i}",
            text="victim " + " ".join(rng.choice(vocab, size=20)),
            namespace="meshd",
        )
        for i in range(600)
    ]
    ds.ingest(records)
    seg = ds.docs().segments[0]
    assert seg.n_entries >= DEVICE_MIN_ENTRIES
    ds.docs().enable_sharding(mesh)
    before = ds.search("victim", [], 0, 5)
    assert before
    # prove the device path is live: the cached pack exists afterwards
    assert ds.docs()._sharded_packs, "query did not take the sharded path"
    target = before[0].id
    ds.delete_document(target)
    after = {r.id for r in ds.search("victim", [], 0, 10)}
    assert target not in after, "cached sharded pack served a deleted doc"
