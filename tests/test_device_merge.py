"""On-device segment merge parity (ops/device_merge.py).

The merged device pack rebuilt in HBM from source packs must be
bit-identical to the pack `merged.device_pack()` would upload from the
host merge (SURVEY §2b north star: on-device merge-sort with tombstone
filtering; host ground truth is index/merge.py).
"""

import numpy as np
import pytest

from fugu_tpu.index.merge import merge_segments
from fugu_tpu.index.schema import SCHEMAS, IndexType
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops.device_merge import attach_device_pack, device_merge_entries

DOCS = SCHEMAS[IndexType.DOCS]


def build_seg(rng, n_docs, vocab, prefix, with_facets=True):
    b = SegmentBuilder(DOCS)
    for d in range(n_docs):
        words = rng.choice(vocab, size=int(rng.integers(3, 12)))
        facets = (
            [f"/namespace/ns{int(rng.integers(0, 3))}", "/type/a/b"]
            if with_facets
            else []
        )
        b.add_document(
            {"text": [" ".join(words)], "id": [f"{prefix}{d}"]},
            facets=facets,
            stored={"id": f"{prefix}{d}"},
        )
    return b.build()


def fetch(pack):
    return tuple(np.asarray(a) for a in pack)


@pytest.mark.parametrize("n_segs", [2, 3])
def test_device_merge_matches_host_pack(n_segs):
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(80)]
    segs = [
        build_seg(rng, 60 + 30 * i, vocab, f"s{i}d") for i in range(n_segs)
    ]
    # tombstone a scattered subset
    for seg in segs:
        kill = rng.choice(seg.doc_count, size=seg.doc_count // 5, replace=False)
        seg.tombstones[kill] = True

    merged, plan = merge_segments(segs, DOCS, return_plan=True)
    got = device_merge_entries(segs, plan, merged)
    want = merged.device_pack()  # host-built ground truth

    g_doc, g_tffid = fetch(got)
    w_doc, w_tffid, _ = fetch(want)
    assert g_doc.shape == w_doc.shape
    np.testing.assert_array_equal(g_doc, w_doc)
    np.testing.assert_array_equal(g_tffid, w_tffid)


def test_racing_delete_lands_in_tomb_words_only():
    """Deletes forwarded after the merge appear in the attached pack's
    tombstone words while the entry arrays stay snapshot-consistent."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    segs = [build_seg(rng, 50, vocab, f"r{i}d") for i in range(2)]
    snaps = [s.tombstones.copy() for s in segs]
    merged, plan = merge_segments(segs, DOCS, tombstones=snaps, return_plan=True)
    entries = device_merge_entries(segs, plan, merged)
    # racing delete, forwarded the way the compactor does
    segs[0].delete_by_term("id", "r0d7")
    newly = segs[0].tombstones & ~snaps[0]
    merged.tombstones[plan.remaps[0][np.nonzero(newly)[0]]] = True

    attach_device_pack(merged, entries)
    d_doc, d_tffid, d_tomb = merged._device_pack
    # pack identical to a fresh host upload of the same merged segment
    merged._device_pack = None
    w_doc, w_tffid, w_tomb = merged.device_pack()
    np.testing.assert_array_equal(np.asarray(d_doc), np.asarray(w_doc))
    np.testing.assert_array_equal(np.asarray(d_tffid), np.asarray(w_tffid))
    np.testing.assert_array_equal(np.asarray(d_tomb), np.asarray(w_tomb))
    assert np.asarray(d_tomb).any()


def test_empty_and_fully_deleted_sources():
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(20)]
    a = build_seg(rng, 30, vocab, "ea")
    b = build_seg(rng, 25, vocab, "eb")
    b.tombstones[:] = True  # fully dead source
    merged, plan = merge_segments([a, b], DOCS, return_plan=True)
    got = device_merge_entries([a, b], plan, merged)
    want = merged.device_pack()
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    assert merged.doc_count == 30
