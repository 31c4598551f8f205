"""Segment builder / posting-pack invariants."""

import numpy as np

from fugu_tpu.index.segment import (
    DOC_SENTINEL,
    FACET_FIELD_KEY,
    SegmentBuilder,
    facet_ancestors,
)
from fugu_tpu.index.schema import DOCS_SCHEMA


def build_tiny():
    b = SegmentBuilder(DOCS_SCHEMA)
    b.add_document({"text": ["hello world hello"]}, facets=["/ns/a/x"], stored={"id": "d0"})
    b.add_document({"text": ["world peace"]}, facets=["/ns/a/y", "/ns/b"], stored={"id": "d1"})
    b.add_document({"text": ["hello"], "name": ["Greeting Doc"]}, stored={"id": "d2"})
    return b.build()


def test_facet_ancestors():
    assert list(facet_ancestors("/a/b/c")) == ["/a", "/a/b", "/a/b/c"]
    assert list(facet_ancestors("/x")) == ["/x"]


def test_postings_sorted_and_tf():
    seg = build_tiny()
    docs, tfs, fids = seg.postings("text", "hello")
    assert docs.tolist() == [0, 2]
    assert tfs.tolist() == [2, 1]
    docs, tfs, _ = seg.postings("text", "world")
    assert docs.tolist() == [0, 1]
    assert tfs.tolist() == [1, 1]


def test_doc_freq_and_stats():
    seg = build_tiny()
    assert seg.doc_count == 3
    assert seg.doc_freq("text", "hello") == 2
    assert seg.doc_freq("text", "nope") == 0
    assert seg.total_tokens["text"] == 3 + 2 + 1
    assert seg.total_tokens["name"] == 2


def test_fieldnorm_inlined_per_entry():
    seg = build_tiny()
    _, _, fids = seg.postings("text", "hello")
    assert fids[0] == seg.fieldnorm_ids["text"][0]
    assert fids[1] == seg.fieldnorm_ids["text"][2]


def test_facet_postings_ancestor_expanded():
    seg = build_tiny()
    assert seg.facet_docs("/ns").tolist() == [0, 1]
    assert seg.facet_docs("/ns/a").tolist() == [0, 1]
    assert seg.facet_docs("/ns/a/x").tolist() == [0]
    assert seg.facet_docs("/ns/b").tolist() == [1]
    assert seg.facet_docs("/none").tolist() == []


def test_pack_padding_sentinel():
    seg = build_tiny()
    assert seg.e_doc.shape[0] > seg.n_entries
    assert np.all(seg.e_doc[seg.n_entries :] == DOC_SENTINEL)


def test_positions_recorded():
    seg = build_tiny()
    pos = seg.term_positions("text", "hello")
    assert pos == [[0, 2], [0]]


def test_delete_by_term_and_live_mask():
    seg = build_tiny()
    # doc ids indexed lowercased; raw term matches the lowercase token
    n = seg.delete_by_term("text", "peace")
    assert n == 1
    assert seg.num_live_docs == 2
    assert seg.tombstones.tolist() == [False, True, False]
    assert seg.delete_by_term("text", "peace") == 0  # already dead


def test_device_pack_tomb_words():
    seg = build_tiny()
    seg.delete_by_term("text", "peace")
    e_doc, e_tffid, tomb = seg.device_pack()
    words = np.asarray(tomb)
    assert words[0] == (1 << 1)
    # tf/fid pack round-trips
    packed = np.asarray(e_tffid)[: seg.n_entries]
    assert np.array_equal(packed & 0xFFFFFF, seg.e_tf[: seg.n_entries])
    assert np.array_equal((packed >> 24) & 0xFF, seg.e_fid[: seg.n_entries])
