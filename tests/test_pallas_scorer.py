"""Pallas block scorer vs oracle (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle
from fugu_tpu.ops.pallas_scorer import pallas_search_batch
from fugu_tpu.query import Occur, QueryGroup, QueryPlan, TermClause

VOCAB = [f"w{i}" for i in range(60)]


def make_segment(n_docs=5000, seed=0):
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, len(VOCAB) + 1)
    p /= p.sum()
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(n_docs):
        words = rng.choice(VOCAB, size=int(rng.integers(2, 30)), p=p)
        b.add_document(
            {"text": [" ".join(words)]},
            facets=[f"/cat/{int(rng.integers(0, 5))}"],
            stored={"id": f"d{i}"},
        )
    return b.build()


@pytest.fixture(scope="module")
def seg():
    return make_segment()


def check(seg, plan, limit=10):
    stats = oracle.IndexStats([seg])
    got = pallas_search_batch(seg, [plan], stats, limit, interpret=True)[0]
    assert got is not None
    expected = oracle.search([seg], plan, limit, stats)
    assert len(got) == len(expected), (got, expected)
    for (gs, gd), h in zip(got, expected):
        if gd != h.doc:
            assert gs == pytest.approx(h.score, rel=1e-5)
        assert gs == pytest.approx(h.score, rel=1e-5, abs=1e-6)


def plan_terms(*words, occur=Occur.SHOULD):
    return QueryPlan(
        groups=tuple(
            QueryGroup(occur, (TermClause("text", w),)) for w in words
        )
    )


def test_single_term(seg):
    check(seg, plan_terms("w0"))


def test_sparse_term(seg):
    check(seg, plan_terms("w55"), limit=20)


def test_multi_term_or(seg):
    check(seg, plan_terms("w0", "w3", "w9"), limit=15)


def test_must(seg):
    check(seg, plan_terms("w0", "w1", occur=Occur.MUST), limit=25)


def test_mustnot(seg):
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),
            QueryGroup(Occur.MUST_NOT, (TermClause("text", "w1"),)),
        )
    )
    check(seg, plan, limit=20)


def test_facet_filter(seg):
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.MUST, (TermClause("text", "w1"),)),
            QueryGroup(Occur.MUST, (TermClause("", "/cat/2", is_facet=True),)),
        )
    )
    check(seg, plan, limit=20)


def test_tombstones(seg):
    seg.tombstones[:500] = True
    seg._device_pack = None
    seg._device_tomb_flags = None
    try:
        check(seg, plan_terms("w0", "w2"), limit=20)
    finally:
        seg.tombstones[:] = False
        seg._device_pack = None
        seg._device_tomb_flags = None


def test_batched_mixed(seg):
    stats = oracle.IndexStats([seg])
    plans = [
        plan_terms("w0"),
        plan_terms("w1", "w4"),
        plan_terms("w2", "w5", "w7"),
        plan_terms("w50"),
    ]
    got = pallas_search_batch(seg, plans, stats, 10, interpret=True)
    for plan, res in zip(plans, got):
        assert res is not None
        exp = oracle.search([seg], plan, 10, stats)
        assert len(res) == len(exp)
        for (gs, gd), h in zip(res, exp):
            if gd != h.doc:
                assert gs == pytest.approx(h.score, rel=1e-5)


def test_small_segment_single_block():
    seg = make_segment(n_docs=100, seed=3)
    check(seg, plan_terms("w0", "w1"))


def test_empty_result():
    seg = make_segment(n_docs=50, seed=4)
    stats = oracle.IndexStats([seg])
    plan = plan_terms("zzz_absent")
    res = pallas_search_batch(seg, [plan], stats, 10, interpret=True)
    assert res[0] == []


def test_block_slice_split(seg, monkeypatch):
    """Block-heavy queries split into <=NB_SPLIT-block rows whose top-k
    lists merge on the host; forcing NB_SPLIT=1 makes every block its
    own row and must still reproduce the oracle exactly."""
    from fugu_tpu.ops import pallas_scorer as ps

    monkeypatch.setattr(ps, "NB_SPLIT", 1)
    check(seg, plan_terms("w0", "w3"))
    check(seg, plan_terms("w0", "w5", occur=Occur.MUST))


def test_k_up_to_128(seg):
    """limits in (64, 128] run on-device now (MAX_K == K_OUT == 128);
    beyond that the engine returns None and the caller falls back."""
    from fugu_tpu.ops import pallas_scorer as ps

    check(seg, plan_terms("w1"), limit=100)
    stats = oracle.IndexStats([seg])
    out = ps.pallas_search_batch(seg, [plan_terms("w1")], stats, 129,
                                 interpret=True)
    assert out == [None]


def test_group_bit_31_no_overflow(seg):
    """A 32-group plan puts group index 31's bit at 2**31, which
    overflows an int32 numpy mask assignment unless wrapped to
    two's-complement (ops.scoring.mask_i32).  30 clauseless SHOULD
    groups keep t_pad small so the plan reaches dispatch."""
    groups = (
        (QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),)
        + tuple(QueryGroup(Occur.SHOULD, ()) for _ in range(30))
        + (QueryGroup(Occur.MUST_NOT, (TermClause("text", "w1"),)),)
    )
    plan = QueryPlan(groups=groups)
    assert len(plan.groups) == 32
    check(seg, plan, limit=20)
