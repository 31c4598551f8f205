"""Device pipeline vs NumPy oracle: randomized parity (SURVEY.md §4 item 2)."""

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle, scoring
from fugu_tpu.query import Occur, QueryGroup, QueryPlan, TermClause

VOCAB = [f"w{i}" for i in range(50)]


def random_segment(rng, n_docs=300, with_facets=True):
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(n_docs):
        n_words = int(rng.integers(1, 30))
        words = rng.choice(VOCAB, size=n_words, p=_zipf(len(VOCAB)))
        facets = []
        if with_facets:
            facets = [f"/cat/{rng.integers(0, 5)}"]
        b.add_document(
            {"text": [" ".join(words)]}, facets=facets, stored={"id": f"d{i}"}
        )
    return b.build()


def _zipf(n):
    p = 1.0 / np.arange(1, n + 1)
    return p / p.sum()


def assert_matches_oracle(segs, plan, limit=10):
    stats = oracle.IndexStats(segs)
    expected = oracle.search(segs, plan, limit, stats)
    got = []
    for ord_, seg in enumerate(segs):
        res = scoring.device_search_segment(seg, plan, stats, limit)
        assert res is not None, "device path unexpectedly refused this plan"
        got.extend((s, ord_, d) for s, d in res)
    got.sort(key=lambda h: (-h[0], h[1], h[2]))
    got = got[:limit]

    assert len(got) == len(expected), (got, [(h.score, h.doc) for h in expected])
    for (gs, gseg, gd), h in zip(got, expected):
        # identical doc unless scores are ulp-level ties
        if (gseg, gd) != (h.segment_ord, h.doc):
            assert gs == pytest.approx(h.score, rel=1e-5)
        assert gs == pytest.approx(h.score, rel=1e-5, abs=1e-6)


def test_single_term_matches_oracle():
    rng = np.random.default_rng(0)
    segs = [random_segment(rng)]
    plan = QueryPlan(groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),))
    assert_matches_oracle(segs, plan)


def test_multi_term_should():
    rng = np.random.default_rng(1)
    segs = [random_segment(rng)]
    plan = QueryPlan(
        groups=tuple(
            QueryGroup(Occur.SHOULD, (TermClause("text", w),))
            for w in ["w0", "w3", "w7"]
        )
    )
    assert_matches_oracle(segs, plan, limit=20)


def test_must_and_mustnot():
    rng = np.random.default_rng(2)
    segs = [random_segment(rng)]
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.MUST, (TermClause("text", "w0"),)),
            QueryGroup(Occur.MUST, (TermClause("text", "w1"),)),
            QueryGroup(Occur.MUST_NOT, (TermClause("text", "w2"),)),
        )
    )
    assert_matches_oracle(segs, plan, limit=50)


def test_facet_filter_fused():
    rng = np.random.default_rng(3)
    segs = [random_segment(rng)]
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.MUST, (TermClause("text", "w0"),)),
            QueryGroup(Occur.MUST, (TermClause("", "/cat/2", is_facet=True),)),
        )
    )
    assert_matches_oracle(segs, plan, limit=30)


def test_multifield_group():
    b = SegmentBuilder(DOCS_SCHEMA)
    b.add_document({"text": ["alpha beta"], "name": ["Gamma"]}, stored={})
    b.add_document({"text": ["gamma"], "name": ["Alpha"]}, stored={})
    b.add_document({"text": ["beta"]}, stored={})
    segs = [b.build()]
    plan = QueryPlan(
        groups=(
            QueryGroup(
                Occur.SHOULD,
                (TermClause("text", "alpha"), TermClause("name", "alpha")),
            ),
        )
    )
    assert_matches_oracle(segs, plan)


def test_tombstones_on_device():
    rng = np.random.default_rng(4)
    segs = [random_segment(rng)]
    segs[0].tombstones[:50] = True
    segs[0]._device_pack = None
    plan = QueryPlan(
        groups=tuple(
            QueryGroup(Occur.SHOULD, (TermClause("text", w),)) for w in ["w0", "w1"]
        )
    )
    assert_matches_oracle(segs, plan, limit=25)


def test_multi_segment():
    rng = np.random.default_rng(5)
    segs = [random_segment(rng, n_docs=120), random_segment(rng, n_docs=80)]
    plan = QueryPlan(
        groups=tuple(
            QueryGroup(Occur.SHOULD, (TermClause("text", w),))
            for w in ["w0", "w2", "w4", "w9"]
        )
    )
    assert_matches_oracle(segs, plan, limit=15)


def test_randomized_sweep():
    rng = np.random.default_rng(6)
    segs = [random_segment(rng, n_docs=200)]
    for trial in range(10):
        n_terms = int(rng.integers(1, 6))
        words = list(rng.choice(VOCAB[:20], size=n_terms, replace=False))
        occurs = rng.choice(
            [Occur.SHOULD, Occur.MUST, Occur.MUST_NOT], size=n_terms, p=[0.6, 0.3, 0.1]
        )
        groups = tuple(
            QueryGroup(o, (TermClause("text", w),)) for w, o in zip(words, occurs)
        )
        # ensure at least one positive group
        if all(o is Occur.MUST_NOT for o in occurs):
            groups = groups + (QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),)
        plan = QueryPlan(groups=groups)
        assert_matches_oracle(segs, plan, limit=20)


def test_fallback_for_match_all():
    rng = np.random.default_rng(7)
    seg = random_segment(rng, n_docs=10)
    stats = oracle.IndexStats([seg])
    assert (
        scoring.device_search_segment(seg, QueryPlan(match_all=True), stats, 5) is None
    )
