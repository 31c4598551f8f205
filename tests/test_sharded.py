"""Multi-chip (virtual 8-device CPU mesh) sharded search vs oracle
(SURVEY.md §4 item 4)."""

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle
from fugu_tpu.parallel.sharded import ShardedPack, make_mesh, sharded_search
from fugu_tpu.query import Occur, QueryGroup, QueryPlan, TermClause

VOCAB = [f"w{i}" for i in range(40)]


@pytest.fixture(scope="module")
def mesh():
    import jax

    n = min(len(jax.devices()), 8)
    if n < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh(n)


@pytest.fixture(scope="module")
def seg():
    rng = np.random.default_rng(11)
    p = 1.0 / np.arange(1, len(VOCAB) + 1)
    p /= p.sum()
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(500):
        words = rng.choice(VOCAB, size=int(rng.integers(2, 40)), p=p)
        b.add_document(
            {"text": [" ".join(words)]},
            facets=[f"/cat/{int(rng.integers(0, 4))}"],
            stored={"id": f"d{i}"},
        )
    return b.build()


def check(seg, mesh, plan, limit=10):
    stats = oracle.IndexStats([seg])
    pack = ShardedPack(seg, mesh)
    got = sharded_search(pack, plan, stats, limit)
    assert got is not None
    expected = oracle.search([seg], plan, limit, stats)
    assert len(got) == len(expected)
    for (gs, gd), h in zip(got, expected):
        if gd != h.doc:
            assert gs == pytest.approx(h.score, rel=1e-5)
        assert gs == pytest.approx(h.score, rel=1e-5, abs=1e-6)


def test_sharded_single_term(seg, mesh):
    plan = QueryPlan(groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),))
    check(seg, mesh, plan)


def test_sharded_multi_term(seg, mesh):
    plan = QueryPlan(
        groups=tuple(
            QueryGroup(Occur.SHOULD, (TermClause("text", w),))
            for w in ["w1", "w3", "w8"]
        )
    )
    check(seg, mesh, plan, limit=25)


def test_sharded_boolean(seg, mesh):
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.MUST, (TermClause("text", "w0"),)),
            QueryGroup(Occur.MUST, (TermClause("text", "w2"),)),
            QueryGroup(Occur.MUST_NOT, (TermClause("text", "w5"),)),
        )
    )
    check(seg, mesh, plan, limit=50)


def test_sharded_facet_filter(seg, mesh):
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.MUST, (TermClause("text", "w1"),)),
            QueryGroup(Occur.MUST, (TermClause("", "/cat/1", is_facet=True),)),
        )
    )
    check(seg, mesh, plan, limit=30)


def test_sharded_tombstones(seg, mesh):
    seg.tombstones[: 60] = True
    try:
        plan = QueryPlan(
            groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),)
        )
        check(seg, mesh, plan, limit=20)
    finally:
        seg.tombstones[:] = False
