"""Two-phase batch engine (corpus-stream phase A + pruned phase B):
oracle parity in interpret mode on the CPU backend."""

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle
from fugu_tpu.ops.batch_scorer import batch_search_should
from fugu_tpu.query import Occur, QueryGroup, QueryPlan, TermClause


@pytest.fixture(scope="module")
def seg():
    rng = np.random.default_rng(2)
    words = [f"w{i}" for i in range(50)]
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(5000):
        text = " ".join(rng.choice(words, size=int(rng.integers(3, 25))))
        b.add_document(
            {"text": [text]},
            facets=[f"/cat/{int(rng.integers(0, 6))}"],
            stored={"id": f"d{i}"},
        )
    s = b.build()
    s.tombstones[::53] = True  # dead docs must be zeroed in phase A
    return s


def test_batch_scorer_parity(seg):
    stats = oracle.IndexStats([seg])
    rng = np.random.default_rng(4)
    plans = []
    for _ in range(24):
        n = int(rng.integers(1, 5))
        terms = rng.choice(50, size=n, replace=False)
        groups = [
            QueryGroup(Occur.SHOULD, (TermClause("text", f"w{t}"),))
            for t in terms
        ]
        if rng.random() < 0.25:
            groups.append(
                QueryGroup(
                    Occur.SHOULD,
                    (TermClause("", f"/cat/{int(rng.integers(0, 6))}", is_facet=True),),
                )
            )
        plans.append(QueryPlan(groups=tuple(groups)))
    res = batch_search_should(seg, plans, stats, 10, interpret=True)
    for plan, r in zip(plans, res):
        assert r is not None
        exp = [(h.score, h.doc) for h in oracle.search([seg], plan, 10, stats)]
        assert len(r) == len(exp)
        for (gs, gd), (ws, wd) in zip(r, exp):
            # same doc, or a documented ulp tie flip at equal score
            assert gd == wd or abs(gs - ws) <= 1e-5 * max(abs(ws), 1.0), (
                r[:4],
                exp[:4],
            )


def test_batch_scorer_skips_ineligible(seg):
    stats = oracle.IndexStats([seg])
    plans = [
        # boolean: maxima are not valid pruning bounds
        QueryPlan(
            groups=(
                QueryGroup(Occur.MUST, (TermClause("text", "w0"),)),
                QueryGroup(Occur.MUST_NOT, (TermClause("text", "w1"),)),
            )
        ),
        # non-default bm25 constants: precomputed contributions invalid
        QueryPlan(
            groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),),
            k1=2.0,
        ),
        QueryPlan(match_all=True),
    ]
    res = batch_search_should(seg, plans, stats, 10, interpret=True)
    assert res == [None, None, None]


def test_batch_scorer_empty_and_missing_terms(seg):
    stats = oracle.IndexStats([seg])
    plans = [
        QueryPlan(
            groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "zzz_absent"),)),)
        ),
        QueryPlan(groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w3"),)),)),
    ]
    res = batch_search_should(seg, plans, stats, 10, interpret=True)
    assert res[0] == []
    exp = [(h.score, h.doc) for h in oracle.search([seg], plans[1], 10, stats)]
    assert [d for _, d in res[1]] == [d for _, d in exp]
