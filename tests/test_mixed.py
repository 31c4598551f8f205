"""ops/mixed.py — pruned exact top-k for phrase-bearing boolean plans.

Every result must be bit-identical to the dense oracle (scores AND tie
ordering): verification replays the oracle's exact float sequence, so
no tolerance is allowed.
"""

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle
from fugu_tpu.ops.blockmax import search_blockmax
from fugu_tpu.ops.mixed import search_mixed_topk
from fugu_tpu.query import (
    Occur,
    PhraseClause,
    QueryGroup,
    QueryPlan,
    TermClause,
)


@pytest.fixture(scope="module")
def seg():
    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(40)]
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(9000):  # > 2 BM_BLOCK=4096 blocks
        n = int(rng.integers(4, 28))
        text = " ".join(rng.choice(words, size=n))
        b.add_document(
            {"text": [text]},
            facets=[f"/cat/{int(rng.integers(0, 5))}"],
            stored={"id": f"d{i}"},
        )
    s = b.build()
    s.tombstones[::53] = True
    return s


@pytest.fixture(scope="module")
def stats(seg):
    return oracle.IndexStats([seg])


def _expect(seg, stats, plan, limit):
    return [
        (np.float32(h.score), h.doc)
        for h in oracle.search([seg], plan, limit, stats)
    ]


def _got(res):
    return [(np.float32(s), d) for s, d in res]


def _g_phrase(words, occur=Occur.SHOULD, slop=0, boost=1.0):
    return QueryGroup(
        occur,
        phrases=(PhraseClause("text", tuple(words), boost=boost, slop=slop),),
    )


def _g_term(word, occur=Occur.SHOULD, boost=1.0):
    return QueryGroup(occur, (TermClause("text", word, boost=boost),))


def _g_facet(path, occur=Occur.MUST):
    return QueryGroup(occur, (TermClause("", path, is_facet=True),))


def test_phrase_plus_term_should(seg, stats):
    plan = QueryPlan(groups=(_g_phrase(["w1", "w2"]), _g_term("w5")))
    for lim in (3, 10, 50):
        got = search_mixed_topk(seg, plan, stats, lim)
        assert got is not None
        assert _got(got) == _expect(seg, stats, plan, lim)


def test_two_phrases(seg, stats):
    plan = QueryPlan(
        groups=(_g_phrase(["w1", "w2"]), _g_phrase(["w3", "w4"]))
    )
    got = search_mixed_topk(seg, plan, stats, 10)
    assert got is not None
    assert _got(got) == _expect(seg, stats, plan, 10)


def test_must_phrase_with_terms(seg, stats):
    plan = QueryPlan(
        groups=(
            _g_phrase(["w0", "w1"], occur=Occur.MUST),
            _g_term("w2"),
            _g_term("w3"),
        ),
        require_should=False,
    )
    got = search_mixed_topk(seg, plan, stats, 20)
    assert got is not None
    assert _got(got) == _expect(seg, stats, plan, 20)


def test_mustnot_and_facet(seg, stats):
    plan = QueryPlan(
        groups=(
            _g_phrase(["w1", "w3"]),
            _g_term("w7", occur=Occur.MUST_NOT),
            _g_facet("/cat/2"),
        ),
        require_should=False,
    )
    got = search_mixed_topk(seg, plan, stats, 15)
    assert got is not None
    assert _got(got) == _expect(seg, stats, plan, 15)


def test_fuzzed_mixed_plans(seg, stats):
    """Random mixed plans: phrases (slop 0-2, boosts), terms (boosts),
    facets, all three occurs — exact parity at several limits."""
    rng = np.random.default_rng(7)
    n_served = 0
    for trial in range(60):
        groups = []
        n_phr = int(rng.integers(1, 3))
        for _ in range(n_phr):
            k = int(rng.integers(2, 4))
            words = [f"w{int(x)}" for x in rng.integers(0, 40, size=k)]
            occur = Occur.MUST if rng.random() < 0.3 else Occur.SHOULD
            slop = int(rng.choice([0, 0, 1, 2]))
            boost = float(rng.choice([1.0, 1.0, 2.0, 0.5]))
            groups.append(_g_phrase(words, occur, slop, boost))
        for _ in range(int(rng.integers(0, 3))):
            w = f"w{int(rng.integers(0, 40))}"
            r = rng.random()
            occur = (
                Occur.MUST_NOT
                if r < 0.2
                else (Occur.MUST if r < 0.4 else Occur.SHOULD)
            )
            boost = float(rng.choice([1.0, 1.0, 3.0]))
            groups.append(_g_term(w, occur, boost))
        if rng.random() < 0.3:
            groups.append(
                _g_facet(
                    f"/cat/{int(rng.integers(0, 5))}",
                    Occur.MUST if rng.random() < 0.5 else Occur.SHOULD,
                )
            )
        rng.shuffle(groups)
        plan = QueryPlan(
            groups=tuple(groups), require_should=bool(rng.random() < 0.7)
        )
        lim = int(rng.choice([3, 10, 100]))
        got = search_mixed_topk(seg, plan, stats, lim)
        if got is None:
            continue
        n_served += 1
        assert _got(got) == _expect(seg, stats, plan, lim), (trial, plan)
    assert n_served >= 55  # the engine must actually take these plans


def test_search_blockmax_routes_mixed(seg, stats):
    """The host chain (named_index/bench host path) reaches the mixed
    engine for phrase+term plans instead of returning None."""
    plan = QueryPlan(groups=(_g_phrase(["w1", "w2"]), _g_term("w5")))
    got = search_blockmax(seg, plan, stats, 10)
    assert got is not None
    assert _got(got) == _expect(seg, stats, plan, 10)


def test_absent_term_and_dead_phrase(seg, stats):
    plan = QueryPlan(
        groups=(
            _g_phrase(["w1", "zz-absent"]),
            _g_term("w5"),
        )
    )
    got = search_mixed_topk(seg, plan, stats, 10)
    assert got is not None
    assert _got(got) == _expect(seg, stats, plan, 10)
    # MUST dead phrase -> nothing can match
    plan2 = QueryPlan(
        groups=(
            _g_phrase(["w1", "zz-absent"], occur=Occur.MUST),
            _g_term("w5"),
        )
    )
    got2 = search_mixed_topk(seg, plan2, stats, 10)
    assert got2 is not None
    assert _got(got2) == _expect(seg, stats, plan2, 10) == []


def test_term_only_plans_decline(seg, stats):
    plan = QueryPlan(groups=(_g_term("w1"), _g_term("w2")))
    assert search_mixed_topk(seg, plan, stats, 10) is None


def test_mixed_under_negative_idf(seg, stats):
    """Tombstone-inflated df (df > live N => idf < 0) is the regime
    that broke the device kinds twice this round: term/facet bounds
    must stay valid on signed contributions, negative-weight phrases
    must decline (oracle fallback), and whatever serves must be
    bit-exact."""
    import copy

    heavy = copy.deepcopy(seg)
    heavy.tombstones[:] = False
    # live N = 2000 < head-term df (~2850): head idfs go NEGATIVE
    heavy.tombstones[: heavy.doc_count - 2000] = True
    hstats = oracle.IndexStats([heavy])
    from fugu_tpu.query import idf as _idf

    assert (
        min(
            _idf(hstats.doc_freq("text", f"w{i}"), hstats.doc_count)
            for i in range(12)
        )
        < 0.0
    ), "fixture no longer reaches the negative-idf regime"

    rng = np.random.default_rng(31)
    served = 0
    for trial in range(40):
        groups = [
            _g_phrase(
                [f"w{int(x)}" for x in rng.integers(0, 12, size=2)],
                Occur.MUST if rng.random() < 0.3 else Occur.SHOULD,
                slop=int(rng.choice([0, 1])),
            )
        ]
        for _ in range(int(rng.integers(1, 3))):
            groups.append(
                _g_term(
                    f"w{int(rng.integers(0, 12))}",  # head terms: big df
                    Occur.MUST_NOT if rng.random() < 0.2 else Occur.SHOULD,
                )
            )
        plan = QueryPlan(groups=tuple(groups))
        got = search_mixed_topk(heavy, plan, hstats, 10)
        if got is None:
            continue  # declined regimes fall to the oracle — correct
        served += 1
        assert _got(got) == _expect(heavy, hstats, plan, 10), (trial, plan)
    # the signed-bound paths must serve at least some of these
    assert served >= 10, served
