"""Block-max pruned host scorer: exact parity with the naive oracle
(bit-identical scores AND tie ordering) under fuzzed boolean plans."""

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle
from fugu_tpu.ops.blockmax import search_blockmax
from fugu_tpu.query import Occur, QueryGroup, QueryPlan, TermClause


@pytest.fixture(scope="module")
def seg():
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(50)]
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(12000):
        text = " ".join(rng.choice(words, size=int(rng.integers(3, 25))))
        b.add_document(
            {"text": [text]},
            facets=[f"/cat/{int(rng.integers(0, 6))}"],
            stored={"id": f"d{i}"},
        )
    s = b.build()
    s.tombstones[::41] = True
    return s


def test_blockmax_fuzz_parity(seg):
    stats = oracle.IndexStats([seg])
    rng = np.random.default_rng(5)
    for trial in range(120):
        n = int(rng.integers(1, 5))
        terms = rng.choice(50, size=n, replace=False)
        groups = []
        for t in terms:
            r = rng.random()
            occ = (
                Occur.MUST
                if r < 0.3
                else (Occur.MUST_NOT if r < 0.4 else Occur.SHOULD)
            )
            groups.append(QueryGroup(occ, (TermClause("text", f"w{t}"),)))
        if rng.random() < 0.3:
            groups.append(
                QueryGroup(
                    Occur.MUST,
                    (TermClause("", f"/cat/{int(rng.integers(0, 6))}", is_facet=True),),
                )
            )
        plan = QueryPlan(groups=tuple(groups))
        limit = int(rng.choice([3, 10, 50]))
        got = search_blockmax(seg, plan, stats, limit)
        exp = [(h.score, h.doc) for h in oracle.search([seg], plan, limit, stats)]
        assert got is not None
        assert len(got) == len(exp), (trial, len(got), len(exp))
        for (gs, gd), (ws, wd) in zip(got, exp):
            assert np.float32(gs) == np.float32(ws) and gd == wd, (
                trial,
                got[:4],
                exp[:4],
            )


def test_blockmax_falls_back_for_host_only_plans(seg):
    stats = oracle.IndexStats([seg])
    assert search_blockmax(seg, QueryPlan(match_all=True), stats, 10) is None
    # non-default bm25 constants -> precomputed contributions invalid
    p = QueryPlan(
        groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w0"),)),), k1=2.0
    )
    assert search_blockmax(seg, p, stats, 10) is None


def test_oracle_tiebreak_is_doc_ascending(seg):
    """Regression: argpartition used to pick arbitrary docs among kth-score
    ties; the contract is score desc then doc asc."""
    stats = oracle.IndexStats([seg])
    # facet-only query: every matching doc scores the same constant idf
    plan = QueryPlan(
        groups=(
            QueryGroup(
                Occur.SHOULD, (TermClause("", "/cat/1", is_facet=True),)
            ),
        ),
        require_should=True,
    )
    hits = oracle.search([seg], plan, 10, stats)
    docs = [h.doc for h in hits]
    assert docs == sorted(docs)
    live = [
        d
        for d in seg.facet_docs("/cat/1")
        if not seg.tombstones[d]
    ]
    assert docs == sorted(live)[:10]


def test_phrase_pruned_parity(seg):
    """Doc-level pruned phrase search (ops/phrase.py, reached through
    search_blockmax) matches the naive oracle exactly, including slop,
    tombstones, and under-filled results."""
    from fugu_tpu.query import PhraseClause

    stats = oracle.IndexStats([seg])
    rng = np.random.default_rng(7)
    checked = 0
    for trial in range(60):
        n = int(rng.integers(2, 4))
        terms = tuple(f"w{t}" for t in rng.choice(50, size=n, replace=False))
        slop = int(rng.choice([0, 0, 0, 1, 2]))
        occ = Occur.MUST if rng.random() < 0.3 else Occur.SHOULD
        plan = QueryPlan(
            groups=(
                QueryGroup(occ, phrases=(PhraseClause("text", terms, slop=slop),)),
            )
        )
        limit = int(rng.choice([3, 10, 50]))
        got = search_blockmax(seg, plan, stats, limit)
        assert got is not None
        exp = [(h.score, h.doc) for h in oracle.search([seg], plan, limit, stats)]
        assert len(got) == len(exp), (trial, terms, len(got), len(exp))
        for (gs, gd), (ws, wd) in zip(got, exp):
            assert np.float32(gs) == np.float32(ws) and gd == wd, (
                trial, terms, got[:4], exp[:4],
            )
        checked += len(got)
    assert checked > 0  # the corpus produces real phrase matches


def test_phrase_pruned_absent_and_single_term(seg):
    from fugu_tpu.query import PhraseClause

    stats = oracle.IndexStats([seg])
    absent = QueryPlan(
        groups=(
            QueryGroup(
                Occur.SHOULD, phrases=(PhraseClause("text", ("w0", "zzz")),)
            ),
        )
    )
    assert search_blockmax(seg, absent, stats, 10) == []
    single = QueryPlan(
        groups=(
            QueryGroup(Occur.SHOULD, phrases=(PhraseClause("text", ("w3",)),)),
        )
    )
    got = search_blockmax(seg, single, stats, 10)
    exp = [(h.score, h.doc) for h in oracle.search([seg], single, 10, stats)]
    assert [(np.float32(s), d) for s, d in got] == [
        (np.float32(s), d) for s, d in exp
    ]


def test_phrase_slop_bound_is_not_tf_rare(monkeypatch):
    """Regression: with slop, one rare-term occurrence can serve up to
    slop+1 anchors, so phrase_tf can EXCEED tf_rare ("a a b"~1 matches
    twice with a single "b").  The old contrib_rare bound under-estimated
    such docs and pruned them out of the top-k."""
    from fugu_tpu.ops import phrase as phrase_mod
    from fugu_tpu.query import PhraseClause

    b = SegmentBuilder(DOCS_SCHEMA)
    # special doc first so a wrong bound (which would rank it last) loses
    b.add_document({"text": ["a a b"]}, stored={"id": "special"})
    for i in range(64):
        b.add_document({"text": ["a b"]}, stored={"id": f"d{i}"})
    for i in range(40):  # extra 'a'-only docs make 'b' the rarest term
        b.add_document({"text": ["a c"]}, stored={"id": f"x{i}"})
    s = b.build()
    stats = oracle.IndexStats([s])
    plan = QueryPlan(
        groups=(
            QueryGroup(
                Occur.SHOULD,
                phrases=(PhraseClause("text", ("a", "b"), slop=1),),
            ),
        )
    )
    # tiny chunks force real pruning rounds (the bug hid whenever the
    # whole candidate set fit one chunk)
    monkeypatch.setattr(phrase_mod, "CHUNK", 8)
    got = search_blockmax(s, plan, stats, 5)
    exp = [(h.score, h.doc) for h in oracle.search([s], plan, 5, stats)]
    assert [(np.float32(x), d) for x, d in got] == [
        (np.float32(x), d) for x, d in exp
    ]
    assert got[0][1] == 0  # the double-anchor doc wins


def test_phrase_mixed_plan_served_exactly(seg):
    """Plans mixing phrases with term clauses route to the generalized
    block-WAND engine (ops/mixed.py, r5 — they used to fall back to the
    dense oracle) and must stay bit-identical to it."""
    from fugu_tpu.query import PhraseClause

    stats = oracle.IndexStats([seg])
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.SHOULD, phrases=(PhraseClause("text", ("w1", "w2")),)),
            QueryGroup(Occur.SHOULD, (TermClause("text", "w3"),)),
        )
    )
    got = search_blockmax(seg, plan, stats, 10)
    exp = [
        (np.float32(h.score), h.doc)
        for h in oracle.search([seg], plan, 10, stats)
    ]
    assert got is not None
    assert [(np.float32(s), d) for s, d in got] == exp


def test_blockmax_cache_tracks_index_stats():
    """Regression: the per-segment BlockMaxIndex bakes in INDEX-WIDE
    idf/fieldnorm stats; ingesting a second segment must invalidate it,
    or the first segment keeps scoring with stale statistics."""
    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(30)]

    def build(n, seed_words):
        b = SegmentBuilder(DOCS_SCHEMA)
        for i in range(n):
            text = " ".join(rng.choice(seed_words, size=8))
            b.add_document({"text": [text]}, stored={"id": f"x{i}"})
        return b.build()

    seg1 = build(3000, words)
    plan = QueryPlan(
        groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w1"),)),)
    )
    stats1 = oracle.IndexStats([seg1])
    search_blockmax(seg1, plan, stats1, 10)  # populates the cache
    # second segment changes doc_count + avg fieldnorm -> different idf
    seg2 = build(3000, words[:5])
    stats2 = oracle.IndexStats([seg1, seg2])
    got = search_blockmax(seg1, plan, stats2, 10)
    exp = [(h.score, h.doc) for h in oracle.search([seg1], plan, 10, stats2)]
    assert [(np.float32(s), d) for s, d in got] == [
        (np.float32(s), d) for s, d in exp
    ]


def test_phrase_negative_idf_falls_back_not_empty():
    """Regression (r5): tombstone-inflated df can push a phrase's idf
    negative (df > live N/2 — Tantivy's ln(1+(N-df+.5)/(df+.5)) < 0
    regime, deleted docs stay in df until merge).  search_phrase_topk
    returned [] there, dropping real (negatively-scored) hits; the
    bound scaling is also unsound for w <= 0.  It must return None so
    callers fall back to the exact dense oracle."""
    from fugu_tpu.engine.queryparser import parse_query

    b = SegmentBuilder(DOCS_SCHEMA)
    for i, t in enumerate(
        [
            "the quick brown fox jumps over the lazy dog",
            "a quick brown bear walks in the forest",
            "lazy rivers flow quick through the brown canyon",
        ]
    ):
        b.add_document(
            {"text": [t], "id": [f"a{i+1}"]}, stored={"id": f"a{i+1}"}
        )
    seg = b.build()
    assert seg.delete_by_term("id", "a2") == 1
    stats = oracle.IndexStats([seg])
    plan = parse_query(
        '"quick brown"',
        ["text", "name"],
        DOCS_SCHEMA.text_fields,
        DOCS_SCHEMA.date_fields,
    )
    exp = [
        (np.float32(h.score), h.doc)
        for h in oracle.search([seg], plan, 10, stats)
    ]
    assert exp, "oracle must find the live adjacent match"
    assert exp[0][0] < 0  # the regime under test: negative idf
    got = search_blockmax(seg, plan, stats, 10)
    # None (oracle fallback) is the contract; a result list must match
    if got is not None:
        assert [(np.float32(s), d) for s, d in got] == exp
