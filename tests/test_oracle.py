"""Oracle BM25 scoring sanity vs hand-computed Tantivy formula."""

import math

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle
from fugu_tpu.query import (
    Occur,
    PhraseClause,
    QueryGroup,
    QueryPlan,
    TermClause,
)

K1, B = 1.2, 0.75


def corpus(texts, facets=None):
    b = SegmentBuilder(DOCS_SCHEMA)
    for i, t in enumerate(texts):
        f = facets[i] if facets else []
        b.add_document({"text": [t]}, facets=f, stored={"id": f"d{i}"})
    return [b.build()]


def plan_terms(*words, occur=Occur.SHOULD, fields=("text",)):
    return QueryPlan(
        groups=tuple(
            QueryGroup(occur=occur, clauses=tuple(TermClause(f, w) for f in fields))
            for w in words
        )
    )


def test_single_term_bm25_exact():
    segs = corpus(["cat", "cat cat dog", "dog dog"])
    hits = oracle.search(segs, plan_terms("cat"), 10)
    assert [h.doc for h in hits] == [0, 1]  # doc0: len1 tf1 beats doc1: len3 tf2? check
    # hand-compute: N=3, df=2, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    avg = (1 + 3 + 2) / 3
    # doc0: tf=1, len=1 -> 1/(1+1.2*(0.25+0.75*1/avg))
    c0 = K1 * (1 - B + B * 1 / avg)
    s0 = idf * (1 + K1) * 1 / (1 + c0)
    c1 = K1 * (1 - B + B * 3 / avg)
    s1 = idf * (1 + K1) * 2 / (2 + c1)
    got = {h.doc: h.score for h in hits}
    assert got[0] == pytest.approx(s0, rel=1e-6)
    assert got[1] == pytest.approx(s1, rel=1e-6)


def test_multi_term_sums():
    segs = corpus(["cat dog", "cat", "dog"])
    hits = oracle.search(segs, plan_terms("cat", "dog"), 10)
    assert hits[0].doc == 0  # matches both
    assert len(hits) == 3


def test_must_semantics():
    segs = corpus(["cat dog", "cat", "dog"])
    hits = oracle.search(segs, plan_terms("cat", "dog", occur=Occur.MUST), 10)
    assert [h.doc for h in hits] == [0]


def test_must_not():
    segs = corpus(["cat dog", "cat", "dog"])
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.SHOULD, (TermClause("text", "cat"),)),
            QueryGroup(Occur.MUST_NOT, (TermClause("text", "dog"),)),
        )
    )
    hits = oracle.search(segs, plan, 10)
    assert [h.doc for h in hits] == [1]


def test_tie_break_by_doc_id():
    segs = corpus(["same text", "same text", "same text"])
    hits = oracle.search(segs, plan_terms("same"), 10)
    assert [h.doc for h in hits] == [0, 1, 2]


def test_facet_clause_scores_idf():
    segs = corpus(
        ["a", "a", "a"],
        facets=[["/ns/x"], ["/ns/y"], ["/other"]],
    )
    plan = QueryPlan(
        groups=(
            QueryGroup(Occur.MUST, (TermClause("text", "a"),)),
            QueryGroup(
                Occur.MUST, (TermClause("", "/ns", is_facet=True),)
            ),
        )
    )
    hits = oracle.search(segs, plan, 10)
    assert sorted(h.doc for h in hits) == [0, 1]
    # facet contributes idf(df=2, N=3)
    idf_f = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    text_score = oracle.search(segs, plan_terms("a"), 10)[0].score
    assert hits[0].score == pytest.approx(text_score + idf_f, rel=1e-6)


def test_tombstones_excluded():
    segs = corpus(["cat", "cat"])
    segs[0].delete_by_term("text", "cat")
    hits = oracle.search(segs, plan_terms("cat"), 10)
    assert hits == []


def test_match_all_scores_one():
    segs = corpus(["x", "y"])
    hits = oracle.search(segs, QueryPlan(match_all=True), 10)
    assert [(h.doc, h.score) for h in hits] == [(0, 1.0), (1, 1.0)]


def test_phrase_query():
    segs = corpus(["big red fox", "red big fox", "big blue red fox"])
    plan = QueryPlan(
        groups=(QueryGroup(Occur.SHOULD, phrases=(PhraseClause("text", ("big", "red")),)),)
    )
    hits = oracle.search(segs, plan, 10)
    assert [h.doc for h in hits] == [0]


def test_multi_segment_stats_shared():
    b1 = SegmentBuilder(DOCS_SCHEMA)
    b1.add_document({"text": ["cat"]}, stored={})
    b2 = SegmentBuilder(DOCS_SCHEMA)
    b2.add_document({"text": ["cat cat"]}, stored={})
    b2.add_document({"text": ["dog"]}, stored={})
    segs = [b1.build(), b2.build()]
    hits = oracle.search(segs, plan_terms("cat"), 10)
    assert len(hits) == 2
    stats = oracle.IndexStats(segs)
    assert stats.doc_count == 3
    assert stats.doc_freq("text", "cat") == 2


def test_phrase_postings_vectorized():
    from fugu_tpu.index.schema import DOCS_SCHEMA
    from fugu_tpu.index.segment import SegmentBuilder
    from fugu_tpu.ops import oracle
    from fugu_tpu.query import PhraseClause

    b = SegmentBuilder(DOCS_SCHEMA)
    docs = [
        "the quick brown fox",          # exact "quick brown"
        "quick red brown fox",          # quick _ brown (slop 1 only)
        "brown quick fox",              # reversed: no match
        "quick brown quick brown",      # phrase tf = 2
        "nothing here",
    ]
    for i, t in enumerate(docs):
        b.add_document({"text": [t]}, stored={"id": str(i)})
    seg = b.build()

    d, tf = oracle.phrase_postings(seg, PhraseClause("text", ("quick", "brown")))
    assert list(zip(d.tolist(), tf.tolist())) == [(0, 1), (3, 2)]

    d, _ = oracle.phrase_postings(
        seg, PhraseClause("text", ("quick", "brown"), slop=1)
    )
    assert 1 in d.tolist() and 0 in d.tolist() and 2 not in d.tolist()

    d, tf = oracle.phrase_postings(
        seg, PhraseClause("text", ("quick", "brown", "fox"))
    )
    assert d.tolist() == [0] and tf.tolist() == [1]

    # term absent from the segment
    d, tf = oracle.phrase_postings(seg, PhraseClause("text", ("quick", "zebra")))
    assert len(d) == 0


def test_phrase_search_end_to_end(tmp_path):
    from fugu_tpu.engine.dataset import Dataset
    from fugu_tpu.records import ObjectRecord

    ds = Dataset("ph", tmp_path, use_device=False)
    ds.ingest(
        [
            ObjectRecord(id="a", text="the quick brown fox jumps", namespace="ph"),
            ObjectRecord(id="b", text="brown the quick fox", namespace="ph"),
            ObjectRecord(id="c", text="quick brown everywhere quick brown", namespace="ph"),
        ]
    )
    res = ds.search('"quick brown"', [], 0, 10)
    ids = [r.id for r in res]
    assert set(ids) == {"a", "c"}
    assert ids[0] == "c"  # tf=2 scores higher
