"""Device phrase execution (ops/device_phrase.py) vs the host matcher.

Every result must be bit-identical to ops/phrase.search_phrase_topk
(itself oracle-parity-tested): same docs, same f32 scores — the device
selects candidates, the host rescores with the matcher's float sequence.
"""

import numpy as np
import pytest

from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle
from fugu_tpu.ops.blockmax import search_blockmax
from fugu_tpu.ops.device_phrase import device_phrase_batch
from fugu_tpu.query import Occur, PhraseClause, QueryGroup, QueryPlan


@pytest.fixture(scope="module")
def seg():
    rng = np.random.default_rng(21)
    words = [f"p{i}" for i in range(30)]
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(4000):
        n = int(rng.integers(4, 30))
        text = " ".join(rng.choice(words, size=n))
        b.add_document({"text": [text]}, stored={"id": f"d{i}"})
    s = b.build()
    s.tombstones[::37] = True
    return s


def phrase_plan(terms, slop=0):
    return QueryPlan(
        groups=(
            QueryGroup(
                Occur.SHOULD,
                phrases=(PhraseClause("text", tuple(terms), slop=slop),),
            ),
        )
    )


def host_result(seg, plan, stats, limit):
    r = search_blockmax(seg, plan, stats, limit)
    assert r is not None
    return [(np.float32(s), d) for s, d in r]


def test_two_and_three_term_parity(seg):
    stats = oracle.IndexStats([seg])
    rng = np.random.default_rng(5)
    plans = []
    for _ in range(16):
        k = int(rng.integers(2, 4))
        terms = [f"p{int(t)}" for t in rng.choice(30, size=k, replace=False)]
        plans.append(phrase_plan(terms))
    res = device_phrase_batch(seg, plans, stats, 10)
    handled = sum(r is not None for r in res)
    assert handled == len(plans), f"device handled only {handled}"
    for plan, r in zip(plans, res):
        want = host_result(seg, plan, stats, 10)
        got = [(np.float32(s), d) for s, d in r]
        assert got == want, (got[:4], want[:4])


def test_single_term_phrase_parity(seg):
    stats = oracle.IndexStats([seg])
    plans = [phrase_plan(["p3"]), phrase_plan(["p17"])]
    res = device_phrase_batch(seg, plans, stats, 10)
    for plan, r in zip(plans, res):
        assert r is not None
        assert [(np.float32(s), d) for s, d in r] == host_result(
            seg, plan, stats, 10
        )


def test_absent_term_matches_nothing(seg):
    stats = oracle.IndexStats([seg])
    res = device_phrase_batch(
        seg, [phrase_plan(["p1", "nosuchterm"])], stats, 10
    )
    assert res[0] == []


def test_sloppy_and_multi_phrase_decline(seg):
    stats = oracle.IndexStats([seg])
    sloppy = phrase_plan(["p1", "p2"], slop=1)
    multi = QueryPlan(
        groups=(
            QueryGroup(
                Occur.SHOULD, phrases=(PhraseClause("text", ("p1", "p2")),)
            ),
            QueryGroup(
                Occur.SHOULD, phrases=(PhraseClause("text", ("p3", "p4")),)
            ),
        )
    )
    res = device_phrase_batch(seg, [sloppy, multi], stats, 10)
    assert res == [None, None]  # host matcher handles these


def test_tombstones_respected(seg):
    stats = oracle.IndexStats([seg])
    plan = phrase_plan(["p0", "p1"])
    res = device_phrase_batch(seg, [plan], stats, 50)[0]
    assert res is not None
    dead = set(np.nonzero(seg.tombstones)[0].tolist())
    assert not ({d for _s, d in res} & dead)


def test_adjacency_exactness_tiny():
    """Hand-built corpus where doc intersection alone would be wrong."""
    b = SegmentBuilder(DOCS_SCHEMA)
    b.add_document({"text": ["alpha beta gamma"]}, stored={"id": "a"})
    b.add_document({"text": ["beta alpha gamma"]}, stored={"id": "b"})
    b.add_document({"text": ["alpha x beta"]}, stored={"id": "c"})
    b.add_document({"text": ["alpha beta alpha beta"]}, stored={"id": "d"})
    for i in range(60):  # enough entries that windows stay in the pack
        b.add_document({"text": [f"filler{i} alpha"]}, stored={"id": f"f{i}"})
    seg = b.build()
    stats = oracle.IndexStats([seg])
    plan = phrase_plan(["alpha", "beta"])
    res = device_phrase_batch(seg, [plan], stats, 10)[0]
    assert res is not None
    docs = [d for _s, d in res]
    assert docs and set(docs) == {0, 3}
    # doc 3 has phrase_tf 2 -> higher score, ranks first
    assert docs[0] == 3
    assert res == [
        (s, d) for s, d in host_result(seg, plan, stats, 10)
    ]


def test_overflow_falls_back_to_host(monkeypatch):
    """More common docs than the anchor-key budget -> overflow flag ->
    None (caller's host matcher), never a truncated result."""
    import fugu_tpu.ops.device_phrase as dp

    monkeypatch.setattr(dp, "_COMMON_CAP", 32)
    monkeypatch.setattr(dp, "_FN_CACHE", {})
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(100):  # every doc matches "red blue"
        b.add_document({"text": ["red blue filler"]}, stored={"id": f"o{i}"})
    seg = b.build()
    stats = oracle.IndexStats([seg])
    plan = phrase_plan(["red", "blue"])
    res = dp.device_phrase_batch(seg, [plan], stats, 10)
    assert res == [None]


def test_delete_invalidates_device_position_cache():
    """delete_by_term after a device phrase query must invalidate the
    cached _device_pos tombstone array, or the deleted doc keeps
    matching until process restart."""
    b = SegmentBuilder(DOCS_SCHEMA)
    for i in range(600):
        text = "alpha beta gamma" if i % 3 == 0 else "alpha delta gamma"
        b.add_document(
            {"text": [text], "id": [f"d{i}"]}, stored={"id": f"d{i}"}
        )
    seg = b.build()
    stats = oracle.IndexStats([seg])
    plan = phrase_plan(["alpha", "beta"])
    res1 = device_phrase_batch(seg, [plan], stats, 5)[0]
    assert res1, "phrase matched nothing pre-delete"
    victim = res1[0][1]
    n = seg.delete_by_term("id", f"d{victim}")
    assert n == 1
    stats2 = oracle.IndexStats([seg])
    res2 = device_phrase_batch(seg, [plan], stats2, 5)[0]
    assert victim not in [d for _s, d in res2]
    exp = host_result(seg, plan, stats2, 5)
    assert [(np.float32(s), d) for s, d in res2] == exp


def test_limit_past_ladder_declines_to_host(seg):
    """limit >= 128 (e.g. the wildcard-filter 10x over-fetch) exceeds
    the device extraction ladder; begin must decline every plan so the
    caller keeps the exact host matcher instead of a silently truncated
    128-candidate top-k.  At a bucket boundary (limit == 64) the ladder
    must step UP so rescoring sees slack candidates."""
    from fugu_tpu.ops.device_phrase import device_phrase_begin

    stats = oracle.IndexStats([seg])
    plans = [phrase_plan(["p1", "p2"]), phrase_plan(["p3", "p4"])]
    res, staged, *_ = device_phrase_begin(seg, plans, stats, 200)
    assert staged == []
    assert res == [None, None]
    res, staged, *_ = device_phrase_begin(seg, plans, stats, 128)
    assert staged == [] and res == [None, None]
