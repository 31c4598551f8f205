"""Intended-API features from the reference's API.md (documented there,
implemented here): BM25 knobs, min_score_threshold, highlight_snippets."""

import pytest

from fugu_tpu.engine.dataset import Dataset
from fugu_tpu.engine.highlight import highlight
from fugu_tpu.records import ObjectRecord
from tests.test_server import LiveServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = LiveServer(tmp_path_factory.mktemp("apiext"))
    docs = [
        {"id": "h1", "text": "the quick brown fox jumps over the lazy dog"},
        {"id": "h2", "text": "a fox " + "filler " * 40 + "fox den at the end"},
        {"id": "h3", "text": "nothing relevant here"},
    ]
    status, _ = srv.post_json("/ingest", {"data": docs})
    assert status == 200
    yield srv
    srv.stop()


def test_bm25_knobs_change_scores(server):
    _, base = server.post_json("/search/json", {"query": "fox", "text": True})
    _, flat = server.post_json(
        "/search/json", {"query": "fox", "text": True, "bm25_b": 0.0}
    )
    assert base["results"] and flat["results"]
    # with b=0 length normalization is off -> scores differ
    assert base["results"][0]["score"] != flat["results"][0]["score"]


def test_min_score_threshold(server):
    _, out = server.post_json(
        "/search/json", {"query": "fox", "min_score_threshold": 1e9}
    )
    assert out["results"] == []


def test_highlight_snippets(server):
    _, out = server.post_json(
        "/search/json", {"query": "fox", "text": True, "highlight_snippets": True}
    )
    snips = {r["id"]: r["snippet"] for r in out["results"]}
    assert "<em>fox</em>" in snips["h1"]


def test_highlight_function_windows():
    text = "aaa bbb target ccc " + "x " * 200 + "target again"
    snip = highlight(text, ["target"])
    assert "<em>target</em>" in snip
    assert len(snip) < len(text)
    # no matches -> plain truncation
    assert highlight("short text", ["absent"]) == "short text"


def test_dataset_knobs_direct(tmp_path):
    ds = Dataset("kn", tmp_path, use_device=False)
    ds.ingest(
        [
            ObjectRecord(id="a", text="word short", namespace="kn"),
            ObjectRecord(id="b", text="word " + "pad " * 50, namespace="kn"),
        ]
    )
    default = ds.search("word", [], 0, 10)
    no_norm = ds.search("word", [], 0, 10, b=0.0)
    # b=0: doc length no longer matters -> equal scores
    assert no_norm[0].score == pytest.approx(no_norm[1].score, rel=1e-6)
    assert default[0].score != pytest.approx(default[1].score, rel=1e-6)


class TestErrorContracts:
    """Caller mistakes get JSON envelopes with caller-mistake statuses,
    never aiohttp's HTML 500 (and never 5xx alert noise for typos)."""

    def test_unknown_namespace_is_404_json(self, server):
        status, out = server.get_json("/search?q=x&namespace=no_such_ns")
        assert status == 404
        assert "no_such_ns" in out["error"]
        assert '"' not in out["error"].replace('\\"', "")  # no KeyError quoting

    def test_bad_int_params_are_400_json(self, server):
        for path in (
            "/objects?page=abc",
            "/suggest?q=x&limit=abc",
            "/facets/tree?max_depth=abc",
        ):
            status, out = server.get_json(path)
            assert status == 400, path
            assert "invalid" in out["error"], path

    def test_post_search_clamps_per_page(self, server):
        status, out = server.post_json(
            "/search", {"query": "quick", "page": {"per_page": 100000000}}
        )
        assert status == 200
        assert out["per_page"] == 20  # (0,100] -> 20, like every route


def test_highlight_escapes_html():
    # stored text must be HTML-escaped: the snippet is rendered as HTML
    out = highlight("<b>hi</b> & fox jumps", ["fox"])
    assert "<b>" not in out
    assert "&lt;b&gt;hi&lt;/b&gt;" in out
    assert "&amp;" in out
    assert "<em>fox</em>" in out
    # no-match path escapes too
    out2 = highlight("<b>plain</b>", ["zzz"])
    assert out2 == "&lt;b&gt;plain&lt;/b&gt;"


def test_bare_star_filter_is_noop(tmp_path):
    """'*' is excluded from the facet query in the reference
    (search.rs:101-105) — it must not become an unmatchable MUST."""
    from fugu_tpu.engine.dataset import Dataset
    from fugu_tpu.records import ObjectRecord

    ds = Dataset("starns", tmp_path, use_device=False)
    ds.ingest(
        [ObjectRecord(id=f"s{i}", text="star topic", namespace="starns")
         for i in range(5)]
    )
    plain = ds.search("star", [], 0, 10)
    starred = ds.search("star", ["*"], 0, 10)
    assert [r.id for r in starred] == [r.id for r in plain]
    assert len(starred) == 5


def test_k1_override_reaches_subplans(tmp_path):
    """(a AND b) OR c builds a nested subplan; per-query k1/b must apply
    inside it, not just at the top level."""
    from fugu_tpu.engine.dataset import Dataset
    from fugu_tpu.records import ObjectRecord

    ds = Dataset("subk", tmp_path, use_device=False)
    ds.ingest(
        [
            ObjectRecord(id="a1", text="alpha beta words here", namespace="subk"),
            ObjectRecord(id="a2", text="alpha beta beta beta beta", namespace="subk"),
            ObjectRecord(id="c1", text="gamma words", namespace="subk"),
        ]
    )
    q = "(alpha AND beta) OR gamma"
    base = {r.id: r.score for r in ds.search(q, [], 0, 10)}
    tuned = {r.id: r.score for r in ds.search(q, [], 0, 10, k1=0.01)}
    # k1 affects tf saturation: the subplan-scored docs must move too
    assert tuned["a2"] != base["a2"], "subplan ignored the k1 override"
    assert tuned["c1"] != base["c1"]
