"""Engine integration: NamedIndex/Dataset upsert -> search -> delete ->
facets -> persistence/reload -> merge (SURVEY.md §4 item 3)."""

import numpy as np
import pytest

from fugu_tpu.engine.dataset import Dataset, parse_filters, FilterOperator
from fugu_tpu.engine.manager import DatasetManager
from fugu_tpu.config import ServerConfig
from fugu_tpu.records import ObjectRecord


def rec(i, text, ns="testns", **kw):
    return ObjectRecord(id=f"doc{i}", text=text, namespace=ns, **kw)


@pytest.fixture
def ds(tmp_path):
    return Dataset("testns", tmp_path, use_device=False)


def seed(ds):
    ds.ingest(
        [
            rec(1, "the quick brown fox", data_type="animal"),
            rec(2, "lazy dogs sleep all day", data_type="animal"),
            rec(3, "quick quick silver fox", data_type="metal"),
            rec(4, "a story about nothing", organization="acme"),
        ]
    )


def test_ingest_and_stats(ds):
    seed(ds)
    st = ds.stats()
    assert st.docs_count == 4
    assert st.namespace == "testns"
    assert st.filter_count > 0  # one doc per facet path
    assert st.query_count > 0
    assert st.total_docs() == st.docs_count + st.filter_count + st.query_count


def test_search_ranking(ds):
    seed(ds)
    res = ds.search("quick fox", [], 0, 20)
    assert [r.id for r in res][:2] == ["doc3", "doc1"] or [r.id for r in res][:2] == [
        "doc1",
        "doc3",
    ]
    assert all(r.score > 0 for r in res)
    assert res[0].text


def test_upsert_overwrites(ds):
    seed(ds)
    ds.upsert([rec(1, "completely different content")])
    assert ds.stats().docs_count == 4
    res = ds.search("brown fox", [], 0, 20)
    assert "doc1" not in [r.id for r in res]
    res2 = ds.search("different content", [], 0, 20)
    assert [r.id for r in res2] == ["doc1"]


def test_duplicate_ids_in_one_batch(ds):
    ds.ingest([rec(9, "first version"), rec(9, "second version")])
    assert ds.stats().docs_count == 1
    res = ds.search("version", [], 0, 20)
    assert len(res) == 1
    assert res[0].text == "second version"


def test_delete_document(ds):
    seed(ds)
    ds.delete_document("doc2")
    assert ds.stats().docs_count == 3
    assert ds.search("lazy dogs", [], 0, 20) == []


def test_empty_query_matches_all(ds):
    seed(ds)
    res = ds.search("", [], 0, 20)
    assert len(res) == 4
    assert all(r.score == 1.0 for r in res)


def test_facet_filter(ds):
    seed(ds)
    res = ds.search("quick", ["/namespace/testns/data/animal"], 0, 20)
    assert [r.id for r in res] == ["doc1"]


def test_facet_filter_ancestor_matches(ds):
    seed(ds)
    res = ds.search("", ["/namespace/testns/data"], 0, 20)
    assert sorted(r.id for r in res) == ["doc1", "doc2", "doc3"]


def test_wildcard_filter(ds):
    seed(ds)
    res = ds.search("", ["*acme*"], 0, 20)
    assert [r.id for r in res] == ["doc4"]


def test_pagination(ds):
    seed(ds)
    page0 = ds.search("", [], 0, 2)
    page1 = ds.search("", [], 1, 2)
    assert len(page0) == 2 and len(page1) == 2
    assert {r.id for r in page0} | {r.id for r in page1} == {
        "doc1",
        "doc2",
        "doc3",
        "doc4",
    }


def test_get_by_id(ds):
    seed(ds)
    docs = ds.get("doc3")
    assert len(docs) == 1
    assert docs[0]["id"] == "doc3"
    assert ds.get("missing") == []


def test_parse_filters_operators():
    fs = parse_filters(["/a/b", "a/c", "/p/*", "/k=v", "*pat*"])
    assert fs[0].operator is FilterOperator.EQUALS and fs[0].path == "/a/b"
    assert fs[1].path == "/a/c"
    assert fs[2].operator is FilterOperator.PREFIX and fs[2].path == "/p"
    assert fs[3].operator is FilterOperator.EQUALS and fs[3].path == "/k"
    assert fs[3].value == "v"
    assert fs[4].operator is FilterOperator.WILDCARD and fs[4].path == "pat"


def test_namespace_facet_apis(ds):
    seed(ds)
    assert ds.get_available_namespaces() == ["testns"]
    facets = ds.get_namespace_facets("testns")
    paths = [p for p, _ in facets]
    assert "/namespace/testns/data" in paths
    assert "/namespace/testns/organization" in paths


def test_facet_tree(ds):
    seed(ds)
    tree = ds.get_facet_tree(None)
    assert "namespace" in tree.tree
    ns_node = tree.tree["namespace"]
    assert "testns" in ns_node.children
    data_node = ns_node.children["testns"].children["data"]
    assert set(data_node.children) == {"animal", "metal"}
    assert data_node.children["animal"].count == 2
    assert tree.max_depth == 4


def test_facet_tree_max_depth(ds):
    seed(ds)
    tree = ds.get_facet_tree(2)
    # depth >= 2 paths skipped in the tree; counted in total_facets
    ns_node = tree.tree["namespace"]
    assert ns_node.children == {}
    assert tree.total_facets >= 2


def test_filter_values_at_path(ds):
    seed(ds)
    vals = ds.get_filter_values_at_path("/namespace/testns/data")
    assert vals == ["animal", "metal"]


def test_all_filter_paths(ds):
    seed(ds)
    paths = ds.get_all_filter_paths()
    assert "/namespace/testns/data" in paths
    assert sorted(paths["/namespace/testns/data"]) == ["animal", "metal"]


def test_filter_paths_for_namespace(tmp_path):
    ds = Dataset("ns2", tmp_path, use_device=False)
    ds.ingest(
        [
            ObjectRecord(
                id="x1",
                text="hello",
                facets=["/namespace/ns2", "/topic/science/physics"],
            )
        ]
    )
    paths = ds.get_filter_paths_for_namespace("ns2")
    assert paths == {"/topic/science": ["physics"]}


def test_search_facet(ds):
    seed(ds)
    hits = ds.search_facet("/namespace/testns/data", None)
    assert [p for p, _ in hits] == [
        "/namespace/testns/data/animal",
        "/namespace/testns/data/metal",
    ]
    hits2 = ds.search_facet("/namespace/testns/data", "METAL")
    assert [p for p, _ in hits2] == ["/namespace/testns/data/metal"]


def test_suggest(ds):
    seed(ds)
    out = ds.suggest("lazy")
    assert any("lazy" in s for s in out)


def test_persistence_reload(tmp_path):
    ds = Dataset("persist", tmp_path, use_device=False)
    ds.ingest([rec(1, "persistent data here", ns="persist")])
    ds.delete_document("nonexistent")

    ds2 = Dataset("persist", tmp_path, use_device=False)
    assert ds2.stats().docs_count == 1
    res = ds2.search("persistent", [], 0, 10)
    assert [r.id for r in res] == ["doc1"]


def test_persistence_tombstones_survive(tmp_path):
    ds = Dataset("pt", tmp_path, use_device=False)
    ds.ingest([ObjectRecord(id=f"d{i}", text=f"common word{i}", namespace="pt") for i in range(3)])
    ds.delete_document("d1")
    ds2 = Dataset("pt", tmp_path, use_device=False)
    assert ds2.stats().docs_count == 2
    assert "d1" not in [r.id for r in ds2.search("common", [], 0, 10)]


def test_merge_policy_compacts(tmp_path):
    ds = Dataset("mg", tmp_path, use_device=False)
    for i in range(10):  # 10 commits -> exceeds MAX_SEGMENTS -> merge
        ds.ingest([ObjectRecord(id=f"m{i}", text=f"merge test doc {i}", namespace="mg")])
    assert len(ds.docs().segments) <= 9
    res = ds.search("merge test", [], 0, 20)
    assert len(res) == 10


def test_merge_purges_tombstones(tmp_path):
    ds = Dataset("mp", tmp_path, use_device=False)
    ds.ingest([ObjectRecord(id=f"p{i}", text=f"purge doc {i}", namespace="mp") for i in range(4)])
    ds.delete_document("p1")
    assert ds.docs().maybe_merge(force=True)
    seg = ds.docs().segments[0]
    assert seg.doc_count == 3
    assert seg.num_tombstoned == 0
    res = ds.search("purge", [], 0, 10)
    assert sorted(r.id for r in res) == ["p0", "p2", "p3"]


def test_manager_lifecycle(tmp_path):
    cfg = ServerConfig.with_defaults(str(tmp_path), "main")
    mgr = DatasetManager(cfg, use_device=False)
    assert mgr.list_namespaces() == ["main"]
    ds = mgr.get_or_create_dataset("extra")
    assert "extra" in mgr.list_namespaces()
    ds.ingest([rec(1, "managed doc", ns="extra")])
    stats = mgr.get_all_stats()
    assert stats["extra"].docs_count == 1
    assert mgr.delete_namespace("extra")
    assert mgr.get_dataset("extra") is None
    assert not (tmp_path / "extra").exists()
    assert not mgr.delete_namespace("extra")


def test_manager_filter_value_routing(tmp_path):
    cfg = ServerConfig.with_defaults(str(tmp_path), "main")
    mgr = DatasetManager(cfg, use_device=False)
    mgr.get_or_create_dataset("routed")
    mgr.get_dataset("routed").ingest(
        [rec(5, "routed content", ns="routed", data_type="csv")]
    )
    vals = mgr.get_filter_values_at_path("/namespace/routed/data")
    assert vals == ["csv"]


def test_suggest_prefix_autocomplete(ds):
    seed(ds)
    out = ds.suggest("laz")
    assert any("lazy" in s for s in out), out


def test_terms_with_prefix(ds):
    seed(ds)
    terms = ds.docs().terms_with_prefix("text", "qu")
    assert "quick" in terms
    assert all(t.startswith("qu") for t in terms)


def test_search_many_batched(ds):
    seed(ds)
    results = ds.search_many(
        [("quick fox", []), ("lazy", []), ("", ["/namespace/testns/data/metal"])],
        0,
        10,
    )
    assert len(results) == 3
    assert results[0] and results[0][0].id in ("doc1", "doc3")
    assert [r.id for r in results[1]] == ["doc2"]
    assert [r.id for r in results[2]] == ["doc3"]


def test_compact_dataset(ds):
    for i in range(3):
        ds.ingest([rec(50 + i, f"extra doc {i}")])
    assert len(ds.docs().segments) > 1
    before = ds.compact()
    assert before["docs"] > 1
    assert len(ds.docs().segments) == 1
    assert len(ds.search("extra", [], 0, 10)) == 3


def test_multi_segment_scores_use_index_wide_stats(tmp_path):
    """Regression (blockmax staleness): search after a SECOND ingest
    batch must score the first segment with index-wide idf/fieldnorm —
    engine results must match a fresh oracle over both segments."""
    import numpy as np

    from fugu_tpu.ops import oracle as oracle_ops
    from fugu_tpu.query import Occur, QueryGroup, QueryPlan, TermClause

    mgr = DatasetManager.with_defaults(str(tmp_path), "multi")
    ds = mgr.get_or_create_dataset("multi")
    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(20)]

    def batch(n, base, pool):
        return [
            ObjectRecord(
                id=f"r{base + i}",
                text=" ".join(rng.choice(pool, size=6)),
            )
            for i in range(n)
        ]

    ds.batch_upsert(batch(400, 0, words))
    # a search BETWEEN batches populates per-segment caches
    ds.search("w1", [], 0, 10)
    ds.batch_upsert(batch(400, 400, words[:4]))  # skews df + avg len
    idx = ds._docs
    segs = idx.searcher_segments()
    assert len(segs) >= 2, "fixture must produce two segments"
    stats = oracle_ops.IndexStats(segs)
    plan = QueryPlan(
        groups=(QueryGroup(Occur.SHOULD, (TermClause("text", "w1"),)),)
    )
    hits = idx.search_topk(plan, 10)
    exp = oracle_ops.search(segs, plan, 10, stats)
    assert [(np.float32(h.score), h.segment_ord, h.doc) for h in hits] == [
        (np.float32(h.score), h.segment_ord, h.doc) for h in exp
    ]


def test_legacy_jsonl_store_loads(tmp_path):
    """Pre-round-3 segments persisted stored docs as JSON lines; new
    segments write one msgpack blob.  A legacy segment must reload with
    identical stored content (manifest.py load_segment fallback)."""
    import json

    ds = Dataset("legacy", tmp_path, use_device=False)
    ds.ingest([rec(1, "legacy stored doc", ns="legacy")])
    docs_dir = tmp_path / "legacy" / "docs"
    mp_files = list(docs_dir.glob("seg-*.store.msgpack"))
    assert mp_files, "new segments should write the msgpack store"
    # rewrite the store in the legacy per-line JSON format
    import msgpack

    for mp in mp_files:
        stored = msgpack.unpackb(mp.read_bytes())
        legacy = mp.with_name(mp.name.replace(".store.msgpack", ".store.jsonl"))
        legacy.write_text(
            "".join(json.dumps(d, ensure_ascii=False) + "\n" for d in stored)
        )
        mp.unlink()

    ds2 = Dataset("legacy", tmp_path, use_device=False)
    res = ds2.search("legacy", [], 0, 10)
    assert [r.id for r in res] == ["doc1"]
    assert ds2.stats().docs_count == 1
