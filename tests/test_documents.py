"""Per-index document building parity (document.rs)."""

from fugu_tpu.engine import documents as db
from fugu_tpu.records import ObjectRecord


def rec(**kw):
    base = dict(id="d1", text="hello world")
    base.update(kw)
    return ObjectRecord(**base)


def test_full_document_core_fields():
    tf, facets, stored = db.build_full_document(rec(namespace="ns"))
    assert tf["id"] == ["d1"]
    assert tf["text"] == ["hello world"]
    assert tf["namespace"] == ["ns"]
    assert stored["id"] == "d1"


def test_name_from_metadata():
    tf, _, stored = db.build_full_document(rec(metadata={"name": "Title"}))
    assert tf["name"] == ["Title"]
    assert stored["name"] == "Title"


def test_explicit_facets_priority():
    tf, facets, _ = db.build_full_document(
        rec(namespace="ns", facets=["a/b", "/c/d"], metadata={"k": "v"})
    )
    # explicit facets win; namespace + metadata facets suppressed
    assert facets == ["/a/b", "/c/d"]


def test_metadata_facets_first_component_only():
    # document.rs:299 keeps only facet_path.first() under /metadata/
    tf, facets, _ = db.build_full_document(
        rec(metadata={"details": {"department": "legal"}, "category": "docs"})
    )
    assert sorted(facets) == ["/metadata/category", "/metadata/details"]


def test_namespace_facets_fallback():
    _, facets, _ = db.build_full_document(rec(namespace="ns", organization="org"))
    assert facets == ["/namespace/ns", "/namespace/ns/organization/org"]


def test_dates_parsed_and_invalid_skipped():
    _, _, stored = db.build_full_document(
        rec(date_created="2024-01-02T03:04:05Z", date_updated="not-a-date")
    )
    assert stored["date_created"] == "2024-01-02T03:04:05Z"
    assert "date_updated" not in stored


def test_query_suggestions_extraction():
    text = "The quick brown fox jumps. Over the lazy dog! xy z. " + "word " * 20
    sugg = db.extract_query_suggestions(text)
    assert "The quick brown" in sugg
    assert "Over the lazy" in sugg
    assert all(3 < len(s) < 50 for s in sugg)
    assert len(sugg) <= 10


def test_query_suggestion_documents():
    docs = db.build_query_suggestion_documents(
        rec(text="alpha beta gamma. second sentence here", metadata={"name": "A Name"})
    )
    texts = [d[2]["text"] for d in docs]
    assert texts[0].startswith("alpha beta")
    assert "A Name" in texts
    assert "alpha beta gamma" in texts


def test_filter_documents_one_per_facet():
    docs = db.build_filter_documents(rec(namespace="ns", data_type="pdf"))
    assert len(docs) == 2
    tf0, facets0, stored0 = docs[0]
    assert tf0["text"] == ["ns"]
    assert tf0["facet"] == ["/namespace/ns"]
    assert facets0 == ["/namespace/ns"]
    tf1, _, _ = docs[1]
    assert tf1["text"] == ["pdf"]


def test_rfc3339_roundtrip():
    micros = db.parse_rfc3339("2024-06-01T12:00:00+02:00")
    assert micros is not None
    assert db.parse_rfc3339("2024-06-01T12:00:00") is None  # no offset
    assert db.format_rfc3339(0) == "1970-01-01T00:00:00Z"
