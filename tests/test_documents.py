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


def test_rfc3339_microsecond_exact():
    # float timestamp() arithmetic loses 1us on ~1% of inputs
    assert db.parse_rfc3339("2005-08-31T02:31:48.104307Z") == 1125455508104307
    for us in (1, 104307, 999999):
        s = f"2005-08-31T02:31:48.{us:06d}Z"
        micros = db.parse_rfc3339(s)
        assert micros is not None and micros % 1_000_000 == us, s
        assert db.format_rfc3339(micros) == s


def test_rfc3339_rejects_iso_laxness():
    # fromisoformat accepts these; RFC3339 (chrono, document.rs:346) does not
    assert db.parse_rfc3339("2024-01-01 00:00:00+00:00") is None  # space sep
    assert db.parse_rfc3339("2024-01-01T00:00:00,5+00:00") is None  # comma
    assert db.parse_rfc3339("2024-01-01t00:00:00z") is not None  # t/z legal


def test_query_suggestions_byte_length():
    # length bounds are UTF-8 bytes (Rust str::len, document.rs:394)
    sugg = db.extract_query_suggestions("日 本")  # 3 chars, 7 bytes
    assert sugg == ["日 本"]
    long_cjk = " ".join("日本語ですよ" for _ in range(3))
    # 20 chars but 56 bytes: over the <50-byte cap
    assert db.extract_query_suggestions(long_cjk) == []
