"""ObjectRecord validation-rule parity (object.rs:31-111)."""

import pytest

from fugu_tpu.records import ObjectRecord, ValidationError, normalize_facet_path


def _rec(**kw):
    base = dict(id="doc1", text="hello world")
    base.update(kw)
    return ObjectRecord(**base)


def test_valid_minimal():
    _rec().validate()


@pytest.mark.parametrize(
    "kw",
    [
        dict(id=""),
        dict(id="x" * 257),
        dict(text=""),
        dict(text="y" * 10_001),
        dict(namespace=""),
        dict(namespace="a/b"),
        dict(namespace="a b"),
        dict(namespace="n" * 129),
        dict(facets=["f"] * 101),
        dict(facets=[""]),
        dict(facets=["f" * 513]),
    ],
)
def test_invalid(kw):
    with pytest.raises(ValidationError):
        _rec(**kw).validate()


def test_limits_inclusive():
    _rec(id="x" * 256).validate()
    _rec(text="y" * 10_000).validate()
    _rec(namespace="n" * 128).validate()
    _rec(facets=["f" * 512] * 100).validate()


def test_namespace_facets_order():
    r = _rec(
        namespace="ns",
        organization="org",
        conversation_id="conv",
        data_type="pdf",
    )
    assert r.generate_namespace_facets() == [
        "/namespace/ns",
        "/namespace/ns/organization/org",
        "/namespace/ns/conversation/conv",
        "/namespace/ns/data/pdf",
    ]


def test_namespace_facets_partial():
    assert _rec().generate_namespace_facets() == []
    assert _rec(namespace="ns", data_type="t").generate_namespace_facets() == [
        "/namespace/ns",
        "/namespace/ns/data/t",
    ]


def test_name_from_metadata():
    assert _rec(metadata={"name": "Title"}).name == "Title"
    assert _rec(metadata={"name": 3}).name is None
    assert _rec().name is None


def test_facets_skipped_when_none():
    assert "facets" not in _rec().to_dict()
    assert _rec(facets=["/a"]).to_dict()["facets"] == ["/a"]


def test_normalize_facet_path():
    assert normalize_facet_path("a/b") == "/a/b"
    assert normalize_facet_path("/a/b") == "/a/b"


def test_limits_are_utf8_bytes():
    """object.rs enforces Rust String::len (bytes): 6000 CJK chars are
    18000 bytes and must be rejected even though 6000 <= 10000 chars."""
    r = ObjectRecord(id="b1", text="日" * 6000)
    with pytest.raises(ValidationError, match="Text too long"):
        r.validate()
    ObjectRecord(id="b2", text="日" * 3333).validate()  # 9999 bytes ok
    with pytest.raises(ValidationError, match="ID too long"):
        ObjectRecord(id="日" * 100, text="x").validate()  # 300 bytes


def test_lone_surrogate_rejected():
    """A lone surrogate is expressible in a Python str but not a Rust
    String (serde rejects the JSON) — reject at validate, before it can
    reach the native builder."""
    r = ObjectRecord(id="s1", text="bad \ud800 text")
    with pytest.raises(ValidationError, match="not valid Unicode"):
        r.validate()
