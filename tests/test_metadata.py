"""Metadata facet-expansion parity (utils.rs tests replicated + extended)."""

from fugu_tpu import metadata
from fugu_tpu.records import ObjectRecord


def test_create_metadata_facets():
    md = {
        "category": "documents",
        "tags": ["important", "legal"],
        "details": {"department": "legal", "priority": "high"},
    }
    facets = metadata.create_metadata_facets(md, [])
    assert ["category", "documents"] in facets
    assert ["tags", "important"] in facets
    assert ["tags", "legal"] in facets
    assert ["details", "department", "legal"] in facets
    assert ["details", "priority", "high"] in facets


def test_non_string_leaves_dropped():
    facets = metadata.create_metadata_facets({"n": 3, "b": True, "x": None, "s": ""}, [])
    assert facets == []


def test_create_facet_indexes_keeps_non_strings_as_empty():
    out = metadata.create_facet_indexes({"n": 3}, [])
    assert out == [["n", ""]]


def test_hashmap_variant():
    out = metadata.create_metadata_facets_hashmap({"a": {"b": "c"}}, [])
    assert out == [["a", "b", "c"]]


def test_process_additional_fields():
    r = ObjectRecord(id="i", text="t", namespace="ns", organization="org")
    extra = metadata.process_additional_fields(r)
    assert "id" not in extra and "text" not in extra
    assert extra["namespace"] == "ns"
    assert extra["organization"] == "org"


def test_is_value_empty():
    assert metadata.is_value_empty(None)
    assert metadata.is_value_empty("")
    assert metadata.is_value_empty([])
    assert metadata.is_value_empty({})
    assert metadata.is_value_empty(0)
    assert not metadata.is_value_empty(False)
    assert not metadata.is_value_empty(True)
    assert not metadata.is_value_empty("text")
