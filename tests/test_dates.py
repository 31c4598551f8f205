"""Date range queries over the indexed date fields (schemas.rs:26-28)."""

import pytest

from fugu_tpu.engine.dataset import Dataset
from fugu_tpu.records import ObjectRecord


@pytest.fixture
def ds(tmp_path):
    d = Dataset("dates", tmp_path, use_device=False)
    d.ingest(
        [
            ObjectRecord(
                id="old",
                text="ancient scroll",
                namespace="dates",
                date_created="2020-01-15T00:00:00Z",
            ),
            ObjectRecord(
                id="mid",
                text="medieval scroll",
                namespace="dates",
                date_created="2022-06-01T12:00:00Z",
            ),
            ObjectRecord(
                id="new",
                text="modern scroll",
                namespace="dates",
                date_created="2024-11-30T23:59:59Z",
            ),
            ObjectRecord(id="undated", text="timeless scroll", namespace="dates"),
        ]
    )
    return d


def test_range_inclusive(ds):
    res = ds.search(
        "scroll date_created:[2021-01-01T00:00:00Z TO 2023-01-01T00:00:00Z]",
        [],
        0,
        10,
    )
    assert [r.id for r in res] == ["mid"]


def test_range_open_bounds(ds):
    res = ds.search("scroll date_created:[2022-01-01T00:00:00Z TO *]", [], 0, 10)
    assert sorted(r.id for r in res) == ["mid", "new"]
    res = ds.search("scroll date_created:[* TO 2021-01-01T00:00:00Z]", [], 0, 10)
    assert [r.id for r in res] == ["old"]


def test_range_exclusive(ds):
    res = ds.search(
        "scroll date_created:{2020-01-15T00:00:00Z TO 2024-11-30T23:59:59Z}",
        [],
        0,
        10,
    )
    assert [r.id for r in res] == ["mid"]


def test_range_alone(ds):
    res = ds.search("date_created:[2024-01-01T00:00:00Z TO *]", [], 0, 10)
    assert [r.id for r in res] == ["new"]


def test_negated_range(ds):
    res = ds.search("scroll -date_created:[2021-01-01T00:00:00Z TO *]", [], 0, 10)
    # docs created after 2021 excluded; undated docs have no value -> kept
    assert sorted(r.id for r in res) == ["old", "undated"]


def test_undated_never_matches_range(ds):
    res = ds.search("date_created:[* TO *]", [], 0, 10)
    assert "undated" not in [r.id for r in res]
    assert len(res) == 3


def test_bad_range_falls_back(ds):
    # invalid bound -> parse error -> escape-retry strips brackets; terms
    # remain searchable rather than erroring out
    res = ds.search("scroll date_created:[banana TO *]", [], 0, 10)
    assert len(res) >= 1
