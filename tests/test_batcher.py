"""Micro-batcher: concurrent searches coalesce and return correct results."""

import asyncio
import json
import threading
import urllib.request

import pytest

from tests.test_server import LiveServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = LiveServer(tmp_path_factory.mktemp("batch_data"))
    docs = [
        {"id": f"b{i}", "text": f"common word{i % 7} special{i}", "namespace": "default"}
        for i in range(50)
    ]
    status, _ = srv.post_json("/ingest", {"data": docs})
    assert status == 200
    yield srv
    srv.stop()


def test_concurrent_searches_batched(server):
    """Fire 24 concurrent searches; all must return their own results."""
    results = {}
    errors = []

    def worker(i):
        try:
            q = f"special{i}"
            status, out = server.get_json(f"/search?q={q}&text=true")
            assert status == 200
            results[i] = [r["id"] for r in out["results"]]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for i in range(24):
        assert results[i] == [f"b{i}"], (i, results[i])


def test_mixed_queries_same_window(server):
    results = {}

    def worker(i):
        q = "common" if i % 2 == 0 else f"word{i % 7}"
        status, out = server.get_json(f"/search?q={q}")
        results[i] = (status, out["total"])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (status, total) in results.items():
        assert status == 200
        assert total > 0
