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


def test_inflight_gate_coalesces_under_load():
    """While one batch executes, later arrivals hold in the queue and
    dispatch as ONE batch the moment the slot frees (continuous
    batching) — not as many tiny overlapping batches."""
    from fugu_tpu.server.batcher import SearchBatcher

    batch_sizes = []
    release = threading.Event()

    class FakeDataset:
        def search_many(self, queries, page, per_page):
            batch_sizes.append(len(queries))
            if len(batch_sizes) == 1:
                release.wait(10)  # first batch blocks until released
            return [[] for _ in queries]

    async def main():
        b = SearchBatcher(window_ms=1.0, max_batch=256, max_inflight=1)
        ds = FakeDataset()

        async def one(q):
            return await b.search(ds, q, (), 0, 10)

        first = asyncio.create_task(one("q0"))
        await asyncio.sleep(0.05)  # batch 1 dispatched, now blocked
        assert batch_sizes == [1]
        rest = [asyncio.create_task(one(f"q{i}")) for i in range(1, 9)]
        await asyncio.sleep(0.05)  # window long past; gate must hold
        assert batch_sizes == [1]
        release.set()
        await asyncio.gather(first, *rest)
        assert batch_sizes == [1, 8], batch_sizes

    asyncio.run(main())


def test_full_queue_bypasses_gate():
    """A queue at max_batch dispatches immediately even while another
    batch runs — the gate bounds batch count, not queue memory."""
    from fugu_tpu.server.batcher import SearchBatcher

    batch_sizes = []
    release = threading.Event()

    class FakeDataset:
        def search_many(self, queries, page, per_page):
            batch_sizes.append(len(queries))
            if len(batch_sizes) == 1:
                release.wait(10)
            return [[] for _ in queries]

    async def main():
        b = SearchBatcher(window_ms=1.0, max_batch=4, max_inflight=1)
        ds = FakeDataset()

        async def one(q):
            return await b.search(ds, q, (), 0, 10)

        first = asyncio.create_task(one("q0"))
        await asyncio.sleep(0.05)
        assert batch_sizes == [1]
        rest = [asyncio.create_task(one(f"q{i}")) for i in range(1, 5)]
        await asyncio.sleep(0.2)  # 4 queued = max_batch → bypass
        assert batch_sizes == [1, 4], batch_sizes
        release.set()
        await asyncio.gather(first, *rest)

    asyncio.run(main())


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
