"""Integration soak: concurrent mixed load against one live server.

The unit suites race subsystems pairwise; this drives searches, ingest,
explicit compaction, and spill/restore CONCURRENTLY through the real
HTTP surface and asserts the error contract holds end to end (every
response is JSON; no 5xx for well-formed input). Bounded (~15s) so it
stays in the default suite.
"""

import json
import threading

import pytest

from tests.test_server import LiveServer


@pytest.fixture(scope="module")
def soak_server(tmp_path_factory):
    srv = LiveServer(tmp_path_factory.mktemp("soak_data"))
    docs = [
        {
            "id": f"seed{i}",
            "text": f"soak corpus document number {i} with shared words",
            "namespace": "default",
        }
        for i in range(50)
    ]
    status, _ = srv.post_json("/ingest", {"data": docs})
    assert status == 200
    yield srv
    srv.stop()
    srv.db.close()


def test_concurrent_mixed_load(soak_server, tmp_path):
    srv = soak_server
    errors = []
    stop = threading.Event()
    spill_prefix = f"file://{tmp_path}/soakcold"

    def check(status, raw, what, allowed=(200,)):
        if status not in allowed:
            errors.append((what, status, raw[:200]))
        try:
            json.loads(raw)
        except Exception:
            errors.append((what, status, "NON-JSON: " + raw[:200]))

    def searcher(i):
        n = 0
        while not stop.is_set() and n < 40:
            n += 1
            status, raw = srv.request(
                "GET", f"/search?q=soak+document+{n % 7}"
            )
            # 409 is the documented cold-namespace contract when a spill
            # races the query and auto-restore loses the race window
            check(status, raw, f"search{i}", allowed=(200, 409))
            status, raw = srv.request(
                "POST", "/search/json", {"query": "shared words", "page": {"per_page": 5}}
            )
            check(status, raw, f"json{i}", allowed=(200, 409))

    def ingester():
        n = 0
        while not stop.is_set() and n < 25:
            n += 1
            status, raw = srv.request(
                "POST",
                "/ingest",
                {"data": [{"id": f"live{n}", "text": f"soak live doc {n}"}]},
            )
            check(status, raw, "ingest", allowed=(200,))

    def compactor():
        n = 0
        while not stop.is_set() and n < 6:
            n += 1
            status, raw = srv.request("POST", "/compact")
            check(status, raw, "compact", allowed=(200,))

    def spiller():
        n = 0
        while not stop.is_set() and n < 4:
            n += 1
            status, raw = srv.request(
                "POST",
                "/namespaces/default/spill",
                {"prefix": spill_prefix},
            )
            check(status, raw, "spill", allowed=(200,))
            status, raw = srv.request(
                "POST",
                "/namespaces/default/restore",
                {"prefix": spill_prefix},
            )
            check(status, raw, "restore", allowed=(200,))

    threads = (
        [threading.Thread(target=searcher, args=(i,)) for i in range(3)]
        + [
            threading.Thread(target=ingester),
            threading.Thread(target=compactor),
            threading.Thread(target=spiller),
        ]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
        if t.is_alive():
            stop.set()
            errors.append(("thread-hang", t.name, ""))
    assert not errors, errors[:5]

    # steady state: everything restored, all docs findable
    status, body = srv.get_json("/search?q=soak")
    assert status == 200
    status, text = srv.get("/metrics")  # Prometheus text, not JSON
    assert status == 200 and "fugu_search" in text
