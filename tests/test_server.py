"""HTTP API integration tests — the full route table over a live server
(SURVEY.md §4 item 3: HTTP API on a temp dir, ingest→search→delete→facets)."""

import asyncio
import json
import socket
import threading
import urllib.error
import urllib.request

import pytest
from aiohttp import web

from fugu_tpu.config import ServerConfig
from fugu_tpu.engine.manager import DatasetManager
from fugu_tpu.server.app import create_app


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class LiveServer:
    def __init__(self, tmp_path):
        cfg = ServerConfig.with_defaults(str(tmp_path), "default")
        self.db = DatasetManager(cfg, use_device=False)
        self.port = _free_port()
        self.base = f"http://127.0.0.1:{self.port}"
        self._loop = asyncio.new_event_loop()
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(10)

    def _run(self):
        asyncio.set_event_loop(self._loop)

        async def boot():
            app = create_app(self.db)
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", self.port)
            await site.start()
            self._runner = runner
            self._started.set()

        self._loop.run_until_complete(boot())
        self._loop.run_forever()

    def stop(self):
        async def cleanup():
            await self._runner.cleanup()

        fut = asyncio.run_coroutine_threadsafe(cleanup(), self._loop)
        fut.result(10)
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(10)

    def request(self, method, path, body=None):
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self.base + path,
            data=data,
            method=method,
            headers={"Content-Type": "application/json"} if data else {},
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                return resp.status, resp.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    def get(self, path):
        return self.request("GET", path)

    def get_json(self, path):
        status, body = self.get(path)
        return status, json.loads(body)

    def post_json(self, path, body):
        status, raw = self.request("POST", path, body)
        return status, json.loads(raw)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = LiveServer(tmp_path_factory.mktemp("server_data"))
    docs = [
        {
            "id": "s1",
            "text": "the quick brown fox jumps over the lazy dog",
            "namespace": "default",
            "data_type": "animal",
        },
        {
            "id": "s2",
            "text": "sphinx of black quartz judge my vow",
            "namespace": "default",
            "data_type": "pangram",
            "organization": "acme",
        },
        {
            "id": "s3",
            "text": "pack my box with five dozen liquor jugs",
            "namespace": "default",
            "conversation_id": "conv9",
            "metadata": {"name": "Jugs Pangram", "topic": "boxes"},
        },
    ]
    status, out = srv.post_json("/ingest", {"data": docs})
    assert status == 200 and out["status"] == "success"
    yield srv
    srv.stop()


def test_health(server):
    status, body = server.get("/health")
    assert status == 200
    # 7 text fields + facet + metadata + 3 dates = 12 (schemas.rs:7-31)
    assert body == "OK, found 12 in db"


def test_hi(server):
    status, out = server.get_json("/hi")
    assert out == {"message": "hi"}


def test_search_get(server):
    status, out = server.get_json("/search?q=quick%20fox")
    assert status == 200
    assert out["total"] >= 1
    assert out["results"][0]["id"] == "s1"
    assert "text" not in out["results"][0]  # stripped unless text=true
    assert "took_ms" in out


def test_search_get_with_text(server):
    _, out = server.get_json("/search?q=quick&text=true")
    assert "text" in out["results"][0]


def test_search_path(server):
    status, out = server.get_json("/search/sphinx%20quartz")
    assert status == 200
    assert out["results"][0]["id"] == "s2"


def test_search_post(server):
    status, out = server.post_json(
        "/search", {"query": "pangram liquor", "page": {"page": 0, "per_page": 10}}
    )
    assert status == 200
    assert out["status"] == "success"
    ids = [r["id"] for r in out["results"]]
    assert "s3" in ids


def test_search_post_namespace(server):
    status, out = server.post_json("/search/default", {"query": "fox"})
    assert status == 200
    assert out["results"][0]["id"] == "s1"
    status, out = server.post_json("/search/nope", {"query": "fox"})
    assert status == 404


def test_search_json_flags(server):
    status, out = server.post_json(
        "/search/json?text=true", {"query": "fox", "text": False}
    )
    assert status == 200
    assert "developer_message" in out
    assert "text" in out["results"][0]
    assert out["includes_data_objects"] is True
    status, out = server.post_json(
        "/search/json",
        {"query": "quartz", "filters": ["/namespace/default/organization/acme"]},
    )
    assert out["targeting_conversations_or_organizations"] is True
    assert out["includes_data_objects"] is False
    assert [r["id"] for r in out["results"]] == ["s2"]


def test_search_filters_constrain(server):
    status, out = server.post_json(
        "/search", {"query": "", "filters": ["/namespace/default/data/animal"]}
    )
    assert [r["id"] for r in out["results"]] == ["s1"]


def test_per_page_clamp(server):
    _, out = server.get_json("/search?q=quick&limit=1000")
    assert out["per_page"] == 20  # (0,100] clamp


def test_objects_get_by_id(server):
    status, out = server.get_json("/objects/s2")
    assert status == 200
    assert out["id"] == ["s2"]  # tantivy to_json array wrapping
    assert out["organization"] == ["acme"]


def test_objects_get_missing(server):
    _, out = server.get_json("/objects/zzz")
    assert "error" in out


def test_objects_list(server):
    status, out = server.get_json("/objects")
    assert status == 200
    assert out["total"] == 3
    assert len(out["objects"]) == 3


def test_objects_put_and_delete(server):
    status, out = server.request(
        "PUT", "/objects", {"data": [{"id": "tmp1", "text": "temporary doc"}]}
    )
    assert status == 200
    status, out = server.get_json("/search?q=temporary")
    assert out["total"] == 1
    status, raw = server.request("DELETE", "/objects/tmp1")
    assert status == 200
    status, out = server.get_json("/search?q=temporary")
    assert out["total"] == 0


def test_ingest_validation_400(server):
    status, out = server.post_json("/ingest", {"data": [{"id": "", "text": "x"}]})
    assert status == 400
    assert "Validation failed for object at index 0" in out["error"]


def test_ingest_namespace_counts(server):
    status, out = server.post_json(
        "/ingest/namespace",
        {
            "data": [
                {"id": "e1", "text": "explicit facets", "facets": ["/custom/path"]},
                {"id": "e2", "text": "generated facets", "namespace": "default"},
            ]
        },
    )
    assert out["explicit_facets_count"] == 1
    assert out["generated_facets_count"] == 1


def test_batch_upsert(server):
    status, out = server.post_json(
        "/batch/upsert", {"objects": [{"id": "b1", "text": "batch doc"}]}
    )
    assert out["upserted_count"] == 1


def test_namespaces_list(server):
    _, out = server.get_json("/namespaces")
    assert "default" in out["namespaces"]


def test_namespace_create_delete(server):
    status, out = server.post_json("/namespaces", {"name": "scratch"})
    assert status == 200
    _, out = server.get_json("/namespaces")
    assert "scratch" in out["namespaces"]
    status, _ = server.request("DELETE", "/namespaces/scratch")
    assert status == 200
    _, out = server.get_json("/namespaces")
    assert "scratch" not in out["namespaces"]


def test_namespace_facets(server):
    _, out = server.get_json("/namespaces/default/facets")
    assert out["status"] == "success"
    # the reference passes facet_root "/" (namespaces.rs handler), so this
    # returns the dataset's TOP-LEVEL facets, not the namespace subtree
    paths = [f["path"] for f in out["facets"]]
    assert "/namespace" in paths


def test_namespace_values(server):
    _, out = server.get_json("/namespaces/default/organizations")
    assert out["organizations"] == ["acme"]
    _, out = server.get_json("/namespaces/default/conversations")
    assert out["conversations"] == ["conv9"]
    _, out = server.get_json("/namespaces/default/data")
    assert set(out["data_types"]) >= {"animal", "pangram"}


def test_filters_list(server):
    _, out = server.get_json("/filters")
    values = [f["value"] for f in out["filters"]]
    assert "/namespace" in values


def test_filters_all(server):
    _, out = server.get_json("/filters/all")
    assert "/namespace/default/data" in out["filter_paths"]


def test_filters_path(server):
    _, out = server.get_json("/filters/path/namespace/default/data")
    assert set(out["values"]) >= {"animal", "pangram"}


def test_filters_namespace(server):
    _, out = server.get_json("/filters/namespace/default")
    assert out["status"] == "success"
    assert "/metadata" in out["filter_paths"] or out["filter_paths"] == {}


def test_filters_legacy(server):
    _, out = server.get_json("/filters/namespace")
    assert isinstance(out["filters"], list)


def test_facet_tree(server):
    _, out = server.get_json("/facets/tree")
    assert out["status"] == "success"
    assert "namespace" in out["data"]["tree"]
    _, limited = server.get_json("/facets/tree?max_depth=2")
    ns = limited["data"]["tree"].get("namespace")
    assert ns is None or ns["children"] == {}


def test_suggest(server):
    _, out = server.get_json("/suggest?q=sphinx")
    assert out["status"] == "success"


def test_openapi_and_swagger(server):
    status, out = server.get_json("/api.json")
    assert status == 200
    assert out["openapi"].startswith("3.")
    assert "/search" in out["paths"]
    status, body = server.get("/swagger")
    assert status == 200 and "swagger-ui" in body


def test_unknown_route_404(server):
    status, _ = server.get("/definitely/not/a/route")
    assert status == 404


def test_invalid_json_400(server):
    status, raw = server.request("POST", "/ingest", None)
    # no body at all -> error envelope
    assert status in (400, 500)


def test_compact_endpoint(server):
    # several ingest batches -> several segments; compaction merges them
    for i in range(3):
        server.post_json(
            "/ingest", {"data": [{"id": f"cpt{i}", "text": f"compact doc {i}"}]}
        )
    assert len(server.db.get_dataset("default").docs().segments) > 1
    status, out = server.post_json("/compact", {})
    assert status == 200 and out["status"] == "success"
    assert len(server.db.get_dataset("default").docs().segments) == 1
    _, res = server.get_json("/search?q=compact")
    assert res["total"] == 3
    status, _ = server.post_json("/compact/missing_ns", {})
    assert status == 404


def test_unparseable_query_returns_error_envelope(server):
    # trailing NOT survives character escaping, so both parse attempts
    # fail (search.rs's lenient path) -> error envelope, not a crash
    status, out = server.get_json("/search?q=fox%20NOT")
    assert status == 500
    assert "error" in out
    # the server is still healthy afterwards
    status, _ = server.get("/health")
    assert status == 200


def test_invalid_limit_param_400(server):
    status, out = server.get_json("/search?q=fox&limit=abc")
    assert status == 400
    assert "limit" in out["error"]


class TestShapeTolerantBodies:
    """Well-formed JSON with the wrong shape must produce JSON error
    envelopes / lenient defaults — never an aiohttp HTML 500."""

    def test_post_search_page_as_int(self, server):
        status, body = server.post_json("/search", {"query": "fox", "page": 5})
        assert status == 200  # wrong-shape page ignored, defaults used
        assert body["page"] == 0

    def test_post_search_array_body(self, server):
        status, raw = server.request("POST", "/search", ["not", "a", "dict"])
        assert status == 200  # reads as empty query, not HTML 500
        assert "results" in json.loads(raw)

    def test_post_search_scalar_filters(self, server):
        status, body = server.post_json(
            "/search", {"query": "fox", "filters": "abc"}
        )
        assert status == 200  # scalar filters dropped, not char-iterated
        assert body["total"] >= 1

    def test_ingest_non_dict_items_400(self, server):
        status, body = server.post_json("/ingest", {"data": ["not-a-dict"]})
        assert status == 400
        assert body["status"] == "error"

    def test_ingest_scalar_data_400(self, server):
        status, body = server.post_json("/ingest", {"data": "abc"})
        assert status == 400

    def test_put_objects_wrong_shape_400(self, server):
        status, raw = server.request("PUT", "/objects", {"data": [42]})
        assert status == 400
        assert json.loads(raw)["status"] == "error"


class TestUnknownNamespaceIs404:
    def test_namespace_facets_404(self, server):
        status, body = server.get_json("/namespaces/no-such-ns/facets")
        assert status == 404

    def test_namespace_orgs_404(self, server):
        status, body = server.get_json("/namespaces/no-such-ns/organizations")
        assert status == 404

    def test_search_json_with_knobs_404(self, server):
        status, body = server.post_json(
            "/search/json",
            {"query": "x", "namespace": "no-such-ns", "bm25_k1": 1.5},
        )
        assert status == 404


def test_metrics_label_escaping():
    from fugu_tpu.server.metrics import Metrics

    m = Metrics()
    m.inc("reqs", namespace='a\nb"c\\d')
    text = m.render()
    assert '\\n' in text and '\\"' in text and "\\\\" in text
    # exactly two physical lines: the metric line and trailing newline
    assert len([l for l in text.splitlines() if l.startswith("reqs")]) == 1


def test_every_route_is_in_the_openapi_spec():
    """Drift guard: every registered route (method+path) must appear in
    /api.json — the review found /compact and /metrics missing once."""
    from aiohttp import web

    from fugu_tpu.config import ServerConfig
    from fugu_tpu.engine.manager import DatasetManager
    from fugu_tpu.server.app import create_app
    from fugu_tpu.server.openapi import build_openapi

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        db = DatasetManager(
            ServerConfig.with_defaults(td, "default"), use_device=False
        )
        app = create_app(db)
        spec = build_openapi("0")["paths"]
        missing = []
        for resource in app.router.resources():
            info = resource.get_info()
            path = info.get("path") or info.get("formatter")
            if path in ("/api.json", "/swagger"):
                continue  # the docs endpoints describe, not appear in,
                # the spec (matching the reference's aide setup)
            # aiohttp regex routes ({filter:.+}) normalize to {filter}
            norm = path.replace("{filter:.+}", "{filter}")
            for route in resource:
                method = route.method.lower()
                if method in ("head", "options"):
                    continue
                if norm not in spec or method not in spec[norm]:
                    missing.append((method.upper(), path))
        db.close()
        assert not missing, f"routes missing from /api.json: {missing}"
