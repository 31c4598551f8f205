"""Metrics registry + token taxonomy + telemetry spans."""

import logging

from fugu_tpu import analysis_extended as ax
from fugu_tpu import telemetry
from fugu_tpu.server.metrics import Metrics, timed, REGISTRY
from tests.test_server import LiveServer


def test_counters_and_histograms():
    m = Metrics()
    m.inc("reqs_total")
    m.inc("reqs_total")
    m.inc("reqs_total", status="error")
    m.observe("lat_seconds", 0.003)
    m.observe("lat_seconds", 0.2)
    text = m.render()
    assert "reqs_total 2.0" in text
    assert 'reqs_total{status="error"} 1.0' in text
    assert 'lat_seconds_bucket{le="0.005"} 1' in text
    assert "lat_seconds_count 2" in text


def test_timed_context():
    m_before = REGISTRY.hist_count.get("unit_test_seconds", 0)
    with timed("unit_test"):
        pass
    assert REGISTRY.hist_count["unit_test_seconds"] == m_before + 1


def test_metrics_endpoint(tmp_path_factory):
    srv = LiveServer(tmp_path_factory.mktemp("metrics"))
    try:
        srv.post_json(
            "/ingest", {"data": [{"id": "m1", "text": "metric doc"}]}
        )
        srv.get("/search?q=metric")
        status, body = srv.get("/metrics")
        assert status == 200
        assert "fugu_ingested_documents_total" in body
        assert "fugu_search_seconds_bucket" in body
    finally:
        srv.stop()


def test_token_classification():
    assert ax.classify("hello") is ax.TokenType.WORD
    assert ax.classify("42.5") is ax.TokenType.NUMBER
    assert ax.classify("abc123") is ax.TokenType.ALPHANUM
    assert ax.classify("user@example.com") is ax.TokenType.EMAIL
    assert ax.classify("https://example.com/x") is ax.TokenType.URL
    assert ax.classify("U.S.A.") is ax.TokenType.ACRONYM
    assert ax.classify("www.example.org") is ax.TokenType.HOST
    assert ax.classify("!") is ax.TokenType.PUNCTUATION


def test_tokenize_into_index():
    idx = ax.tokenize_into_index("Hello world! hello again")
    assert idx["hello"] == [0, 2]
    assert idx["world"] == [1]
    assert "!" not in idx


def test_stream_tokenize():
    toks = list(ax.stream_tokenize(["line one\n", "line two\n"]))
    texts = [t.text for t in toks]
    assert texts == ["line", "one", "line", "two"]
    # offsets are global across the stream
    assert toks[2].start == len("line one\n")


def test_tokenize_query():
    assert ax.tokenize_query("Find U.S.A. docs!") == ["find", "u.s.a.", "docs"]


def test_spans_nest_and_log(caplog):
    telemetry.init_tracing(log_file=None, console=False)
    with caplog.at_level(logging.DEBUG, logger="fugu_tpu"):
        with telemetry.server_span("/x", "GET"):
            with telemetry.query_span("inner"):
                logging.getLogger("fugu_tpu").debug("inside")
    assert any("inside" in r.message for r in caplog.records)


def test_metrics_exposes_compaction_gauges(tmp_path):
    """/metrics carries live per-index segment and compaction counters
    (write amplification is observable in production)."""
    from tests.test_server import LiveServer

    s = LiveServer(tmp_path)
    try:
        for i in range(3):
            s.post_json(
                "/ingest", {"data": [{"id": f"m{i}", "text": f"metric doc {i}"}]}
            )
        status, body = s.get("/metrics")
        assert status == 200
        assert 'fugu_segments{namespace="default",index="docs"}' in body
        assert 'fugu_docs_ingested{namespace="default",index="docs"} 3' in body
        assert "fugu_compaction_merges" in body
    finally:
        s.stop()
