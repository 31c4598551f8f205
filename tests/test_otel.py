"""OTLP pipeline assembly (telemetry._init_otel — otel_setup.rs parity).

The CI image has no opentelemetry SDK, so these tests install a minimal
RECORDING stub SDK into sys.modules and assert the real wiring: resource
detection, TracerProvider + BatchSpanProcessor + OTLP exporter assembly,
global provider + composite propagator installation, spans actually
flowing through the provider (not just `get_tracer`), request-context
extraction, and shutdown flush.
"""

import sys
import types

import pytest

from fugu_tpu import telemetry


class Recorder:
    def __init__(self):
        self.resources = []
        self.providers = []
        self.processors = []
        self.exporters = []
        self.global_provider = None
        self.global_textmap = None
        self.spans = []
        self.extract_calls = []
        self.shutdowns = 0


def install_stub_sdk(monkeypatch):
    rec = Recorder()

    class Resource:
        def __init__(self, attrs):
            self.attrs = attrs

        @classmethod
        def create(cls, attrs):
            r = cls(attrs)
            rec.resources.append(r)
            return r

    class _SpanCtx:
        def __init__(self, name, context=None):
            self.name = name
            self.context = context

        def __enter__(self):
            rec.spans.append(self.name)
            return self

        def __exit__(self, *a):
            return False

    class Tracer:
        def start_as_current_span(self, name, context=None):
            return _SpanCtx(name, context)

    class TracerProvider:
        def __init__(self, resource=None):
            self.resource = resource
            self.processors = []
            rec.providers.append(self)

        def add_span_processor(self, p):
            self.processors.append(p)
            rec.processors.append(p)

        def shutdown(self):
            rec.shutdowns += 1

        def get_tracer(self, name):  # real SDK API; telemetry uses the
            return Tracer()          # provider's tracer, not the global

    class BatchSpanProcessor:
        def __init__(self, exporter):
            self.exporter = exporter

    class OTLPSpanExporter:
        def __init__(self, endpoint=None):
            self.endpoint = endpoint
            rec.exporters.append(self)

    class CompositePropagator:
        def __init__(self, propagators):
            self.propagators = propagators

    class TraceContextTextMapPropagator:
        pass

    class W3CBaggagePropagator:
        pass

    def set_tracer_provider(p):
        rec.global_provider = p

    def get_tracer(name):
        return Tracer()

    def set_global_textmap(p):
        rec.global_textmap = p

    def extract(carrier):
        rec.extract_calls.append(dict(carrier))
        return {"remote": carrier.get("traceparent")}

    mods = {
        "opentelemetry": types.ModuleType("opentelemetry"),
        "opentelemetry.trace": types.ModuleType("opentelemetry.trace"),
        "opentelemetry.propagate": types.ModuleType("opentelemetry.propagate"),
        "opentelemetry.baggage": types.ModuleType("opentelemetry.baggage"),
        "opentelemetry.baggage.propagation": types.ModuleType(
            "opentelemetry.baggage.propagation"
        ),
        "opentelemetry.exporter": types.ModuleType("opentelemetry.exporter"),
        "opentelemetry.exporter.otlp": types.ModuleType(
            "opentelemetry.exporter.otlp"
        ),
        "opentelemetry.exporter.otlp.proto": types.ModuleType(
            "opentelemetry.exporter.otlp.proto"
        ),
        "opentelemetry.exporter.otlp.proto.grpc": types.ModuleType(
            "opentelemetry.exporter.otlp.proto.grpc"
        ),
        "opentelemetry.exporter.otlp.proto.grpc.trace_exporter": types.ModuleType(
            "opentelemetry.exporter.otlp.proto.grpc.trace_exporter"
        ),
        "opentelemetry.propagators": types.ModuleType(
            "opentelemetry.propagators"
        ),
        "opentelemetry.propagators.composite": types.ModuleType(
            "opentelemetry.propagators.composite"
        ),
        "opentelemetry.sdk": types.ModuleType("opentelemetry.sdk"),
        "opentelemetry.sdk.resources": types.ModuleType(
            "opentelemetry.sdk.resources"
        ),
        "opentelemetry.sdk.trace": types.ModuleType("opentelemetry.sdk.trace"),
        "opentelemetry.sdk.trace.export": types.ModuleType(
            "opentelemetry.sdk.trace.export"
        ),
        "opentelemetry.trace.propagation": types.ModuleType(
            "opentelemetry.trace.propagation"
        ),
        "opentelemetry.trace.propagation.tracecontext": types.ModuleType(
            "opentelemetry.trace.propagation.tracecontext"
        ),
    }
    trace_mod = mods["opentelemetry.trace"]
    trace_mod.set_tracer_provider = set_tracer_provider
    trace_mod.get_tracer = get_tracer
    mods["opentelemetry"].trace = trace_mod
    prop_mod = mods["opentelemetry.propagate"]
    prop_mod.set_global_textmap = set_global_textmap
    prop_mod.extract = extract
    mods["opentelemetry"].propagate = prop_mod
    mods["opentelemetry.baggage.propagation"].W3CBaggagePropagator = (
        W3CBaggagePropagator
    )
    mods[
        "opentelemetry.exporter.otlp.proto.grpc.trace_exporter"
    ].OTLPSpanExporter = OTLPSpanExporter
    mods["opentelemetry.propagators.composite"].CompositePropagator = (
        CompositePropagator
    )
    mods["opentelemetry.sdk.resources"].Resource = Resource
    mods["opentelemetry.sdk.trace"].TracerProvider = TracerProvider
    mods["opentelemetry.sdk.trace.export"].BatchSpanProcessor = (
        BatchSpanProcessor
    )
    mods[
        "opentelemetry.trace.propagation.tracecontext"
    ].TraceContextTextMapPropagator = TraceContextTextMapPropagator
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return rec


@pytest.fixture
def rec(monkeypatch):
    rec = install_stub_sdk(monkeypatch)
    monkeypatch.setenv(
        "OTEL_EXPORTER_OTLP_ENDPOINT", "http://collector:4317"
    )
    monkeypatch.setenv("OTEL_SERVICE_NAME", "fugu-test")
    yield rec
    telemetry.shutdown_tracing()
    telemetry._otel_tracer = None


def test_full_pipeline_assembly(rec):
    telemetry.init_tracing(log_file=None, console=False)
    # resource detection
    assert rec.resources and rec.resources[-1].attrs["service.name"] == "fugu-test"
    assert "service.version" in rec.resources[-1].attrs
    # provider built on the resource, with a batch processor wrapping the
    # OTLP exporter pointed at the configured endpoint
    prov = rec.providers[-1]
    assert prov.resource is rec.resources[-1]
    assert len(prov.processors) == 1
    assert prov.processors[0].exporter.endpoint == "http://collector:4317"
    # global provider + composite propagator installed
    assert rec.global_provider is prov
    names = [type(p).__name__ for p in rec.global_textmap.propagators]
    assert names == [
        "TraceContextTextMapPropagator",
        "W3CBaggagePropagator",
    ]


def test_spans_flow_through_provider(rec):
    telemetry.init_tracing(log_file=None, console=False)
    with telemetry.query_span("bm25"):
        pass
    with telemetry.compactor_span("ns1"):
        pass
    assert rec.spans == ["query:bm25", "compactor:ns1"]


def test_request_span_extracts_remote_context(rec):
    telemetry.init_tracing(log_file=None, console=False)
    headers = {"traceparent": "00-abc-def-01"}
    with telemetry.request_span("GET", "/search", headers):
        pass
    assert rec.extract_calls and rec.extract_calls[-1]["traceparent"] == (
        "00-abc-def-01"
    )
    assert "GET /search" in rec.spans


def test_shutdown_flushes_provider(rec):
    telemetry.init_tracing(log_file=None, console=False)
    telemetry.shutdown_tracing()
    assert rec.shutdowns == 1
    # idempotent
    telemetry.shutdown_tracing()
    assert rec.shutdowns == 1


def test_no_endpoint_no_pipeline(monkeypatch):
    rec = install_stub_sdk(monkeypatch)
    monkeypatch.delenv("OTEL_EXPORTER_OTLP_ENDPOINT", raising=False)
    telemetry.init_tracing(log_file=None, console=False)
    assert rec.providers == []
    with telemetry.query_span("x"):
        pass  # log-only degrade, no crash
    assert rec.spans == []
