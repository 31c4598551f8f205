"""Tracing / structured logging — the tracing_utils + otel_setup analog.

The reference runs two overlapping systems (SURVEY.md §5): `tracing` spans
with per-component constructors (`/root/reference/src/tracing_utils.rs:149-235`
— cli/server/database/compactor/query spans) plus an OTLP OpenTelemetry
pipeline (`/root/reference/src/otel_setup.rs`).  Here:

- the same span taxonomy via a contextvar-based Span that logs structured
  enter/exit lines with durations (console + optional logs/fugu.log file,
  mirroring tracing_utils.rs:14-95)
- OTLP export is gated: if the `opentelemetry` package is importable and
  OTEL_EXPORTER_OTLP_ENDPOINT is set, spans are mirrored into it; this
  image ships without it, so it degrades to logging (documented)
- `took_ms` timing helper — the response field API.md promises but the
  reference never implemented (API.md:108-115); we do.
"""

from __future__ import annotations

import contextlib
import contextvars
import logging
import os
import time
from pathlib import Path
from typing import Iterator, Optional

logger = logging.getLogger("fugu_tpu")

_current_span: contextvars.ContextVar[Optional[str]] = contextvars.ContextVar(
    "fugu_span", default=None
)

_otel_tracer = None


def init_tracing(
    level: str = "INFO",
    log_file: Optional[str] = "logs/fugu.log",
    console: bool = True,
) -> None:
    """Console + file subscriber (tracing_utils.rs:14-95)."""
    root = logging.getLogger("fugu_tpu")
    root.setLevel(os.environ.get("FUGU_LOG", level).upper())
    root.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s %(name)s [%(span)s] %(message)s"
    )

    class SpanFilter(logging.Filter):
        def filter(self, record):
            record.span = _current_span.get() or "-"
            return True

    if console:
        h = logging.StreamHandler()
        h.setFormatter(fmt)
        h.addFilter(SpanFilter())
        root.addHandler(h)
    if log_file:
        try:
            Path(log_file).parent.mkdir(parents=True, exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            fh.addFilter(SpanFilter())
            root.addHandler(fh)
        except OSError:
            pass

    global _otel_tracer
    _otel_tracer = _init_otel()


def _init_otel():
    """OTLP gating: a tracer only when the endpoint is configured AND the
    opentelemetry package imports; else spans stay log-only.  Split out
    so tests can exercise both gates with a stubbed module."""
    if not os.environ.get("OTEL_EXPORTER_OTLP_ENDPOINT"):
        return None
    try:
        from opentelemetry import trace
    except ImportError:
        logger.info(
            "OTLP endpoint set but opentelemetry not installed; spans log-only"
        )
        return None
    return trace.get_tracer("fugu_tpu")


@contextlib.contextmanager
def span(component: str, name: str, **fields) -> Iterator[None]:
    """Named span: logs entry/exit with duration; nests via contextvar."""
    label = f"{component}:{name}"
    token = _current_span.set(label)
    start = time.perf_counter()
    ctx = None
    if _otel_tracer is not None:
        ctx = _otel_tracer.start_as_current_span(label)
        ctx.__enter__()
    try:
        yield
    finally:
        dur_ms = (time.perf_counter() - start) * 1000
        logger.debug("%s done in %.2fms %s", label, dur_ms, fields or "")
        if ctx is not None:
            ctx.__exit__(None, None, None)
        _current_span.reset(token)


def cli_span(name: str):
    return span("cli", name)


def server_span(route: str, method: str):
    return span("server", f"{method} {route}")


def db_span(name: str):
    return span("database", name)


def compactor_span(name: str):
    return span("compactor", name)


def query_span(name: str):
    return span("query", name)


class Timer:
    """took_ms helper."""

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.took_ms = round((time.perf_counter() - self._start) * 1000, 3)
        return False
