"""Differential validation against REAL Tantivy (SURVEY §7: "verify
against the built reference, not from memory").

This box has no Rust toolchain (BASELINE.md), so the golden vectors are
generated elsewhere, once, by ``tools/tantivy_golden`` (cargo project
pinning tantivy =0.24.1, the exact version the reference depends on at
/root/reference/Cargo.toml:48).  The generator mirrors the reference's
setup: docs schema fields (schemas.rs:7-59), QueryParser over
[text, name] (search.rs:108-112), TopDocs at limit 30.

Until ``tests/golden/tantivy_golden.json`` is checked in, the suite
SKIPS these tests loudly; once the fixture lands, every (query ->
ranked (doc_id, f32-bit score)) pair must reproduce bit-for-bit through
the repo's oracle — converting "we believe our reading of Tantivy" into
"we measured against it".

The corpus/queries fixtures exercise the parity-sensitive machinery:
40-byte RemoveLongFilter boundary (39/40/41-char tokens), multi-byte
and Final_Sigma lowercasing, phrases with slop, +/-, boosts, field
prefixes, AND/OR/NOT, parens.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from fugu_tpu.engine import queryparser
from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder
from fugu_tpu.ops import oracle

GOLDEN_DIR = Path(__file__).parent / "golden"
FIXTURE = GOLDEN_DIR / "tantivy_golden.json"


def test_fixtures_exist_and_are_deterministic():
    corpus = json.loads((GOLDEN_DIR / "corpus.json").read_text())
    queries = json.loads((GOLDEN_DIR / "queries.json").read_text())
    assert len(corpus) == 200
    assert len(queries) == 50
    # the generator and this suite must agree on the corpus: spot-pin a
    # few documents so a regenerated corpus can't silently drift from a
    # previously-generated golden file
    assert corpus[0]["id"] == "gdoc0"
    assert all("/" in f for d in corpus for f in d["facets"])


@pytest.fixture(scope="module")
def seg():
    corpus = json.loads((GOLDEN_DIR / "corpus.json").read_text())
    b = SegmentBuilder(DOCS_SCHEMA)
    for rec in corpus:
        fields = {"id": [rec["id"]], "text": [rec["text"]]}
        if "name" in rec:
            fields["name"] = [rec["name"]]
        b.add_document(fields, facets=rec["facets"], stored={"id": rec["id"]})
    return b.build()


def test_oracle_handles_every_golden_query(seg):
    """Even before the fixture lands, every golden query must parse and
    search without error through the repo's own chain, and the corpus
    must be rich enough that most of them actually hit."""
    queries = json.loads((GOLDEN_DIR / "queries.json").read_text())
    stats = oracle.IndexStats([seg])
    nonempty = 0
    for query in queries:
        plan = queryparser.parse_with_fallback(
            query,
            default_fields=("text", "name"),
            known_fields=DOCS_SCHEMA.text_fields,
            date_fields=DOCS_SCHEMA.date_fields,
        )
        hits = oracle.search([seg], plan, 30, stats)
        nonempty += bool(hits)
    assert nonempty >= 35, nonempty


@pytest.mark.skipif(
    not FIXTURE.exists(),
    reason="tantivy_golden.json not generated yet — run "
    "`cargo run --release` in tools/tantivy_golden on a machine with "
    "Rust, then commit the output",
)
def test_oracle_matches_real_tantivy(seg):
    golden = json.loads(FIXTURE.read_text())
    assert golden["tantivy_version"] == "0.24.1"
    limit = golden["limit"]
    stats = oracle.IndexStats([seg])
    id_of = {d: seg.stored[d]["id"] for d in range(seg.doc_count)}

    mismatches = []
    for query, expected in golden["results"].items():
        if expected is None:
            continue  # tantivy itself failed to parse it
        plan = queryparser.parse_with_fallback(
            query,
            default_fields=("text", "name"),
            known_fields=DOCS_SCHEMA.text_fields,
            date_fields=DOCS_SCHEMA.date_fields,
        )
        hits = oracle.search([seg], plan, limit, stats)
        got = [
            (id_of[h.doc], int(np.float32(h.score).view(np.uint32)))
            for h in hits
        ]
        exp = [(doc_id, int(bits)) for doc_id, bits in expected]
        if got != exp:
            mismatches.append((query, exp[:3], got[:3]))
    assert not mismatches, mismatches


REVERSE = GOLDEN_DIR / "oracle_golden.json"


def test_reverse_fixture_matches_live_oracle(seg):
    """The committed REVERSE fixture (tools/dump_oracle_golden.py — our
    ranked results in the tantivy_golden schema, the handshake a future
    cargo run diffs against) must match the live oracle bit-for-bit; a
    behavior change that forgets to regenerate it fails here."""
    assert REVERSE.exists(), "run python tools/dump_oracle_golden.py"
    reverse = json.loads(REVERSE.read_text())
    assert reverse["tantivy_version_expected"] == "0.24.1"
    limit = reverse["limit"]
    stats = oracle.IndexStats([seg])
    id_of = {d: seg.stored[d]["id"] for d in range(seg.doc_count)}
    mismatches = []
    for query, expected in reverse["results"].items():
        if expected is None:
            continue
        plan = queryparser.parse_with_fallback(
            query,
            default_fields=("text", "name"),
            known_fields=DOCS_SCHEMA.text_fields,
            date_fields=DOCS_SCHEMA.date_fields,
        )
        hits = oracle.search([seg], plan, limit, stats)
        got = [
            [id_of[h.doc], int(np.float32(h.score).view(np.uint32))]
            for h in hits
        ]
        if got != expected:
            mismatches.append((query, expected[:2], got[:2]))
    assert not mismatches, mismatches
