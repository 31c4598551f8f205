"""Native (C++) analyzer/builder parity vs the Python reference path."""

import numpy as np
import pytest

from fugu_tpu import analysis, native
from fugu_tpu.index.schema import DOCS_SCHEMA
from fugu_tpu.index.segment import SegmentBuilder

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

TEXTS = [
    "Hello, World! FOO-bar_baz",
    "café 42 中文 MIXED case",
    "a" * 39 + " " + "b" * 40 + " tail",
    "İstanbul STRASSE ẞ ß",
    "repeat repeat rePEAT x",
    "",
    "punct!!! ... ---",
    "中" * 14 + " short 中文字",
]


@pytest.mark.parametrize("text", TEXTS)
def test_tokenizer_parity(text):
    expected = [(t.text, t.position) for t in analysis.tokenize(text)]
    got = native.tokenize(text)
    assert got == expected


def test_tokenizer_parity_fuzz():
    rng = np.random.default_rng(0)
    alphabet = list("abc ABC123 .,!-_çÇİöÖ中文αΒéİ")
    for _ in range(200):
        n = int(rng.integers(0, 60))
        text = "".join(rng.choice(alphabet, size=n))
        expected = [(t.text, t.position) for t in analysis.tokenize(text)]
        assert native.tokenize(text) == expected, repr(text)


def _build_pair(docs):
    py = SegmentBuilder(DOCS_SCHEMA, use_native=False)
    nat = SegmentBuilder(DOCS_SCHEMA, use_native=True)
    for b in (py, nat):
        for fields, facets in docs:
            b.add_document(fields, facets=facets, stored={})
    return py.build(), nat.build()


def segments_equal(a, b):
    assert a.doc_count == b.doc_count
    assert a.n_entries == b.n_entries
    assert set(a.terms.keys()) == set(b.terms.keys())
    for field in a.terms:
        assert list(a.terms[field].keys()) == list(b.terms[field].keys()), field
        for term in a.terms[field]:
            ia, ib = a.terms[field][term], b.terms[field][term]
            assert ia.doc_freq == ib.doc_freq, (field, term)
            da, ta, fa = a.postings(field, term)
            db, tb, fb = b.postings(field, term)
            assert np.array_equal(da, db), (field, term)
            assert np.array_equal(ta, tb), (field, term)
            assert np.array_equal(fa, fb), (field, term)
            if field in a.pos_offsets:
                assert a.term_positions(field, term) == b.term_positions(
                    field, term
                ), (field, term)
    assert a.total_tokens == b.total_tokens
    for field in a.fieldnorm_ids:
        assert np.array_equal(a.fieldnorm_ids[field], b.fieldnorm_ids[field])


def test_builder_parity_simple():
    docs = [
        ({"text": ["hello world hello"], "id": ["d0"]}, ["/ns/a"]),
        ({"text": ["world peace now"], "id": ["d1"]}, ["/ns/b", "/ns/a/x"]),
        ({"text": ["HELLO again"], "name": ["Greeting"], "id": ["d2"]}, []),
    ]
    py, nat = _build_pair(docs)
    segments_equal(py, nat)


def test_builder_parity_multivalue_positions():
    docs = [({"text": ["first value", "second value here"], "id": ["x"]}, [])]
    py, nat = _build_pair(docs)
    segments_equal(py, nat)


def test_builder_parity_unicode_and_long_tokens():
    docs = [
        ({"text": ["İstanbul " + "z" * 45 + " café"], "id": ["u1"]}, []),
        ({"text": ["中文 搜索 引擎"], "id": ["u2"]}, []),
    ]
    py, nat = _build_pair(docs)
    segments_equal(py, nat)


def test_builder_parity_fuzz():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)] + ["Aç", "中文", "MiXeD"]
    docs = []
    for i in range(50):
        words = rng.choice(vocab, size=int(rng.integers(1, 25)))
        fields = {"text": [" ".join(words)], "id": [f"doc{i}"]}
        if i % 3 == 0:
            fields["name"] = [f"Name {i}"]
        docs.append((fields, [f"/cat/{i % 4}"]))
    py, nat = _build_pair(docs)
    segments_equal(py, nat)


def test_pending_docs_for_term_native():
    b = SegmentBuilder(DOCS_SCHEMA, use_native=True)
    b.add_document({"id": ["DupId"], "text": ["one"]}, stored={})
    b.add_document({"id": ["other"], "text": ["two"]}, stored={})
    b.add_document({"id": ["DupId"], "text": ["three"]}, stored={})
    assert b.pending_docs_for_term("id", "dupid") == [0, 2]


def test_id_side_table_matches_tokenizer():
    """The ascii-run fast path in _add_document_native must produce the
    same id-token side table as the full tokenizer for every id shape
    (hyphens, underscores, case, multi-byte, overlong, punctuation)."""
    ids = [
        "doc-123",
        "UUID_4f9A-b",
        "plain",
        "UPPER",
        "a.b.c",
        "héllo-Wörld",
        "x" * 45,
        "--",
        "mix3d-Case_ID.7",
    ]
    b = SegmentBuilder(DOCS_SCHEMA, use_native=True)
    expected = {}
    for i, v in enumerate(ids):
        b.add_document({"id": [v], "text": ["t"]}, stored={})
        for tok in analysis.tokenize(v):
            expected.setdefault(tok.text, []).append(i)
    assert b._id_docs == expected


def test_ingest_speedup_sanity():
    """Native path should be meaningfully faster on a real workload."""
    import time

    rng = np.random.default_rng(1)
    vocab = np.array([f"t{i}" for i in range(2000)])
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(800)]

    t0 = time.time()
    nat = SegmentBuilder(DOCS_SCHEMA, use_native=True)
    for i, t in enumerate(texts):
        nat.add_document({"text": [t], "id": [f"d{i}"]}, stored={})
    nat.build()
    native_s = time.time() - t0

    t0 = time.time()
    py = SegmentBuilder(DOCS_SCHEMA, use_native=False)
    for i, t in enumerate(texts):
        py.add_document({"text": [t], "id": [f"d{i}"]}, stored={})
    py.build()
    python_s = time.time() - t0

    assert native_s < python_s, (native_s, python_s)


def test_sigma_lowercase_parity():
    """Tantivy's LowerCaser is char-wise (no Final_Sigma rule): both the
    native table path and analysis._lower must map 'ΛΟΓΟΣ' -> 'λογοσ',
    NOT Python str.lower()'s 'λογος'."""
    from fugu_tpu import analysis

    text = "ΛΟΓΟΣ μετὰ ΣΟΦΙΑΣ"
    py = [(t.text, t.position) for t in analysis.tokenize(text)]
    assert ("λογοσ", 0) in py and ("σοφιασ", 2) in py
    if native.available():
        nat = native.tokenize(text)
        assert nat == py
