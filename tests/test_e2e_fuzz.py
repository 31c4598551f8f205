"""End-to-end fuzz: random query STRINGS through the full
parse -> plan -> engine pipeline, device stack vs host-only stack.

Covers the seams the per-layer suites cannot: parser output shapes that
only arise from real syntax (quotes, +/-, parens, field prefixes,
boosts) flowing into engine eligibility/fallback decisions.  With host
rescoring the two stacks must agree bit-for-bit on ids AND scores.
"""

import numpy as np
import pytest

from fugu_tpu.engine.dataset import Dataset
from fugu_tpu.records import ObjectRecord

WORDS = [f"w{i}" for i in range(24)]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    rng = np.random.default_rng(31)
    path = tmp_path_factory.mktemp("fuzzns")
    dev = Dataset("fuzzns", path, use_device=True)
    recs = []
    for i in range(4000):
        text = " ".join(rng.choice(WORDS, size=int(rng.integers(3, 14))))
        recs.append(
            ObjectRecord(
                id=f"d{i}",
                text=text,
                namespace="fuzzns",
                facets=[f"/cat/{int(rng.integers(0, 4))}"],
            )
        )
    dev.ingest(recs)
    host = Dataset("fuzzns", path, use_device=False)
    return dev, host


def random_query(rng) -> str:
    parts = []
    n = int(rng.integers(1, 4))
    for _ in range(n):
        w = WORDS[int(rng.integers(0, len(WORDS)))]
        r = rng.random()
        if r < 0.12:
            parts.append(f'"{w} {WORDS[int(rng.integers(0, len(WORDS)))]}"')
        elif r < 0.2:
            parts.append(f"+{w}")
        elif r < 0.27:
            parts.append(f"-{w}")
        elif r < 0.34:
            parts.append(f"text:{w}")
        elif r < 0.4:
            parts.append(f"{w}^2")
        elif r < 0.46 and n > 1:
            parts.append(f"({w} OR {WORDS[int(rng.integers(0, len(WORDS)))]})")
        else:
            parts.append(w)
        if rng.random() < 0.18:
            parts.append(rng.choice(["AND", "OR"]))
    q = " ".join(parts)
    return q.rstrip("ANDOR ") or "w0"


def test_device_host_agree_on_random_query_strings(corpora):
    dev, host = corpora
    rng = np.random.default_rng(77)
    checked = 0
    for trial in range(80):
        q = random_query(rng)
        filters = (
            [f"/cat/{int(rng.integers(0, 4))}"] if rng.random() < 0.25 else []
        )
        per_page = int(rng.choice([5, 10, 20]))
        got = dev.search(q, filters, 0, per_page)
        want = host.search(q, filters, 0, per_page)
        g = [(h.id, np.float32(h.score)) for h in got]
        w = [(h.id, np.float32(h.score)) for h in want]
        assert g == w, (trial, q, filters, g[:4], w[:4])
        checked += len(g)
    assert checked > 100  # the grammar produces real matches
