"""Benchmark: BM25 top-10 QPS on the device pipeline vs the scalar oracle.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline note (BASELINE.md): the reference publishes no numbers and this
image has no Rust toolchain to build it, so the denominator is the
measured **scalar NumPy oracle** on the same host/corpus/queries — the
faithful single-threaded CPU implementation of exactly the work Tantivy
does per query (full postings traversal + BM25 + top-k).  `vs_baseline`
is therefore device-QPS / oracle-QPS.  MS MARCO is not available offline
(zero egress); the corpus is synthetic Zipfian text shaped like MS MARCO
passages (~55 tokens/doc).

Progress goes to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

N_DOCS = int(os.environ.get("BENCH_DOCS", 1_000_000))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 256))
VOCAB_SIZE = 30_000
MEAN_DOC_LEN = 55
SEED = 7

CACHE = Path(__file__).parent / ".bench_cache"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_corpus():
    """Synthetic Zipfian corpus, cached as a frozen segment on disk."""
    from fugu_tpu.index.manifest import load_segment, save_segment
    from fugu_tpu.index.schema import DOCS_SCHEMA
    from fugu_tpu.index.segment import SegmentBuilder

    tag = f"v1-{N_DOCS}"
    seg_id = "bench" + tag.replace("-", "")
    CACHE.mkdir(exist_ok=True)
    marker = CACHE / f"seg-{seg_id}.npz"
    if marker.exists():
        log(f"loading cached corpus {marker}")
        return load_segment(CACHE, seg_id, DOCS_SCHEMA)

    log(f"building corpus: {N_DOCS} docs, vocab {VOCAB_SIZE}")
    rng = np.random.default_rng(SEED)
    vocab = np.array([f"t{i:05d}" for i in range(VOCAB_SIZE)])
    p = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** 1.07
    p /= p.sum()
    b = SegmentBuilder(DOCS_SCHEMA)
    t0 = time.time()
    lens = np.clip(rng.poisson(MEAN_DOC_LEN, N_DOCS), 5, 200)
    for i in range(N_DOCS):
        words = vocab[rng.choice(VOCAB_SIZE, size=lens[i], p=p)]
        b.add_document(
            {"text": [" ".join(words)]},
            facets=[f"/source/{int(rng.integers(0, 20))}"],
            stored={"id": f"d{i}"},
        )
        if i % 20000 == 19999:
            log(f"  {i + 1} docs ({time.time() - t0:.0f}s)")
    seg = b.build()
    seg.segment_id = seg_id
    save_segment(seg, CACHE)
    log(f"corpus built in {time.time() - t0:.0f}s: {seg.n_entries} postings")
    return seg


def make_queries(seg):
    """Zipf-weighted 1-4 term queries over terms that exist in the corpus."""
    rng = np.random.default_rng(SEED + 1)
    terms = sorted(seg.terms["text"].keys())
    dfs = np.array([seg.terms["text"][t].doc_freq for t in terms], dtype=np.float64)
    w = dfs / dfs.sum()
    queries = []
    for _ in range(N_QUERIES):
        n = int(rng.integers(1, 5))
        idx = rng.choice(len(terms), size=n, replace=False, p=w)
        queries.append([terms[i] for i in idx])
    return queries


def plan_for(words):
    from fugu_tpu.query import Occur, QueryGroup, QueryPlan, TermClause

    return QueryPlan(
        groups=tuple(
            QueryGroup(Occur.SHOULD, (TermClause("text", w),)) for w in words
        )
    )


def main() -> None:
    t_start = time.time()
    seg = build_corpus()
    from fugu_tpu.ops import oracle, scoring

    stats = oracle.IndexStats([seg])
    queries = make_queries(seg)
    plans = [plan_for(q) for q in queries]

    # warmup: compile every static bucket signature once (persistent
    # compilation cache makes this instant on later runs)
    if os.environ.get("BENCH_XLA") == "1" or N_DOCS <= 200_000:
        log("xla warmup/compile...")
        t0 = time.time()
        scoring.device_search_batch(seg, plans, stats, 10)
        log(f"xla warmup done in {time.time() - t0:.1f}s")

    # XLA merge-network engine (memory-heavy at very large posting
    # buckets; skipped by default beyond 200k docs — BENCH_XLA=1 forces)
    qps = 0.0
    device_hits = None
    if os.environ.get("BENCH_XLA") == "1" or N_DOCS <= 200_000:
        t0 = time.time()
        device_hits = scoring.device_search_batch(seg, plans, stats, 10)
        device_s = time.time() - t0
        qps = len(plans) / device_s
        log(f"device batched (xla): {qps:.1f} QPS, {device_s / len(plans) * 1000:.2f} ms/query amortized")

    # Pallas block-scorer engine (compiles once per signature; cached)
    try:
        from fugu_tpu.ops.pallas_scorer import pallas_search_batch

        log("pallas warmup/compile...")
        t0 = time.time()
        pallas_hits = pallas_search_batch(seg, plans, stats, 10)
        log(f"pallas warmup done in {time.time() - t0:.1f}s")
        n_handled = sum(1 for r in pallas_hits if r is not None)
        from fugu_tpu.ops import pallas_scorer as _ps

        _ps.PROFILE.update(stage_s=0.0, device_s=0.0, dispatches=0)
        t0 = time.time()
        pallas_hits = pallas_search_batch(seg, plans, stats, 10)
        pallas_s = time.time() - t0
        pallas_qps = len(plans) / pallas_s
        log(
            f"device batched (pallas): {pallas_qps:.1f} QPS "
            f"({n_handled}/{len(plans)} handled), "
            f"{pallas_s / len(plans) * 1000:.2f} ms/query amortized"
        )
        prof = dict(_ps.PROFILE)
        if prof["stage_s"] + prof["device_s"] > 0:
            log(
                f"pallas time split (timed run): host staging "
                f"{prof['stage_s']:.2f}s, device {prof['device_s']:.2f}s "
                f"across {prof['dispatches']} dispatches"
            )
        if pallas_qps > qps and n_handled == len(plans):
            qps = pallas_qps
            device_hits = pallas_hits
            log("headline engine: pallas")
        else:
            log("headline engine: xla")
    except Exception as e:  # pallas path is best-effort in the bench
        log(f"pallas engine skipped: {e}")
    if device_hits is None or qps == 0.0:
        raise SystemExit("no device engine produced results")

    # single-stream latency (p50/p99) via the headline engine
    try:
        from fugu_tpu.ops.pallas_scorer import pallas_search_batch as _psb

        def single(p):
            return _psb(seg, [p], stats, 10)[0]

    except ImportError:  # pragma: no cover

        def single(p):
            return scoring.device_search_segment(seg, p, stats, 10)
    lat_samples = []
    for plan in plans[:40]:
        t1 = time.time()
        single(plan)
        lat_samples.append((time.time() - t1) * 1000)
    lat_samples.sort()
    p50 = lat_samples[len(lat_samples) // 2]
    p99 = lat_samples[min(int(len(lat_samples) * 0.99), len(lat_samples) - 1)]
    log(f"single-stream latency: p50={p50:.2f}ms p99={p99:.2f}ms")

    # oracle baseline on a subsample (it is slow), scaled
    n_base = min(40, len(plans))
    t0 = time.time()
    for plan in plans[:n_base]:
        oracle.search([seg], plan, 10, stats)
    oracle_s = (time.time() - t0) * (len(plans) / n_base)
    oracle_qps = len(plans) / oracle_s
    log(f"oracle baseline: {oracle_qps:.1f} QPS (scaled from {n_base} queries)")

    # recall parity spot check: identical docs, or — when boundary docs
    # differ — identical score lists (equal-score tie picks are both
    # legitimate orderings; f32 summation-order ulp means each engine
    # breaks exact ties by its own last bit)
    mismatches = 0
    checked = min(20, len(plans))
    for plan, hits in list(zip(plans, device_hits))[:checked]:
        exp = oracle.search([seg], plan, 10, stats)
        got_docs = [d for _, d in (hits or [])]
        exp_docs = [h.doc for h in exp]
        if got_docs == exp_docs:
            continue
        got_scores = np.array([s for s, _ in (hits or [])], dtype=np.float64)
        exp_scores = np.array([h.score for h in exp], dtype=np.float64)
        if len(got_scores) == len(exp_scores) and np.allclose(
            got_scores, exp_scores, rtol=1e-5
        ):
            continue  # same ranking function, tie-pick difference only
        mismatches += 1
    log(f"recall@10 parity: {checked - mismatches}/{checked} queries agree")

    log(f"total bench time {time.time() - t_start:.0f}s")
    print(
        json.dumps(
            {
                "metric": f"BM25 top-10 QPS ({N_DOCS} docs, batched)",
                "value": round(qps, 2),
                "unit": "queries/s",
                "vs_baseline": round(qps / oracle_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
