"""Validate the phrase auto-router's cost model OFF its home corpus.

The min-df host cost model and the df-independent stream cost
(ops/phrase_stream.py: estimate_host_ms / estimate_stream_ms) were
calibrated on the 1M bench corpus (Zipf s=1.07, ~55 tokens/doc).
VERDICT r4 weak #5: nothing validated the model against a different df
profile, and the artifact headline depends on the routing being right.

This tool builds a SECOND synthetic corpus with a deliberately
different shape — flatter Zipf (s=0.7: heavy terms much less dominant,
so min_df profiles shift) and shorter docs (~25 tokens) — then, on the
REAL chip, measures host-matcher wall time vs stream wall time for
phrase batches spanning the df spectrum on BOTH corpora, and reports
whether ``want_stream`` picked the measured winner at each point.

Decisions within ``TOLERANCE_PCT`` of the crossover (where the two
sides measure within 25% of each other) count as correct either way —
the router only has to be right where being wrong costs something.

Prints one JSON line:
  {"ok": bool, "points": [{corpus, batch, host_ms, stream_ms,
                           routed_stream, measured_stream_wins, near}]}
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

TOLERANCE_PCT = 25.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_corpus(tag, n_docs, zipf_s, mean_len, vocab_size=30_000):
    from fugu_tpu.index.manifest import load_segment, save_segment
    from fugu_tpu.index.schema import DOCS_SCHEMA
    from fugu_tpu.index.segment import SegmentBuilder

    cache = Path(__file__).parent.parent / ".bench_cache"
    cache.mkdir(exist_ok=True)
    seg_id = f"costval{tag}{n_docs}"
    if (cache / f"seg-{seg_id}.npz").exists():
        log(f"loading cached {seg_id}")
        return load_segment(cache, seg_id, DOCS_SCHEMA)
    log(f"building {seg_id}: {n_docs} docs, zipf {zipf_s}, len {mean_len}")
    rng = np.random.default_rng(11)
    vocab = np.array([f"t{i:05d}" for i in range(vocab_size)])
    p = 1.0 / np.arange(1, vocab_size + 1) ** zipf_s
    p /= p.sum()
    b = SegmentBuilder(DOCS_SCHEMA)
    lens = np.clip(rng.poisson(mean_len, n_docs), 4, 200)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    words = vocab[rng.choice(vocab_size, size=int(starts[-1]), p=p)]
    for i in range(n_docs):
        b.add_document(
            {"text": [" ".join(words[starts[i] : starts[i + 1]])]},
            stored={"id": f"d{i}"},
        )
    seg = b.build()
    seg.segment_id = seg_id
    save_segment(seg, cache)
    return seg


def phrase_batches(seg, stats):
    """(name, plans): batches spanning the df spectrum — selective
    (uniform term draw), heavy (df-weighted draw), mixed, and a large
    batch above PHRASE_AUTO_MIN."""
    from fugu_tpu.query import Occur, PhraseClause, QueryGroup, QueryPlan

    rng = np.random.default_rng(3)
    terms = sorted(seg.terms["text"].keys())
    dfs = np.array(
        [seg.terms["text"][t].doc_freq for t in terms], dtype=np.float64
    )
    w = dfs / dfs.sum()
    uni = np.ones(len(terms)) / len(terms)

    def plan(words):
        return QueryPlan(
            groups=(
                QueryGroup(
                    Occur.SHOULD,
                    phrases=(PhraseClause("text", tuple(words)),),
                ),
            )
        )

    def pick(n, p):
        idx = rng.choice(len(terms), size=n, replace=False, p=p)
        return [terms[i] for i in idx]

    out = []
    out.append(("selective16", [plan(pick(2, uni)) for _ in range(16)]))
    out.append(("heavy16", [plan(pick(2, w)) for _ in range(16)]))
    out.append(
        (
            "mixed32",
            [plan(pick(2, w if i % 2 else uni)) for i in range(32)],
        )
    )
    out.append(("heavy160", [plan(pick(2, w)) for _ in range(160)]))
    return out


def measure(seg, stats, plans, reps=3):
    """(host_ms, stream_ms) medians for serving the whole batch."""
    from fugu_tpu.ops import oracle
    from fugu_tpu.ops.blockmax import search_blockmax
    from fugu_tpu.ops.phrase_stream import batch_phrase_search

    limits = [10] * len(plans)

    def host_run():
        for p in plans:
            r = search_blockmax(seg, p, stats, 10)
            if r is None:
                oracle.search([seg], p, 10, stats)

    def stream_run():
        res = batch_phrase_search(seg, plans, stats, limits)
        # ineligible/declined plans fall to the host matcher in prod
        for p, r in zip(plans, res):
            if r is None:
                search_blockmax(seg, p, stats, 10)

    host_run()  # warm skip tables / caches
    stream_run()  # warm kernels (compile once, persistently cached)
    hs, ss = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        host_run()
        hs.append((time.perf_counter() - t0) * 1000)
        t0 = time.perf_counter()
        stream_run()
        ss.append((time.perf_counter() - t0) * 1000)
    return sorted(hs)[len(hs) // 2], sorted(ss)[len(ss) // 2]


def main():
    from fugu_tpu.ops import oracle
    from fugu_tpu.ops.phrase_stream import want_stream

    corpora = [
        ("home", build_corpus("home", 500_000, 1.07, 55)),
        ("flat", build_corpus("flat", 500_000, 0.7, 25)),
    ]
    points = []
    ok = True
    for cname, seg in corpora:
        stats = oracle.IndexStats([seg])
        for bname, plans in phrase_batches(seg, stats):
            routed = want_stream(len(plans), plans=plans, stats=stats)
            host_ms, stream_ms = measure(seg, stats, plans)
            stream_wins = stream_ms < host_ms
            near = (
                abs(host_ms - stream_ms)
                <= TOLERANCE_PCT / 100.0 * max(host_ms, stream_ms)
            )
            good = near or (routed == stream_wins)
            ok &= good
            pt = {
                "corpus": cname,
                "batch": bname,
                "host_ms": round(host_ms, 1),
                "stream_ms": round(stream_ms, 1),
                "routed_stream": bool(routed),
                "measured_stream_wins": bool(stream_wins),
                "near_crossover": bool(near),
                "ok": bool(good),
            }
            points.append(pt)
            log(f"{cname}/{bname}: {pt}")
    print(json.dumps({"ok": ok, "tolerance_pct": TOLERANCE_PCT,
                      "points": points}))
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
