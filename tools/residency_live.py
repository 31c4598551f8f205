"""Two-namespace HBM-residency live drill on the real chip.

Serves a 16M-doc and a 1M-doc corpus from one process under the auto
device-memory budget (HBM - 15%): the 16M query packs alone are ~95% of
the budget, so touching the 1M namespace MUST evict a 16M pack, and
returning to the 16M namespace MUST re-upload it (evicting the 1M pack
in turn) — queries stay exact through every transition, device memory
stays bounded, no RESOURCE_EXHAUSTED. This is the round-3 verdict's
"done" bar for the residency manager (VERDICT.md item 3); policy-level
coverage lives in tests/test_residency.py.

Usage: python tools/residency_live.py   (needs .bench_cache segments for
BOTH sizes — run bench.py at BENCH_DOCS=1000000 and 16000000 first)

Prints one JSON line: {"evictions": N, "transitions": [...], "ok": true}
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load(n_docs):
    from fugu_tpu.index.manifest import load_segment
    from fugu_tpu.index.schema import DOCS_SCHEMA

    cache = Path(__file__).parent.parent / ".bench_cache"
    seg_id = f"benchv1{n_docs}"
    if not (cache / f"seg-{seg_id}.npz").exists():
        print(json.dumps({"ok": False, "error": f"no cached segment for {n_docs}"}))
        sys.exit(1)
    return load_segment(cache, seg_id, DOCS_SCHEMA)


def main():
    import bench
    from fugu_tpu.ops import oracle, residency
    from fugu_tpu.ops.batch_scorer import batch_search

    t0 = time.time()
    segs = {}
    stats = {}
    mixes = {}
    for n in (16_000_000, 1_000_000):
        bench.N_DOCS = n
        segs[n] = load(n)
        stats[n] = oracle.IndexStats([segs[n]])
        # device-path plans only (should/must/mustnot/facet/limit100 —
        # host-only phrase plans are dropped): the drill exercises pack
        # transitions, not the full class mix
        mix = [m for m in bench.make_query_mix(segs[n]) if not m[1].host_only]
        mixes[n] = mix[:48]
        log(f"{n}: {segs[n].n_entries} postings, {len(mixes[n])} queries")

    transitions = []
    problems = []
    prev_evictions = None
    # 16M -> 1M -> 16M: each arrow must evict and stay correct
    for step, n in enumerate((16_000_000, 1_000_000, 16_000_000)):
        t1 = time.time()
        plans = [p for _c, p, _l in mixes[n]]
        lims = [l for _c, _p, l in mixes[n]]
        res = batch_search(segs[n], plans, stats[n], lims)
        dt = time.time() - t1
        st = residency.stats()
        # exact-order spot check vs the oracle on 8 queries
        ok = 0
        for j in range(0, len(plans), max(len(plans) // 8, 1)):
            if res[j] is None:
                continue
            want = [
                (np.float32(h.score), h.doc)
                for h in oracle.search([segs[n]], plans[j], lims[j], stats[n])
            ]
            got = [(np.float32(s), d) for s, d in res[j]]
            assert got == want, f"mismatch at step {step} q{j}"
            ok += 1
        served = sum(1 for r in res if r is not None)
        # a run that served nothing (all plans declined / below
        # MIN_BATCH) exercised no packs and proves nothing — fail it
        if served == 0:
            problems.append(f"step {step}: served 0 of {len(plans)}")
        if step == 0:
            # pin the budget JUST above the 16M residency so the 1M
            # namespace cannot coexist — on this chip the default auto
            # budget (13.6G) turned out to hold BOTH namespaces
            # (12.4 + 1.1GB, first r5 run: zero evictions, nothing
            # proven).  200MB headroom < the 1M packs, so every
            # namespace switch below must run the evict/re-upload
            # cycle the drill exists to certify.
            os.environ["FUGU_DEVICE_MEM_BUDGET"] = str(
                st["resident_bytes"] + 200 * 2**20
            )
            log(
                f"budget pinned to {(st['resident_bytes'] + 200 * 2**20) / 2**30:.2f}GB"
            )
        if ok == 0:
            problems.append(f"step {step}: zero spot checks ran")
        if prev_evictions is not None and st["evictions"] <= prev_evictions:
            problems.append(
                f"step {step}: no eviction on namespace switch "
                f"({st['evictions']} <= {prev_evictions})"
            )
        prev_evictions = st["evictions"]
        transitions.append(
            {
                "ns_docs": n,
                "served": served,
                "of": len(plans),
                "spot_exact": ok,
                "secs": round(dt, 1),
                "resident_gb": round(st["resident_bytes"] / 2**30, 2),
                "evictions": st["evictions"],
            }
        )
        log(f"step {step} ({n}): {transitions[-1]}")

    st = residency.stats()
    out = {
        "ok": not problems,
        "problems": problems,
        "budget_gb": round((st["budget_bytes"] or 0) / 2**30, 2),
        "evictions": st["evictions"],
        "transitions": transitions,
        "total_secs": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    sys.exit(0 if not problems else 2)


if __name__ == "__main__":
    main()
