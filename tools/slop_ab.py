"""Same-day A/B: slop-heavy phrase batch, stream engine vs host matcher
(1M bench corpus, real chip). VERDICT r4 item 3's measurement."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench
from fugu_tpu.ops import oracle
from fugu_tpu.ops.blockmax import search_blockmax
from fugu_tpu.ops.phrase import search_phrase_topk
from fugu_tpu.ops.phrase_stream import batch_phrase_search
from fugu_tpu.query import Occur, PhraseClause, QueryGroup, QueryPlan

seg = bench.build_corpus()
stats = oracle.IndexStats([seg])
rng = np.random.default_rng(5)
p = 1.0 / np.arange(1, 30_000 + 1) ** 1.07
p /= p.sum()

def plan(words, slop):
    return QueryPlan(groups=(QueryGroup(
        Occur.SHOULD,
        phrases=(PhraseClause("text", tuple(words), slop=slop),),
    ),))

plans = []
for i in range(192):
    k = int(rng.integers(2, 4))
    words = [f"t{j:05d}" for j in rng.choice(30_000, size=k, replace=False, p=p)]
    plans.append(plan(words, slop=int(rng.integers(1, 3))))
limits = [10] * len(plans)

def host_run():
    out = []
    for pl in plans:
        r = search_phrase_topk(seg, pl, stats, 10)
        if r is None:
            r = search_blockmax(seg, pl, stats, 10)
        if r is None:
            r = [(h.score, h.doc) for h in oracle.search([seg], pl, 10, stats)]
        out.append(r)
    return out

os.environ["FUGU_PHRASE_STREAM"] = "1"
def stream_run():
    res = batch_phrase_search(seg, plans, stats, limits)
    for j, r in enumerate(res):
        if r is None:
            res[j] = host_run_one(j)
    return res

def host_run_one(j):
    r = search_phrase_topk(seg, plans[j], stats, 10)
    return r

print("warming stream kernels (compile)...", file=sys.stderr, flush=True)
t0 = time.perf_counter(); s_first = stream_run()
print(f"stream first (compile+upload): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); h_first = host_run()
print(f"host first: {time.perf_counter()-t0:.1f}s", flush=True)

hs, ss = [], []
for rep in range(3):
    t0 = time.perf_counter(); sr = stream_run(); ss.append(time.perf_counter()-t0)
    t0 = time.perf_counter(); hr = host_run(); hs.append(time.perf_counter()-t0)
# parity
n_eq = sum(1 for a, b in zip(sr, hr) if a == b)
print(f"slop-heavy 192 phrases @1M: stream {min(ss)*1e3:.0f}-{max(ss)*1e3:.0f}ms "
      f"({len(plans)/sorted(ss)[1]:.1f} QPS) vs host {min(hs)*1e3:.0f}-{max(hs)*1e3:.0f}ms "
      f"({len(plans)/sorted(hs)[1]:.1f} QPS); parity {n_eq}/{len(plans)}")
