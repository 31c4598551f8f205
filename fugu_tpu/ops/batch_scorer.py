"""Two-phase batched query engine: corpus-stream phase A + pruned phase B.

The single-query block scorer visits every nonempty block per query
(~490 at 1M docs), but the TRUE top-k docs of a query live in ~k blocks.
Sum-of-max WAND bounds cannot find them (measured: 148/245 blocks pass
at 1M docs — the corpus is too homogeneous); exact per-block maxima can
(measured: 10.6/489).  So:

**Phase A** (new Pallas kernel): ONE streaming pass over the segment's
block-major pack (index/segment.py BlockMajorPack) computes, for the
whole query batch at once, the exact-ish max score per (512-doc block,
query).  Per 1024-entry chunk everything is two one-hot matmuls on the
MXU:

    V[e, q]  = (onehot_term[e, u] @ W[u, q]) * contrib[e]
    S[d, q] += onehot_doc[e, d]^T @ V[e, q]

where W is the per-(union term, query) BM25 weight matrix and contrib is
the precomputed weight-free tf/(tf + norm) component.  The scatter/BM25
work is shared by all B queries — the batch visits each posting once
instead of once per query that contains its term (5.5x dedup measured on
the Zipf bench mix, and padding queries to B=256 is free MXU lanes).

**Phase B**: per query, only blocks whose phase-A max can still reach
the kth score (with a bf16-error margin) are re-scored exactly by the
existing block kernel (ops/pallas_scorer with per-query block lists).
The kth lower bound is valid because block maxima are real doc scores
(blocks partition docs; dead docs are zeroed out of the pack).

Eligibility: pure-SHOULD term/facet plans at default k1/b (boolean
queries keep the exact single-phase path — their maxima are not valid
pruning bounds).  Parity: phase B is the existing oracle-checked kernel,
so results are identical to the single-phase engine.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fugu_tpu import jax_setup
from fugu_tpu.index.segment import (
    BM_BLOCK_DOCS,
    BM_CHUNK,
    FACET_FIELD_KEY,
    Segment,
)
from fugu_tpu.ops.scoring import NEG_INF
from fugu_tpu.query import Occur, QueryPlan, bm25_weight, idf

jax_setup.configure()

B_PAD = 256          # queries per phase-A dispatch (padding = free lanes)
U_BUCKETS = (512, 1024)  # union-term ladder; beyond -> greedy query split
#: relative + absolute margin absorbing bf16 matmul error in the maxima.
#: Correctness needs m >= 2*eps/(1+eps); measured eps(max) = 0.0059 on the
#: 1M bench corpus, so 0.015 is a 2.5x-of-max cushion.  Looser margins
#: balloon phase-B candidate lists (0.05 passed 69 blocks/query vs 18).
MARGIN_REL = 0.015
MARGIN_ABS = 3e-3
#: phase A pays one full corpus stream per dispatch; below this many
#: eligible queries the single-phase engine is cheaper
MIN_BATCH = 24


def _phasea_kernel(
    offs,          # int32[NB+1] scalar prefetch: chunk offsets per block
    doc_hbm,       # int32[E]    block-major doc ids
    tid_hbm,       # int32[E]    block-major global term ids
    con_hbm,       # f32[E]      block-major weight-free contributions
    w_ref,         # bf16[U, B]  per-(union term, query) weights
    tids_ref,      # int32[8, U] union term ids (row 0; sublane-padded)
    out_ref,       # f32[1, 1, B]
    *scratch,
    u_pad: int,
):
    doc_s, tid_s, con_s, sems = scratch
    j = pl.program_id(0)
    c0 = offs[j]
    c1 = offs[j + 1]
    base = j * BM_BLOCK_DOCS

    d_iota = jax.lax.broadcasted_iota(jnp.int32, (BM_CHUNK, BM_BLOCK_DOCS), 1)
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (BM_CHUNK, u_pad), 1)

    def dma(ci, slot):
        woff = pl.multiple_of(slot * BM_CHUNK, 1024)
        a = pl.multiple_of(ci * BM_CHUNK, 1024)
        return [
            pltpu.make_async_copy(
                doc_hbm.at[pl.ds(a, BM_CHUNK)],
                doc_s.at[pl.ds(woff, BM_CHUNK)],
                sems.at[slot * 3 + 0],
            ),
            pltpu.make_async_copy(
                tid_hbm.at[pl.ds(a, BM_CHUNK)],
                tid_s.at[pl.ds(woff, BM_CHUNK)],
                sems.at[slot * 3 + 1],
            ),
            pltpu.make_async_copy(
                con_hbm.at[pl.ds(a, BM_CHUNK)],
                con_s.at[pl.ds(woff, BM_CHUNK)],
                sems.at[slot * 3 + 2],
            ),
        ]

    @pl.when(c1 > c0)
    def _():
        for d in dma(c0, 0):
            d.start()

    def chunk_step(ci, S):
        slot = (ci - c0) % 2
        woff = pl.multiple_of(slot * BM_CHUNK, 1024)

        @pl.when(ci + 1 < c1)
        def _():
            for d in dma(ci + 1, 1 - slot):
                d.start()

        for d in dma(ci, slot):
            d.wait()

        doc = doc_s[pl.ds(woff, BM_CHUNK)].reshape(BM_CHUNK, 1)
        tid = tid_s[pl.ds(woff, BM_CHUNK)].reshape(BM_CHUNK, 1)
        con = con_s[pl.ds(woff, BM_CHUNK)].reshape(BM_CHUNK, 1)

        # one-hot against the REAL union term ids (global tids stay on
        # device untouched; pad entries carry tid=-1, empty slots -2)
        oh_t = (tid == tids_ref[0:1, :]).astype(jnp.bfloat16)  # [C, U]
        v = jax.lax.dot_general(
            oh_t,
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [C, B]
        v = (v * con).astype(jnp.bfloat16)
        oh_d = ((doc - base) == d_iota).astype(jnp.bfloat16)  # [C, D]
        S = S + jax.lax.dot_general(
            oh_d,
            v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [D, B]
        return S

    S = jax.lax.fori_loop(
        c0,
        c1,
        chunk_step,
        jnp.zeros((BM_BLOCK_DOCS, out_ref.shape[-1]), jnp.float32),
    )
    # a matched doc's score is > 0 (weights and contribs are positive);
    # unmatched/dead/padded rows stay exactly 0 -> excluded from the max
    amax = jnp.max(jnp.where(S > 0.0, S, NEG_INF), axis=0)
    out_ref[0, 0:1, :] = amax[None, :]
    del u_iota  # slot-index variant unused (kept for layout reference)


def _build_phasea(nb_pad: int, u_pad: int, b_pad: int, interpret: bool):
    kernel = functools.partial(_phasea_kernel, u_pad=u_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((u_pad, b_pad), lambda j, *_: (0, 0)),
            pl.BlockSpec((8, u_pad), lambda j, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, b_pad), lambda j, *_: (j, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * BM_CHUNK,), jnp.int32),
            pltpu.VMEM((2 * BM_CHUNK,), jnp.int32),
            pltpu.VMEM((2 * BM_CHUNK,), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )

    def call(offs, doc, tid, con, w, tids):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nb_pad, 1, b_pad), jnp.float32)],
            interpret=interpret,
        )(offs, doc, tid, con, w, tids)[0]

    return jax.jit(call)


_PHASEA_CACHE: dict = {}


def _get_phasea(nb_pad, u_pad, b_pad, interpret):
    key = (nb_pad, u_pad, b_pad, interpret)
    if key not in _PHASEA_CACHE:
        _PHASEA_CACHE[key] = _build_phasea(nb_pad, u_pad, b_pad, interpret)
    return _PHASEA_CACHE[key]


def _nb_pad(nb: int) -> int:
    for v in (64, 256, 1024, 2048, 4096, 8192):
        if nb <= v:
            return v
    return ((nb + 1023) // 1024) * 1024


def _eligible(plan: QueryPlan, limit: int) -> bool:
    from fugu_tpu.query import K1, B as B_CONST

    if plan.host_only or plan.is_empty:
        return False
    if plan.k1 != float(K1) or plan.b != float(B_CONST):
        return False  # contributions precomputed at default constants
    for g in plan.groups:
        if g.occur is not Occur.SHOULD:
            return False  # boolean maxima are not valid pruning bounds
        if g.phrases or g.ranges or g.subplan is not None:
            return False
    return True


def batch_search_should(
    segment: Segment,
    plans: Sequence[QueryPlan],
    stats,
    limit: int,
    interpret: Optional[bool] = None,
) -> List[Optional[List[Tuple[float, int]]]]:
    """Two-phase batch search for pure-SHOULD plans.

    Returns one entry per plan; None marks plans this path does not
    handle (callers run those through the single-phase engine).
    """
    from fugu_tpu.ops.pallas_scorer import MAX_K, pallas_search_batch

    results: List[Optional[List[Tuple[float, int]]]] = [None] * len(plans)
    if limit > MAX_K:
        return results
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    elig = [i for i, p in enumerate(plans) if _eligible(plans[i], limit)]
    if len(elig) < (1 if interpret else MIN_BATCH):
        return results

    pack = segment.block_major(stats)
    k1 = plans[elig[0]].k1

    # stage W columns; greedy-split query sets whose union exceeds the
    # largest bucket (each split pays another corpus stream)
    batches: List[List[int]] = []
    batch_terms: List[Dict[int, int]] = []
    cur: List[int] = []
    cur_terms: Dict[int, int] = {}
    for i in elig:
        tids = set()
        for g in plans[i].groups:
            for c in g.clauses:
                field = FACET_FIELD_KEY if c.is_facet else c.field
                t = pack.tid_of.get((field, c.term))
                if t is not None:
                    tids.add(t)
        new = [t for t in tids if t not in cur_terms]
        if len(cur) >= B_PAD or (
            cur and len(cur_terms) + len(new) > U_BUCKETS[-1]
        ):
            batches.append(cur)
            batch_terms.append(cur_terms)
            cur, cur_terms = [], {}
            new = list(tids)
        for t in new:
            cur_terms[t] = len(cur_terms)
        cur.append(i)
    if cur:
        batches.append(cur)
        batch_terms.append(cur_terms)

    nb = pack.n_blocks
    nb_pad = _nb_pad(nb)
    offs = np.zeros(nb_pad + 1, dtype=np.int32)
    offs[: nb + 1] = pack.chunk_offs
    offs[nb + 1 :] = pack.chunk_offs[-1]  # padded blocks run zero chunks

    pending = []
    for q_idx, terms in zip(batches, batch_terms):
        u_pad = next((u for u in U_BUCKETS if len(terms) <= u), None)
        if u_pad is None:
            continue  # single over-wide query set: single-phase fallback
        w = np.zeros((u_pad, B_PAD), dtype=np.float32)
        tid_arr = np.full((8, u_pad), -2, dtype=np.int32)
        for t, slot in terms.items():
            tid_arr[0, slot] = t
        for qi, i in enumerate(q_idx):
            for g in plans[i].groups:
                for c in g.clauses:
                    field = FACET_FIELD_KEY if c.is_facet else c.field
                    t = pack.tid_of.get((field, c.term))
                    if t is None:
                        continue
                    slot = terms[t]
                    if c.is_facet:
                        df = stats.facet_doc_freq(c.term)
                        w[slot, qi] += float(idf(df, stats.doc_count)) * c.boost
                    else:
                        df = stats.doc_freq(c.field, c.term)
                        w[slot, qi] += float(
                            bm25_weight(df, stats.doc_count, c.boost, k1)
                        )
        fn = _get_phasea(nb_pad, u_pad, B_PAD, interpret)
        amax = fn(
            jnp.asarray(offs),
            pack.d_doc,
            pack.d_tid,
            pack.d_con,
            jnp.asarray(w, dtype=jnp.bfloat16),
            jnp.asarray(tid_arr),
        )
        pending.append((q_idx, amax))

    # phase B: per-query candidate 2048-blocks from the maxima
    from fugu_tpu.ops.pallas_scorer import BLOCK as B_BLOCK

    sub_per_big = B_BLOCK // BM_BLOCK_DOCS
    block_lists: Dict[int, np.ndarray] = {}
    run_idx: List[int] = []
    for q_idx, amax in pending:
        amax = np.asarray(amax)[:nb, 0, :]  # [NB, B_PAD]
        for qi, i in enumerate(q_idx):
            col = amax[:, qi]
            finite = col[np.isfinite(col)]
            if len(finite) == 0:
                results[i] = []
                continue
            kth = (
                np.partition(-finite, limit - 1)[limit - 1] * -1
                if len(finite) >= limit
                else -np.inf
            )
            thresh = kth - abs(kth) * MARGIN_REL - MARGIN_ABS
            cand = np.nonzero(col >= thresh)[0]
            big = np.unique(cand // sub_per_big).astype(np.int64)
            block_lists[i] = big
            run_idx.append(i)

    if run_idx:
        sub = pallas_search_batch(
            segment,
            [plans[i] for i in run_idx],
            stats,
            limit,
            interpret=interpret,
            block_lists={j: block_lists[i] for j, i in enumerate(run_idx)},
        )
        for j, i in enumerate(run_idx):
            results[i] = sub[j]
    return results
