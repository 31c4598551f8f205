"""TPU-native batched phrase engine: brute-force corpus-position stream.

The measured lesson from ops/device_phrase.py (round 3): pointer-chasing
sorted-merge (searchsorted/gather over position lists) is the one access
pattern this hardware refuses — 3 QPS device vs 3,764 host.  The device
wins by brute-force streaming, which is why the term engine's phase A
streams the corpus once per batch (ops/batch_scorer.py).  This module
gives phrases the same shape:

**TokenStreamPack** (built per (segment, field), cached by the index
stats fingerprint): the corpus as a FORWARD token stream — for every
512-doc block, each live doc's tokens laid out at their position index
(holes = sentinel; POSITION_GAP holes already separate multi-value
fields), KGAP sentinel rows between docs so adjacency can never cross a
doc, each block's stream cut into 2048-row chunks that OVERLAP by KGAP
rows (a row's 7 successors are always visible in some chunk where the
row is anchor-eligible).  Each int32 row packs (doc_local << 22 | tid).

**Phrase kernel** (phase-A sibling): one streaming pass over the pack
computes, for the whole phrase batch at once, the exact-ish max phrase
score per (FINE_PER_BLOCK-split block, query):

    oh[p, u]    = (tok_tid[p] == union_tid[u]) | (u == ALWAYS_ONE)
    x_j[p, q]   = oh @ W_j           (1 iff token p is slot j of query q;
                                      dead slots j >= k_q hit ALWAYS_ONE)
    match[p, q] = prod_j x_j[p + j, q]        (shifted compares: pltpu.roll)
    tf[d, q]   += onehot_doc[p, d]^T @ match[p, q]       (MXU scatter)
    score       = w_p * tf / (tf + cacheval[d])          (exact-ish BM25)

Match anchors are counted once (chunk tails are masked and re-scored at
the next chunk's overlapped head), so tf IS the oracle's phrase_tf
(ops/oracle.py::phrase_postings) and the maxima are achievable doc
scores — the same compact device postprocessor as phase A
(batch_scorer._get_postproc) ships a kth-thresholded candidate mask, and
the host re-checks only surviving fine blocks with the exact
PhraseMatcher (ops/phrase.py), making final scores bit-identical to the
oracle.  Reference behavior: phrase queries inside Tantivy via
QueryParser -> PhraseQuery (`/root/reference/src/db/search.rs:112`).

Eligibility: single-group single-phrase plans (the quoted-query shape),
slop 0, <= 8 terms, default k1/b, positive boost, limit <= 128, vocab
< 2^22 terms in the field.  Everything else falls back to the host
matcher, which stays bit-exact.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fugu_tpu import jax_setup
from fugu_tpu.index.segment import BM_BLOCK_DOCS, BM_CHUNK, Segment
from fugu_tpu.ops.batch_scorer import (
    BM_FINE_DOCS,
    FINE_PER_BLOCK,
    _get_postproc,
    _nb_pad,
    _unpack_mask,
)
from fugu_tpu.ops.scoring import NEG_INF
from fugu_tpu.query import (
    Occur,
    PhraseClause,
    QueryPlan,
    bm25_weight,
    fieldnorm_cache,
)

jax_setup.configure()

#: max phrase terms on the device path; also the inter-doc sentinel gap
#: and the chunk overlap (a row's KGAP-1 successors stay visible)
KMAX = 8
KGAP = KMAX
#: term-ordinal bits in a packed stream row (doc_local rides bits 22-30,
#: sign bit stays 0: 511 << 22 | TID_MASK == 0x7FFFFFFF)
TID_BITS = 22
TID_MASK = (1 << TID_BITS) - 1
#: sentinel row: reserved never-assigned tid, doc_local 0 (harmless —
#: sentinel rows produce match 0, and match is the scatter's rhs)
SENT_ROW = np.int32(TID_MASK)

#: ladders (compile signatures; persistently cached like phase A's)
PB_BUCKETS = (64, 128, 256)
PU_BUCKETS = (128, 256, 512)
PK_BUCKETS = (2, 4, 8)

#: one stream pays phase-A-like fixed cost (~40ms at 1M docs); below
#: this many staged phrases the host matcher is cheaper
PHRASE_MIN_BATCH = int(os.environ.get("FUGU_PHRASE_MIN_BATCH", "8"))


# --------------------------------------------------------------------------
# pack construction
# --------------------------------------------------------------------------


class TokenStreamPack:
    """Forward token stream of one (segment, field), block-major and
    chunk-overlapped for the phrase kernel (see module docstring)."""

    def __init__(self, segment: Segment, field: str, stats):
        offs = segment.pos_offsets[field]
        data = segment.pos_data[field]
        base = segment.field_entry_base[field]
        n_ent = len(offs) - 1
        e_docs = segment.e_doc[base : base + n_ent].astype(np.int64)
        doc_count = segment.doc_count
        nb = max((doc_count + BM_BLOCK_DOCS - 1) // BM_BLOCK_DOCS, 1)
        self.n_blocks = nb
        self.nb_pad = _nb_pad(nb)

        # per-field term ordinals (the kernel's tid space)
        tmap = segment.terms[field]
        self.tid_of: Dict[str, int] = {}
        tid_entry = np.zeros(max(n_ent, 1), dtype=np.int64)
        for j, (term, info) in enumerate(tmap.items()):
            self.tid_of[term] = j
            lo = info.start - base
            tid_entry[lo : lo + info.doc_freq] = j
        self.n_terms = len(tmap)
        self.ok = self.n_terms < TID_MASK  # tid 2^22-1 is the sentinel
        if not self.ok:
            return

        # stream geometry: each doc owns rows [row0[d], row0[d] +
        # maxpos[d] + 1 + KGAP); docs with no tokens in the field (or
        # tombstoned) own nothing
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        maxpos = np.full(doc_count, -1, dtype=np.int64)
        if n_ent:
            last = data[np.maximum(offs[1:] - 1, 0)].astype(np.int64)
            last = np.where(lens > 0, last, -1)
            np.maximum.at(maxpos, e_docs, last)
        live = ~segment.tombstones
        has = (maxpos >= 0) & live
        dlen = np.where(has, maxpos + 1 + KGAP, 0)
        row0 = np.zeros(doc_count + 1, dtype=np.int64)
        np.cumsum(dlen, out=row0[1:])
        total_raw = int(row0[-1])

        raw = np.full(max(total_raw, 1), SENT_ROW, dtype=np.int32)
        if n_ent and total_raw:
            keep_e = has[e_docs]
            rep_docs = np.repeat(e_docs, lens * keep_e)
            rep_tids = np.repeat(tid_entry[:n_ent], lens * keep_e)
            pos_sel = _ragged_positions(data, offs, lens, keep_e)
            rows = row0[rep_docs] + pos_sel
            vals = rep_tids.astype(np.int64) | (
                (rep_docs % BM_BLOCK_DOCS) << TID_BITS
            )
            raw[rows] = vals.astype(np.int32)

        # per-block chunking with KGAP-row overlap: chunk i of a block
        # reads raw rows [i*(C-KGAP), i*(C-KGAP)+C) of the block's range
        usable = BM_CHUNK - KGAP
        blk_starts = row0[np.minimum(
            np.arange(nb, dtype=np.int64) * BM_BLOCK_DOCS, doc_count
        )]
        blk_ends = row0[np.minimum(
            (np.arange(nb, dtype=np.int64) + 1) * BM_BLOCK_DOCS, doc_count
        )]
        blk_len = blk_ends - blk_starts
        n_chunks = (blk_len + usable - 1) // usable  # 0 for empty blocks
        chunk_offs = np.zeros(self.nb_pad + 1, dtype=np.int32)
        np.cumsum(n_chunks, out=chunk_offs[1 : nb + 1])
        chunk_offs[nb + 1 :] = chunk_offs[nb]
        self.chunk_offs = chunk_offs
        total_chunks = int(chunk_offs[nb])

        size = _pack_rows(total_chunks)
        pack = np.full(size, SENT_ROW, dtype=np.int32)
        if total_chunks:
            blk_of = np.repeat(
                np.arange(nb, dtype=np.int64), n_chunks
            )
            within = (
                np.arange(total_chunks, dtype=np.int64)
                - chunk_offs[blk_of].astype(np.int64)
            )
            src0 = blk_starts[blk_of] + within * usable
            idx = src0[:, None] + np.arange(BM_CHUNK, dtype=np.int64)[None, :]
            valid = idx < blk_ends[blk_of][:, None]
            took = raw[np.where(valid, idx, 0)]
            pack[: total_chunks * BM_CHUNK] = np.where(
                valid, took, SENT_ROW
            ).reshape(-1)

        # per-doc BM25 denominator constants, laid out [block * 1024 +
        # doc_local] so the kernel DMAs one aligned 1024-f32 row per block
        cache = fieldnorm_cache(stats.avg_fieldnorm(field))
        fids = segment.fieldnorm_ids[field].astype(np.int64)
        cv = np.zeros(self.nb_pad * 1024, dtype=np.float32)
        didx = np.arange(doc_count, dtype=np.int64)
        cv[(didx // BM_BLOCK_DOCS) * 1024 + didx % BM_BLOCK_DOCS] = cache[
            fids
        ]
        # padded/empty doc slots keep cv=0; their tf is always 0, and the
        # tf > 0.5 gate excludes them before the 0/0 division could matter
        cv[cv == 0.0] = np.float32(1.0)

        from fugu_tpu.ops import residency

        residency.reserve(
            ("tok", id(segment), field),
            pack.nbytes + cv.nbytes,
            segment,
            functools.partial(_evict_token_stream, field=field),
            kind="token_stream",
        )
        self.d_tok = jnp.asarray(pack)
        self.d_cv = jnp.asarray(cv)
        self.hbm_bytes = pack.nbytes + cv.nbytes


def _ragged_positions(data, offs, lens, keep_e):
    """data[offs[i]:offs[i]+lens[i]] concatenated over entries with
    keep_e[i] (the repeat/cumsum idiom, no Python loop)."""
    klens = lens * keep_e
    total = int(klens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    rep = np.repeat(offs[:-1].astype(np.int64), klens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(klens) - klens, klens
    )
    return data[rep + within].astype(np.int64)


def _pack_rows(total_chunks: int) -> int:
    """Pack length bucket (jit signatures include shapes)."""
    from fugu_tpu.index.segment import _pow2_bucket

    return _pow2_bucket(max(total_chunks, 1) * BM_CHUNK)


def _evict_token_stream(seg: Segment, field: str) -> None:
    cache = getattr(seg, "_token_stream", None)
    if isinstance(cache, dict):
        cache.pop(field, None)


def get_token_stream(segment: Segment, field: str, stats) -> Optional[
    TokenStreamPack
]:
    """Cached per-field TokenStreamPack (rebuilt after deletes — keyed
    on the same df-sensitive stats fingerprint as Segment.block_major;
    residency-managed, so a cold field's stream can be evicted)."""
    from fugu_tpu.ops import residency

    if field not in segment.pos_offsets:
        return None
    cache = getattr(segment, "_token_stream", None)
    if not isinstance(cache, dict):
        cache = {}
        object.__setattr__(segment, "_token_stream", cache)
    hit = cache.get(field)
    if hit is not None and hit[0] == stats.fingerprint:
        residency.touch(("tok", id(segment), field))
        return hit[1]
    pack = TokenStreamPack(segment, field, stats)
    if not pack.ok:
        return None
    cache[field] = (stats.fingerprint, pack)
    return pack


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _phrase_kernel(
    offs,        # int32[NB+1] scalar prefetch: chunk offsets per block
    tok_hbm,     # int32[T]    packed (doc_local << 22 | tid) stream
    cv_hbm,      # f32[NB*1024] per-doc BM25 denominator constants
    w_ref,       # bf16[KMAX_b, U, B] per-slot one-hot weights
    tids_ref,    # int32[8, U] union term ordinals (row 0)
    wp_ref,      # f32[8, B]   per-query phrase BM25 weights (row 0)
    out_ref,     # f32[1, FINE_PER_BLOCK, B] per-fine-block score maxima
    *scratch,
    kmax: int,
    u_pad: int,
    interpret: bool,
):
    tok_s, cv_s, sems = scratch
    j = pl.program_id(0)
    c0 = offs[j]
    c1 = offs[j + 1]
    b_pad = wp_ref.shape[-1]

    def tok_dma(ci, slot):
        woff = pl.multiple_of(slot * BM_CHUNK, 1024)
        a = pl.multiple_of(ci * BM_CHUNK, 1024)
        return pltpu.make_async_copy(
            tok_hbm.at[pl.ds(a, BM_CHUNK)],
            tok_s.at[pl.ds(woff, BM_CHUNK)],
            sems.at[slot],
        )

    def cv_dma():
        a = pl.multiple_of(j * 1024, 1024)
        return pltpu.make_async_copy(
            cv_hbm.at[pl.ds(a, 1024)], cv_s.at[...], sems.at[2]
        )

    cv_dma().start()

    @pl.when(c1 > c0)
    def _():
        tok_dma(c0, 0).start()

    d_iota = jax.lax.broadcasted_iota(
        jnp.int32, (BM_CHUNK, BM_BLOCK_DOCS), 1
    )
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (BM_CHUNK, u_pad), 1)
    # anchor-row mask [C, 1]: the last KGAP rows of every chunk replicate
    # at the next chunk's head — masking them here counts each anchor
    # exactly once (so tf IS the oracle's phrase_tf)
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, (BM_CHUNK, 1), 0)
        < BM_CHUNK - KGAP
    )

    def chunk_step(ci, S):
        slot = (ci - c0) % 2
        woff = pl.multiple_of(slot * BM_CHUNK, 1024)

        @pl.when(ci + 1 < c1)
        def _():
            tok_dma(ci + 1, 1 - slot).start()

        tok_dma(ci, slot).wait()

        x = tok_s[pl.ds(woff, BM_CHUNK)]
        tid = jnp.bitwise_and(x, TID_MASK).reshape(BM_CHUNK, 1)
        doc = jax.lax.shift_right_logical(x, TID_BITS).reshape(
            BM_CHUNK, 1
        )
        # one-hot vs union ordinals, plus the ALWAYS-ONE column u_pad-1
        # (dead slots j >= k_q route there so they never veto a match)
        oh = (
            (tid == tids_ref[0:1, :]) | (u_iota == u_pad - 1)
        ).astype(jnp.bfloat16)                            # [C, U]
        m = None
        for jj in range(kmax):
            xj = jax.lax.dot_general(
                oh,
                w_ref[jj],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # [C, B] in {0,1}
            if jj:
                # xj[p] <- xj[p + jj]: wrapped rows land only in the
                # masked tail (jj < KGAP)
                if interpret:
                    xj = jnp.roll(xj, -jj, axis=0)
                else:
                    xj = pltpu.roll(xj, BM_CHUNK - jj, axis=0)
            m = xj if m is None else m * xj
        m = m * row_ok.astype(jnp.float32)
        oh_d = (doc == d_iota).astype(jnp.bfloat16)       # [C, D]
        S = S + jax.lax.dot_general(
            oh_d,
            m.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [D, B]
        return S

    tf = jax.lax.fori_loop(
        c0,
        c1,
        chunk_step,
        jnp.zeros((BM_BLOCK_DOCS, b_pad), jnp.float32),
    )
    cv_dma().wait()
    cv = cv_s[pl.ds(0, BM_BLOCK_DOCS)].reshape(BM_BLOCK_DOCS, 1)
    score = wp_ref[0:1, :] * (tf / (tf + cv))
    res = jnp.where(tf > 0.5, score, NEG_INF)
    out_ref[0, :, :] = res.reshape(
        FINE_PER_BLOCK, BM_FINE_DOCS, b_pad
    ).max(axis=1)


def _phrase_callable(nb_pad, u_pad, b_pad, kmax, interpret):
    kernel = functools.partial(
        _phrase_kernel, kmax=kmax, u_pad=u_pad, interpret=interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kmax, u_pad, b_pad), lambda j, *_: (0, 0, 0)),
            pl.BlockSpec((8, u_pad), lambda j, *_: (0, 0)),
            pl.BlockSpec((8, b_pad), lambda j, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, FINE_PER_BLOCK, b_pad), lambda j, *_: (j, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * BM_CHUNK,), jnp.int32),
            pltpu.VMEM((1024,), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    def call(offs, tok, cv, w, tids, wp):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (nb_pad, FINE_PER_BLOCK, b_pad), jnp.float32
                )
            ],
            interpret=interpret,
        )(offs, tok, cv, w, tids, wp)[0]

    return call


_KERNEL_CACHE: dict = {}


def _get_kernel(nb_pad, u_pad, b_pad, kmax, interpret):
    key = (nb_pad, u_pad, b_pad, kmax, interpret)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = jax.jit(
            _phrase_callable(nb_pad, u_pad, b_pad, kmax, interpret)
        )
    return _KERNEL_CACHE[key]


# --------------------------------------------------------------------------
# staging + host phase B
# --------------------------------------------------------------------------


def eligible_phrase(plan: QueryPlan) -> Optional[PhraseClause]:
    """The plan's phrase when the stream engine can serve it: ONE
    single-phrase SHOULD/MUST group (the quoted-query shape), slop 0,
    <= KMAX terms, default k1/b, positive boost.  Else None."""
    from fugu_tpu.query import B as B_CONST, K1

    if plan.match_all or plan.has_range or plan.has_subplan:
        return None
    if plan.k1 != float(K1) or plan.b != float(B_CONST):
        return None
    if len(plan.groups) != 1:
        return None
    g = plan.groups[0]
    if g.occur is Occur.MUST_NOT or g.clauses or g.ranges:
        return None
    if g.subplan is not None or len(g.phrases) != 1:
        return None
    pc = g.phrases[0]
    if not pc.terms or len(pc.terms) > KMAX:
        return None
    if max(int(getattr(pc, "slop", 0) or 0), 0) != 0:
        return None
    if pc.boost <= 0.0:
        return None
    return pc


def phrase_stream_begin(
    segment: Segment,
    plans: Sequence[QueryPlan],
    stats,
    limits: Sequence[int],
    interpret: Optional[bool] = None,
):
    """Stage and dispatch the phrase batch; returns a handle for
    :func:`phrase_stream_collect`.  ``pre`` (handle[0]) carries results
    resolved without the kernel ([] for absent terms) aligned to
    ``plans``; ``staged`` entries are (plan_index, clause) pairs the
    kernel will answer; non-eligible plans stay None throughout."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    pre: List[Optional[List[Tuple[float, int]]]] = [None] * len(plans)
    staged: List[Tuple[int, PhraseClause]] = []
    by_field: Dict[str, List[int]] = {}
    clauses: Dict[int, PhraseClause] = {}
    for i, plan in enumerate(plans):
        pc = eligible_phrase(plan)
        if pc is None or limits[i] > 128:
            continue
        clauses[i] = pc
        by_field.setdefault(pc.field, []).append(i)

    min_batch = 1 if interpret else PHRASE_MIN_BATCH
    dispatches = []
    for field, idxs in sorted(by_field.items()):
        pack = get_token_stream(segment, field, stats)
        if pack is None:
            continue
        # absent terms can't match anything in this segment
        run = []
        for i in idxs:
            if any(t not in pack.tid_of for t in clauses[i].terms):
                pre[i] = []
            else:
                run.append(i)
        if len(run) < min_batch:
            for i in run:
                del clauses[i]  # host path serves these
            continue
        # split greedily when the union exceeds the largest U bucket
        # (one usable slot is reserved for the ALWAYS-ONE column)
        groups: List[List[int]] = []
        cur: List[int] = []
        cur_terms: set = set()
        for i in run:
            ts = set(clauses[i].terms)
            new = ts - cur_terms
            if cur and (
                len(cur) >= PB_BUCKETS[-1]
                or len(cur_terms) + len(new) > PU_BUCKETS[-1] - 1
            ):
                groups.append(cur)
                cur, cur_terms = [], set()
            cur_terms |= ts
            cur.append(i)
        if cur:
            groups.append(cur)
        for q_idx in groups:
            dispatches.append(
                _dispatch_group(
                    segment, pack, q_idx, clauses, stats, interpret
                )
            )
            for i in q_idx:
                staged.append((i, clauses[i]))
    return (pre, staged, dispatches, segment, stats, list(limits))


def _dispatch_group(segment, pack, q_idx, clauses, stats, interpret):
    """Stage operands and launch kernel + postproc for one group."""
    terms: Dict[str, int] = {}
    kmax_need = 1
    for i in q_idx:
        for t in clauses[i].terms:
            if t not in terms:
                terms[t] = len(terms)
        kmax_need = max(kmax_need, len(clauses[i].terms))
    u_pad = next(u for u in PU_BUCKETS if len(terms) + 1 <= u)
    b_pad = next(b for b in PB_BUCKETS if len(q_idx) <= b)
    kmax = next(k for k in PK_BUCKETS if kmax_need <= k)

    w = np.zeros((kmax, u_pad, b_pad), dtype=np.float32)
    tid_arr = np.full((8, u_pad), -2, dtype=np.int32)
    tid_arr[0, u_pad - 1] = -3  # reserved ALWAYS-ONE slot
    wp = np.zeros((8, b_pad), dtype=np.float32)
    limidx = np.full(b_pad, -1, dtype=np.int32)
    for t, slot in terms.items():
        tid_arr[0, slot] = pack.tid_of[t]
    for qi, i in enumerate(q_idx):
        pc = clauses[i]
        for jj in range(kmax):
            if jj < len(pc.terms):
                w[jj, terms[pc.terms[jj]], qi] = 1.0
            else:
                w[jj, u_pad - 1, qi] = 1.0
        dfs = [stats.doc_freq(pc.field, t) for t in pc.terms]
        wp[0, qi] = float(
            bm25_weight(max(dfs), stats.doc_count, pc.boost)
        )

    fn = _get_kernel(pack.nb_pad, u_pad, b_pad, kmax, interpret)
    amax = fn(
        jnp.asarray(pack.chunk_offs),
        pack.d_tok,
        pack.d_cv,
        jnp.asarray(w, dtype=jnp.bfloat16),
        jnp.asarray(tid_arr),
        jnp.asarray(wp),
    )
    return (q_idx, amax, b_pad)


def phrase_stream_collect(handle):
    """Finish the batch: fetch candidate masks, host-rescore survivors
    with the exact PhraseMatcher.  Returns a list aligned with the
    plans given to begin (None = not served here)."""
    from fugu_tpu.ops.phrase import PhraseMatcher

    pre, staged, dispatches, segment, stats, limits = handle
    results = list(pre)
    if not dispatches:
        return results

    # one postproc per dispatch, one overlapped fetch for all
    posts = []
    for q_idx, amax, b_pad in dispatches:
        nb_pad = amax.shape[0]
        k_top = min(128, nb_pad * FINE_PER_BLOCK)
        limarr = np.full(b_pad, -1, dtype=np.int32)
        for qi, i in enumerate(q_idx):
            if limits[i] <= k_top:
                limarr[qi] = limits[i] - 1
        post = _get_postproc(nb_pad, b_pad)
        posts.append(
            post(
                amax,
                jnp.zeros(b_pad, dtype=jnp.float32),
                jnp.asarray(limarr),
                jnp.zeros(b_pad, dtype=jnp.float32),
            )
        )
    bufs = jax_setup.fetch_np(posts)

    clause_of = dict(staged)
    matchers: Dict[tuple, PhraseMatcher] = {}
    nb = None
    for (q_idx, _a, _b), buf in zip(dispatches, bufs):
        packed, count = buf[:-1], buf[-1]
        nb = (
            max((segment.doc_count + BM_BLOCK_DOCS - 1) // BM_BLOCK_DOCS, 1)
        )
        for qi, i in enumerate(q_idx):
            if count[qi] == 0:
                results[i] = []
                continue
            cand = _unpack_mask(packed[:, qi], nb * FINE_PER_BLOCK)
            results[i] = _rescore_blocks(
                segment, clause_of[i], stats, cand, limits[i], matchers
            )
    return results


def _rescore_blocks(segment, pc, stats, fine_ids, limit, matchers):
    """Exact host top-k restricted to candidate fine blocks — the same
    float sequence as ops/oracle.phrase_postings scoring."""
    key = (pc.field, pc.terms)
    matcher = matchers.get(key)
    if matcher is None:
        matcher = matchers[key] = _matcher(segment, pc)
    if not matcher.ok or len(matcher.common) == 0:
        return []
    # candidate doc ranges -> indices into matcher.common
    lo = fine_ids.astype(np.int64) * BM_FINE_DOCS
    hi = lo + BM_FINE_DOCS
    starts = np.searchsorted(matcher.common, lo)
    ends = np.searchsorted(matcher.common, hi)
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return []
    rep = np.repeat(starts, lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    idx = rep + within
    docs, ptf = matcher.match(idx)
    if len(docs) == 0:
        return []
    w = np.float32(
        bm25_weight(
            max(stats.doc_freq(pc.field, t) for t in pc.terms),
            stats.doc_count,
            pc.boost,
        )
    )
    cache = fieldnorm_cache(stats.avg_fieldnorm(pc.field))
    fids = segment.fieldnorm_ids[pc.field][docs].astype(np.int64)
    ptf_f = ptf.astype(np.float32)
    scores = w * (ptf_f / (ptf_f + cache[fids]))
    order = np.lexsort((docs, -scores))[:limit]
    return [(float(scores[o]), int(docs[o])) for o in order]


def _matcher(segment: Segment, pc: PhraseClause):
    from fugu_tpu.ops.phrase import PhraseMatcher

    return PhraseMatcher(segment, pc)


def batch_phrase_search(
    segment: Segment,
    plans: Sequence[QueryPlan],
    stats,
    limits: Sequence[int],
    interpret: Optional[bool] = None,
) -> List[Optional[List[Tuple[float, int]]]]:
    """Synchronous begin+collect (None entries = caller's host path)."""
    return phrase_stream_collect(
        phrase_stream_begin(segment, plans, stats, limits, interpret)
    )
