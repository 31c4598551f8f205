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
scores — a phrase postprocessor ships each query's top-K fine blocks
SORTED BY BOUND, and the host matches them in that order with
float-safe early termination (block-max pruning with device-exact
bounds), re-checking survivors with the exact PhraseMatcher
(ops/phrase.py) so final scores stay bit-identical to the oracle.  Reference behavior: phrase queries inside Tantivy via
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
    _nb_pad,
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
#: max slop on the device path (r5).  Slop semantics are the oracle's
#: ordered-window relaxation (term k anywhere in [anchor+k, anchor+k+
#: slop]; ops/oracle.py:141) — the kernel ORs each slot's one-hot over
#: its shift window, clamped to 1 per slot, so device phrase_tf stays
#: EXACT for sloppy phrases too.  The forward reach (n_terms-1+slop)
#: must stay <= KGAP: beyond that a roll's wrapped rows land on
#: anchor-ELIGIBLE rows and the doc-gap sentinels no longer block
#: cross-doc adjacency (see eligible_phrase).
MAX_SLOP = 2
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
#: kmax ladder for sloppy dispatches (smax=MAX_SLOP): the wrap/doc-gap
#: constraint is kmax_bucket - 1 + smax <= KGAP, so the top bucket is 7
PK_SLOP_BUCKETS = (2, 4, 7)

#: one stream pays phase-A-like fixed cost (~40ms at 1M docs); below
#: this many staged phrases the host matcher is cheaper
PHRASE_MIN_BATCH = int(os.environ.get("FUGU_PHRASE_MIN_BATCH", "8"))

#: auto-routing threshold: the corpus sweep's fixed cost (~200ms kernel
#: + ~80ms postproc/fetch at 1M docs, b_pad 256) amortizes over the
#: batch, while the host matcher costs ~4-6ms/query on this box — the
#: device wins decisively only on LARGE phrase batches (measured
#: 2026-08-19: 256-batch device 224 QPS vs host 162; 24-batch device 90
#: vs host 110-230).  "auto" (the default) streams a batch at this many
#: phrases unconditionally; smaller batches stream when the df cost
#: model below says the host matcher would be slower.
PHRASE_AUTO_MIN = int(os.environ.get("FUGU_PHRASE_AUTO_MIN", "128"))

#: df cost model for auto routing (calibrated on the 1M bench corpus,
#: 2026-08-19).  The host matcher intersects rarest-first (ops/phrase.py
#: PhraseMatcher), so its cost tracks the SMALLEST constituent df plus
#: the adjacency work on the candidate intersection — NOT the summed
#: posting mass (a head-tail pair with Σdf ~1M finishes in 3 ms while a
#: head-head pair with the same Σdf takes 326 ms).  Measured points
#: (min_df, E[inter]=Πdf/N, ms): (963k, 962k, 326) (414k, 328k, 36.5)
#: (49k, 7.9k, 2.6) (4.2k, 65, 0.3) (134, ~0, 0.02).  Linear fit
#: cost = 44ns·min_df + 55.6ns·inter undershoots the saturated-pair
#: point 3.4x (positions/doc also grow with df), so the inter term
#: carries a (1 + 3·min_df/N) correction — predicts the live-mix
#: 8-phrase batch at 76 ms (measured 94) and the saturated pair at
#: 250 ms (measured 326; routes to stream either way).  The stream
#: engine's sweep is df-INDEPENDENT: measured 168 ms for 8 phrases /
#: 513 ms for 256 at 55M corpus tokens → fixed ~2.0 ns/token staging +
#: sweep, plus ~1.4 ms marginal per phrase (host verify + lane cost).
HOST_NS_PER_MIN_POSTING = float(os.environ.get("FUGU_PHRASE_HOST_NS", "44"))
HOST_NS_PER_INTER_DOC = float(os.environ.get("FUGU_PHRASE_HOST_INTER_NS", "55.6"))
STREAM_NS_PER_TOKEN = float(os.environ.get("FUGU_PHRASE_STREAM_NS", "2.0"))
STREAM_FIXED_MS = float(os.environ.get("FUGU_PHRASE_STREAM_FIXED_MS", "45"))
STREAM_MS_PER_PHRASE = float(os.environ.get("FUGU_PHRASE_STREAM_PER_MS", "1.4"))


def phrase_stream_mode() -> str:
    """'0' (host only) | '1' (stream any batch >= PHRASE_MIN_BATCH) |
    'auto' (cost-model routing, PHRASE_AUTO_MIN forces large batches)."""
    v = os.environ.get("FUGU_PHRASE_STREAM", "auto").strip().lower()
    return v if v in ("0", "1") else "auto"


def estimate_host_ms(plans, stats) -> float:
    """Predicted host-matcher cost: rarest-posting walk + intersection
    adjacency work per phrase (see the calibration note above)."""
    n = max(stats.doc_count, 1)
    total = 0.0
    for p in plans:
        for g in p.groups:
            for pc in g.phrases:
                dfs = [stats.doc_freq(pc.field, t) for t in pc.terms]
                if not dfs or min(dfs) == 0:
                    continue  # dead phrase: host rejects instantly
                min_df = min(dfs)
                inter = 1.0
                for d in dfs:
                    inter *= d
                inter /= float(n) ** (len(dfs) - 1)
                total += min_df * HOST_NS_PER_MIN_POSTING * 1e-6
                # slop multiplies the adjacency work: each later term's
                # anchor set expands (slop+1)x before the intersection
                # (PhraseMatcher.match's np.unique over shifted copies)
                slop_f = 1.0 + max(int(getattr(pc, "slop", 0) or 0), 0)
                total += (
                    inter
                    * slop_f
                    * HOST_NS_PER_INTER_DOC
                    * 1e-6
                    * (1.0 + 3.0 * min_df / n)
                )
    return total


def estimate_stream_ms(stats, n_phrases: int) -> float:
    """Predicted stream cost: the df-independent corpus sweep plus the
    small per-phrase verify/lane cost."""
    toks = sum(stats.total_tokens.values())
    return (
        STREAM_FIXED_MS
        + toks * STREAM_NS_PER_TOKEN * 1e-6
        + n_phrases * STREAM_MS_PER_PHRASE
    )


def _stream_fits_budget(stats) -> bool:
    """False when staging the token-stream pack would blow the HBM
    residency budget past what is already resident.

    Matters at 16M docs on a 16GB chip: the phase-A packs alone are
    ~12.9GB of the 13.6GB auto budget, and the ~4.5GB token pack would
    evict them — every subsequent mixed batch then re-uploads multi-GB
    packs over a 10-35MB/s relay (minutes per batch, vs the ~100ms/
    phrase host cost the eviction was meant to beat).  Auto mode routes
    to the host instead; ``FUGU_PHRASE_STREAM=1`` still forces the
    stream for operators with phrase-dominant workloads.  Token bytes
    already resident (an earlier phrase batch staged them) count as
    free, so a warm phrase-heavy workload keeps streaming.
    """
    from fugu_tpu.index.segment import _pow2_bucket
    from fugu_tpu.ops import residency

    budget = residency.budget_bytes()
    if budget is None:
        return True
    toks = sum(stats.total_tokens.values())
    docs = stats.doc_count
    # stream rows = tokens + per-doc KGAP sentinel gap, chunk-overlap
    # inflated, pow2/16-step bucketed; plus the [nb_pad*1024] cv/fid rows
    rows = (toks + docs * KGAP) * BM_CHUNK // max(BM_CHUNK - KGAP, 1)
    est = _pow2_bucket(max(int(rows), BM_CHUNK)) * 4
    est += _nb_pad(max((docs + BM_BLOCK_DOCS - 1) // BM_BLOCK_DOCS, 1)) * 1024 * 8
    st = residency.stats()
    already = st["by_kind"].get("token_stream", 0)
    needed = max(est - already, 0)
    return st["resident_bytes"] + needed <= budget


def want_stream(
    n_phrases: int, plans=None, stats=None, overlap_ms: float = 0.0
) -> bool:
    """``overlap_ms``: estimated wall time of the DEVICE batch the same
    call dispatches concurrently (0 for a pure phrase batch).  The host
    matcher runs on a worker thread UNDER the device wait (both sides
    release the GIL — engine/named_index), so up to ``overlap_ms`` of
    host phrase work is free, while the stream's sweep ADDS device time
    to the same serial device queue.  Without this credit the 1M mixed
    bench batch streamed its 24 phrases (est. host 215ms > stream
    189ms) and paid the sweep on the critical path where the host
    matcher's 215ms had been hiding under a ~450ms device batch —
    measured same-day 2026-08-20: mixed headline 429 QPS streamed vs
    ~530 host-overlapped.  Callers estimate overlap with
    :func:`estimate_device_batch_ms`."""
    mode = phrase_stream_mode()
    if mode == "0":
        return False
    if mode == "1":
        return n_phrases >= 1  # begin() itself applies PHRASE_MIN_BATCH
    if stats is not None and not _stream_fits_budget(stats):
        return False
    if overlap_ms > 0.0:
        # a concurrent device batch: only the host excess beyond the
        # device wall competes with the stream's serial sweep (applies
        # at ANY batch size — a huge overlapped host budget beats the
        # sweep even above PHRASE_AUTO_MIN).  The credit gates on
        # overlap_ms ALONE: a caller passing overlap without plans/stats
        # must not fall through to the unconditional PHRASE_AUTO_MIN
        # stream — that is exactly the regression the credit prevents
        # (ADVICE r4) — so missing model inputs mean "don't stream".
        if plans is None or stats is None:
            return False
        return (
            n_phrases >= PHRASE_MIN_BATCH
            and estimate_host_ms(plans, stats) - overlap_ms
            > estimate_stream_ms(stats, n_phrases)
        )
    if n_phrases >= PHRASE_AUTO_MIN and (plans is None or stats is None):
        return True  # model inputs missing: large batches favor the sweep
    if n_phrases < PHRASE_MIN_BATCH or plans is None or stats is None:
        return False
    # the cost model decides at ANY batch size when its inputs exist:
    # round 5's off-corpus validation (tools/phrase_cost_validate.py)
    # caught the old >= PHRASE_AUTO_MIN unconditional stream losing 5x
    # on a flat-Zipf corpus whose heavy terms are still cheap for the
    # host matcher (160 phrases: host 30.5ms vs stream 163.6ms) —
    # df-blind batch-size rules don't transfer across df profiles.
    return estimate_host_ms(plans, stats) > estimate_stream_ms(stats, n_phrases)


def estimate_device_batch_ms(
    stats, n_queries: int, token_share: float = 1.0
) -> float:
    """Crude wall-time model of a concurrent two-phase device batch, for
    want_stream's overlap credit.  Phase A sweeps the same corpus the
    phrase stream does with the same cost shape (fixed dispatch floor +
    per-token sweep + per-query staging/wave cost), so the calibrated
    stream constants transfer: at 1M docs/44M postings this predicts a
    256-query mixed batch at ~500ms (round-3 measured 450-530ms).

    ``token_share``: fraction of the index's tokens the concurrent batch
    actually sweeps — multi-segment callers pass the CURRENT segment's
    share, since each segment's device batch sweeps only that segment
    (index-wide stats would overestimate the credit per segment and bias
    phrases onto the host thread, ADVICE r4)."""
    if n_queries <= 0:
        return 0.0
    toks = sum(stats.total_tokens.values()) * min(max(token_share, 0.0), 1.0)
    return (
        STREAM_FIXED_MS
        + toks * STREAM_NS_PER_TOKEN * 1e-6
        + n_queries * STREAM_MS_PER_PHRASE
    )


# --------------------------------------------------------------------------
# pack construction
# --------------------------------------------------------------------------


class _StreamArrays:
    """Host-side token stream of one (segment, field, doc range):
    (pack rows, cv, fid, chunk_offs, nb, nb_pad, tid_of, n_terms, ok).
    Shared by the single-chip TokenStreamPack and the sharded
    per-doc-range builder (parallel/phrase_sharded)."""

    __slots__ = (
        "pack", "cv", "fid", "chunk_offs", "n_blocks", "nb_pad",
        "tid_of", "n_terms", "ok",
    )


def build_stream_arrays(
    segment: Segment,
    field: str,
    stats,
    doc_lo: int = 0,
    doc_hi: Optional[int] = None,
    nb_pad: Optional[int] = None,
) -> _StreamArrays:
    """Build the forward token stream for docs in [doc_lo, doc_hi) with
    LOCAL doc ids (doc - doc_lo) — doc_lo=0/doc_hi=None is the whole
    segment.  Term ordinals are segment-global per field, so a sharded
    caller's weight matrices stay replicated across shards."""
    out = _StreamArrays()
    offs = segment.pos_offsets[field]
    data = segment.pos_data[field]
    base = segment.field_entry_base[field]
    n_ent = len(offs) - 1
    e_docs = segment.e_doc[base : base + n_ent].astype(np.int64)
    if doc_hi is None:
        doc_hi = segment.doc_count
    doc_count = doc_hi - doc_lo
    nb = max((doc_count + BM_BLOCK_DOCS - 1) // BM_BLOCK_DOCS, 1)
    out.n_blocks = nb
    out.nb_pad = nb_pad if nb_pad is not None else _nb_pad(nb)
    assert out.nb_pad >= nb

    # per-field term ordinals (the kernel's tid space)
    tmap = segment.terms[field]
    out.tid_of = {}
    tid_entry = np.zeros(max(n_ent, 1), dtype=np.int64)
    for j, (term, info) in enumerate(tmap.items()):
        out.tid_of[term] = j
        lo = info.start - base
        tid_entry[lo : lo + info.doc_freq] = j
    out.n_terms = len(tmap)
    out.ok = out.n_terms < TID_MASK  # tid 2^22-1 is the sentinel
    if not out.ok:
        return out

    # stream geometry: each LOCAL doc owns rows [row0[d], row0[d] +
    # maxpos[d] + 1 + KGAP); docs with no tokens in the field (or
    # tombstoned, or outside the range) own nothing
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    maxpos = np.full(doc_count, -1, dtype=np.int64)
    in_range = (e_docs >= doc_lo) & (e_docs < doc_hi)
    local_e = e_docs - doc_lo
    if n_ent:
        last = data[np.maximum(offs[1:] - 1, 0)].astype(np.int64)
        last = np.where(lens > 0, last, -1)
        np.maximum.at(
            maxpos, np.where(in_range, local_e, 0), np.where(in_range, last, -1)
        )
    live = ~segment.tombstones[doc_lo:doc_hi]
    has = (maxpos >= 0) & live
    dlen = np.where(has, maxpos + 1 + KGAP, 0)
    row0 = np.zeros(doc_count + 1, dtype=np.int64)
    np.cumsum(dlen, out=row0[1:])
    total_raw = int(row0[-1])

    raw = np.full(max(total_raw, 1), SENT_ROW, dtype=np.int32)
    if n_ent and total_raw:
        keep_e = in_range & has[np.where(in_range, local_e, 0)]
        rep_docs = np.repeat(local_e, lens * keep_e)
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
    chunk_offs = np.zeros(out.nb_pad + 1, dtype=np.int32)
    np.cumsum(n_chunks, out=chunk_offs[1 : nb + 1])
    chunk_offs[nb + 1 :] = chunk_offs[nb]
    out.chunk_offs = chunk_offs
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
    fids = segment.fieldnorm_ids[field][doc_lo:doc_hi].astype(np.int64)
    cv = np.zeros(out.nb_pad * 1024, dtype=np.float32)
    didx = np.arange(doc_count, dtype=np.int64)
    cv[(didx // BM_BLOCK_DOCS) * 1024 + didx % BM_BLOCK_DOCS] = cache[
        fids
    ]
    # padded/empty doc slots keep cv=0; their tf is always 0, and the
    # tf > 0.5 gate excludes them before the 0/0 division could matter
    cv[cv == 0.0] = np.float32(1.0)
    # per-doc fieldnorm ids, same layout: the kernel packs each
    # block-max doc's exact INTEGER (tf, fid) class alongside the
    # f32 maxima, so the host can recompute bit-exact bounds with
    # its own float arithmetic (margin-free pruning)
    fid_arr = np.zeros(out.nb_pad * 1024, dtype=np.int32)
    fid_arr[(didx // BM_BLOCK_DOCS) * 1024 + didx % BM_BLOCK_DOCS] = fids
    out.pack = pack
    out.cv = cv
    out.fid = fid_arr
    return out


class TokenStreamPack:
    """Forward token stream of one (segment, field), block-major and
    chunk-overlapped for the phrase kernel (see module docstring)."""

    def __init__(self, segment: Segment, field: str, stats):
        arrs = build_stream_arrays(segment, field, stats)
        self.n_blocks = arrs.n_blocks
        self.nb_pad = arrs.nb_pad
        self.tid_of = arrs.tid_of
        self.n_terms = arrs.n_terms
        self.ok = arrs.ok
        if not self.ok:
            return
        self.chunk_offs = arrs.chunk_offs

        from fugu_tpu.ops import residency

        residency.reserve(
            ("tok", id(segment), field),
            arrs.pack.nbytes + arrs.cv.nbytes + arrs.fid.nbytes,
            segment,
            functools.partial(_evict_token_stream, field=field),
            kind="token_stream",
        )
        self.d_tok = jnp.asarray(arrs.pack)
        self.d_cv = jnp.asarray(arrs.cv)
        self.d_fid = jnp.asarray(arrs.fid)
        self.hbm_bytes = arrs.pack.nbytes + arrs.cv.nbytes + arrs.fid.nbytes


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
    # same reserve()->cache window as Segment.device_pack: a concurrent
    # reserve may have evicted this key in between — don't re-cache an
    # unaccounted pack (the local reference stays valid for this call)
    if not residency.contains(("tok", id(segment), field)):
        cache.pop(field, None)
    return pack


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _phrase_kernel(
    offs,        # int32[NB+1] scalar prefetch: chunk offsets per block
    tok_hbm,     # int32[T]    packed (doc_local << 22 | tid) stream
    cv_hbm,      # f32[NB*1024] per-doc BM25 denominator constants
    fid_hbm,     # int32[NB*1024] per-doc fieldnorm ids
    w_ref,       # bf16[KMAX_b*(smax+1)*U, B] per-(slot, shift) weights
    tids_ref,    # int32[8, U] union term ordinals (row 0)
    wp_ref,      # f32[8, B]   per-query phrase BM25 weights (row 0)
    out_ref,     # f32[1, FINE_PER_BLOCK, B] per-fine-block score maxima
    cls_ref,     # i32[1, FINE_PER_BLOCK, B] (tf<<8 | 255-fid) of argmax
    *scratch,
    kmax: int,
    u_pad: int,
    smax: int,
    interpret: bool,
):
    tok_s, cv_s, fid_s, sems = scratch
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

    def fid_dma():
        a = pl.multiple_of(j * 1024, 1024)
        return pltpu.make_async_copy(
            fid_hbm.at[pl.ds(a, 1024)], fid_s.at[...], sems.at[3]
        )

    cv_dma().start()
    fid_dma().start()

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

        # slot-count formulation (the first cut's per-slot [C, B] f32
        # rolls + product chain were ~60GB of VPU traffic per sweep and
        # scaled superlinearly with lanes — measured 5.7s for a 256-lane
        # 1M-doc sweep): shift the PACKED TOKEN COLUMN [C, 1] instead
        # (8KB per roll, 256x less traffic; wrapped rows only reach
        # masked anchors), one-hot each shifted view against the union,
        # matmul against that slot's weight plane, and SUM — an anchor
        # matches query q iff all kmax planes contribute 1 (dead slots
        # ride the ALWAYS-ONE column), i.e. s == kmax.
        x0 = tok_s[pl.ds(woff, BM_CHUNK)].reshape(BM_CHUNK, 1)
        doc = jax.lax.shift_right_logical(x0, TID_BITS)   # [C, 1]

        def shifted_onehot(d):
            if d == 0:
                xs = x0
            elif interpret:
                xs = jnp.roll(x0, -d, axis=0)
            else:
                xs = pltpu.roll(x0, BM_CHUNK - d, axis=0)
            tid = jnp.bitwise_and(xs, TID_MASK)           # [C, 1]
            return (
                (tid == tids_ref[0:1, :]) | (u_iota == u_pad - 1)
            ).astype(jnp.bfloat16)                        # [C, U]

        s = None
        for jj in range(kmax):
            # slot jj matches iff ANY shift in its window [jj, jj+slop_q]
            # hits its term — the per-(slot, shift) weight plane carries
            # slop_q (plane (jj, ss) is zero for ss > slop_q; slot 0 and
            # dead slots use only ss=0), and the min(y, 1) clamp turns
            # the shift-count into the OR the oracle's ordered-window
            # semantics need.  smax == 0 emits EXACTLY the round-4
            # program (no clamp, one plane per slot) so the warm slop-0
            # compile cache stays valid.
            y = None
            for ss in range(smax + 1):
                oh = shifted_onehot(jj + ss)
                plane = (jj * (smax + 1) + ss) * u_pad
                xj = jax.lax.dot_general(
                    oh,
                    w_ref[pl.ds(plane, u_pad)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                         # [C, B]
                y = xj if y is None else y + xj
            if smax:
                y = jnp.minimum(y, 1.0)
            s = y if s is None else s + y
        m = jnp.where(
            (s > kmax - 0.5) & row_ok, 1.0, 0.0
        )                                                 # [C, B]
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
    fid_dma().wait()
    cv = cv_s[pl.ds(0, BM_BLOCK_DOCS)].reshape(BM_BLOCK_DOCS, 1)
    fid = fid_s[pl.ds(0, BM_BLOCK_DOCS)].reshape(BM_BLOCK_DOCS, 1)
    score = wp_ref[0:1, :] * (tf / (tf + cv))
    matched = tf > 0.5
    res = jnp.where(matched, score, NEG_INF)
    resh = res.reshape(FINE_PER_BLOCK, BM_FINE_DOCS, b_pad)
    fmax = resh.max(axis=1)
    out_ref[0, :, :] = fmax
    # exact INTEGER class (tf << 8 | 255 - fid) of each fine slice's
    # score-argmax doc: the host recomputes the bound from (tf, fid)
    # with its own f32 arithmetic, so pruning needs no rounding margin.
    # Ties pick the largest class int; distinct classes tie in device
    # f32 only within a few ulp of each other — covered by the host's
    # 1e-5 guard band (see _rescore_blocks)
    cls = jnp.where(
        matched,
        tf.astype(jnp.int32) * 256 + (255 - fid),
        -1,
    ).reshape(FINE_PER_BLOCK, BM_FINE_DOCS, b_pad)
    is_max = resh >= fmax[:, None, :]
    cls_ref[0, :, :] = jnp.where(is_max, cls, -1).max(axis=1)


def _phrase_callable(nb_pad, u_pad, b_pad, kmax, smax, interpret):
    kernel = functools.partial(
        _phrase_kernel, kmax=kmax, u_pad=u_pad, smax=smax, interpret=interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (kmax * (smax + 1) * u_pad, b_pad), lambda j, *_: (0, 0)
            ),
            pl.BlockSpec((8, u_pad), lambda j, *_: (0, 0)),
            pl.BlockSpec((8, b_pad), lambda j, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, FINE_PER_BLOCK, b_pad), lambda j, *_: (j, 0, 0)
            ),
            pl.BlockSpec(
                (1, FINE_PER_BLOCK, b_pad), lambda j, *_: (j, 0, 0)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * BM_CHUNK,), jnp.int32),
            pltpu.VMEM((1024,), jnp.float32),
            pltpu.VMEM((1024,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    def call(offs, tok, cv, fid, w, tids, wp):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (nb_pad, FINE_PER_BLOCK, b_pad), jnp.float32
                ),
                jax.ShapeDtypeStruct(
                    (nb_pad, FINE_PER_BLOCK, b_pad), jnp.int32
                ),
            ],
            interpret=interpret,
        )(offs, tok, cv, fid, w, tids, wp)

    return call


_KERNEL_CACHE: dict = {}


def _get_kernel(nb_pad, u_pad, b_pad, kmax, smax, interpret):
    key = (nb_pad, u_pad, b_pad, kmax, smax, interpret)
    if key not in _KERNEL_CACHE:
        _KERNEL_CACHE[key] = jax.jit(
            _phrase_callable(nb_pad, u_pad, b_pad, kmax, smax, interpret)
        )
    return _KERNEL_CACHE[key]


# --------------------------------------------------------------------------
# staging + host phase B
# --------------------------------------------------------------------------


def eligible_clause(pc: PhraseClause) -> bool:
    """Whether one phrase clause fits the stream kernel: <= KMAX terms,
    slop <= MAX_SLOP, positive boost, and forward reach (n_terms - 1 +
    slop) <= KGAP — beyond KGAP a roll's wrapped rows land on
    anchor-eligible rows and the inter-doc sentinel gap no longer
    blocks cross-doc adjacency.  Sloppy dispatches additionally cap the
    kmax bucket at KGAP + 1 - MAX_SLOP (= 7 terms at slop > 0)."""
    if not pc.terms or len(pc.terms) > KMAX:
        return False
    slop = max(int(getattr(pc, "slop", 0) or 0), 0)
    if slop > MAX_SLOP:
        return False
    if slop and len(pc.terms) > KGAP + 1 - MAX_SLOP:
        return False
    if len(pc.terms) - 1 + slop > KGAP:
        return False
    if pc.boost <= 0.0:
        return False
    return True


def eligible_phrase(plan: QueryPlan) -> Optional[PhraseClause]:
    """The plan's phrase when the stream engine can serve it: ONE
    single-phrase SHOULD/MUST group (the quoted-query shape), slop <=
    MAX_SLOP (r5 — was slop 0), <= KMAX terms, default k1/b, positive
    boost.  Else None."""
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
    if not eligible_clause(pc):
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
        for q_idx, smax in split_dispatch_groups(run, clauses):
            dispatches.append(
                _dispatch_group(
                    segment, pack, q_idx, clauses, stats, interpret,
                    smax,
                )
            )
            for i in q_idx:
                staged.append((i, clauses[i]))
    return (pre, staged, dispatches, segment, stats, list(limits))


def _clause_slop(pc: PhraseClause) -> int:
    return max(int(getattr(pc, "slop", 0) or 0), 0)


def split_dispatch_groups(run, clauses) -> List[Tuple[List[int], int]]:
    """[(q_idx, smax)] dispatch groups for ``run`` (eligible plan
    indices, in order) — shared by the single-chip and sharded begins.

    slop-0 and sloppy queries dispatch separately: the sloppy program
    (smax=MAX_SLOP) pays (slop+1)x one-hot/matmul work per slot and
    compiles a different signature — keeping slop-0 batches on the
    round-4 program preserves both its speed and its warm compile
    cache.  Each sub-run pays its own sweep; a mixed batch therefore
    costs up to two sweeps (measured tradeoff vs 3x-ing the common
    slop-0 case: slop-0 wins).  Within a sub-run, split greedily when
    the union exceeds the largest U bucket (one usable slot is reserved
    for the ALWAYS-ONE column)."""
    out: List[Tuple[List[int], int]] = []
    subruns = [
        ([i for i in run if not _clause_slop(clauses[i])], 0),
        ([i for i in run if _clause_slop(clauses[i])], MAX_SLOP),
    ]
    for sub, smax in subruns:
        groups: List[List[int]] = []
        cur: List[int] = []
        cur_terms: set = set()
        for i in sub:
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
        out.extend((g, smax) for g in groups)
    return out


def stage_group_weights(tid_of, q_idx, clauses, stats, smax):
    """(w, tid_arr, wp, u_pad, b_pad, kmax) kernel operands for one
    dispatch group — shared by the single-chip and sharded launchers
    (term ordinals are segment-global per field, so the sharded path
    replicates these across shards verbatim)."""
    terms: Dict[str, int] = {}
    kmax_need = 1
    for i in q_idx:
        for t in clauses[i].terms:
            if t not in terms:
                terms[t] = len(terms)
        kmax_need = max(kmax_need, len(clauses[i].terms))
    u_pad = next(u for u in PU_BUCKETS if len(terms) + 1 <= u)
    b_pad = next(b for b in PB_BUCKETS if len(q_idx) <= b)
    kb = PK_SLOP_BUCKETS if smax else PK_BUCKETS
    kmax = next(k for k in kb if kmax_need <= k)

    # flattened [kmax * (smax+1) * u_pad, b_pad]: plane (jj, ss) lives at
    # rows [(jj*(smax+1)+ss) * u_pad, ...) and carries slot jj's one-hot
    # weights for shift jj+ss.  Slot 0 anchors exactly (ss=0 only — the
    # oracle's anchor IS term 0's position); slot jj >= 1 fills planes
    # ss <= slop_q; dead slots ride the ALWAYS-ONE column on ss=0.
    w = np.zeros((kmax * (smax + 1) * u_pad, b_pad), dtype=np.float32)
    tid_arr = np.full((8, u_pad), -2, dtype=np.int32)
    tid_arr[0, u_pad - 1] = -3  # reserved ALWAYS-ONE slot
    wp = np.zeros((8, b_pad), dtype=np.float32)
    for t, slot in terms.items():
        tid_arr[0, slot] = tid_of[t]
    for qi, i in enumerate(q_idx):
        pc = clauses[i]
        slop_q = min(_clause_slop(pc), smax)
        for jj in range(kmax):
            base_row = jj * (smax + 1) * u_pad
            if jj < len(pc.terms):
                n_shift = 1 if jj == 0 else slop_q + 1
                for ss in range(n_shift):
                    w[base_row + ss * u_pad + terms[pc.terms[jj]], qi] = 1.0
            else:
                w[base_row + u_pad - 1, qi] = 1.0
        dfs = [stats.doc_freq(pc.field, t) for t in pc.terms]
        wp[0, qi] = float(
            bm25_weight(max(dfs), stats.doc_count, pc.boost)
        )
    return w, tid_arr, wp, u_pad, b_pad, kmax


def _dispatch_group(segment, pack, q_idx, clauses, stats, interpret, smax=0):
    """Stage operands and launch kernel + postproc for one group."""
    w, tid_arr, wp, u_pad, b_pad, kmax = stage_group_weights(
        pack.tid_of, q_idx, clauses, stats, smax
    )
    fn = _get_kernel(pack.nb_pad, u_pad, b_pad, kmax, smax, interpret)
    amax, acls = fn(
        jnp.asarray(pack.chunk_offs),
        pack.d_tok,
        pack.d_cv,
        pack.d_fid,
        jnp.asarray(w, dtype=jnp.bfloat16),
        jnp.asarray(tid_arr),
        jnp.asarray(wp),
    )
    return (q_idx, (amax, acls), b_pad)


#: fine blocks whose (value, class, id) the phrase postprocessor ships
#: per query, sorted by bound descending.  64 covers limit<=10 scans by
#: a wide margin (ties terminate via the doc-id rule after ~limit hits)
#: while keeping the fetched buffer small — 256 was measured spending
#: 262ms of a 785ms batch just crossing the relay.  Queries whose scan
#: is inconclusive within the shipped blocks fall back to a
#: full-common match (correct, rare).
PHRASE_TOPK = 64

_PHRASE_POST_CACHE: dict = {}


def _get_phrase_post(nb_pad: int, b_pad: int):
    """Device postproc for phrase dispatches: per query the top-K fine
    blocks by maxima (achievable scores!), their EXACT integer
    (tf, fid) classes, ids, and the finite count — the host recomputes
    each block's bound bit-exactly from the class with its own float
    arithmetic and scans in bound order with margin-free termination.

    The first cut shipped phase A's kth-thresholded MASK here; for
    near-tied phrase scores (tf=1 everywhere) the threshold kept nearly
    every matching block and the host re-matched them all with no order
    to stop in — measured 773ms of PhraseMatcher.match against 116ms of
    kernel for a 24-phrase 1M-doc batch."""
    key = (nb_pad, b_pad)
    fn = _PHRASE_POST_CACHE.get(key)
    if fn is not None:
        return fn
    nb2 = nb_pad * FINE_PER_BLOCK
    k = min(PHRASE_TOPK, nb2)

    @jax.jit
    def post(amax, acls):
        col = amax.reshape(nb2, -1).T                   # [B, NB*F]
        ccol = acls.reshape(nb2, -1).T                  # [B, NB*F] i32
        finite = jnp.isfinite(col)
        count = jnp.sum(finite.astype(jnp.int32), axis=1)   # [B]
        vals, idx = jax.lax.top_k(col, k)               # [B, k] desc
        cls = jnp.take_along_axis(ccol, idx, axis=1)
        # one buffer, one relay round trip: [B, 3k+1] f32 (ids < 2^24
        # and classes < 2^24 stay f32-exact)
        return jnp.concatenate(
            [
                vals,
                idx.astype(jnp.float32),
                cls.astype(jnp.float32),
                count[:, None].astype(jnp.float32),
            ],
            axis=1,
        )

    _PHRASE_POST_CACHE[key] = post
    return post


def phrase_stream_collect(handle):
    """Finish the batch: fetch per-query ordered block bounds, then
    host-match in bound order with early termination.  Returns a list
    aligned with the plans given to begin (None = not served here)."""
    from fugu_tpu.ops.phrase import PhraseMatcher

    pre, staged, dispatches, segment, stats, limits = handle
    results = list(pre)
    if not dispatches:
        return results

    posts = [
        _get_phrase_post(arrs[0].shape[0], b_pad)(*arrs)
        for _q, arrs, b_pad in dispatches
    ]
    bufs = jax_setup.fetch_np(posts)

    clause_of = dict(staged)
    nb = max((segment.doc_count + BM_BLOCK_DOCS - 1) // BM_BLOCK_DOCS, 1)
    nb2 = nb * FINE_PER_BLOCK
    for (q_idx, _a, _b), buf in zip(dispatches, bufs):
        k = (buf.shape[1] - 1) // 3
        for qi, i in enumerate(q_idx):
            row = buf[qi]
            count = int(row[-1])
            if count == 0:
                results[i] = []
                continue
            ids = row[k : 2 * k].astype(np.int64)
            cls = row[2 * k : 3 * k].astype(np.int64)
            take = min(count, k)
            # padded-block entries (id >= nb2) carry NEG_INF and sort
            # after every finite bound; trim alongside the finite count
            keep = ids[:take] < nb2
            results[i] = _rescore_blocks(
                segment,
                clause_of[i],
                stats,
                ids[:take][keep],
                cls[:take][keep],
                count > k,
                limits[i],
            )
    return results


#: relative guard band for device-argmax class flips: the kernel picks
#: each block's class by device-f32 score, whose rounding differs from
#: the host's by a few ulp (~1e-7 rel) — any block whose exact bound
#: sits within this band of the kth must be visited (or trigger the
#: fallback), making the pruning airtight without a bf16-sized margin
_CLS_GUARD = 1e-6


def _rescore_blocks(
    segment, pc, stats, fine_ids, classes, truncated, limit,
    lo_table=None, hi_table=None,
):
    """Exact host top-k over candidate fine blocks in descending-bound
    order with margin-free early termination.

    ``lo_table``/``hi_table`` (optional): per-fine-id doc windows for
    callers whose id space is not the plain ``id * BM_FINE_DOCS``
    layout — the sharded engine maps global padded fine ids onto
    per-shard doc ranges (clamped at shard bounds so windows never
    overlap a neighbour shard's block 0).  Tables must be monotone
    non-decreasing in id (id order == doc order), which the shard
    layout guarantees.

    ``classes`` are the kernel's per-block INTEGER (tf << 8 | 255-fid)
    classes of the score-argmax doc; the host recomputes each bound
    with the same np.float32 expression as final scoring, so
    bound-vs-kth comparisons are exact.  Ties (bound == kth) use the
    doc-id rule: blocks are doc-ranges in id order, so a tied block
    whose range starts at or past the current limit-th holder's doc id
    cannot displace it (doc-ascending tie-break).  Candidate matching
    runs through ops/phrase.match_ranges — windowed posting lookups,
    no full intersection — so host work scales with limit, not df."""
    from fugu_tpu.ops.phrase import match_ranges

    if len(fine_ids) == 0:
        return []
    dfs = [stats.doc_freq(pc.field, t) for t in pc.terms]
    if max(dfs) == 0:
        return []
    w = np.float32(bm25_weight(max(dfs), stats.doc_count, pc.boost))
    cache = fieldnorm_cache(stats.avg_fieldnorm(pc.field))
    fid_all = segment.fieldnorm_ids[pc.field]

    tf_c = (classes >> 8).astype(np.float32)
    fid_c = (255 - (classes & 255)).astype(np.int64)
    bounds = (w * (tf_c / (tf_c + cache[fid_c]))).astype(np.float32)

    order = np.lexsort((fine_ids, -bounds))
    ids_o = fine_ids[order]
    bnd_o = bounds[order]

    def lo_of(ids):
        if lo_table is None:
            return ids * BM_FINE_DOCS
        return lo_table[ids]

    def hi_of(ids):
        if hi_table is None:
            return ids * BM_FINE_DOCS + BM_FINE_DOCS
        return hi_table[ids]

    hits_docs: List[np.ndarray] = []
    hits_scores: List[np.ndarray] = []
    n_hits = 0
    kth = None        # limit-th best score so far
    worst_doc = None  # its doc id (ties displace only below this)

    remaining = np.arange(len(ids_o))
    group = 8
    while len(remaining):
        if kth is not None:
            b = bnd_o[remaining]
            keep = (
                (b > kth)
                | ((b == kth) & (lo_of(ids_o[remaining]) < worst_doc))
                | ((b < kth) & (kth - b <= abs(kth) * _CLS_GUARD))
            )
            remaining = remaining[keep]
            if not len(remaining):
                break
        chunk, remaining = remaining[:group], remaining[group:]
        sel = np.sort(ids_o[chunk])
        docs, ptf = match_ranges(segment, pc, lo_of(sel), hi_of(sel))
        if len(docs):
            ptf_f = ptf.astype(np.float32)
            fids = fid_all[docs].astype(np.int64)
            scores = w * (ptf_f / (ptf_f + cache[fids]))
            hits_docs.append(docs.astype(np.int64))
            hits_scores.append(scores)
            n_hits += len(docs)
            if n_hits >= limit:
                alls = np.concatenate(hits_scores)
                alld = np.concatenate(hits_docs)
                top = np.lexsort((alld, -alls))[:limit]
                kth = float(alls[top[-1]])
                worst_doc = int(alld[top[-1]])
        group = min(group * 4, 1024)

    need_fallback = truncated
    if need_fallback and kth is not None and len(bnd_o):
        b_min = float(bnd_o[-1])
        if b_min < kth - abs(kth) * _CLS_GUARD:
            # every unshipped block's true bound sits below kth with
            # margin to spare (device ordering is within ~1e-7)
            need_fallback = False
        elif b_min == kth and worst_doc is not None:
            # unshipped ties: same-class blocks share the same device
            # value, and top_k keeps the lowest ids, so every unshipped
            # tied block starts past the shipped ones — skippable iff
            # even the next id couldn't reach worst_doc AND no OTHER
            # class collides with kth (a colliding class's blocks may
            # order differently in device f32)
            tied = ids_o[bnd_o == b_min]
            next_id = int(tied.max()) + 1
            if lo_table is None:
                next_lo = next_id * BM_FINE_DOCS
            elif next_id < len(lo_table):
                next_lo = int(lo_table[next_id])
            else:
                next_lo = segment.doc_count
            if next_lo >= worst_doc and not _class_collides(kth, w, cache):
                need_fallback = False

    if need_fallback:
        # exact, slow path: match the full intersection
        from fugu_tpu.ops.phrase import PhraseMatcher

        matcher = PhraseMatcher(segment, pc)
        if not matcher.ok or len(matcher.common) == 0:
            return []
        docs, ptf = matcher.match(
            np.arange(len(matcher.common), dtype=np.int64)
        )
        if len(docs) == 0:
            return []
        ptf_f = ptf.astype(np.float32)
        fids = fid_all[docs].astype(np.int64)
        scores = w * (ptf_f / (ptf_f + cache[fids]))
        order2 = np.lexsort((docs, -scores))[:limit]
        return [(float(scores[o]), int(docs[o])) for o in order2]

    if not hits_docs:
        return []
    docs = np.concatenate(hits_docs)
    scores = np.concatenate(hits_scores)
    order2 = np.lexsort((docs, -scores))[:limit]
    return [(float(scores[o]), int(docs[o])) for o in order2]


def _class_collides(kth: float, w, cache) -> bool:
    """True when MORE THAN ONE (tf, fid) class scores exactly ``kth``
    — then device-f32 ordering between the colliding classes is not
    guaranteed to match the host tie order and the unshipped-ties skip
    is unsafe.  Per fid, the candidate tf solves kth = w*tf/(tf+cv)
    analytically; only its integer neighbours can produce the exact f32
    value, so the check is ~256 x 4 score evaluations."""
    w64 = float(np.float32(w))
    if not (0.0 < kth < w64):
        return True  # degenerate; be conservative
    cv = cache.astype(np.float64)
    t_est = kth * cv / (w64 - kth)
    hits = 0
    for delta in (-1.0, 0.0, 1.0, 2.0):
        tf = np.floor(t_est) + delta
        ok = tf >= 1.0
        tf32 = tf.astype(np.float32)
        sc = np.float32(w) * (tf32 / (tf32 + cache))
        hits += int(((sc == np.float32(kth)) & ok).sum())
        if hits > 1:
            return True
    return hits > 1


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
