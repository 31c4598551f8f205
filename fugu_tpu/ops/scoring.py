"""The device query engine: BM25 + boolean algebra + top-k, all under jit.

This replaces the hot loop inside Tantivy's ``searcher.search`` — the
per-segment postings traversal, BM25 scoring and heap top-k
(`/root/reference/src/db/search.rs:153-162`, SURVEY.md §3.3) — with a
fully vectorized, TPU-friendly pipeline:

1. **Window gather** — each clause's postings are a contiguous range of the
   segment's entry pack; ``dynamic_slice`` windows (bucket-padded) read
   them without host round-trips.
2. **BM25 contribution** — ``w_t * tf / (tf + c1_t + c2_t * decode(fid))``
   with the Lucene-SmallFloat fieldnorm decode done arithmetically on the
   VPU (no table gather).  Facet filter clauses use c2=0 so they score a
   constant idf — filter fusion without a separate bitset pass.
3. **Concat + sort by doc id** — clause windows are packed tightly via
   forward overlapping ``dynamic_update_slice`` writes, then sorted.
4. **Segmented reduce** — one ``associative_scan`` computes, per doc run,
   the score sum and the OR of clause-group bit masks (boolean algebra:
   MUST/ MUST_NOT / SHOULD evaluated from a 32-bit group mask).
5. **Tombstone mask + top-k** — run-end entries are scored, dead docs and
   failed boolean constraints get -inf, and ``lax.top_k`` selects.

Ties: runs are emitted in ascending doc order and ``lax.top_k`` keeps the
earliest index on equal scores, so ordering is score desc then doc asc —
the deterministic tiebreak we define for parity (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fugu_tpu.index.segment import DOC_SENTINEL, FACET_FIELD_KEY, Segment
from fugu_tpu.ops import buckets
from fugu_tpu.query import (
    B,
    K1,
    Occur,
    QueryPlan,
    bm25_weight,
    idf,
)

NEG_INF = np.float32(-np.inf)


def _decode_fid(fid):
    """Branch-free Lucene SmallFloat 4-bit decode (see fugu_tpu.fieldnorm)."""
    j = fid - 24
    bits = j & 0x07
    shift = (j >> 3) - 1
    f4 = jnp.where(shift < 0, bits, (bits | 0x08) << jnp.maximum(shift, 0))
    return jnp.where(fid < 24, fid, 24 + f4)


class ClauseArgs(NamedTuple):
    """Per-clause device operands (host-staged numpy, padded to T)."""

    starts: np.ndarray   # int32[T] offset into the entry pack
    lens: np.ndarray     # int32[T] posting length (0 = inactive)
    weights: np.ndarray  # float32[T] idf*(k1+1)*boost
    c1: np.ndarray       # float32[T] k1*(1-b)    (facet clauses: k1)
    c2: np.ndarray       # float32[T] k1*b/avg    (facet clauses: 0)
    gbits: np.ndarray    # uint32[T] 1 << group_id


@functools.partial(
    jax.jit,
    static_argnames=("t_pad", "l_pad", "e_pad", "k", "need_bits", "single_clause"),
)
def segment_topk(
    e_doc: jax.Array,
    e_tf: jax.Array,
    e_fid: jax.Array,
    tomb_words: jax.Array,
    starts: jax.Array,
    lens: jax.Array,
    weights: jax.Array,
    c1: jax.Array,
    c2: jax.Array,
    gbits: jax.Array,
    must_mask: jax.Array,      # uint32 scalar
    mustnot_mask: jax.Array,   # uint32 scalar
    should_mask: jax.Array,    # uint32 scalar
    *,
    t_pad: int,
    l_pad: int,
    e_pad: int,
    k: int,
    need_bits: bool,
    single_clause: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k (scores, local doc ids) for one query over one segment."""
    lane = jnp.arange(l_pad, dtype=jnp.int32)

    def clause_window(t: int):
        s = starts[t]
        docs = jax.lax.dynamic_slice(e_doc, (s,), (l_pad,))
        tfs = jax.lax.dynamic_slice(e_tf, (s,), (l_pad,))
        fids = jax.lax.dynamic_slice(e_fid, (s,), (l_pad,))
        valid = lane < lens[t]
        tff = tfs.astype(jnp.float32)
        denom = tff + c1[t] + c2[t] * _decode_fid(fids).astype(jnp.float32)
        contrib = jnp.where(valid, weights[t] * tff / denom, 0.0)
        docs = jnp.where(valid, docs, jnp.int32(DOC_SENTINEL))
        bits = jnp.where(valid, gbits[t], jnp.uint32(0))
        return docs, contrib, bits

    if single_clause:
        # One clause: postings are already unique + sorted by doc.
        doc, score, _ = clause_window(0)
        ok = doc != jnp.int32(DOC_SENTINEL)
        word = tomb_words[jnp.clip(doc >> 5, 0, tomb_words.shape[0] - 1)]
        dead = (word >> (doc & 31).astype(jnp.uint32)) & 1
        ok &= dead == 0
        score = jnp.where(ok, score, NEG_INF)
        kk = min(k, l_pad)
        top_scores, idx = jax.lax.top_k(score, kk)
        return top_scores, doc[idx]

    # Pack clause windows tightly: forward overlapping writes — clause t+1's
    # real data overwrites clause t's sentinel tail.
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(lens)])
    doc_buf = jnp.full(e_pad + l_pad, DOC_SENTINEL, dtype=jnp.int32)
    con_buf = jnp.zeros(e_pad + l_pad, dtype=jnp.float32)
    bit_buf = jnp.zeros(e_pad + l_pad, dtype=jnp.uint32)
    for t in range(t_pad):
        d, c, bts = clause_window(t)
        doc_buf = jax.lax.dynamic_update_slice(doc_buf, d, (cum[t],))
        con_buf = jax.lax.dynamic_update_slice(con_buf, c, (cum[t],))
        bit_buf = jax.lax.dynamic_update_slice(bit_buf, bts, (cum[t],))

    doc_buf = doc_buf[: e_pad]
    con_buf = con_buf[: e_pad]
    bit_buf = bit_buf[: e_pad]

    # sort by doc id (stable keeps clause order within a run)
    doc_s, con_s, bit_s = jax.lax.sort(
        (doc_buf, con_buf, bit_buf), num_keys=1, is_stable=True
    )

    # segmented inclusive scan: per-run score sum and group-bit OR
    start_flag = jnp.concatenate(
        [jnp.ones(1, dtype=bool), doc_s[1:] != doc_s[:-1]]
    )

    def combine(a, b):
        sa, ba, fa = a
        sb, bb, fb = b
        return (
            jnp.where(fb, sb, sa + sb),
            jnp.where(fb, bb, ba | bb),
            fa | fb,
        )

    run_sum, run_bits, _ = jax.lax.associative_scan(
        combine, (con_s, bit_s, start_flag)
    )

    end_flag = jnp.concatenate([doc_s[1:] != doc_s[:-1], jnp.ones(1, dtype=bool)])
    ok = end_flag & (doc_s != jnp.int32(DOC_SENTINEL))
    if need_bits:
        ok &= (run_bits & must_mask) == must_mask
        ok &= (run_bits & mustnot_mask) == 0
        ok &= ((run_bits & should_mask) != 0) | (should_mask == 0)
    word = tomb_words[jnp.clip(doc_s >> 5, 0, tomb_words.shape[0] - 1)]
    dead = (word >> (doc_s & 31).astype(jnp.uint32)) & 1
    ok &= dead == 0

    score = jnp.where(ok, run_sum, NEG_INF)
    kk = min(k, e_pad)
    top_scores, idx = jax.lax.top_k(score, kk)
    return top_scores, doc_s[idx]


def stage_clauses(
    segment: Segment,
    plan: QueryPlan,
    stats,
    t_pad: int,
) -> Tuple[Optional[ClauseArgs], int, int, int, bool]:
    """Flatten a QueryPlan into per-clause device operands for one segment.

    Returns (args, must_mask, mustnot_mask, should_mask, need_bits);
    args is None when the plan cannot run on device (phrases, >32 groups
    with constraints, match_all) — callers fall back to the oracle.
    """
    if plan.match_all or plan.has_phrase:
        return None, 0, 0, 0, False

    starts: List[int] = []
    lens: List[int] = []
    weights: List[float] = []
    c1s: List[float] = []
    c2s: List[float] = []
    gbits: List[int] = []
    must_mask = 0
    mustnot_mask = 0
    should_mask = 0
    k1 = float(K1)
    b = float(B)

    n_groups = len(plan.groups)
    has_constraints = any(g.occur is not Occur.SHOULD for g in plan.groups)
    if has_constraints and n_groups > 32:
        return None, 0, 0, 0, False

    for gi, group in enumerate(plan.groups):
        bit = 1 << (gi % 32)
        if group.occur is Occur.MUST:
            must_mask |= bit
        elif group.occur is Occur.MUST_NOT:
            mustnot_mask |= bit
        else:
            should_mask |= bit
        for clause in group.clauses:
            if clause.is_facet:
                df = stats.facet_doc_freq(clause.term)
                info = segment.term_info(FACET_FIELD_KEY, clause.term)
                if df == 0:
                    continue
                w = float(idf(df, stats.doc_count)) * clause.boost
                # facet component is tf/(tf+k1) with tf==1 -> 1/(1+k1);
                # fold the normalization into the weight so score == idf.
                weights.append(w * (1.0 + k1))
                c1s.append(k1)
                c2s.append(0.0)
            else:
                df = stats.doc_freq(clause.field, clause.term)
                info = segment.term_info(clause.field, clause.term)
                if df == 0:
                    continue
                avg = stats.avg_fieldnorm(clause.field)
                weights.append(float(bm25_weight(df, stats.doc_count, clause.boost)))
                c1s.append(k1 * (1.0 - b))
                c2s.append(k1 * b / avg if avg > 0 else 0.0)
            starts.append(info.start if info else 0)
            lens.append(info.doc_freq if info else 0)
            gbits.append(bit)

    # Tantivy boolean semantics: SHOULD groups are optional whenever any
    # MUST group exists — unless the plan's require_should preserves the
    # inner text query's constraint (see QueryPlan.require_should).
    if must_mask and not plan.require_should:
        should_mask = 0
    if must_mask and should_mask:
        has_constraints = True

    n = len(starts)
    if n == 0:
        return None, must_mask, mustnot_mask, should_mask, has_constraints
    if n > t_pad:
        raise ValueError(f"{n} clauses exceed t_pad={t_pad}")

    pad = t_pad - n
    args = ClauseArgs(
        starts=np.array(starts + [0] * pad, dtype=np.int32),
        lens=np.array(lens + [0] * pad, dtype=np.int32),
        weights=np.array(weights + [0.0] * pad, dtype=np.float32),
        c1=np.array(c1s + [1.0] * pad, dtype=np.float32),
        c2=np.array(c2s + [0.0] * pad, dtype=np.float32),
        gbits=np.array(gbits + [0] * pad, dtype=np.uint32),
    )
    # bits are needed whenever constraints exist OR score-parity demands
    # knowing that at least one SHOULD matched (always true for runs —
    # every entry comes from a matching clause), so only constraints matter.
    return args, must_mask, mustnot_mask, should_mask, has_constraints


def device_search_segment(
    segment: Segment,
    plan: QueryPlan,
    stats,
    limit: int,
) -> Optional[List[Tuple[float, int]]]:
    """Run one query over one segment on device.

    Returns [(score, local_doc)] sorted by score desc / doc asc, or None
    if this plan must use the oracle fallback.
    """
    n_clauses = sum(len(g.clauses) for g in plan.groups)
    t_pad = buckets.t_bucket(n_clauses)
    staged = stage_clauses(segment, plan, stats, t_pad)
    args, must_mask, mustnot_mask, should_mask, need_bits = staged
    if args is None:
        return None

    active = int((args.lens > 0).sum())
    max_len = int(args.lens.max()) if active else 1
    l_pad = buckets.l_bucket(max_len)
    total = int(args.lens.sum())
    if total > buckets.L_BUCKETS[-1] or max_len > buckets.L_BUCKETS[-1]:
        return None  # beyond the largest static bucket: oracle fallback
    e_pad = buckets.e_bucket(total)
    k = buckets.k_bucket(limit)
    single = active == 1 and not need_bits

    e_docd, e_tfd, e_fidd, tombd = segment.device_pack()
    if single:
        # move the one active clause to slot 0
        i = int(np.nonzero(args.lens)[0][0])
        args = ClauseArgs(*(np.roll(a, -i) for a in args))

    scores, docs = segment_topk(
        e_docd,
        e_tfd,
        e_fidd,
        tombd,
        jnp.asarray(args.starts),
        jnp.asarray(args.lens),
        jnp.asarray(args.weights),
        jnp.asarray(args.c1),
        jnp.asarray(args.c2),
        jnp.asarray(args.gbits),
        jnp.uint32(must_mask),
        jnp.uint32(mustnot_mask),
        jnp.uint32(should_mask),
        t_pad=t_pad,
        l_pad=l_pad,
        e_pad=e_pad,
        k=k,
        need_bits=need_bits,
        single_clause=single,
    )
    scores = np.asarray(scores)
    docs = np.asarray(docs)
    keep = np.isfinite(scores)
    out = [(float(s), int(d)) for s, d in zip(scores[keep], docs[keep])]
    return out[:limit]
