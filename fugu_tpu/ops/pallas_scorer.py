"""Pallas TPU kernel: block-partitioned BM25 scoring + boolean + top-k.

The flagship device kernel (BASELINE.json north star: "posting-list
intersection/union, BM25 scoring, and top-k selection run as vectorized
Pallas kernels instead of branchy pointer-chasing ... namespace filters
compile to document bitset masks fused into the scoring kernel").

Decomposition — doc space is cut into blocks of ``BLOCK`` docs; each
clause's postings are sorted by doc id, so its entries for one block are
a contiguous subrange of its posting window.  The host stages, per
(query, block), the T subrange starts/counts (one vectorized
``np.searchsorted`` per clause) and compacts the per-query list of
nonempty blocks, so sparse queries touch only the blocks they hit.

Kernel, per grid step (query b, block slot j):

1. async-DMA the T entry subranges (doc/tf/fid, <= BLOCK entries each)
   from the HBM posting pack into VMEM
2. VPU: BM25 contribution per entry — w_t * tf / (tf + c1_t + c2_t *
   smallfloat_decode(fid)) — with the branch-free fieldnorm decode
3. MXU: factored scatter-as-matmul — local doc = hi*256 + lo, so
   (onehot_hi * contrib)^T @ onehot_lo yields the dense (BLOCK/256, 256)
   block scores in one contraction with one-hot construction cost
   O(entries * (256 + BLOCK/256)) instead of O(entries * BLOCK); a
   second 0/1 pass gives per-clause presence; group-presence bits
   assemble by scalar shifts (boolean MUST/MUST_NOT/SHOULD masks)
4. VPU: tombstone bitset mask fused in
5. per-block top-K by iterative masked max (ties -> lowest doc id), all
   vector ops; the tiny cross-block merge is one XLA top_k outside

Correctness oracle: fugu_tpu.ops.oracle; parity tested in
tests/test_pallas_scorer.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
import os
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fugu_tpu import jax_setup
from fugu_tpu.index.segment import Segment
from fugu_tpu.ops import buckets
from fugu_tpu.ops.rescore import rescore_hits
from fugu_tpu.ops.scoring import NEG_INF, _decode_fid, mask_i32, stage_clauses
from fugu_tpu.query import QueryPlan

jax_setup.configure()

BLOCK = 2048          # docs per block (== max entries per clause-block).
                      # With the factored (hi, lo) scatter, construction
                      # is ~O(entries), so BLOCK mostly trades per-block
                      # loop overhead vs extraction width: 4096 measured
                      # neutral (128 vs 130 QPS at 1M), 2048 kept
WINDOW = BLOCK + 1024  # DMA window: BLOCK entries + 1024 alignment slack
HI_ROWS = BLOCK // 256  # block doc space as (hi, lo): doc = hi*256 + lo
ENTRY_CHUNK = 1024    # entries per one-hot matmul chunk.  1024 makes the
                      # chunk loads 1024-aligned, so the dynamic VMEM
                      # slice is legal directly — the two pltpu.roll
                      # relayouts per chunk (the former workaround for
                      # Mosaic's alignment rule) disappear, and the BM25
                      # window math moves inside the active chunks only
NB_BUCKETS = (32, 64, 256)  # coarse: every dispatch pays a ~70ms fixed
                            # cost on this relay, so fewer buckets (less
                            # row fragmentation) beat tighter padding
NB_SPLIT = 256        # queries touching more blocks than this split into
                      # multiple kernel rows (block slices partition doc
                      # space, so per-slice top-k lists merge exactly);
                      # bounds BOTH the SMEM starts/counts tables and the
                      # candidate-buffer VMEM (nb*HI_ROWS*256*8B — 512
                      # blocks blew the 16MB scoped-vmem limit)
MAX_K = 128           # per-block extraction budget (== K_OUT lanes); the
                      # merge loop unrolls k iterations, so signatures
                      # only pay for the k bucket they ask for

_INT_MAX = np.int32(2**31 - 1)


def _roll(x, shift, axis, interpret):
    """Partner-fetch rotation: value FROM index i+shift (shift may be
    negative).  Lane axis: pltpu.roll is a RIGHT rotation with
    non-negative shifts (x_rolled[i] = x[i - s]), so "from i+j" =
    right-rotate by N - j.  Sublane axis: static slice+concat (always
    legal in Mosaic; the sublane count is tiny)."""
    n = x.shape[axis]
    s = shift % n
    if axis == 0:
        if s == 0:
            return x
        return jnp.concatenate([x[s:], x[:s]], axis=0)
    if interpret:
        return jnp.roll(x, -shift, axis=axis)
    return pltpu.roll(x, (n - s) % n, axis=axis)


def _bitonic_topk_update(masked, base, r_key, r_doc, interpret):
    """Merge one block's masked scores into the running top-128.

    ``masked``: (HI_ROWS, 256) f32 block scores (NEG_INF = no match);
    ``base``: the block's global doc offset; ``r_key``/``r_doc``:
    (HI_ROWS, K_OUT) running buffer — ROW 0 holds the current top-128
    ASCENDING by (score, doc-desc) so lane 0 is the kth (skip bound).

    In-kernel extraction (r5, VERDICT r4 #1 design (a)): the dense
    nb_pad*2048 HBM write + XLA top_k re-read cost 10.5 ms/dispatch at
    k=128 (~55% of wave-1 device time for the limit100 class).  Here a
    SIMD bitonic sort runs on the (8, 256) tile itself — XOR-partner
    exchanges become two rotations + selects at every distance (lane
    rolls below 256, sublane rolls above), ~66 stages for 2048 lanes —
    and a half-cleaner merges the block's sorted top-128 into the
    running buffer.  A block whose max cannot beat the running kth
    skips the sort entirely (one reduction), so warm queries sort only
    the handful of blocks that still matter.

    Ordering contract: winner = (key desc, doc asc) exactly like XLA
    top_k's lowest-index-on-ties over ascending block ids, so the
    candidate SET matches the dense path bit-for-bit."""
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (HI_ROWS, 256), 1)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (HI_ROWS, 256), 0)
    i_flat = sub_iota * 256 + lane_iota
    keys = masked
    docs = base + i_flat

    def wins(ka, da, kb, db):
        return (ka > kb) | ((ka == kb) & (da < db))

    def stage(k_, d_, kk, j):
        if j < 256:
            pk = jnp.where(
                (lane_iota & j) == 0,
                _roll(k_, j, 1, interpret),
                _roll(k_, -j, 1, interpret),
            )
            pd = jnp.where(
                (lane_iota & j) == 0,
                _roll(d_, j, 1, interpret),
                _roll(d_, -j, 1, interpret),
            )
            low = (lane_iota & j) == 0
        else:
            s = j // 256
            pk = jnp.where(
                (sub_iota & s) == 0,
                _roll(k_, s, 0, interpret),
                _roll(k_, -s, 0, interpret),
            )
            pd = jnp.where(
                (sub_iota & s) == 0,
                _roll(d_, s, 0, interpret),
                _roll(d_, -s, 0, interpret),
            )
            low = (sub_iota & s) == 0
        # 2kk-group direction: (i & kk) == 0 -> DESC (lower index holds
        # the winner); the final kk = 2048 pass leaves flat-desc order
        keep_w = ((i_flat & kk) == 0) == low
        v_wins = wins(k_, d_, pk, pd)
        take_self = keep_w == v_wins
        return (
            jnp.where(take_self, k_, pk),
            jnp.where(take_self, d_, pd),
        )

    def sort_block(args):
        k_, d_ = keys, docs
        kk = 2
        while kk <= BLOCK:
            j = kk >> 1
            while j >= 1:
                k_, d_ = stage(k_, d_, kk, j)
                j >>= 1
            kk <<= 1
        # flat-desc sorted: ranks 0..255 live in sublane 0; top-128 is
        # row 0, lanes 0..127.  Broadcast row 0 to all sublanes (static
        # slice + concat) so the merge below runs on whole tiles.
        t_key = jnp.concatenate([k_[0:1]] * HI_ROWS, axis=0)[:, :K_OUT]
        t_doc = jnp.concatenate([d_[0:1]] * HI_ROWS, axis=0)[:, :K_OUT]

        rk, rd = args
        # half-cleaner: running row is ASC, block top-128 is DESC, so
        # [R_asc ++ T_desc] is bitonic and the elementwise winner holds
        # the union's top-128 (itself bitonic)
        w = wins(rk, rd, t_key, t_doc)
        mk = jnp.where(w, rk, t_key)
        md = jnp.where(w, rd, t_doc)
        # clean the bitonic 128-sequence back to ASC (lane rolls only)
        l128 = jax.lax.broadcasted_iota(jnp.int32, (HI_ROWS, K_OUT), 1)
        j = K_OUT >> 1
        while j >= 1:
            low = (l128 & j) == 0
            pk = jnp.where(
                low,
                _roll(mk, j, 1, interpret),
                _roll(mk, -j, 1, interpret),
            )
            pd = jnp.where(
                low,
                _roll(md, j, 1, interpret),
                _roll(md, -j, 1, interpret),
            )
            # ASC: lower index holds the LOSER
            keep_w = ~low
            v_wins = wins(mk, md, pk, pd)
            take_self = keep_w == v_wins
            mk = jnp.where(take_self, mk, pk)
            md = jnp.where(take_self, md, pd)
            j >>= 1
        return mk, md

    # skip bound: strict — a block whose max equals the kth could still
    # displace it on the doc-asc tie-break
    bm = jnp.max(keys)
    kth = r_key[0, 0]
    return jax.lax.cond(
        bm > kth, sort_block, lambda a: a, (r_key, r_doc)
    )


def _scorer_kernel(
    # scalar prefetch (SMEM)
    nblocks,      # int32[B]     number of active block slots per query
    block_ids,    # int32[B, NB]
    starts,       # int32[B, NB*T] (flattened: SMEM pads the last dim to
    counts,       # int32[B, NB*T]  128 lanes, so keep it wide, not [.,T])
    weights,      # f32[B, T]
    c1,           # f32[B, T]
    c2,           # f32[B, T]
    gbits,        # int32[B, T]  group id per clause (-1 = inactive)
    masks,        # int32[B, 3]  must / mustnot / should group masks
    # tensor inputs (stay in HBM; manually DMA'd)
    e_doc_hbm,
    e_tffid_hbm,
    tomb_hbm,
    # outputs then scratch (see below): the dense path emits one
    # f32[1, NB*HI_ROWS, 256] masked block-score row per query (top-k
    # extraction via XLA top_k outside); the in-kernel-topk path
    # (k = 128, r5) emits the running top-128 (f32 keys + i32 docs,
    # [1, HI_ROWS, K_OUT]) merged block by block with the bitonic
    # network above — no dense HBM write, no XLA top_k
    *refs,
    t_pad: int,
    nb_pad: int,
    need_bits: bool,
    inkernel_topk: bool = False,
    interpret: bool = False,
):
    if inkernel_topk:
        out_key, out_doc, *scratch = refs
    else:
        out_scores, *scratch = refs
    doc_s = [scratch[2 * t] for t in range(t_pad)]       # (2*WINDOW,)
    pk_s = [scratch[2 * t + 1] for t in range(t_pad)]    # (2*WINDOW,)
    tomb_s = scratch[2 * t_pad]                          # (2*HI_ROWS, 256)
    sems = scratch[2 * t_pad + 1]                        # (2*NSEM,)
    b = pl.program_id(0)
    NSEM = 2 * t_pad + 1

    c_iota = jax.lax.broadcasted_iota(jnp.int32, (ENTRY_CHUNK, 1), 0)
    # block state lives in a (HI_ROWS, 256) layout: doc d of the block
    # sits at [d >> 8, d & 255] — the factored scatter (below) produces
    # exactly this shape from one small matmul
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (ENTRY_CHUNK, 256), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (ENTRY_CHUNK, HI_ROWS), 1)

    must = masks[b, 0]
    mustnot = masks[b, 1]
    should = masks[b, 2]

    def dma_set(jj, slot):
        """DMA descriptors loading block-slot jj's windows into buffer
        `slot` (0/1).  slot may be traced; offsets stay 1024-aligned
        because WINDOW and BLOCK are multiples of 1024."""
        descs = []
        woff = pl.multiple_of(slot * WINDOW, 1024)
        for t in range(t_pad):
            a = pl.multiple_of(((starts[b, jj * t_pad + t]) >> 10) << 10, 1024)
            descs.append(
                pltpu.make_async_copy(
                    e_doc_hbm.at[pl.ds(a, WINDOW)],
                    doc_s[t].at[pl.ds(woff, WINDOW)],
                    sems.at[slot * NSEM + 2 * t],
                )
            )
            descs.append(
                pltpu.make_async_copy(
                    e_tffid_hbm.at[pl.ds(a, WINDOW)],
                    pk_s[t].at[pl.ds(woff, WINDOW)],
                    sems.at[slot * NSEM + 2 * t + 1],
                )
            )
        bid = block_ids[b, jj]
        tomb_row = pl.multiple_of(jnp.maximum(bid, 0) * HI_ROWS, HI_ROWS)
        boff = pl.multiple_of(slot * HI_ROWS, HI_ROWS)
        descs.append(
            pltpu.make_async_copy(
                tomb_hbm.at[pl.ds(tomb_row, HI_ROWS), :],
                tomb_s.at[pl.ds(boff, HI_ROWS), :],
                sems.at[slot * NSEM + 2 * t_pad],
            )
        )
        return descs

    nb = nblocks[b]

    # warm up: start block 0 into slot 0
    @pl.when(nb > 0)
    def _():
        for d in dma_set(0, 0):
            d.start()

    def block_step(jj, carry):
        slot = jj % 2
        base = block_ids[b, jj] * BLOCK
        woff = pl.multiple_of(slot * WINDOW, 1024)
        boff = pl.multiple_of(slot * HI_ROWS, HI_ROWS)

        # prefetch the next block into the other slot
        @pl.when(jj + 1 < nb)
        def _():
            for d in dma_set(jj + 1, 1 - slot):
                d.start()

        # wait for this block's windows
        for d in dma_set(jj, slot):
            d.wait()

        def start_of(t):
            return starts[b, jj * t_pad + t]

        scores = jnp.zeros((HI_ROWS, 256), jnp.float32)
        present_bits = jnp.zeros((HI_ROWS, 256), jnp.int32)

        for t in range(t_pad):
            st = start_of(t)
            cnt = counts[b, jj * t_pad + t]
            a = (st >> 10) << 10

            # entries for this (clause, block) occupy one contiguous lane
            # interval of the window — iterate only its chunks with a
            # dynamic-bounds loop.  ENTRY_CHUNK == 1024 makes each chunk
            # load 1024-aligned, so the dynamic VMEM slice is legal
            # directly (the old 512-entry chunks needed two pltpu.roll
            # relayouts per chunk), and the BM25 math runs on active
            # chunks only instead of the whole window.
            lo = st - a
            hi = lo + cnt
            c_lo = lo // ENTRY_CHUNK
            c_hi = jnp.where(cnt > 0, (hi + ENTRY_CHUNK - 1) // ENTRY_CHUNK, c_lo)

            def chunk_add(c, args, t=t):
                scores, presence_t = args
                off = pl.multiple_of(woff + c * ENTRY_CHUNK, 1024)
                dchunk = doc_s[t][pl.ds(off, ENTRY_CHUNK)].reshape(
                    ENTRY_CHUNK, 1
                )
                pchunk = pk_s[t][pl.ds(off, ENTRY_CHUNK)].reshape(
                    ENTRY_CHUNK, 1
                )
                pos = a + c * ENTRY_CHUNK + c_iota
                valid = (pos >= st) & (pos < st + cnt)
                tf = (pchunk & 0xFFFFFF).astype(jnp.float32)
                fid = (pchunk >> 24) & 0xFF
                denom = tf + c1[b, t] + c2[b, t] * _decode_fid(fid).astype(
                    jnp.float32
                )
                # Tantivy associates as weight * (tf / denom) — match it
                # so exact ties stay exact ties
                ce_col = jnp.where(valid, weights[b, t] * (tf / denom), 0.0)
                le_col = jnp.where(valid, dchunk - base, -1)
                # factored scatter: doc = hi*256 + lo, so the dense
                # (HI_ROWS, 256) block scores are ONE contraction
                # (onehot_hi * contrib)^T @ onehot_lo — one-hot
                # construction costs CHUNK*(256+HI) compares instead of
                # CHUNK*BLOCK.  Invalid lanes carry le = -1: hi = -1
                # matches no row, zeroing the whole lhs row.  (16-bit
                # compares are unsupported on this target; int32
                # equality straight to bf16.)
                oh_lo = ((le_col & 255) == lo_iota).astype(jnp.bfloat16)
                oh_hi = ((le_col >> 8) == hi_iota).astype(jnp.float32)
                # exact f32 via manual hi/mid/lo bf16 split.  The three
                # parts ride ONE MXU contraction: stack them along the
                # entry (sublane) axis and tile oh_lo to match — the
                # contraction sums all three partial products into the
                # full f32 value.  (Three separate dependent dots cost
                # three MXU issue latencies per chunk; the sublane
                # concat is a cheap row-block copy, unlike the lane-dim
                # concat that lost in round 1.)
                vals = oh_hi * ce_col
                v_hi = vals.astype(jnp.bfloat16)
                r1 = vals - v_hi.astype(jnp.float32)
                v_mid = r1.astype(jnp.bfloat16)
                v_lo = (r1 - v_mid.astype(jnp.float32)).astype(jnp.bfloat16)
                dn = (((0,), (0,)), ((), ()))
                lhs3 = jnp.concatenate([v_hi, v_mid, v_lo], axis=0)
                rhs3 = jnp.concatenate([oh_lo, oh_lo, oh_lo], axis=0)
                acc = jax.lax.dot_general(
                    lhs3, rhs3, dimension_numbers=dn,
                    preferred_element_type=jnp.float32,
                )
                if need_bits:
                    # presence values are 0/1 — exact in a single bf16 pass
                    p = jax.lax.dot_general(
                        oh_hi.astype(jnp.bfloat16), oh_lo,
                        dimension_numbers=dn,
                        preferred_element_type=jnp.float32,
                    )
                    return scores + acc, presence_t + p
                return scores + acc, presence_t

            presence_t = jnp.zeros((HI_ROWS, 256), jnp.float32)
            scores, presence_t = jax.lax.fori_loop(
                c_lo, c_hi, chunk_add, (scores, presence_t)
            )

            if need_bits:
                g = gbits[b, t]
                gbit = jnp.where(g >= 0, jnp.int32(1) << jnp.maximum(g, 0), 0)
                present_bits = present_bits | jnp.where(presence_t > 0.0, gbit, 0)

        if need_bits:
            matched = (present_bits & (must | should)) != 0
            matched &= (present_bits & must) == must
            matched &= (present_bits & mustnot) == 0
            matched &= ((present_bits & should) != 0) | (should == 0)
        else:
            # pure-should: every scored doc matches (weights are > 0)
            matched = scores > 0.0
        matched &= tomb_s[pl.ds(boff, HI_ROWS), :] == 0

        masked = jnp.where(matched, scores, NEG_INF)
        if inkernel_topk:
            rk, rd = carry
            return _bitonic_topk_update(masked, base, rk, rd, interpret)
        row = pl.multiple_of(jj * HI_ROWS, HI_ROWS)
        out_scores[0, pl.ds(row, HI_ROWS), :] = masked
        return carry

    if inkernel_topk:
        r0 = (
            jnp.full((HI_ROWS, K_OUT), NEG_INF, jnp.float32),
            jnp.full((HI_ROWS, K_OUT), _INT_MAX, jnp.int32),
        )
        rk, rd = jax.lax.fori_loop(0, nb, block_step, r0)
        out_key[0, :, :] = rk
        out_doc[0, :, :] = rd
    else:
        jax.lax.fori_loop(0, nb, block_step, 0)
    # dense path: slots >= nb keep whatever the output buffer held; the
    # XLA side masks them by nblocks before the top_k


K_OUT = 128  # lane-aligned output tile


def build_scorer_call(t_pad: int, nb_pad: int, k: int, b_pad: int,
                      need_bits: bool, interpret: bool = False,
                      inkernel_topk: bool = False):
    """The raw (unjitted) wrapper — callers jit it directly
    (build_scorer) or trace it inside shard_map (parallel.pallas_sharded).

    Dense path: the Pallas kernel emits the masked dense block scores
    and the top-k (score-desc/doc-asc tiebreak) runs as XLA ``top_k``
    fused in the same program — block_ids rows are ascending, so equal
    scores resolve to the lowest global doc id by first-occurrence
    order.  ``inkernel_topk`` (k == K_OUT only, r5): the kernel merges
    a running bitonic top-128 across blocks and emits just
    [HI_ROWS, K_OUT] keys+docs per query — no dense HBM write, no XLA
    top_k (measured 10.5 ms/dispatch on the limit100 wave shape).
    """
    # the in-kernel network always extracts K_OUT candidates; for
    # smaller k buckets that is a strict superset of the dense path's
    # extraction (collectors filter + rescore-truncate), so exactness
    # holds for any k
    kernel = functools.partial(
        _scorer_kernel, t_pad=t_pad, nb_pad=nb_pad, need_bits=need_bits,
        inkernel_topk=inkernel_topk, interpret=interpret,
    )
    if inkernel_topk:
        out_specs = [
            pl.BlockSpec((1, HI_ROWS, K_OUT), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, HI_ROWS, K_OUT), lambda b, *_: (b, 0, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b_pad, HI_ROWS, K_OUT), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, HI_ROWS, K_OUT), jnp.int32),
        ]
    else:
        out_specs = [
            pl.BlockSpec(
                (1, nb_pad * HI_ROWS, 256), lambda b, *_: (b, 0, 0)
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (b_pad, nb_pad * HI_ROWS, 256), jnp.float32
            )
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(b_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * WINDOW,), jnp.int32) for _ in range(2 * t_pad)
        ]
        + [  # tombstone rows: 2 slots of the block's (HI_ROWS, 256) flags
            pltpu.VMEM((2 * HI_ROWS, 256), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * (t_pad * 2 + 1),)),
        ],
    )

    def call(nblocks, block_ids, starts, counts, weights, c1, c2, gbits,
             masks, e_doc, e_tffid, tomb):
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(nblocks, block_ids, starts, counts, weights, c1, c2, gbits,
          masks, e_doc, e_tffid, tomb)
        if inkernel_topk:
            r_key, r_doc = outs
            # row 0 is the running buffer ASCENDING by (score, doc-desc)
            # — reverse lanes so collectors see the usual desc layout
            top_s = r_key[:, 0, ::-1]
            top_d = r_doc[:, 0, ::-1]
            top_d = jnp.where(
                top_s > NEG_INF, top_d, jnp.int32(_INT_MAX)
            )
            return top_s[:, None, :], top_d[:, None, :]
        raw = outs[0]
        flat = raw.reshape(b_pad, nb_pad, BLOCK)
        slot_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (b_pad, nb_pad), 1)
            < nblocks[:, None]
        )
        flat = jnp.where(slot_ok[:, :, None], flat, NEG_INF)
        kk = min(k, nb_pad * BLOCK)
        top_s, idx = jax.lax.top_k(flat.reshape(b_pad, nb_pad * BLOCK), kk)
        slot = idx // BLOCK
        gdoc = (
            jnp.take_along_axis(block_ids, slot, axis=1) * BLOCK
            + idx % BLOCK
        )
        top_d = jnp.where(top_s > NEG_INF, gdoc, jnp.int32(_INT_MAX))
        return top_s[:, None, :], top_d[:, None, :]

    return call


def build_scorer(t_pad: int, nb_pad: int, k: int, b_pad: int,
                 need_bits: bool, interpret: bool = False,
                 inkernel_topk: bool = False):
    return jax.jit(
        build_scorer_call(
            t_pad, nb_pad, k, b_pad, need_bits, interpret, inkernel_topk
        )
    )


_SCORER_CACHE: dict = {}

# CUMULATIVE wall-time attribution across all pallas_search_batch calls
# (seconds): host staging (searchsorted + table packing) vs device
# (dispatch + result sync).  Never reset — diff snapshots for per-call
# numbers.
PROFILE = {"stage_s": 0.0, "device_s": 0.0, "dispatches": 0}


def _use_inkernel_topk(k: int) -> bool:
    """Route k == K_OUT (the limit100 extraction bucket) through the
    in-kernel bitonic top-k unless FUGU_INKERNEL_TOPK=0.  Smaller k
    buckets keep the dense+XLA-top_k path (its top_k is proportionally
    cheaper there and the dense program is long warm in the compile
    cache)."""
    import os

    v = os.environ.get("FUGU_INKERNEL_TOPK", "1")
    if v == "0":
        return False
    if v == "all":
        return True
    return k == K_OUT


def _get_scorer(t_pad, nb_pad, k, b_pad, need_bits, interpret):
    ik = _use_inkernel_topk(k)
    key = (t_pad, nb_pad, k, b_pad, need_bits, interpret, ik)
    if key not in _SCORER_CACHE:
        _SCORER_CACHE[key] = build_scorer(
            t_pad, nb_pad, k, b_pad, need_bits, interpret, ik
        )
    return _SCORER_CACHE[key]


def nb_bucket(n: int) -> int:
    for v in NB_BUCKETS:
        if n <= v:
            return v
    return NB_BUCKETS[-1]


def plan_block_tables(e_doc_host, args, t_pad, n_blocks, must, offs_cache):
    """Per-block clause subranges for one staged plan.

    Returns (st[int64 n_blocks,T], ct, nonempty block ids) — one
    vectorized searchsorted per clause over the doc-sorted posting window,
    with conjunctive pruning (a block missing every clause of some MUST
    group cannot match).  offs_cache memoizes per (start, len) — the
    tables are query-independent, so Zipf-heavy repeated terms skip the
    searchsorted entirely.
    """
    edge = np.arange(n_blocks + 1, dtype=np.int64) * BLOCK
    st = np.zeros((n_blocks, t_pad), dtype=np.int64)
    ct = np.zeros((n_blocks, t_pad), dtype=np.int64)
    for t in range(t_pad):
        s0, ln = int(args.starts[t]), int(args.lens[t])
        if ln == 0:
            continue
        offs = offs_cache.get((s0, ln))
        if offs is None:
            window = e_doc_host[s0 : s0 + ln]
            offs = np.searchsorted(window, edge)
            offs_cache[(s0, ln)] = offs
        st[:, t] = s0 + offs[:-1]
        ct[:, t] = offs[1:] - offs[:-1]
    keep = ct.sum(axis=1) > 0
    if must:
        for g in range(32):
            if not (must >> g) & 1:
                continue
            cols = [t for t in range(t_pad) if int(args.gbits[t]) == (1 << g)]
            if cols:
                keep &= ct[:, cols].sum(axis=1) > 0
    return st, ct, np.nonzero(keep)[0]


def pallas_search_batch(
    segment: Segment,
    plans: Sequence[QueryPlan],
    stats,
    limit: int,
    interpret: bool = False,
    block_lists: Optional[dict] = None,
) -> List[Optional[List[Tuple[float, int]]]]:
    """Pallas-engine equivalent of ops.scoring.device_search_batch.

    Returns a result list aligned with `plans`; None entries mean the
    caller must use another path (oracle or the XLA kernel).

    ``block_lists`` (plan index -> allowed block ids) restricts each
    query to a caller-proven candidate set — the two-phase batch engine
    (ops/batch_scorer) passes the blocks whose phase-A maxima can still
    reach the kth score, cutting ~490 block visits per query to ~15.
    """
    return pallas_search_collect([
        pallas_search_begin(
            segment, plans, stats, limit, interpret, block_lists
        )
    ])[0]


def pallas_search_begin(
    segment: Segment,
    plans: Sequence[QueryPlan],
    stats,
    limit: int,
    interpret: bool = False,
    block_lists: Optional[dict] = None,
):
    """Stage and queue all kernel dispatches for one batch WITHOUT
    waiting for results — callers with several independent batches (the
    two-phase engine's per-limit wave groups) begin them all and collect
    once, so the batches' device work and fetches overlap instead of
    serializing at each batch's sync point."""
    results: List[Optional[List[Tuple[float, int]]]] = [None] * len(plans)
    if limit > MAX_K:
        return (results, [], limit, 0.0, segment, plans, stats)
    prof_t0 = time.perf_counter()
    # finer k ladder than the global one: the per-block merge unrolls k
    # extraction iterations, so k should track the requested limit.
    # When limit lands EXACTLY on a bucket, extract at the next step so
    # the host rescore always sees slack candidates past the boundary —
    # a last-ulp TPU-vs-IEEE rounding flip at the k-th/(k+1)-th boundary
    # could otherwise exclude the true k-th doc before rescore runs.  At
    # limit == MAX_K there is no headroom (documented zero-slack case).
    k = buckets.k_extract(limit) or MAX_K

    n_blocks = max((segment.doc_count + BLOCK - 1) // BLOCK, 1)
    staged = []
    for i, plan in enumerate(plans):
        if plan.host_only:
            continue
        from fugu_tpu.ops.scoring import has_nonpositive_weight

        if has_nonpositive_weight(plan, stats):
            continue  # 'scores > 0 == matched' breaks; host fallback
        n_clauses = sum(len(g.clauses) for g in plan.groups)
        # floor at 4: 1-term and 4-term queries share one compiled
        # signature and one dispatch per batch; inactive clause slots
        # cost nothing (their blocks/chunks are pruned or skipped)
        t_pad = max(buckets.t_bucket(max(n_clauses, 1)), 4)
        if t_pad > 16 or len(plan.groups) > 32:
            continue
        args, must, mustnot, should, need_bits = stage_clauses(
            segment, plan, stats, t_pad
        )
        if args is None:
            # stage_clauses returned None => every clause had df == 0
            # (the >32-group case was already filtered above): no doc
            # can score, so the empty result is exact
            results[i] = []
            continue
        staged.append((i, t_pad, args, must, mustnot, should, need_bits))

    if not staged:
        return (results, [], limit, time.perf_counter() - prof_t0, segment, plans, stats)

    by_t: dict = {}
    for item in staged:
        by_t.setdefault((item[1], item[6]), []).append(item)

    e_docd, e_tffidd, _ = segment.device_pack()
    tombd = segment.device_tomb_flags()
    e_doc_np = segment.e_doc

    # dispatches are queued async (jax dispatch returns immediately);
    # results convert after ALL chunks are in flight so the per-dispatch
    # relay round-trips overlap instead of serializing
    pending: list = []

    # per-term block-offset tables are query-independent — cache them on
    # the segment so repeated terms across a batch (Zipf query loads hit
    # the same heavy terms constantly) skip the searchsorted
    offs_cache = segment.__dict__.setdefault("_pallas_block_offsets", {})

    for (t_pad, need_bits), items in by_t.items():
        rows = []
        for (i, _t, args, must, mustnot, should, _nb) in items:
            st, ct, nonempty = plan_block_tables(
                e_doc_np, args, t_pad, n_blocks, must, offs_cache
            )
            if block_lists is not None and i in block_lists:
                # preserve the CALLER's block order (ascending for the
                # dense path's tie contract; bound-DESC when the
                # two-phase engine orders for the in-kernel top-k —
                # batch_scorer.order_blocks_by_bound)
                bl = np.asarray(block_lists[i], dtype=np.int64)
                nonempty = bl[
                    np.isin(bl, nonempty, assume_unique=True)
                ]
            # block-heavy queries become several rows over block slices;
            # result assembly merges the per-slice top-k lists
            for s in range(0, max(len(nonempty), 1), NB_SPLIT):
                rows.append(
                    (i, args, must, mustnot, should, st, ct,
                     nonempty[s : s + NB_SPLIT])
                )
        if not rows:
            continue
        # bucket each row by its OWN block count: one block-heavy query
        # must not drag the whole batch into the big-NB signature (whose
        # SMEM table budget forces tiny b_pad = many dispatches)
        by_nb: dict = {}
        for r in rows:
            by_nb.setdefault(nb_bucket(max(len(r[7]), 1)), []).append(r)
        for nb_pad, nb_rows in sorted(by_nb.items()):
            _dispatch_rows(
                nb_rows, nb_pad, t_pad, k, need_bits, interpret,
                e_docd, e_tffidd, tombd, pending,
            )
    PROFILE["dispatches"] += len(pending)
    return (results, pending, limit, time.perf_counter() - prof_t0, segment, plans, stats)


def pallas_search_collect(handles):
    """Fetch and assemble results for a list of `pallas_search_begin`
    handles with ONE overlapped device transfer (per-array reads pay a
    full relay round trip each on this host)."""
    dev_t0 = time.perf_counter()
    flat = jax_setup.fetch_np(
        [p for h in handles for _c, p in h[1]]
    )
    it = iter(flat)
    out = []
    for results, pending, limit, stage_s, segment, plans, stats in handles:
        partial: dict = {}
        for chunk, _p in pending:
            packed = next(it)
            kk = packed.shape[-1] // 2
            top_s = packed.view(np.float32)[:, 0, :kk]
            top_d = packed[:, 0, kk:]
            for bi, (i, *_rest) in enumerate(chunk):
                keep = np.isfinite(top_s[bi]) & (top_d[bi] != _INT_MAX)
                partial.setdefault(i, []).extend(
                    (float(s), int(d))
                    for s, d in zip(top_s[bi][keep], top_d[bi][keep])
                )
        for i, hits in partial.items():
            # slices partition doc space; scores are then replaced with
            # oracle-exact host floats (TPU division is not IEEE-exact)
            # and re-ranked, so ordering is bit-identical to the oracle
            results[i] = rescore_hits(segment, plans[i], stats, hits)[:limit]
        PROFILE["stage_s"] += stage_s
        out.append(results)
    PROFILE["device_s"] += time.perf_counter() - dev_t0
    return out


_PACKER = None


def _get_packer():
    """Jitted (scores f32, docs i32) -> lane-concat int32 combiner.

    Shape-polymorphic via jit retrace; the program is trivial so each
    new (b_pad, k) signature compiles fast and caches persistently."""
    global _PACKER
    if _PACKER is None:
        _PACKER = jax.jit(
            lambda s, d: jnp.concatenate(
                [jax.lax.bitcast_convert_type(s, jnp.int32), d], axis=-1
            )
        )
    return _PACKER


def _dispatch_rows(
    rows, nb_pad, t_pad, k, need_bits, interpret,
    e_docd, e_tffidd, tombd, pending,
):
    """Queue kernel dispatches for rows sharing one (t_pad, nb_pad,
    need_bits) signature; results are converted later by the caller so
    the relay round-trips overlap."""
    pos = 0
    while pos < len(rows):
        # SMEM budget: the prefetched starts/counts tables live in
        # scalar memory (~1MB total, with internal replication) —
        # keep B*NB*T small enough to fit.  FUGU_SMEM_ELEMS raises the
        # element budget experimentally: on a dispatch-floored relay
        # host, doubling b_pad at the nb=256 signature halves the
        # dispatch count for block-heavy classes (Mosaic rejects the
        # program if the tables genuinely don't fit — fail fast, not
        # wrong results)
        smem_elems = int(os.environ.get("FUGU_SMEM_ELEMS", "16384"))
        smem_cap = max(1, smem_elems // (nb_pad * t_pad))
        b_allowed = max([x for x in buckets.B_BUCKETS if x <= smem_cap] or [1])
        # fixed b_pad per signature: the tail chunk pads with inactive
        # queries rather than compiling a second program
        b_pad = b_allowed
        chunk = rows[pos : pos + b_pad]
        pos += len(chunk)

        block_ids = np.zeros((b_pad, nb_pad), dtype=np.int32)
        nblocks = np.zeros(b_pad, dtype=np.int32)
        starts = np.zeros((b_pad, nb_pad, t_pad), dtype=np.int32)
        counts = np.zeros((b_pad, nb_pad, t_pad), dtype=np.int32)
        weights = np.zeros((b_pad, t_pad), dtype=np.float32)
        c1 = np.ones((b_pad, t_pad), dtype=np.float32)
        c2 = np.zeros((b_pad, t_pad), dtype=np.float32)
        gbits = np.full((b_pad, t_pad), -1, dtype=np.int32)
        masks = np.zeros((b_pad, 3), dtype=np.int32)

        for bi, (i, args, must, mustnot, should, st, ct, nonempty) in enumerate(
            chunk
        ):
            nb = len(nonempty)
            nblocks[bi] = nb
            block_ids[bi, :nb] = nonempty
            starts[bi, :nb] = st[nonempty]
            counts[bi, :nb] = ct[nonempty]
            weights[bi] = args.weights
            c1[bi] = args.c1
            c2[bi] = args.c2
            for t in range(t_pad):
                bits = int(args.gbits[t])
                gbits[bi, t] = bits.bit_length() - 1 if bits else -1
            masks[bi] = (mask_i32(must), mask_i32(mustnot), mask_i32(should))

        scorer = _get_scorer(t_pad, nb_pad, k, b_pad, need_bits, interpret)
        annot = jax.profiler.TraceAnnotation(
            f"fugu:pallas_scorer t={t_pad} nb={nb_pad} b={b_pad} k={k}"
        )
        with annot:
            top_s, top_d = scorer(
                jnp.asarray(nblocks),
                jnp.asarray(block_ids),
                jnp.asarray(starts.reshape(b_pad, nb_pad * t_pad)),
                jnp.asarray(counts.reshape(b_pad, nb_pad * t_pad)),
                jnp.asarray(weights),
                jnp.asarray(c1),
                jnp.asarray(c2),
                jnp.asarray(gbits),
                jnp.asarray(masks),
                e_docd,
                e_tffidd,
                tombd,
            )
        # lane-concat (bitcast scores | docs) into ONE int32 buffer: every
        # separate device array fetched costs a full relay round trip
        pending.append((chunk, _get_packer()(top_s, top_d)))
