"""The compactor: merge segments, purging tombstones.

The reference's only real "compactor" is Tantivy's background merge inside
``IndexWriter`` (SURVEY.md §2b "Segment merge"); the README's compactor
service doesn't exist as code.  Here it is an explicit, synchronous
host-side merge (an on-device merge kernel is a planned optimization):

- live docs are renumbered in (segment, doc) order
- per-term postings are concatenated after remap (stays doc-sorted since
  the remap is monotonic), dead entries dropped
- fieldnorm bytes are carried over; the merged segment's total_tokens is
  recomputed from the *quantized* norms — matching Tantivy's lossy
  merge-time recomputation (fresh segments keep exact counts)
- facet postings and stored docs merge the same way; tombstones reset
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Tuple

import numpy as np

from fugu_tpu.fieldnorm import ids_to_fieldnorms
from fugu_tpu.index.schema import IndexSchema
from fugu_tpu.index.segment import DOC_SENTINEL, FACET_FIELD_KEY, Segment, TermInfo
from fugu_tpu.ops.buckets import l_bucket


def merge_segments(segments: List[Segment], schema: IndexSchema) -> Segment:
    assert segments, "nothing to merge"
    remaps: List[np.ndarray] = []
    lives: List[np.ndarray] = []
    base = 0
    for seg in segments:
        live = ~seg.tombstones
        new_id = np.cumsum(live) - 1 + base
        new_id[~live] = -1
        remaps.append(new_id.astype(np.int32))
        lives.append(live)
        base += int(live.sum())
    new_doc_count = base

    all_fields = sorted({f for s in segments for f in s.terms if f != FACET_FIELD_KEY})

    packs_doc: List[np.ndarray] = []
    packs_tf: List[np.ndarray] = []
    packs_fid: List[np.ndarray] = []
    terms: Dict[str, Dict[str, TermInfo]] = {}
    fieldnorm_ids: Dict[str, np.ndarray] = {}
    total_tokens: Dict[str, int] = {}
    pos_data: Dict[str, np.ndarray] = {}
    pos_offsets: Dict[str, np.ndarray] = {}
    field_entry_base: Dict[str, int] = {}
    offset = 0
    max_posting = 1

    for field in all_fields:
        merged_fids = np.zeros(new_doc_count, dtype=np.uint8)
        for seg, remap, live in zip(segments, remaps, lives):
            if field in seg.fieldnorm_ids:
                merged_fids[remap[live]] = seg.fieldnorm_ids[field][live]
        fieldnorm_ids[field] = merged_fids
        total_tokens[field] = int(ids_to_fieldnorms(merged_fids).sum())
        field_entry_base[field] = offset

        tmap: Dict[str, TermInfo] = {}
        flat_pos: List[np.ndarray] = []
        offs: List[int] = [0]
        pos_total = 0

        term_union = sorted(
            heapq.merge(*[iter(s.terms.get(field, {})) for s in segments])
        )
        prev = None
        for term in term_union:
            if term == prev:
                continue
            prev = term
            doc_parts, tf_parts, fid_parts = [], [], []
            pos_parts: List[Tuple[np.ndarray, np.ndarray]] = []
            for si, seg in enumerate(segments):
                info = seg.term_info(field, term)
                if info is None:
                    continue
                docs, tfs, _ = seg.postings(field, term)
                keep = lives[si][docs]
                if not keep.any():
                    continue
                nd = remaps[si][docs[keep]]
                doc_parts.append(nd)
                tf_parts.append(tfs[keep])
                fid_parts.append(merged_fids[nd].astype(np.int32))
                if field in seg.pos_offsets:
                    b = seg.field_entry_base[field]
                    so = seg.pos_offsets[field]
                    sd = seg.pos_data[field]
                    i0 = info.start - b
                    ends = so[i0 + 1 : i0 + 1 + info.doc_freq]
                    starts_ = so[i0 : i0 + info.doc_freq]
                    for j in np.nonzero(keep)[0]:
                        pos_parts.append(sd[starts_[j] : ends[j]])
            if not doc_parts:
                continue
            docs = np.concatenate(doc_parts)
            tmap[term] = TermInfo(start=offset, doc_freq=len(docs))
            packs_doc.append(docs)
            packs_tf.append(np.concatenate(tf_parts))
            packs_fid.append(np.concatenate(fid_parts))
            for p in pos_parts:
                flat_pos.append(p)
                pos_total += len(p)
                offs.append(pos_total)
            if not pos_parts:
                offs.extend([pos_total] * len(docs))
            offset += len(docs)
            max_posting = max(max_posting, len(docs))
        terms[field] = tmap
        pos_data[field] = (
            np.concatenate(flat_pos) if flat_pos else np.zeros(0, dtype=np.int32)
        )
        pos_offsets[field] = np.array(offs, dtype=np.int64)

    # facet pseudo-field
    ftmap: Dict[str, TermInfo] = {}
    facet_union = sorted(
        {p for s in segments for p in s.terms.get(FACET_FIELD_KEY, {})}
    )
    for path in facet_union:
        doc_parts = []
        for si, seg in enumerate(segments):
            docs = seg.facet_docs(path)
            if len(docs) == 0:
                continue
            keep = lives[si][docs]
            if keep.any():
                doc_parts.append(remaps[si][docs[keep]])
        if not doc_parts:
            continue
        docs = np.concatenate(doc_parts)
        ftmap[path] = TermInfo(start=offset, doc_freq=len(docs))
        packs_doc.append(docs)
        packs_tf.append(np.ones(len(docs), dtype=np.int32))
        packs_fid.append(np.zeros(len(docs), dtype=np.int32))
        offset += len(docs)
        max_posting = max(max_posting, len(docs))
    terms[FACET_FIELD_KEY] = ftmap

    n_entries = offset
    pad = l_bucket(max_posting)
    size = n_entries + pad
    e_doc = np.full(size, DOC_SENTINEL, dtype=np.int32)
    e_tf = np.zeros(size, dtype=np.int32)
    e_fid = np.zeros(size, dtype=np.int32)
    if n_entries:
        e_doc[:n_entries] = np.concatenate(packs_doc)
        e_tf[:n_entries] = np.concatenate(packs_tf)
        e_fid[:n_entries] = np.concatenate(packs_fid)

    stored: List[dict] = []
    for seg, live in zip(segments, lives):
        for d in np.nonzero(live)[0]:
            stored.append(seg.stored[d])

    return Segment(
        schema=schema,
        doc_count=new_doc_count,
        n_entries=n_entries,
        e_doc=e_doc,
        e_tf=e_tf,
        e_fid=e_fid,
        terms=terms,
        fieldnorm_ids=fieldnorm_ids,
        total_tokens=total_tokens,
        stored=stored,
        pos_data=pos_data,
        pos_offsets=pos_offsets,
        field_entry_base=field_entry_base,
        tombstones=np.zeros(new_doc_count, dtype=bool),
    )
