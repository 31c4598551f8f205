// fugu_native — the ingest hot path in C++.
//
// Implements the default analyzer chain (simple Unicode-alnum split,
// 40-byte RemoveLong filter on the RAW token bytes, Unicode lowercase)
// with tables generated from the running CPython, plus the per-field
// postings accumulation that dominates segment building:
//
//   add_doc(text) : tokenize, accumulate (term -> [(doc, tf, positions)])
//   finish()      : sorted term table + flat posting/position arrays
//
// Exposed through a plain C ABI consumed via ctypes
// (fugu_tpu/native.py).  The Python builder remains the reference
// implementation; parity is enforced by tests/test_native.py.
//
// Reference behavior being accelerated: Tantivy's in-RAM segment writer
// (the reference drives it at /root/reference/src/db/document.rs:49-61).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "unicode_tables.h"

namespace {

constexpr size_t kLongTokenByteLimit = 40;
constexpr int kPositionGap = 2;

bool is_alnum(uint32_t cp) {
  if (cp < 128) {  // ASCII fast path (str.isalnum semantics)
    return (cp >= '0' && cp <= '9') || (cp >= 'A' && cp <= 'Z') ||
           (cp >= 'a' && cp <= 'z');
  }
  int lo = 0, hi = ALNUM_RANGES_N - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (cp < ALNUM_RANGES[mid][0]) {
      hi = mid - 1;
    } else if (cp > ALNUM_RANGES[mid][1]) {
      lo = mid + 1;
    } else {
      return true;
    }
  }
  return false;
}

// append lowercase(cp) to out as UTF-8
void append_lower_utf8(uint32_t cp, std::string* out);

void append_utf8(uint32_t cp, std::string* out) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

void append_lower_utf8(uint32_t cp, std::string* out) {
  if (cp < 0x80) {  // ASCII fast path
    if (cp >= 'A' && cp <= 'Z') cp += 32;
    out->push_back(static_cast<char>(cp));
    return;
  }
  // multi-char expansions first (tiny table)
  for (int i = 0; i < LOWER_MULTI_N; ++i) {
    if (LOWER_MULTI[i][0] == cp) {
      for (int j = 1; j < 4 && LOWER_MULTI[i][j]; ++j) {
        append_utf8(LOWER_MULTI[i][j], out);
      }
      return;
    }
  }
  int lo = 0, hi = LOWER_SIMPLE_N - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (LOWER_SIMPLE[mid][0] < cp) {
      lo = mid + 1;
    } else if (LOWER_SIMPLE[mid][0] > cp) {
      hi = mid - 1;
    } else {
      append_utf8(LOWER_SIMPLE[mid][1], out);
      return;
    }
  }
  append_utf8(cp, out);
}

// decode one UTF-8 codepoint; returns bytes consumed (>=1)
inline int decode_utf8(const uint8_t* p, const uint8_t* end, uint32_t* cp) {
  uint8_t b = p[0];
  if (b < 0x80) { *cp = b; return 1; }
  if ((b >> 5) == 0x6 && p + 1 < end) {
    *cp = ((b & 0x1F) << 6) | (p[1] & 0x3F);
    return 2;
  }
  if ((b >> 4) == 0xE && p + 2 < end) {
    *cp = ((b & 0x0F) << 12) | ((p[1] & 0x3F) << 6) | (p[2] & 0x3F);
    return 3;
  }
  if ((b >> 3) == 0x1E && p + 3 < end) {
    *cp = ((b & 0x07) << 18) | ((p[1] & 0x3F) << 12) | ((p[2] & 0x3F) << 6) |
          (p[3] & 0x3F);
    return 4;
  }
  *cp = 0xFFFD;
  return 1;
}

// Per-term postings in term-id space: positions live in ONE flat arena
// per term (entries arrive in doc order, so per-(term, doc) position
// runs are naturally contiguous — no nested vectors, no per-doc map).
struct Posting {
  std::vector<int32_t> docs;
  std::vector<int32_t> tfs;
  std::vector<int32_t> pos_data;   // flat, grouped by doc
  std::vector<int64_t> pos_ends;   // per posting entry: end offset
  int32_t last_doc = -1;
};

struct Builder {
  std::unordered_map<std::string, int32_t> term_ids;
  std::vector<const std::string*> term_strs;  // id -> key (stable in map)
  std::vector<Posting> postings;
  std::vector<int64_t> doc_token_counts;
  int32_t next_doc = 0;

  // scratch reused across docs
  std::string token;

  inline void emit(int32_t doc, int32_t pos) {
    auto it = term_ids.find(token);
    int32_t id;
    if (it == term_ids.end()) {
      id = static_cast<int32_t>(postings.size());
      auto ins = term_ids.emplace(token, id);
      term_strs.push_back(&ins.first->first);
      postings.emplace_back();
    } else {
      id = it->second;
    }
    Posting& p = postings[id];
    if (p.last_doc != doc) {
      p.last_doc = doc;
      p.docs.push_back(doc);
      p.tfs.push_back(1);
      p.pos_data.push_back(pos);
      p.pos_ends.push_back(static_cast<int64_t>(p.pos_data.size()));
    } else {
      ++p.tfs.back();
      p.pos_data.push_back(pos);
      p.pos_ends.back() = static_cast<int64_t>(p.pos_data.size());
    }
  }

  void add_doc(const char* data, int64_t len, int64_t n_values,
               const int64_t* value_offsets) {
    int32_t doc = next_doc++;
    int64_t n_tokens = 0;
    int pos_base = 0;
    for (int64_t v = 0; v < n_values; ++v) {
      const uint8_t* p =
          reinterpret_cast<const uint8_t*>(data) + value_offsets[v];
      const uint8_t* end =
          reinterpret_cast<const uint8_t*>(data) + value_offsets[v + 1];
      int pos = 0;
      int last_pos = -1;
      size_t raw_bytes = 0;
      bool in_token = false;
      while (p < end) {
        uint32_t cp;
        int n;
        if (*p < 0x80) {  // ASCII fast path (the overwhelming majority)
          cp = *p;
          n = 1;
        } else {
          n = decode_utf8(p, end, &cp);
        }
        if (is_alnum(cp)) {
          if (!in_token) {
            in_token = true;
            token.clear();
            raw_bytes = 0;
          }
          raw_bytes += n;
          append_lower_utf8(cp, &token);
        } else if (in_token) {
          in_token = false;
          if (raw_bytes < kLongTokenByteLimit) {
            emit(doc, pos_base + pos);
            ++n_tokens;
            last_pos = std::max(last_pos, pos);
          }
          ++pos;
        }
        p += n;
      }
      if (in_token) {
        if (raw_bytes < kLongTokenByteLimit) {
          emit(doc, pos_base + pos);
          ++n_tokens;
          last_pos = std::max(last_pos, pos);
        }
        ++pos;
      }
      // match the Python builder's position-gap rule: value k starts at
      // (last emitted position of value k-1) + POSITION_GAP
      if (last_pos >= 0) pos_base += last_pos + kPositionGap;
    }
    doc_token_counts.push_back(n_tokens);
  }
};

struct Result {
  std::string term_blob;           // terms joined, no separators
  std::vector<int32_t> term_lens;  // byte length per term
  std::vector<int32_t> term_dfs;
  std::vector<int32_t> post_docs;
  std::vector<int32_t> post_tfs;
  std::vector<int64_t> pos_offsets;  // per posting entry, +1 leading 0
  std::vector<int32_t> pos_data;
  std::vector<int64_t> doc_token_counts;
};

// memcpy from vec.data() of an EMPTY vector is UB (data() may be null
// even with size 0); copy only when non-empty
template <typename T>
static void copy_vec(T* dst, const std::vector<T>& src) {
  if (!src.empty()) std::memcpy(dst, src.data(), src.size() * sizeof(T));
}

}  // namespace

extern "C" {

void* fugu_builder_new() { return new Builder(); }

void fugu_builder_add_doc(void* h, const char* data, const int64_t* offsets,
                          int64_t n_values) {
  static_cast<Builder*>(h)->add_doc(data, offsets[n_values], n_values,
                                    offsets);
}

// Batched ingestion: the whole batch's values concatenated in `data`,
// `value_offsets` (n_values_total + 1) delimiting each value, and
// `doc_value_counts` (n_docs) giving how many values each doc owns.
// One FFI crossing instead of one per document (the per-call ctypes
// overhead measured ~40us/doc — the ingest hot loop's largest cost).
void fugu_builder_add_docs(void* h, const char* data,
                           const int64_t* value_offsets,
                           const int64_t* doc_value_counts, int64_t n_docs) {
  Builder* b = static_cast<Builder*>(h);
  int64_t v = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    int64_t nv = doc_value_counts[d];
    const int64_t* offs = value_offsets + v;
    int64_t base = offs[0];
    // add_doc expects value-relative offsets starting at 0; rebase the
    // slice of the shared offset table on the stack for small nv
    if (nv <= 15) {
      int64_t local[16];
      for (int64_t i = 0; i <= nv; ++i) local[i] = offs[i] - base;
      b->add_doc(data + base, local[nv], nv, local);
    } else {
      std::vector<int64_t> local(nv + 1);
      for (int64_t i = 0; i <= nv; ++i) local[i] = offs[i] - base;
      b->add_doc(data + base, local[nv], nv, local.data());
    }
    v += nv;
  }
}

void* fugu_builder_finish(void* h) {
  Builder* b = static_cast<Builder*>(h);
  Result* r = new Result();
  std::vector<int32_t> order(b->postings.size());
  for (size_t i = 0; i < order.size(); ++i)
    order[i] = static_cast<int32_t>(i);
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t c) {
    return *b->term_strs[a] < *b->term_strs[c];
  });
  r->pos_offsets.push_back(0);
  for (int32_t id : order) {
    Posting& p = b->postings[id];
    const std::string& t = *b->term_strs[id];
    r->term_blob += t;
    r->term_lens.push_back(static_cast<int32_t>(t.size()));
    r->term_dfs.push_back(static_cast<int32_t>(p.docs.size()));
    // docs were appended in increasing doc order already; the term's
    // flat position arena is grouped per doc in the same order
    r->post_docs.insert(r->post_docs.end(), p.docs.begin(), p.docs.end());
    r->post_tfs.insert(r->post_tfs.end(), p.tfs.begin(), p.tfs.end());
    int64_t base = static_cast<int64_t>(r->pos_data.size());
    r->pos_data.insert(r->pos_data.end(), p.pos_data.begin(),
                       p.pos_data.end());
    for (int64_t e : p.pos_ends) r->pos_offsets.push_back(base + e);
  }
  r->doc_token_counts = b->doc_token_counts;
  return r;
}

void fugu_builder_free(void* h) { delete static_cast<Builder*>(h); }

int64_t fugu_result_n_terms(void* h) {
  return static_cast<Result*>(h)->term_lens.size();
}
int64_t fugu_result_n_postings(void* h) {
  return static_cast<Result*>(h)->post_docs.size();
}
int64_t fugu_result_n_positions(void* h) {
  return static_cast<Result*>(h)->pos_data.size();
}
int64_t fugu_result_term_blob_size(void* h) {
  return static_cast<Result*>(h)->term_blob.size();
}
int64_t fugu_result_n_docs(void* h) {
  return static_cast<Result*>(h)->doc_token_counts.size();
}

void fugu_result_copy(void* h, char* term_blob, int32_t* term_lens,
                      int32_t* term_dfs, int32_t* post_docs,
                      int32_t* post_tfs, int64_t* pos_offsets,
                      int32_t* pos_data, int64_t* doc_token_counts) {
  Result* r = static_cast<Result*>(h);
  if (!r->term_blob.empty())
    std::memcpy(term_blob, r->term_blob.data(), r->term_blob.size());
  copy_vec(term_lens, r->term_lens);
  copy_vec(term_dfs, r->term_dfs);
  copy_vec(post_docs, r->post_docs);
  copy_vec(post_tfs, r->post_tfs);
  copy_vec(pos_offsets, r->pos_offsets);
  copy_vec(pos_data, r->pos_data);
  copy_vec(doc_token_counts, r->doc_token_counts);
}

void fugu_result_free(void* h) { delete static_cast<Result*>(h); }

// standalone tokenizer for query-side use: returns lowered tokens as a
// blob + lengths + positions (caller frees with fugu_tokens_free)
struct TokenResult {
  std::string blob;
  std::vector<int32_t> lens;
  std::vector<int32_t> positions;
};

void* fugu_tokenize(const char* data, int64_t len) {
  TokenResult* r = new TokenResult();
  const uint8_t* p = reinterpret_cast<const uint8_t*>(data);
  const uint8_t* end = p + len;
  int pos = 0;
  std::string token;
  size_t raw_bytes = 0;
  bool in_token = false;
  auto flush = [&](bool valid) {
    if (valid && raw_bytes < kLongTokenByteLimit) {
      r->blob += token;
      r->lens.push_back(static_cast<int32_t>(token.size()));
      r->positions.push_back(pos);
    }
    ++pos;
  };
  while (p < end) {
    uint32_t cp;
    int n = decode_utf8(p, end, &cp);
    if (is_alnum(cp)) {
      if (!in_token) {
        in_token = true;
        token.clear();
        raw_bytes = 0;
      }
      raw_bytes += n;
      append_lower_utf8(cp, &token);
    } else if (in_token) {
      in_token = false;
      flush(true);
    }
    p += n;
  }
  if (in_token) flush(true);
  return r;
}

int64_t fugu_tokens_count(void* h) {
  return static_cast<TokenResult*>(h)->lens.size();
}
int64_t fugu_tokens_blob_size(void* h) {
  return static_cast<TokenResult*>(h)->blob.size();
}
void fugu_tokens_copy(void* h, char* blob, int32_t* lens, int32_t* positions) {
  TokenResult* r = static_cast<TokenResult*>(h);
  if (!r->blob.empty()) std::memcpy(blob, r->blob.data(), r->blob.size());
  copy_vec(lens, r->lens);
  copy_vec(positions, r->positions);
}
void fugu_tokens_free(void* h) { delete static_cast<TokenResult*>(h); }

}  // extern "C"
