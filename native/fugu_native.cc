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

struct Posting {
  std::vector<int32_t> docs;
  std::vector<int32_t> tfs;
  std::vector<std::vector<int32_t>> positions;
};

struct Builder {
  std::unordered_map<std::string, Posting> postings;
  std::vector<int64_t> doc_token_counts;
  int32_t next_doc = 0;

  // scratch reused across docs
  std::unordered_map<std::string, std::vector<int32_t>> doc_terms;

  void add_doc(const char* data, int64_t len, int64_t n_values,
               const int64_t* value_offsets) {
    int32_t doc = next_doc++;
    doc_terms.clear();
    int64_t n_tokens = 0;
    int pos_base = 0;
    for (int64_t v = 0; v < n_values; ++v) {
      const uint8_t* p =
          reinterpret_cast<const uint8_t*>(data) + value_offsets[v];
      const uint8_t* end =
          reinterpret_cast<const uint8_t*>(data) + value_offsets[v + 1];
      int pos = 0;
      int last_pos = -1;
      std::string token;
      size_t raw_bytes = 0;
      bool in_token = false;
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
          if (raw_bytes < kLongTokenByteLimit) {
            doc_terms[token].push_back(pos_base + pos);
            ++n_tokens;
            last_pos = std::max(last_pos, pos);
          }
          ++pos;
        }
        p += n;
      }
      if (in_token) {
        if (raw_bytes < kLongTokenByteLimit) {
          doc_terms[token].push_back(pos_base + pos);
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
    for (auto& kv : doc_terms) {
      Posting& p = postings[kv.first];
      p.docs.push_back(doc);
      p.tfs.push_back(static_cast<int32_t>(kv.second.size()));
      p.positions.push_back(std::move(kv.second));
    }
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

}  // namespace

extern "C" {

void* fugu_builder_new() { return new Builder(); }

void fugu_builder_add_doc(void* h, const char* data, const int64_t* offsets,
                          int64_t n_values) {
  static_cast<Builder*>(h)->add_doc(data, offsets[n_values], n_values,
                                    offsets);
}

void* fugu_builder_finish(void* h) {
  Builder* b = static_cast<Builder*>(h);
  Result* r = new Result();
  std::vector<const std::string*> terms;
  terms.reserve(b->postings.size());
  for (auto& kv : b->postings) terms.push_back(&kv.first);
  std::sort(terms.begin(), terms.end(),
            [](const std::string* a, const std::string* c) { return *a < *c; });
  r->pos_offsets.push_back(0);
  for (const std::string* t : terms) {
    Posting& p = b->postings[*t];
    r->term_blob += *t;
    r->term_lens.push_back(static_cast<int32_t>(t->size()));
    r->term_dfs.push_back(static_cast<int32_t>(p.docs.size()));
    // docs were appended in increasing doc order already
    for (size_t i = 0; i < p.docs.size(); ++i) {
      r->post_docs.push_back(p.docs[i]);
      r->post_tfs.push_back(p.tfs[i]);
      for (int32_t pos : p.positions[i]) r->pos_data.push_back(pos);
      r->pos_offsets.push_back(static_cast<int64_t>(r->pos_data.size()));
    }
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
  std::memcpy(term_blob, r->term_blob.data(), r->term_blob.size());
  std::memcpy(term_lens, r->term_lens.data(),
              r->term_lens.size() * sizeof(int32_t));
  std::memcpy(term_dfs, r->term_dfs.data(),
              r->term_dfs.size() * sizeof(int32_t));
  std::memcpy(post_docs, r->post_docs.data(),
              r->post_docs.size() * sizeof(int32_t));
  std::memcpy(post_tfs, r->post_tfs.data(),
              r->post_tfs.size() * sizeof(int32_t));
  std::memcpy(pos_offsets, r->pos_offsets.data(),
              r->pos_offsets.size() * sizeof(int64_t));
  std::memcpy(pos_data, r->pos_data.data(),
              r->pos_data.size() * sizeof(int32_t));
  std::memcpy(doc_token_counts, r->doc_token_counts.data(),
              r->doc_token_counts.size() * sizeof(int64_t));
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
  std::memcpy(blob, r->blob.data(), r->blob.size());
  std::memcpy(lens, r->lens.data(), r->lens.size() * sizeof(int32_t));
  std::memcpy(positions, r->positions.data(),
              r->positions.size() * sizeof(int32_t));
}
void fugu_tokens_free(void* h) { delete static_cast<TokenResult*>(h); }

}  // extern "C"
