// mmda_tpu native runtime components (C ABI, loaded via ctypes).
//
// The reference's native layer lives inside its dependencies (ATen/cuDNN -
// SURVEY.md §2.9); its host-side hot paths are pure Python.  This library
// provides C++ implementations of the framework's host-side hot paths:
//
//   1. glove_scan   - one-pass GloVe-840B parse (2.2M lines; the reference's
//                     single biggest ETL cost, src/create_dataset.py:35-51).
//   2. pack_tokens  - ragged token streams -> fixed-shape padded id matrix
//                     (the collate pad path, src/data_loader.py:70-72).
//   3. pack_floats  - ragged (len_i, dim) float features -> (n, max_len, dim)
//                     padded tensor with optional per-instance z-norm
//                     (src/create_dataset.py:198-199 z-norm semantics:
//                     (x - mean) / (1e-6 + std), nan_to_num).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// 1. GloVe scan
// ---------------------------------------------------------------------------
// words: concatenated vocab words separated by '\n' (UTF-8), n_words entries.
// ids:   row index in `emb` for each word.
// emb:   (rows x dim) float64, row-major; rows for found words are overwritten.
// Returns number of vocabulary words found, or -1 on I/O error.
long long glove_scan(const char* path, const char* words,
                     const long long* ids, long long n_words,
                     double* emb, long long rows, long long dim) {
  std::unordered_map<std::string, long long> vocab;
  vocab.reserve(static_cast<size_t>(n_words) * 2);
  {
    const char* p = words;
    for (long long i = 0; i < n_words; ++i) {
      const char* e = strchr(p, '\n');
      if (!e) e = p + strlen(p);
      vocab.emplace(std::string(p, e - p), ids[i]);
      p = (*e) ? e + 1 : e;
    }
  }

  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  long long found = 0;
  std::string line;
  line.reserve(1 << 13);
  std::vector<char> buf(1 << 20);
  std::vector<const char*> fields;
  fields.reserve(512);

  while (fgets(buf.data(), static_cast<int>(buf.size()), f)) {
    line.assign(buf.data());
    // strip trailing newline
    while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
      line.pop_back();
    if (line.empty()) continue;

    // split on single spaces; GloVe tokens may contain spaces, so the vector
    // is the LAST `dim` fields and the word is everything before them.
    fields.clear();
    fields.push_back(line.c_str());
    for (char& c : line) {
      if (c == ' ') {
        c = '\0';
        fields.push_back(&c + 1);
      }
    }
    if (static_cast<long long>(fields.size()) <= dim) continue;

    size_t word_fields = fields.size() - static_cast<size_t>(dim);
    std::string word;
    for (size_t i = 0; i < word_fields; ++i) {
      if (i) word += ' ';
      word += fields[i];
    }
    auto it = vocab.find(word);
    if (it == vocab.end()) continue;
    long long row = it->second;
    if (row < 0 || row >= rows) continue;
    double* dst = emb + row * dim;
    bool ok = true;
    for (long long d = 0; d < dim; ++d) {
      char* end = nullptr;
      dst[d] = strtod(fields[word_fields + d], &end);
      if (end == fields[word_fields + d]) { ok = false; break; }
    }
    if (ok) ++found;
  }
  fclose(f);
  return found;
}

// ---------------------------------------------------------------------------
// 2. Token packing: ragged int32 streams -> (n, max_len) padded matrix
// ---------------------------------------------------------------------------
// tokens: concatenated streams; offsets: (n+1) prefix offsets.
// out: (n x max_len) int32 pre-filled by caller is NOT required - fully
// written here with pad_id.  lengths_out: clipped lengths.
void pack_tokens(const int32_t* tokens, const long long* offsets,
                 long long n, long long max_len, int32_t pad_id,
                 int32_t* out, int32_t* lengths_out) {
  for (long long i = 0; i < n; ++i) {
    long long start = offsets[i];
    long long len = offsets[i + 1] - start;
    if (len > max_len) len = max_len;
    int32_t* row = out + i * max_len;
    memcpy(row, tokens + start, static_cast<size_t>(len) * sizeof(int32_t));
    for (long long t = len; t < max_len; ++t) row[t] = pad_id;
    lengths_out[i] = static_cast<int32_t>(len);
  }
}

// ---------------------------------------------------------------------------
// 3. Float feature packing with optional per-instance z-norm
// ---------------------------------------------------------------------------
// feats: concatenated (len_i x dim) rows; offsets: (n+1) prefix ROW offsets.
// out: (n x max_len x dim) float32, zero-padded.
// znorm: if nonzero, per-instance (over time axis) (x-mean)/(1e-6+std) with
// nan/inf -> 0, matching src/create_dataset.py:198-199 (std is the population
// std over the FULL instance, computed before truncation to max_len).
void pack_floats(const float* feats, const long long* offsets,
                 long long n, long long max_len, long long dim,
                 int znorm, float* out) {
  std::vector<double> mean(dim), var(dim);
  for (long long i = 0; i < n; ++i) {
    long long start = offsets[i];
    long long full_len = offsets[i + 1] - start;
    long long len = full_len > max_len ? max_len : full_len;
    const float* src = feats + start * dim;
    float* dst = out + i * max_len * dim;
    memset(dst, 0, static_cast<size_t>(max_len) * dim * sizeof(float));

    if (!znorm || full_len == 0) {
      memcpy(dst, src, static_cast<size_t>(len) * dim * sizeof(float));
      continue;
    }
    // stats over the full instance (pre-truncation), like the reference which
    // z-norms at segment level before any padding
    for (long long d = 0; d < dim; ++d) { mean[d] = 0.0; var[d] = 0.0; }
    for (long long t = 0; t < full_len; ++t)
      for (long long d = 0; d < dim; ++d) mean[d] += src[t * dim + d];
    for (long long d = 0; d < dim; ++d) mean[d] /= static_cast<double>(full_len);
    for (long long t = 0; t < full_len; ++t)
      for (long long d = 0; d < dim; ++d) {
        double c = src[t * dim + d] - mean[d];
        var[d] += c * c;
      }
    for (long long d = 0; d < dim; ++d)
      var[d] = std::sqrt(var[d] / static_cast<double>(full_len));
    for (long long t = 0; t < len; ++t)
      for (long long d = 0; d < dim; ++d) {
        double v = (src[t * dim + d] - mean[d]) / (1e-6 + var[d]);
        if (!std::isfinite(v)) v = 0.0;
        dst[t * dim + d] = static_cast<float>(v);
      }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// 4. WordPiece encoder (ASCII fast path)
// ---------------------------------------------------------------------------
// The reference's tokenizer is HF's (Rust-backed); our ETL/serving equivalent
// is data/etl/tokenizer.py.  This is its C++ hot path: rows that are pure
// ASCII (all of MOSI/MOSEI transcripts) are encoded here with byte-exact
// parity to the Python implementation; rows containing any byte >= 0x80 are
// flagged for the Python fallback (full-Unicode handling needs unicodedata).
//
// Handle-based API: build the vocab map once, encode many batches.

namespace {

struct WordPieceVocab {
  std::unordered_map<std::string, int32_t> map;
};

inline bool ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

}  // namespace

extern "C" {

// vocab_blob: concatenated UTF-8 vocab entries; offsets: (n+1) byte offsets;
// ids: (n) token id of each entry.  Returns an opaque handle.
void* wordpiece_new(const char* vocab_blob, const long long* offsets,
                    const int32_t* ids, long long n) {
  auto* v = new WordPieceVocab();
  v->map.reserve(static_cast<size_t>(n) * 2);
  for (long long i = 0; i < n; ++i) {
    v->map.emplace(std::string(vocab_blob + offsets[i],
                               vocab_blob + offsets[i + 1]),
                   ids[i]);
  }
  return v;
}

void wordpiece_free(void* handle) {
  delete static_cast<WordPieceVocab*>(handle);
}

// texts: concatenated raw rows; text_offsets: (n+1) byte offsets.
// out_ids/out_mask: (n x max_len) int32, fully written for handled rows.
// fallback: (n) uint8, set to 1 when the row contains non-ASCII bytes and was
// NOT encoded (caller must run the Python path for it).  Returns number of
// rows handled natively.
long long wordpiece_encode_batch(
    void* handle, const char* texts, const long long* text_offsets,
    long long n, long long max_len, int lowercase,
    int32_t unk_id, int32_t cls_id, int32_t sep_id, int32_t pad_id,
    int32_t* out_ids, int32_t* out_mask, unsigned char* fallback) {
  const auto& vocab = static_cast<WordPieceVocab*>(handle)->map;
  const long long max_chars_per_word = 100;
  long long handled = 0;
  if (max_len < 2) {
    // no room for [CLS]+[SEP]: flag every row for the Python path, which
    // raises a proper error instead of writing past the row
    for (long long r = 0; r < n; ++r) fallback[r] = 1;
    return 0;
  }
  std::string cleaned, sub;
  std::vector<std::string> words;
  std::vector<int32_t> ids;

  for (long long r = 0; r < n; ++r) {
    const char* s = texts + text_offsets[r];
    const long long len = text_offsets[r + 1] - text_offsets[r];
    int32_t* row_ids = out_ids + r * max_len;
    int32_t* row_mask = out_mask + r * max_len;

    bool ascii = true;
    for (long long i = 0; i < len; ++i) {
      if (static_cast<unsigned char>(s[i]) >= 0x80) { ascii = false; break; }
    }
    if (!ascii) { fallback[r] = 1; continue; }
    fallback[r] = 0;
    ++handled;

    // _clean + lowercase: controls dropped, \t\n\r/space -> space
    cleaned.clear();
    for (long long i = 0; i < len; ++i) {
      unsigned char c = static_cast<unsigned char>(s[i]);
      if (c == '\t' || c == '\n' || c == '\r' || c == ' ') {
        cleaned.push_back(' ');
      } else if (c < 0x20 || c == 0x7F) {
        continue;  // ASCII control chars (category Cc)
      } else {
        cleaned.push_back(
            (lowercase && c >= 'A' && c <= 'Z') ? (c - 'A' + 'a') : c);
      }
    }

    // whitespace split + punctuation split (ASCII: category-P additions and
    // NFD accent stripping are no-ops)
    words.clear();
    std::string cur;
    auto flush = [&]() { if (!cur.empty()) { words.push_back(cur); cur.clear(); } };
    for (char ch : cleaned) {
      if (ch == ' ') {
        flush();
      } else if (ascii_punct(static_cast<unsigned char>(ch))) {
        flush();
        words.emplace_back(1, ch);
      } else {
        cur.push_back(ch);
      }
    }
    flush();

    // greedy longest-match wordpiece
    ids.clear();
    for (const std::string& w : words) {
      if (static_cast<long long>(w.size()) > max_chars_per_word) {
        ids.push_back(unk_id);
        continue;
      }
      size_t start = 0;
      size_t before = ids.size();
      bool ok = true;
      while (start < w.size()) {
        size_t end = w.size();
        int32_t found = -1;
        while (start < end) {
          sub.assign(start > 0 ? "##" : "");
          sub.append(w, start, end - start);
          auto it = vocab.find(sub);
          if (it != vocab.end()) { found = it->second; break; }
          --end;
        }
        if (found < 0) { ok = false; break; }
        ids.push_back(found);
        start = end;
      }
      if (!ok) {
        ids.resize(before);
        ids.push_back(unk_id);
      }
    }

    // [CLS] ids[:max_len-2] [SEP] + pad
    long long body = static_cast<long long>(ids.size());
    if (body > max_len - 2) body = max_len - 2;
    long long pos = 0;
    row_ids[pos++] = cls_id;
    for (long long i = 0; i < body; ++i) row_ids[pos++] = ids[i];
    row_ids[pos++] = sep_id;
    for (long long i = 0; i < pos; ++i) row_mask[i] = 1;
    for (long long i = pos; i < max_len; ++i) {
      row_ids[i] = pad_id;
      row_mask[i] = 0;
    }
  }
  return handled;
}

}  // extern "C"
