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
