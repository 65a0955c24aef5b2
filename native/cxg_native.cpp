// Native host runtime for controllable_xgating_tpu.
//
// The reference's native components are its two Java metric tools (Stanford
// PTBTokenizer jar, meteor-1.5.jar — SURVEY.md §2); everything else is
// Python. This library is the TPU-framework counterpart: the host-side hot
// paths that sit next to the device compute —
//
//   * cxg_build_df: n-gram hashing + document-frequency table construction
//     over the whole train corpus (the input to the on-device SCST CIDEr-D
//     reward, ops/cider_device.py). The pure-Python builder is O(N*S*L*n)
//     interpreter ops (~minutes at MSR-VTT scale on this 1-vCPU host);
//     this runs in milliseconds.
//   * cxg_cider_d: batch CIDEr-D over token-id candidates for host-side
//     eval, exactly matching metrics/cider.py (golden-tested).
//
// Contracts mirror ops/cider_device.py: PAD=0, BOS=1, EOS=2 are non-words;
// n-grams are hashed with two independent 32-bit polynomial hashes
// (h = h*M + (tok+1), M1=2654435761, M2=0x85EBCA6B); the df table is sorted
// lexicographically by (h1, h2).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
// Bind:  ctypes (controllable_xgating_tpu/utils/native.py) with Python
//        fallback when the .so is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr int32_t PAD = 0, BOS = 1, EOS = 2;
constexpr uint32_t M1 = 2654435761u;
constexpr uint32_t M2 = 0x85EBCA6Bu;
constexpr int MAX_N = 4;
constexpr double SIGMA = 6.0;

inline bool is_word(int32_t t) { return t != PAD && t != BOS && t != EOS; }

// All n-gram (h1,h2) keys of one caption, packed as uint64 (h1<<32)|h2.
inline void caption_ngrams(const int32_t* toks, int64_t l,
                           std::vector<uint64_t>* out) {
  for (int64_t i = 0; i < l; ++i) {
    if (!is_word(toks[i])) continue;
    uint32_t a = 0, b = 0;
    for (int n = 0; n < MAX_N && i + n < l; ++n) {
      if (!is_word(toks[i + n])) break;
      a = a * M1 + static_cast<uint32_t>(toks[i + n] + 1);
      b = b * M2 + static_cast<uint32_t>(toks[i + n] + 1);
      out->push_back((static_cast<uint64_t>(a) << 32) | b);
    }
  }
}

// n-gram -> (order, count) term frequency map of one caption.
inline void caption_tf(const int32_t* toks, int64_t l,
                       std::unordered_map<uint64_t, int32_t> tf[MAX_N],
                       int64_t* n_words) {
  *n_words = 0;
  for (int64_t i = 0; i < l; ++i) {
    if (!is_word(toks[i])) continue;
    ++*n_words;
    uint32_t a = 0, b = 0;
    for (int n = 0; n < MAX_N && i + n < l; ++n) {
      if (!is_word(toks[i + n])) break;
      a = a * M1 + static_cast<uint32_t>(toks[i + n] + 1);
      b = b * M2 + static_cast<uint32_t>(toks[i + n] + 1);
      ++tf[n][(static_cast<uint64_t>(a) << 32) | b];
    }
  }
}

}  // namespace

extern "C" {

// Document frequencies over `n_df` selected videos. Writes sorted
// (h1, h2, df) triples; returns the entry count, or -1 if it exceeds `cap`.
int64_t cxg_build_df(const int32_t* caps, const int32_t* ncaps,
                     int64_t n_videos, int64_t s, int64_t l,
                     const int64_t* df_video_indices, int64_t n_df,
                     uint32_t* out_h1, uint32_t* out_h2, float* out_df,
                     int64_t cap) {
  std::unordered_map<uint64_t, float> df;
  df.reserve(1 << 16);
  std::vector<uint64_t> keys;
  std::unordered_set<uint64_t> seen;
  for (int64_t d = 0; d < n_df; ++d) {
    const int64_t v = df_video_indices[d];
    if (v < 0 || v >= n_videos) return -2;
    seen.clear();
    const int64_t nc = std::min<int64_t>(ncaps[v], s);
    for (int64_t j = 0; j < nc; ++j) {
      keys.clear();
      caption_ngrams(caps + (v * s + j) * l, l, &keys);
      seen.insert(keys.begin(), keys.end());
    }
    for (uint64_t k : seen) df[k] += 1.0f;
  }
  if (static_cast<int64_t>(df.size()) > cap) return -1;
  std::vector<uint64_t> sorted;
  sorted.reserve(df.size());
  for (auto& kv : df) sorted.push_back(kv.first);
  std::sort(sorted.begin(), sorted.end());
  for (size_t i = 0; i < sorted.size(); ++i) {
    out_h1[i] = static_cast<uint32_t>(sorted[i] >> 32);
    out_h2[i] = static_cast<uint32_t>(sorted[i] & 0xFFFFFFFFu);
    out_df[i] = df[sorted[i]];
  }
  return static_cast<int64_t>(sorted.size());
}

// CIDEr-D of `b` candidates (cand: int32 [b, lc]) against their videos'
// GT caption sets, using a (h1,h2,df) table of `m` entries and log_n =
// log(#df documents). Scores written to out[b].
void cxg_cider_d(const int32_t* cand, int64_t b, int64_t lc,
                 const int32_t* video_indices,
                 const int32_t* caps, const int32_t* ncaps,
                 int64_t /*n_videos*/, int64_t s, int64_t l,
                 const uint32_t* h1, const uint32_t* h2, const float* dfv,
                 int64_t m, float log_n, float* out) {
  // rebuild the lookup map once
  std::unordered_map<uint64_t, float> df;
  df.reserve(m * 2);
  for (int64_t i = 0; i < m; ++i)
    df[(static_cast<uint64_t>(h1[i]) << 32) | h2[i]] = dfv[i];
  auto idf = [&](uint64_t key) {
    auto it = df.find(key);
    const double d = it == df.end() ? 0.0 : it->second;
    return log_n - std::log(std::max(d, 1.0));
  };

  for (int64_t bi = 0; bi < b; ++bi) {
    std::unordered_map<uint64_t, int32_t> ctf[MAX_N];
    int64_t clen = 0;
    caption_tf(cand + bi * lc, lc, ctf, &clen);
    double cnorm2[MAX_N] = {0, 0, 0, 0};
    for (int n = 0; n < MAX_N; ++n)
      for (auto& kv : ctf[n]) {
        const double g = kv.second * idf(kv.first);
        cnorm2[n] += g * g;
      }

    const int64_t v = video_indices[bi];
    const int64_t nc = std::min<int64_t>(ncaps[v], s);
    double total = 0.0;
    for (int64_t j = 0; j < nc; ++j) {
      std::unordered_map<uint64_t, int32_t> rtf[MAX_N];
      int64_t rlen = 0;
      caption_tf(caps + (v * s + j) * l, l, rtf, &rlen);
      const double delta = static_cast<double>(clen - rlen);
      const double pen = std::exp(-delta * delta / (2.0 * SIGMA * SIGMA));
      double sim_sum = 0.0;
      for (int n = 0; n < MAX_N; ++n) {
        double rnorm2 = 0.0, dot = 0.0;
        for (auto& kv : rtf[n]) {
          const double w = idf(kv.first);
          const double gr = kv.second * w;
          rnorm2 += gr * gr;
          auto it = ctf[n].find(kv.first);
          if (it != ctf[n].end()) {
            const double gc = it->second * w;
            dot += std::min(gc, gr) * gr;
          }
        }
        if (cnorm2[n] > 0.0 && rnorm2 > 0.0)
          sim_sum += dot / (std::sqrt(cnorm2[n]) * std::sqrt(rnorm2));
      }
      total += pen * sim_sum / MAX_N * 10.0;
    }
    out[bi] = nc > 0 ? static_cast<float>(total / nc) : 0.0f;
  }
}

}  // extern "C"
