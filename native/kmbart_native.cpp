// Native host-side kernels for kmbart_tpu.
//
// Replaces the reference's host-native dependencies with owned C++:
//   - nms:          the CUDA NMS kernel of bottom-up-attention
//                   (scripts/feature_extractor.py:12) for the offline
//                   feature pipeline's CPU path;
//   - meteor_align: the Java METEOR aligner core (pycocoevalcap meteor jar,
//                   src/evaluation.py:12) — staged greedy one-to-one
//                   matching + chunk counting over precomputed stage
//                   match matrices;
//   - count_ngrams: batched n-gram counting for BLEU/CIDEr over large
//                   corpora (pycocoevalcap bleu/cider Python loops);
//   - gather_pad_rows: data-loader batch assembly — gather ragged ROI
//                   feature rows from a packed memory-mapped cache into a
//                   fixed-shape padded batch (torch DataLoader worker
//                   replacement on the hot path).
//
// Exposed as extern "C" for ctypes (no pybind11 in this image).
// Build: native/build.sh -> kmbart_native.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// NMS: boxes [n,4] xyxy, scores [n]; writes keep flags [n]; returns kept.
// ---------------------------------------------------------------------------
int nms(const float* boxes, const float* scores, int n, float iou_threshold,
        uint8_t* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });

  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    float w = std::max(0.f, boxes[i * 4 + 2] - boxes[i * 4 + 0]);
    float h = std::max(0.f, boxes[i * 4 + 3] - boxes[i * 4 + 1]);
    areas[i] = w * h;
  }
  std::memset(keep_out, 0, n);
  std::vector<uint8_t> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[i] = 1;
    ++kept;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      float xx1 = std::max(boxes[i * 4 + 0], boxes[j * 4 + 0]);
      float yy1 = std::max(boxes[i * 4 + 1], boxes[j * 4 + 1]);
      float xx2 = std::min(boxes[i * 4 + 2], boxes[j * 4 + 2]);
      float yy2 = std::min(boxes[i * 4 + 3], boxes[j * 4 + 3]);
      float inter = std::max(0.f, xx2 - xx1) * std::max(0.f, yy2 - yy1);
      float uni = areas[i] + areas[j] - inter;
      if (uni > 0.f && inter / uni > iou_threshold) suppressed[j] = 1;
    }
  }
  return kept;
}

// ---------------------------------------------------------------------------
// METEOR aligner core. Inputs: per-stage boolean match matrices packed as
// match[s * (hn * rn) + i * rn + j] (stage priority order). Outputs:
// h_match[i] = stage index or -1, r_match[j] likewise, pairs (i -> j) in
// align_out[i]. Returns chunk count. Greedy closest-index per stage —
// identical semantics to the Python fallback (kmbart_tpu/eval/meteor.py).
// ---------------------------------------------------------------------------
int meteor_align(const uint8_t* match, int n_stages, int hn, int rn,
                 int32_t* h_stage, int32_t* align_out) {
  std::vector<uint8_t> h_used(hn, 0), r_used(rn, 0);
  for (int i = 0; i < hn; ++i) {
    h_stage[i] = -1;
    align_out[i] = -1;
  }
  for (int s = 0; s < n_stages; ++s) {
    const uint8_t* m = match + (size_t)s * hn * rn;
    for (int i = 0; i < hn; ++i) {
      if (h_used[i]) continue;
      int best = -1;
      for (int j = 0; j < rn; ++j) {
        if (r_used[j] || !m[i * rn + j]) continue;
        if (best < 0 || std::abs(j - i) < std::abs(best - i)) best = j;
      }
      if (best >= 0) {
        h_used[i] = 1;
        r_used[best] = 1;
        h_stage[i] = s;
        align_out[i] = best;
      }
    }
  }
  // chunks: contiguous (i, j) runs over matches sorted by i
  int chunks = 0;
  int prev_i = -2, prev_j = -2;
  for (int i = 0; i < hn; ++i) {
    if (align_out[i] < 0) continue;
    if (!(i == prev_i + 1 && align_out[i] == prev_j + 1)) ++chunks;
    prev_i = i;
    prev_j = align_out[i];
  }
  return chunks;
}

// ---------------------------------------------------------------------------
// Batched clipped n-gram match counting (the BLEU hot loop):
// hyp/ref are int32 token arrays with lengths; counts matches of 1..max_n
// grams clipped by ref max counts. Writes correct[max_n], guess[max_n].
// ---------------------------------------------------------------------------
struct NgramKey {
  uint64_t h;
  bool operator==(const NgramKey& o) const { return h == o.h; }
};
struct NgramHash {
  size_t operator()(const NgramKey& k) const { return (size_t)k.h; }
};

static inline uint64_t hash_ngram(const int32_t* toks, int start, int n) {
  uint64_t h = 1469598103934665603ull ^ (uint64_t)n;
  for (int i = 0; i < n; ++i) {
    h ^= (uint64_t)(uint32_t)toks[start + i];
    h *= 1099511628211ull;
  }
  return h;
}

void bleu_counts(const int32_t* hyp, int hyp_len, const int32_t* ref,
                 const int32_t* ref_lens, int n_refs, int max_n,
                 int64_t* correct, int64_t* guess) {
  std::unordered_map<NgramKey, int, NgramHash> ref_max;
  int offset = 0;
  for (int r = 0; r < n_refs; ++r) {
    std::unordered_map<NgramKey, int, NgramHash> counts;
    for (int n = 1; n <= max_n; ++n)
      for (int s = 0; s + n <= ref_lens[r]; ++s)
        counts[{hash_ngram(ref, offset + s, n)}]++;
    for (auto& kv : counts) {
      int& cur = ref_max[kv.first];
      cur = std::max(cur, kv.second);
    }
    offset += ref_lens[r];
  }
  for (int n = 1; n <= max_n; ++n) {
    guess[n - 1] = std::max(0, hyp_len - n + 1);
    std::unordered_map<NgramKey, int, NgramHash> hyp_counts;
    for (int s = 0; s + n <= hyp_len; ++s)
      hyp_counts[{hash_ngram(hyp, s, n)}]++;
    int64_t c = 0;
    for (auto& kv : hyp_counts) {
      auto it = ref_max.find(kv.first);
      if (it != ref_max.end()) c += std::min(kv.second, it->second);
    }
    correct[n - 1] = c;
  }
}

// ---------------------------------------------------------------------------
// Fixed-shape batch assembly from a packed feature cache:
// src: one big [total_rows, feat] float32 block; offsets[i]/counts[i] pick
// example i's rows; writes dst [batch, max_rows, feat] zero-padded.
// ---------------------------------------------------------------------------
void gather_pad_rows(const float* src, const int64_t* offsets,
                     const int32_t* counts, int batch, int max_rows, int feat,
                     float* dst) {
  std::memset(dst, 0, (size_t)batch * max_rows * feat * sizeof(float));
  for (int b = 0; b < batch; ++b) {
    int rows = std::min(counts[b], max_rows);
    std::memcpy(dst + (size_t)b * max_rows * feat,
                src + (size_t)offsets[b] * feat,
                (size_t)rows * feat * sizeof(float));
  }
}

}  // extern "C"
