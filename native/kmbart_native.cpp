// Native host-side kernels for kmbart_tpu.
//
// Replaces the reference's host-native dependencies with owned C++:
//   - nms:          the CUDA NMS kernel of bottom-up-attention
//                   (scripts/feature_extractor.py:12) for the offline
//                   feature pipeline's CPU path;
//   - meteor_resolve: the Java METEOR aligner core (pycocoevalcap meteor
//                   jar, src/evaluation.py:12) — beam-search resolution of
//                   candidate span matches preferring (most covered words,
//                   fewest chunks, smallest total start distance);
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
#include <cstdlib>
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
// METEOR aligner core (the jar Aligner's resolution step). Input: candidate
// span matches cands[k*5] = {h_start, h_len, r_start, r_len, stage}. Beam
// search over one-to-one alignments preferring, lexicographically, (most
// covered words, fewest chunks, smallest total |h_start - r_start|) —
// identical semantics to the Python fallback (kmbart_tpu/eval/meteor.py
// Meteor._resolve). Requires rn <= 63 (ref coverage bitmask). Writes the
// winning candidate indices to out[] and returns their count (or -1 when
// rn > 63, in which case the caller should use the Python path).
// ---------------------------------------------------------------------------
int meteor_resolve(const int32_t* cands, int n_cands, int rn, int beam,
                   int32_t* out) {
  if (rn > 63) return -1;
  struct State {
    int covered, chunks, dist, h_pos, h_end, r_end;
    uint64_t r_mask;
    int parent, cand;  // backtracking chain into the per-round arena
  };
  int max_h = 0;
  for (int k = 0; k < n_cands; ++k)
    max_h = std::max(max_h, cands[k * 5] + cands[k * 5 + 1]);
  std::vector<std::vector<int>> by_start(max_h + 1);
  for (int k = 0; k < n_cands; ++k) by_start[cands[k * 5]].push_back(k);

  std::vector<State> arena;  // every state ever created (for backtracking)
  arena.push_back({0, 0, 0, 0, -1, -1, 0ull, -1, -1});
  std::vector<int> states = {0};
  std::vector<int> nxt;
  auto better = [&](int a, int b) {
    const State &x = arena[a], &y = arena[b];
    if (x.covered != y.covered) return x.covered > y.covered;
    if (x.chunks != y.chunks) return x.chunks < y.chunks;
    return x.dist < y.dist;
  };

  for (int pos = 0; pos < max_h; ++pos) {
    nxt.clear();
    for (int sid : states) {
      State st = arena[sid];
      if (st.h_pos > pos) {
        nxt.push_back(sid);
        continue;
      }
      State skip = st;
      skip.h_pos = pos + 1;
      arena.push_back(skip);
      nxt.push_back((int)arena.size() - 1);
      for (int k : by_start[pos]) {
        int i = cands[k * 5], n = cands[k * 5 + 1];
        int j = cands[k * 5 + 2], m = cands[k * 5 + 3];
        uint64_t span = ((m >= 64 ? ~0ull : ((1ull << m) - 1ull)) << j);
        if (st.r_mask & span) continue;
        bool cont = (i == st.h_end && j == st.r_end);
        State nu;
        nu.covered = st.covered + n + m;
        nu.chunks = st.chunks + (cont ? 0 : 1);
        nu.dist = st.dist + std::abs(i - j);
        nu.h_pos = i + n;
        nu.h_end = i + n;
        nu.r_end = j + m;
        nu.r_mask = st.r_mask | span;
        nu.parent = sid;
        nu.cand = k;
        arena.push_back(nu);
        nxt.push_back((int)arena.size() - 1);
      }
    }
    std::stable_sort(nxt.begin(), nxt.end(), better);
    // drop duplicate (h_pos, r_mask, h_end, r_end) keeping the best-ranked
    states.clear();
    std::unordered_map<uint64_t, std::vector<int>> seen;  // r_mask -> ids
    for (int sid : nxt) {
      const State& s = arena[sid];
      auto& bucket = seen[s.r_mask];
      bool dup = false;
      for (int o : bucket) {
        const State& t = arena[o];
        if (t.h_pos == s.h_pos && t.h_end == s.h_end && t.r_end == s.r_end) {
          dup = true;
          break;
        }
      }
      if (dup) continue;
      bucket.push_back(sid);
      states.push_back(sid);
      if ((int)states.size() >= beam) break;
    }
  }
  if (states.empty()) return 0;
  int n_out = 0;
  for (int sid = states[0]; arena[sid].parent >= 0; sid = arena[sid].parent)
    out[n_out++] = arena[sid].cand;
  std::reverse(out, out + n_out);
  return n_out;
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
