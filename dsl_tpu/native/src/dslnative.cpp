// dslnative: host-side native ops for the TPU detection framework.
//
// The reference's native layer is CUDA NMS kernels + mmcv C++ ops
// (SURVEY.md §2.2). On TPU the device-side NMS lives in XLA/Pallas; what
// remains hot on the *host* is the pseudo-label refresh path (per-class NMS
// fusion over the whole unlabeled set each epoch) and the image
// normalization+padding step of every train/test sample. Those are
// implemented here in C++ (ctypes ABI, no pybind11 dependency).
//
// Build: see dsl_tpu/native/build.py (g++ -O3 -march=native -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Greedy hard-NMS over boxes sorted arbitrarily; returns number kept and
// writes kept indices (score-descending) into `keep_out` (capacity n).
// boxes: (n, 4) xyxy float32; scores: (n,) float32.
int dsl_nms(const float* boxes, const float* scores, int n,
            float iou_threshold, float score_threshold, int* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    areas[i] = std::max(0.f, b[2] - b[0]) * std::max(0.f, b[3] - b[1]);
  }
  int kept = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i] || scores[i] < score_threshold) continue;
    keep_out[kept++] = i;
    const float* bi = boxes + 4 * i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + 4 * j;
      float x1 = std::max(bi[0], bj[0]);
      float y1 = std::max(bi[1], bj[1]);
      float x2 = std::min(bi[2], bj[2]);
      float y2 = std::min(bi[3], bj[3]);
      float inter = std::max(0.f, x2 - x1) * std::max(0.f, y2 - y1);
      float uni = areas[i] + areas[j] - inter;
      if (uni > 0.f && inter / uni > iou_threshold) suppressed[j] = 1;
    }
  }
  return kept;
}

// Per-class NMS fusion for the pseudo-label store: boxes/scores/cids in,
// kept indices out (grouped by class, score-descending within class).
int dsl_batched_nms(const float* boxes, const float* scores,
                    const int32_t* cids, int n, int num_classes,
                    float iou_threshold, float score_threshold,
                    int* keep_out) {
  std::vector<float> cls_boxes;
  std::vector<float> cls_scores;
  std::vector<int> cls_idx;
  std::vector<int> keep_buf;
  int total = 0;
  for (int c = 0; c < num_classes; ++c) {
    cls_boxes.clear();
    cls_scores.clear();
    cls_idx.clear();
    for (int i = 0; i < n; ++i) {
      if (cids[i] == c) {
        cls_idx.push_back(i);
        cls_scores.push_back(scores[i]);
        for (int k = 0; k < 4; ++k) cls_boxes.push_back(boxes[4 * i + k]);
      }
    }
    int m = static_cast<int>(cls_idx.size());
    if (m == 0) continue;
    keep_buf.resize(m);
    int kept = dsl_nms(cls_boxes.data(), cls_scores.data(), m, iou_threshold,
                       score_threshold, keep_buf.data());
    for (int k = 0; k < kept; ++k) keep_out[total++] = cls_idx[keep_buf[k]];
  }
  return total;
}

// Fused normalize + pad: uint8 HxWx3 (BGR) -> float32 canvas CHxCWx3,
// optional BGR->RGB swap, (x - mean) / std, zero right/bottom padding.
void dsl_normalize_pad(const uint8_t* img, int h, int w, const float* mean,
                       const float* std3, int to_rgb, float* canvas,
                       int ch, int cw) {
  const float inv0 = 1.f / std3[0], inv1 = 1.f / std3[1],
              inv2 = 1.f / std3[2];
  for (int y = 0; y < ch; ++y) {
    float* dst = canvas + static_cast<int64_t>(y) * cw * 3;
    if (y >= h) {
      std::memset(dst, 0, sizeof(float) * cw * 3);
      continue;
    }
    const uint8_t* src = img + static_cast<int64_t>(y) * w * 3;
    int x = 0;
    for (; x < std::min(w, cw); ++x) {
      float c0 = static_cast<float>(src[3 * x + 0]);
      float c1 = static_cast<float>(src[3 * x + 1]);
      float c2 = static_cast<float>(src[3 * x + 2]);
      if (to_rgb) std::swap(c0, c2);
      dst[3 * x + 0] = (c0 - mean[0]) * inv0;
      dst[3 * x + 1] = (c1 - mean[1]) * inv1;
      dst[3 * x + 2] = (c2 - mean[2]) * inv2;
    }
    if (x < cw) std::memset(dst + 3 * x, 0, sizeof(float) * (cw - x) * 3);
  }
}

// Pairwise IoU matrix (n, m) — used by host-side eval/matching.
void dsl_iou_matrix(const float* a, int n, const float* b, int m,
                    float* out) {
  std::vector<float> area_b(m);
  for (int j = 0; j < m; ++j) {
    const float* bb = b + 4 * j;
    area_b[j] = std::max(0.f, bb[2] - bb[0]) * std::max(0.f, bb[3] - bb[1]);
  }
  for (int i = 0; i < n; ++i) {
    const float* ba = a + 4 * i;
    float area_a =
        std::max(0.f, ba[2] - ba[0]) * std::max(0.f, ba[3] - ba[1]);
    float* row = out + static_cast<int64_t>(i) * m;
    for (int j = 0; j < m; ++j) {
      const float* bb = b + 4 * j;
      float x1 = std::max(ba[0], bb[0]);
      float y1 = std::max(ba[1], bb[1]);
      float x2 = std::min(ba[2], bb[2]);
      float y2 = std::min(ba[3], bb[3]);
      float inter = std::max(0.f, x2 - x1) * std::max(0.f, y2 - y1);
      float uni = area_a + area_b[j] - inter;
      row[j] = uni > 0.f ? inter / uni : 0.f;
    }
  }
}

}  // extern "C"
