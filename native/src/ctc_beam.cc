// CTC prefix beam search over one utterance's [T, V] log-posteriors.
//
// Native-equivalent of the in-graph C++ ctc_beam_search_decoder the
// reference invokes (reference nnet/graph.py:267-272) — the Python
// prefix beam search in lstm_ctc_tpu/ops/decode.py is the semantic
// specification; this library is the fast path nnet-decode.py uses for
// real test sets.  Exposed with a C ABI for ctypes.
//
// Algorithm: standard CTC prefix beam search.  Prefixes live in a
// parent-pointer arena (no string copies); each frame extends the
// current beams with the top-K classes, accumulating (p_blank,
// p_nonblank) in the log semiring, then keeps the beam_width most
// probable prefixes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -std::numeric_limits<float>::infinity();

inline float LogAdd(float a, float b) {
  if (a == kNegInf) return b;
  if (b == kNegInf) return a;
  const float m = std::max(a, b);
  return m + std::log1p(std::exp(std::min(a, b) - m));
}

struct PrefixNode {
  int32_t parent;  // -1 for the empty prefix
  int32_t label;
  int32_t length;
};

struct Beam {
  int32_t node;
  float p_b;   // log prob of paths ending in blank
  float p_nb;  // log prob of paths ending in the final label
  float Total() const { return LogAdd(p_b, p_nb); }
};

}  // namespace

extern "C" {

// Returns the number of paths written (<= top_paths), or -1 if
// out_labels capacity is insufficient.  Labels for path i occupy
// out_labels[sum(out_lens[:i]) .. +out_lens[i]].
int ctc_beam_search(const float* log_probs, int num_frames, int num_classes,
                    int beam_width, int blank_id, int top_paths,
                    int topk_per_frame, int32_t* out_labels,
                    int32_t* out_lens, int max_labels) {
  if (num_frames < 0 || num_classes <= 0 || beam_width <= 0 ||
      blank_id < 0 || blank_id >= num_classes || top_paths <= 0) {
    return -1;
  }
  std::vector<PrefixNode> arena;
  arena.push_back({-1, -1, 0});  // node 0: empty prefix

  std::vector<Beam> beams{{0, 0.0f, kNegInf}};

  // child lookup: (node << 32 | label) -> extension node
  std::unordered_map<uint64_t, int32_t> children;
  auto child_of = [&](int32_t node, int32_t label) {
    const uint64_t key =
        (static_cast<uint64_t>(static_cast<uint32_t>(node)) << 32) |
        static_cast<uint32_t>(label);
    auto it = children.find(key);
    if (it != children.end()) return it->second;
    const int32_t id = static_cast<int32_t>(arena.size());
    arena.push_back({node, label, arena[node].length + 1});
    children.emplace(key, id);
    return id;
  };

  // per-frame candidate scores: node -> beam slot
  std::unordered_map<int32_t, int32_t> slot;
  std::vector<Beam> next;
  std::vector<int32_t> topk;
  std::vector<int32_t> order(num_classes);

  const int keep = topk_per_frame > 0
                       ? std::min(topk_per_frame, num_classes)
                       : num_classes;

  for (int t = 0; t < num_frames; ++t) {
    const float* lp = log_probs + static_cast<int64_t>(t) * num_classes;

    topk.clear();
    if (keep == num_classes) {
      for (int c = 0; c < num_classes; ++c) topk.push_back(c);
    } else {
      for (int c = 0; c < num_classes; ++c) order[c] = c;
      std::partial_sort(order.begin(), order.begin() + keep, order.end(),
                        [&](int a, int b) { return lp[a] > lp[b]; });
      topk.assign(order.begin(), order.begin() + keep);
    }

    slot.clear();
    next.clear();
    auto accum = [&](int32_t node, float add_b, float add_nb) {
      auto it = slot.find(node);
      if (it == slot.end()) {
        slot.emplace(node, static_cast<int32_t>(next.size()));
        next.push_back({node, add_b, add_nb});
      } else {
        Beam& b = next[it->second];
        b.p_b = LogAdd(b.p_b, add_b);
        b.p_nb = LogAdd(b.p_nb, add_nb);
      }
    };

    for (const Beam& b : beams) {
      const float p_tot = b.Total();
      const int32_t last = arena[b.node].label;
      for (int32_t c : topk) {
        const float c_lp = lp[c];
        if (c == blank_id) {
          accum(b.node, p_tot + c_lp, kNegInf);
        } else if (c == last) {
          // repeat extends the non-blank path of the same prefix...
          accum(b.node, kNegInf, b.p_nb + c_lp);
          // ...or starts a new occurrence after a blank
          accum(child_of(b.node, c), kNegInf, b.p_b + c_lp);
        } else {
          accum(child_of(b.node, c), kNegInf, p_tot + c_lp);
        }
      }
    }

    const size_t kept =
        std::min(static_cast<size_t>(beam_width), next.size());
    std::partial_sort(next.begin(), next.begin() + kept, next.end(),
                      [](const Beam& a, const Beam& b) {
                        return a.Total() > b.Total();
                      });
    next.resize(kept);
    beams.swap(next);
  }

  std::sort(beams.begin(), beams.end(), [](const Beam& a, const Beam& b) {
    return a.Total() > b.Total();
  });

  const int n = std::min<int>(top_paths, static_cast<int>(beams.size()));
  int written = 0;
  for (int i = 0; i < n; ++i) {
    const int len = arena[beams[i].node].length;
    if (written + len > max_labels) return -1;
    // walk parent pointers, fill reversed
    int32_t node = beams[i].node;
    for (int k = len - 1; k >= 0; --k) {
      out_labels[written + k] = arena[node].label;
      node = arena[node].parent;
    }
    out_lens[i] = len;
    written += len;
  }
  return n;
}

}  // extern "C"
