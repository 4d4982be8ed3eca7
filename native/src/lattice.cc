#include "lattice.h"

#include <algorithm>
#include <cstring>
#include <limits>
#include <queue>
#include <stdexcept>

namespace lctc {

static const char kLatMagic[] = "LAT1";

void Lattice::Write(ByteSink* sink) const {
  sink->Write(kLatMagic, 4);
  int32_t n = NumStates();
  sink->Write(&n, 4);
  sink->Write(&start_, 4);
  for (int32_t s = 0; s < n; ++s) {
    const auto& fin = final_[s];
    unsigned char flag = fin.is_final ? 1 : 0;
    sink->Write(&flag, 1);
    if (fin.is_final) {
      sink->Write(&fin.graph_cost, 4);
      sink->Write(&fin.acoustic_cost, 4);
    }
    int32_t num_arcs = static_cast<int32_t>(arcs_[s].size());
    sink->Write(&num_arcs, 4);
    sink->Write(arcs_[s].data(), sizeof(LatticeArc) * arcs_[s].size());
  }
}

bool Lattice::Read(ByteSource* src, std::string* key, Lattice* lat) {
  int c;
  key->clear();
  while ((c = src->Peek()) != EOF &&
         (c == ' ' || c == '\n' || c == '\t' || c == '\r')) {
    char tmp;
    src->Read(&tmp, 1);
  }
  if (src->Eof()) return false;
  char ch;
  while (src->Read(&ch, 1)) {
    if (ch == ' ') break;
    key->push_back(ch);
  }
  char header[6];
  if (!src->Read(header, 6) || header[0] != '\0' || header[1] != 'B' ||
      std::memcmp(header + 2, kLatMagic, 4) != 0) {
    throw std::runtime_error("bad lattice entry for key " + *key);
  }
  auto need = [&](void* dst, size_t len) {
    if (!src->Read(dst, len)) {
      throw std::runtime_error("truncated lattice entry for key " + *key);
    }
  };
  int32_t n;
  need(&n, 4);
  *lat = Lattice();
  need(&lat->start_, 4);
  if (n < 0) {
    throw std::runtime_error("corrupt lattice entry for key " + *key);
  }
  lat->arcs_.resize(n);
  lat->final_.resize(n);
  for (int32_t s = 0; s < n; ++s) {
    unsigned char flag;
    need(&flag, 1);
    if (flag) {
      lat->final_[s].is_final = true;
      need(&lat->final_[s].graph_cost, 4);
      need(&lat->final_[s].acoustic_cost, 4);
    }
    int32_t num_arcs;
    need(&num_arcs, 4);
    if (num_arcs < 0) {
      throw std::runtime_error("corrupt lattice entry for key " + *key);
    }
    lat->arcs_[s].resize(num_arcs);
    if (num_arcs) {
      need(lat->arcs_[s].data(), sizeof(LatticeArc) * num_arcs);
    }
  }
  return true;
}

void Lattice::ScaleAcoustic(float scale) {
  for (auto& arcs : arcs_) {
    for (auto& arc : arcs) arc.acoustic_cost *= scale;
  }
  for (auto& fin : final_) {
    if (fin.is_final) fin.acoustic_cost *= scale;
  }
}

std::vector<int32_t> Lattice::BestPath(std::vector<int32_t>* tokens,
                                       float* total_cost) const {
  constexpr float kInf = std::numeric_limits<float>::infinity();
  int32_t n = NumStates();
  std::vector<float> dist(n, kInf);
  std::vector<int32_t> from(n, -1);
  std::vector<int32_t> via(n, -1);  // arc index on predecessor
  using Item = std::pair<float, int32_t>;
  std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
  if (start_ < 0) return {};
  dist[start_] = 0.0f;
  pq.push({0.0f, start_});
  while (!pq.empty()) {
    auto [d, s] = pq.top();
    pq.pop();
    if (d > dist[s]) continue;
    const auto& arcs = arcs_[s];
    for (size_t i = 0; i < arcs.size(); ++i) {
      float nd = d + arcs[i].graph_cost + arcs[i].acoustic_cost;
      if (nd < dist[arcs[i].nextstate]) {
        dist[arcs[i].nextstate] = nd;
        from[arcs[i].nextstate] = s;
        via[arcs[i].nextstate] = static_cast<int32_t>(i);
        pq.push({nd, arcs[i].nextstate});
      }
    }
  }
  // best final
  float best = kInf;
  int32_t best_state = -1;
  for (int32_t s = 0; s < n; ++s) {
    if (!final_[s].is_final || dist[s] == kInf) continue;
    float total = dist[s] + final_[s].graph_cost + final_[s].acoustic_cost;
    if (total < best) {
      best = total;
      best_state = s;
    }
  }
  std::vector<int32_t> words;
  if (best_state < 0) return words;
  if (total_cost) *total_cost = best;
  std::vector<int32_t> toks;
  for (int32_t s = best_state; from[s] >= 0; s = from[s]) {
    const LatticeArc& arc = arcs_[from[s]][via[s]];
    if (arc.olabel != 0) words.push_back(arc.olabel);
    if (arc.ilabel != 0) toks.push_back(arc.ilabel);
  }
  std::reverse(words.begin(), words.end());
  if (tokens) {
    std::reverse(toks.begin(), toks.end());
    *tokens = toks;
  }
  return words;
}

bool Lattice::Prune(float beam,
                    const std::vector<int32_t>* extra_finals,
                    std::vector<int32_t>* remap_out) {
  constexpr float kInf = std::numeric_limits<float>::infinity();
  const int32_t n = NumStates();
  if (start_ < 0 || n == 0) return true;

  // Kahn topological order (lattices are DAGs; bail on cycles)
  std::vector<int32_t> indeg(n, 0);
  for (const auto& arcs : arcs_) {
    for (const auto& a : arcs) ++indeg[a.nextstate];
  }
  std::vector<int32_t> order;
  order.reserve(n);
  for (int32_t s = 0; s < n; ++s) {
    if (indeg[s] == 0) order.push_back(s);
  }
  for (size_t i = 0; i < order.size(); ++i) {
    for (const auto& a : arcs_[order[i]]) {
      if (--indeg[a.nextstate] == 0) order.push_back(a.nextstate);
    }
  }
  if (static_cast<int32_t>(order.size()) != n) return false;  // cyclic

  auto cost = [](const LatticeArc& a) {
    return a.graph_cost + a.acoustic_cost;
  };
  std::vector<float> alpha(n, kInf), beta(n, kInf);
  alpha[start_] = 0.0f;
  for (int32_t s : order) {
    if (alpha[s] == kInf) continue;
    for (const auto& a : arcs_[s]) {
      alpha[a.nextstate] = std::min(alpha[a.nextstate],
                                    alpha[s] + cost(a));
    }
  }
  float best = kInf;
  for (int32_t s = 0; s < n; ++s) {
    if (final_[s].is_final && alpha[s] != kInf) {
      beta[s] = final_[s].graph_cost + final_[s].acoustic_cost;
      best = std::min(best, alpha[s] + beta[s]);
    }
  }
  if (extra_finals) {
    for (int32_t s : *extra_finals) {
      if (alpha[s] != kInf) {
        // Each frontier state is its OWN reference (beta = −alpha, so
        // its total is 0): a path survives on its slack vs the best
        // path into the SAME frontier token, never vs the globally
        // best token (Kaldi PruneActiveTokens semantics).  Frontier
        // tokens therefore always survive — the decode beam owns
        // frontier pruning — and results cannot depend on when/how
        // often the in-progress prune runs (prune_interval/max_mem
        // stay memory-only knobs).
        beta[s] = std::min(beta[s], -alpha[s]);
        best = std::min(best, 0.0f);
      }
    }
  }
  for (auto it = order.rbegin(); it != order.rend(); ++it) {
    for (const auto& a : arcs_[*it]) {
      if (beta[a.nextstate] != kInf) {
        beta[*it] = std::min(beta[*it], cost(a) + beta[a.nextstate]);
      }
    }
  }
  if (best == kInf) return true;  // nothing reaches a final; leave as-is
  const float limit = best + beam;

  // rebuild with only in-beam arcs/finals + renumbered live states
  std::vector<int32_t> remap(n, -1);
  Lattice out;
  auto live = [&](int32_t s) {
    if (remap[s] < 0) remap[s] = out.AddState();
    return remap[s];
  };
  out.SetStart(live(start_));
  for (int32_t s : order) {
    if (alpha[s] == kInf || alpha[s] + beta[s] > limit) continue;
    int32_t ns = live(s);
    if (final_[s].is_final &&
        alpha[s] + final_[s].graph_cost + final_[s].acoustic_cost
            <= limit) {
      out.SetFinal(ns, final_[s].graph_cost, final_[s].acoustic_cost);
    }
    for (const auto& a : arcs_[s]) {
      if (beta[a.nextstate] == kInf ||
          alpha[s] + cost(a) + beta[a.nextstate] > limit) {
        continue;
      }
      LatticeArc na = a;
      na.nextstate = live(a.nextstate);
      out.AddArc(ns, na);
    }
  }
  if (remap_out) *remap_out = remap;
  *this = std::move(out);
  return true;
}

}  // namespace lctc
