// latgen-faster — lattice-generating beam decoder over a TLG graph.
//
// Native replacement for EESEN's latgen-faster as invoked by the decode
// pipeline (reference scripts/decode_ctc_lat.sh:164-167): reads a Kaldi
// float-matrix archive of frame × token log-likelihoods (posteriors minus
// log-prior, blank rotated to column 0), walks the TLG transducer with
// Viterbi beam search (token ilabel t scores matrix column t-1), and
// writes lattices with factored graph/acoustic costs for the scoring
// sweep.  Flags mirror the EESEN binary: --acoustic-scale, --beam,
// --lattice-beam, --max-active, --allow-partial,
// --word-symbol-table (accepted, used only for logging).
//
// Decoder shape: per frame, emitting expansion with an adaptive beam
// (tightened to max-active by cost quantile), followed by epsilon-closure
// within the frame; every transition that survives within lattice-beam of
// the frame-best lands in the output lattice as an arc between
// (frame, graph-state) nodes, so alternative paths are preserved.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>
#include <iostream>
#include <limits>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

#include "fst.h"
#include "kaldi_io.h"
#include "lattice.h"

using namespace lctc;

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Flags {
  float acoustic_scale = 0.1f;
  float beam = 16.0f;
  float lattice_beam = 10.0f;
  int max_active = 0x7fffffff;
  int min_active = 200;
  // bytes of in-progress lattice before an immediate prune (EESEN/Kaldi
  // latgen-faster --max-mem); periodic pruning runs regardless
  double max_mem = 50e6;
  int prune_interval = 25;  // frames between periodic in-progress prunes
  bool allow_partial = false;
  std::string word_symbol_table;
};

struct Token {
  float cost = kInf;
  int32_t lat_state = -1;
};

class LatticeDecoder {
 public:
  LatticeDecoder(const Fst& graph, const Flags& flags)
      : graph_(graph), flags_(flags) {}

  bool Decode(const Matrix& loglikes, Lattice* lattice) {
    Lattice lat;
    std::unordered_map<StateId, Token> cur;
    Token start_tok{0.0f, lat.AddState()};
    lat.SetStart(start_tok.lat_state);
    cur[graph_.Start()] = start_tok;
    ProcessNonemitting(&cur, &lat);

    for (int32_t t = 0; t < loglikes.rows; ++t) {
      std::unordered_map<StateId, Token> next;
      ProcessEmitting(cur, loglikes, t, &next, &lat);
      if (next.empty()) return false;  // beam collapsed
      ProcessNonemitting(&next, &lat);
      cur.swap(next);
      peak_lat_states_ = std::max(peak_lat_states_,
                                  static_cast<int64_t>(lat.NumStates()));
      // in-progress pruning bounds lattice memory over long utterances:
      // states not within lattice_beam of the best path to the active
      // frontier can never re-enter the search (PruneActiveTokens
      // semantics).  Periodic + on-demand when past the memory budget.
      bool periodic = flags_.prune_interval > 0 &&
          (t + 1) % flags_.prune_interval == 0;
      bool over_budget = flags_.max_mem > 0 &&
          LatticeBytes(lat) > flags_.max_mem;
      if ((periodic || over_budget) && t + 1 < loglikes.rows) {
        PruneInProgress(&cur, &lat, flags_.lattice_beam);
        // still past the budget → tighten the beam until it fits
        // (Kaldi halves the lattice beam under memory pressure); the
        // best path always survives
        float beam = flags_.lattice_beam;
        while (flags_.max_mem > 0 && LatticeBytes(lat) > flags_.max_mem
               && beam > 0.01f) {
          beam *= 0.5f;
          PruneInProgress(&cur, &lat, beam);
        }
      }
    }

    // final states
    bool found_final = false;
    for (const auto& [s, tok] : cur) {
      if (graph_.IsFinal(s)) {
        lat.SetFinal(tok.lat_state, graph_.Final(s), 0.0f);
        found_final = true;
      }
    }
    if (!found_final) {
      if (!flags_.allow_partial) return false;
      float best = kInf;
      for (const auto& [s, tok] : cur) best = std::min(best, tok.cost);
      for (const auto& [s, tok] : cur) {
        if (tok.cost <= best + 1e-3f) lat.SetFinal(tok.lat_state, 0, 0);
      }
    }
    // final prune to the --lattice-beam contract: without it the
    // written lattice keeps decode-beam-wide margins for every frame
    // since the last periodic prune (PruneForwardLinksFinal semantics)
    lat.Prune(flags_.lattice_beam, nullptr, nullptr);
    *lattice = std::move(lat);
    return true;
  }

  int64_t peak_lat_states() const { return peak_lat_states_; }
  int64_t nonfinite_scores() const { return nonfinite_scores_; }

 private:
  static double LatticeBytes(const Lattice& lat) {
    size_t arcs = 0;
    for (int32_t s = 0; s < lat.NumStates(); ++s) {
      arcs += lat.ArcsAt(s).size();
    }
    return 56.0 * lat.NumStates() + 20.0 * arcs;
  }

  void PruneInProgress(std::unordered_map<StateId, Token>* cur,
                       Lattice* lat, float beam) {
    std::vector<int32_t> frontier;
    frontier.reserve(cur->size());
    for (const auto& [s, tok] : *cur) frontier.push_back(tok.lat_state);
    std::vector<int32_t> remap;
    if (!lat->Prune(beam, &frontier, &remap)) return;
    for (auto it = cur->begin(); it != cur->end();) {
      int32_t ns = remap[it->second.lat_state];
      if (ns < 0) {
        it = cur->erase(it);
      } else {
        it->second.lat_state = ns;
        ++it;
      }
    }
  }

  void ProcessEmitting(const std::unordered_map<StateId, Token>& cur,
                       const Matrix& loglikes, int32_t t,
                       std::unordered_map<StateId, Token>* next,
                       Lattice* lat) {
    // pass 1: candidate transitions and the frame-best cost
    struct Cand {
      StateId dest;
      float cost;
      int32_t src_lat;
      LatticeArc arc;
    };
    std::vector<Cand> cands;
    cands.reserve(cur.size() * 4);
    float best = kInf;
    // adaptive source pruning: keep at most max_active source tokens
    std::vector<std::pair<float, StateId>> sources;
    sources.reserve(cur.size());
    for (const auto& [s, tok] : cur) sources.push_back({tok.cost, s});
    float src_cutoff = kInf;
    if (flags_.max_active > 0 &&
        static_cast<int>(sources.size()) > flags_.max_active) {
      std::nth_element(sources.begin(),
                       sources.begin() + flags_.max_active - 1,
                       sources.end());
      src_cutoff = sources[flags_.max_active - 1].first;
    }

    for (const auto& [s, tok] : cur) {
      if (tok.cost > src_cutoff) continue;
      for (const Arc& arc : graph_.ArcsAt(s)) {
        if (arc.ilabel == 0) continue;
        int col = arc.ilabel - 1;  // token id t scores column t-1
        if (col >= loglikes.cols) continue;
        float ll = loglikes(t, col);
        if (!std::isfinite(ll)) {
          // a collapsed/overflowed model emits NaN/inf pseudo-
          // likelihoods (observed: all-NaN posteriors after a
          // deliberate lr x10 divergence).  NaN costs break the
          // strict-weak-ordering std::nth_element requires (UB —
          // segfaulted) and poison every cutoff comparison; treat the
          // score as zero evidence so decoding degrades to the graph-
          // cost-best path and the pipeline still emits a scoreable
          // (terrible) transcript instead of crashing.
          ll = 0.0f;
          ++nonfinite_scores_;
        }
        float ac = -flags_.acoustic_scale * ll;
        float cost = tok.cost + arc.weight + ac;
        if (cost >= best + flags_.beam) continue;
        best = std::min(best, cost);
        cands.push_back({arc.nextstate, cost, tok.lat_state,
                         {arc.ilabel, arc.olabel, arc.weight, ac, -1}});
      }
    }
    // second pass: settle token costs first, then add lattice arcs with a
    // per-destination margin (bounds the arc flood on high-entropy frames)
    float cutoff = best + flags_.beam;
    // --min-active beam floor (Kaldi GetCutoff): when the beam would
    // leave fewer than min_active candidates, loosen the cutoff to the
    // min_active-th best so quiet/ambiguous frames cannot collapse the
    // search.  (Approximate: pass 1's running-best prune may already
    // have dropped candidates ≥ best+beam; the floor governs the final
    // cutoff among the survivors.)
    if (flags_.min_active > 0) {
      if (static_cast<int>(cands.size()) <= flags_.min_active) {
        cutoff = kInf;
      } else {
        std::vector<float> costs;
        costs.reserve(cands.size());
        for (const Cand& cand : cands) costs.push_back(cand.cost);
        std::nth_element(costs.begin(),
                         costs.begin() + flags_.min_active - 1,
                         costs.end());
        cutoff = std::max(cutoff,
                          costs[flags_.min_active - 1] + 1e-4f);
      }
    }
    next->reserve(cands.size());
    for (const Cand& cand : cands) {
      if (cand.cost >= cutoff) continue;
      auto it = next->find(cand.dest);
      if (it == next->end()) {
        next->emplace(cand.dest, Token{cand.cost, lat->AddState()});
      } else if (cand.cost < it->second.cost) {
        it->second.cost = cand.cost;
      }
    }
    for (auto& cand : cands) {
      if (cand.cost >= cutoff) continue;
      auto it = next->find(cand.dest);
      if (it == next->end()) continue;
      if (cand.cost < it->second.cost + flags_.lattice_beam) {
        cand.arc.nextstate = it->second.lat_state;
        lat->AddArc(cand.src_lat, cand.arc);
      }
    }
  }

  void ProcessNonemitting(std::unordered_map<StateId, Token>* cur,
                          Lattice* lat) {
    // epsilon weights in TLG are non-negative (LM costs, determinization
    // residuals), so Dijkstra settles each state exactly once.
    float best = kInf;
    for (const auto& [s, tok] : *cur) best = std::min(best, tok.cost);
    float cutoff = best + flags_.beam;
    using Item = std::pair<float, StateId>;
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
    for (const auto& [s, tok] : *cur) pq.push({tok.cost, s});
    while (!pq.empty()) {
      auto [cost, s] = pq.top();
      pq.pop();
      Token tok = (*cur)[s];
      if (cost > tok.cost + 1e-6f) continue;  // stale entry
      if (cost > cutoff) continue;
      for (const Arc& arc : graph_.ArcsAt(s)) {
        if (arc.ilabel != 0) continue;
        float ncost = cost + arc.weight;
        if (ncost > cutoff) continue;
        auto it = cur->find(arc.nextstate);
        if (it == cur->end()) {
          it = cur->emplace(arc.nextstate,
                            Token{ncost, lat->AddState()}).first;
          pq.push({ncost, arc.nextstate});
        } else if (ncost < it->second.cost - 1e-6f) {
          it->second.cost = ncost;
          pq.push({ncost, arc.nextstate});
        }
        // record the eps transition once per settled source within the
        // lattice margin of the destination's best
        if (ncost < it->second.cost + flags_.lattice_beam) {
          lat->AddArc(tok.lat_state, {0, arc.olabel, arc.weight, 0.0f,
                                      it->second.lat_state});
        }
      }
    }
  }

  const Fst& graph_;
  Flags flags_;
  int64_t peak_lat_states_ = 0;
  int64_t nonfinite_scores_ = 0;
};

// trim lattice states not reaching a final state
Lattice TrimLattice(const Lattice& lat) {
  int32_t n = lat.NumStates();
  std::vector<std::vector<int32_t>> rev(n);
  for (int32_t s = 0; s < n; ++s) {
    for (const auto& arc : lat.ArcsAt(s)) rev[arc.nextstate].push_back(s);
  }
  std::vector<bool> alive(n, false);
  std::vector<int32_t> stack;
  for (int32_t s = 0; s < n; ++s) {
    if (lat.Final(s).is_final) {
      alive[s] = true;
      stack.push_back(s);
    }
  }
  while (!stack.empty()) {
    int32_t s = stack.back();
    stack.pop_back();
    for (int32_t p : rev[s]) {
      if (!alive[p]) {
        alive[p] = true;
        stack.push_back(p);
      }
    }
  }
  Lattice out;
  std::vector<int32_t> remap(n, -1);
  for (int32_t s = 0; s < n; ++s) {
    if (alive[s]) remap[s] = out.AddState();
  }
  if (lat.Start() < 0 || remap[lat.Start()] < 0) return out;
  out.SetStart(remap[lat.Start()]);
  for (int32_t s = 0; s < n; ++s) {
    if (remap[s] < 0) continue;
    if (lat.Final(s).is_final) {
      out.SetFinal(remap[s], lat.Final(s).graph_cost,
                   lat.Final(s).acoustic_cost);
    }
    for (const auto& arc : lat.ArcsAt(s)) {
      if (remap[arc.nextstate] < 0) continue;
      LatticeArc a = arc;
      a.nextstate = remap[arc.nextstate];
      out.AddArc(remap[s], a);
    }
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  Flags flags;
  std::vector<std::string> args;
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    auto val = [&](const char* name) -> const char* {
      size_t len = std::strlen(name);
      if (arg.compare(0, len, name) == 0 && arg[len] == '=') {
        return arg.c_str() + len + 1;
      }
      return nullptr;
    };
    const char* v;
    if ((v = val("--acoustic-scale"))) flags.acoustic_scale = atof(v);
    else if ((v = val("--beam"))) flags.beam = atof(v);
    else if ((v = val("--lattice-beam"))) flags.lattice_beam = atof(v);
    else if ((v = val("--max-active"))) flags.max_active = atoi(v);
    else if ((v = val("--min-active"))) flags.min_active = atoi(v);
    else if ((v = val("--max-mem"))) flags.max_mem = atof(v);
    else if ((v = val("--prune-interval")))
      flags.prune_interval = atoi(v);
    else if ((v = val("--allow-partial")))
      flags.allow_partial = std::strcmp(v, "true") == 0;
    else if ((v = val("--word-symbol-table")))
      flags.word_symbol_table = v;
    else if (arg.rfind("--", 0) == 0) {
      std::cerr << "latgen-faster: ignoring unknown flag " << arg << "\n";
    } else {
      args.push_back(arg);
    }
  }
  if (args.size() != 3) {
    std::cerr << "usage: latgen-faster [flags] <graph-fst> "
                 "<loglikes-rspecifier> <lattice-wspecifier>\n";
    return 1;
  }

  try {
    std::ifstream gfh(args[0], std::ios::binary);
    if (!gfh) {
      std::cerr << "cannot open graph " << args[0] << "\n";
      return 1;
    }
    Fst graph = (gfh.peek() == 'L') ? Fst::Read(gfh) : Fst::ReadText(gfh);
    if (graph.NumStates() == 0 || graph.Start() < 0) {
      // e.g. a TLG built from an unreadable/empty ARPA composes to the
      // empty FST; decoding would index state -1
      std::cerr << "latgen-faster: graph " << args[0]
                << " is empty (no states/start) — refusing to decode\n";
      return 1;
    }
    LatticeDecoder decoder(graph, flags);

    SequentialMatrixReader reader(args[1]);
    ArchiveWriter writer(args[2]);
    std::string key;
    Matrix mat;
    int done = 0, failed = 0;
    while (reader.Next(&key, &mat)) {
      Lattice lat;
      if (decoder.Decode(mat, &lat)) {
        Lattice trimmed = TrimLattice(lat);
        writer.BeginEntry(key);
        trimmed.Write(writer.sink());
        ++done;
        std::vector<int32_t> words = trimmed.BestPath();
        std::cerr << key << " ";
        for (int32_t w : words) std::cerr << w << " ";
        std::cerr << "\n";
      } else {
        std::cerr << "latgen-faster: decode failed for " << key << "\n";
        ++failed;
      }
    }
    if (decoder.nonfinite_scores() > 0) {
      std::cerr << "latgen-faster: WARNING sanitized "
                << decoder.nonfinite_scores()
                << " non-finite acoustic scores to 0 (collapsed "
                   "model?) — transcripts are graph-cost-only\n";
    }
    std::cerr << "latgen-faster: decoded " << done << " utterances, "
              << failed << " failed (peak in-progress lattice states "
              << decoder.peak_lat_states() << ")\n";
    return failed > 0 && done == 0 ? 1 : 0;
  } catch (const std::exception& e) {
    std::cerr << "latgen-faster: " << e.what() << "\n";
    return 1;
  }
}
