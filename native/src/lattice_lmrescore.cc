// lattice-lmrescore — replace/adjust the LM scores of word lattices.
//
// Native replacement for Kaldi's lattice-lmrescore /
// lmrescore_const_arpa.sh path used by the reference recipes for their
// headline numbers (tglarge/fglarge rescoring, reference
// egs/wsj/run_wsj_phn.sh:279-286, egs/libri/run_libri_ph.sh:322-339):
//
//   lattice-lmrescore --lm-scale=-1.0 in.lats G_old.fst mid.lats
//   lattice-lmrescore --lm-scale=1.0  mid.lats G_new.fst out.lats
//
// The grammar is composed on demand: lattice word olabels walk G's word
// arcs, falling back through backoff arcs (olabel==0) when a word is
// absent from the current history state — the same semantics as Kaldi's
// deterministic-on-demand ARPA wrapper, so arbitrarily large ARPA-derived
// G.fsts work without determinization.
//
// The LM argument may also be a const-arpa file (arpa-to-const-arpa) —
// the mmap-able packed-trie form for tglarge/fglarge-class LMs that are
// too big to hold as FSTs (Kaldi ConstArpaLm / lmrescore_const_arpa.sh
// equivalent); detected by magic, same rescoring semantics.

#include <algorithm>
#include <cstring>
#include <iostream>
#include <fstream>
#include <limits>
#include <string>
#include <tuple>
#include <unordered_map>
#include <vector>

#include "const_arpa.h"
#include "fst.h"
#include "kaldi_io.h"
#include "lattice.h"

using namespace lctc;

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// follow backoff arcs until `word` is found; returns (cost, next_state)
// or cost=inf when the word is not in the LM at all.
std::pair<float, StateId> FstLookupWord(const Fst& g, StateId state,
                                        Label word) {
  float backoff_cost = 0.0f;
  for (int depth = 0; depth < 64; ++depth) {
    const auto& arcs = g.ArcsAt(state);
    // input-sorted: binary search for the word
    auto lo = std::lower_bound(
        arcs.begin(), arcs.end(), word,
        [](const Arc& a, Label l) { return a.ilabel < l; });
    if (lo != arcs.end() && lo->ilabel == word) {
      return {backoff_cost + lo->weight, lo->nextstate};
    }
    // backoff arc: olabel 0 (ilabel is #0 or eps)
    const Arc* backoff = nullptr;
    for (const Arc& a : arcs) {
      if (a.olabel == 0 && a.nextstate != state) { backoff = &a; break; }
    }
    if (!backoff) return {kInf, kNoState};
    backoff_cost += backoff->weight;
    state = backoff->nextstate;
  }
  return {kInf, kNoState};
}

float FstFinalCost(const Fst& g, StateId state) {
  float backoff_cost = 0.0f;
  for (int depth = 0; depth < 64; ++depth) {
    if (g.IsFinal(state)) return backoff_cost + g.Final(state);
    const Arc* backoff = nullptr;
    for (const Arc& a : g.ArcsAt(state)) {
      if (a.olabel == 0 && a.nextstate != state) { backoff = &a; break; }
    }
    if (!backoff) return kInf;
    backoff_cost += backoff->weight;
    state = backoff->nextstate;
  }
  return kInf;
}

// Fst with the deterministic-on-demand LM interface that Rescore<>
// expects (ConstArpaLm provides the same three methods natively).
class FstLm {
 public:
  explicit FstLm(Fst g) : g_(std::move(g)) { g_.SortArcsByInput(); }
  StateId Start() const { return g_.Start(); }
  std::pair<float, StateId> LookupWord(StateId state, Label word) const {
    return FstLookupWord(g_, state, word);
  }
  float FinalCost(StateId state) const {
    return FstFinalCost(g_, state);
  }

 private:
  Fst g_;
};

struct PairHash {
  size_t operator()(const std::pair<int32_t, int32_t>& p) const {
    return p.first * 2654435761u ^ p.second;
  }
};

template <class LM>
bool Rescore(const Lattice& in, const LM& lm, float lm_scale,
             Lattice* out) {
  using Key = std::pair<int32_t, int32_t>;
  std::unordered_map<Key, int32_t, PairHash> index;
  std::vector<Key> order;
  auto state_of = [&](int32_t ls, int32_t gs) {
    Key key{ls, gs};
    auto it = index.find(key);
    if (it != index.end()) return it->second;
    int32_t s = out->AddState();
    index[key] = s;
    order.push_back(key);
    return s;
  };
  if (in.Start() < 0 || lm.Start() == kNoState) return false;
  out->SetStart(state_of(in.Start(), lm.Start()));
  for (size_t done = 0; done < order.size(); ++done) {
    auto [ls, gs] = order[done];
    int32_t s = index[order[done]];
    if (in.Final(ls).is_final) {
      float fcost = lm.FinalCost(gs);
      if (fcost != kInf) {
        out->SetFinal(s, in.Final(ls).graph_cost + lm_scale * fcost,
                      in.Final(ls).acoustic_cost);
      }
    }
    for (const LatticeArc& arc : in.ArcsAt(ls)) {
      LatticeArc na = arc;
      int32_t next_gs = gs;
      if (arc.olabel != 0) {
        auto [cost, ns] = lm.LookupWord(gs, arc.olabel);
        if (cost == kInf) continue;  // word not in LM: prune the path
        na.graph_cost += lm_scale * cost;
        next_gs = ns;
      }
      na.nextstate = state_of(arc.nextstate, next_gs);
      out->AddArc(s, na);
    }
  }
  return true;
}

template <class LM>
int RunRescore(const std::string& rspec, const LM& lm, float lm_scale,
               const std::string& wspec, float prune_beam) {
  ByteSource src(StripArkPrefix(rspec));
  ArchiveWriter writer(wspec);
  std::string key;
  Lattice lat;
  int done = 0, failed = 0;
  while (Lattice::Read(&src, &key, &lat)) {
    Lattice rescored;
    if (Rescore(lat, lm, lm_scale, &rescored)) {
      // composition multiplies lattice states by LM histories; beam
      // pruning bounds the output the way Kaldi's determinized
      // lattices do implicitly
      if (prune_beam > 0.0f) rescored.Prune(prune_beam);
      writer.BeginEntry(key);
      rescored.Write(writer.sink());
      ++done;
    } else {
      std::cerr << "lattice-lmrescore: failed for " << key << "\n";
      ++failed;
    }
  }
  std::cerr << "lattice-lmrescore: rescored " << done << " lattices\n";
  return (failed > 0 && done == 0) ? 1 : 0;
}

}  // namespace

int main(int argc, char** argv) {
  float lm_scale = 1.0f;
  float prune_beam = 0.0f;
  std::vector<std::string> args;
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg.rfind("--lm-scale=", 0) == 0) {
      lm_scale = atof(arg.c_str() + 11);
    } else if (arg.rfind("--prune-beam=", 0) == 0) {
      prune_beam = atof(arg.c_str() + 13);
    } else if (arg.rfind("--", 0) == 0) {
      std::cerr << "lattice-lmrescore: ignoring unknown flag " << arg
                << "\n";
    } else {
      args.push_back(arg);
    }
  }
  if (args.size() != 3) {
    std::cerr << "usage: lattice-lmrescore [--lm-scale=S] "
                 "<lattice-rspecifier> <G.fst> <lattice-wspecifier>\n";
    return 1;
  }
  try {
    if (ConstArpaLm::IsCarpaFile(args[1])) {
      ConstArpaLm lm = ConstArpaLm::Read(args[1]);
      return RunRescore(args[0], lm, lm_scale, args[2], prune_beam);
    }
    std::ifstream gfh(args[1], std::ios::binary);
    if (!gfh) {
      std::cerr << "cannot open " << args[1] << "\n";
      return 1;
    }
    Fst g = (gfh.peek() == 'L') ? Fst::Read(gfh) : Fst::ReadText(gfh);
    FstLm lm(std::move(g));
    return RunRescore(args[0], lm, lm_scale, args[2], prune_beam);
  } catch (const std::exception& e) {
    std::cerr << "lattice-lmrescore: " << e.what() << "\n";
    return 1;
  }
}
