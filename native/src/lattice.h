// Lattices with factored (graph, acoustic) costs — the native equivalent
// of EESEN/Kaldi lattices for the acoustic-scale-sweep scoring protocol
// (reference local/score.sh:43-52): lattice-scale rescales the acoustic
// part, lattice-best-path extracts the word sequence.
//
// Serialized as keyed archive entries: "key \0B LAT1" + counts + arcs.

#pragma once

#include <cstdint>
#include <string>
#include <vector>

#include "kaldi_io.h"

namespace lctc {

struct LatticeArc {
  int32_t ilabel = 0;       // token id (CTC unit)
  int32_t olabel = 0;       // word id
  float graph_cost = 0.0f;
  float acoustic_cost = 0.0f;
  int32_t nextstate = -1;
};

struct LatticeFinal {
  float graph_cost = 0.0f;
  float acoustic_cost = 0.0f;
  bool is_final = false;
};

class Lattice {
 public:
  int32_t AddState() {
    arcs_.emplace_back();
    final_.emplace_back();
    return static_cast<int32_t>(arcs_.size()) - 1;
  }
  void AddArc(int32_t s, const LatticeArc& arc) { arcs_[s].push_back(arc); }
  void SetFinal(int32_t s, float graph, float acoustic) {
    final_[s] = {graph, acoustic, true};
  }
  void SetStart(int32_t s) { start_ = s; }

  int32_t Start() const { return start_; }
  int32_t NumStates() const { return static_cast<int32_t>(arcs_.size()); }
  const std::vector<LatticeArc>& ArcsAt(int32_t s) const { return arcs_[s]; }
  std::vector<LatticeArc>& MutableArcsAt(int32_t s) { return arcs_[s]; }
  const LatticeFinal& Final(int32_t s) const { return final_[s]; }
  LatticeFinal& MutableFinal(int32_t s) { return final_[s]; }

  void Write(ByteSink* sink) const;
  static bool Read(ByteSource* src, std::string* key, Lattice* lat);

  void ScaleAcoustic(float scale);
  // best path under graph_cost + acoustic_cost; returns word ids
  std::vector<int32_t> BestPath(std::vector<int32_t>* tokens = nullptr,
                                float* total_cost = nullptr) const;

  // drop arcs/finals whose best path through them costs more than
  // best + beam (graph + acoustic), then trim unreachable states.
  // Topological DP — correct with the negative graph costs that appear
  // mid-rescore; returns false (no-op) on a cyclic lattice.
  //
  // extra_finals (optional): states treated as zero-cost finals — the
  // decoder's active frontier during in-progress pruning (Kaldi
  // PruneActiveTokens semantics).  remap (optional) receives the
  // old→new state mapping (-1 = pruned) so callers can relocate live
  // references.
  bool Prune(float beam,
             const std::vector<int32_t>* extra_finals = nullptr,
             std::vector<int32_t>* remap_out = nullptr);

 private:
  int32_t start_ = -1;
  std::vector<std::vector<LatticeArc>> arcs_;
  std::vector<LatticeFinal> final_;
};

}  // namespace lctc
