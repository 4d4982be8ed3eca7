// Weighted finite-state transducer core for the TLG decode chain.
//
// Native replacement for the OpenFst subset the reference's graph build
// depends on (reference local/make_TLG.sh:33-91): text compile/print,
// arc sorting, table composition, determinization-with-epsilon-removal in
// the log semiring ("determinizestar"), encoded minimization, self-loop
// insertion and ARPA LM compilation.  Weights are negative natural logs
// (tropical semiring for decoding, log semiring for determinization).
//
// The on-disk binary format is this toolkit's own ("LCFST1\n" header);
// text format matches OpenFst's fstcompile/fstprint contract so graphs
// can interchange with OpenFst via text when needed.

#pragma once

#include <cstdint>
#include <iostream>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace lctc {

using StateId = int32_t;
using Label = int32_t;

constexpr float kInfinity = std::numeric_limits<float>::infinity();
constexpr StateId kNoState = -1;

struct Arc {
  Label ilabel = 0;
  Label olabel = 0;
  float weight = 0.0f;   // -log probability
  StateId nextstate = kNoState;
};

class Fst {
 public:
  StateId AddState();
  void AddArc(StateId s, const Arc& arc) { arcs_[s].push_back(arc); }
  void SetStart(StateId s) { start_ = s; }
  void SetFinal(StateId s, float weight) { final_[s] = weight; }

  StateId Start() const { return start_; }
  StateId NumStates() const { return static_cast<StateId>(arcs_.size()); }
  float Final(StateId s) const { return final_[s]; }  // kInfinity: non-final
  bool IsFinal(StateId s) const { return final_[s] != kInfinity; }
  const std::vector<Arc>& ArcsAt(StateId s) const { return arcs_[s]; }
  std::vector<Arc>& MutableArcsAt(StateId s) { return arcs_[s]; }
  size_t NumArcs() const;

  void SortArcsByInput();
  void SortArcsByOutput();
  bool InputSorted() const { return isorted_; }

  // serialization
  void Write(std::ostream& os) const;
  static Fst Read(std::istream& is);
  void WriteText(std::ostream& os) const;   // fstprint format
  static Fst ReadText(std::istream& is);    // fstcompile format (numeric)

 private:
  StateId start_ = kNoState;
  std::vector<std::vector<Arc>> arcs_;
  std::vector<float> final_;
  bool isorted_ = false;
};

// symbol tables: "symbol id" per line
class SymbolTable {
 public:
  static SymbolTable ReadFile(const std::string& path);
  Label Find(const std::string& sym) const;        // -1 if absent
  const std::string& Find(Label id) const;         // "" if absent
  Label AddSymbol(const std::string& sym);
  size_t Size() const { return id2sym_.size(); }

 private:
  std::unordered_map<std::string, Label> sym2id_;
  std::vector<std::string> id2sym_;
};

// --- algorithms -----------------------------------------------------------

// log-semiring plus: -log(e^-a + e^-b)
float LogPlus(float a, float b);

// composition with epsilon-sequencing filter; b must be input-sorted.
Fst Compose(const Fst& a, const Fst& b);

// determinize while removing epsilons, log semiring
// (fstdeterminizestar --use-log=true semantics).
Fst DeterminizeStar(const Fst& fst);

// minimize a deterministic FST with (ilabel, olabel, weight) encoded as
// the alphabet (fstminimizeencoded semantics: no weight pushing).
Fst MinimizeEncoded(const Fst& fst);

// add a self-loop (ilabel:olabel, weight 0) at the start state and at
// every state that is final or has an outgoing arc with non-eps olabel
// (Kaldi fstaddselfloops contract for lexicon FSTs).
void AddSelfLoops(Fst* fst, Label ilabel, Label olabel);

// remove states not on a start→final path (fstconnect).
Fst Connect(const Fst& fst);

// remove epsilon (0:0) arcs, tropical shortest-distance closure.
Fst RmEpsilon(const Fst& fst);

}  // namespace lctc
