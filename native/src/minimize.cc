// Encoded minimization — the fstminimizeencoded step of the TLG build
// (reference local/make_TLG.sh:82).  (ilabel, olabel, weight) triples are
// encoded into a single alphabet symbol and the deterministic automaton
// is minimized by Moore partition refinement (no weight pushing, exactly
// the property Kaldi relies on for not disturbing stochasticity).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <tuple>
#include <unordered_map>
#include <vector>

#include "fst.h"

namespace lctc {

Fst MinimizeEncoded(const Fst& input) {
  StateId n = input.NumStates();
  if (n == 0) return Fst();

  // encode arc signatures
  std::unordered_map<uint64_t, int32_t> weight_codes;
  auto weight_code = [&](float w) {
    static_assert(sizeof(float) == 4, "float32 expected");
    uint32_t bits32;
    std::memcpy(&bits32, &w, 4);
    uint64_t bits = bits32;
    auto it = weight_codes.find(bits);
    if (it != weight_codes.end()) return it->second;
    int32_t code = static_cast<int32_t>(weight_codes.size());
    weight_codes[bits] = code;
    return code;
  };

  struct EncArc {
    int64_t symbol;
    StateId nextstate;
  };
  // Intern exact (ilabel, olabel, weight_code) triples into dense
  // symbols.  A shifted-XOR pack would overlap bit ranges once label or
  // weight cardinalities grow (>2^24 labels / >2^16 distinct weights in
  // a real determinized LG) and silently merge non-equivalent states.
  std::map<std::tuple<int32_t, int32_t, int32_t>, int64_t> arc_symbols;
  auto arc_symbol = [&](int32_t ilabel, int32_t olabel, int32_t wcode) {
    auto key = std::make_tuple(ilabel, olabel, wcode);
    auto it = arc_symbols.find(key);
    if (it != arc_symbols.end()) return it->second;
    int64_t code = static_cast<int64_t>(arc_symbols.size());
    arc_symbols.emplace(key, code);
    return code;
  };
  std::vector<std::vector<EncArc>> enc(n);
  for (StateId s = 0; s < n; ++s) {
    for (const Arc& arc : input.ArcsAt(s)) {
      int64_t sym = arc_symbol(arc.ilabel, arc.olabel,
                               weight_code(arc.weight));
      enc[s].push_back({sym, arc.nextstate});
    }
  }

  // initial partition: by final weight (exact bits; kInfinity = non-final)
  std::vector<int32_t> cls(n);
  {
    std::unordered_map<uint32_t, int32_t> final_classes;
    for (StateId s = 0; s < n; ++s) {
      float w = input.Final(s);
      uint32_t bits;
      std::memcpy(&bits, &w, 4);
      auto it = final_classes.find(bits);
      if (it == final_classes.end()) {
        it = final_classes.emplace(
            bits, static_cast<int32_t>(final_classes.size())).first;
      }
      cls[s] = it->second;
    }
  }

  // Moore refinement: signature = (class, sorted (symbol, class(next)))
  bool changed = true;
  while (changed) {
    changed = false;
    std::map<std::pair<int32_t, std::vector<std::pair<int64_t, int32_t>>>,
             int32_t> sig_index;
    std::vector<int32_t> next_cls(n);
    for (StateId s = 0; s < n; ++s) {
      std::vector<std::pair<int64_t, int32_t>> sig;
      sig.reserve(enc[s].size());
      for (const EncArc& a : enc[s]) {
        sig.emplace_back(a.symbol, cls[a.nextstate]);
      }
      std::sort(sig.begin(), sig.end());
      auto key = std::make_pair(cls[s], std::move(sig));
      auto it = sig_index.find(key);
      if (it == sig_index.end()) {
        it = sig_index.emplace(std::move(key),
                               static_cast<int32_t>(sig_index.size())).first;
      }
      next_cls[s] = it->second;
    }
    if (static_cast<StateId>(sig_index.size()) != n) {
      // count distinct old classes to detect convergence
      int32_t old_count = 0;
      {
        std::vector<bool> seen;
        for (StateId s = 0; s < n; ++s) {
          if (cls[s] >= static_cast<int32_t>(seen.size())) {
            seen.resize(cls[s] + 1, false);
          }
          if (!seen[cls[s]]) { seen[cls[s]] = true; ++old_count; }
        }
      }
      changed = static_cast<int32_t>(sig_index.size()) != old_count;
    }
    cls = std::move(next_cls);
  }

  // build the quotient automaton
  int32_t num_classes = 0;
  for (StateId s = 0; s < n; ++s) {
    num_classes = std::max(num_classes, cls[s] + 1);
  }
  Fst out;
  std::vector<StateId> rep(num_classes, kNoState);
  for (int32_t c = 0; c < num_classes; ++c) out.AddState();
  for (StateId s = 0; s < n; ++s) {
    if (rep[cls[s]] == kNoState) rep[cls[s]] = s;
  }
  out.SetStart(cls[input.Start()]);
  for (int32_t c = 0; c < num_classes; ++c) {
    StateId s = rep[c];
    if (s == kNoState) continue;
    if (input.IsFinal(s)) out.SetFinal(c, input.Final(s));
    // dedupe identical arcs (merged classes can produce duplicates)
    std::map<std::tuple<Label, Label, float, StateId>, bool> seen;
    for (const Arc& arc : input.ArcsAt(s)) {
      auto key = std::make_tuple(arc.ilabel, arc.olabel, arc.weight,
                                 static_cast<StateId>(cls[arc.nextstate]));
      if (seen.emplace(key, true).second) {
        out.AddArc(c, {arc.ilabel, arc.olabel, arc.weight,
                       cls[arc.nextstate]});
      }
    }
  }
  return Connect(out);
}

}  // namespace lctc
