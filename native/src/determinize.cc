// Determinization with epsilon removal in the log semiring — the
// fstdeterminizestar --use-log=true step of the TLG build (reference
// local/make_TLG.sh:81-84).
//
// Subset construction over weighted elements that also carry an output
// *string* residual (input epsilons are closed over; the output labels
// they carry are appended to the residual).  Per subset and input label,
// the common divisor is the log-sum of weights and the longest common
// prefix of the strings; leftover output labels longer than one are
// emitted through chains of epsilon-input link states.  Requires a
// determinizable input (guaranteed by the lexicon disambiguation
// symbols); non-functional inputs are detected and reported.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <map>
#include <stdexcept>
#include <unordered_map>
#include <vector>

#include "fst.h"

namespace lctc {

namespace {

struct Element {
  StateId state;
  float weight;                 // residual weight (-log)
  std::vector<Label> ostring;   // residual output labels

  bool operator<(const Element& other) const {
    if (state != other.state) return state < other.state;
    if (weight != other.weight) return weight < other.weight;
    return ostring < other.ostring;
  }
};

using Subset = std::vector<Element>;

constexpr float kDelta = 1e-4f;

// quantized key so float jitter does not split subsets.  Every element
// is length-prefixed: a bare '\xff' separator also occurs inside the
// raw 4-byte fields, so two different subsets could otherwise serialize
// to the same bytes and be wrongly interned as one state.
std::string SubsetKey(const Subset& subset) {
  std::string key;
  key.reserve(subset.size() * 16);
  for (const auto& e : subset) {
    int32_t olen = static_cast<int32_t>(e.ostring.size());
    key.append(reinterpret_cast<const char*>(&olen), 4);
    key.append(reinterpret_cast<const char*>(&e.state), 4);
    int32_t w = static_cast<int32_t>(std::lround(e.weight / kDelta));
    key.append(reinterpret_cast<const char*>(&w), 4);
    for (Label l : e.ostring) {
      key.append(reinterpret_cast<const char*>(&l), 4);
    }
  }
  return key;
}

// merge elements with equal (state, ostring): log-plus their weights;
// elements with equal state but different strings ⇒ not determinizable
// unless they can coexist (they can, subsets allow it — the failure mode
// is unbounded string growth, caught by a length cap).
void Normalize(Subset* subset) {
  std::sort(subset->begin(), subset->end(),
            [](const Element& a, const Element& b) {
              if (a.state != b.state) return a.state < b.state;
              return a.ostring < b.ostring;
            });
  Subset merged;
  for (const auto& e : *subset) {
    if (!merged.empty() && merged.back().state == e.state &&
        merged.back().ostring == e.ostring) {
      merged.back().weight = LogPlus(merged.back().weight, e.weight);
    } else {
      merged.push_back(e);
    }
  }
  subset->swap(merged);
}

// input-epsilon closure: follow ilabel==0 arcs, appending olabels to the
// residual string.  Detects epsilon cycles (error).
void EpsilonClosure(const Fst& fst, Subset* subset) {
  constexpr size_t kMaxString = 256;
  Subset queue = *subset;
  size_t steps = 0;
  const size_t limit = 100000 + 100 * fst.NumStates();
  while (!queue.empty()) {
    Element cur = queue.back();
    queue.pop_back();
    if (++steps > limit) {
      throw std::runtime_error(
          "determinize: epsilon cycle detected (or graph too "
          "non-deterministic)");
    }
    for (const Arc& arc : fst.ArcsAt(cur.state)) {
      if (arc.ilabel != 0) continue;
      Element next;
      next.state = arc.nextstate;
      next.weight = cur.weight + arc.weight;
      next.ostring = cur.ostring;
      if (arc.olabel != 0) next.ostring.push_back(arc.olabel);
      if (next.ostring.size() > kMaxString) {
        throw std::runtime_error(
            "determinize: output string residual exploded — input is "
            "likely not determinizable (missing disambiguation symbols?)");
      }
      subset->push_back(next);
      queue.push_back(next);
    }
  }
  Normalize(subset);
}

}  // namespace

Fst DeterminizeStar(const Fst& input) {
  Fst out;
  if (input.Start() == kNoState) return out;

  std::unordered_map<std::string, StateId> subset_index;
  std::vector<Subset> subsets;

  auto intern = [&](Subset subset) {
    std::string key = SubsetKey(subset);
    auto it = subset_index.find(key);
    if (it != subset_index.end()) return it->second;
    StateId s = out.AddState();
    subset_index[key] = s;
    subsets.push_back(std::move(subset));
    return s;
  };

  Subset start{{input.Start(), 0.0f, {}}};
  EpsilonClosure(input, &start);
  // factor out the start subset's divisor into nothing (it is the start)
  out.SetStart(intern(start));

  for (StateId done = 0; done < static_cast<StateId>(subsets.size());
       ++done) {
    Subset subset = subsets[done];  // copy: subsets vector may reallocate

    // final weight: log-plus over final elements; their residual strings
    // must be emitted — handled by a chain of epsilon-input states.
    float final_w = kInfinity;
    std::vector<Label> final_string;
    bool have_final = false;
    for (const auto& e : subset) {
      if (!input.IsFinal(e.state)) continue;
      if (!have_final) {
        final_string = e.ostring;
        have_final = true;
      } else if (final_string != e.ostring) {
        throw std::runtime_error(
            "determinize: conflicting final output strings — input not "
            "functional");
      }
      final_w = LogPlus(final_w, e.weight + input.Final(e.state));
    }
    if (have_final) {
      StateId cur = done;
      for (size_t k = 0; k < final_string.size(); ++k) {
        StateId link = out.AddState();
        subsets.emplace_back();  // keep indices aligned
        out.AddArc(cur, {0, final_string[k],
                         k == 0 ? final_w : 0.0f, link});
        cur = link;
      }
      out.SetFinal(cur, final_string.empty() ? final_w : 0.0f);
    }

    // group transitions by input label
    std::map<Label, Subset> by_label;
    for (const auto& e : subset) {
      for (const Arc& arc : input.ArcsAt(e.state)) {
        if (arc.ilabel == 0) continue;
        Element next;
        next.state = arc.nextstate;
        next.weight = e.weight + arc.weight;
        next.ostring = e.ostring;
        if (arc.olabel != 0) next.ostring.push_back(arc.olabel);
        by_label[arc.ilabel].push_back(next);
      }
    }

    for (auto& [label, next_subset] : by_label) {
      EpsilonClosure(input, &next_subset);
      // common divisor: log-plus of weights, LCP of strings
      float div_w = kInfinity;
      for (const auto& e : next_subset) div_w = LogPlus(div_w, e.weight);
      std::vector<Label> lcp = next_subset[0].ostring;
      for (const auto& e : next_subset) {
        size_t k = 0;
        while (k < lcp.size() && k < e.ostring.size() &&
               lcp[k] == e.ostring[k]) {
          ++k;
        }
        lcp.resize(k);
      }
      for (auto& e : next_subset) {
        e.weight -= div_w;
        e.ostring.erase(e.ostring.begin(), e.ostring.begin() + lcp.size());
      }
      StateId dest = intern(std::move(next_subset));
      // emit: first output label rides the real arc, the rest ride a
      // chain of epsilon-input link states
      if (lcp.size() <= 1) {
        out.AddArc(done, {label, lcp.empty() ? 0 : lcp[0], div_w, dest});
      } else {
        StateId link = out.AddState();
        subsets.emplace_back();
        out.AddArc(done, {label, lcp[0], div_w, link});
        StateId cur = link;
        for (size_t k = 1; k + 1 < lcp.size(); ++k) {
          StateId nxt = out.AddState();
          subsets.emplace_back();
          out.AddArc(cur, {0, lcp[k], 0.0f, nxt});
          cur = nxt;
        }
        out.AddArc(cur, {0, lcp.back(), 0.0f, dest});
      }
    }
  }
  return out;
}

}  // namespace lctc
