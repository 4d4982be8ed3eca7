#include "fst.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>
#include <queue>
#include <sstream>
#include <stdexcept>
#include <unordered_map>

namespace lctc {

StateId Fst::AddState() {
  arcs_.emplace_back();
  final_.push_back(kInfinity);
  return static_cast<StateId>(arcs_.size()) - 1;
}

size_t Fst::NumArcs() const {
  size_t n = 0;
  for (const auto& a : arcs_) n += a.size();
  return n;
}

void Fst::SortArcsByInput() {
  for (auto& arcs : arcs_) {
    std::stable_sort(arcs.begin(), arcs.end(),
                     [](const Arc& a, const Arc& b) {
                       return a.ilabel < b.ilabel;
                     });
  }
  isorted_ = true;
}

void Fst::SortArcsByOutput() {
  for (auto& arcs : arcs_) {
    std::stable_sort(arcs.begin(), arcs.end(),
                     [](const Arc& a, const Arc& b) {
                       return a.olabel < b.olabel;
                     });
  }
  isorted_ = false;
}

// --- serialization ---------------------------------------------------------

static const char kMagic[] = "LCFST1\n";

void Fst::Write(std::ostream& os) const {
  os.write(kMagic, 7);
  int32_t num_states = NumStates();
  os.write(reinterpret_cast<const char*>(&num_states), 4);
  os.write(reinterpret_cast<const char*>(&start_), 4);
  for (StateId s = 0; s < num_states; ++s) {
    os.write(reinterpret_cast<const char*>(&final_[s]), 4);
    int32_t num_arcs = static_cast<int32_t>(arcs_[s].size());
    os.write(reinterpret_cast<const char*>(&num_arcs), 4);
    os.write(reinterpret_cast<const char*>(arcs_[s].data()),
             sizeof(Arc) * arcs_[s].size());
  }
}

Fst Fst::Read(std::istream& is) {
  char magic[7];
  is.read(magic, 7);
  if (!is || std::memcmp(magic, kMagic, 7) != 0) {
    throw std::runtime_error("bad FST magic (not an LCFST1 file)");
  }
  int32_t num_states = 0;
  Fst fst;
  is.read(reinterpret_cast<char*>(&num_states), 4);
  is.read(reinterpret_cast<char*>(&fst.start_), 4);
  fst.arcs_.resize(num_states);
  fst.final_.resize(num_states, kInfinity);
  for (StateId s = 0; s < num_states; ++s) {
    is.read(reinterpret_cast<char*>(&fst.final_[s]), 4);
    int32_t num_arcs = 0;
    is.read(reinterpret_cast<char*>(&num_arcs), 4);
    fst.arcs_[s].resize(num_arcs);
    is.read(reinterpret_cast<char*>(fst.arcs_[s].data()),
            sizeof(Arc) * num_arcs);
  }
  if (!is) throw std::runtime_error("truncated FST file");
  return fst;
}

void Fst::WriteText(std::ostream& os) const {
  // fstprint order: start state's lines first
  auto print_state = [&](StateId s) {
    for (const Arc& arc : arcs_[s]) {
      os << s << '\t' << arc.nextstate << '\t' << arc.ilabel << '\t'
         << arc.olabel;
      if (arc.weight != 0.0f) os << '\t' << arc.weight;
      os << '\n';
    }
    if (IsFinal(s)) {
      os << s;
      if (final_[s] != 0.0f) os << '\t' << final_[s];
      os << '\n';
    }
  };
  if (start_ != kNoState) print_state(start_);
  for (StateId s = 0; s < NumStates(); ++s) {
    if (s != start_) print_state(s);
  }
}

Fst Fst::ReadText(std::istream& is) {
  Fst fst;
  auto ensure = [&](StateId s) {
    while (fst.NumStates() <= s) fst.AddState();
  };
  std::string line;
  bool first = true;
  while (std::getline(is, line)) {
    std::istringstream ss(line);
    std::vector<std::string> tok;
    std::string t;
    while (ss >> t) tok.push_back(t);
    if (tok.empty()) continue;
    if (tok.size() == 1 || tok.size() == 2) {
      StateId s = std::stoi(tok[0]);
      ensure(s);
      fst.final_[s] = tok.size() == 2 ? std::stof(tok[1]) : 0.0f;
      if (first) { fst.start_ = s; first = false; }
    } else if (tok.size() == 4 || tok.size() == 5) {
      Arc arc;
      StateId s = std::stoi(tok[0]);
      arc.nextstate = std::stoi(tok[1]);
      arc.ilabel = std::stoi(tok[2]);
      arc.olabel = std::stoi(tok[3]);
      arc.weight = tok.size() == 5 ? std::stof(tok[4]) : 0.0f;
      ensure(std::max(s, arc.nextstate));
      fst.AddArc(s, arc);
      if (first) { fst.start_ = s; first = false; }
    } else {
      throw std::runtime_error("bad FST text line: " + line);
    }
  }
  return fst;
}

// --- symbol tables ----------------------------------------------------------

SymbolTable SymbolTable::ReadFile(const std::string& path) {
  std::ifstream is(path);
  if (!is) throw std::runtime_error("cannot open symbol table " + path);
  SymbolTable table;
  std::string sym;
  long id;
  while (is >> sym >> id) {
    if (id != static_cast<long>(table.id2sym_.size())) {
      table.id2sym_.resize(std::max<size_t>(table.id2sym_.size(), id + 1));
      table.id2sym_[id] = sym;
      table.sym2id_[sym] = static_cast<Label>(id);
    } else {
      table.sym2id_[sym] = static_cast<Label>(table.id2sym_.size());
      table.id2sym_.push_back(sym);
    }
  }
  return table;
}

Label SymbolTable::Find(const std::string& sym) const {
  auto it = sym2id_.find(sym);
  return it == sym2id_.end() ? -1 : it->second;
}

const std::string& SymbolTable::Find(Label id) const {
  static const std::string kEmpty;
  if (id < 0 || id >= static_cast<Label>(id2sym_.size())) return kEmpty;
  return id2sym_[id];
}

Label SymbolTable::AddSymbol(const std::string& sym) {
  auto it = sym2id_.find(sym);
  if (it != sym2id_.end()) return it->second;
  Label id = static_cast<Label>(id2sym_.size());
  sym2id_[sym] = id;
  id2sym_.push_back(sym);
  return id;
}

// --- semiring ---------------------------------------------------------------

float LogPlus(float a, float b) {
  if (a == kInfinity) return b;
  if (b == kInfinity) return a;
  float m = std::min(a, b);
  return m - std::log1p(std::exp(m - std::max(a, b)));
}

// --- composition ------------------------------------------------------------

namespace {
struct TripleHash {
  size_t operator()(const std::tuple<StateId, StateId, int>& t) const {
    return std::get<0>(t) * 2654435761u ^ std::get<1>(t) * 97531u ^
           std::get<2>(t);
  }
};
}  // namespace

Fst Compose(const Fst& a, const Fst& b) {
  // epsilon-sequencing filter with states {0: free, 1: a-eps only,
  // 2: b-eps only}
  using Key = std::tuple<StateId, StateId, int>;
  std::unordered_map<Key, StateId, TripleHash> index;
  std::vector<Key> order;
  Fst out;

  auto state_of = [&](StateId s1, StateId s2, int f) {
    Key key{s1, s2, f};
    auto it = index.find(key);
    if (it != index.end()) return it->second;
    StateId s = out.AddState();
    index[key] = s;
    order.push_back(key);
    return s;
  };

  if (a.Start() == kNoState || b.Start() == kNoState) return out;
  out.SetStart(state_of(a.Start(), b.Start(), 0));

  for (size_t done = 0; done < order.size(); ++done) {
    auto [s1, s2, f] = order[done];
    StateId s = index[order[done]];
    if (a.IsFinal(s1) && b.IsFinal(s2)) {
      out.SetFinal(s, a.Final(s1) + b.Final(s2));
    }
    const auto& arcs1 = a.ArcsAt(s1);
    const auto& arcs2 = b.ArcsAt(s2);
    // matched moves (non-eps)
    for (const Arc& a1 : arcs1) {
      if (a1.olabel == 0) continue;
      // binary search in input-sorted arcs2
      auto lo = std::lower_bound(
          arcs2.begin(), arcs2.end(), a1.olabel,
          [](const Arc& arc, Label l) { return arc.ilabel < l; });
      for (auto it = lo; it != arcs2.end() && it->ilabel == a1.olabel;
           ++it) {
        out.AddArc(s, {a1.ilabel, it->olabel, a1.weight + it->weight,
                       state_of(a1.nextstate, it->nextstate, 0)});
      }
    }
    // a-side epsilon-output moves
    if (f != 2) {
      for (const Arc& a1 : arcs1) {
        if (a1.olabel != 0) continue;
        out.AddArc(s, {a1.ilabel, 0, a1.weight,
                       state_of(a1.nextstate, s2, 1)});
      }
    }
    // b-side epsilon-input moves
    if (f != 1) {
      for (const Arc& a2 : arcs2) {
        if (a2.ilabel != 0) continue;
        out.AddArc(s, {0, a2.olabel, a2.weight,
                       state_of(s1, a2.nextstate, 2)});
      }
    }
  }
  return Connect(out);
}

// --- connect ----------------------------------------------------------------

Fst Connect(const Fst& fst) {
  StateId n = fst.NumStates();
  if (fst.Start() == kNoState || n == 0) return Fst();
  // forward reachability
  std::vector<bool> fwd(n, false);
  std::queue<StateId> queue;
  queue.push(fst.Start());
  fwd[fst.Start()] = true;
  while (!queue.empty()) {
    StateId s = queue.front();
    queue.pop();
    for (const Arc& arc : fst.ArcsAt(s)) {
      if (!fwd[arc.nextstate]) {
        fwd[arc.nextstate] = true;
        queue.push(arc.nextstate);
      }
    }
  }
  // backward reachability from finals (reverse adjacency)
  std::vector<std::vector<StateId>> rev(n);
  for (StateId s = 0; s < n; ++s) {
    for (const Arc& arc : fst.ArcsAt(s)) rev[arc.nextstate].push_back(s);
  }
  std::vector<bool> bwd(n, false);
  for (StateId s = 0; s < n; ++s) {
    if (fst.IsFinal(s) && fwd[s]) {
      bwd[s] = true;
      queue.push(s);
    }
  }
  while (!queue.empty()) {
    StateId s = queue.front();
    queue.pop();
    for (StateId p : rev[s]) {
      if (!bwd[p]) {
        bwd[p] = true;
        queue.push(p);
      }
    }
  }
  std::vector<StateId> remap(n, kNoState);
  Fst out;
  for (StateId s = 0; s < n; ++s) {
    if (fwd[s] && bwd[s]) remap[s] = out.AddState();
  }
  if (remap[fst.Start()] == kNoState) return Fst();
  out.SetStart(remap[fst.Start()]);
  for (StateId s = 0; s < n; ++s) {
    if (remap[s] == kNoState) continue;
    if (fst.IsFinal(s)) out.SetFinal(remap[s], fst.Final(s));
    for (const Arc& arc : fst.ArcsAt(s)) {
      if (remap[arc.nextstate] == kNoState) continue;
      out.AddArc(remap[s], {arc.ilabel, arc.olabel, arc.weight,
                            remap[arc.nextstate]});
    }
  }
  return out;
}

// --- self loops --------------------------------------------------------------

void AddSelfLoops(Fst* fst, Label ilabel, Label olabel) {
  for (StateId s = 0; s < fst->NumStates(); ++s) {
    bool wants = (s == fst->Start()) || fst->IsFinal(s);
    if (!wants) {
      for (const Arc& arc : fst->ArcsAt(s)) {
        if (arc.olabel != 0) { wants = true; break; }
      }
    }
    if (wants) fst->AddArc(s, {ilabel, olabel, 0.0f, s});
  }
}

// --- epsilon removal (tropical) ----------------------------------------------

Fst RmEpsilon(const Fst& fst) {
  StateId n = fst.NumStates();
  Fst out;
  for (StateId s = 0; s < n; ++s) out.AddState();
  out.SetStart(fst.Start());
  auto is_eps = [](const Arc& a) {
    return a.ilabel == 0 && a.olabel == 0;
  };
  for (StateId s = 0; s < n; ++s) {
    // fast path: no epsilon out-arcs → copy verbatim.  The closure
    // below is SPARSE (hash map over eps-reachable states only): a
    // dense n-sized dist per source state made this O(n²) memory
    // traffic on million-state graphs.
    bool has_eps = false;
    for (const Arc& arc : fst.ArcsAt(s)) {
      if (is_eps(arc)) { has_eps = true; break; }
    }
    if (!has_eps) {
      for (const Arc& arc : fst.ArcsAt(s)) out.AddArc(s, arc);
      if (fst.IsFinal(s)) out.SetFinal(s, fst.Final(s));
      continue;
    }
    // epsilon closure from s by Dijkstra over eps arcs (tropical)
    std::unordered_map<StateId, float> dist;
    using Item = std::pair<float, StateId>;
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
    dist[s] = 0.0f;
    pq.push({0.0f, s});
    float final_weight = kInfinity;
    while (!pq.empty()) {
      auto [d, u] = pq.top();
      pq.pop();
      auto du = dist.find(u);
      if (du != dist.end() && d > du->second) continue;
      if (fst.IsFinal(u)) {
        final_weight = std::min(final_weight, d + fst.Final(u));
      }
      for (const Arc& arc : fst.ArcsAt(u)) {
        if (is_eps(arc)) {
          float nd = d + arc.weight;
          auto it = dist.find(arc.nextstate);
          if (it == dist.end() || nd < it->second) {
            dist[arc.nextstate] = nd;
            pq.push({nd, arc.nextstate});
          }
        }
      }
    }
    for (const auto& [u, d] : dist) {
      for (const Arc& arc : fst.ArcsAt(u)) {
        if (is_eps(arc)) continue;
        out.AddArc(s, {arc.ilabel, arc.olabel, d + arc.weight,
                       arc.nextstate});
      }
    }
    if (final_weight != kInfinity) out.SetFinal(s, final_weight);
  }
  return Connect(out);
}

}  // namespace lctc
