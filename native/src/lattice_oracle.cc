// lattice-oracle — oracle word-error of lattices against references
// (Kaldi lattice-oracle equivalent): for each lattice, the minimum edit
// distance between the reference transcript and ANY path through the
// lattice, computed as a shortest path over the (lattice-state ×
// reference-position) product graph (substitution/insertion/deletion
// cost 1, epsilon arcs free).
//
// usage: lattice-oracle <lattice-rspecifier> <ref-int-text> <out-text>
//   ref-int-text lines: "key w1 w2 ..." (integer word ids)
//   out lines:          "key <distance> <ref-length>"
// and a summary "%WER" line on stderr.

#include <cstring>
#include <fstream>
#include <iostream>
#include <limits>
#include <queue>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "kaldi_io.h"
#include "lattice.h"

using namespace lctc;

namespace {

int32_t OracleDistance(const Lattice& lat,
                       const std::vector<int32_t>& ref) {
  if (lat.Start() < 0) return static_cast<int32_t>(ref.size());
  const int32_t num_pos = static_cast<int32_t>(ref.size()) + 1;
  const int64_t num_nodes =
      static_cast<int64_t>(lat.NumStates()) * num_pos;
  std::vector<int32_t> dist(num_nodes,
                            std::numeric_limits<int32_t>::max());
  auto node = [&](int32_t s, int32_t i) {
    return static_cast<int64_t>(s) * num_pos + i;
  };
  using Item = std::pair<int32_t, int64_t>;
  std::priority_queue<Item, std::vector<Item>, std::greater<Item>> pq;
  dist[node(lat.Start(), 0)] = 0;
  pq.push({0, node(lat.Start(), 0)});
  int32_t best = std::numeric_limits<int32_t>::max();
  while (!pq.empty()) {
    auto [d, n] = pq.top();
    pq.pop();
    if (d > dist[n]) continue;
    int32_t s = static_cast<int32_t>(n / num_pos);
    int32_t i = static_cast<int32_t>(n % num_pos);
    if (lat.Final(s).is_final) {
      // remaining reference words are deletions
      int32_t total = d + (static_cast<int32_t>(ref.size()) - i);
      if (total < best) best = total;
    }
    auto relax = [&](int32_t ns, int32_t ni, int32_t cost) {
      int64_t nn = node(ns, ni);
      if (d + cost < dist[nn]) {
        dist[nn] = d + cost;
        pq.push({d + cost, nn});
      }
    };
    // deletion: skip a reference word without moving in the lattice
    if (i < static_cast<int32_t>(ref.size())) relax(s, i + 1, 1);
    for (const LatticeArc& arc : lat.ArcsAt(s)) {
      if (arc.olabel == 0) {
        relax(arc.nextstate, i, 0);             // epsilon: free
        continue;
      }
      // insertion: lattice emits a word not aligned to the reference
      relax(arc.nextstate, i, 1);
      if (i < static_cast<int32_t>(ref.size())) {
        // match or substitution
        relax(arc.nextstate, i + 1, arc.olabel == ref[i] ? 0 : 1);
      }
    }
  }
  return best == std::numeric_limits<int32_t>::max()
             ? static_cast<int32_t>(ref.size())
             : best;
}

}  // namespace

int main(int argc, char** argv) {
  std::vector<std::string> args;
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg.rfind("--", 0) == 0) {
      std::cerr << "lattice-oracle: ignoring flag " << arg << "\n";
    } else {
      args.push_back(arg);
    }
  }
  if (args.size() != 3) {
    std::cerr << "usage: lattice-oracle <lattice-rspecifier> "
                 "<ref-int-text> <out-text>\n";
    return 1;
  }
  std::unordered_map<std::string, std::vector<int32_t>> refs;
  {
    std::ifstream rf(args[1]);
    if (!rf) {
      std::cerr << "cannot open " << args[1] << "\n";
      return 1;
    }
    std::string line;
    while (std::getline(rf, line)) {
      std::istringstream ss(line);
      std::string key;
      if (!(ss >> key)) continue;
      std::vector<int32_t> words;
      int32_t w;
      while (ss >> w) words.push_back(w);
      refs[key] = words;
    }
  }
  try {
    ByteSource src(StripArkPrefix(args[0]));
    ByteSink out(StripArkPrefix(args[2]));
    std::string key;
    Lattice lat;
    int64_t total_err = 0, total_ref = 0;
    while (Lattice::Read(&src, &key, &lat)) {
      auto it = refs.find(key);
      if (it == refs.end()) {
        std::cerr << "lattice-oracle: no reference for " << key << "\n";
        continue;
      }
      int32_t d = OracleDistance(lat, it->second);
      total_err += d;
      total_ref += it->second.size();
      std::string line = key + " " + std::to_string(d) + " " +
                         std::to_string(it->second.size()) + "\n";
      out.Write(line.data(), line.size());
    }
    std::cerr << "lattice-oracle: oracle %WER "
              << (total_ref ? 100.0 * total_err / total_ref : 0.0)
              << " [" << total_err << " / " << total_ref << "]\n";
  } catch (const std::exception& e) {
    std::cerr << "lattice-oracle: " << e.what() << "\n";
    return 1;
  }
  return 0;
}
