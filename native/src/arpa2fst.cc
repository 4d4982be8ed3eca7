// ARPA n-gram LM → G.fst (the arpa2fst --disambig-symbol=#0 step of the
// TLG build, reference local/make_TLG.sh:69-79).
//
// Standard backoff topology: one state per history; word arcs carry
// -log10prob·ln(10); backoff arcs carry the backoff weight with the
// disambiguation symbol (#0) on the input side and epsilon output.
// <s> seeds the start history; </s> contributes final weights.  OOV
// n-grams (words absent from words.txt) are dropped with a count report.

#include <cmath>
#include <cstdint>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "fst.h"

namespace lctc {

namespace {
constexpr float kLn10 = 2.302585092994046f;

struct HistoryHash {
  size_t operator()(const std::vector<Label>& h) const {
    size_t v = 1469598103934665603ull;
    for (Label l : h) v = (v ^ static_cast<size_t>(l)) * 1099511628211ull;
    return v;
  }
};
}  // namespace

Fst ArpaToFst(std::istream& is, const SymbolTable& words,
              const std::string& disambig_symbol, std::ostream& log) {
  Label bos = words.Find("<s>");
  Label eos = words.Find("</s>");
  Label backoff_label =
      disambig_symbol.empty() ? 0 : words.Find(disambig_symbol);
  if (!disambig_symbol.empty() && backoff_label < 0) {
    throw std::runtime_error("disambig symbol " + disambig_symbol +
                             " not in words.txt");
  }

  Fst fst;
  std::unordered_map<std::vector<Label>, StateId, HistoryHash> history;
  auto state_of = [&](const std::vector<Label>& h) {
    auto it = history.find(h);
    if (it != history.end()) return it->second;
    StateId s = fst.AddState();
    history[h] = s;
    return s;
  };

  StateId null_state = state_of({});  // unigram / empty history

  std::string line;
  int order = 0, current = 0;
  long dropped = 0, count = 0;
  while (std::getline(is, line)) {
    // strip CR and whitespace
    while (!line.empty() && (line.back() == '\r' || line.back() == ' ')) {
      line.pop_back();
    }
    if (line.empty()) continue;
    if (line[0] == '\\') {
      if (line == "\\data\\" || line == "\\end\\") { current = 0; continue; }
      size_t pos = line.find("-grams:");
      if (pos != std::string::npos) {
        current = std::stoi(line.substr(1, pos - 1));
        order = std::max(order, current);
      }
      continue;
    }
    if (current == 0) {
      // \data\ section: "ngram N=M" declares the orders up front — the
      // max order decides which entries carry backoff states
      if (line.rfind("ngram ", 0) == 0) {
        size_t eq = line.find('=');
        if (eq != std::string::npos) {
          order = std::max(order, std::stoi(line.substr(6, eq - 6)));
        }
      }
      continue;  // other header lines
    }

    std::istringstream ss(line);
    float logp;
    if (!(ss >> logp)) continue;
    std::vector<std::string> grams(current);
    bool ok = true;
    for (int i = 0; i < current; ++i) {
      if (!(ss >> grams[i])) { ok = false; break; }
    }
    if (!ok) continue;
    float backoff = 0.0f;
    bool has_backoff = static_cast<bool>(ss >> backoff);

    std::vector<Label> ids(current);
    for (int i = 0; i < current; ++i) {
      ids[i] = words.Find(grams[i]);
      if (ids[i] < 0 && grams[i] != "<s>" && grams[i] != "</s>") {
        ok = false;
        break;
      }
    }
    if (!ok) { ++dropped; continue; }
    ++count;

    std::vector<Label> hist(ids.begin(), ids.end() - 1);
    Label word = ids.back();
    float weight = -logp * kLn10;

    StateId src = state_of(hist);
    if (grams.back() == "</s>") {
      float prev = fst.Final(src);
      fst.SetFinal(src, prev == kInfinity ? weight
                                          : std::min(prev, weight));
    } else if (grams.back() == "<s>") {
      // seeds the start history; probability itself unused on arcs
    } else {
      // destination history: the longest suffix that is a real state
      // will be created on demand — use full (up to order-1) history
      std::vector<Label> next_hist(ids.begin(), ids.end());
      if (static_cast<int>(next_hist.size()) >= order) {
        next_hist.erase(next_hist.begin());
      }
      fst.AddArc(src, {word, word, weight, state_of(next_hist)});
    }
    // ARPA's backoff field is OPTIONAL (SRILM/kaldi_lm omit it for
    // n-grams never seen as a context — bow = 0 by convention); without
    // the implicit arc the destination state of the word arc above
    // would be a dead end that Connect() trims, silently rerouting
    // through the shorter history at the wrong score.  </s>-final
    // n-grams create no context state at all.
    if (current < order && grams.back() != "</s>") {
      std::vector<Label> full(ids.begin(), ids.end());
      StateId from = state_of(full);
      // backoff to the suffix history
      std::vector<Label> shorter(full.begin() + 1, full.end());
      fst.AddArc(from, {backoff_label, 0,
                        has_backoff ? -backoff * kLn10 : 0.0f,
                        state_of(shorter)});
    }
  }

  // start state: <s> history if present, else the null history
  std::vector<Label> start_hist{bos};
  auto it = history.find(start_hist);
  fst.SetStart(it != history.end() ? it->second : null_state);

  // any state with no explicit backoff and no final weight could be a
  // dead end; Connect() trims those.
  log << "arpa2fst: " << count << " n-grams, " << dropped
      << " dropped (OOV), " << fst.NumStates() << " states\n";
  if (count == 0) {
    // binary junk (e.g. a still-gzipped ARPA) parses to nothing; an
    // empty G would silently become an empty TLG downstream
    throw std::runtime_error(
        "arpa2fst: no n-grams parsed — is the input a valid "
        "(uncompressed) ARPA file?");
  }
  return Connect(fst);
}

}  // namespace lctc
