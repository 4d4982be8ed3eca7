// count-ngrams: fast n-gram counting for the ARPA LM trainer.
//
// Native replacement for the counting phase of bin/train-lm.py so
// billion-token LM corpora (the reference trains its WSJ LMs with
// kaldi_lm/SRILM — reference local/wsj_train_lms.sh:1) count at C++
// speed; estimation stays in lstm_ctc_tpu/lm/ngram.py, which consumes
// these counts.  Semantics are EXACTLY lm/ngram.py _count_ngrams:
//   seq = [<s>] + tokens + [</s>]; the unigram (<s>) counts once per
//   sentence; for every position i >= 1 emit grams seq[i-k+1..i] for
//   k = 1..order that do not extend left of <s>; OOVs map to <unk>
//   when a vocabulary is given.
//
// Memory streams with the number of DISTINCT grams, not corpus size:
// unigrams are a direct array over interned ids; higher orders live in
// open-addressing flat hash tables keyed by packed id tuples (no
// per-gram heap allocation, linear probing).
//
// Usage:
//   count-ngrams --order 3 [--kaldi-text] [--vocab words.txt]
//                [--min-counts 1,1,2] text > counts.tsv
// Output: one line per surviving gram, "w1 w2 ... wk\tcount"
// (SRILM ngram-count -write format).  --min-counts drops k-grams
// (k >= 2) rarer than the k-th cutoff, matching train_ngram_lm.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxOrder = 9;

inline uint64_t HashIds(const uint32_t* ids, int k) {
  uint64_t h = 1469598103934665603ULL;
  for (int i = 0; i < k; ++i) {
    h ^= ids[i];
    h *= 1099511628211ULL;
    h ^= h >> 29;
  }
  return h;
}

// Open-addressing counter over fixed-width id tuples.
class FlatCounter {
 public:
  explicit FlatCounter(int k) : k_(k) { Rehash(1 << 16); }

  void Add(const uint32_t* ids) {
    if (size_ * 10 >= cap_ * 7) Rehash(cap_ * 2);
    size_t pos = Probe(ids);
    if (counts_[pos] == 0) {
      std::memcpy(&keys_[pos * k_], ids, sizeof(uint32_t) * k_);
      ++size_;
    }
    ++counts_[pos];
  }

  template <typename Fn>
  void ForEach(Fn fn) const {
    for (size_t i = 0; i < cap_; ++i) {
      if (counts_[i] != 0) fn(&keys_[i * k_], counts_[i]);
    }
  }

 private:
  size_t Probe(const uint32_t* ids) const {
    size_t pos = HashIds(ids, k_) & (cap_ - 1);
    while (counts_[pos] != 0 &&
           std::memcmp(&keys_[pos * k_], ids,
                       sizeof(uint32_t) * k_) != 0) {
      pos = (pos + 1) & (cap_ - 1);
    }
    return pos;
  }

  void Rehash(size_t new_cap) {
    std::vector<uint32_t> old_keys = std::move(keys_);
    std::vector<long long> old_counts = std::move(counts_);
    size_t old_cap = cap_;
    cap_ = new_cap;
    keys_.assign(cap_ * k_, 0);
    counts_.assign(cap_, 0);
    for (size_t i = 0; i < old_cap; ++i) {
      if (old_counts[i] == 0) continue;
      size_t pos = Probe(&old_keys[i * k_]);
      std::memcpy(&keys_[pos * k_], &old_keys[i * k_],
                  sizeof(uint32_t) * k_);
      counts_[pos] = old_counts[i];
    }
  }

  int k_;
  size_t cap_ = 0;
  size_t size_ = 0;
  std::vector<uint32_t> keys_;
  std::vector<long long> counts_;
};

}  // namespace

int main(int argc, char** argv) {
  int order = 3;
  bool kaldi_text = false;
  std::string vocab_path, text_path, min_counts_arg;
  std::string unk_sym = "<unk>";
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--order" && i + 1 < argc) {
      order = std::atoi(argv[++i]);
    } else if (a == "--kaldi-text") {
      kaldi_text = true;
    } else if (a == "--vocab" && i + 1 < argc) {
      vocab_path = argv[++i];
    } else if (a == "--min-counts" && i + 1 < argc) {
      min_counts_arg = argv[++i];
    } else if (a == "--unk" && i + 1 < argc) {
      unk_sym = argv[++i];   // OOV symbol (Kaldi wordlists use <UNK>)
    } else if (a.rfind("--", 0) == 0) {
      std::cerr << "count-ngrams: unknown option " << a << "\n";
      return 1;
    } else {
      text_path = a;
    }
  }
  if (order < 1 || order > kMaxOrder) {
    std::cerr << "count-ngrams: bad --order\n";
    return 1;
  }
  std::vector<long long> min_counts(order + 1, 1);
  if (!min_counts_arg.empty()) {
    std::stringstream ss(min_counts_arg);
    std::string item;
    int k = 1;
    while (std::getline(ss, item, ',') && k <= order) {
      min_counts[k++] = std::atoll(item.c_str());
    }
  }

  // token interning; <s>/</s>/<unk> get ids 0/1/2.  in_vocab[id] marks
  // words allowed when a vocabulary was given.
  std::unordered_map<std::string, uint32_t> ids;
  ids.reserve(1 << 20);
  std::vector<std::string> names;
  std::vector<char> in_vocab;
  auto intern = [&](const char* w, size_t len) {
    auto it = ids.find(std::string(w, len));  // SSO for typical words
    if (it != ids.end()) return it->second;
    uint32_t id = static_cast<uint32_t>(names.size());
    ids.emplace(std::string(w, len), id);
    names.emplace_back(w, len);
    in_vocab.push_back(0);
    return id;
  };
  const uint32_t kBos = intern("<s>", 3);
  const uint32_t kEos = intern("</s>", 4);
  const uint32_t kUnk = intern(unk_sym.c_str(), unk_sym.size());

  bool have_vocab = false;
  if (!vocab_path.empty()) {
    std::ifstream vf(vocab_path);
    if (!vf) {
      std::cerr << "count-ngrams: cannot open " << vocab_path << "\n";
      return 1;
    }
    std::string line;
    while (std::getline(vf, line)) {
      size_t a = line.find_first_not_of(" \t\r");
      if (a == std::string::npos) continue;
      size_t b = line.find_first_of(" \t\r", a);
      if (b == std::string::npos) b = line.size();
      in_vocab[intern(line.data() + a, b - a)] = 1;
    }
    in_vocab[kBos] = in_vocab[kEos] = in_vocab[kUnk] = 1;
    have_vocab = true;
  }

  std::istream* in = &std::cin;
  std::ifstream fin;
  if (!text_path.empty() && text_path != "-") {
    fin.open(text_path);
    if (!fin) {
      std::cerr << "count-ngrams: cannot open " << text_path << "\n";
      return 1;
    }
    in = &fin;
  }
  std::ios::sync_with_stdio(false);

  std::vector<long long> unigrams(1 << 16, 0);
  std::vector<FlatCounter> higher;
  for (int k = 2; k <= order; ++k) higher.emplace_back(k);

  std::string line;
  std::vector<uint32_t> seq;
  while (std::getline(*in, line)) {
    seq.clear();
    seq.push_back(kBos);
    const char* p = line.c_str();
    const char* end = p + line.size();
    bool first = true;
    while (p < end) {
      while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
      const char* tok = p;
      while (p < end && !std::isspace(static_cast<unsigned char>(*p))) ++p;
      if (p == tok) break;
      if (first && kaldi_text) {
        first = false;
        continue;  // drop the utterance id column
      }
      first = false;
      uint32_t id = intern(tok, static_cast<size_t>(p - tok));
      if (have_vocab && !in_vocab[id]) id = kUnk;
      seq.push_back(id);
    }
    if (seq.size() == 1) continue;  // empty / id-only line (skipped,
                                    // matching lm/ngram.py read_sentences)
    seq.push_back(kEos);
    if (names.size() > unigrams.size()) {
      unigrams.resize(names.size() * 2, 0);
    }
    // unigram (<s>) once per sentence (hosts a backoff weight)
    ++unigrams[kBos];
    const int n = static_cast<int>(seq.size());
    for (int i = 1; i < n; ++i) {
      ++unigrams[seq[i]];
      const int kmax = std::min(order, i + 1);
      for (int k = 2; k <= kmax; ++k) {
        higher[k - 2].Add(&seq[i - k + 1]);
      }
    }
  }

  std::string out;
  out.reserve(1 << 22);
  auto flush = [&]() {
    std::fwrite(out.data(), 1, out.size(), stdout);
    out.clear();
  };
  for (uint32_t id = 0; id < names.size(); ++id) {
    if (id < unigrams.size() && unigrams[id] > 0) {
      out += names[id];
      out.push_back('\t');
      out += std::to_string(unigrams[id]);
      out.push_back('\n');
      if (out.size() > (1 << 21)) flush();
    }
  }
  for (int k = 2; k <= order; ++k) {
    const long long cutoff = min_counts[k];
    higher[k - 2].ForEach([&](const uint32_t* g, long long c) {
      if (c < cutoff) return;
      for (int j = 0; j < k; ++j) {
        if (j) out.push_back(' ');
        out += names[g[j]];
      }
      out.push_back('\t');
      out += std::to_string(c);
      out.push_back('\n');
      if (out.size() > (1 << 21)) flush();
    });
  }
  flush();
  return 0;
}
