// ConstArpaLm build / serialize / query.  See const_arpa.h.

#include "const_arpa.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>
#include <iostream>
#include <limits>
#include <sstream>
#include <stdexcept>

namespace lctc {

namespace {

constexpr float kLn10 = 2.302585092994046f;
constexpr char kMagic[8] = {'L', 'C', 'A', 'R', 'P', 'A', '1', '\n'};

struct CarpaHeader {
  char magic[8];
  int32_t order;
  int32_t start_state;
  int64_t num_entries;
  int32_t eos_id;
  int32_t reserved[9];  // pad header to 64 bytes
};
static_assert(sizeof(CarpaHeader) == 64, "header must be 64B");

// binary search `word` in the child range of `entries[s]`
int32_t FindChild(const CarpaEntry* entries, int32_t s, int32_t word) {
  int32_t lo = entries[s].child_begin, hi = entries[s].child_end;
  while (lo < hi) {
    int32_t mid = lo + (hi - lo) / 2;
    if (entries[mid].word < word) {
      lo = mid + 1;
    } else {
      hi = mid;
    }
  }
  if (lo < entries[s].child_end && entries[lo].word == word) return lo;
  return -1;
}

}  // namespace

ConstArpaLm ConstArpaLm::Build(std::istream& arpa, const SymbolTable& words,
                               std::ostream& log) {
  const Label bos_sym = words.Find("<s>");
  const Label eos_sym = words.Find("</s>");
  const int32_t bos_id = bos_sym >= 0 ? bos_sym : kBosWord;
  const int32_t eos_id = eos_sym >= 0 ? eos_sym : kEosWord;

  ConstArpaLm lm;
  lm.eos_id_ = eos_id;
  auto& entries = lm.owned_;
  entries.push_back({std::numeric_limits<int32_t>::min(), kInfinity, 0.0f,
                     0, 0, -1});  // 0 = root (empty history)

  // walk the finalized trie along a word-id path; -1 when absent
  auto find_path = [&entries](const int32_t* ids, int len) {
    int32_t s = 0;
    for (int i = 0; i < len; ++i) {
      s = FindChild(entries.data(), s, ids[i]);
      if (s < 0) return int32_t{-1};
    }
    return s;
  };

  struct Raw {
    int32_t parent;
    int32_t word;
    float cost;
    float bow;
    bool operator<(const Raw& o) const {
      return parent != o.parent ? parent < o.parent : word < o.word;
    }
  };

  // finalize one ARPA order: sort, append, wire parent child-ranges and
  // suffix links (parents and all shorter orders are already final)
  auto flush_order = [&](std::vector<Raw>& raws, int k, long* dup) {
    std::sort(raws.begin(), raws.end());
    const int32_t base = static_cast<int32_t>(entries.size());
    int32_t out = 0;
    for (size_t i = 0; i < raws.size(); ++i) {
      if (i > 0 && raws[i].parent == raws[i - 1].parent &&
          raws[i].word == raws[i - 1].word) {
        ++*dup;
        continue;
      }
      raws[out++] = raws[i];
    }
    raws.resize(out);
    entries.reserve(entries.size() + raws.size());
    for (size_t i = 0; i < raws.size(); ++i) {
      const Raw& r = raws[i];
      int32_t idx = base + static_cast<int32_t>(i);
      if (entries[r.parent].child_begin == entries[r.parent].child_end) {
        entries[r.parent].child_begin = idx;
      }
      entries[r.parent].child_end = idx + 1;
      // suffix of (w1..wk) = longest existing history among (w2..wk),
      // (w3..wk), …: walk the parent's suffix chain looking for a child
      // labelled `word`; the chain bottoms out at the root (0)
      int32_t suffix = 0;
      for (int32_t s = entries[r.parent].suffix; s >= 0;
           s = entries[s].suffix) {
        int32_t c = FindChild(entries.data(), s, r.word);
        if (c >= 0) { suffix = c; break; }
      }
      if (k == 1) suffix = 0;  // suffix of a unigram history is the root
      entries.push_back({r.word, r.cost, r.bow, 0, 0, suffix});
    }
    raws.clear();
  };

  std::string line;
  int current = 0;
  long dropped_oov = 0, dropped_prefix = 0, dup = 0, count = 0;
  std::vector<Raw> raws;
  std::vector<int32_t> ids;
  while (std::getline(arpa, line)) {
    while (!line.empty() && (line.back() == '\r' || line.back() == ' ')) {
      line.pop_back();
    }
    if (line.empty()) continue;
    if (line[0] == '\\') {
      if (current > 0) flush_order(raws, current, &dup);
      if (line == "\\data\\" || line == "\\end\\") { current = 0; continue; }
      size_t pos = line.find("-grams:");
      current = pos != std::string::npos
          ? std::stoi(line.substr(1, pos - 1)) : 0;
      lm.order_ = std::max(lm.order_, current);
      continue;
    }
    if (current == 0) continue;  // \data\ header lines

    std::istringstream ss(line);
    float logp;
    if (!(ss >> logp)) continue;
    ids.clear();
    bool ok = true;
    for (int i = 0; i < current; ++i) {
      std::string tok;
      if (!(ss >> tok)) { ok = false; break; }
      Label id = words.Find(tok);
      if (id < 0) {
        if (tok == "<s>") {
          id = bos_id;
        } else if (tok == "</s>") {
          id = eos_id;
        } else {
          ok = false;
          break;
        }
      }
      ids.push_back(id);
    }
    if (!ok) { ++dropped_oov; continue; }
    float backoff = 0.0f;
    ss >> backoff;

    int32_t parent = current == 1 ? 0
                                  : find_path(ids.data(), current - 1);
    if (parent < 0) { ++dropped_prefix; continue; }
    ++count;
    raws.push_back({parent, ids.back(), -logp * kLn10, -backoff * kLn10});
  }
  if (current > 0) flush_order(raws, current, &dup);

  lm.entries_ = entries.data();
  lm.num_entries_ = static_cast<int64_t>(entries.size());
  int32_t start = FindChild(entries.data(), 0, bos_id);
  lm.start_state_ = start >= 0 ? start : 0;
  log << "const-arpa: order " << lm.order_ << ", " << count
      << " n-grams kept, " << dropped_oov << " dropped (OOV), "
      << dropped_prefix << " dropped (missing prefix), " << dup
      << " duplicates\n";
  return lm;
}

void ConstArpaLm::Write(const std::string& path) const {
  std::ofstream os(path, std::ios::binary | std::ios::trunc);
  if (!os) throw std::runtime_error("cannot write " + path);
  CarpaHeader h{};
  std::memcpy(h.magic, kMagic, 8);
  h.order = order_;
  h.start_state = start_state_;
  h.num_entries = num_entries_;
  h.eos_id = eos_id_;
  os.write(reinterpret_cast<const char*>(&h), sizeof(h));
  os.write(reinterpret_cast<const char*>(entries_),
           num_entries_ * sizeof(CarpaEntry));
  if (!os) throw std::runtime_error("write failed for " + path);
}

bool ConstArpaLm::IsCarpaFile(const std::string& path) {
  std::ifstream is(path, std::ios::binary);
  char magic[8] = {};
  is.read(magic, 8);
  return is && std::memcmp(magic, kMagic, 8) == 0;
}

ConstArpaLm ConstArpaLm::Read(const std::string& path) {
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) throw std::runtime_error("cannot open " + path);
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    throw std::runtime_error("cannot stat " + path);
  }
  size_t size = static_cast<size_t>(st.st_size);
  void* base = mmap(nullptr, size, PROT_READ, MAP_SHARED, fd, 0);
  close(fd);  // mapping stays valid
  if (base == MAP_FAILED) throw std::runtime_error("mmap failed " + path);

  const auto* h = static_cast<const CarpaHeader*>(base);
  if (size < sizeof(CarpaHeader) ||
      std::memcmp(h->magic, kMagic, 8) != 0 ||
      size < sizeof(CarpaHeader) + h->num_entries * sizeof(CarpaEntry)) {
    munmap(base, size);
    throw std::runtime_error(path + " is not a valid carpa file");
  }
  ConstArpaLm lm;
  lm.mapping_ = std::shared_ptr<void>(
      base, [size](void* p) { munmap(p, size); });
  lm.entries_ = reinterpret_cast<const CarpaEntry*>(
      static_cast<const char*>(base) + sizeof(CarpaHeader));
  lm.num_entries_ = h->num_entries;
  lm.start_state_ = h->start_state;
  lm.eos_id_ = h->eos_id;
  lm.order_ = h->order;
  return lm;
}

std::pair<float, int32_t> ConstArpaLm::LookupWord(int32_t state,
                                                  int32_t word) const {
  float backoff = 0.0f;
  for (int32_t s = state; s >= 0; s = entries_[s].suffix) {
    int32_t idx = FindChild(entries_, s, word);
    if (idx >= 0) return {backoff + entries_[idx].cost, idx};
    backoff += entries_[s].bow;
  }
  return {kInfinity, -1};
}

float ConstArpaLm::FinalCost(int32_t state) const {
  return LookupWord(state, eos_id_).first;
}

}  // namespace lctc
