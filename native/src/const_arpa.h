// Compact, mmap-able ARPA n-gram LM for large-LM lattice rescoring —
// the native equivalent of Kaldi's ConstArpaLm as used by
// steps/lmrescore_const_arpa.sh for the reference recipes' headline
// numbers (reference egs/libri/run_libri_ph.sh:333-337,
// egs/wsj/run_wsj_phn.sh:279-286).  A tglarge/fglarge-class 4-gram as a
// G.fst needs determinization-scale memory; this representation is a
// flat packed trie — 24 bytes per n-gram, loaded by mmap with no parse —
// queried on demand during lattice rescoring.
//
// Layout: one array of CarpaEntry.  Entry 0 is the synthetic empty
// history (root) whose children are the unigrams; each entry's children
// (its n-gram extensions) are a contiguous range sorted by word id for
// binary search; `suffix` points to the longest existing shorter history
// (the backoff target), so p(w|h) walks suffix links accumulating
// backoff costs exactly like the ARPA backoff recursion.

#pragma once

#include <cstdint>
#include <iosfwd>
#include <memory>
#include <string>
#include <utility>
#include <vector>

#include "fst.h"

namespace lctc {

#pragma pack(push, 4)
struct CarpaEntry {
  int32_t word;         // internal word id (kBosWord/kEosWord sentinels)
  float cost;           // -ln p(word | history)
  float bow;            // -ln backoff weight of this n-gram as a history
  int32_t child_begin;  // extension range in entries[], sorted by word
  int32_t child_end;
  int32_t suffix;       // longest existing suffix history; -1 above root
};
#pragma pack(pop)
static_assert(sizeof(CarpaEntry) == 24, "CarpaEntry must pack to 24B");

class ConstArpaLm {
 public:
  // <s> / </s> ids when absent from words.txt (never collide with real
  // word ids, which are >= 0)
  static constexpr int32_t kBosWord = -3;
  static constexpr int32_t kEosWord = -2;

  // parse ARPA text (possibly from a pipe); words maps tokens to the
  // lattice/output symbol ids.  OOV n-grams and n-grams whose prefix is
  // absent are dropped with a count report.
  static ConstArpaLm Build(std::istream& arpa, const SymbolTable& words,
                           std::ostream& log);

  void Write(const std::string& path) const;
  static ConstArpaLm Read(const std::string& path);   // mmaps the file
  static bool IsCarpaFile(const std::string& path);

  int32_t Start() const { return start_state_; }
  // {-ln p(word | state-history), next history state}; cost == infinity
  // when the word is not even a unigram
  std::pair<float, int32_t> LookupWord(int32_t state, int32_t word) const;
  float FinalCost(int32_t state) const;               // p(</s> | h)

  int64_t NumEntries() const { return num_entries_; }
  int order() const { return order_; }

 private:
  ConstArpaLm() = default;

  const CarpaEntry* entries_ = nullptr;
  int64_t num_entries_ = 0;
  int32_t start_state_ = 0;
  int32_t eos_id_ = kEosWord;
  int order_ = 0;

  std::vector<CarpaEntry> owned_;      // when built in memory
  std::shared_ptr<void> mapping_;      // when mmap'd from disk
};

}  // namespace lctc
