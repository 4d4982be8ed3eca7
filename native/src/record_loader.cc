// Native record-shard batch assembler (shared library, ctypes-loaded).
//
// The host input pipeline's hot loop — read utterance entries from record
// shards, splice frame context, subsample, and pad into the fixed-shape
// batch buffers — implemented in C++ for LibriSpeech-scale throughput
// (the role tf.data's C++ runtime plays in the reference, SURVEY §1 L2).
// Python keeps orchestration (bucketing plan, shuffling, threading); this
// library fills one batch per call into caller-allocated numpy arrays.
//
// Exported C ABI:
//   rl_open(path) -> handle          rl_close(handle)
//   rl_assemble(...)                 fill one padded batch
//
// Record wire format: see lstm_ctc_tpu/data/records.py.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Shard {
  FILE* fh;
};

constexpr char kMagic[4] = {'U', 'T', 'T', '1'};

#pragma pack(push, 1)
struct EntryHeader {
  char magic[4];
  uint32_t keylen;
  int32_t rows;
  int32_t cols;
  int32_t tgtlen;
};
#pragma pack(pop)

}  // namespace

extern "C" {

void* rl_open(const char* path) {
  FILE* fh = fopen(path, "rb");
  if (!fh) return nullptr;
  return new Shard{fh};
}

void rl_close(void* handle) {
  if (!handle) return;
  Shard* shard = static_cast<Shard*>(handle);
  fclose(shard->fh);
  delete shard;
}

// Assemble one row of a padded batch from the entry at `offset`:
//   feats_out: [time_pad, cols * (1 + left + right)] float32 (zeroed rows
//              beyond the written length by the caller or here)
//   labels_out: [label_pad] int32, pre-filled with -1 by the caller
// Returns the post-subsample frame count (>= 0) or -1 on error.
// label_len_out receives the label count (0 if unlabeled).
int32_t rl_load_row(void* handle, int64_t offset,
                    int32_t left, int32_t right, int32_t subsample,
                    float* feats_out, int32_t time_pad,
                    int32_t* labels_out, int32_t label_pad,
                    int32_t* label_len_out) {
  Shard* shard = static_cast<Shard*>(handle);
  if (!shard) return -1;
  if (fseek(shard->fh, offset, SEEK_SET) != 0) return -1;
  EntryHeader header;
  if (fread(&header, sizeof(header), 1, shard->fh) != 1) return -1;
  if (memcmp(header.magic, kMagic, 4) != 0) return -1;
  if (fseek(shard->fh, header.keylen, SEEK_CUR) != 0) return -1;

  const int32_t rows = header.rows, cols = header.cols;
  std::vector<float> raw(static_cast<size_t>(rows) * cols);
  if (rows > 0 &&
      fread(raw.data(), sizeof(float), raw.size(), shard->fh) !=
          raw.size()) {
    return -1;
  }

  const int32_t window = 1 + left + right;
  const int32_t out_cols = cols * window;
  const int32_t factor = (subsample > 1) ? subsample : 1;
  const int32_t out_rows_all = (factor > 1) ? rows / factor : rows;
  const int32_t out_rows = out_rows_all < time_pad ? out_rows_all
                                                   : time_pad;

  // splice (+edge clamp) and subsample in one pass
  for (int32_t r = 0; r < out_rows; ++r) {
    const int32_t t = r * factor;
    float* dst = feats_out + static_cast<int64_t>(r) * out_cols;
    for (int32_t w = 0; w < window; ++w) {
      int32_t src = t + w - left;
      if (src < 0) src = 0;
      if (src >= rows) src = rows - 1;
      memcpy(dst + static_cast<int64_t>(w) * cols,
             raw.data() + static_cast<int64_t>(src) * cols,
             sizeof(float) * cols);
    }
  }

  // labels
  int32_t label_len = 0;
  if (header.tgtlen > 0) {
    std::vector<int32_t> labels(header.tgtlen);
    if (fread(labels.data(), sizeof(int32_t), labels.size(), shard->fh) !=
        labels.size()) {
      return -1;
    }
    label_len = header.tgtlen < label_pad ? header.tgtlen : label_pad;
    memcpy(labels_out, labels.data(), sizeof(int32_t) * label_len);
  }
  if (label_len_out) *label_len_out = label_len;
  return out_rows;
}

}  // extern "C"
