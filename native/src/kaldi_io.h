// Minimal Kaldi table I/O for the native decoder tools: sequential
// float-matrix archive reading (the posterior arks written by
// nnet-forward/copy-feats) and generic keyed-blob archive writing for
// lattices.  Wire format matches Kaldi ("key \0B FM <int32 rows> ...",
// see lstm_ctc_tpu/kaldi/binio.py for the Python twin).
//
// rxfilenames/wxfilenames support files, "-" (stdio) and trailing/leading
// "|" shell pipes, like the reference's pyKaldiIO streams
// (kaldi_io.py:238-283).

#pragma once

#include <cstdint>
#include <cstdio>
#include <memory>
#include <string>
#include <vector>

namespace lctc {

struct Matrix {
  int32_t rows = 0;
  int32_t cols = 0;
  std::vector<float> data;  // row-major
  float operator()(int32_t r, int32_t c) const {
    return data[static_cast<size_t>(r) * cols + c];
  }
};

// byte stream over file / stdin / shell pipe
class ByteSource {
 public:
  explicit ByteSource(const std::string& rxfilename);
  ~ByteSource();
  bool Read(void* buf, size_t n);     // false at clean EOF before any byte
  int Peek();
  bool Eof();

 private:
  FILE* fh_ = nullptr;
  bool pipe_ = false;
};

class ByteSink {
 public:
  explicit ByteSink(const std::string& wxfilename);
  ~ByteSink();
  void Write(const void* buf, size_t n);
  void Close();

 private:
  FILE* fh_ = nullptr;
  bool pipe_ = false;
};

// strips "ark:" prefixes; scp is not needed by the decoder tools
std::string StripArkPrefix(const std::string& specifier);

class SequentialMatrixReader {
 public:
  explicit SequentialMatrixReader(const std::string& rspecifier);
  bool Next(std::string* key, Matrix* matrix);  // false at end

 private:
  std::unique_ptr<ByteSource> src_;
};

// writes "key \0B" then caller-provided payload via the returned sink
class ArchiveWriter {
 public:
  explicit ArchiveWriter(const std::string& wspecifier);
  void BeginEntry(const std::string& key);
  ByteSink* sink() { return sink_.get(); }

 private:
  std::unique_ptr<ByteSink> sink_;
};

void WriteMatrix(ByteSink* sink, const Matrix& m);

}  // namespace lctc
