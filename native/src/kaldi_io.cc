#include "kaldi_io.h"

#include <cstring>
#include <stdexcept>

namespace lctc {

// --- byte streams ------------------------------------------------------------

ByteSource::ByteSource(const std::string& rxfilename) {
  if (rxfilename.empty() || rxfilename == "-") {
    fh_ = stdin;
  } else if (!rxfilename.empty() && rxfilename.back() == '|') {
    std::string cmd = rxfilename.substr(0, rxfilename.size() - 1);
    fh_ = popen(cmd.c_str(), "r");
    pipe_ = true;
  } else {
    fh_ = fopen(rxfilename.c_str(), "rb");
  }
  if (!fh_) throw std::runtime_error("cannot open input " + rxfilename);
}

ByteSource::~ByteSource() {
  if (!fh_ || fh_ == stdin) return;
  if (pipe_) {
    pclose(fh_);
  } else {
    fclose(fh_);
  }
}

bool ByteSource::Read(void* buf, size_t n) {
  size_t got = fread(buf, 1, n, fh_);
  if (got == 0) return false;
  if (got != n) throw std::runtime_error("short read in archive");
  return true;
}

int ByteSource::Peek() {
  int c = fgetc(fh_);
  if (c != EOF) ungetc(c, fh_);
  return c;
}

bool ByteSource::Eof() { return Peek() == EOF; }

ByteSink::ByteSink(const std::string& wxfilename) {
  if (wxfilename.empty() || wxfilename == "-") {
    fh_ = stdout;
  } else if (wxfilename.front() == '|') {
    std::string cmd = wxfilename.substr(1);
    fh_ = popen(cmd.c_str(), "w");
    pipe_ = true;
  } else {
    fh_ = fopen(wxfilename.c_str(), "wb");
  }
  if (!fh_) throw std::runtime_error("cannot open output " + wxfilename);
}

ByteSink::~ByteSink() { Close(); }

void ByteSink::Write(const void* buf, size_t n) {
  if (fwrite(buf, 1, n, fh_) != n) {
    throw std::runtime_error("short write");
  }
}

void ByteSink::Close() {
  if (!fh_) return;
  if (fh_ == stdout) {
    fflush(fh_);
  } else if (pipe_) {
    pclose(fh_);
  } else {
    fclose(fh_);
  }
  fh_ = nullptr;
}

std::string StripArkPrefix(const std::string& specifier) {
  size_t pos = specifier.find(':');
  if (pos == std::string::npos) return specifier;
  std::string before = specifier.substr(0, pos);
  // drop option letters (ark,t:, ark,s,cs: ...)
  if (before.rfind("ark", 0) == 0 || before.rfind("scp", 0) == 0 ||
      before.find(',') != std::string::npos) {
    return specifier.substr(pos + 1);
  }
  return specifier;
}

// --- matrix archive ----------------------------------------------------------

SequentialMatrixReader::SequentialMatrixReader(const std::string& rspec)
    : src_(std::make_unique<ByteSource>(StripArkPrefix(rspec))) {}

static int32_t ReadBasicInt32(ByteSource* src) {
  unsigned char marker;
  if (!src->Read(&marker, 1) || marker != 4) {
    throw std::runtime_error("bad int32 size marker in archive");
  }
  int32_t value;
  if (!src->Read(&value, 4)) {
    throw std::runtime_error("truncated archive: EOF inside int32");
  }
  return value;
}

bool SequentialMatrixReader::Next(std::string* key, Matrix* matrix) {
  // skip whitespace between entries
  int c;
  key->clear();
  while ((c = src_->Peek()) != EOF &&
         (c == ' ' || c == '\n' || c == '\t' || c == '\r')) {
    char tmp;
    src_->Read(&tmp, 1);
  }
  if (src_->Eof()) return false;
  // read key up to space
  char ch;
  while (src_->Read(&ch, 1)) {
    if (ch == ' ') break;
    key->push_back(ch);
  }
  char magic[2];
  if (!src_->Read(magic, 2) || magic[0] != '\0' || magic[1] != 'B') {
    throw std::runtime_error("text archives not supported by the native "
                             "decoder; pipe through copy-feats first");
  }
  char token[4] = {0, 0, 0, 0};
  if (!src_->Read(token, 3)) {  // "FM " expected
    throw std::runtime_error("truncated archive: EOF inside header");
  }
  if (std::memcmp(token, "FM ", 3) != 0) {
    throw std::runtime_error(std::string("expected FM matrix, got '") +
                             token + "'");
  }
  matrix->rows = ReadBasicInt32(src_.get());
  matrix->cols = ReadBasicInt32(src_.get());
  if (matrix->rows < 0 || matrix->cols < 0 ||
      static_cast<int64_t>(matrix->rows) * matrix->cols > (1LL << 31)) {
    throw std::runtime_error("corrupt archive: implausible matrix shape");
  }
  matrix->data.resize(static_cast<size_t>(matrix->rows) * matrix->cols);
  if (!matrix->data.empty() &&
      !src_->Read(matrix->data.data(), matrix->data.size() * 4)) {
    throw std::runtime_error("truncated archive: EOF inside matrix data");
  }
  return true;
}

ArchiveWriter::ArchiveWriter(const std::string& wspec)
    : sink_(std::make_unique<ByteSink>(StripArkPrefix(wspec))) {}

void ArchiveWriter::BeginEntry(const std::string& key) {
  sink_->Write(key.data(), key.size());
  sink_->Write(" \0B", 3);
}

void WriteMatrix(ByteSink* sink, const Matrix& m) {
  sink->Write("FM ", 3);
  unsigned char four = 4;
  sink->Write(&four, 1);
  sink->Write(&m.rows, 4);
  sink->Write(&four, 1);
  sink->Write(&m.cols, 4);
  sink->Write(m.data.data(), m.data.size() * 4);
}

}  // namespace lctc
