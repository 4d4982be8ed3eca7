// lattice-scale / lattice-best-path — native equivalents of the Kaldi
// lattice tools used by the scoring sweep (reference local/score.sh:43-52).
// Dispatch by argv[0] (symlinks) or first argument.
//
//   lattice-scale --acoustic-scale=K [--ascale-factor=F] <in> <out>
//   lattice-best-path [--word-symbol-table=f] [--write-costs=f] <in>
//       <out-text>
//       output: "key w1 w2 ...\n" integer text (pipe through int2sym.pl);
//       --write-costs emits "key total_cost\n" per utterance (used by the
//       const-arpa vs G.fst rescoring equivalence tests)
//   lattice-prune [--beam=B] <in> <out>
//       beam-prune paths > B worse than the best (graph+acoustic)

#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <string>
#include <vector>

#include "kaldi_io.h"
#include "lattice.h"

using namespace lctc;

int main(int argc, char** argv) {
  std::string prog = argv[0];
  size_t slash = prog.find_last_of('/');
  if (slash != std::string::npos) prog = prog.substr(slash + 1);
  int arg_start = 1;
  std::string cmd;
  if (prog == "lattice-scale" || prog == "lattice-best-path" ||
      prog == "lattice-prune") {
    cmd = prog;
  } else {
    if (argc < 2) {
      std::cerr << "usage: lattice-tools <lattice-scale|lattice-best-path> "
                   "...\n";
      return 1;
    }
    cmd = argv[1];
    arg_start = 2;
  }

  float acoustic_scale = 1.0f;
  float ascale_factor = 1.0f;
  float beam = 10.0f;
  std::string costs_file;
  std::vector<std::string> args;
  for (int i = arg_start; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg.rfind("--acoustic-scale=", 0) == 0) {
      acoustic_scale = atof(arg.c_str() + 17);
    } else if (arg.rfind("--ascale-factor=", 0) == 0) {
      ascale_factor = atof(arg.c_str() + 16);
    } else if (arg.rfind("--write-costs=", 0) == 0) {
      costs_file = arg.substr(14);
    } else if (arg.rfind("--beam=", 0) == 0) {
      beam = atof(arg.c_str() + 7);
    } else if (arg.rfind("--word-symbol-table=", 0) == 0) {
      // accepted for CLI parity; output stays integer text
    } else if (arg.rfind("--", 0) == 0) {
      std::cerr << cmd << ": ignoring unknown flag " << arg << "\n";
    } else {
      args.push_back(arg);
    }
  }
  if (args.size() != 2) {
    std::cerr << "usage: " << cmd << " [flags] <in> <out>\n";
    return 1;
  }

  try {
    ByteSource src(StripArkPrefix(args[0]));
    std::string key;
    Lattice lat;
    if (cmd == "lattice-scale") {
      ArchiveWriter writer(args[1]);
      while (Lattice::Read(&src, &key, &lat)) {
        lat.ScaleAcoustic(acoustic_scale * ascale_factor);
        writer.BeginEntry(key);
        lat.Write(writer.sink());
      }
    } else if (cmd == "lattice-best-path") {
      ByteSink sink(StripArkPrefix(args[1]));
      std::ofstream costs;
      if (!costs_file.empty()) costs.open(costs_file);
      while (Lattice::Read(&src, &key, &lat)) {
        float total_cost = 0.0f;
        std::vector<int32_t> words = lat.BestPath(nullptr, &total_cost);
        std::string line = key;
        for (int32_t w : words) line += " " + std::to_string(w);
        line += "\n";
        sink.Write(line.data(), line.size());
        if (costs.is_open()) costs << key << " " << total_cost << "\n";
      }
    } else if (cmd == "lattice-prune") {
      ArchiveWriter writer(args[1]);
      while (Lattice::Read(&src, &key, &lat)) {
        if (!lat.Prune(beam)) {
          std::cerr << "lattice-prune: cyclic lattice for " << key
                    << ", passing through\n";
        }
        writer.BeginEntry(key);
        lat.Write(writer.sink());
      }
    } else {
      std::cerr << "unknown lattice tool " << cmd << "\n";
      return 1;
    }
  } catch (const std::exception& e) {
    std::cerr << cmd << ": " << e.what() << "\n";
    return 1;
  }
  return 0;
}
