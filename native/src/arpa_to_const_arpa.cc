// arpa-to-const-arpa — compile an ARPA LM into the mmap-able packed-trie
// form used by lattice-lmrescore for large-LM rescoring.  Native
// equivalent of Kaldi's arpa-to-const-arpa as invoked by
// steps/lmrescore_const_arpa.sh (the reference recipes' tglarge/fglarge
// stages, egs/libri/run_libri_ph.sh:333-337); words are mapped through
// words.txt here instead of a separate map_arpa_lm.pl pass.
//
// usage: arpa-to-const-arpa <arpa-rxfilename|-> <words.txt> <out.carpa>

#include <fstream>
#include <iostream>
#include <memory>
#include <string>

#include "const_arpa.h"
#include "fst.h"

using namespace lctc;

int main(int argc, char** argv) {
  std::vector<std::string> args;
  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg.rfind("--", 0) == 0) {
      std::cerr << "arpa-to-const-arpa: ignoring unknown flag " << arg
                << "\n";
    } else {
      args.push_back(arg);
    }
  }
  if (args.size() != 3) {
    std::cerr << "usage: arpa-to-const-arpa <arpa|-> <words.txt> "
                 "<out.carpa>\n";
    return 1;
  }
  try {
    SymbolTable words = SymbolTable::ReadFile(args[1]);
    std::unique_ptr<std::ifstream> in;
    if (args[0] != "-") {
      in = std::make_unique<std::ifstream>(args[0]);
      if (!*in) {
        std::cerr << "arpa-to-const-arpa: cannot open " << args[0] << "\n";
        return 1;
      }
    }
    ConstArpaLm lm = ConstArpaLm::Build(in ? *in : std::cin, words,
                                        std::cerr);
    lm.Write(args[2]);
    std::cerr << "arpa-to-const-arpa: wrote " << lm.NumEntries()
              << " entries to " << args[2] << "\n";
    return 0;
  } catch (const std::exception& e) {
    std::cerr << "arpa-to-const-arpa: " << e.what() << "\n";
    return 1;
  }
}
