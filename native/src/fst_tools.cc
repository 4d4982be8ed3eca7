// fst-tools — multi-tool for the TLG graph build, replacing the OpenFst
// binaries the reference pipes together (local/make_TLG.sh:33-91).
//
// Subcommands (also reachable via argv[0] symlinks named like the
// OpenFst tools):
//   compile [--isymbols=f --osymbols=f] [text_in] [fst_out]
//   print   [--isymbols=f --osymbols=f] [fst_in] [text_out]
//   arcsort --sort_type=ilabel|olabel [in] [out]
//   compose a.fst b.fst [out]            (fsttablecompose)
//   determinizestar [--use-log=true] [in] [out]
//   minimizeencoded [in] [out]
//   addselfloops <isym-id> <osym-id> [in] [out]
//   rmepsilon [in] [out]
//   connect [in] [out]
//   arpa2fst [--disambig-symbol=#0] --read-symbol-table=words.txt [in] [out]
//   info [in]

#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

#include "fst.h"

namespace lctc {
Fst ArpaToFst(std::istream& is, const SymbolTable& words,
              const std::string& disambig_symbol, std::ostream& log);
}

using namespace lctc;

namespace {

struct Options {
  std::unordered_map<std::string, std::string> flags;
  std::vector<std::string> args;
};

Options ParseArgs(int argc, char** argv, int start) {
  Options opts;
  for (int i = start; i < argc; ++i) {
    std::string arg = argv[i];
    if (arg.rfind("--", 0) == 0) {
      size_t eq = arg.find('=');
      if (eq != std::string::npos) {
        opts.flags[arg.substr(2, eq - 2)] = arg.substr(eq + 1);
      } else {
        opts.flags[arg.substr(2)] = "true";
      }
    } else {
      opts.args.push_back(arg);
    }
  }
  return opts;
}

std::unique_ptr<std::istream> OpenIn(const Options& o, size_t idx) {
  if (o.args.size() > idx && o.args[idx] != "-") {
    auto fh = std::make_unique<std::ifstream>(o.args[idx],
                                              std::ios::binary);
    if (!*fh) {
      std::cerr << "cannot open " << o.args[idx] << "\n";
      exit(1);
    }
    return fh;
  }
  return nullptr;  // use stdin
}

std::unique_ptr<std::ostream> OpenOut(const Options& o, size_t idx) {
  if (o.args.size() > idx && o.args[idx] != "-") {
    auto fh = std::make_unique<std::ofstream>(o.args[idx],
                                              std::ios::binary);
    if (!*fh) {
      std::cerr << "cannot open " << o.args[idx] << "\n";
      exit(1);
    }
    return fh;
  }
  return nullptr;  // use stdout
}

Fst ReadFstAuto(std::istream& is) {
  // sniff: binary files start with "LCFST1\n"
  int c = is.peek();
  if (c == 'L') return Fst::Read(is);
  return Fst::ReadText(is);
}

// text compile with symbol tables: map symbolic labels to ids
Fst CompileText(std::istream& is, const SymbolTable* isym,
                const SymbolTable* osym) {
  Fst fst;
  std::string line;
  bool first = true;
  auto ensure = [&](StateId s) {
    while (fst.NumStates() <= s) fst.AddState();
  };
  auto to_label = [&](const std::string& tok, const SymbolTable* table) {
    if (table) {
      Label l = table->Find(tok);
      if (l < 0) {
        std::cerr << "symbol " << tok << " not in table\n";
        exit(1);
      }
      return l;
    }
    return static_cast<Label>(std::stol(tok));
  };
  while (std::getline(is, line)) {
    std::istringstream ss(line);
    std::vector<std::string> tok;
    std::string t;
    while (ss >> t) tok.push_back(t);
    if (tok.empty()) continue;
    if (tok.size() <= 2) {
      StateId s = std::stoi(tok[0]);
      ensure(s);
      fst.SetFinal(s, tok.size() == 2 ? std::stof(tok[1]) : 0.0f);
      if (first) { fst.SetStart(s); first = false; }
    } else {
      if (tok.size() < 4) {
        // "src dst ilabel" alone is acceptor syntax; this compiler is a
        // transducer compiler — reject instead of reading past the end
        std::cerr << "bad FST text line (want src dst ilabel olabel "
                  << "[weight]): " << line << "\n";
        exit(1);
      }
      Arc arc;
      StateId s = std::stoi(tok[0]);
      arc.nextstate = std::stoi(tok[1]);
      arc.ilabel = to_label(tok[2], isym);
      arc.olabel = to_label(tok[3], osym);
      arc.weight = tok.size() >= 5 ? std::stof(tok[4]) : 0.0f;
      ensure(std::max(s, arc.nextstate));
      fst.AddArc(s, arc);
      if (first) { fst.SetStart(s); first = false; }
    }
  }
  return fst;
}

int Usage() {
  std::cerr <<
      "usage: fst-tools <compile|print|arcsort|compose|determinizestar|"
      "minimizeencoded|addselfloops|rmepsilon|connect|arpa2fst|info> "
      "[flags] [args]\n";
  return 1;
}

}  // namespace

int main(int argc, char** argv) {
  // argv[0] symlink dispatch: fstcompile, fstarcsort, ...
  std::string prog = argv[0];
  size_t slash = prog.find_last_of('/');
  if (slash != std::string::npos) prog = prog.substr(slash + 1);
  std::string cmd;
  int arg_start = 1;
  if (prog.rfind("fst", 0) == 0 && prog != "fst-tools") {
    cmd = prog.substr(3);
    if (cmd == "tablecompose") cmd = "compose";
  } else if (prog == "arpa2fst") {
    cmd = "arpa2fst";
  } else {
    if (argc < 2) return Usage();
    cmd = argv[1];
    arg_start = 2;
  }
  Options o = ParseArgs(argc, argv, arg_start);

  try {
    if (cmd == "compile") {
      std::unique_ptr<SymbolTable> isym, osym;
      if (o.flags.count("isymbols")) {
        isym = std::make_unique<SymbolTable>(
            SymbolTable::ReadFile(o.flags["isymbols"]));
      }
      if (o.flags.count("osymbols")) {
        osym = std::make_unique<SymbolTable>(
            SymbolTable::ReadFile(o.flags["osymbols"]));
      }
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst fst = CompileText(in ? *in : std::cin, isym.get(), osym.get());
      fst.Write(out ? *out : std::cout);
    } else if (cmd == "print") {
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      fst.WriteText(out ? *out : std::cout);
    } else if (cmd == "arcsort") {
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      if (o.flags["sort_type"] == "olabel") {
        fst.SortArcsByOutput();
      } else {
        fst.SortArcsByInput();
      }
      fst.Write(out ? *out : std::cout);
    } else if (cmd == "compose") {
      if (o.args.size() < 2) return Usage();
      std::ifstream fa(o.args[0], std::ios::binary);
      std::ifstream fb(o.args[1], std::ios::binary);
      if (!fa || !fb) { std::cerr << "cannot open inputs\n"; return 1; }
      Fst a = ReadFstAuto(fa);
      Fst b = ReadFstAuto(fb);
      b.SortArcsByInput();
      Fst c = Compose(a, b);
      auto out = OpenOut(o, 2);
      c.Write(out ? *out : std::cout);
    } else if (cmd == "determinizestar") {
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      Fst det = DeterminizeStar(fst);
      det.Write(out ? *out : std::cout);
    } else if (cmd == "minimizeencoded") {
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      Fst min = MinimizeEncoded(fst);
      min.Write(out ? *out : std::cout);
    } else if (cmd == "addselfloops") {
      if (o.args.size() < 2) return Usage();
      Label il = std::stol(o.args[0]);
      Label ol = std::stol(o.args[1]);
      auto in = OpenIn(o, 2);
      auto out = OpenOut(o, 3);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      AddSelfLoops(&fst, il, ol);
      fst.Write(out ? *out : std::cout);
    } else if (cmd == "rmepsilon") {
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      Fst rme = RmEpsilon(fst);
      rme.Write(out ? *out : std::cout);
    } else if (cmd == "connect") {
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      Fst trimmed = Connect(fst);
      trimmed.Write(out ? *out : std::cout);
    } else if (cmd == "arpa2fst") {
      if (!o.flags.count("read-symbol-table")) {
        std::cerr << "arpa2fst needs --read-symbol-table=words.txt\n";
        return 1;
      }
      SymbolTable words =
          SymbolTable::ReadFile(o.flags["read-symbol-table"]);
      std::string disambig = o.flags.count("disambig-symbol")
                                 ? o.flags["disambig-symbol"] : "";
      auto in = OpenIn(o, 0);
      auto out = OpenOut(o, 1);
      Fst g = ArpaToFst(in ? *in : std::cin, words, disambig, std::cerr);
      g.Write(out ? *out : std::cout);
    } else if (cmd == "info") {
      auto in = OpenIn(o, 0);
      Fst fst = ReadFstAuto(in ? *in : std::cin);
      std::cout << "states\t" << fst.NumStates() << "\narcs\t"
                << fst.NumArcs() << "\nstart\t" << fst.Start() << "\n";
    } else {
      return Usage();
    }
  } catch (const std::exception& e) {
    std::cerr << prog << ": " << e.what() << "\n";
    return 1;
  }
  return 0;
}
