// Native text pipeline: PTB tokenizer, Porter stemmer, METEOR, ROUGE-L.
//
// These replace the reference's two Java natives (Stanford PTBTokenizer
// jar, meteor-1.5.jar — SURVEY.md §2) plus the O(L^2) ROUGE-L DP, the
// slowest host-side metric loops. Semantics are defined by the pure-Python
// implementations in controllable_xgating_tpu/{data/tokenizer.py,
// metrics/{stemmer,meteor,rouge}.py}; equality is golden-tested
// (tests/test_native_text.py) and the Python paths remain as fallbacks.
//
// String ABI: captions are UTF-8, pre-tokenized ones are space-joined;
// multiple references are '\x1e'-separated.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <regex>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// ------------------------------------------------------------- PTB rules
// Mirrors data/tokenizer.py exactly: same substitutions, same order.
struct Rule {
  std::regex re;
  const char* repl;
};

const std::vector<Rule>& starting_quotes() {
  static const std::vector<Rule> r = {
      {std::regex(R"(^\")"), "`` "},
      {std::regex(R"((``))"), " $1 "},
      {std::regex(R"(([ \(\[{<])(\"|\'{2}))"), "$1 `` "},
  };
  return r;
}

const std::vector<Rule>& punctuation() {
  static const std::vector<Rule> r = {
      {std::regex(R"(([:,])([^\d]))"), " $1 $2"},
      {std::regex(R"(([:,])$)"), " $1 "},
      {std::regex(R"(\.\.\.)"), " ... "},
      {std::regex(R"([;@#$%&])"), " $& "},
      {std::regex(R"(([^\.])(\.)([\]\)}>\"\']*)\s*$)"), "$1 $2$3 "},
      {std::regex(R"([?!])"), " $& "},
      {std::regex(R"(([^'])' )"), "$1 ' "},
  };
  return r;
}

const std::vector<Rule>& parens_brackets() {
  static const std::vector<Rule> r = {
      {std::regex(R"([\]\[\(\)\{\}<>])"), " $& "},
      {std::regex(R"(--)"), " -- "},
  };
  return r;
}

const std::vector<Rule>& ending_quotes() {
  static const std::vector<Rule> r = {
      {std::regex(R"(\")"), " '' "},
      {std::regex(R"((\S)(\'\'))"), "$1 $2 "},
      {std::regex(R"(([^' ])('[sS]|'[mM]|'[dD]|') )"), "$1 $2 "},
      {std::regex(R"(([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) )"), "$1 $2 "},
  };
  return r;
}

const std::vector<std::regex>& contractions2() {
  static const std::vector<std::regex> r = {
      std::regex(R"(\b(can)(not)\b)", std::regex::icase),
      std::regex(R"(\b(d)('ye)\b)", std::regex::icase),
      std::regex(R"(\b(gim)(me)\b)", std::regex::icase),
      std::regex(R"(\b(gon)(na)\b)", std::regex::icase),
      std::regex(R"(\b(got)(ta)\b)", std::regex::icase),
      std::regex(R"(\b(lem)(me)\b)", std::regex::icase),
      std::regex(R"(\b(more)('n)\b)", std::regex::icase),
      std::regex(R"(\b(wan)(na)(?=\s))", std::regex::icase),
  };
  return r;
}

const std::vector<std::regex>& contractions3() {
  static const std::vector<std::regex> r = {
      std::regex(R"( ('t)(is)\b)", std::regex::icase),
      std::regex(R"( ('t)(was)\b)", std::regex::icase),
  };
  return r;
}

const std::unordered_set<std::string>& punct_tokens() {
  static const std::unordered_set<std::string> p = {
      "''", "'", "``", "`", "(", ")", "{", "}", "[", "]",
      ".",  "?", "!",  ",", ":", "-", "--", "...", ";",
  };
  return p;
}

std::string ptb_transform(std::string text) {
  for (const auto& r : starting_quotes())
    text = std::regex_replace(text, r.re, r.repl);
  for (const auto& r : punctuation())
    text = std::regex_replace(text, r.re, r.repl);
  for (const auto& r : parens_brackets())
    text = std::regex_replace(text, r.re, r.repl);
  text = " " + text + " ";
  for (const auto& r : ending_quotes())
    text = std::regex_replace(text, r.re, r.repl);
  for (const auto& re : contractions2())
    text = std::regex_replace(text, re, " $1 $2 ");
  for (const auto& re : contractions3())
    text = std::regex_replace(text, re, " $1 $2 ");
  return text;
}

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && std::isspace(static_cast<unsigned char>(s[i]))) ++i;
    size_t j = i;
    while (j < s.size() && !std::isspace(static_cast<unsigned char>(s[j]))) ++j;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

std::string lower(std::string w) {
  for (char& c : w) c = std::tolower(static_cast<unsigned char>(c));
  return w;
}

std::vector<std::string> ptb_tokenize(const std::string& text) {
  std::vector<std::string> out;
  for (auto& tok : split_ws(ptb_transform(text))) {
    if (punct_tokens().count(tok)) continue;
    out.push_back(lower(tok));
  }
  return out;
}

// --------------------------------------------------------- Porter stemmer
// Port of metrics/stemmer.py (classic Porter 1980); must match it exactly.
bool is_cons(const std::string& w, size_t i) {
  char c = w[i];
  if (c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u') return false;
  if (c == 'y') return i == 0 ? true : !is_cons(w, i - 1);
  return true;
}

int measure(const std::string& stem) {
  int m = 0;
  bool prev_vowel = false;
  for (size_t i = 0; i < stem.size(); ++i) {
    bool cons = is_cons(stem, i);
    if (prev_vowel && cons) ++m;
    prev_vowel = !cons;
  }
  return m;
}

bool has_vowel(const std::string& s) {
  for (size_t i = 0; i < s.size(); ++i)
    if (!is_cons(s, i)) return true;
  return false;
}

bool ends_double_cons(const std::string& w) {
  size_t n = w.size();
  return n >= 2 && w[n - 1] == w[n - 2] && is_cons(w, n - 1);
}

bool ends_cvc(const std::string& w) {
  size_t n = w.size();
  if (n < 3) return false;
  if (!(is_cons(w, n - 3) && !is_cons(w, n - 2) && is_cons(w, n - 1)))
    return false;
  char c = w[n - 1];
  return c != 'w' && c != 'x' && c != 'y';
}

bool ends_with(const std::string& w, const char* suf) {
  size_t sl = std::strlen(suf);
  return w.size() >= sl && w.compare(w.size() - sl, sl, suf) == 0;
}

std::string porter_stem(const std::string& word) {
  if (word.size() <= 2) return word;
  std::string w = lower(word);

  // Step 1a
  if (ends_with(w, "sses")) w.resize(w.size() - 2);
  else if (ends_with(w, "ies")) w.resize(w.size() - 2);
  else if (ends_with(w, "ss")) {}
  else if (ends_with(w, "s")) w.resize(w.size() - 1);

  // Step 1b
  if (ends_with(w, "eed")) {
    if (measure(w.substr(0, w.size() - 3)) > 0) w.resize(w.size() - 1);
  } else if ((ends_with(w, "ed") && has_vowel(w.substr(0, w.size() - 2))) ||
             (ends_with(w, "ing") && has_vowel(w.substr(0, w.size() - 3)))) {
    w.resize(w.size() - (ends_with(w, "ed") ? 2 : 3));
    if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz"))
      w += "e";
    else if (ends_double_cons(w) && w.back() != 'l' && w.back() != 's' &&
             w.back() != 'z')
      w.resize(w.size() - 1);
    else if (measure(w) == 1 && ends_cvc(w))
      w += "e";
  }

  // Step 1c
  if (ends_with(w, "y") && has_vowel(w.substr(0, w.size() - 1)))
    w[w.size() - 1] = 'i';

  // Step 2
  static const std::pair<const char*, const char*> step2[] = {
      {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
      {"anci", "ance"},   {"izer", "ize"},    {"abli", "able"},
      {"alli", "al"},     {"entli", "ent"},   {"eli", "e"},
      {"ousli", "ous"},   {"ization", "ize"}, {"ation", "ate"},
      {"ator", "ate"},    {"alism", "al"},    {"iveness", "ive"},
      {"fulness", "ful"}, {"ousness", "ous"}, {"aliti", "al"},
      {"iviti", "ive"},   {"biliti", "ble"},
  };
  for (auto& [suf, repl] : step2) {
    if (ends_with(w, suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(suf));
      if (measure(stem) > 0) w = stem + repl;
      break;
    }
  }

  // Step 3
  static const std::pair<const char*, const char*> step3[] = {
      {"icate", "ic"}, {"ative", ""},  {"alize", "al"}, {"iciti", "ic"},
      {"ical", "ic"},  {"ful", ""},    {"ness", ""},
  };
  for (auto& [suf, repl] : step3) {
    if (ends_with(w, suf)) {
      std::string stem = w.substr(0, w.size() - std::strlen(suf));
      if (measure(stem) > 0) w = stem + repl;
      break;
    }
  }

  // Step 4
  static const char* step4[] = {
      "al",  "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ou",   "ism", "ate", "iti", "ous", "ive", "ize",
  };
  bool matched4 = false;
  for (const char* suf : step4) {
    if (ends_with(w, suf)) {
      matched4 = true;
      std::string stem = w.substr(0, w.size() - std::strlen(suf));
      if (measure(stem) > 1) w = stem;
      break;
    }
  }
  if (!matched4 && ends_with(w, "ion") && w.size() > 3) {
    char c = w[w.size() - 4];
    if ((c == 's' || c == 't') && measure(w.substr(0, w.size() - 3)) > 1)
      w.resize(w.size() - 3);
  }

  // Step 5a
  if (ends_with(w, "e")) {
    std::string stem = w.substr(0, w.size() - 1);
    int m = measure(stem);
    if (m > 1 || (m == 1 && !ends_cvc(stem))) w = stem;
  }
  // Step 5b
  if (measure(w) > 1 && ends_double_cons(w) && w.back() == 'l')
    w.resize(w.size() - 1);
  return w;
}

// ----------------------------------------------------------------- METEOR
// Mirror of metrics/meteor.py: exact + stem + (pluggable-table) synonym
// matcher modules with METEOR 1.5 English module weights (1.0, 0.6, 0.8),
// content/function word weighting (delta), beam-search alignment
// maximizing (matches, -chunks, stage-weight sum), and the published
// METEOR 1.5 penalty Pen = gamma * frag^beta (Denkowski & Lavie 2014
// English parameters). A pair is assigned its FIRST applicable module in
// module order (jar behavior); with no table the synonym module never
// fires, which is bit-identical to the previous exact+stem scorer.
constexpr double ALPHA = 0.85, BETA = 0.2, GAMMA = 0.6, DELTA = 0.75;
constexpr double STAGE_W[3] = {1.0, 0.6, 0.8};
constexpr int METEOR_BEAM = 256;

// word -> sorted synset-group ids; two words synonym-match iff their id
// vectors intersect (WordNet semantics: they share a synset). Mirrors
// metrics/meteor.py::build_synonym_table.
using SynTable = std::unordered_map<std::string, std::vector<int>>;

bool syn_match(const SynTable& t, const std::string& a, const std::string& b) {
  auto ia = t.find(a);
  if (ia == t.end()) return false;
  auto ib = t.find(b);
  if (ib == t.end()) return false;
  const auto& va = ia->second;
  const auto& vb = ib->second;
  size_t x = 0, y = 0;
  while (x < va.size() && y < vb.size()) {
    if (va[x] == vb[y]) return true;
    if (va[x] < vb[y]) ++x; else ++y;
  }
  return false;
}

// Handle registry for tables built once and reused across calls (a
// WordNet-scale table must not be re-parsed per hypothesis). Handle 0 is
// reserved for "no table".
std::mutex& syn_mutex() { static std::mutex m; return m; }
std::vector<std::unique_ptr<SynTable>>& syn_registry() {
  static std::vector<std::unique_ptr<SynTable>> r;
  return r;
}

const SynTable* syn_lookup(int64_t handle) {
  if (handle <= 0) return nullptr;
  std::lock_guard<std::mutex> g(syn_mutex());
  auto& reg = syn_registry();
  if (static_cast<size_t>(handle) > reg.size()) return nullptr;
  return reg[handle - 1].get();
}

const std::unordered_set<std::string>& function_words() {
  static const std::unordered_set<std::string> f = {
      "a", "an", "the", "of", "in", "on", "at", "to", "and", "or", "is",
      "are", "was", "were", "be", "been", "am", "do", "does", "did", "has",
      "have", "had", "by", "with", "for", "it", "its", "as", "that", "this",
      "there", "from", "but", "not", "no", "so", "if", "then", "than",
  };
  return f;
}

double weight(const std::string& w) {
  return function_words().count(w) ? 1.0 - DELTA : DELTA;
}

// One (hyp_i, ref_j, stage) match in an alignment.
struct MTriple { int i, j, stage; };

// Beam state: which ref words are used, where the last match sat (for
// chunk counting), and the running objective.
struct MState {
  std::vector<uint64_t> used;  // ref-word bitset
  int last_i = -2, last_j = -2;
  int matches = 0, chunks = 0;
  double wsum = 0.0;
  std::vector<MTriple> pairs;
};

bool mstate_rank_gt(const MState& a, const MState& b) {
  if (a.matches != b.matches) return a.matches > b.matches;
  if (a.chunks != b.chunks) return a.chunks < b.chunks;
  return a.wsum > b.wsum;
}

// Beam-search alignment: maximize matches, then minimize chunks, then
// prefer exact over stem matches — identical objective and tie-breaks to
// metrics/meteor.py::_align (beam 256: exhaustive at caption lengths).
std::vector<MTriple> meteor_align(const std::vector<std::string>& hyp,
                                  const std::vector<std::string>& ref,
                                  const SynTable* syn) {
  const size_t H = hyp.size(), R = ref.size();
  std::vector<std::string> hs(H), rs(R);
  for (size_t i = 0; i < H; ++i) hs[i] = porter_stem(hyp[i]);
  for (size_t j = 0; j < R; ++j) rs[j] = porter_stem(ref[j]);
  const size_t words = (R + 63) / 64;

  std::vector<MState> states(1);
  states[0].used.assign(words, 0);
  std::vector<MState> nxt;
  for (size_t i = 0; i < H; ++i) {
    nxt.clear();
    for (const auto& st : states) {
      nxt.push_back(st);  // hyp[i] unmatched
      for (size_t j = 0; j < R; ++j) {
        int stage;
        if (hyp[i] == ref[j]) stage = 0;
        else if (hs[i] == rs[j]) stage = 1;
        else if (syn && syn_match(*syn, hyp[i], ref[j])) stage = 2;
        else continue;
        if (st.used[j / 64] >> (j % 64) & 1) continue;
        MState ns = st;
        ns.used[j / 64] |= uint64_t(1) << (j % 64);
        ns.chunks += (static_cast<int>(i) == st.last_i + 1 &&
                      static_cast<int>(j) == st.last_j + 1) ? 0 : 1;
        ns.last_i = static_cast<int>(i);
        ns.last_j = static_cast<int>(j);
        ns.matches += 1;
        ns.wsum += STAGE_W[stage];
        ns.pairs.push_back({static_cast<int>(i), static_cast<int>(j), stage});
        nxt.push_back(std::move(ns));
      }
    }
    // dedupe on (used, last_i, last_j) keeping the best-ranked state —
    // matches the Python dict semantics exactly
    std::sort(nxt.begin(), nxt.end(), [](const MState& a, const MState& b) {
      if (a.used != b.used) return a.used < b.used;
      if (a.last_i != b.last_i) return a.last_i < b.last_i;
      if (a.last_j != b.last_j) return a.last_j < b.last_j;
      return mstate_rank_gt(a, b);
    });
    states.clear();
    for (auto& s : nxt) {
      if (!states.empty() && states.back().used == s.used &&
          states.back().last_i == s.last_i && states.back().last_j == s.last_j)
        continue;
      states.push_back(std::move(s));
    }
    if (static_cast<int>(states.size()) > METEOR_BEAM) {
      std::stable_sort(states.begin(), states.end(), mstate_rank_gt);
      states.resize(METEOR_BEAM);
    }
  }
  auto best = std::max_element(states.begin(), states.end(),
                               [](const MState& a, const MState& b) {
                                 return mstate_rank_gt(b, a);
                               });
  return best->pairs;
}

double meteor_pair(const std::vector<std::string>& hyp,
                   const std::vector<std::string>& ref,
                   const SynTable* syn) {
  if (hyp.empty() || ref.empty()) return 0.0;
  auto pairs = meteor_align(hyp, ref, syn);
  if (pairs.empty()) return 0.0;

  double m_hyp = 0, m_ref = 0, w_hyp = 0, w_ref = 0;
  for (auto& t : pairs) {
    m_hyp += STAGE_W[t.stage] * weight(hyp[t.i]);
    m_ref += STAGE_W[t.stage] * weight(ref[t.j]);
  }
  for (auto& w : hyp) w_hyp += weight(w);
  for (auto& w : ref) w_ref += weight(w);
  double p = w_hyp > 0 ? m_hyp / w_hyp : 0.0;
  double r = w_ref > 0 ? m_ref / w_ref : 0.0;
  if (p == 0.0 || r == 0.0) return 0.0;
  double fmean = p * r / (ALPHA * p + (1 - ALPHA) * r);
  int chunks = 1;
  for (size_t k = 1; k < pairs.size(); ++k)
    if (pairs[k].i != pairs[k - 1].i + 1 || pairs[k].j != pairs[k - 1].j + 1)
      ++chunks;
  double frag = static_cast<double>(chunks) / pairs.size();
  double penalty = GAMMA * std::pow(frag, BETA);
  return (1.0 - penalty) * fmean;
}

// ---------------------------------------------------------------- ROUGE-L
int lcs_len(const std::vector<std::string>& a,
            const std::vector<std::string>& b) {
  if (a.empty() || b.empty()) return 0;
  std::vector<int> prev(b.size() + 1, 0), cur(b.size() + 1, 0);
  for (size_t i = 0; i < a.size(); ++i) {
    cur[0] = 0;
    for (size_t j = 1; j <= b.size(); ++j)
      cur[j] = a[i] == b[j - 1] ? prev[j - 1] + 1 : std::max(prev[j], cur[j - 1]);
    std::swap(prev, cur);
  }
  return prev[b.size()];
}

std::vector<std::vector<std::string>> split_refs(const char* refs) {
  std::vector<std::vector<std::string>> out;
  const char* p = refs;
  while (*p) {
    const char* q = p;
    while (*q && *q != '\x1e') ++q;
    out.push_back(split_ws(std::string(p, q)));
    p = *q ? q + 1 : q;
  }
  return out;
}

}  // namespace

extern "C" {

// PTB-tokenize `text` (coco behavior: lowercase + drop punct tokens);
// writes space-joined tokens; returns byte length or -1 on overflow.
int64_t cxg_ptb_tokenize(const char* text, char* out, int64_t cap) {
  auto toks = ptb_tokenize(text);
  std::string joined;
  for (size_t i = 0; i < toks.size(); ++i) {
    if (i) joined += ' ';
    joined += toks[i];
  }
  if (static_cast<int64_t>(joined.size()) + 1 > cap) return -1;
  std::memcpy(out, joined.c_str(), joined.size() + 1);
  return static_cast<int64_t>(joined.size());
}

// Porter-stem one word into out; returns length or -1 on overflow.
int64_t cxg_porter_stem(const char* word, char* out, int64_t cap) {
  std::string s = porter_stem(word);
  if (static_cast<int64_t>(s.size()) + 1 > cap) return -1;
  std::memcpy(out, s.c_str(), s.size() + 1);
  return static_cast<int64_t>(s.size());
}

// METEOR of one pre-tokenized hypothesis vs '\x1e'-separated references
// (best ref wins, jar behavior).
double cxg_meteor(const char* hyp, const char* refs) {
  auto h = split_ws(hyp);
  double best = 0.0;
  for (auto& r : split_refs(refs))
    best = std::max(best, meteor_pair(h, r, nullptr));
  return best;
}

// Register a synonym table: '\n'-separated synset groups of whitespace-
// separated words (metrics/meteor.py::load_synonym_table's format,
// comments pre-stripped by the caller). Returns a handle (> 0) for
// cxg_meteor_syn; free with cxg_syn_table_free.
int64_t cxg_syn_table_new(const char* groups) {
  auto table = std::make_unique<SynTable>();
  int gid = 0;
  const char* p = groups;
  while (*p) {
    const char* q = p;
    while (*q && *q != '\n') ++q;
    auto words = split_ws(std::string(p, q));
    if (words.size() >= 2) {
      for (auto& w : words) (*table)[w].push_back(gid);
      ++gid;
    }
    p = *q ? q + 1 : q;
  }
  for (auto& kv : *table) {
    auto& v = kv.second;
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
  }
  std::lock_guard<std::mutex> g(syn_mutex());
  auto& reg = syn_registry();
  for (size_t i = 0; i < reg.size(); ++i) {
    if (!reg[i]) {
      reg[i] = std::move(table);
      return static_cast<int64_t>(i + 1);
    }
  }
  reg.push_back(std::move(table));
  return static_cast<int64_t>(reg.size());
}

void cxg_syn_table_free(int64_t handle) {
  std::lock_guard<std::mutex> g(syn_mutex());
  auto& reg = syn_registry();
  if (handle > 0 && static_cast<size_t>(handle) <= reg.size())
    reg[handle - 1].reset();
}

// cxg_meteor with the stage-3 synonym module driven by a registered
// table; handle 0 (or an unknown handle) is bit-identical to cxg_meteor.
double cxg_meteor_syn(const char* hyp, const char* refs, int64_t handle) {
  const SynTable* syn = syn_lookup(handle);
  auto h = split_ws(hyp);
  double best = 0.0;
  for (auto& r : split_refs(refs))
    best = std::max(best, meteor_pair(h, r, syn));
  return best;
}

// ROUGE-L F(beta) of one hypothesis vs references (max prec/rec over refs).
double cxg_rouge_l(const char* hyp, const char* refs, double beta) {
  auto h = split_ws(hyp);
  double pmax = 0.0, rmax = 0.0;
  for (auto& r : split_refs(refs)) {
    int lcs = lcs_len(h, r);
    if (!h.empty()) pmax = std::max(pmax, static_cast<double>(lcs) / h.size());
    if (!r.empty()) rmax = std::max(rmax, static_cast<double>(lcs) / r.size());
  }
  if (pmax == 0.0 || rmax == 0.0) return 0.0;
  double b2 = beta * beta;
  return (1 + b2) * pmax * rmax / (rmax + b2 * pmax);
}

}  // extern "C"
