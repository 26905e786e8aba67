// CTC prefix beam search with n-gram LM shallow fusion (host side).
//
// TPU-native replacement for the reference's forked
// tf.nn.ctc_beam_search_decoder with KenLM support (reference
// speecht/speech_model.py:101-111: kenlm_directory_path, kenlm_weight,
// word_count_weight, valid_word_count_weight, beam_width=100,
// merge_repeated=False). The reference's decoder is a C++ TF kernel linking
// KenLM; here the device produces (blank-collapsed) log-probs and this file
// scores prefixes with:
//
//   score = log P_acoustic(prefix)
//         + lm_weight * log10 P_LM(completed words)   [ARPA backoff n-gram]
//         + word_count_weight * #words
//         + valid_word_count_weight * #in-vocabulary-words
//
// matching the fork's shallow-fusion roles; the three weights are runtime
// arguments (never compiled in), which `speecht-cli search` mutates per
// evaluation (reference parameter_search.py:80-85).
//
// The LM is a word-level ARPA backoff model (KenLM's source format) plus a
// vocabulary file (one word per line) used for the valid-word bonus and the
// in-beam character trie.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <unordered_map>
#include <algorithm>
#include <memory>
#include <fstream>
#include <sstream>

namespace {

constexpr int kSpaceId = 27;   // vocabulary.SPACE_ID
constexpr double kNegInf = -1e30;
constexpr double kLog10 = 2.302585092994046;  // ln(10)

inline double log_add(double a, double b) {
  if (a <= kNegInf) return b;
  if (b <= kNegInf) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

inline char id_to_char(int id) {
  if (id == 26) return '\'';
  if (id == kSpaceId) return ' ';
  return (char)('a' + id);
}

// ---------------------------------------------------------------------------
// ARPA backoff n-gram word LM + vocabulary trie
// ---------------------------------------------------------------------------

struct NGramEntry {
  float logprob;   // log10
  float backoff;   // log10
};

struct TrieNode {
  int32_t children[28];  // index into trie pool per char id (a-z, ', -)
  bool terminal;
  TrieNode() : terminal(false) { std::fill(children, children + 28, -1); }
};

struct LanguageModel {
  std::unordered_map<std::string, uint32_t> word_ids;
  std::vector<std::unordered_map<uint64_t, NGramEntry>> ngrams;  // [order-1]
  int order = 0;
  uint32_t unk_id = UINT32_MAX;
  uint32_t bos_id = UINT32_MAX;
  float unk_floor = -10.0f;

  // vocabulary trie over character ids for valid-word lookup
  std::vector<TrieNode> trie;

  LanguageModel() { trie.emplace_back(); }

  void trie_insert(const std::string& word) {
    int node = 0;
    for (char c : word) {
      int cid;
      if (c == '\'') cid = 26;
      else if (c >= 'a' && c <= 'z') cid = c - 'a';
      else return;  // skip words with out-of-vocab characters
      if (trie[node].children[cid] < 0) {
        trie[node].children[cid] = (int32_t)trie.size();
        trie.emplace_back();
      }
      node = trie[node].children[cid];
    }
    trie[node].terminal = true;
  }

  bool trie_has_word(const std::string& word) const {
    int node = 0;
    for (char c : word) {
      int cid;
      if (c == '\'') cid = 26;
      else if (c >= 'a' && c <= 'z') cid = c - 'a';
      else return false;
      node = trie[node].children[cid];
      if (node < 0) return false;
    }
    return trie[node].terminal;
  }

  uint32_t word_id(const std::string& w) const {
    auto it = word_ids.find(w);
    return it == word_ids.end() ? unk_id : it->second;
  }

  static uint64_t key(const uint32_t* ids, int n) {
    // polynomial hash over word ids (fits order <= 3 exactly in 64 bits
    // for vocab < 2^21; beyond that it is a hash, collisions negligible)
    uint64_t k = 1469598103934665603ull;
    for (int i = 0; i < n; ++i) {
      k ^= ids[i] + 1;
      k *= 1099511628211ull;
    }
    return k;
  }

  const NGramEntry* find(const uint32_t* ids, int n) const {
    if (n <= 0 || n > order) return nullptr;
    const auto& m = ngrams[n - 1];
    auto it = m.find(key(ids, n));
    return it == m.end() ? nullptr : &it->second;
  }

  // log10 P(word | history) with Katz backoff. history = up to order-1 ids,
  // most recent last.
  float score(const uint32_t* history, int hist_len, uint32_t word) const {
    if (order == 0) return unk_floor;
    int ctx = std::min(hist_len, order - 1);
    std::vector<uint32_t> ids(ctx + 1);
    for (int i = 0; i < ctx; ++i) ids[i] = history[hist_len - ctx + i];
    ids[ctx] = word;
    // try longest n-gram first, accumulate backoffs
    float backoff_sum = 0.0f;
    for (int n = ctx + 1; n >= 1; --n) {
      const uint32_t* start = ids.data() + (ctx + 1 - n);
      const NGramEntry* e = find(start, n);
      if (e) return e->logprob + backoff_sum;
      if (n > 1) {
        // add backoff of the (n-1)-gram context
        const NGramEntry* b = find(start, n - 1);
        if (b) backoff_sum += b->backoff;
      }
    }
    return unk_floor + backoff_sum;
  }
};

LanguageModel* load_arpa(const char* arpa_path, const char* vocab_path) {
  std::ifstream f(arpa_path);
  if (!f.good()) return nullptr;
  auto lm = std::make_unique<LanguageModel>();

  std::string line;
  int current_order = 0;
  bool in_data = false;
  std::vector<uint64_t> counts;

  while (std::getline(f, line)) {
    // strip \r
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
      line.pop_back();
    if (line == "\\data\\") { in_data = true; continue; }
    if (in_data && line.rfind("ngram ", 0) == 0) {
      // "ngram N=count"
      size_t eq = line.find('=');
      if (eq != std::string::npos) {
        int n = std::atoi(line.c_str() + 6);
        uint64_t cnt = std::strtoull(line.c_str() + eq + 1, nullptr, 10);
        if ((int)counts.size() < n) counts.resize(n, 0);
        counts[n - 1] = cnt;
      }
      continue;
    }
    if (line.size() > 2 && line[0] == '\\' && line.find("-grams:") != std::string::npos) {
      current_order = std::atoi(line.c_str() + 1);
      if (lm->order < current_order) lm->order = current_order;
      if ((int)lm->ngrams.size() < current_order) lm->ngrams.resize(current_order);
      if (current_order >= 1 && counts.size() >= (size_t)current_order)
        lm->ngrams[current_order - 1].reserve(counts[current_order - 1] * 2);
      continue;
    }
    if (line == "\\end\\") break;
    if (current_order == 0 || line.empty()) continue;

    // entry: logprob \t w1 w2 ... \t backoff?
    std::istringstream ss(line);
    float logprob;
    if (!(ss >> logprob)) continue;
    std::vector<std::string> words(current_order);
    bool ok = true;
    for (int i = 0; i < current_order; ++i)
      if (!(ss >> words[i])) { ok = false; break; }
    if (!ok) continue;
    float backoff = 0.0f;
    ss >> backoff;  // optional

    // intern words (unigram section defines the id space)
    std::vector<uint32_t> ids(current_order);
    for (int i = 0; i < current_order; ++i) {
      auto it = lm->word_ids.find(words[i]);
      if (it == lm->word_ids.end()) {
        uint32_t id = (uint32_t)lm->word_ids.size();
        lm->word_ids.emplace(words[i], id);
        ids[i] = id;
      } else {
        ids[i] = it->second;
      }
    }
    lm->ngrams[current_order - 1][LanguageModel::key(ids.data(), current_order)] =
        NGramEntry{logprob, backoff};
  }

  auto unk = lm->word_ids.find("<unk>");
  if (unk != lm->word_ids.end()) {
    lm->unk_id = unk->second;
    uint32_t uid = unk->second;
    const NGramEntry* e = lm->find(&uid, 1);
    if (e) lm->unk_floor = e->logprob;
  }
  auto bos = lm->word_ids.find("<s>");
  if (bos != lm->word_ids.end()) lm->bos_id = bos->second;

  // vocabulary trie: explicit vocabulary file, else LM unigrams
  if (vocab_path && vocab_path[0]) {
    std::ifstream vf(vocab_path);
    std::string w;
    while (std::getline(vf, w)) {
      while (!w.empty() && (w.back() == '\r' || w.back() == '\n')) w.pop_back();
      std::transform(w.begin(), w.end(), w.begin(), ::tolower);
      if (!w.empty()) lm->trie_insert(w);
    }
  } else {
    for (const auto& kv : lm->word_ids) {
      std::string w = kv.first;
      if (w == "<s>" || w == "</s>" || w == "<unk>") continue;
      std::transform(w.begin(), w.end(), w.begin(), ::tolower);
      lm->trie_insert(w);
    }
  }
  return lm.release();
}

// ---------------------------------------------------------------------------
// CTC prefix beam search
// ---------------------------------------------------------------------------

struct Prefix {
  std::vector<int8_t> chars;     // decoded char ids
  double p_b = kNegInf;          // log prob ending in blank
  double p_nb = kNegInf;         // log prob ending in non-blank
  double lm_score = 0.0;         // accumulated weighted LM/word bonuses
  std::vector<uint32_t> words;   // completed word ids (LM space)
  int n_words = 0;
  int n_valid = 0;

  double total() const { return log_add(p_b, p_nb) + lm_score; }
};

struct PrefixHash {
  size_t operator()(const std::vector<int8_t>& v) const {
    size_t h = 1469598103934665603ull;
    for (int8_t c : v) { h ^= (uint8_t)c; h *= 1099511628211ull; }
    return h;
  }
};

std::string last_partial_word(const std::vector<int8_t>& chars) {
  std::string w;
  for (auto it = chars.rbegin(); it != chars.rend(); ++it) {
    if (*it == kSpaceId) break;
    w.push_back(id_to_char(*it));
  }
  std::reverse(w.begin(), w.end());
  return w;
}

}  // namespace

extern "C" {

void* st_lm_load(const char* arpa_path, const char* vocab_path) {
  return load_arpa(arpa_path, vocab_path);
}

void st_lm_free(void* lm) { delete (LanguageModel*)lm; }

int st_lm_order(void* lm) { return ((LanguageModel*)lm)->order; }

// log10 P(word | space-separated history string)
float st_lm_score_word(void* lm_ptr, const char* history, const char* word) {
  auto* lm = (LanguageModel*)lm_ptr;
  std::vector<uint32_t> hist;
  if (lm->bos_id != UINT32_MAX) hist.push_back(lm->bos_id);
  std::istringstream ss(history);
  std::string w;
  while (ss >> w) hist.push_back(lm->word_id(w));
  return lm->score(hist.data(), (int)hist.size(), lm->word_id(word));
}

int st_lm_has_word(void* lm_ptr, const char* word) {
  return ((LanguageModel*)lm_ptr)->trie_has_word(word) ? 1 : 0;
}

// CTC prefix beam search over one utterance.
//   log_probs: [T, C] natural-log softmax emissions (C = 29, blank last)
//   lm: optional LanguageModel* (may be null)
//   weights: lm_weight (applied to log10 LM scores), word_count_weight,
//            valid_word_count_weight — runtime-tunable shallow fusion
//   out_ids: caller buffer of capacity out_capacity; returns decoded length
int st_ctc_beam_search(
    const float* log_probs, int64_t T, int32_t C, int32_t blank_id,
    int32_t beam_width, void* lm_ptr, float lm_weight,
    float word_count_weight, float valid_word_count_weight,
    int32_t prune_top_k, int32_t* out_ids, int32_t out_capacity) {
  auto* lm = (LanguageModel*)lm_ptr;

  std::vector<Prefix> beam(1);
  beam[0].p_b = 0.0;  // empty prefix, log prob 1

  std::vector<int> cand_chars;
  cand_chars.reserve(C);

  for (int64_t t = 0; t < T; ++t) {
    const float* lp = log_probs + t * C;

    // top-k emission pruning per frame
    cand_chars.clear();
    if (prune_top_k > 0 && prune_top_k < C) {
      std::vector<int> idx(C);
      for (int c = 0; c < C; ++c) idx[c] = c;
      std::partial_sort(
          idx.begin(), idx.begin() + prune_top_k, idx.end(),
          [&](int a, int b) { return lp[a] > lp[b]; });
      cand_chars.assign(idx.begin(), idx.begin() + prune_top_k);
      // blank must always be considered
      if (std::find(cand_chars.begin(), cand_chars.end(), blank_id) ==
          cand_chars.end())
        cand_chars.push_back(blank_id);
    } else {
      for (int c = 0; c < C; ++c) cand_chars.push_back(c);
    }

    std::unordered_map<std::vector<int8_t>, Prefix, PrefixHash> next;
    next.reserve(beam.size() * cand_chars.size());

    for (const Prefix& p : beam) {
      double p_tot = log_add(p.p_b, p.p_nb);
      int last = p.chars.empty() ? -1 : p.chars.back();

      for (int c : cand_chars) {
        double emit = lp[c];
        if (c == blank_id) {
          Prefix& q = next.try_emplace(p.chars).first->second;
          if (q.chars.empty() && !p.chars.empty()) q.chars = p.chars;
          q.p_b = log_add(q.p_b, p_tot + emit);
          q.lm_score = p.lm_score;
          q.words = p.words;
          q.n_words = p.n_words;
          q.n_valid = p.n_valid;
          continue;
        }
        if (c == last) {
          // repeat: extends the non-blank path of the SAME prefix...
          Prefix& q = next.try_emplace(p.chars).first->second;
          if (q.chars.empty() && !p.chars.empty()) q.chars = p.chars;
          q.p_nb = log_add(q.p_nb, p.p_nb + emit);
          q.lm_score = p.lm_score;
          q.words = p.words;
          q.n_words = p.n_words;
          q.n_valid = p.n_valid;
          // ...and creates a NEW prefix from the blank path
          std::vector<int8_t> ext = p.chars;
          ext.push_back((int8_t)c);
          Prefix& r = next.try_emplace(ext).first->second;
          if (r.chars.empty()) r.chars = std::move(ext);
          double mass = p.p_b + emit;
          if (r.p_nb <= kNegInf) {
            r.lm_score = p.lm_score;
            r.words = p.words;
            r.n_words = p.n_words;
            r.n_valid = p.n_valid;
          }
          r.p_nb = log_add(r.p_nb, mass);
          continue;
        }
        // new character extends the prefix
        std::vector<int8_t> ext = p.chars;
        ext.push_back((int8_t)c);
        Prefix& r = next.try_emplace(ext).first->second;
        bool fresh = r.p_b <= kNegInf && r.p_nb <= kNegInf;
        if (fresh) {
          r.chars = std::move(ext);
          r.lm_score = p.lm_score;
          r.words = p.words;
          r.n_words = p.n_words;
          r.n_valid = p.n_valid;
          if (c == kSpaceId) {
            // word boundary: apply shallow fusion for the completed word
            std::string w = last_partial_word(p.chars);
            if (!w.empty()) {
              r.n_words += 1;
              r.lm_score += word_count_weight;
              bool valid = lm && lm->trie_has_word(w);
              if (valid) {
                r.n_valid += 1;
                r.lm_score += valid_word_count_weight;
              }
              if (lm && lm->order > 0) {
                std::vector<uint32_t> hist;
                if (lm->bos_id != UINT32_MAX) hist.push_back(lm->bos_id);
                hist.insert(hist.end(), p.words.begin(), p.words.end());
                uint32_t wid = lm->word_id(w);
                float s = lm->score(hist.data(), (int)hist.size(), wid);
                r.lm_score += lm_weight * s * kLog10;  // log10 -> ln scale
                r.words.push_back(wid);
                int keep = std::max(0, lm->order - 1);
                if ((int)r.words.size() > keep)
                  r.words.erase(r.words.begin(),
                                r.words.end() - keep);
              }
            }
          }
        }
        double mass = (c == last ? p.p_b : p_tot) + emit;
        r.p_nb = log_add(r.p_nb, mass);
      }
    }

    // prune to beam_width by total score
    beam.clear();
    beam.reserve(next.size());
    for (auto& kv : next) beam.push_back(std::move(kv.second));
    if ((int)beam.size() > beam_width) {
      std::partial_sort(
          beam.begin(), beam.begin() + beam_width, beam.end(),
          [](const Prefix& a, const Prefix& b) { return a.total() > b.total(); });
      beam.resize(beam_width);
    }
  }

  // final: score the trailing partial word too (sentence end)
  const Prefix* best = nullptr;
  double best_score = -1e300;
  std::vector<double> finals(beam.size());
  for (size_t i = 0; i < beam.size(); ++i) {
    const Prefix& p = beam[i];
    double s = p.total();
    std::string w = last_partial_word(p.chars);
    if (!w.empty()) {
      s += word_count_weight;
      if (lm && lm->trie_has_word(w)) s += valid_word_count_weight;
      if (lm && lm->order > 0) {
        std::vector<uint32_t> hist;
        if (lm->bos_id != UINT32_MAX) hist.push_back(lm->bos_id);
        hist.insert(hist.end(), p.words.begin(), p.words.end());
        s += lm_weight * lm->score(hist.data(), (int)hist.size(),
                                   lm->word_id(w)) * kLog10;
      }
    }
    if (s > best_score) { best_score = s; best = &p; }
  }

  if (!best) return 0;
  int n = std::min<int>((int)best->chars.size(), out_capacity);
  for (int i = 0; i < n; ++i) out_ids[i] = best->chars[i];
  return n;
}

}  // extern "C"
