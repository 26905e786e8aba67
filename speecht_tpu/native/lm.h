// Shared n-gram language model interface for the host beam search.
//
// Two backends implement it:
//  - ArpaScorer (beam_search.cpp): KenLM's source format, parsed directly.
//  - KenlmBinaryScorer (kenlm_binary.cpp): KenLM's PROBING binary format
//    ("mmap lm ... format version 5"), read without the KenLM library —
//    capability parity with the reference's released kenlm-model.binary
//    bundle (reference speecht-cli:84-88, speech_model.py:103-111).
//
// Scores are log10 (ARPA convention); shallow fusion scales them in the
// beam (beam_search.cpp).

#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace speecht {

struct NGramScorer {
  virtual ~NGramScorer() = default;
  virtual int order() const = 0;
  // word -> backend id; OOV maps to the backend's <unk> id
  virtual uint32_t word_id(const std::string& w) const = 0;
  virtual uint32_t bos_id() const = 0;  // UINT32_MAX when absent
  // log10 P(word | history), Katz backoff; history ids most-recent-last
  virtual float score(const uint32_t* history, int hist_len,
                      uint32_t word) const = 0;
  // vocabulary surface forms (for the valid-word character trie)
  virtual void vocab_words(std::vector<std::string>* out) const = 0;
};

// Returns nullptr + *err on failure.
NGramScorer* load_kenlm_binary_scorer(const char* path, std::string* err);

// ARPA -> KenLM PROBING binary converter (0 on success).
int write_kenlm_binary(const char* arpa_path, const char* out_path,
                       std::string* err);

// True when the file starts with the KenLM binary magic.
bool is_kenlm_binary(const char* path);

}  // namespace speecht
