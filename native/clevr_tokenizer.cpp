// Native CLEVR preprocessing runtime: question tokenization and program
// prefix-notation compilation as a C shared library (ctypes-bound from
// probnmn_tpu.data.native).
//
// The reference preprocesses ~700k questions in a per-example Python loop
// (scripts/preprocess/preprocess_questions.py); these are the hot host-side
// loops — punctuation splitting, vocab lookups, and the program-tree pre-order
// traversal — moved to C++. Semantics match the Python implementation in
// probnmn_tpu/data/preprocessing.py exactly (tested for equality).
//
// Build: g++ -O2 -shared -fPIC -o libclevr_tokenizer.so clevr_tokenizer.cpp

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> token_to_index;
};

// Punctuation handling mirrors preprocessing.py: pad "?", ".", ",", ";" with a
// leading space, then split on single spaces, dropping "?", ".", "".
const char kPunct[] = {'?', '.', ',', ';'};

void tokenize_question_impl(const std::string& question,
                            std::vector<std::string>* out) {
  std::string padded;
  padded.reserve(question.size() + 8);
  for (char c : question) {
    bool is_punct = false;
    for (char p : kPunct) {
      if (c == p) { is_punct = true; break; }
    }
    if (is_punct) padded.push_back(' ');
    padded.push_back(c);
  }
  size_t start = 0;
  while (start <= padded.size()) {
    size_t end = padded.find(' ', start);
    if (end == std::string::npos) end = padded.size();
    std::string token = padded.substr(start, end - start);
    if (!token.empty() && token != "?" && token != ".") {
      out->push_back(std::move(token));
    }
    start = end + 1;
    if (end == padded.size()) break;
  }
}

}  // namespace

extern "C" {

// tokens: n_tokens null-separated strings, in index order.
void* clevr_vocab_create(const char* tokens, int32_t n_tokens) {
  auto* vocab = new Vocab();
  const char* p = tokens;
  for (int32_t i = 0; i < n_tokens; ++i) {
    std::string token(p);
    p += token.size() + 1;
    vocab->token_to_index.emplace(std::move(token), i);
  }
  return vocab;
}

void clevr_vocab_free(void* handle) { delete static_cast<Vocab*>(handle); }

// questions: n null-separated strings. Writes ids row-major into out
// (n x max_len int32, caller-zeroed); lengths[i] = token count (may exceed
// max_len, in which case the row is truncated). unk_index used for OOV.
// Returns the maximum token count seen.
int32_t clevr_tokenize_questions(void* handle, const char* questions, int32_t n,
                                 int32_t unk_index, int32_t* out,
                                 int32_t max_len, int32_t* lengths) {
  auto* vocab = static_cast<Vocab*>(handle);
  const char* p = questions;
  int32_t max_seen = 0;
  std::vector<std::string> tokens;
  for (int32_t i = 0; i < n; ++i) {
    std::string question(p);
    p += question.size() + 1;
    tokens.clear();
    tokenize_question_impl(question, &tokens);
    lengths[i] = static_cast<int32_t>(tokens.size());
    if (lengths[i] > max_seen) max_seen = lengths[i];
    int32_t limit = lengths[i] < max_len ? lengths[i] : max_len;
    for (int32_t j = 0; j < limit; ++j) {
      auto it = vocab->token_to_index.find(tokens[j]);
      out[i * max_len + j] =
          it == vocab->token_to_index.end() ? unk_index : it->second;
    }
  }
  return max_seen;
}

// Program prefix compilation (pre-order traversal rooted at the LAST token).
// func_ids: per-token vocab ids (value inputs already folded by the caller);
// child_index / child_offsets: CSR adjacency (children of token t are
// child_index[child_offsets[t] .. child_offsets[t+1])).
// Writes prefix ids into out (capacity max_out); returns prefix length
// (or -1 on overflow). Iterative traversal, children visited left-to-right.
int32_t clevr_program_prefix(const int32_t* func_ids, const int32_t* child_index,
                             const int32_t* child_offsets, int32_t n_tokens,
                             int32_t* out, int32_t max_out) {
  if (n_tokens == 0) return 0;
  std::vector<int32_t> stack;
  stack.push_back(n_tokens - 1);
  int32_t written = 0;
  while (!stack.empty()) {
    int32_t node = stack.back();
    stack.pop_back();
    if (written >= max_out) return -1;
    out[written++] = func_ids[node];
    // push children reversed so the leftmost child pops first
    for (int32_t c = child_offsets[node + 1] - 1; c >= child_offsets[node]; --c) {
      stack.push_back(child_index[c]);
    }
  }
  return written;
}

}  // extern "C"
