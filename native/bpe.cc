// Native BPE merge core for the CLIP/OpenCLIP tokenizers.
//
// The reference implements its whole tokenizer in native code (Rust,
// /root/reference/src/token/clip.rs:123-178); here the O(n^2) greedy
// lowest-rank merge loop — the hot part for batch prompt serving — runs in
// C++ behind a ctypes boundary, while the unicode regex pre-split stays in
// Python (where \p{L}/\p{N} classes are already correct).
//
// Contract (mirrors ClipTokenizer::bpe):
//   - input token is a UTF-8 string over the byte->unicode alphabet
//   - symbols are unicode codepoints; "</w>" is appended to the last
//   - repeatedly merge the adjacent pair with the lowest rank
//   - result is the ' '-joined symbol sequence
//
// Build: make -C native  (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    std::hash<std::string> h;
    return h(p.first) * 1000003u ^ h(p.second);
  }
};

struct Bpe {
  std::unordered_map<std::pair<std::string, std::string>, int, PairHash> ranks;
};

// split UTF-8 into codepoint-sized chunks (no validation; the byte->unicode
// alphabet only produces valid 1-2 byte sequences plus U+0100..U+01FF)
std::vector<std::string> utf8_symbols(const char* s, size_t n) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < n) {
    unsigned char c = s[i];
    size_t len = 1;
    if (c >= 0xF0)
      len = 4;
    else if (c >= 0xE0)
      len = 3;
    else if (c >= 0xC0)
      len = 2;
    if (i + len > n) len = 1;
    out.emplace_back(s + i, len);
    i += len;
  }
  return out;
}

}  // namespace

extern "C" {

// merges_blob: '\n'-separated lines "first second" (already sliced/cleaned
// by Python); rank = line index.
void* bpe_new(const char* merges_blob, int64_t len) {
  Bpe* bpe = new Bpe();
  const char* p = merges_blob;
  const char* end = merges_blob + len;
  int rank = 0;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    const char* sp = static_cast<const char*>(memchr(p, ' ', nl - p));
    if (sp) {
      bpe->ranks.emplace(
          std::make_pair(std::string(p, sp - p), std::string(sp + 1, nl - sp - 1)),
          rank);
    }
    ++rank;
    p = nl + 1;
  }
  return bpe;
}

void bpe_free(void* handle) { delete static_cast<Bpe*>(handle); }

// Apply BPE to one pre-split token. Returns number of bytes written to out
// (' '-joined pieces), or -1 if out_cap is too small.
int64_t bpe_apply(void* handle, const char* token, int64_t token_len,
                  char* out, int64_t out_cap) {
  Bpe* bpe = static_cast<Bpe*>(handle);

  std::vector<std::string> word = utf8_symbols(token, token_len);
  std::string result;
  if (word.empty()) {
    result = "</w>";
  } else if (word.size() == 1) {
    // single symbol: "token</w>" without running the loop (clip.rs:132-134)
    result.assign(token, token_len);
    result += "</w>";
  } else {
    word.back() += "</w>";
    for (;;) {
      int best_rank = INT32_MAX;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < word.size(); ++i) {
        auto it = bpe->ranks.find(std::make_pair(word[i], word[i + 1]));
        if (it != bpe->ranks.end() && it->second < best_rank) {
          best_rank = it->second;
          best_i = i;
        }
      }
      if (best_rank == INT32_MAX) break;

      // merge ALL occurrences of the chosen pair left-to-right
      const std::string first = word[best_i];
      const std::string second = word[best_i + 1];
      std::vector<std::string> next;
      next.reserve(word.size());
      size_t i = 0;
      while (i < word.size()) {
        if (i + 1 < word.size() && word[i] == first && word[i + 1] == second) {
          next.push_back(first + second);
          i += 2;
        } else {
          next.push_back(word[i]);
          i += 1;
        }
      }
      word.swap(next);
      if (word.size() == 1) break;
    }
    for (size_t i = 0; i < word.size(); ++i) {
      if (i) result += ' ';
      result += word[i];
    }
  }

  if (static_cast<int64_t>(result.size()) > out_cap) return -1;
  memcpy(out, result.data(), result.size());
  return static_cast<int64_t>(result.size());
}

}  // extern "C"
