// Byte-level BPE tokenizer core (GPT-2/RoBERTa style), C ABI for ctypes.
//
// Native replacement for the Rust `tokenizers` dependency the reference
// exercises through HF AutoTokenizer (reference main_pretraining.py:117).
// Must agree bit-for-bit with synergy_tpu/data/tokenizer/bpe_py.py; parity is
// enforced in tests/test_tokenizer.py.
//
// Pipeline: UTF-8 decode -> GPT-2 regex pre-tokenization (Unicode tables in
// unicode_ranges.h) -> byte->unicode alphabet -> greedy lowest-rank pair
// merging -> vocab lookup.
//
// Build: g++ -O2 -std=c++17 -fPIC -shared bpe.cpp -o libbpe.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "unicode_ranges.h"

namespace {

bool in_ranges(uint32_t cp, const uint32_t ranges[][2], size_t n) {
  size_t lo = 0, hi = n;
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    if (cp < ranges[mid][0]) {
      hi = mid;
    } else if (cp > ranges[mid][1]) {
      lo = mid + 1;
    } else {
      return true;
    }
  }
  return false;
}

bool is_letter(uint32_t cp) { return in_ranges(cp, kLetterRanges, kLetterRanges_len); }
bool is_number(uint32_t cp) { return in_ranges(cp, kNumberRanges, kNumberRanges_len); }
bool is_space(uint32_t cp) { return in_ranges(cp, kSpaceRanges, kSpaceRanges_len); }

// Decode UTF-8 into codepoints; also record each codepoint's byte offset+len.
struct CodePoint {
  uint32_t cp;
  uint32_t off;
  uint32_t len;
};

std::vector<CodePoint> decode_utf8(const std::string& s) {
  std::vector<CodePoint> out;
  size_t i = 0;
  while (i < s.size()) {
    uint8_t c = s[i];
    uint32_t cp;
    uint32_t len;
    if (c < 0x80) {
      cp = c;
      len = 1;
    } else if ((c >> 5) == 0x6 && i + 1 < s.size()) {
      cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
      len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < s.size()) {
      cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
      len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < s.size()) {
      cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
           ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
      len = 4;
    } else {  // invalid byte: treat as Latin-1 fallback
      cp = c;
      len = 1;
    }
    out.push_back({cp, static_cast<uint32_t>(i), len});
    i += len;
  }
  return out;
}

// GPT-2 byte->unicode alphabet (256 symbols), as UTF-8 strings.
std::vector<std::string> byte_to_unicode_utf8() {
  std::vector<int> bs;
  for (int b = '!'; b <= '~'; ++b) bs.push_back(b);
  for (int b = 0xA1; b <= 0xAC; ++b) bs.push_back(b);
  for (int b = 0xAE; b <= 0xFF; ++b) bs.push_back(b);
  std::vector<int> cs(bs);
  int n = 0;
  for (int b = 0; b < 256; ++b) {
    if (std::find(bs.begin(), bs.end(), b) == bs.end()) {
      bs.push_back(b);
      cs.push_back(256 + n);
      ++n;
    }
  }
  std::vector<std::string> table(256);
  for (size_t i = 0; i < bs.size(); ++i) {
    uint32_t cp = cs[i];
    std::string u;
    if (cp < 0x80) {
      u.push_back(static_cast<char>(cp));
    } else if (cp < 0x800) {
      u.push_back(static_cast<char>(0xC0 | (cp >> 6)));
      u.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    } else {
      u.push_back(static_cast<char>(0xE0 | (cp >> 12)));
      u.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
      u.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
    }
    table[bs[i]] = u;
  }
  return table;
}

// Minimal JSON object parser for vocab.json ({"token": id, ...}).
bool parse_vocab_json(const std::string& path,
                      std::unordered_map<std::string, int32_t>* vocab) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::stringstream ss;
  ss << f.rdbuf();
  std::string s = ss.str();
  size_t i = 0;
  auto skip_ws = [&]() {
    while (i < s.size() && (s[i] == ' ' || s[i] == '\n' || s[i] == '\t' || s[i] == '\r' || s[i] == ',')) ++i;
  };
  skip_ws();
  if (i >= s.size() || s[i] != '{') return false;
  ++i;
  while (true) {
    skip_ws();
    if (i >= s.size()) return false;
    if (s[i] == '}') break;
    if (s[i] != '"') return false;
    ++i;
    std::string key;
    while (i < s.size() && s[i] != '"') {
      if (s[i] == '\\' && i + 1 < s.size()) {
        ++i;
        char e = s[i];
        switch (e) {
          case 'n': key.push_back('\n'); break;
          case 't': key.push_back('\t'); break;
          case 'r': key.push_back('\r'); break;
          case 'b': key.push_back('\b'); break;
          case 'f': key.push_back('\f'); break;
          case '"': key.push_back('"'); break;
          case '\\': key.push_back('\\'); break;
          case '/': key.push_back('/'); break;
          case 'u': {
            if (i + 4 >= s.size()) return false;
            uint32_t cp = std::stoul(s.substr(i + 1, 4), nullptr, 16);
            i += 4;
            // surrogate pair
            if (cp >= 0xD800 && cp <= 0xDBFF && i + 6 < s.size() &&
                s[i + 1] == '\\' && s[i + 2] == 'u') {
              uint32_t lo = std::stoul(s.substr(i + 3, 4), nullptr, 16);
              cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
              i += 6;
            }
            if (cp < 0x80) {
              key.push_back(static_cast<char>(cp));
            } else if (cp < 0x800) {
              key.push_back(static_cast<char>(0xC0 | (cp >> 6)));
              key.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
            } else if (cp < 0x10000) {
              key.push_back(static_cast<char>(0xE0 | (cp >> 12)));
              key.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
              key.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
            } else {
              key.push_back(static_cast<char>(0xF0 | (cp >> 18)));
              key.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
              key.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
              key.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
            }
            break;
          }
          default: key.push_back(e);
        }
        ++i;
      } else {
        key.push_back(s[i]);
        ++i;
      }
    }
    ++i;  // closing quote
    skip_ws();
    if (i >= s.size() || s[i] != ':') return false;
    ++i;
    skip_ws();
    size_t j = i;
    while (j < s.size() && (isdigit(s[j]) || s[j] == '-')) ++j;
    (*vocab)[key] = std::stoi(s.substr(i, j - i));
    i = j;
  }
  return true;
}

struct Tokenizer {
  // symbol interning: unicode-alphabet strings -> dense ids
  std::unordered_map<std::string, int32_t> sym_id;
  std::vector<std::string> sym_str;
  // merges: (a,b) -> {rank, merged symbol id}
  std::unordered_map<uint64_t, std::pair<int32_t, int32_t>> merges;
  // vocab: symbol id -> token id
  std::unordered_map<int32_t, int32_t> sym_to_token;
  std::vector<std::string> byte_table;  // 256 entries (UTF-8 of alphabet char)
  int32_t byte_sym[256];
  int32_t unk_id = 3;

  int32_t intern(const std::string& s) {
    auto it = sym_id.find(s);
    if (it != sym_id.end()) return it->second;
    int32_t id = static_cast<int32_t>(sym_str.size());
    sym_id.emplace(s, id);
    sym_str.push_back(s);
    return id;
  }
};

uint64_t pair_key(int32_t a, int32_t b) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
         static_cast<uint32_t>(b);
}

bool starts_with_contraction(const std::vector<CodePoint>& cps, size_t i,
                             const std::string& text, size_t* len_cp) {
  // contractions: 's 't 're 've 'm 'll 'd  (ASCII only)
  if (cps[i].cp != '\'') return false;
  auto ch = [&](size_t k) -> uint32_t {
    return (i + k < cps.size()) ? cps[i + k].cp : 0;
  };
  uint32_t c1 = ch(1), c2 = ch(2);
  if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') {
    *len_cp = 2;
    return true;
  }
  if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') ||
      (c1 == 'l' && c2 == 'l')) {
    *len_cp = 3;
    return true;
  }
  (void)text;
  return false;
}

// Pre-tokenize into [start_cp, end_cp) spans following the GPT-2 pattern.
std::vector<std::pair<size_t, size_t>> pretokenize(
    const std::vector<CodePoint>& cps, const std::string& text) {
  std::vector<std::pair<size_t, size_t>> spans;
  size_t i = 0, n = cps.size();
  while (i < n) {
    size_t clen;
    if (starts_with_contraction(cps, i, text, &clen)) {
      spans.emplace_back(i, i + clen);
      i += clen;
      continue;
    }
    size_t j = i;
    uint32_t cp = cps[i].cp;
    if (cp == ' ' && i + 1 < n && !is_space(cps[i + 1].cp)) {
      j = i + 1;
      cp = cps[j].cp;
    }
    if (!is_space(cp)) {
      size_t k = j;
      if (is_letter(cp)) {
        while (k < n && is_letter(cps[k].cp)) ++k;
      } else if (is_number(cp)) {
        while (k < n && is_number(cps[k].cp)) ++k;
      } else {
        // Apostrophes are consumed by the punct run; contraction alternatives
        // only win when the match starts at the apostrophe.
        while (k < n && !is_space(cps[k].cp) && !is_letter(cps[k].cp) &&
               !is_number(cps[k].cp)) {
          ++k;
        }
      }
      spans.emplace_back(i, k);
      i = k;
      continue;
    }
    // whitespace run: `\s+(?!\S)` or `\s+`
    size_t k = i;
    while (k < n && is_space(cps[k].cp)) ++k;
    if (k < n && k - i > 1) {
      spans.emplace_back(i, k - 1);
      i = k - 1;
    } else {
      spans.emplace_back(i, k);
      i = k;
    }
  }
  return spans;
}

void encode_pretoken(const Tokenizer& tk, const std::string& text,
                     const std::vector<CodePoint>& cps, size_t s, size_t e,
                     std::vector<int32_t>* out) {
  // map UTF-8 bytes of the span through the byte alphabet
  size_t byte_start = cps[s].off;
  size_t byte_end = (e < cps.size()) ? cps[e].off : text.size();
  std::vector<int32_t> word;
  word.reserve(byte_end - byte_start);
  for (size_t b = byte_start; b < byte_end; ++b) {
    word.push_back(tk.byte_sym[static_cast<uint8_t>(text[b])]);
  }
  // greedy lowest-rank merging
  while (word.size() > 1) {
    int32_t best_rank = INT32_MAX;
    size_t best_i = SIZE_MAX;
    int32_t best_sym = -1;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = tk.merges.find(pair_key(word[i], word[i + 1]));
      if (it != tk.merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_i = i;
        best_sym = it->second.second;
      }
    }
    if (best_i == SIZE_MAX) break;
    // merge ALL occurrences of the best pair (left to right)
    int32_t a = word[best_i], b = word[best_i + 1];
    std::vector<int32_t> merged;
    merged.reserve(word.size());
    size_t i = 0;
    while (i < word.size()) {
      if (i + 1 < word.size() && word[i] == a && word[i + 1] == b) {
        merged.push_back(best_sym);
        i += 2;
      } else {
        merged.push_back(word[i]);
        ++i;
      }
    }
    word.swap(merged);
  }
  for (int32_t sym : word) {
    auto it = tk.sym_to_token.find(sym);
    out->push_back(it != tk.sym_to_token.end() ? it->second : tk.unk_id);
  }
}

}  // namespace

extern "C" {

void* bpe_create(const char* vocab_path, const char* merges_path) {
  auto* tk = new Tokenizer();
  tk->byte_table = byte_to_unicode_utf8();
  for (int b = 0; b < 256; ++b) tk->byte_sym[b] = tk->intern(tk->byte_table[b]);

  std::unordered_map<std::string, int32_t> vocab;
  if (!parse_vocab_json(vocab_path, &vocab)) {
    delete tk;
    return nullptr;
  }
  std::ifstream mf(merges_path, std::ios::binary);
  if (!mf) {
    delete tk;
    return nullptr;
  }
  std::string line;
  int32_t rank = 0;
  while (std::getline(mf, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty() || line.rfind("#version", 0) == 0) continue;
    size_t sp = line.find(' ');
    if (sp == std::string::npos) continue;
    std::string a = line.substr(0, sp), b = line.substr(sp + 1);
    int32_t ia = tk->intern(a), ib = tk->intern(b);
    int32_t im = tk->intern(a + b);
    tk->merges.emplace(pair_key(ia, ib), std::make_pair(rank, im));
    ++rank;
  }
  for (const auto& kv : vocab) {
    tk->sym_to_token[tk->intern(kv.first)] = kv.second;
  }
  auto unk = vocab.find("<unk>");
  tk->unk_id = (unk != vocab.end()) ? unk->second : 3;
  return tk;
}

void bpe_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode text; returns number of ids written (or needed, if > max_out).
int32_t bpe_encode(void* handle, const char* utf8_text, int32_t text_len,
                   int32_t* out_ids, int32_t max_out) {
  auto* tk = static_cast<Tokenizer*>(handle);
  std::string text(utf8_text, text_len);
  auto cps = decode_utf8(text);
  auto spans = pretokenize(cps, text);
  std::vector<int32_t> ids;
  ids.reserve(text.size() / 3 + 4);
  for (auto& sp : spans) encode_pretoken(*tk, text, cps, sp.first, sp.second, &ids);
  int32_t count = static_cast<int32_t>(ids.size());
  int32_t to_copy = std::min(count, max_out);
  if (out_ids && to_copy > 0) {
    std::memcpy(out_ids, ids.data(), to_copy * sizeof(int32_t));
  }
  return count;
}

}  // extern "C"
