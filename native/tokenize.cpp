// Native SentencePiece-style (SPM) tokenizer encode — the host-side hot
// loop of request preprocessing in the serving engine.
//
// Semantics mirror io/tokenizer.py SPMTokenizer.encode (itself the
// llama.cpp llm_tokenizer_spm behavior): text is split into UTF-8
// symbols, then the adjacent pair whose concatenation is in the vocab
// with the HIGHEST score merges first (ties -> leftmost), repeating until
// no pair matches; unmatched symbols fall back to <0xXX> byte tokens.
// The Python loop is O(n^2) rescans; this is the O(n log n)
// priority-queue formulation, bit-identical output (the queue pops
// exactly the pair the rescan would pick: score desc, position asc, and
// stale entries are dropped by a length check).
//
// C ABI (ctypes, see ggmlsharp_tpu/io/native.py):
//   spm_create(blob, offs, scores, n, byte_ids[256], unk_id) -> handle
//   spm_encode(handle, text, len, out, max_out) -> n_ids (or -needed)
//   spm_destroy(handle)

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> index;
  std::vector<float> scores;
  int32_t byte_ids[256];
  int32_t unk_id;
};

struct Sym {
  int32_t prev, next;   // doubly-linked symbol list
  uint32_t off, len;    // byte span in the working text
};

struct Bigram {
  float score;
  int32_t left;
  uint32_t merged_len;  // validity check against concat length at pop time
  uint64_t seq;         // FIFO tiebreak for equal (score, left)
};

struct BigramLess {
  bool operator()(const Bigram& a, const Bigram& b) const {
    if (a.score != b.score) return a.score < b.score;   // max-heap on score
    if (a.left != b.left) return a.left > b.left;        // then leftmost
    return a.seq > b.seq;
  }
};

int utf8_len(uint8_t c) {
  if (c < 0x80) return 1;
  if ((c & 0xE0) == 0xC0) return 2;
  if ((c & 0xF0) == 0xE0) return 3;
  if ((c & 0xF8) == 0xF0) return 4;
  return 1;  // invalid byte: treat as single symbol
}

}  // namespace

extern "C" {

int32_t tokenize_abi_version() { return 1; }

void* spm_create(const uint8_t* blob, const uint64_t* offs,
                 const float* scores, int32_t n_tokens,
                 const int32_t* byte_ids, int32_t unk_id) {
  auto* v = new Vocab();
  v->index.reserve(n_tokens * 2);
  v->scores.assign(scores, scores + n_tokens);
  for (int32_t i = 0; i < n_tokens; ++i) {
    std::string t(reinterpret_cast<const char*>(blob + offs[i]),
                  offs[i + 1] - offs[i]);
    v->index.emplace(std::move(t), i);
  }
  std::memcpy(v->byte_ids, byte_ids, 256 * sizeof(int32_t));
  v->unk_id = unk_id;
  return v;
}

void spm_destroy(void* h) { delete static_cast<Vocab*>(h); }

// text: the PRE-TRANSFORMED working string (leading-space prefix and
// ' '->U+2581 substitution applied by the Python wrapper — pure string
// ops, not the hot loop). Returns the id count, or -(needed) if max_out
// is too small.
int32_t spm_encode(void* h, const uint8_t* text, int32_t text_len,
                   int32_t* out, int32_t max_out) {
  const Vocab& v = *static_cast<Vocab*>(h);
  std::vector<Sym> syms;
  syms.reserve(text_len);
  for (int32_t i = 0; i < text_len;) {
    int l = utf8_len(text[i]);
    if (i + l > text_len) l = 1;
    Sym s;
    s.prev = (int32_t)syms.size() - 1;
    s.next = (int32_t)syms.size() + 1;
    s.off = (uint32_t)i;
    s.len = (uint32_t)l;
    syms.push_back(s);
    i += l;
  }
  if (!syms.empty()) syms.back().next = -1;

  std::priority_queue<Bigram, std::vector<Bigram>, BigramLess> q;
  uint64_t seq = 0;
  auto try_add = [&](int32_t left) {
    if (left < 0) return;
    int32_t right = syms[left].next;
    if (right < 0) return;
    std::string cand(reinterpret_cast<const char*>(text + syms[left].off),
                     syms[left].len + syms[right].len);
    auto it = v.index.find(cand);
    if (it == v.index.end()) return;
    q.push({v.scores[it->second], left,
            syms[left].len + syms[right].len, seq++});
  };
  for (int32_t i = 0; i + 1 < (int32_t)syms.size(); ++i) try_add(i);

  while (!q.empty()) {
    Bigram b = q.top();
    q.pop();
    Sym& L = syms[b.left];
    int32_t ri = L.next;
    if (ri < 0) continue;
    Sym& R = syms[ri];
    // stale entries: either side already absorbed (len 0) or spans changed
    if (L.len == 0 || R.len == 0 || L.len + R.len != b.merged_len) continue;
    // merge R into L
    L.len += R.len;
    L.next = R.next;
    if (R.next >= 0) syms[R.next].prev = b.left;
    R.len = 0;
    try_add(L.prev);
    try_add(b.left);
  }

  int32_t n = 0;
  auto emit = [&](int32_t id) {
    if (n < max_out) out[n] = id;
    ++n;
  };
  for (int32_t i = 0; i >= 0 && i < (int32_t)syms.size();
       i = syms[i].next) {
    if (syms[i].len == 0) continue;
    std::string s(reinterpret_cast<const char*>(text + syms[i].off),
                  syms[i].len);
    auto it = v.index.find(s);
    if (it != v.index.end()) {
      emit(it->second);
    } else {
      for (uint32_t j = 0; j < syms[i].len; ++j) {
        uint8_t byte = text[syms[i].off + j];
        int32_t id = v.byte_ids[byte];
        emit(id >= 0 ? id : v.unk_id);
      }
    }
  }
  return n <= max_out ? n : -n;
}

// ---------------------------------------------------------------------------
// Byte-level BPE merge loop (GPT-2 family): lowest-rank adjacent pair
// merges first, ties -> leftmost — mirrors io/tokenizer.py BPETokenizer.
// The Python wrapper keeps the GPT-2 regex split + bytes_to_unicode
// mapping; this runs the per-piece O(n log n) merge over UTF-8 symbols
// (reusing the SPM machinery with score = -rank).

struct BpeVocab {
  std::unordered_map<std::string, int32_t> index;   // token -> id
  std::unordered_map<std::string, int32_t> ranks;   // "l\x01r" -> rank
  int32_t unk_id;
};

void* bpe_create(const uint8_t* tok_blob, const uint64_t* tok_offs,
                 int32_t n_tokens, const uint8_t* mrg_blob,
                 const uint64_t* mrg_offs, int32_t n_merges,
                 int32_t unk_id) {
  auto* v = new BpeVocab();
  v->index.reserve(n_tokens * 2);
  for (int32_t i = 0; i < n_tokens; ++i)
    v->index.emplace(
        std::string(reinterpret_cast<const char*>(tok_blob + tok_offs[i]),
                    tok_offs[i + 1] - tok_offs[i]),
        i);
  v->ranks.reserve(n_merges * 2);
  // merges arrive as alternating left/right strings: 2*n_merges entries
  for (int32_t r = 0; r < n_merges; ++r) {
    std::string l(reinterpret_cast<const char*>(mrg_blob + mrg_offs[2 * r]),
                  mrg_offs[2 * r + 1] - mrg_offs[2 * r]);
    std::string rr(
        reinterpret_cast<const char*>(mrg_blob + mrg_offs[2 * r + 1]),
        mrg_offs[2 * r + 2] - mrg_offs[2 * r + 1]);
    v->ranks.emplace(l + '\x01' + rr, r);
  }
  v->unk_id = unk_id;
  return v;
}

void bpe_destroy(void* h) { delete static_cast<BpeVocab*>(h); }

int32_t bpe_encode_piece(void* h, const uint8_t* text, int32_t text_len,
                         int32_t* out, int32_t max_out);

// Whole-text batch: pieces[i] spans text[piece_offs[i], piece_offs[i+1]).
// ONE ctypes crossing per encode — per-piece calls lose to Python on the
// short pieces GPT-2's regex produces.
int32_t bpe_encode_pieces(void* h, const uint8_t* text,
                          const int64_t* piece_offs, int32_t n_pieces,
                          int32_t* out, int32_t max_out) {
  int32_t n = 0;
  for (int32_t p = 0; p < n_pieces; ++p) {
    int32_t len = (int32_t)(piece_offs[p + 1] - piece_offs[p]);
    int32_t got = bpe_encode_piece(
        h, text + piece_offs[p], len,
        out + (n < max_out ? n : max_out), max_out > n ? max_out - n : 0);
    n += got < 0 ? -got : got;
  }
  return n <= max_out ? n : -n;
}

// piece: one pre-mapped (bytes_to_unicode) regex piece, UTF-8. Appends its
// ids to out; returns new count (or -(needed)).
int32_t bpe_encode_piece(void* h, const uint8_t* text, int32_t text_len,
                         int32_t* out, int32_t max_out) {
  const BpeVocab& v = *static_cast<BpeVocab*>(h);
  std::vector<Sym> syms;
  for (int32_t i = 0; i < text_len;) {
    int l = utf8_len(text[i]);
    if (i + l > text_len) l = 1;
    Sym s;
    s.prev = (int32_t)syms.size() - 1;
    s.next = (int32_t)syms.size() + 1;
    s.off = (uint32_t)i;
    s.len = (uint32_t)l;
    syms.push_back(s);
    i += l;
  }
  if (!syms.empty()) syms.back().next = -1;

  std::priority_queue<Bigram, std::vector<Bigram>, BigramLess> q;
  uint64_t seq = 0;
  auto try_add = [&](int32_t left) {
    if (left < 0) return;
    int32_t right = syms[left].next;
    if (right < 0) return;
    std::string l(reinterpret_cast<const char*>(text + syms[left].off),
                  syms[left].len);
    std::string r(reinterpret_cast<const char*>(text + syms[right].off),
                  syms[right].len);
    auto it = v.ranks.find(l + '\x01' + r);
    if (it == v.ranks.end()) return;
    q.push({-(float)it->second, left,
            syms[left].len + syms[right].len, seq++});
  };
  for (int32_t i = 0; i + 1 < (int32_t)syms.size(); ++i) try_add(i);

  while (!q.empty()) {
    Bigram b = q.top();
    q.pop();
    Sym& L = syms[b.left];
    int32_t ri = L.next;
    if (ri < 0) continue;
    Sym& R = syms[ri];
    if (L.len == 0 || R.len == 0 || L.len + R.len != b.merged_len) continue;
    L.len += R.len;
    L.next = R.next;
    if (R.next >= 0) syms[R.next].prev = b.left;
    R.len = 0;
    try_add(L.prev);
    try_add(b.left);
  }

  int32_t n = 0;
  for (int32_t i = 0; i >= 0 && i < (int32_t)syms.size();
       i = syms[i].next) {
    if (syms[i].len == 0) continue;
    std::string s(reinterpret_cast<const char*>(text + syms[i].off),
                  syms[i].len);
    auto it = v.index.find(s);
    int32_t id = it != v.index.end() ? it->second : v.unk_id;
    if (n < max_out) out[n] = id;
    ++n;
  }
  return n <= max_out ? n : -n;
}

}  // extern "C"
