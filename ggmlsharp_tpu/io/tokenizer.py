"""Tokenizers for model serving: llama.cpp-compatible SentencePiece-style
(SPM, Llama family) and byte-level BPE (GPT-2 family), constructed from GGUF
metadata (`tokenizer.ggml.*` keys) or from explicit vocab/merge tables.

The reference has no tokenizer at all (SURVEY §1: "no model layer ... no
serving layer"); llama.cpp's are the semantics target:
  * SPM: text → '▁'-prefixed symbols, greedy highest-score bigram merges
    over the vocab, unknown bytes fall back to <0xXX> byte tokens.
  * BPE: byte-level pre-mapping (GPT-2 bytes_to_unicode), lowest-rank merge
    first.
Pure Python — tokenization is host-side serving work, far off the TPU hot
path (one encode per request vs thousands of model steps).
"""
from __future__ import annotations

from dataclasses import dataclass, field


def _bytes_to_unicode():
    """GPT-2's printable-byte mapping (byte → unicode char)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_B2U = _bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


@dataclass
class SPMTokenizer:
    """Llama-family SentencePiece (greedy score-merge) tokenizer."""

    tokens: list
    scores: list
    bos_id: int = 1
    eos_id: int = 2
    unk_id: int = 0
    add_space_prefix: bool = True
    _index: dict = field(default_factory=dict, repr=False)
    _bytes: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        self._index = {t: i for i, t in enumerate(self.tokens)}
        for i, t in enumerate(self.tokens):
            if len(t) == 6 and t.startswith("<0x") and t.endswith(">"):
                self._bytes[int(t[3:5], 16)] = i

    def _native(self):
        """Lazily build the C++ encoder (native/tokenize.cpp); None when
        the toolchain/library is unavailable (pure-Python fallback)."""
        if not hasattr(self, "_native_h"):
            try:
                from .native import NativeSPM

                self._native_h = NativeSPM(self.tokens, self.scores,
                                           self._bytes, self.unk_id)
            except Exception:
                self._native_h = None
        return self._native_h

    def encode(self, text: str, bos: bool = True) -> list:
        if self.add_space_prefix:
            text = " " + text
        text = text.replace(" ", "▁")
        nat = self._native()
        if nat is not None:
            ids = nat.encode(text)
            return [self.bos_id] + ids if bos else ids
        syms = list(text)
        # greedy merge: repeatedly join the adjacent pair whose merged
        # string is in the vocab with the best (highest) score
        while True:
            best, best_score = -1, -1e30
            for i in range(len(syms) - 1):
                cand = syms[i] + syms[i + 1]
                j = self._index.get(cand)
                if j is not None and self.scores[j] > best_score:
                    best, best_score = i, self.scores[j]
            if best < 0:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        out = [self.bos_id] if bos else []
        for s in syms:
            j = self._index.get(s)
            if j is not None:
                out.append(j)
            else:  # byte fallback
                for b in s.encode("utf-8"):
                    out.append(self._bytes.get(b, self.unk_id))
        return out

    def decode(self, ids) -> str:
        buf = bytearray()
        for i in ids:
            i = int(i)
            if i in (self.bos_id, self.eos_id):
                continue
            t = self.tokens[i]
            if len(t) == 6 and t.startswith("<0x") and t.endswith(">"):
                buf += bytes([int(t[3:5], 16)])
            else:
                buf += t.encode("utf-8")
        s = buf.decode("utf-8", errors="replace").replace("▁", " ")
        return s[1:] if self.add_space_prefix and s.startswith(" ") else s


@dataclass
class BPETokenizer:
    """GPT-2-family byte-level BPE."""

    tokens: list
    merges: list  # ["a b", ...] rank-ordered
    eos_id: int | None = None
    _index: dict = field(default_factory=dict, repr=False)
    _ranks: dict = field(default_factory=dict, repr=False)

    def __post_init__(self):
        self._index = {t: i for i, t in enumerate(self.tokens)}
        self._ranks = {
            tuple(m.split(" ", 1)): r for r, m in enumerate(self.merges)
        }

    def _native(self):
        # OPT-IN (GGML_TPU_NATIVE_BPE=1): GPT-2's regex yields short pieces,
        # where the Python merge loop beats the ctypes crossing (measured
        # 2.0 vs 4.7 ms on a 4k-char prompt); the native path wins only on
        # pathologically long words. SPM (llama) defaults native — its merge
        # runs over the WHOLE text and is ~2500x faster there.
        if not hasattr(self, "_native_h"):
            import os

            self._native_h = None
            if os.environ.get("GGML_TPU_NATIVE_BPE") == "1":
                try:
                    from .native import NativeBPE

                    self._native_h = NativeBPE(self.tokens, self.merges)
                except Exception:
                    self._native_h = None
        return self._native_h

    def _bpe(self, word: str) -> list:
        parts = list(word)
        while len(parts) > 1:
            best_rank, best = None, -1
            for i in range(len(parts) - 1):
                r = self._ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best = r, i
            if best < 0:
                break
            parts[best : best + 2] = [parts[best] + parts[best + 1]]
        return parts

    def encode(self, text: str, bos: bool = False) -> list:
        # byte-level: whole text mapped through bytes_to_unicode, split on
        # spaces the GPT-2 way (space attaches to the following word)
        import re

        pat = re.compile(
            r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+",
            re.UNICODE,
        )
        mapped = ["".join(_B2U[b] for b in piece.encode("utf-8"))
                  for piece in pat.findall(text)]
        nat = self._native()
        if nat is not None:
            return nat.encode_pieces(mapped)
        out = []
        for m in mapped:
            for p in self._bpe(m):
                out.append(self._index.get(p, 0))
        return out

    def decode(self, ids) -> str:
        text = "".join(self.tokens[int(i)] for i in ids
                       if self.eos_id is None or int(i) != self.eos_id)
        data = bytes(_U2B[c] for c in text if c in _U2B)
        return data.decode("utf-8", errors="replace")


def from_gguf(reader) -> "SPMTokenizer | BPETokenizer":
    """Build the right tokenizer from a GGUFReader's metadata
    (tokenizer.ggml.model / tokens / scores / merges / *_token_id)."""
    md = reader.metadata
    model = md.get("tokenizer.ggml.model", "llama")
    tokens = list(md["tokenizer.ggml.tokens"])
    if model in ("llama", "spm"):
        scores = list(md.get("tokenizer.ggml.scores",
                             [0.0] * len(tokens)))
        return SPMTokenizer(
            tokens, scores,
            bos_id=int(md.get("tokenizer.ggml.bos_token_id", 1)),
            eos_id=int(md.get("tokenizer.ggml.eos_token_id", 2)),
            unk_id=int(md.get("tokenizer.ggml.unknown_token_id", 0)),
        )
    if model in ("gpt2", "bpe"):
        return BPETokenizer(
            tokens, list(md.get("tokenizer.ggml.merges", [])),
            eos_id=md.get("tokenizer.ggml.eos_token_id"),
        )
    raise ValueError(f"unknown tokenizer model {model!r}")


def train_spm_vocab(text: str, size: int = 512):
    """Train a small SentencePiece-style vocab on `text` with BPE merges.

    Returns (tokens, scores) for SPMTokenizer: 3 specials (<unk>/<s>/</s>),
    256 byte-fallback tokens, every single character seen, then `size`-
    bounded BPE merges learned greedily over ▁-prefixed words. Scores are
    -merge_rank so SPMTokenizer.encode's greedy highest-score merge replays
    the merges in training order (each merged piece is the join of two
    earlier pieces, so greedy merging is always productive). The reference
    has no tokenizer at all; this exists so the perplexity chain
    (scripts/ppl_chain.py) can run GGUF->tokenize->ppl end-to-end without
    network access to a pretrained vocab.
    """
    from collections import Counter

    words = Counter("▁" + w for w in text.split() if w)
    tokens = ["<unk>", "<s>", "</s>"]
    tokens += [f"<0x{b:02X}>" for b in range(256)]
    scores = [0.0] * len(tokens)
    chars = sorted({c for w in words for c in w})
    for c in chars:
        tokens.append(c)
        scores.append(0.0)
    seqs = {w: list(w) for w in words}
    rank = 0
    while len(tokens) < size:
        pairs = Counter()
        for w, seq in seqs.items():
            n = words[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = pairs.most_common(1)[0]
        if cnt < 2:
            break
        merged = a + b
        tokens.append(merged)
        rank += 1
        scores.append(-float(rank))
        for w, seq in seqs.items():
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i : i + 2] = [merged]
                else:
                    i += 1
    return tokens, scores
