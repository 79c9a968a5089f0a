"""CLIP / OpenCLIP byte-pair-encoding tokenizers.

Pure-Python (host-side) reimplementation of the reference tokenizers:
  - CLIP BPE:     /root/reference/src/token/clip.rs:11-230
  - OpenCLIP BPE: /root/reference/src/token/open_clip.rs:70-221

Behavioral contract (verified by golden-vector tests):
  - byte -> printable-unicode table identical to GPT-2 / CLIP
    (clip.rs:11-32)
  - CLIP merge table = lines[1 : 49152-256-2+1] of bpe_simple_vocab_16e6.txt
    (clip.rs:97-98); OpenCLIP merges/vocab loaded verbatim from
    tokenizer/open_clip/{merges,vocab}.txt (open_clip.rs:88-89)
  - vocab for CLIP = 256 byte-chars + 256 "</w>" variants + merges
    + <|startoftext|> + <|endoftext|> = 49408 entries (clip.rs:63-77)
  - greedy lowest-rank BPE merge loop (clip.rs:123-178)
  - pre-split regex incl. special tokens + contractions, case-insensitive
    (clip.rs:110)
  - text is trimmed, whitespace-collapsed, lowercased (clip.rs:183)
  - CLIP: SOT=49406 EOT=49407 pad=EOT (clip.rs:219-229);
    OpenCLIP: same SOT/EOT but pad=0 (open_clip.rs:210-220)
  - CLIP caches the two special tokens so they map to themselves;
    OpenCLIP has an empty cache (open_clip.rs:99)
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Sequence, Tuple

import regex as re

_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|\p{L}+|\p{N}|[^\s\p{L}\p{N}]+",
    re.IGNORECASE,
)

SOT_TEXT = "<|startoftext|>"
EOT_TEXT = "<|endoftext|>"


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> Dict[int, str]:
    """Map every byte to a printable unicode char (clip.rs:11-32)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


def _whitespace_clean(text: str) -> str:
    return " ".join(text.split())


def _load_merge_lines(path: str) -> List[Tuple[str, str]]:
    merges = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            words = line.split()
            if len(words) >= 2:
                merges.append((words[0], words[1]))
    return merges


_VENDORED_MERGES = os.path.join(os.path.dirname(__file__), "data", "bpe_merges.txt.gz")


@functools.lru_cache(maxsize=1)
def vendored_merges() -> Tuple[Tuple[str, str], ...]:
    """The single BPE merge table both tokenizers share, vendored in-package.

    CLIP and OpenCLIP use the SAME 48894 merges: the reference's
    clip merges slice `[1 .. 49152-256-2+1]` of bpe_simple_vocab_16e6.txt
    (clip.rs:97-98) is line-for-line identical to its
    tokenizer/open_clip/merges.txt, and both 49408-entry vocabs derive from
    it as 256 byte-chars + 256 `</w>` variants + merges + 2 specials
    (clip.rs:63-77). So the whole tokenizer-data dependency reduces to one
    ~200 KB gzipped table (public OpenAI CLIP vocabulary data).
    """
    import gzip

    with gzip.open(_VENDORED_MERGES, "rt", encoding="utf-8") as f:
        merges = []
        for line in f:
            words = line.split()
            if len(words) >= 2:
                merges.append((words[0], words[1]))
    if len(merges) != 49152 - 256 - 2 + 1 - 1:
        raise ValueError(
            f"vendored merge table corrupt: {len(merges)} entries, expected 48894"
        )
    return tuple(merges)


def derive_vocab(merges: Sequence[Tuple[str, str]]) -> List[str]:
    """49408-entry vocab from a merge table (clip.rs:63-77)."""
    chars = list(bytes_to_unicode().values())
    return (
        chars
        + [c + "</w>" for c in chars]
        + [a + b for a, b in merges]
        + [SOT_TEXT, EOT_TEXT]
    )


def _resolve_data_dir(data_dir: str | None) -> str | None:
    """Find an external tokenizer data directory, if one is configured.

    Search order: explicit arg, $SDXL_TPU_TOKENIZER_DIR, ./tokenizer.
    Returns None when no external dir exists — callers then fall back to
    the vendored in-package table, so the package is self-contained.
    """
    candidates = []
    if data_dir:
        candidates.append(data_dir)
    env = os.environ.get("SDXL_TPU_TOKENIZER_DIR")
    if env:
        candidates.append(env)
    candidates.append(os.path.join(os.getcwd(), "tokenizer"))
    for c in candidates:
        if os.path.isdir(c):
            return c
    if data_dir or env:
        raise FileNotFoundError(
            f"tokenizer data dir not found (searched: {candidates})"
        )
    return None


class Tokenizer:
    """Shared BPE machinery; subclasses provide vocab/merges + special tokens.

    Mirrors the `Tokenizer` trait surface (token/mod.rs:4-11).
    """

    sot_token = 49406
    eot_token = 49407
    pad_token = 49407  # overridden by OpenClipTokenizer

    def __init__(
        self,
        merges: Sequence[Tuple[str, str]],
        vocab: Sequence[str],
        cache_specials: bool,
    ):
        b2u = bytes_to_unicode()
        self.byte_encoder = b2u
        self.byte_decoder = {v: k for k, v in b2u.items()}
        self.encoder: Dict[str, int] = {w: i for i, w in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: w for w, i in self.encoder.items()}
        self.bpe_ranks: Dict[Tuple[str, str], int] = {
            pair: i for i, pair in enumerate(merges)
        }
        # CLIP pre-seeds the cache so the special tokens encode to themselves
        # (clip.rs:105-108); OpenCLIP does not (open_clip.rs:99).
        self._cache: Dict[str, str] = (
            {SOT_TEXT: SOT_TEXT, EOT_TEXT: EOT_TEXT} if cache_specials else {}
        )
        # native (C++) merge core; None falls back to the Python loop below
        from .native import try_native_bpe

        self._native = try_native_bpe(merges)
        # textual-inversion trigger words -> pseudo-token id lists; ids live
        # above the vocab (>= len(encoder)) and index appended embedding rows
        self._custom: Dict[str, List[int]] = {}
        self._custom_re = None

    @property
    def n_base_vocab(self) -> int:
        return len(self.encoder)

    def register_custom_token(self, word: str, n_vectors: int) -> List[int]:
        """Register a textual-inversion trigger word mapping to n_vectors
        consecutive pseudo-token ids (allocated above the base vocab, in
        registration order). Returns the ids. Idempotent per word.

        Capability extension; the reference tokenizer (token/clip.rs) has a
        fixed vocabulary."""
        import re as _re

        key = _whitespace_clean(word.strip()).lower()
        if not key:
            raise ValueError("empty textual-inversion trigger word")
        if key in self._custom:
            return self._custom[key]
        next_id = len(self.encoder) + sum(len(v) for v in self._custom.values())
        ids = list(range(next_id, next_id + int(n_vectors)))
        self._custom[key] = ids
        pat = "|".join(
            _re.escape(w)
            for w in sorted(self._custom, key=len, reverse=True)
        )
        # match only at word boundaries of the cleaned lowercase text
        self._custom_re = _re.compile(rf"(?<!\w)(?:{pat})(?!\w)")
        return ids

    def bpe(self, token: str) -> str:
        cached = self._cache.get(token)
        if cached is not None:
            return cached

        if self._native is not None:
            out = self._native.apply(token)
            self._cache[token] = out
            return out

        word: List[str] = list(token)
        if word:
            word[-1] = word[-1] + "</w>"
        if len(word) < 2:
            return token + "</w>"

        while True:
            pairs = set(zip(word[:-1], word[1:]))
            ranked = [p for p in pairs if p in self.bpe_ranks]
            if not ranked:
                break
            first, second = min(ranked, key=lambda p: self.bpe_ranks[p])

            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = new_word
            if len(word) == 1:
                break

        out = " ".join(word)
        self._cache[token] = out
        return out

    def _encode_fragment(self, fragment: str, out: List[int]) -> None:
        enc = self.byte_encoder
        for m in _PAT.finditer(fragment):
            mapped = "".join(enc[b] for b in m.group(0).encode("utf-8"))
            out.extend(self.encoder[piece] for piece in self.bpe(mapped).split(" "))

    def encode(self, text: str, add_sot: bool = True, add_eot: bool = True) -> List[int]:
        cleaned = _whitespace_clean(text.strip()).lower()

        tokens: List[int] = []
        if add_sot:
            tokens.append(self.sot_token)
        if self._custom_re is None:
            self._encode_fragment(cleaned, tokens)
        else:
            pos = 0
            for m in self._custom_re.finditer(cleaned):
                self._encode_fragment(cleaned[pos:m.start()], tokens)
                tokens.extend(self._custom[m.group(0)])
                pos = m.end()
            self._encode_fragment(cleaned[pos:], tokens)
        if add_eot:
            tokens.append(self.eot_token)
        return tokens

    def decode(self, tokens: Sequence[int]) -> str:
        # custom (textual-inversion) ids have no text form; drop them
        text = "".join(self.decoder.get(t, "") for t in tokens)
        raw = bytes(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


class ClipTokenizer(Tokenizer):
    """OpenAI-CLIP tokenizer (ViT-L text tower); pad = EOT (clip.rs:227-229)."""

    def __init__(self, data_dir: str | None = None):
        root = _resolve_data_dir(data_dir)
        if root is not None and os.path.isfile(
            os.path.join(root, "clip", "bpe_simple_vocab_16e6.txt")
        ):
            merges = _load_merge_lines(
                os.path.join(root, "clip", "bpe_simple_vocab_16e6.txt")
            )
            # Reference slices off the header line and the tail beyond the
            # vocab budget: merges[1 .. 49152-256-2+1] (clip.rs:98).
            merges = merges[1 : 49152 - 256 - 2 + 1]
        else:
            merges = vendored_merges()
        super().__init__(merges, derive_vocab(merges), cache_specials=True)

    pad_token = 49407


class OpenClipTokenizer(Tokenizer):
    """OpenCLIP (ViT-bigG text tower) tokenizer; pad = 0 (open_clip.rs:218-220)."""

    pad_token = 0

    def __init__(self, data_dir: str | None = None):
        root = _resolve_data_dir(data_dir)
        if root is not None and os.path.isfile(
            os.path.join(root, "open_clip", "merges.txt")
        ):
            merges = _load_merge_lines(os.path.join(root, "open_clip", "merges.txt"))
            with open(
                os.path.join(root, "open_clip", "vocab.txt"), "r", encoding="utf-8"
            ) as f:
                vocab = [line.rstrip("\n") for line in f]
        else:
            merges = vendored_merges()
            vocab = derive_vocab(merges)
        super().__init__(merges, vocab, cache_specials=False)


def tokenize_text(text: str, tokenizer: Tokenizer, seq_len: int = 77) -> List[int]:
    """Encode with SOT/EOT then pad/truncate to seq_len.

    Matches tokenize_text (stablediffusion/mod.rs:785-801): Vec::resize pads
    with the tokenizer's padding token AND truncates over-long prompts.
    """
    ids = tokenizer.encode(text, add_sot=True, add_eot=True)
    if len(ids) < seq_len:
        ids = ids + [tokenizer.pad_token] * (seq_len - len(ids))
    return ids[:seq_len]
