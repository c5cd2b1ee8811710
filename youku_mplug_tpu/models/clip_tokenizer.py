"""CLIP BPE text tokenizer (the ``simple_tokenizer`` contract).

From-scratch implementation of the published CLIP byte-level BPE
(reference models/clip/simple_tokenizer.py:62 SimpleTokenizer,
models/clip/clip.py:195-236 tokenize): lowercase + whitespace-collapse
cleaning, the contraction/letters/digits/other regex split, byte-to-
printable-unicode remapping, lowest-rank-first pair merging with the
``</w>`` end-of-word marker, and the fixed 49,408-entry vocab built as
[256 bytes ; 256 bytes+</w> ; 48,894 merges ; <|startoftext|> ;
<|endoftext|>].  ``tokenize()`` produces the 77-token context rows CLIP
text towers consume (models/clip.py CLIPTextTower).

The merge table is DATA shipped with every public CLIP release, not
code — it loads from ``bpe_path``, the ``CLIP_BPE_PATH`` env var, or
the conventional install locations, in either format: the original
``bpe_simple_vocab_16e6.txt.gz`` or an HF checkpoint's ``merges.txt``
(pass the file or the checkpoint directory).  It is deliberately not
vendored in this repo.

Divergence note: the published cleaner runs ``ftfy.fix_text``
(mojibake repair) before tokenizing; ftfy is optional here — absent,
well-formed text tokenizes identically (golden-tested against the
reference tokenizer), only broken-encoding inputs would differ.
"""

from __future__ import annotations

import gzip
import html
import os
from functools import lru_cache
from typing import Iterable, List, Sequence, Union

import numpy as np

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"
CONTEXT_LENGTH = 77
# 49,408 total vocab minus 512 byte forms and the 2 specials ->
# 48,894 merge rows used from the published file
_NUM_MERGES = 49408 - 512 - 2

_VOCAB_SEARCH = (
    "bpe_simple_vocab_16e6.txt.gz",
    os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz"),
)


def find_bpe_vocab(bpe_path: str = "") -> str:
    """Resolve the merge-table path: explicit arg > $CLIP_BPE_PATH >
    conventional locations."""
    candidates = ([bpe_path] if bpe_path else []) + \
        ([os.environ["CLIP_BPE_PATH"]] if "CLIP_BPE_PATH" in os.environ
         else []) + list(_VOCAB_SEARCH)
    for c in candidates:
        if c and os.path.exists(c):
            return c
    raise FileNotFoundError(
        "CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz) not found; pass "
        "bpe_path= or set CLIP_BPE_PATH (the file ships with every "
        "public CLIP release)")


@lru_cache()
def byte_unicode_table() -> dict:
    """utf-8 byte -> printable unicode char, the GPT-2/CLIP remapping:
    printable ranges map to themselves, the rest to 0x100+.  Insertion
    order (printable ranges first, then the remapped bytes) IS the
    vocab id order — it must match the published table exactly."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(ord("¡"), ord("¬") + 1))
            + list(range(ord("®"), ord("ÿ") + 1)))
    table = {b: chr(b) for b in keep}
    bump = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + bump)
            bump += 1
    return table


def _clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return " ".join(text.split()).strip().lower()


def _adjacent_pairs(word: Sequence[str]):
    return set(zip(word[:-1], word[1:]))


class CLIPTokenizer:
    """Byte-level BPE with the CLIP vocab layout and merge order."""

    def __init__(self, bpe_path: str = ""):
        import regex

        path = find_bpe_vocab(bpe_path)
        if os.path.isdir(path):  # HF checkpoint dir: merges.txt
            path = os.path.join(path, "merges.txt")
        if path.endswith(".gz"):
            text = gzip.open(path).read().decode("utf-8")
        else:  # HF merges.txt — same rows, same "#version" header
            text = open(path, encoding="utf-8").read()
        rows = text.split("\n")
        # both formats carry a "#version" header row (the gz prefixes it
        # with the filename); a headerless table gets a pad row so the
        # merge slice offsets stay identical
        if "#version" not in rows[0]:
            rows = [""] + rows
        # exact positional slice — every row in range occupies a vocab
        # slot even if it splits oddly (the published table's contract)
        merges = [tuple(r.split()) for r in rows[1:_NUM_MERGES + 1]]
        if len(merges) != _NUM_MERGES:
            raise ValueError(
                f"{path}: expected {_NUM_MERGES} merge rows, got "
                f"{len(merges)} — not a CLIP merge table")
        self.rank = {m: i for i, m in enumerate(merges)}
        self.byte_enc = byte_unicode_table()
        self.byte_dec = {c: b for b, c in self.byte_enc.items()}

        base = list(byte_unicode_table().values())
        vocab = (base + [c + "</w>" for c in base]
                 + ["".join(m) for m in merges] + [SOT, EOT])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        self._cache = {SOT: SOT, EOT: EOT}
        self._pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", regex.IGNORECASE)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _merge_word(self, token: str) -> str:
        """Apply merges lowest-rank-first until none apply; the final
        symbol carries the </w> marker."""
        if token in self._cache:
            return self._cache[token]
        word: tuple = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            return word[0]
        pairs = _adjacent_pairs(word)
        while pairs:
            best = min(pairs, key=lambda p: self.rank.get(p, 1 << 60))
            if best not in self.rank:
                break
            a, b = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (word[i] == a and i + 1 < len(word)
                        and word[i + 1] == b):
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
            if len(word) == 1:
                break
            pairs = _adjacent_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece in self._pat.findall(_clean(text)):
            mapped = "".join(self.byte_enc[b]
                             for b in piece.encode("utf-8"))
            ids.extend(self.encoder[t]
                       for t in self._merge_word(mapped).split(" "))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self.byte_dec[c] for c in text
                        if c in self.byte_dec)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")


@lru_cache()
def _default_tokenizer(bpe_path: str = "") -> CLIPTokenizer:
    return CLIPTokenizer(bpe_path)


def tokenize(texts: Union[str, Sequence[str]],
             context_length: int = CONTEXT_LENGTH,
             truncate: bool = False, bpe_path: str = "") -> np.ndarray:
    """[B, context_length] int32 rows ``<sot> tokens <eot> 0...`` — the
    exact clip.tokenize contract (reference models/clip/clip.py:195-236,
    including the truncate-keeps-eot behavior and the too-long error)."""
    if isinstance(texts, str):
        texts = [texts]
    tk = _default_tokenizer(bpe_path)
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        row = [tk.sot_id] + tk.encode(text) + [tk.eot_id]
        if len(row) > context_length:
            if not truncate:
                raise RuntimeError(
                    f"Input {texts[i]} is too long for context length "
                    f"{context_length}")
            row = row[:context_length - 1] + [tk.eot_id]
        out[i, :len(row)] = row
    return out
