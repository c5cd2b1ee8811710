"""Chinese GPT-3 tokenization: jieba pre-segmentation + BPE.

Same contract as the reference tokenizer stack (reference:
modeling_distributed_gpt3.py — JiebaBPETokenizer:43-137,
DistributedGPT3Tokenizer:180-319): ``<sep>`` is BOS, ``<|endoftext|>`` is
EOS/PAD, prompt-aware truncation that preserves the target text and returns
``prompt_lengths`` for loss masking.

TPU-first deviation: batch padding defaults to ``max_length`` (static
shapes — one jit compilation) instead of ``longest``.

A hash-based :class:`ToyTokenizer` with the same interface backs tests and
synthetic runs where the ModelScope-trained BPE json is unavailable.
"""

from __future__ import annotations

import os.path as osp
from typing import Any, List, Optional, Sequence, Union

import numpy as np


class JiebaBPETokenizer:
    """jieba word-cut pre-segmentation feeding a HF `tokenizers` BPE."""

    def __init__(self, tokenizer_json_file: str):
        from tokenizers import Tokenizer

        self.tokenizer = Tokenizer.from_file(tokenizer_json_file)
        import logging

        import jieba

        jieba.setLogLevel(logging.INFO)
        self.jieba = jieba
        vocab = self.tokenizer.get_vocab(with_added_tokens=True)
        self.eod_id = vocab["<|endoftext|>"]
        self.bos_id = vocab["<sep>"]
        self.pad_id = self.eod_id
        self.eos_id = self.eod_id

    @property
    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size(with_added_tokens=True)

    def _bpe(self, text: str) -> List[int]:
        seg = [x for x in self.jieba.cut(text)]
        return self.tokenizer.encode(
            seg, is_pretokenized=True, add_special_tokens=True).ids

    def tokenize(self, text: str, add_special_tokens: bool = True):
        ids = self._bpe(text)
        if add_special_tokens:
            ids = [self.bos_id] + ids + [self.eos_id]
        return ids

    def tokenize_prompt(self, prompt_text: str, text: str):
        """Returns the 4 segments [bos, prompt, text, eos] so truncation can
        treat the prompt and target differently."""
        return ([self.bos_id], self._bpe(prompt_text), self._bpe(text),
                [self.eos_id])

    def detokenize(self, token_ids) -> str:
        token_ids = [int(t) for t in token_ids]
        return self.tokenizer.decode(token_ids, skip_special_tokens=True)

    # convenience aliases matching the reference property surface
    eod = property(lambda self: self.eod_id)
    eos = property(lambda self: self.eos_id)
    bos = property(lambda self: self.bos_id)
    pad = property(lambda self: self.pad_id)


class ToyTokenizer:
    """Deterministic hash tokenizer with the JiebaBPE interface — for tests
    and synthetic-data runs (no trained vocab required)."""

    def __init__(self, vocab_size: int = 25600):
        self._vocab_size = vocab_size
        self.bos_id = 1
        self.eos_id = 2
        self.pad_id = 2
        self.eod_id = 2

    @property
    def vocab_size(self) -> int:
        return self._vocab_size

    def _ids(self, text: str) -> List[int]:
        return [3 + (ord(c) * 2654435761) % (self._vocab_size - 3)
                for c in text]

    def tokenize(self, text: str, add_special_tokens: bool = True):
        ids = self._ids(text)
        if add_special_tokens:
            ids = [self.bos_id] + ids + [self.eos_id]
        return ids

    def tokenize_prompt(self, prompt_text: str, text: str):
        return ([self.bos_id], self._ids(prompt_text), self._ids(text),
                [self.eos_id])

    def detokenize(self, token_ids) -> str:
        return " ".join(str(int(t)) for t in token_ids
                        if int(t) not in (self.bos_id, self.eos_id))

    eod = property(lambda self: self.eod_id)
    eos = property(lambda self: self.eos_id)
    bos = property(lambda self: self.bos_id)
    pad = property(lambda self: self.pad_id)


class BatchTokenizer:
    """Batch pad/truncate with prompt-length tracking (reference
    DistributedGPT3Tokenizer:180-319).  Returns numpy int32 arrays."""

    def __init__(self, tokenizer, max_length: int = 128):
        self.tokenizer = tokenizer
        self.max_length = max_length

    @classmethod
    def from_model_dir(cls, model_dir: str, max_length: int = 128):
        return cls(JiebaBPETokenizer(osp.join(model_dir, "tokenizer.json")),
                   max_length)

    def decode(self, tokens, **kw) -> str:
        tokens = np.asarray(tokens).reshape(-1).tolist()
        return self.tokenizer.detokenize(tokens)

    def _pad(self, ids: Sequence[int], max_length: int):
        ids = list(ids)[:max_length]
        out_len = len(ids)
        ids = ids + [self.tokenizer.pad_id] * (max_length - out_len)
        return ids, out_len

    def _truncate_prompt(self, segs, max_length: int):
        bos, prompt, text, eos = [list(s) for s in segs]
        total = len(bos) + len(prompt) + len(text) + len(eos)
        if total <= max_length:
            return bos + prompt + text + eos, len(prompt), total
        # same priority as the reference: shorten the prompt first, the
        # target only as a last resort (_truncate_prompt:209-233)
        room = max_length - len(text) - 2
        if room >= 0 and len(prompt) >= room:
            prompt = prompt[:room]
        else:
            text = text[:max_length - 2 - len(prompt)]
        ids = bos + prompt + text + eos
        return ids, len(prompt), len(ids)

    def __call__(self, data, padding: str = "max_length",
                 max_length: Optional[int] = None, **kw):
        max_length = max_length or self.max_length
        if isinstance(data, str):
            data = [data]
        if isinstance(data[0], str):
            toks = [self.tokenizer.tokenize(t) for t in data]
            if padding == "longest":
                max_length = min(max(len(t) for t in toks), max_length)
            ids, mask = [], []
            for t in toks:
                out, n = self._pad(t, max_length)
                ids.append(out)
                m = np.zeros(max_length, np.int32)
                m[:n] = 1
                mask.append(m)
            return {
                "input_ids": np.asarray(ids, np.int32),
                "attention_mask": np.stack(mask),
            }
        # (prompt, text) pairs
        ids, mask, plens = [], [], []
        for prompt_text, text in data:
            segs = self.tokenizer.tokenize_prompt(prompt_text, text)
            flat, plen, n = self._truncate_prompt(segs, max_length)
            out, n = self._pad(flat, max_length)
            ids.append(out)
            m = np.zeros(max_length, np.int32)
            m[:n] = 1
            mask.append(m)
            plens.append(plen)
        return {
            "input_ids": np.asarray(ids, np.int32),
            "attention_mask": np.stack(mask),
            "prompt_lengths": np.asarray(plens, np.int32),
        }


class BertWordPieceTokenizer:
    """BERT WordPiece tokenization for the mPLUG/ALPRO families (reference:
    models/tokenization_bert.py / tokenization_mplug.py).  Loads a
    vocab.txt via HF `tokenizers`; [CLS] starts, [SEP] ends, [PAD]=0."""

    def __init__(self, vocab_file: str, lowercase: bool = True):
        from tokenizers import BertWordPieceTokenizer as _HF

        self.tokenizer = _HF(vocab_file, lowercase=lowercase)
        vocab = self.tokenizer.get_vocab()
        self.pad_id = vocab.get("[PAD]", 0)
        self.bos_id = vocab.get("[CLS]", 101)
        self.eos_id = vocab.get("[SEP]", 102)
        self.mask_id = vocab.get("[MASK]", 103)
        self.eod_id = self.eos_id

    @property
    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size()

    def tokenize(self, text: str, add_special_tokens: bool = True):
        enc = self.tokenizer.encode(text,
                                    add_special_tokens=add_special_tokens)
        return enc.ids

    def tokenize_prompt(self, prompt_text: str, text: str):
        p = self.tokenizer.encode(prompt_text, add_special_tokens=False).ids
        t = self.tokenizer.encode(text, add_special_tokens=False).ids
        return ([self.bos_id], p, t, [self.eos_id])

    def detokenize(self, token_ids) -> str:
        return self.tokenizer.decode([int(t) for t in token_ids],
                                     skip_special_tokens=True)

    eod = property(lambda self: self.eod_id)
    eos = property(lambda self: self.eos_id)
    bos = property(lambda self: self.bos_id)
    pad = property(lambda self: self.pad_id)


class ToyBertTokenizer(ToyTokenizer):
    """Toy tokenizer with BERT special-token conventions ([PAD]=0,
    [CLS]=101, [SEP]=102, [MASK]=103) for synthetic mPLUG/ALPRO runs."""

    def __init__(self, vocab_size: int = 30522):
        super().__init__(vocab_size)
        self.pad_id = 0
        self.bos_id = 101
        self.eos_id = 102
        self.mask_id = 103
        self.eod_id = 102

    def _ids(self, text: str):
        return [104 + (ord(c) * 2654435761) % (self._vocab_size - 104)
                for c in text]
