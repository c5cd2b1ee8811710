"""Continuous-batching serving engine for the GPT-3 decoder.

The reference serves generation with a per-sample python loop over
``text_decoder.generate`` (reference: models/distributed_gpt3.py:800,
modeling_distributed_gpt3.py:1620-1741) — one sequence at a time, one
device dispatch per token.  This engine is the TPU-native serving design:

- a fixed pool of **slots** shares one static-shape KV cache
  ([L, num_slots, n, max_len, d]); every slot sits at its own sequence
  length (per-sample ``cache_len`` — models/gpt3.py decode path),
- **prefill** and **decode** are separate compiled programs: prefill runs
  one request's front-padded prompt (+ optional visual query prefix) into
  its slot's cache slice; decode advances ALL active slots one token in a
  single fused step,
- requests are admitted whenever a slot is free — new work joins the
  running batch between decode steps (continuous batching), so short
  requests never wait for long ones to drain,
- prompt widths are padded to a small set of **buckets** so the number of
  compiled prefill programs is bounded.

Everything device-side is jitted with donated caches; the host scheduler
only moves token ids and bookkeeping.
"""

from __future__ import annotations

import collections
import dataclasses
import itertools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.models.generation import (
    GenerationConfig,
    _build_prefix,
    _variables,
    top_k_top_p_filter,
)
from youku_mplug_tpu.models.gpt3 import GPT3LM


@dataclasses.dataclass
class _Slot:
    rid: int
    prompt_len: int
    max_new: int
    tokens: List[int]
    done: bool = False


@dataclasses.dataclass
class FinishedRequest:
    rid: int
    tokens: List[int]


class ServingEngine:
    """Slot-based continuous batching over a shared static KV cache.

    Usage::

        eng = ServingEngine(model, params, num_slots=8, max_len=256)
        rid = eng.submit([12, 7, 91], query_embeds=None)
        for fin in eng.run_to_completion():
            print(fin.rid, fin.tokens)
    """

    def __init__(self, model: GPT3LM, params, *, num_slots: int = 8,
                 max_len: int = 256,
                 prefill_buckets: Sequence[int] = (8, 16, 32, 64),
                 config: GenerationConfig = GenerationConfig(),
                 rng: Optional[jax.Array] = None):
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.buckets = tuple(sorted(prefill_buckets))
        self.config = config
        self._rng = rng if rng is not None else jax.random.key(0)

        self.cache = model.apply(_variables(params), num_slots, max_len,
                                 method=type(model).init_cache)
        self.cache_len = np.zeros((num_slots,), np.int32)
        self.valid_from = np.zeros((num_slots,), np.int32)
        self.pos_offset = np.zeros((num_slots,), np.int32)
        self.last_token = np.full((num_slots,), config.pad_id, np.int32)

        self._slots: List[Optional[_Slot]] = [None] * num_slots
        self._queue: collections.deque = collections.deque()
        self._rid = itertools.count()

        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(0,))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(0,))
        self._decode_many: Dict[int, Any] = {}
        self._verify: Dict[int, Any] = {}
        # per-slot token history (prompt + committed tokens) for
        # prompt-lookup speculation (step_lookup); plain numpy, host-side
        self._hist: List[List[int]] = [[] for _ in range(num_slots)]

    def _decode_many_fn(self, k: int):
        """One compiled multi-step program per k (bounded by the caller's
        steps_per_dispatch choice, like prefill buckets)."""
        if k not in self._decode_many:
            import functools

            self._decode_many[k] = jax.jit(
                functools.partial(self._decode_many_impl, k),
                donate_argnums=(0,))
        return self._decode_many[k]

    # ------------------------------------------------------------------
    # device programs
    # ------------------------------------------------------------------

    def _pick(self, logits, rng):
        cfg = self.config
        logits = logits.astype(jnp.float32) / cfg.temperature
        if not cfg.do_sample:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits = top_k_top_p_filter(logits, cfg.top_k, cfg.top_p)
        return jax.random.categorical(rng, logits).astype(jnp.int32)

    def _prefill_impl(self, cache, slot, prompt_ids, prompt_len,
                      query_embeds, rng, prompt_embeds=None):
        """Run one request's prompt into its slot's cache slice.

        prompt_ids [1, P] right-padded; prompt_len [1]; query_embeds
        [1, nq, H] or None; prompt_embeds [1, P, H] or None (pre-built
        prompt embeddings, e.g. video query features spliced at media
        positions — the mPLUG-Owl instruct path).  Returns
        (cache, first_token, valid_from).
        """
        model, params = self.model, self.params
        sub = jax.tree.map(
            lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, axis=1),
            cache)
        embeds, valid_from, pos_offset = _build_prefix(
            model, params, prompt_ids, prompt_len, query_embeds,
            self.config.pad_id, prompt_embeds)
        logits, sub = model.apply(
            _variables(params), embeds, sub, jnp.int32(0), valid_from,
            pos_offset, method=type(model).decode_step)
        cache = jax.tree.map(
            lambda c, s_: jax.lax.dynamic_update_slice_in_dim(
                c, s_.astype(c.dtype), slot, axis=1),
            cache, sub)
        first = self._pick(logits, rng)
        return cache, first[0], valid_from[0]

    def _decode_impl(self, cache, cache_len, valid_from, pos_offset,
                     last_token, rng):
        """One token step for every slot (inactive slots compute too —
        static shapes — and are ignored host-side; their repeated write
        lands at a masked position and is overwritten on slot reuse)."""
        model, params = self.model, self.params
        emb = model.apply(_variables(params), last_token[:, None],
                          method=type(model).embed)
        logits, cache = model.apply(
            _variables(params), emb, cache, cache_len, valid_from,
            pos_offset, method=type(model).decode_step)
        return cache, self._pick(logits, rng)

    def _decode_many_impl(self, k, cache, cache_len, valid_from,
                          pos_offset, last_token, rng):
        """``k`` decode steps in ONE dispatch via lax.scan (multi-step
        scheduling): the host syncs once per k tokens instead of per
        token.  Slots that hit EOS mid-scan keep computing dead tokens —
        static shapes — which the host trims; admission only happens
        between dispatches, so k trades a little batch-join latency for
        k× fewer host round-trips.  The reference's per-sample,
        per-token ``generate`` loop has no analog
        (modeling_distributed_gpt3.py:1620-1741)."""
        model, params = self.model, self.params

        def body(carry, rng_step):
            cache, cache_len, last = carry
            emb = model.apply(_variables(params), last[:, None],
                              method=type(model).embed)
            logits, cache = model.apply(
                _variables(params), emb, cache, cache_len, valid_from,
                pos_offset, method=type(model).decode_step)
            nxt = self._pick(logits, rng_step)
            return (cache, cache_len + 1, nxt), nxt

        (cache, _, _), toks = jax.lax.scan(
            body, (cache, cache_len, last_token), jax.random.split(rng, k))
        return cache, toks  # toks: [k, num_slots]

    def _verify_fn(self, k: int):
        """One compiled chunk-verify program per speculate length."""
        if k not in self._verify:
            import functools

            self._verify[k] = jax.jit(
                functools.partial(self._verify_impl, k),
                donate_argnums=(0,))
        return self._verify[k]

    def _verify_impl(self, k, cache, cache_len, valid_from, pos_offset,
                     last_token, drafts):
        """Greedy chunk verification for prompt-lookup speculation: feed
        [last, d_0..d_{k-1}] per slot in ONE decode_step, return the
        target's greedy choice at every position.  Rows written for
        rejected proposals land past the host-advanced cache_len and are
        masked/overwritten — the engine's standard partial-write
        contract."""
        model, params = self.model, self.params
        chunk = jnp.concatenate([last_token[:, None], drafts], axis=1)
        emb = model.apply(_variables(params), chunk, method=type(model).embed)
        logits, cache = model.apply(
            _variables(params), emb, cache, cache_len, valid_from,
            pos_offset, True, method=type(model).decode_step)
        greedy = jnp.argmax(logits.astype(jnp.float32),
                            -1).astype(jnp.int32)       # [B, k+1]
        return cache, greedy

    @staticmethod
    def _lookup_propose(hist: List[int], n: int, k: int) -> List[int]:
        """Host-side prompt lookup: continuation of the most recent
        earlier occurrence of the trailing n-gram; falls back to
        repeating the tail (proposal quality only, never correctness)."""
        L = len(hist)
        if L >= n + 1:
            sfx = hist[L - n:]
            # scan candidates right-to-left, most recent match first
            for m in range(L - 2, n - 2, -1):
                if hist[m - n + 1:m + 1] == sfx:
                    out = hist[m + 1:m + 1 + k]
                    if out:
                        return (out + out[-1:] * k)[:k]
                    break
        tail = hist[-k:] if hist else [0]
        return (tail + tail[-1:] * k)[:k]

    # ------------------------------------------------------------------
    # host scheduler
    # ------------------------------------------------------------------

    def submit(self, prompt_ids: Sequence[int],
               query_embeds: Optional[jax.Array] = None,
               max_new_tokens: Optional[int] = None,
               prompt_embeds: Optional[jax.Array] = None) -> int:
        """Enqueue a request. prompt_ids: true tokens (no padding);
        query_embeds: optional [nq, H] visual prefix; prompt_embeds:
        optional [len(prompt_ids), H] pre-built prompt embeddings that
        REPLACE the token-embedding lookup (media features already
        spliced in — the Owl instruct path).  Returns request id."""
        if prompt_embeds is not None:
            assert prompt_embeds.shape[0] == len(prompt_ids), (
                "prompt_embeds rows must match prompt_ids length")
        rid = next(self._rid)
        self._queue.append((rid, list(prompt_ids), query_embeds,
                            max_new_tokens or self.config.max_new_tokens,
                            prompt_embeds))
        return rid

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds largest bucket "
                         f"{self.buckets[-1]}")

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _admit(self):
        for slot in range(self.num_slots):
            if self._slots[slot] is not None or not self._queue:
                continue
            rid, ids, qe, max_new, pe = self._queue.popleft()
            p = self._bucket(len(ids))
            nq = 0 if qe is None else qe.shape[0]
            padded = np.full((1, p), self.config.pad_id, np.int32)
            padded[0, :len(ids)] = ids
            qe_dev = None if qe is None else jnp.asarray(qe)[None]
            pe_dev = None
            if pe is not None:
                # right-pad to the bucket width; _build_prefix right-
                # aligns by the true length and zero-masks the padding
                pe = np.asarray(pe)
                pe_dev = np.zeros((1, p, pe.shape[-1]), pe.dtype)
                pe_dev[0, :len(ids)] = pe
                pe_dev = jnp.asarray(pe_dev)
            self.cache, first, vf = self._prefill(
                self.cache, jnp.int32(slot), jnp.asarray(padded),
                jnp.asarray([len(ids)], jnp.int32), qe_dev,
                self._next_rng(), pe_dev)
            first = int(first)
            self.cache_len[slot] = nq + p
            self.valid_from[slot] = int(vf)
            self.pos_offset[slot] = int(vf)
            self.last_token[slot] = first
            st = _Slot(rid=rid, prompt_len=len(ids), max_new=max_new,
                       tokens=[first])
            st.done = (first == self.config.eos_id or max_new <= 1)
            self._slots[slot] = st
            self._hist[slot] = list(ids) + [first]

    def step(self) -> List[FinishedRequest]:
        """Admit pending requests, run ONE decode step for all slots, and
        return any requests that finished this step."""
        self._admit()
        finished: List[FinishedRequest] = []
        # harvest slots that finished at prefill time (eos first token)
        for slot, st in enumerate(self._slots):
            if st is not None and st.done:
                finished.append(self._finish(slot))
        if not any(self._slots) or all(s is None for s in self._slots):
            return finished

        self.cache, nxt = self._decode(
            self.cache, jnp.asarray(self.cache_len),
            jnp.asarray(self.valid_from), jnp.asarray(self.pos_offset),
            jnp.asarray(self.last_token), self._next_rng())
        nxt = np.asarray(nxt)
        for slot, st in enumerate(self._slots):
            if st is None:
                continue
            tok = int(nxt[slot])
            st.tokens.append(tok)
            self._hist[slot].append(tok)
            self.cache_len[slot] += 1
            self.last_token[slot] = tok
            if (tok == self.config.eos_id
                    or len(st.tokens) >= st.max_new
                    or int(self.cache_len[slot]) >= self.max_len - 1):
                finished.append(self._finish(slot))
        return finished

    def step_many(self, k: int) -> List[FinishedRequest]:
        """Like :meth:`step`, but advances all slots up to ``k`` tokens in
        ONE device dispatch (multi-step scheduling).  k is clamped so no
        slot can overrun the static cache; tokens past a slot's EOS /
        max_new are trimmed host-side."""
        if k <= 1:
            return self.step()
        self._admit()
        finished: List[FinishedRequest] = []
        for slot, st in enumerate(self._slots):
            if st is not None and st.done:
                finished.append(self._finish(slot))
        if all(s is None for s in self._slots):
            return finished

        longest = max(int(self.cache_len[s])
                      for s, st in enumerate(self._slots) if st is not None)
        k_eff = max(1, min(k, self.max_len - 1 - longest))
        self.cache, toks = self._decode_many_fn(k_eff)(
            self.cache, jnp.asarray(self.cache_len),
            jnp.asarray(self.valid_from), jnp.asarray(self.pos_offset),
            jnp.asarray(self.last_token), self._next_rng())
        toks = np.asarray(toks)
        for slot, st in enumerate(self._slots):
            if st is None:
                continue
            for j in range(k_eff):
                tok = int(toks[j, slot])
                st.tokens.append(tok)
                self._hist[slot].append(tok)
                self.cache_len[slot] += 1
                self.last_token[slot] = tok
                if (tok == self.config.eos_id
                        or len(st.tokens) >= st.max_new
                        or int(self.cache_len[slot]) >= self.max_len - 1):
                    finished.append(self._finish(slot))
                    break
        return finished

    def step_lookup(self, k: int, ngram: int = 2) -> List[FinishedRequest]:
        """Continuous batching + prompt-lookup speculation: every active
        slot proposes k tokens from its own history (host-side n-gram
        lookup, zero model cost) and ONE chunked verify program commits
        the agreeing prefix plus one target token — 1..k+1 tokens per
        slot per dispatch, still exactly the greedy output (``step``
        and ``step_lookup`` produce identical tokens — tested).

        Greedy-only (speculation with sampling needs the rejection
        scheme — use serving/speculative.py lock-step for that)."""
        if self.config.do_sample:
            raise ValueError("step_lookup is greedy-only")
        self._admit()
        finished: List[FinishedRequest] = []
        for slot, st in enumerate(self._slots):
            if st is not None and st.done:
                finished.append(self._finish(slot))
        if all(s is None for s in self._slots):
            return finished

        # clamp so no slot's k+1 chunk can overrun the static cache
        longest = max(int(self.cache_len[s])
                      for s, st in enumerate(self._slots) if st is not None)
        k_eff = max(1, min(k, self.max_len - 2 - longest))
        drafts = np.zeros((self.num_slots, k_eff), np.int32)
        for slot, st in enumerate(self._slots):
            if st is not None:
                drafts[slot] = self._lookup_propose(self._hist[slot],
                                                    ngram, k_eff)
        self.cache, greedy = self._verify_fn(k_eff)(
            self.cache, jnp.asarray(self.cache_len),
            jnp.asarray(self.valid_from), jnp.asarray(self.pos_offset),
            jnp.asarray(self.last_token), jnp.asarray(drafts))
        greedy = np.asarray(greedy)                     # [B, k_eff+1]
        for slot, st in enumerate(self._slots):
            if st is None:
                continue
            a = 0
            while a < k_eff and drafts[slot, a] == greedy[slot, a]:
                a += 1
            commit = list(drafts[slot, :a]) + [int(greedy[slot, a])]
            for tok in commit:
                st.tokens.append(tok)
                self._hist[slot].append(tok)
                self.cache_len[slot] += 1
                self.last_token[slot] = tok
                if (tok == self.config.eos_id
                        or len(st.tokens) >= st.max_new
                        or int(self.cache_len[slot]) >= self.max_len - 1):
                    finished.append(self._finish(slot))
                    break
        return finished

    def _finish(self, slot: int) -> FinishedRequest:
        st = self._slots[slot]
        self._slots[slot] = None
        toks = st.tokens
        if self.config.eos_id in toks:
            toks = toks[:toks.index(self.config.eos_id)]
        return FinishedRequest(rid=st.rid, tokens=toks)

    @property
    def idle(self) -> bool:
        return not self._queue and all(s is None for s in self._slots)

    def run_to_completion(self, max_steps: int = 100000,
                          steps_per_dispatch: int = 1,
                          lookup_k: int = 0, ngram: int = 2
                          ) -> List[FinishedRequest]:
        """Drain the engine.  lookup_k > 0 uses prompt-lookup speculative
        steps (``step_lookup``); otherwise plain (multi-)step decode."""
        out: List[FinishedRequest] = []
        for _ in range(max_steps):
            if self.idle:
                break
            if lookup_k > 0:
                out.extend(self.step_lookup(lookup_k, ngram))
            else:
                out.extend(self.step_many(steps_per_dispatch))
        return out
