"""Speculative greedy decoding: a small draft model proposes k tokens,
the target verifies them in ONE chunked decode_step.

TPU-native serving accelerator (no reference analog — the reference
decodes one python-loop token at a time, distributed_gpt3.py:1398-1480):
the target model's per-step cost is dominated by streaming its weights,
which is the same for a 1-token and a (k+1)-token chunk, so every
accepted draft token is nearly free.  Greedy speculative decoding is
EXACT: the committed sequence equals target-only greedy decoding for
any draft (tests pin this equality).

Mechanics per round (all inside one ``lax.while_loop``):

1. the draft autoregressively proposes ``d_0..d_{k-1}`` (k tiny steps);
2. the target runs one decode_step on ``[last, d_0..d_{k-1}]`` (k+1
   tokens), yielding its greedy choice ``g_i`` for every position;
3. the longest prefix with ``d_i == g_i`` (length ``a``) is committed,
   plus the target's own ``g_a`` — a+1 >= 1 tokens of progress;
4. both KV caches keep their entries for committed tokens and simply
   do not advance past them — rows written for rejected proposals sit
   beyond ``cache_len``, are masked by the attention length rule, and
   are overwritten by later rounds (the same partial-write contract the
   continuous-batching engine relies on).

Per-sample accepted counts differ, so lengths/positions are [B] arrays
throughout — exactly the decode_step contract the serving engine uses.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.generation import (
    GenerationConfig,
    _build_prefix,
    _variables,
    top_k_top_p_filter,
)
from youku_mplug_tpu.models.gpt3 import GPT3LM


def _spec_accept(rng, drafts, p_draft, p_target):
    """Rejection-sampling acceptance for ONE sample (Leviathan et al.):
    drafts [k] proposal tokens, p_draft [k, V] the draft's (filtered)
    probabilities they were sampled from, p_target [k+1, V] the target's
    (filtered) probabilities at every chunk position.

    Returns (commit [k+1], n_commit): the accepted prefix, then one
    token resampled from the residual max(p_t - p_d, 0) at the first
    rejection.  n_commit is capped at k: when every draft is accepted
    the bonus target sample is FORGONE, because committing it would
    advance the draft cache past the rows it actually wrote (the k-th
    proposal is never fed back during the proposal scan) and leave a
    zero KV row corrupting later proposals.  Accepted tokens are valid
    target samples by the scheme, so the cap costs only throughput,
    never exactness.
    """
    k = drafts.shape[0]
    r_u, r_cat = jax.random.split(rng)
    pt_d = jnp.take_along_axis(p_target[:k], drafts[:, None], 1)[:, 0]
    pd_d = jnp.take_along_axis(p_draft, drafts[:, None], 1)[:, 0]
    u = jax.random.uniform(r_u, (k,))
    accept = u * pd_d < pt_d                    # u < p_t/p_d, no div-by-0
    a = jnp.cumprod(accept.astype(jnp.int32)).sum()   # 0..k
    # residual distribution at the rejection position (p_target[k] when
    # a == k: everything accepted, bonus token is a plain target sample)
    p_t_a = p_target[jnp.minimum(a, k)]
    p_d_a = jnp.where(a < k, p_draft[jnp.minimum(a, k - 1)], 0.0)
    residual = jnp.maximum(p_t_a - p_d_a, 0.0)
    residual = residual / jnp.maximum(residual.sum(), 1e-20)
    extra = jax.random.categorical(r_cat, jnp.log(residual + 1e-20))
    idx = jnp.arange(k + 1)
    commit = jnp.where(idx < a,
                       jnp.concatenate([drafts, drafts[-1:]]),
                       extra.astype(jnp.int32))
    return commit, jnp.minimum(a + 1, k)


@functools.partial(jax.jit, static_argnums=(0, 2, 6, 7))
def speculative_generate(model: GPT3LM, params, draft_model: GPT3LM,
                         draft_params, prompt_ids, prompt_len,
                         config: GenerationConfig = GenerationConfig(),
                         speculate_len: int = 4,
                         query_embeds=None, rng=None):
    """Greedy speculative decoding.  Returns the same structure as
    ``generation.generate`` with do_sample=False, beam_size=1 — and the
    same token-for-token output.

    query_embeds (the visual prefix) feed the TARGET only; the draft
    conditions on the text prompt alone (a worse draft only lowers the
    acceptance rate, never correctness).

    config.do_sample=True runs speculative SAMPLING (rejection scheme,
    `_spec_accept`): every committed token is marginally distributed
    exactly as a plain target sample under the same
    temperature/top-k/top-p filtering.
    """
    sample = bool(config.do_sample)
    if rng is None:
        rng = jax.random.key(0)

    def t_probs(logits):
        logits = logits.astype(jnp.float32) / config.temperature
        logits = top_k_top_p_filter(logits, config.top_k, config.top_p)
        return jax.nn.softmax(logits, axis=-1)
    k = speculate_len
    b, p = prompt_ids.shape
    nq = 0 if query_embeds is None else query_embeds.shape[1]
    prefix_len = nq + p
    d_prefix_len = p
    max_new = config.max_new_tokens
    cache_len_cap = prefix_len + max_new + k + 1

    # ---- target prefill ---------------------------------------------
    embeds, valid_from, pos_offset = _build_prefix(
        model, params, prompt_ids, prompt_len, query_embeds, config.pad_id)
    t_cache = model.apply(_variables(params), b, cache_len_cap,
                          method=type(model).init_cache)
    t_logits, t_cache = model.apply(
        _variables(params), embeds, t_cache, jnp.int32(0),
        valid_from, pos_offset, method=type(model).decode_step)

    # ---- draft prefill (text prompt only) ---------------------------
    d_embeds, d_valid_from, d_pos_offset = _build_prefix(
        draft_model, draft_params, prompt_ids, prompt_len, None,
        config.pad_id)
    d_cache = draft_model.apply(_variables(draft_params), b,
                                d_prefix_len + max_new + k + 1,
                                method=type(draft_model).init_cache)
    _, d_cache = draft_model.apply(
        _variables(draft_params), d_embeds, d_cache, jnp.int32(0),
        d_valid_from, d_pos_offset, method=type(draft_model).decode_step)

    if sample:
        rng, sub = jax.random.split(rng)
        first = jax.random.categorical(
            sub, jnp.log(t_probs(t_logits) + 1e-20)).astype(jnp.int32)
    else:
        first = jnp.argmax(t_logits.astype(jnp.float32),
                           -1).astype(jnp.int32)
    seqs = jnp.full((b, max_new), config.pad_id, jnp.int32)
    seqs = seqs.at[:, 0].set(first)
    done = first == config.eos_id

    # invariant at the top of every round: `last[i]` is committed but
    # NOT yet written into either cache; cache rows < len are written
    state = dict(
        t=jnp.ones((b,), jnp.int32),                 # tokens committed
        seqs=seqs,
        t_cache=t_cache,
        d_cache=d_cache,
        t_len=jnp.full((b,), prefix_len, jnp.int32),
        d_len=jnp.full((b,), d_prefix_len, jnp.int32),
        last=first,
        done=done,
        rounds=jnp.int32(0),                         # serving telemetry
        rng=rng,
    )

    def cond(st):
        return ~jnp.all(st["done"] | (st["t"] >= max_new))

    def body(st):
        # ---- 1. draft proposes k tokens autoregressively ------------
        rng = st["rng"]

        def d_step(carry, step_rng):
            cache, length, tok = carry
            emb = draft_model.apply(_variables(draft_params),
                                    tok[:, None], method=type(draft_model).embed)
            logits, cache = draft_model.apply(
                _variables(draft_params), emb, cache, length,
                d_valid_from, d_pos_offset, method=type(draft_model).decode_step)
            if sample:
                probs = t_probs(logits)
                nxt = jax.random.categorical(
                    step_rng, jnp.log(probs + 1e-20)).astype(jnp.int32)
            else:
                probs = jnp.zeros_like(logits, jnp.float32)
                nxt = jnp.argmax(logits.astype(jnp.float32),
                                 -1).astype(jnp.int32)
            return (cache, length + 1, nxt), (nxt, probs)

        rng, d_rng = jax.random.split(rng)
        (d_cache, d_len, _), (drafts, d_probs) = jax.lax.scan(
            d_step, (st["d_cache"], st["d_len"], st["last"]),
            jax.random.split(d_rng, k))
        drafts = drafts.T                      # [B, k]
        d_probs = jnp.moveaxis(d_probs, 0, 1)  # [B, k, V]

        # ---- 2. target verifies the chunk in one step ----------------
        chunk = jnp.concatenate([st["last"][:, None], drafts], axis=1)
        emb = model.apply(_variables(params), chunk, method=type(model).embed)
        logits, t_cache = model.apply(
            _variables(params), emb, st["t_cache"], st["t_len"],
            valid_from, pos_offset, True, method=type(model).decode_step)
        idx = jnp.arange(k + 1)[None, :]
        if sample:
            rng, a_rng = jax.random.split(rng)
            commit, n_commit = jax.vmap(_spec_accept)(
                jax.random.split(a_rng, b), drafts,
                d_probs, t_probs(logits))
            accepted = n_commit - 1
        else:
            greedy = jnp.argmax(logits.astype(jnp.float32),
                                -1).astype(jnp.int32)  # [B, k+1]
            # accept the agreeing prefix + the target's correction
            agree = drafts == greedy[:, :k]                   # [B, k]
            accepted = jnp.cumprod(agree.astype(jnp.int32),
                                   axis=1).sum(axis=1)        # [B] 0..k
            # committed tokens this round: drafts[:a] then greedy[a]
            commit = jnp.where(idx < accepted[:, None],
                               jnp.concatenate(
                                   [drafts, drafts[:, -1:]], axis=1),
                               jnp.take_along_axis(
                                   greedy,
                                   jnp.minimum(accepted, k)[:, None],
                                   axis=1))                    # [B, k+1]
            # cap at k: on full acceptance the bonus g_k is forgone so
            # the draft cache never advances past its written rows (see
            # _spec_accept docstring) — d_{k-1} becomes next round's
            # `last` and is fed then
            n_commit = jnp.minimum(accepted + 1, k)            # [B]

        # eos / max_new masking: a token is real iff its slot is before
        # n_commit, the sample wasn't done, no earlier commit was eos,
        # and it fits in max_new
        prev_eos = jnp.cumsum(
            (commit == config.eos_id).astype(jnp.int32), axis=1)
        no_earlier_eos = (prev_eos - (commit == config.eos_id)) == 0
        pos = st["t"][:, None] + idx                           # [B, k+1]
        live = ((idx < n_commit[:, None]) & ~st["done"][:, None]
                & no_earlier_eos & (pos < max_new))
        n_live = live.sum(axis=1).astype(jnp.int32)            # [B]

        seqs = st["seqs"]
        for j in range(k + 1):
            tgt = jnp.clip(st["t"] + j, 0, max_new - 1)
            val = jnp.where(live[:, j], commit[:, j],
                            seqs[jnp.arange(b), tgt])
            seqs = seqs.at[jnp.arange(b), tgt].set(val)

        hit_eos = jnp.any(live & (commit == config.eos_id), axis=1)
        new_done = st["done"] | hit_eos | (st["t"] + n_live >= max_new)
        # next round's `last`: the final live committed token
        last_idx = jnp.clip(n_live - 1, 0, k)
        new_last = jnp.where(
            n_live > 0,
            jnp.take_along_axis(commit, last_idx[:, None], axis=1)[:, 0],
            st["last"])

        # cache advance: the verify chunk wrote rows for
        # [last, d_0..d_{k-1}]; rows for `last` plus the accepted drafts
        # are valid history (the tail commit g_a is NOT yet fed — it is
        # next round's `last`).  done samples stop advancing.
        adv = jnp.where(st["done"], 0, n_live)
        return dict(
            t=st["t"] + adv,
            seqs=seqs,
            t_cache=t_cache,
            d_cache=d_cache,
            t_len=st["t_len"] + adv,
            d_len=st["d_len"] + adv,
            last=new_last,
            done=new_done,
            rounds=st["rounds"] + 1,
            rng=rng,
        )

    st = jax.lax.while_loop(cond, body, state)
    # tokens per verify round (1.0 = no speedup, k+1 = every draft
    # accepted): the serving-side figure of merit for the draft model
    committed = jnp.sum(jnp.minimum(st["t"], max_new) - 1)
    rate = committed / jnp.maximum(st["rounds"] * b, 1)
    return {"sequences": st["seqs"],
            "scores": jnp.zeros((b,), jnp.float32),
            "rounds": st["rounds"],
            "tokens_per_round": rate}


# --------------------------------------------------------------------------
# Prompt-lookup (n-gram) speculative decoding: a DRAFT-FREE draft.
#
# The proposal source is the sequence's own history: find the most recent
# earlier occurrence of the current suffix n-gram and propose the k tokens
# that followed it.  Captioning/VQA outputs echo the prompt and repeat
# phrases constantly, so lookup hits are common — and unlike the model
# draft, a proposal round costs a handful of vector compares, so every
# accepted token is nearly free and there is NO draft cache to keep
# aligned (the full-acceptance bonus token is committed, not forgone).
# Greedy output is exact for any proposal source (same argument as
# speculative_generate; the reference has no analog — it decodes one
# python-loop token at a time, distributed_gpt3.py:1398-1480).
# --------------------------------------------------------------------------


def _ngram_propose(hist, cur, n: int, k: int, lo):
    """Propose k continuation tokens per sample by suffix n-gram lookup.

    hist [B, L] token history (pads allowed outside [lo, cur)), cur [B]
    one past the last valid token, lo [B] first valid index.  Returns
    proposals [B, k]: the tokens that followed the most recent earlier
    match of hist[cur-n : cur]; falls back to repeating the last k
    tokens when no match exists (quality only — never correctness).
    """
    b, length = hist.shape
    idx = jnp.arange(length)[None, :]                      # [1, L]
    # suffix[j] = hist[cur - n + j], j = 0..n-1
    match = jnp.ones((b, length), bool)
    for j in range(n):
        # candidate n-gram ending at m: hist[m - (n-1) + j] vs suffix[j]
        sfx = jnp.take_along_axis(
            hist, jnp.maximum(cur - n + j, 0)[:, None], axis=1)  # [B,1]
        shift = jnp.clip(idx - (n - 1) + j, 0, length - 1)
        match &= jnp.take_along_axis(hist, shift, axis=1) == sfx
    # valid candidates: whole n-gram inside [lo, cur) and strictly
    # earlier than the suffix itself
    valid = (idx - (n - 1) >= lo[:, None]) & (idx < (cur - 1)[:, None])
    best = jnp.max(jnp.where(match & valid, idx, -1), axis=1)   # [B]
    # fallback: repeat the tail (best+1..best+k reads the last k tokens)
    best = jnp.where(best < 0, cur - 1 - k, best)
    take = jnp.clip(best[:, None] + 1 + jnp.arange(k)[None, :], 0,
                    length - 1)
    return jnp.take_along_axis(hist, take, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def ngram_speculative_generate(model: GPT3LM, params, prompt_ids,
                               prompt_len,
                               config: GenerationConfig = GenerationConfig(),
                               speculate_len: int = 8, ngram: int = 2,
                               query_embeds=None):
    """Greedy prompt-lookup decoding.  Token-for-token equal to
    ``generation.generate`` with do_sample=False, beam_size=1.

    speculate_len can run higher than the model-draft path (8 vs 4):
    proposals are free, so the only cost of a long miss is the wasted
    tail of one verify chunk.
    """
    if config.do_sample:
        raise ValueError("ngram speculative decoding is greedy-only")
    k = speculate_len
    b, p = prompt_ids.shape
    nq = 0 if query_embeds is None else query_embeds.shape[1]
    prefix_len = nq + p
    max_new = config.max_new_tokens
    cache_len_cap = prefix_len + max_new + k + 1

    embeds, valid_from, pos_offset = _build_prefix(
        model, params, prompt_ids, prompt_len, query_embeds, config.pad_id)
    t_cache = model.apply(_variables(params), b, cache_len_cap,
                          method=type(model).init_cache)
    t_logits, t_cache = model.apply(
        _variables(params), embeds, t_cache, jnp.int32(0),
        valid_from, pos_offset, method=type(model).decode_step)
    first = jnp.argmax(t_logits.astype(jnp.float32), -1).astype(jnp.int32)

    # history buffer: [pad x k_i | prompt | committed tokens]; prompt is
    # right-aligned at width p (same layout _build_prefix feeds the
    # cache), so valid history is hist[valid_from : p + t]
    length = p + max_new + k + 1
    j = jnp.arange(p)[None, :]
    src = jnp.clip(j - valid_from[:, None], 0, p - 1)
    shifted = jnp.where(j >= valid_from[:, None],
                        jnp.take_along_axis(prompt_ids, src, axis=1),
                        config.pad_id)
    hist = jnp.full((b, length), config.pad_id, jnp.int32)
    hist = hist.at[:, :p].set(shifted)
    hist = hist.at[:, p].set(first)

    seqs = jnp.full((b, max_new), config.pad_id, jnp.int32)
    seqs = seqs.at[:, 0].set(first)
    done = first == config.eos_id

    state = dict(
        t=jnp.ones((b,), jnp.int32), seqs=seqs, t_cache=t_cache,
        t_len=jnp.full((b,), prefix_len, jnp.int32), hist=hist,
        last=first, done=done, rounds=jnp.int32(0))

    def cond(st):
        return ~jnp.all(st["done"] | (st["t"] >= max_new))

    def body(st):
        cur = p + st["t"]  # one past the last committed token in hist
        drafts = _ngram_propose(st["hist"], cur, ngram, k, valid_from)

        chunk = jnp.concatenate([st["last"][:, None], drafts], axis=1)
        emb = model.apply(_variables(params), chunk, method=type(model).embed)
        logits, t_cache = model.apply(
            _variables(params), emb, st["t_cache"], st["t_len"],
            valid_from, pos_offset, True, method=type(model).decode_step)
        greedy = jnp.argmax(logits.astype(jnp.float32),
                            -1).astype(jnp.int32)              # [B, k+1]
        agree = drafts == greedy[:, :k]
        accepted = jnp.cumprod(agree.astype(jnp.int32),
                               axis=1).sum(axis=1)              # [B] 0..k
        idx = jnp.arange(k + 1)[None, :]
        commit = jnp.where(idx < accepted[:, None],
                           jnp.concatenate([drafts, drafts[:, -1:]], 1),
                           jnp.take_along_axis(
                               greedy, jnp.minimum(accepted, k)[:, None],
                               axis=1))                         # [B, k+1]
        # no draft cache to protect: commit the bonus token too
        n_commit = accepted + 1                                 # [B] 1..k+1

        prev_eos = jnp.cumsum(
            (commit == config.eos_id).astype(jnp.int32), axis=1)
        no_earlier_eos = (prev_eos - (commit == config.eos_id)) == 0
        pos = st["t"][:, None] + idx
        live = ((idx < n_commit[:, None]) & ~st["done"][:, None]
                & no_earlier_eos & (pos < max_new))
        n_live = live.sum(axis=1).astype(jnp.int32)

        seqs, hist = st["seqs"], st["hist"]
        rows = jnp.arange(b)
        for jj in range(k + 1):
            tgt = jnp.clip(st["t"] + jj, 0, max_new - 1)
            val = jnp.where(live[:, jj], commit[:, jj], seqs[rows, tgt])
            seqs = seqs.at[rows, tgt].set(val)
            htgt = jnp.clip(cur + jj, 0, length - 1)
            hval = jnp.where(live[:, jj], commit[:, jj], hist[rows, htgt])
            hist = hist.at[rows, htgt].set(hval)

        hit_eos = jnp.any(live & (commit == config.eos_id), axis=1)
        new_done = st["done"] | hit_eos | (st["t"] + n_live >= max_new)
        last_idx = jnp.clip(n_live - 1, 0, k)
        new_last = jnp.where(
            n_live > 0,
            jnp.take_along_axis(commit, last_idx[:, None], axis=1)[:, 0],
            st["last"])
        # invariant: t_len = cache rows covering committed history
        # EXCLUDING `last` (whose row is only written when it is fed as
        # the head of a verify chunk).  This round wrote rows for
        # [last, drafts]; of the n_live newly committed tokens the final
        # one becomes new_last (excluded), old `last` joins the counted
        # history (+1) — net advance is exactly n_live, identical to the
        # model-draft path.  n_live is already 0 for done samples.
        return dict(
            t=st["t"] + n_live,
            seqs=seqs, t_cache=t_cache,
            t_len=st["t_len"] + n_live, hist=hist,
            last=new_last, done=new_done, rounds=st["rounds"] + 1)

    st = jax.lax.while_loop(cond, body, state)
    committed = jnp.sum(jnp.minimum(st["t"], max_new) - 1)
    rate = committed / jnp.maximum(st["rounds"] * b, 1)
    return {"sequences": st["seqs"],
            "scores": jnp.zeros((b,), jnp.float32),
            "rounds": st["rounds"],
            "tokens_per_round": rate}
