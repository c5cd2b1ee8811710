"""Jitted autoregressive generation: batched sampling and beam search.

The TPU-native replacement for the reference's python decode loops
(reference: modeling_distributed_gpt3.py — sample:1620-1741,
beam_search:1743-1879, InferenceParams/swap_key_value_dict:1446-1473):

- the per-position python loop becomes ``lax.while_loop`` over a
  static-shape KV cache,
- the per-sample loop of the caption runner (distributed_gpt3.py:800)
  becomes a *batched* decode: variable-length prompts are front-padded
  (pads placed before the query prefix), hidden from attention via a
  per-sample ``valid_from`` mask and position-id offset — single-sample
  results are identical to the reference's unpadded decode,
- the KV-cache beam reorder (swap_key_value_dict) becomes a gather over
  the beam axis inside jit.

Beam scoring note: the reference's BeamHypotheses divides sum-logprobs by
the *constant* token-buffer length (modeling_distributed_gpt3.py:1936),
so its ranking reduces to raw sum-logprobs; we implement standard
length-penalized scoring (sum / len^alpha) with alpha configurable
(alpha=0 reproduces the reference ranking exactly).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from youku_mplug_tpu.models.gpt3 import GPT3LM

NEG_INF = -1.0e7


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 100
    eos_id: int = 7
    pad_id: int = 7
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 0.9
    beam_size: int = 5
    length_penalty: float = 0.0  # 0 == reference ranking (sum logprobs)


def top_k_top_p_filter(logits, top_k: int = 0, top_p: float = 0.0):
    """Set filtered logits to -inf (reference sampling utils,
    modeling_distributed_gpt3.py:1369-1443)."""
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if 0.0 < top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative prob (exclusive) < top_p
        keep_sorted = (cum - probs) < top_p
        # threshold = smallest kept logit
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
            keepdims=True)
        logits = jnp.where(logits < thresh, NEG_INF, logits)
    return logits


def _build_prefix(model: GPT3LM, params, prompt_ids, prompt_len,
                  query_embeds, pad_id, prompt_embeds=None):
    """Front-padded prefill embeddings.

    Layout per sample: [pad x k_i | queries (nq) | prompt tokens (len_i)]
    with k_i = P - len_i, so every sample's last prompt token lands at the
    same (static) position and generation proceeds in lock-step.
    Returns (embeds [B, nq+P, H], valid_from [B], pos_offset [B]).

    prompt_embeds [B, P, H]: pre-built prompt embeddings (e.g. with video
    query features spliced at media positions — models/owl.py); when
    given, they replace the token-embedding lookup and are right-aligned
    the same way.
    """
    b, p = prompt_ids.shape
    nq = 0 if query_embeds is None else query_embeds.shape[1]
    k = (p - prompt_len).astype(jnp.int32)  # [B]

    # right-align tokens within the P-wide buffer
    j = jnp.arange(p)[None, :]
    src = jnp.clip(j - k[:, None], 0, p - 1)
    if prompt_embeds is not None:
        tok_emb = jnp.take_along_axis(prompt_embeds, src[..., None], axis=1)
        tok_emb = jnp.where((j >= k[:, None])[..., None], tok_emb, 0.0)
    else:
        shifted = jnp.where(
            j >= k[:, None],
            jnp.take_along_axis(prompt_ids, src, axis=1), pad_id)
        tok_emb = model.apply(_variables(params), shifted,
                              method=type(model).embed)
    h = tok_emb.shape[-1]
    total = nq + p
    jj = jnp.arange(total)[None, :, None]  # [1, total, 1]
    kk = k[:, None, None]

    # token component: tokens live at jj >= kk + nq, token index = jj - nq
    tok_idx = jnp.clip(jnp.arange(total)[None, :] - nq, 0, p - 1)
    tok_idx = jnp.broadcast_to(tok_idx, (b, total))
    tok_part = jnp.take_along_axis(tok_emb, tok_idx[..., None], axis=1)
    if query_embeds is not None:
        q_idx = jnp.clip(jnp.arange(total)[None, :] - k[:, None], 0, nq - 1)
        q_part = jnp.take_along_axis(
            query_embeds.astype(tok_emb.dtype), q_idx[..., None], axis=1)
        embeds = jnp.where(jj < kk, 0.0,
                           jnp.where(jj < kk + nq, q_part, tok_part))
    else:
        embeds = jnp.where(jj < kk, 0.0, tok_part)
    return embeds, k, k


def _variables(params):
    """Accept a raw param tree or a full variables dict ({'params': ...,
    'qscales': ...} for the int8 decode path, ops/quant.py)."""
    if isinstance(params, dict) and "params" in params:
        return params
    return {"params": params}


def generate(model: GPT3LM, params, prompt_ids, prompt_len,
             query_embeds=None, config: GenerationConfig = GenerationConfig(),
             rng: Optional[jax.Array] = None, prompt_embeds=None):
    """Batched generation.  prompt_ids [B, P] right-padded, prompt_len [B]
    true lengths (callers drop the trailing eos, matching the reference's
    prompt_length = mask.sum()-1, distributed_gpt3.py:805-807).

    prompt_embeds: optional [B, P, H] pre-built prompt embeddings (video
    splicing — models/owl.py generate_instruct).

    Returns dict(sequences [B, max_new_tokens] — pad-filled after eos,
    scores [B]).
    """
    if config.do_sample or config.beam_size <= 1:
        return _sample(model, params, prompt_ids, prompt_len, query_embeds,
                       prompt_embeds, config, rng)
    return _beam_search(model, params, prompt_ids, prompt_len, query_embeds,
                        prompt_embeds, config)


@functools.partial(jax.jit, static_argnums=(0, 6))
def _sample(model, params, prompt_ids, prompt_len, query_embeds,
            prompt_embeds, config, rng):
    b, p = prompt_ids.shape
    nq = 0 if query_embeds is None else query_embeds.shape[1]
    prefix_len = nq + p
    max_len = prefix_len + config.max_new_tokens
    if rng is None:
        rng = jax.random.key(0)

    embeds, valid_from, pos_offset = _build_prefix(
        model, params, prompt_ids, prompt_len, query_embeds, config.pad_id,
        prompt_embeds)
    cache = model.apply(_variables(params), b, max_len,
                        method=type(model).init_cache)
    logits, cache = model.apply(
        _variables(params), embeds, cache, jnp.int32(0),
        valid_from, pos_offset, method=type(model).decode_step)

    def pick(logits, step_rng):
        logits = logits.astype(jnp.float32) / config.temperature
        if not config.do_sample:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits = top_k_top_p_filter(logits, config.top_k, config.top_p)
        return jax.random.categorical(step_rng, logits).astype(jnp.int32)

    rng, sub = jax.random.split(rng)
    first = pick(logits, sub)
    seqs = jnp.full((b, config.max_new_tokens), config.pad_id, jnp.int32)
    seqs = seqs.at[:, 0].set(first)
    done = first == config.eos_id

    def cond(state):
        t, _, _, done, _ = state
        return (t < config.max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, seqs, cache, done, rng = state
        last = seqs[:, t - 1]
        emb = model.apply(_variables(params), last[:, None],
                          method=type(model).embed)
        logits, cache = model.apply(
            _variables(params), emb, cache, prefix_len + t - 1,
            valid_from, pos_offset, method=type(model).decode_step)
        rng, sub = jax.random.split(rng)
        nxt = pick(logits, sub)
        nxt = jnp.where(done, config.pad_id, nxt)
        seqs = seqs.at[:, t].set(nxt)
        done = done | (nxt == config.eos_id)
        return t + 1, seqs, cache, done, rng

    _, seqs, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), seqs, cache, done, rng))
    return {"sequences": seqs, "scores": jnp.zeros((b,), jnp.float32)}


def _gather_beams(tree, beam_idx, b, k, prefix_len=0):
    """Gather the beam axis of every [.., B*K, ..] cache leaf and of
    [B, K, ...] state arrays. beam_idx: [B, K] int.

    prefix_len > 0: rows [0, prefix_len) of the cache (dim 2) hold the
    prefill K/V, which is IDENTICAL across a sample's beams (beams only
    diverge in generated tokens) — reordering it is a no-op, so only the
    generated tail is gathered and written back.  At M=256 with 64 new
    tokens this skips 3/4 of the reorder traffic every beam step (the
    reference instead re-keys python dicts per layer,
    modeling_distributed_gpt3.py swap_key_value_dict:1446-1473)."""
    flat_idx = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)  # [B*K]

    def gather(x):
        if x.ndim >= 2 and x.shape[1] == b * k:  # cache leaves [L, B*K, ...]
            if prefix_len and x.ndim >= 3 and x.shape[2] > prefix_len:
                tail = jax.lax.slice_in_dim(x, prefix_len, x.shape[2],
                                            axis=2)
                return jax.lax.dynamic_update_slice_in_dim(
                    x, tail[:, flat_idx], prefix_len, axis=2)
            return x[:, flat_idx]
        return x

    return jax.tree.map(gather, tree)


@functools.partial(jax.jit, static_argnums=(0, 6))
def _beam_search(model, params, prompt_ids, prompt_len, query_embeds,
                 prompt_embeds, config):
    b, p = prompt_ids.shape
    kbeam = config.beam_size
    nq = 0 if query_embeds is None else query_embeds.shape[1]
    prefix_len = nq + p
    max_new = config.max_new_tokens
    max_len = prefix_len + max_new
    eos = config.eos_id

    embeds, valid_from, pos_offset = _build_prefix(
        model, params, prompt_ids, prompt_len, query_embeds, config.pad_id,
        prompt_embeds)

    # tile to [B*K, ...]
    def tile(x):
        return jnp.repeat(x, kbeam, axis=0)

    embeds_t = tile(embeds)
    valid_t = tile(valid_from)
    off_t = tile(pos_offset)

    cache = model.apply(_variables(params), b * kbeam, max_len,
                        method=type(model).init_cache)
    logits, cache = model.apply(
        _variables(params), embeds_t, cache, jnp.int32(0), valid_t, off_t,
        method=type(model).decode_step)
    v = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32)).reshape(b, kbeam, v)

    def penalize(scores, length):
        if config.length_penalty == 0.0:
            return scores
        return scores / (length.astype(jnp.float32) ** config.length_penalty)

    # state
    alive_seq = jnp.full((b, kbeam, max_new), config.pad_id, jnp.int32)
    # step 0: only beam 0 is a real candidate (all beams identical)
    first_logp = logp[:, 0]  # [B, V]
    top_scores, top_tokens = jax.lax.top_k(first_logp, kbeam)  # [B, K]
    alive_seq = alive_seq.at[:, :, 0].set(top_tokens)
    alive_score = jnp.where(top_tokens == eos, NEG_INF, top_scores)
    fin_seq = jnp.zeros_like(alive_seq)
    fin_score = jnp.where(top_tokens == eos,
                          penalize(top_scores, jnp.asarray(1)), NEG_INF)
    fin_seq = jnp.where((top_tokens == eos)[..., None],
                        alive_seq, fin_seq)
    # beams that hit eos at step 0 stay in alive with -inf (dead)

    def cond(state):
        t, alive_score, fin_score = state[0], state[3], state[5]
        best_alive = penalize(
            jnp.max(alive_score, axis=1),
            jnp.asarray(max_new if config.length_penalty > 0 else 1))
        worst_fin = jnp.min(fin_score, axis=1)
        improvable = jnp.any(best_alive > worst_fin)
        return (t < max_new) & improvable

    def body(state):
        t, alive_seq, cache, alive_score, fin_seq, fin_score = state
        last = alive_seq[:, :, t - 1].reshape(b * kbeam)
        emb = model.apply(_variables(params), last[:, None],
                          method=type(model).embed)
        logits, cache = model.apply(
            _variables(params), emb, cache, prefix_len + t - 1,
            valid_t, off_t, method=type(model).decode_step)
        logp = jax.nn.log_softmax(
            logits.astype(jnp.float32)).reshape(b, kbeam, v)
        cand = alive_score[:, :, None] + logp  # [B, K, V]

        # 2K candidates (reference takes 2*beam_size, :1823-1826)
        flat = cand.reshape(b, kbeam * v)
        top2k_score, top2k_idx = jax.lax.top_k(flat, 2 * kbeam)
        beam_idx = top2k_idx // v
        tok_idx = top2k_idx % v
        is_eos = tok_idx == eos

        # finished candidates: eos hypotheses, penalized by generated length
        new_fin_scores = jnp.where(is_eos, penalize(top2k_score,
                                                    jnp.asarray(t + 1)),
                                   NEG_INF)
        seq2k = jnp.take_along_axis(alive_seq, beam_idx[..., None], axis=1)
        # merge top finished candidates into the finished set
        all_fin_scores = jnp.concatenate([fin_score, new_fin_scores], axis=1)
        all_fin_seqs = jnp.concatenate([fin_seq, seq2k], axis=1)
        keep_score, keep_idx = jax.lax.top_k(all_fin_scores, kbeam)
        fin_seq = jnp.take_along_axis(all_fin_seqs, keep_idx[..., None],
                                      axis=1)
        fin_score = keep_score

        # alive candidates: best K non-eos
        alive_cand_score = jnp.where(is_eos, NEG_INF, top2k_score)
        new_score, pick = jax.lax.top_k(alive_cand_score, kbeam)
        new_beam = jnp.take_along_axis(beam_idx, pick, axis=1)
        new_tok = jnp.take_along_axis(tok_idx, pick, axis=1)
        alive_seq = jnp.take_along_axis(alive_seq, new_beam[..., None],
                                        axis=1)
        alive_seq = alive_seq.at[:, :, t].set(new_tok)
        alive_score = new_score
        cache = _gather_beams(cache, new_beam, b, kbeam,
                              prefix_len=prefix_len)
        return t + 1, alive_seq, cache, alive_score, fin_seq, fin_score

    t, alive_seq, cache, alive_score, fin_seq, fin_score = \
        jax.lax.while_loop(
            cond, body,
            (jnp.int32(1), alive_seq, cache, alive_score, fin_seq,
             fin_score))

    # open beams join the finished pool (reference :1866-1870)
    open_score = penalize(alive_score, jnp.maximum(t, 1))
    all_scores = jnp.concatenate([fin_score, open_score], axis=1)
    all_seqs = jnp.concatenate([fin_seq, alive_seq], axis=1)
    best_score, best_idx = jax.lax.top_k(all_scores, 1)
    best_seq = jnp.take_along_axis(all_seqs, best_idx[..., None], axis=1)
    return {"sequences": best_seq[:, 0], "scores": best_score[:, 0]}
