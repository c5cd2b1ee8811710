"""Serving-path benchmark: 1.3B greedy decode throughput (tokens/s).

Measures the jitted whole-generate program (prefill 128 visual queries +
greedy decode) on real hardware.  Prints one JSON line:
    {"metric": "decode_tokens_per_sec", "value": ..., "unit": "tok/s",
     "vs_baseline": ...}

Baseline convention: a memory-bound roofline for the chip — each decoded
token must stream the decoder weights once per sequence-independent
batch, so tok/s_peak ~= batch * HBM_BW / decoder_bytes; vs_baseline is
measured/roofline.  On the tunneled dev chip the timing loop lives in
one dispatch (see axon notes in BENCHLOG.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import __graft_entry__ as ge
    from youku_mplug_tpu.models.generation import (
        GenerationConfig,
        generate,
    )
    from youku_mplug_tpu.models.gpt3 import GPT3LM
    from youku_mplug_tpu.models.tasks import MPLUGVideo

    batch = int(os.environ.get("BENCH_DECODE_BATCH", "8"))
    new_tokens = int(os.environ.get("BENCH_DECODE_TOKENS", "64"))
    # long-context protocol (int8-KV A/B): at prompt_len ~1024 the KV
    # stream rivals the weight stream, which is the regime the int8
    # cache exists for (ops/kv_cache.py)
    prompt_len = int(os.environ.get("BENCH_DECODE_PROMPT_LEN", "16"))

    cfg = ge._flagship_cfg(
        scan_layers=os.environ.get("BENCH_SCAN", "1") == "1")
    model, params, video, ids, mask = ge._build(
        cfg, batch=batch, max_length=prompt_len)
    video = jax.random.normal(jax.random.key(1), video.shape, video.dtype)

    # visual prefix (queries through the abstractor), like run_caption
    query_embeds = model.apply(
        {"params": params}, video, method=MPLUGVideo.encode_video)[1]
    # BENCH_KV_INT8=1: quantized int8 KV cache (ops/kv_cache.py) — halves
    # decode-time cache streaming, independent of weight quantization
    kv_int8 = os.environ.get("BENCH_KV_INT8", "0") == "1"
    text_cfg = cfg.text
    if kv_int8:
        import dataclasses as _dc

        text_cfg = _dc.replace(text_cfg, kv_cache_dtype="int8")
    lm = GPT3LM(text_cfg, policy=model.policy)
    lm_params = params["text_decoder"]

    beam = int(os.environ.get("BENCH_DECODE_BEAM", "1"))
    # BENCH_DECODE_PROMPT=rand: independent random prompt tokens per
    # sample — the NON-repetitive acceptance protocol for speculative
    # rows (constant prompts + synthetic weights fall into greedy loops
    # that flatter ngram acceptance; VERDICT r3 item 8).
    if os.environ.get("BENCH_DECODE_PROMPT", "const") == "rand":
        prompt = jax.random.randint(jax.random.key(7),
                                    (batch, prompt_len), 4,
                                    cfg.text.vocab_size, jnp.int32)
    else:
        prompt = jnp.full((batch, prompt_len), 5, jnp.int32)
    plen = jnp.full((batch,), prompt_len, jnp.int32)
    gcfg = GenerationConfig(max_new_tokens=new_tokens, beam_size=beam,
                            do_sample=False, eos_id=-1, pad_id=0)

    use_int8 = os.environ.get("BENCH_DECODE_INT8", "0") == "1"
    lm_vars = lm_params
    if use_int8:
        from youku_mplug_tpu.ops.quant import quantize_gpt3_decoder

        qparams, scales = quantize_gpt3_decoder(lm_params,
                                                include_embedding=True)
        lm_vars = {"params": qparams, "qscales": scales}

    # speculative decoding: BENCH_DECODE_SPEC=k uses a truncated-depth
    # twin of the decoder as the draft (depth//4 layers, same weights —
    # a realistic "shallow draft" without training one)
    spec = int(os.environ.get("BENCH_DECODE_SPEC", "0"))
    # prompt-lookup decoding: BENCH_DECODE_NGRAM=k proposes k tokens per
    # round from the sequence's own history (no draft model at all);
    # BENCH_DECODE_NGRAM_N sets the matched suffix length (default 2).
    # Acceptance is content-dependent — greedy loops on synthetic
    # weights are repetitive, so this is the optimistic end.
    ngram_k = int(os.environ.get("BENCH_DECODE_NGRAM", "0"))
    if ngram_k > 0:
        from youku_mplug_tpu.serving.speculative import (
            ngram_speculative_generate,
        )

        ngram_n = int(os.environ.get("BENCH_DECODE_NGRAM_N", "2"))

        def run(seed):
            out = ngram_speculative_generate(
                lm, lm_vars, prompt, plen, config=gcfg,
                speculate_len=ngram_k, ngram=ngram_n,
                query_embeds=query_embeds)
            return out["sequences"], {
                "ngram_k": ngram_k, "ngram_n": ngram_n,
                "rounds": int(jax.device_get(out["rounds"])),
                "tokens_per_round": round(float(
                    jax.device_get(out["tokens_per_round"])), 3)}
    elif spec > 0:
        import dataclasses as _dc

        from youku_mplug_tpu.serving.speculative import speculative_generate

        d_layers = max(cfg.text.num_hidden_layers // 4, 1)
        d_cfg = _dc.replace(cfg.text, num_hidden_layers=d_layers)
        draft = GPT3LM(d_cfg, policy=model.policy)
        d_params = jax.tree_util.tree_map(
            lambda x: x[:d_layers] if (hasattr(x, "shape") and x.ndim > 0
                                       and x.shape[0]
                                       == cfg.text.num_hidden_layers)
            else x, lm_params)

        def run(seed):
            out = speculative_generate(lm, lm_vars, draft, d_params,
                                       prompt, plen, config=gcfg,
                                       speculate_len=spec,
                                       query_embeds=query_embeds)
            # acceptance telemetry (tokens committed per verify round,
            # 1.0 = no speedup, k+1 = all drafts accepted) is the
            # serving-side figure of merit — surface it in the JSON
            return out["sequences"], {
                "spec_k": spec,
                "rounds": int(jax.device_get(out["rounds"])),
                "tokens_per_round": round(float(
                    jax.device_get(out["tokens_per_round"])), 3)}
    else:
        def run(seed):
            out = generate(lm, lm_vars, prompt, plen,
                           query_embeds=query_embeds, config=gcfg,
                           rng=jax.random.key(seed))
            return out["sequences"], {}

    seqs, telemetry = run(0)
    _ = jax.device_get(seqs)  # compile + warmup, value-forced
    t0 = time.time()
    seqs, telemetry = run(1)
    _ = jax.device_get(seqs)
    dt = time.time() - t0

    toks = batch * new_tokens  # emitted tokens (beam compute is k-fold)
    rate = toks / dt
    # roofline: the RESIDENT decoder bytes streamed once per decode step
    # (bf16: 2 B/param; int8: 1 B + per-channel scales) — so the int8 row
    # is judged against its own, ~2x higher, bound
    bytes_per_step = sum(x.size * x.dtype.itemsize
                         for x in jax.tree.leaves(lm_vars))
    hbm_bw = 819e9  # v5e
    roofline = batch * hbm_bw / bytes_per_step
    print(f"# {toks} tokens in {dt*1000:.0f} ms "
          f"({dt/new_tokens*1000:.1f} ms/step, batch {batch}); "
          f"weight-stream roofline {roofline:.0f} tok/s "
          f"({bytes_per_step/1e9:.2f} GB/step, int8={int(use_int8)})",
          file=sys.stderr)
    print(json.dumps({
        "metric": "decode_tokens_per_sec",
        "value": round(rate, 1),
        "unit": "tok/s",
        "vs_baseline": round(rate / roofline, 4),
        "int8": use_int8,
        "kv_int8": kv_int8,
        **telemetry,
    }))


if __name__ == "__main__":
    # a driver timeout delivers SIGTERM, which would kill the process
    # with no parseable record; convert it to SystemExit so the except
    # below still emits the artifact line (e.g. backend-unavailable
    # hangs killed from outside)
    import signal as _signal
    import sys as _sys

    _signal.signal(_signal.SIGTERM, lambda *_: _sys.exit("SIGTERM "
                   "(driver timeout — likely backend unavailable/hang)"))
    # emit a machine-readable error record as the last stdout line on any
    # failure so driver artifacts stay parseable even when hardware flakes
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        import json as _json
        import sys as _sys
        import traceback as _tb

        _tb.print_exc()
        print(_json.dumps({
            "metric": 'decode_tokens_per_sec', "value": None, "unit": None,
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
            if str(e) else type(e).__name__}))
        _sys.exit(1)
