"""mPLUG-Video BloomZ-7B instruction-inference benchmark (serving path).

Measures the two halves of the instruct pipeline (cli/run_instruct.py)
on real hardware with synthetic weights at FULL 7B shape:

1. Bloom-7B int8 greedy decode throughput (tok/s) over the packed KV
   cache with in-kernel ALiBi — weights synthesized DIRECTLY in int8
   (bf16 7B = 14 GB would not leave room to quantize on a 16 GB chip).
2. Owl visual encode latency: ViT-L/14 x 8 frames -> visual abstractor
   -> visual_fc (the per-request prefix cost).

Prints ONE JSON line:
    {"metric": "instruct_decode_tokens_per_sec", "value": ...,
     "unit": "tok/s", "vs_baseline": measured/roofline,
     "encode_ms_per_clip": ...}

Knobs: BENCH_INSTRUCT_BATCH(4) / _TOKENS(64) / _TINY(0 — CPU smoke).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# reduction axes per quantized leaf name at base rank (ops/quant.py);
# Bloom shares the leaf-name contract with GPT-3
_QUANT = {"qkv_kernel": ((0,), 4), "out_kernel": ((0, 1), 3),
          "fc1_kernel": ((0,), 2), "fc2_kernel": ((0,), 2),
          "embedding": ((1,), 2)}


def synth_int8_bloom(cfg, policy, seed=0):
    """(q_params, scales): random int8 kernels + small per-channel
    scales, bf16 zeros elsewhere, layernorm scales = 1.  Never
    materializes the bf16 7B tree."""
    from youku_mplug_tpu.models.bloom import BloomLM

    model = BloomLM(cfg, policy=policy)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0),
                           tokens=jnp.zeros((1, 8), jnp.int32)))["params"]
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    q_out, s_out = {}, {}

    def assign(tree, path, leaf):
        node = tree
        keys = [getattr(p, "key", None) or str(getattr(p, "idx", p))
                for p in path]
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf

    key = jax.random.key(seed)
    for path, leaf in flat:
        name = getattr(path[-1], "key", str(path[-1]))
        spec = _QUANT.get(name)
        if spec is not None and leaf.ndim >= spec[1]:
            axes, base_rank = spec
            shift = leaf.ndim - base_rank
            key, sub = jax.random.split(key)
            # randint would materialize a 4-byte random word per int8
            # element (an ~8 GB transient on the 7B fused kernels — the
            # actual OOM/wedge risk); random bits bitcast to int8 keep
            # the transient at exactly the weight size
            n_el = int(np.prod(leaf.shape))
            words = jax.random.bits(sub, ((n_el + 3) // 4,), jnp.uint32)
            q = jax.lax.bitcast_convert_type(
                words, jnp.int8).reshape(-1)[:n_el].reshape(leaf.shape)
            s_shape = tuple(1 if (i - shift) in axes else d
                            for i, d in enumerate(leaf.shape))
            # scale ~ N(0, 0.02)-weight absmax/127 over hidden-size fan-in
            scale = jnp.full(s_shape,
                             0.02 * 4.0 / 127.0 / np.sqrt(
                                 cfg.hidden_size), jnp.float32)
            assign(q_out, path, q)
            assign(s_out, path, scale)
        elif name.endswith("_scale") or name == "scale":
            assign(q_out, path, jnp.ones(leaf.shape, jnp.bfloat16))
        else:
            assign(q_out, path, jnp.zeros(leaf.shape, jnp.bfloat16))
    return model, q_out, s_out


def main():
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    from youku_mplug_tpu.models.bloom import BloomConfig
    from youku_mplug_tpu.models.generation import (
        GenerationConfig,
        generate,
    )
    from youku_mplug_tpu.models.owl import (
        MPLUGOwlVideo,
        MPLUGOwlVideoConfig,
        OwlAbstractorConfig,
    )
    from youku_mplug_tpu.models.vision import VisionConfig
    from youku_mplug_tpu.runtime.precision import Policy

    batch = int(os.environ.get("BENCH_INSTRUCT_BATCH", "4"))
    new_tokens = int(os.environ.get("BENCH_INSTRUCT_TOKENS", "64"))
    tiny = os.environ.get("BENCH_INSTRUCT_TINY", "0") == "1"
    prompt_len = 48
    nq = 64

    if tiny:
        text_cfg = BloomConfig(vocab_size=512, hidden_size=128,
                               num_hidden_layers=2, num_attention_heads=4,
                               decode_attn_impl="gather", attn_impl="xla")
        vis_cfg = VisionConfig(img_size=32, patch_size=16, embed_dim=64,
                               depth=2, num_heads=4, num_frames=2,
                               attn_impl="xla", clip_model=True)
        abst_cfg = OwlAbstractorConfig(hidden_size=64, num_layers=2,
                                       num_heads=4, intermediate_size=128,
                                       num_queries=nq)
        frames = 2
    else:
        # bloomz-7b1 (configs/models/config_bloom_7b1.json) + ViT-L/14
        text_cfg = BloomConfig()
        vis_cfg = VisionConfig(img_size=224, patch_size=14, embed_dim=1024,
                               depth=24, num_heads=16, clip_model=True)
        abst_cfg = OwlAbstractorConfig()
        frames = 8

    # ---- device-capacity pre-check (host-side arithmetic) -----------
    # an oversized allocation doesn't just OOM: it can wedge the
    # tunneled relay backend for many minutes.  Estimate resident bytes
    # (int8 weights + embedding + KV cache + decode workspace) and
    # refuse configs that cannot fit 16 GB BEFORE touching the device.
    n_layers, h = text_cfg.num_hidden_layers, text_cfg.hidden_size
    weight_b = (12 * h * h * n_layers            # int8 kernels
                + text_cfg.vocab_size * h)       # int8 embedding
    kv_len = prompt_len + nq + new_tokens + 2
    kv_b = n_layers * batch * kv_len * 2 * h * 2  # bf16 packed cache
    logits_b = batch * text_cfg.vocab_size * 4    # decode-step logits
    est_gb = (weight_b + kv_b + 4 * logits_b) / 2**30
    budget_gb = float(os.environ.get("BENCH_HBM_GB", "16")) * 0.85
    if est_gb > budget_gb:
        raise SystemExit(
            f"estimated resident {est_gb:.1f} GB exceeds "
            f"{budget_gb:.1f} GB usable HBM — lower "
            f"BENCH_INSTRUCT_BATCH/TOKENS (refusing to risk wedging "
            f"the relay)")
    print(f"# capacity check: ~{est_gb:.1f} GB resident (budget "
          f"{budget_gb:.1f})", file=sys.stderr)

    policy = Policy(param_dtype=jnp.bfloat16)
    lm, qparams, scales = synth_int8_bloom(text_cfg, policy)
    lm_vars = {"params": qparams, "qscales": scales}

    prompt = jnp.full((batch, prompt_len), 5, jnp.int32)
    plen = jnp.full((batch,), prompt_len, jnp.int32)
    query_embeds = jnp.zeros((batch, nq, text_cfg.hidden_size),
                             jnp.bfloat16)
    gcfg = GenerationConfig(max_new_tokens=new_tokens, beam_size=1,
                            do_sample=False, eos_id=-1, pad_id=0)

    def run(seed):
        return generate(lm, lm_vars, prompt, plen,
                        query_embeds=query_embeds, config=gcfg,
                        rng=jax.random.key(seed))["sequences"]

    _ = jax.device_get(run(0))  # compile + warm
    t0 = time.time()
    _ = jax.device_get(run(1))
    dt = time.time() - t0
    toks = batch * new_tokens
    rate = toks / dt

    bytes_per_step = sum(x.size * x.dtype.itemsize
                         for x in jax.tree.leaves(lm_vars))
    roofline = batch * 819e9 / bytes_per_step
    print(f"# bloom decode: {toks} tokens in {dt*1000:.0f} ms "
          f"({dt/new_tokens*1000:.1f} ms/step, batch {batch}); int8 "
          f"weights {bytes_per_step/1e9:.2f} GB; roofline "
          f"{roofline:.0f} tok/s", file=sys.stderr)

    # ---- owl visual encode (per-request prefix cost) ----------------
    owl_cfg = MPLUGOwlVideoConfig(vision=vis_cfg, abstractor=abst_cfg,
                                  text=text_cfg)
    owl = MPLUGOwlVideo(owl_cfg, policy=policy)
    video = jnp.zeros((batch, 3, frames, vis_cfg.img_size,
                       vis_cfg.img_size), jnp.bfloat16)
    # init only the vision+abstractor side (text params come from lm):
    # build shapes host-side, materialize bf16 zeros (encode timing only)
    shapes = jax.eval_shape(
        lambda: owl.init(jax.random.key(0), video,
                         jnp.zeros((batch, 8), jnp.int32),
                         jnp.ones((batch, 8), jnp.int32),
                         jnp.zeros((batch, 8), jnp.int32),
                         jnp.zeros((batch, 8), jnp.int32)))["params"]
    vis_params = {
        k: jax.tree.map(lambda s: (jnp.ones if k.endswith("scale")
                                   else jnp.zeros)(
                                       s.shape, jnp.bfloat16), v)
        for k, v in shapes.items() if k != "text_decoder"}
    vis_params["text_decoder"] = qparams  # embed table for splicing

    enc = jax.jit(lambda p, v: owl.apply(
        {"params": p}, v, method=MPLUGOwlVideo.encode_video))
    qf = enc(vis_params, video)
    qf.block_until_ready()
    t0 = time.time()
    qf = enc(vis_params, video)
    qf.block_until_ready()
    enc_dt = time.time() - t0
    enc_ms = enc_dt / batch * 1e3
    print(f"# owl encode: {enc_dt*1e3:.1f} ms for batch {batch} "
          f"({enc_ms:.1f} ms/clip)", file=sys.stderr)

    print(json.dumps({
        "metric": "instruct_decode_tokens_per_sec",
        "value": round(rate, 1),
        "unit": "tok/s",
        "vs_baseline": round(rate / roofline, 4),
        "step_ms": round(dt / new_tokens * 1e3, 2),
        "encode_ms_per_clip": round(enc_ms, 1),
        "model": "bloomz-7b1-int8" if not tiny else "tiny",
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
    try:
        main()
    except BaseException as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "instruct_decode_tokens_per_sec", "value": None,
            "unit": None, "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
            if str(e) else type(e).__name__}))
        sys.exit(1)
