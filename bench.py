"""Benchmark: flagship mPLUG-Video 1.3B pretrain step on real hardware.

Measures the full training step (TimeSformer fwd/bwd + frozen GPT-3 1.3B
fwd + activation-grad bwd + optax update) and reports MFU against the bf16
peak of the chip.  Prints ONE JSON line:
    {"metric": "pretrain_mfu_1.3b", "value": ..., "unit": "mfu",
     "vs_baseline": value/0.40}
(the 40% MFU target from BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def model_flops_per_step(batch, text_cfg, vision_cfg, n_query, seq_text):
    """Analytic matmul flops for one optimizer step.

    Decoder is frozen: forward 2NP flops/token + backward-through
    activations 2NP (dgrad only, no wgrad) -> 4NP per token.
    Vision encoder + abstractor train fully: 6NP per token.
    Attention score/value matmuls added explicitly.
    """
    h, l, v = text_cfg.hidden_size, text_cfg.num_hidden_layers, \
        text_cfg.vocab_size
    s = n_query + seq_text
    # decoder params ~ l*(12 h^2) + v*h (tied embed)
    dec_matmul = l * 12 * h * h  # per token
    dec_attn = l * 2 * s * h  # qk + pv per token (2 * s * h each? see below)
    # per-token attention flops: 2*(2*s*h) fwd
    dec_fwd = batch * s * (2 * dec_matmul + 2 * 2 * s * h * 2)
    dec_bwd_act = dec_fwd  # dgrad-only backward ~ fwd cost
    logits = 2 * batch * s * h * v  # fwd
    logits_bwd = 2 * logits  # d(hidden) and d(embed masked out, still comp)

    ve = vision_cfg
    n_patch = (ve.img_size // ve.patch_size) ** 2
    t = ve.num_frames
    hv = ve.embed_dim
    tokens_v = batch * t * n_patch
    vis_matmul = ve.depth * (12 + 12) * hv * hv  # spatial+temporal+mlp per tok
    # attention: spatial over (n_patch+1), temporal over t
    vis_attn = ve.depth * 2 * 2 * hv * ((n_patch + 1) + t)
    vis = tokens_v * (vis_matmul + vis_attn)
    vis_total = 3 * 2 * vis  # fwd + full bwd (2x fwd)

    abstractor = 3 * 2 * (
        batch * n_query * hv * hv * 4  # q/k/v/out proj approx
        + batch * n_query * (t * n_patch) * hv * 2 * 2
        + batch * n_query * hv * hv * int(ve.mlp_ratio) * 2)

    return dec_fwd + dec_bwd_act + logits + logits_bwd + vis_total + \
        abstractor


def main():
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    seq_text = 80

    from youku_mplug_tpu.models.tasks import MPLUGVideo
    from youku_mplug_tpu.optim.factory import OptimizerConfig
    from youku_mplug_tpu.runtime.mesh import (
        MeshConfig,
        device_peak_flops,
        make_mesh,
    )
    from youku_mplug_tpu.train.state import create_train_state
    from youku_mplug_tpu.train.trainer import make_train_step
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg()
    model, params, video, ids, mask = ge._build(
        cfg, batch=batch, max_length=seq_text)

    n_dev = len(jax.devices())
    mesh = make_mesh(MeshConfig(data=n_dev, model=1))

    with jax.set_mesh(mesh):
        state, tx, _ = create_train_state(
            params,
            OptimizerConfig(lr=1e-4, epochs=1, niter_per_ep=1000,
                            warmup_steps=0, freeze_text_decoder=True))

        def loss_fn(p, batch_, rng, step):
            return model.apply({"params": p}, batch_["video"],
                               batch_["ids"], batch_["mask"],
                               method=MPLUGVideo.pretrain_loss)

        train_step = jax.jit(make_train_step(loss_fn, tx),
                             donate_argnums=(0,))
        batch_dev = {"video": video, "ids": ids, "mask": mask}
        rng = jax.random.key(0)

        # compile + warmup
        state, m = train_step(state, batch_dev, rng)
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for _ in range(steps):
            state, m = train_step(state, batch_dev, rng)
        jax.block_until_ready(m["loss"])
        dt = (time.time() - t0) / steps

    flops = model_flops_per_step(batch, cfg.text, cfg.vision,
                                 cfg.num_learnable_token, seq_text)
    peak = device_peak_flops() * n_dev
    mfu = flops / (dt * peak)
    clips_per_sec = batch / dt
    print(f"# step {dt*1000:.1f} ms, {clips_per_sec:.1f} clips/s, "
          f"model flops {flops/1e12:.2f} TF, loss {float(m['loss']):.3f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "pretrain_mfu_1.3b",
        "value": round(mfu, 4),
        "unit": "mfu",
        "vs_baseline": round(mfu / 0.40, 4),
    }))


if __name__ == "__main__":
    main()
