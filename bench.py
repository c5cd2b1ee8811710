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
    """Analytic model FLOPs for one optimizer step (MFU convention: count
    the model's matmul flops once per logical pass; remat recompute is NOT
    counted).

    Decoder (frozen): fwd + dgrad-only bwd = 2x fwd.
    Tied-embedding logits: fwd + d(hidden) = 2x fwd (embedding frozen).
    Vision + abstractor (trained): fwd + full bwd = 3x fwd.
    Per-token per-layer fwd FLOPs for a pre-LN block with hidden h:
      qkv 6h^2 + out proj 2h^2 + mlp 16h^2 (ffn=4h) = 24h^2,
      attention 4*L*h (qk + pv) for context length L.
    """
    h, l, v = text_cfg.hidden_size, text_cfg.num_hidden_layers, \
        text_cfg.vocab_size
    s = n_query + seq_text
    dec_fwd = batch * s * l * (24 * h * h + 4 * s * h)
    dec_total = 2 * dec_fwd
    logits_total = 2 * (2 * batch * s * h * v)

    ve = vision_cfg
    n_patch = (ve.img_size // ve.patch_size) ** 2
    t = ve.num_frames
    hv = ve.embed_dim
    tokens_v = batch * t * n_patch
    ffn = int(ve.mlp_ratio * hv)
    # divided space-time block: spatial attn (8h^2) + temporal attn (8h^2)
    # + temporal_fc (2h^2) + mlp (4*ffn*h) per token, plus attention terms
    per_tok = (18 * hv * hv + 4 * ffn * hv
               + 4 * (n_patch + 1) * hv + 4 * t * hv)
    patchify = 2 * tokens_v * (3 * ve.patch_size ** 2) * hv
    vis_total = 3 * (tokens_v * ve.depth * per_tok + patchify)

    kv = t * n_patch
    abst_fwd = batch * (
        n_query * 8 * hv * hv          # q/out proj + mlp-ish
        + kv * 4 * hv * hv             # k/v proj
        + 4 * n_query * kv * hv        # cross attention
        + n_query * int(ve.mlp_ratio * hv) * hv * 4)
    abst_total = 3 * abst_fwd
    proj = 3 * (2 * batch * n_query * hv * h)  # visual_fc

    return dec_total + logits_total + vis_total + abst_total + proj


def _probe_backend(attempts=int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3")),
                   sleep_s=int(os.environ.get("BENCH_PROBE_SLEEP", "60")),
                   probe_timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT",
                                                    "240"))):
    """Probe the JAX backend with retries BEFORE initializing in-process:
    the tunneled TPU relay occasionally flakes at init — sometimes
    raising, sometimes HANGING inside a C call (which no in-process
    signal can interrupt).  Each probe runs in a killable subprocess, so
    a hang becomes a catchable timeout and the bench still emits its
    machine-readable error line instead of dying silently under the
    driver's hard kill (round-2 lesson)."""
    import subprocess

    last = None
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                timeout=probe_timeout, capture_output=True, text=True)
            if r.returncode == 0:
                return jax.devices()  # relay verified alive; init for real
            last = RuntimeError(
                "backend probe subprocess failed: "
                + (r.stderr.strip().splitlines() or ["?"])[-1][:200])
        except subprocess.TimeoutExpired:
            last = TimeoutError(f"backend init hung > {probe_timeout}s")
        print(f"# backend probe {i + 1}/{attempts} failed: "
              f"{str(last).splitlines()[0][:160]}", file=sys.stderr)
        if i + 1 < attempts:
            time.sleep(sleep_s)
    raise last


def main():
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    _probe_backend()
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
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

    # experiment knobs (env overrides live HERE, not in model code)
    remat_env = os.environ.get("BENCH_REMAT", "1")
    preset = os.environ.get("BENCH_PRESET", "1.3B")  # "1.3B" | "2.7B"
    cfg = ge._flagship_cfg(
        size=preset,
        scan_layers=os.environ.get("BENCH_SCAN", "1") == "1",
        remat=remat_env != "0",
        remat_policy=(remat_env
                      if remat_env in ("dots", "attn", "names", "offload", "nofc1", "narrow")
                      else "nothing"),
        ce_chunk=int(os.environ.get("BENCH_CE_CHUNK", "32")),
        grad_ckpt=os.environ.get("BENCH_VIS_CKPT", "1") == "1",
        use_packed_flash=os.environ.get("BENCH_PACKED", "1") == "1",
        vis_remat_policy=os.environ.get("BENCH_VIS_REMAT", "sixth"),
        dec_attn_impl=os.environ.get("BENCH_DEC_ATTN", "packed"),
        vis_attn_impl=os.environ.get("BENCH_VIS_ATTN", "packed"),
        scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        layer_pairing=os.environ.get("BENCH_PAIR", "0") == "1",
        temporal_flash=os.environ.get("BENCH_TFLASH", "1") == "1",
    )
    model, params, video, ids, mask = ge._build(
        cfg, batch=batch, max_length=seq_text)

    n_dev = len(jax.devices())
    mesh = make_mesh(MeshConfig(data=n_dev, model=1))

    with jax.set_mesh(mesh):
        # frozen decoder in bf16, as the production CLI does (cli/common.py):
        # fp32 storage would re-convert 5.2 GB of sliced stacked params
        # every step inside the decoder scan and double its HBM footprint
        state, tx, _ = create_train_state(
            params,
            OptimizerConfig(lr=1e-4, epochs=1, niter_per_ep=1000,
                            warmup_steps=0, freeze_text_decoder=True),
            frozen_dtype=jnp.bfloat16)

        def loss_fn(p, batch_, rng, step):
            return model.apply({"params": p}, batch_["video"],
                               batch_["ids"], batch_["mask"],
                               method=MPLUGVideo.pretrain_loss)

        # Measure `steps` chained train steps inside ONE dispatch: on
        # tunneled dev chips per-dispatch RPC overhead is seconds, while
        # on real pods dispatch is microseconds and overlaps compute —
        # the in-program loop is the representative number.  The final
        # loss is value-forced (async dispatch never blocks otherwise).
        step_fn = make_train_step(loss_fn, tx)
        video = jax.random.normal(jax.random.key(3), video.shape,
                                  video.dtype)
        batch_dev = {"video": video, "ids": ids, "mask": mask}

        @jax.jit
        def multi_step(state, batch, rng):
            def body(i, st):
                st, _ = step_fn(st, batch, jax.random.fold_in(rng, i))
                return st
            st = jax.lax.fori_loop(0, steps - 1, body, state)
            return step_fn(st, batch, rng)

        flash_fallback = False
        try:
            _, m = multi_step(state, batch_dev, jax.random.key(0))
            _ = float(m["loss"])  # compile + warmup
        except jax.errors.JaxRuntimeError as e:
            # compile-failure fallback: retry once with single-sample
            # flash grid cells (a fresh chip/toolchain may reject the
            # batch-blocked VMEM geometry; a slower bench beats none).
            # The JSON records the fallback so a silent path switch can
            # never misattribute the measured MFU to the default kernel.
            print(f"# retrying with single-sample flash cells: "
                  f"{str(e).splitlines()[0][:120]}", file=sys.stderr)
            from youku_mplug_tpu.ops import flash_attention as _fa
            _fa.FORCE_SINGLE_SAMPLE_CELLS = True
            flash_fallback = True
            jax.clear_caches()
            _, m = multi_step(state, batch_dev, jax.random.key(0))
            _ = float(m["loss"])
        t0 = time.time()
        _, m = multi_step(state, batch_dev, jax.random.key(1))
        _ = float(m["loss"])
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
        "metric": ("pretrain_mfu_1.3b" if preset == "1.3B"
                   else f"pretrain_mfu_{preset.lower()}"),
        "value": round(mfu, 4),
        "unit": "mfu",
        "vs_baseline": round(mfu / 0.40, 4),
        "flash_fallback": flash_fallback,
        "step_ms": round(dt * 1000, 1),
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
    # the driver parses the LAST stdout line as JSON: on ANY failure emit
    # a machine-readable error record instead of dying with a bare
    # traceback (round-2's BENCH artifact was an unparseable rc=1 trace)
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - deliberate: artifact first
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "pretrain_mfu_1.3b",
            "value": None,
            "unit": "mfu",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
            if str(e) else type(e).__name__,
        }))
        sys.exit(1)
