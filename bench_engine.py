"""Serving-engine benchmark: continuous-batching throughput (tokens/s).

Drives the slot-pool engine (serving/engine.py) on the flagship 1.3B
decoder: R requests with a visual-query prefix stream through S slots,
decoding with ``steps_per_dispatch`` tokens fused per device dispatch
(multi-step scheduling).  Prints one JSON line:

    {"metric": "engine_tokens_per_sec", "value": ..., "unit": "tok/s",
     "vs_baseline": ...}

vs_baseline is measured/roofline against the same memory-bound
weight-stream roofline as bench_decode.py (batch = num_slots).  On the
tunneled dev chip each dispatch pays seconds of relay RPC, so K=1 is
RPC-bound by construction; sweep BENCH_ENGINE_K (e.g. 1/32/128) to see
the multi-step amortization.  The reference has no serving engine at
all — its generate loop is per-sample, per-token
(modeling_distributed_gpt3.py:1620-1741).

Knobs: BENCH_ENGINE_SLOTS(16) / _REQUESTS(2*slots) / _TOKENS(64) /
_K(64) / _INT8(1).

Arrival mode (BENCH_ENGINE_ARRIVAL=poisson): Poisson arrivals with
mixed prompt lengths, simulated in DEVICE-STEP time (arrivals indexed
by decode step, not wall clock — on the tunneled dev chip every
dispatch pays ~1s of relay RPC, so wall-clock arrival simulation would
measure the relay).  Reports sustained tok/s (converted via the
measured per-step device time), mean slot occupancy, and p50/p99
per-request latency, against a static-batch baseline (groups of
``slots`` requests decoded lock-step; later groups queue) computed on
the SAME arrival draws.  Knobs: _RATE (expected arrivals per decode
step, default 0.35), _ARR_REQUESTS (total, default 96).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the dev-box sitecustomize force-selects the remote-TPU plugin at
    # import; honor an explicit CPU request (local smoke runs)
    jax.config.update("jax_platforms", "cpu")


def arrival_benchmark(lm, lm_vars, query_embeds, slots, new_tokens,
                      step_ms_fn):
    """Poisson-arrival continuous-batching benchmark in device-step time.

    Simulates arrivals indexed by decode step (relay-RPC-independent;
    see module docstring), measures sustained tokens/step, mean slot
    occupancy and per-request latency percentiles, and computes the
    static-batch baseline on the SAME arrival draws.
    """
    from youku_mplug_tpu.models.generation import GenerationConfig
    from youku_mplug_tpu.serving.engine import ServingEngine

    rate = float(os.environ.get("BENCH_ENGINE_RATE", "0.35"))
    n_req = int(os.environ.get("BENCH_ENGINE_ARR_REQUESTS", "96"))
    buckets = (8, 16, 32)
    rng = np.random.default_rng(11)
    gaps = rng.exponential(1.0 / rate, size=n_req)
    arrivals = np.floor(np.cumsum(gaps)).astype(int)
    plens = rng.choice(buckets, size=n_req)
    prompts = [list(rng.integers(5, 1000, p)) for p in plens]

    nq = query_embeds.shape[0]
    max_len = int(np.ceil((nq + max(buckets) + new_tokens + 2) / 64) * 64)
    gcfg = GenerationConfig(max_new_tokens=new_tokens, do_sample=False,
                            eos_id=-1, pad_id=0)
    eng = ServingEngine(lm, lm_vars, num_slots=slots, max_len=max_len,
                        prefill_buckets=buckets, config=gcfg,
                        rng=jax.random.key(3))

    # map engine rid -> request index (submit order == arrival order)
    finish_step = {}
    occupancy = []
    submitted = 0
    step = 0
    total_tokens = 0
    rid_to_idx = {}
    while len(finish_step) < n_req and step < 100000:
        while submitted < n_req and arrivals[submitted] <= step:
            rid = eng.submit(prompts[submitted],
                             query_embeds=jnp.asarray(query_embeds))
            rid_to_idx[rid] = submitted
            submitted += 1
        fin = eng.step()
        occupancy.append(sum(s is not None for s in eng._slots))
        for f in fin:
            i = rid_to_idx[f.rid]
            finish_step[i] = step
            total_tokens += len(f.tokens)
        step += 1

    lat_steps = np.asarray(
        [finish_step[i] - arrivals[i] + 1 for i in range(n_req)], float)
    step_ms = step_ms_fn()
    tok_s = total_tokens / step * 1e3 / step_ms

    # static-batch baseline on the same draws: groups of `slots`
    # requests decoded lock-step for new_tokens steps (every prompt
    # padded to the longest bucket, as a static batcher must); a group
    # starts when the previous finishes AND its last member has arrived.
    t_free = 0
    static_lat = np.zeros(n_req)
    static_total_steps = 0
    for g0 in range(0, n_req, slots):
        idx = np.arange(g0, min(g0 + slots, n_req))
        start = max(t_free, int(arrivals[idx].max()))
        end = start + new_tokens
        static_lat[idx] = end - arrivals[idx] + 1
        t_free = end
        static_total_steps = end
    static_tok_s = (n_req * new_tokens / max(static_total_steps, 1)
                    * 1e3 / step_ms)

    def pct(a, p):
        return float(np.percentile(a, p))

    return {
        "metric": "engine_poisson_tokens_per_sec",
        "value": round(tok_s, 1), "unit": "tok/s",
        "vs_baseline": round(tok_s / max(static_tok_s, 1e-9), 4),
        "static_tok_per_sec": round(static_tok_s, 1),
        "rate_per_step": rate, "requests": n_req, "slots": slots,
        "mean_occupancy": round(float(np.mean(occupancy)), 2),
        "p50_latency_ms": round(pct(lat_steps, 50) * step_ms, 1),
        "p99_latency_ms": round(pct(lat_steps, 99) * step_ms, 1),
        "static_p50_latency_ms": round(pct(static_lat, 50) * step_ms, 1),
        "static_p99_latency_ms": round(pct(static_lat, 99) * step_ms, 1),
        "step_ms": round(step_ms, 3),
    }


def main():
    from youku_mplug_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    import __graft_entry__ as ge
    from youku_mplug_tpu.models.generation import GenerationConfig
    from youku_mplug_tpu.models.gpt3 import GPT3LM
    from youku_mplug_tpu.models.tasks import MPLUGVideo
    from youku_mplug_tpu.serving.engine import ServingEngine

    slots = int(os.environ.get("BENCH_ENGINE_SLOTS", "16"))
    n_req = int(os.environ.get("BENCH_ENGINE_REQUESTS", str(2 * slots)))
    new_tokens = int(os.environ.get("BENCH_ENGINE_TOKENS", "64"))
    k = int(os.environ.get("BENCH_ENGINE_K", "64"))
    use_int8 = os.environ.get("BENCH_ENGINE_INT8", "1") == "1"
    prompt_len = 16

    tiny = os.environ.get("BENCH_ENGINE_TINY", "0") == "1"  # CPU smoke
    cfg = ge._flagship_cfg(tiny=tiny)
    model, params, video, _, _ = ge._build(cfg, batch=1,
                                           max_length=prompt_len)
    video = jax.random.normal(jax.random.key(1), video.shape, video.dtype)
    query_embeds = np.asarray(model.apply(
        {"params": params}, video, method=MPLUGVideo.encode_video)[1][0])

    # BENCH_KV_INT8=1: int8 KV cache — at 16 slots x max_len~512 the
    # bf16 cache stream rivals the int8 weight stream, so this is the
    # engine's biggest per-step byte lever (ops/kv_cache.py)
    kv_int8 = os.environ.get("BENCH_KV_INT8", "0") == "1"
    text_cfg = cfg.text
    if kv_int8:
        import dataclasses as _dc

        text_cfg = _dc.replace(text_cfg, kv_cache_dtype="int8")
    lm = GPT3LM(text_cfg, policy=model.policy)
    lm_vars = params["text_decoder"]
    if use_int8:
        from youku_mplug_tpu.ops.quant import quantize_gpt3_decoder

        qp, scales = quantize_gpt3_decoder(lm_vars, include_embedding=True)
        lm_vars = {"params": qp, "qscales": scales}

    nq = query_embeds.shape[0]
    # +256 headroom so the device-time fit below gets several full-k
    # dispatches before any slot hits the static cache end
    max_len = int(np.ceil((nq + prompt_len + new_tokens + 2) / 64) * 64) + 256
    gcfg = GenerationConfig(max_new_tokens=new_tokens, do_sample=False,
                            eos_id=-1, pad_id=0)
    rng = np.random.default_rng(7)

    def drive(seed):
        eng = ServingEngine(lm, lm_vars, num_slots=slots, max_len=max_len,
                            prefill_buckets=(prompt_len,), config=gcfg,
                            rng=jax.random.key(seed))
        for _ in range(n_req):
            eng.submit(list(rng.integers(5, 1000, prompt_len)),
                       query_embeds=jnp.asarray(query_embeds))
        fin = eng.run_to_completion(steps_per_dispatch=k)
        return sum(len(f.tokens) for f in fin)

    drive(0)  # compile both programs + warm every bucket
    t0 = time.time()
    total = drive(1)
    dt = time.time() - t0
    tok_s = total / dt

    # device-side throughput, decoupled from per-dispatch relay RPC (on
    # the tunneled dev chip each dispatch pays ~1s of RPC, swamping wall
    # tok/s): two-point fit — wall(step_many(k)) - wall(step_many(1))
    # isolates (k-1) steps of pure device time.
    def median_dispatch_ms(kk, reps=5):
        eng = ServingEngine(lm, lm_vars, num_slots=slots, max_len=max_len,
                            prefill_buckets=(prompt_len,), config=gcfg,
                            rng=jax.random.key(2))
        big = GenerationConfig(max_new_tokens=10 ** 6, do_sample=False,
                               eos_id=-1, pad_id=0)
        eng.config = big
        for _ in range(slots):
            eng.submit(list(rng.integers(5, 1000, prompt_len)),
                       query_embeds=jnp.asarray(query_embeds))
        eng.step_many(kk)  # admit + prefill + warm this k
        times = []
        budget = (max_len - prompt_len - nq - 4) // kk - 2
        for _ in range(min(reps, max(1, budget))):
            t = time.time()
            eng.step_many(kk)
            times.append(time.time() - t)
        return 1e3 * sorted(times)[len(times) // 2]

    ms_k = median_dispatch_ms(k)
    ms_1 = median_dispatch_ms(1)
    step_ms = max((ms_k - ms_1) / max(k - 1, 1), 1e-6)
    dev_tok_s = slots * 1e3 / step_ms

    lookup = int(os.environ.get("BENCH_ENGINE_LOOKUP", "0"))
    if lookup:
        # speculative-stacked engine: prompt-lookup proposals + one
        # chunked verify per round (step_lookup), repetitive-content
        # protocol like bench_decode's ngram case.  Per-round RPC is
        # constant on the relay, so wall(step_lookup) - wall(step(1))
        # isolates the verify-vs-step device delta; effective device
        # tok/s = slots x committed/round / (step_ms + delta).
        big = GenerationConfig(max_new_tokens=10 ** 6, do_sample=False,
                               eos_id=-1, pad_id=0)
        eng = ServingEngine(lm, lm_vars, num_slots=slots, max_len=max_len,
                            prefill_buckets=(prompt_len,), config=big,
                            rng=jax.random.key(3))
        pattern = rng.integers(5, 1000, 4)
        prompt = list(np.tile(pattern, prompt_len // 4 + 1)[:prompt_len])
        for _ in range(slots):
            eng.submit(list(prompt), query_embeds=jnp.asarray(query_embeds))
        eng.step_lookup(lookup)  # admit + prefill + warm the verify k
        times, commits = [], []
        budget = (max_len - prompt_len - nq - 4) // (lookup + 1) - 2
        for _ in range(min(8, max(1, budget))):
            before = sum(len(s.tokens) for s in eng._slots
                         if s is not None)
            t = time.time()
            eng.step_lookup(lookup)
            times.append((time.time() - t) * 1e3)
            commits.append(sum(len(s.tokens) for s in eng._slots
                               if s is not None) - before)
        round_ms = sorted(times)[len(times) // 2]
        delta_ms = max(round_ms - ms_1, 0.0)
        toks_round = float(np.mean(commits)) / slots
        eff_ms = step_ms + delta_ms
        eff_tok_s = slots * toks_round * 1e3 / eff_ms
        print(json.dumps({
            "metric": "engine_lookup_tokens_per_sec",
            "value": round(eff_tok_s, 1), "unit": "tok/s (device est)",
            "vs_baseline": round(eff_tok_s / dev_tok_s, 3),
            "lookup_k": lookup,
            "committed_per_round_per_slot": round(toks_round, 2),
            "round_device_ms_est": round(eff_ms, 3),
            "plain_step_ms": round(step_ms, 3),
            "plain_device_tok_per_sec": round(dev_tok_s, 1)}),
            flush=True)
        return

    if os.environ.get("BENCH_ENGINE_ARRIVAL", "") == "poisson":
        rec = arrival_benchmark(lm, lm_vars, query_embeds, slots,
                                new_tokens, step_ms_fn=lambda: step_ms)
        print(f"# poisson arrival mode; per-step device time "
              f"{step_ms:.2f} ms (two-point fit)", flush=True)
        print(json.dumps(rec), flush=True)
        return

    # weight-stream roofline at batch=slots (same convention as
    # bench_decode.py): every decode step streams the resident decoder
    # bytes once, shared across all slots
    stream_bytes = sum(x.size * x.dtype.itemsize
                       for x in jax.tree.leaves(lm_vars))
    roof = slots * 819e9 / stream_bytes  # v5e HBM BW
    print(json.dumps({
        "metric": "engine_tokens_per_sec", "value": round(tok_s, 1),
        "unit": "tok/s", "vs_baseline": round(tok_s / roof, 4),
        "device_tok_per_sec": round(dev_tok_s, 1),
        "device_vs_roofline": round(dev_tok_s / roof, 4),
        "kv_int8": kv_int8,
        "step_ms": round(step_ms, 3)}), flush=True)
    print(f"# {total} tokens in {dt:.2f}s, slots={slots} req={n_req} "
          f"k={k} int8={int(use_int8)} max_len={max_len}; "
          f"dispatch ms k={ms_k:.1f} 1={ms_1:.1f}", flush=True)


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
            "metric": 'engine_tokens_per_sec', "value": None, "unit": None,
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"
            if str(e) else type(e).__name__}))
        _sys.exit(1)
