"""Caption serving CLI: continuous-batching engine over a trained model.

The deployment-side entry point the reference does not have (its captions
come out of the eval loop via a per-sample python ``generate`` call —
downstream/run_caption_distributed_gpt3.py:210 / distributed_gpt3.py:800).
Here requests stream through ``serving.ServingEngine``: videos are
encoded to query prefixes in batches, then each request is admitted to
the slot pool the moment a slot frees, decoding one token per engine
step for all in-flight requests.

Usage (synthetic smoke):
    python -m youku_mplug_tpu.cli.serve --config configs/pretrain_tiny.yaml \
        --output_dir /tmp/serve --synthetic_data --num_requests 8

Real checkpoints: add --resume <train run dir>.  Results (one JSON per
request with tokens + latency) land in <output_dir>/serve_results.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from youku_mplug_tpu.cli import common
from youku_mplug_tpu.cli.run_caption import build_loaders
from youku_mplug_tpu.models.generation import GenerationConfig
from youku_mplug_tpu.models.gpt3 import GPT3LM
from youku_mplug_tpu.models.tasks import MPLUGVideo
from youku_mplug_tpu.ops.preprocess import normalize_clip
from youku_mplug_tpu.serving.engine import ServingEngine


def serve_parser():
    p = common.base_parser("caption serving (continuous batching)")
    p.add_argument("--num_slots", type=int, default=8)
    p.add_argument("--serve_max_len", type=int, default=0,
                   help="KV capacity per slot (0: queries+prompt+new)")
    p.add_argument("--num_requests", type=int, default=16)
    p.add_argument("--admit_per_step", type=int, default=2,
                   help="max new requests admitted per engine step "
                        "(simulates a steady arrival process)")
    p.add_argument("--speculative", type=int, default=0,
                   help="k>0: lock-step speculative decoding instead of "
                        "the continuous-batching engine (draft: "
                        "--draft_layers-deep twin of the decoder)")
    p.add_argument("--draft_layers", type=int, default=0,
                   help="draft depth for --speculative (0: decoder "
                        "depth // 4)")
    p.add_argument("--draft", choices=("twin", "ngram"), default="twin",
                   help="--speculative proposal source: 'twin' = "
                        "truncated-depth twin of the decoder; 'ngram' = "
                        "draft-free prompt-lookup (copies continuations "
                        "of repeated n-grams from the sequence's own "
                        "history)")
    p.add_argument("--ngram_n", type=int, default=2,
                   help="suffix length matched by --draft ngram")
    return p


def main(args):
    import youku_mplug_tpu.config as cfgmod

    cfg = cfgmod.load_config(args.config)
    # (no evaluate_only flag forced here: a checkpoint is loaded when the
    # user passes --resume/--evaluate_only; a fresh-weights smoke is legal)
    runner = common.setup(args, niter_per_ep=1)
    cfg = runner.cfg
    _, _, loader = build_loaders(args, cfg)

    params = runner.params
    model = runner.model
    lm = GPT3LM(cfg.model.text, policy=model.policy)
    lm_params = params["text_decoder"]
    tok = runner.tokenizer

    max_new = cfg.get("max_new_tokens", 32)
    nq = cfg.model.num_learnable_token
    prompt_ids_all = tok([cfg.get("prompt", "")], padding="longest")
    prompt_len = int(prompt_ids_all["attention_mask"][0].sum()) - 1
    prompt_vec = [int(t) for t in
                  prompt_ids_all["input_ids"][0][:max(prompt_len, 1)]]
    bucket = max(8, 1 << (max(prompt_len, 1) - 1).bit_length())
    max_len = args.serve_max_len or (nq + bucket + max_new + 1)

    gen_cfg = GenerationConfig(
        max_new_tokens=max_new, do_sample=False,
        eos_id=tok.tokenizer.eos_id, pad_id=tok.tokenizer.pad_id)

    encode = jax.jit(lambda p, v: model.apply(
        {"params": p}, v, method=MPLUGVideo.encode_video)[1])

    if args.speculative > 0:
        return _serve_speculative(args, cfg, runner, model, lm, lm_params,
                                  params, tok, encode, prompt_vec,
                                  prompt_len, gen_cfg, loader, max_new)

    with jax.set_mesh(runner.mesh):
        engine = ServingEngine(
            lm, lm_params, num_slots=args.num_slots, max_len=max_len,
            prefill_buckets=(bucket,), config=gen_cfg)

        pending = []  # (video_id, query_embeds row)
        results = {}
        submit_t, finish_t = {}, {}
        served = 0
        t_start = time.time()
        for raw in loader:
            video = normalize_clip(jnp.asarray(raw["video"]),
                                   dtype=model.policy.compute_dtype)
            qe = np.asarray(encode(params, video), np.float32)
            for i, vid in enumerate(raw.get("video_id",
                                            range(len(qe)))):
                pending.append((str(vid), qe[i]))
            while pending and served < args.num_requests:
                # admit a trickle per step, decode everything in flight
                for _ in range(min(args.admit_per_step, len(pending))):
                    if served >= args.num_requests:
                        break
                    vid, q = pending.pop(0)
                    rid = engine.submit(prompt_vec, query_embeds=q,
                                        max_new_tokens=max_new)
                    submit_t[rid] = time.time()
                    results[rid] = {"video_id": vid}
                    served += 1
                for fin in engine.step():
                    finish_t[fin.rid] = time.time()
                    results[fin.rid]["tokens"] = fin.tokens
            if served >= args.num_requests:
                break
        for fin in engine.run_to_completion():
            finish_t[fin.rid] = time.time()
            results[fin.rid]["tokens"] = fin.tokens
        wall = time.time() - t_start

    out = []
    total_toks = 0
    for rid, r in sorted(results.items()):
        toks = r.get("tokens", [])
        total_toks += len(toks)
        text = tok.decode(np.asarray(toks + [gen_cfg.eos_id],
                                     np.int32)).replace(" ", "").strip()
        out.append({"video_id": r["video_id"], "caption": text,
                    "n_tokens": len(toks),
                    "latency_s": round(finish_t.get(rid, 0)
                                       - submit_t.get(rid, 0), 4)})
    lat = [o["latency_s"] for o in out if o["latency_s"] > 0]
    stats = {
        "requests": len(out),
        "wall_s": round(wall, 3),
        "tokens_per_sec": round(total_toks / max(wall, 1e-9), 2),
        "latency_p50_s": round(float(np.percentile(lat, 50)), 4) if lat
        else None,
        "latency_p95_s": round(float(np.percentile(lat, 95)), 4) if lat
        else None,
    }
    os.makedirs(args.output_dir, exist_ok=True)
    json.dump(out, open(os.path.join(args.output_dir,
                                     "serve_results.json"), "w"),
              ensure_ascii=False)
    print("* Serve stats:", json.dumps(stats), flush=True)
    common.write_log(args, {"serve": stats})
    return stats


def _serve_speculative(args, cfg, runner, model, lm, lm_params, params,
                       tok, encode, prompt_vec, prompt_len, gen_cfg,
                       loader, max_new):
    """Lock-step speculative serving: requests are decoded in fixed
    batches of --num_slots through ``speculative_generate`` with a
    truncated-depth twin of the decoder as the draft (zero extra
    training; see docs/SERVING.md)."""
    import dataclasses

    from youku_mplug_tpu.serving.speculative import (
        ngram_speculative_generate,
        speculative_generate,
    )

    k = args.speculative
    use_ngram = args.draft == "ngram"
    d_layers = 0
    if not use_ngram:
        L = cfg.model.text.num_hidden_layers
        d_layers = args.draft_layers or max(L // 4, 1)
        d_cfg = dataclasses.replace(cfg.model.text,
                                    num_hidden_layers=d_layers)
        draft = GPT3LM(d_cfg, policy=model.policy)
        d_params = jax.tree_util.tree_map(
            lambda x: x[:d_layers] if (hasattr(x, "shape") and x.ndim > 0
                                       and x.shape[0] == L) else x,
            lm_params)

    results = []
    total_toks = 0
    t_start = time.time()
    served = 0
    with jax.set_mesh(runner.mesh):
        for raw in loader:
            if served >= args.num_requests:
                break
            video = normalize_clip(jnp.asarray(raw["video"]),
                                   dtype=model.policy.compute_dtype)
            qe = encode(params, video)
            b = qe.shape[0]
            prompt = jnp.asarray([prompt_vec] * b, jnp.int32)
            plen = jnp.full((b,), max(prompt_len, 1), jnp.int32)
            t0 = time.time()
            if use_ngram:
                out = ngram_speculative_generate(
                    lm, lm_params, prompt, plen, config=gen_cfg,
                    speculate_len=k, ngram=args.ngram_n, query_embeds=qe)
            else:
                out = speculative_generate(lm, lm_params, draft, d_params,
                                           prompt, plen, config=gen_cfg,
                                           speculate_len=k,
                                           query_embeds=qe)
            seqs = np.asarray(out["sequences"])
            dt = time.time() - t0
            ids = raw.get("video_id", range(b))
            for i, vid in enumerate(ids):
                if served >= args.num_requests:
                    break
                toks = [int(t) for t in seqs[i] if t != gen_cfg.pad_id]
                total_toks += len(toks)
                text = tok.decode(np.asarray(
                    toks + [gen_cfg.eos_id],
                    np.int32)).replace(" ", "").strip()
                results.append({"video_id": str(vid), "caption": text,
                                "n_tokens": len(toks),
                                "latency_s": round(dt, 4)})
                served += 1
    wall = time.time() - t_start
    stats = {"requests": len(results), "wall_s": round(wall, 3),
             "tokens_per_sec": round(total_toks / max(wall, 1e-9), 2),
             "speculative_k": k, "draft": args.draft,
             "draft_layers": d_layers,
             "tokens_per_round": round(
                 float(out["tokens_per_round"]), 3) if results else None}
    os.makedirs(args.output_dir, exist_ok=True)
    json.dump(results, open(os.path.join(args.output_dir,
                                         "serve_results.json"), "w"),
              ensure_ascii=False)
    print("* Serve stats:", json.dumps(stats), flush=True)
    common.write_log(args, {"serve": stats})
    return stats


if __name__ == "__main__":
    main(serve_parser().parse_args())
