"""Export a trained run as a serving checkpoint.

Pipeline: restore the latest train checkpoint -> merge LoRA adapters
into the base kernels (ops/lora.py) -> optionally int8-quantize the
decoder (ops/quant.py) -> save one orbax checkpoint the serving entry
points (cli/serve.py, bench_decode.py) can load directly.

Usage:
  python tools/export_serving.py --run_dir OUT --config cfg.yaml \
      --dest OUT/serving [--int8] [--int8_embedding]

``--owl`` exports a ``run_instruct --train`` checkpoint instead (the
mPLUG-Video BloomZ instruct finetune): the YAML is the owl config
(text_overrides/abstractor blocks), Bloom LoRA adapters merge into the
base decoder kernels, and --int8 quantizes the Bloom decoder (same
kernel names as GPT-3, same quantizer).  Serve the result with
``run_instruct --serving_ckpt DEST``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True,
                    help="training output_dir (holds checkpoints/)")
    ap.add_argument("--config", required=True, help="the run's YAML")
    ap.add_argument("--dest", required=True, help="serving ckpt directory")
    ap.add_argument("--int8", action="store_true",
                    help="int8-quantize the decoder kernels")
    ap.add_argument("--int8_embedding", action="store_true",
                    help="also quantize the tied embedding (serving only)")
    ap.add_argument("--owl", action="store_true",
                    help="the run is a run_instruct --train (BloomZ "
                         "video-instruct) finetune")
    args = ap.parse_args()

    import jax
    from youku_mplug_tpu.ops.lora import merge_lora
    from youku_mplug_tpu.train.checkpoint import CheckpointManager

    if args.owl:
        from youku_mplug_tpu.cli.run_instruct import load_owl_config

        owl_cfg, _ = load_owl_config(args.config)
        text_cfg, vis_cfg = owl_cfg.text, owl_cfg.vision
    else:
        from youku_mplug_tpu.config import load_config

        rc = load_config(args.config)
        text_cfg, vis_cfg = rc.model.text, rc.model.vision
    ckpt = CheckpointManager(os.path.join(args.run_dir, "checkpoints"))
    step = ckpt.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint under {args.run_dir}/checkpoints")
    raw = ckpt.restore_raw(step)
    # TrainState layout: {'step', 'trainable', 'frozen', 'opt_state'}
    from youku_mplug_tpu.optim.factory import merge_params
    params = merge_params(raw["trainable"], raw["frozen"])

    # merge each tower with its OWN rank/alpha: text and vision adapters
    # may be configured differently, and a single global merge would fold
    # the text scale into the vision kernels (and vice versa)
    rank = text_cfg.lora_rank or vis_cfg.lora_rank
    if rank:
        params = dict(params)
        for tower, tc in (("text_decoder", text_cfg),
                          ("visual_encoder", vis_cfg)):
            if tc.lora_rank and tower in params:
                params[tower] = merge_lora(
                    params[tower], tc.lora_rank, tc.lora_alpha)
                print(f"merged {tower} LoRA adapters "
                      f"(rank {tc.lora_rank}, alpha {tc.lora_alpha})")

    out = {"params": params}
    if args.int8:
        from youku_mplug_tpu.ops.quant import quantize_gpt3_decoder

        dec = params["text_decoder"]
        qdec, scales = quantize_gpt3_decoder(
            dec, include_embedding=args.int8_embedding)
        params = dict(params)
        params["text_decoder"] = qdec
        out = {"params": params, "qscales": {"text_decoder": scales}}
        print("int8 decoder kernels"
              + (" + embedding" if args.int8_embedding else ""))

    dest = CheckpointManager(args.dest)
    dest.save(step, out, metadata={"source_step": int(step),
                                   "lora_merged": bool(rank),
                                   "int8": bool(args.int8)})
    n = sum(x.size for x in jax.tree.leaves(out["params"]))
    print(f"wrote serving checkpoint (step {step}, {n/1e6:.1f}M params) "
          f"to {args.dest}")


if __name__ == "__main__":
    main()
