#!/bin/sh
# Pretrain mPLUG-Video (frozen GPT-3 1.3B) — TPU-native launch.
# Multi-host: run this same command on every host of the slice; jax picks
# up the topology from the TPU runtime (no torchrun/NCCL rendezvous).
python -m youku_mplug_tpu.cli.run_pretrain \
    --config configs/pretrain/gpt3_1.3B/pretrain_gpt3_freezeGPT_youku_v0.yaml \
    --output_dir output/pretrain_1.3b "$@"
