#!/bin/sh
python -m youku_mplug_tpu.cli.run_caption \
    --config configs/caption/caption_gpt3_1.3B_youku_v0.yaml \
    --output_dir output/caption_1.3b "$@"
