#!/bin/sh
python -m youku_mplug_tpu.cli.run_retrieval_itm \
    --config configs/retrieval/retrieval_itm_gpt3_1.3B_youku_v0.yaml \
    --output_dir output/retrieval_itm_1.3b "$@"
