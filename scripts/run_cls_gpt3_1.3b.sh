#!/bin/sh
python -m youku_mplug_tpu.cli.run_cls \
    --config configs/cls/cls_gpt3_1.3B_youku_v0_sharp_2.yaml \
    --output_dir output/cls_1.3b "$@"
# evaluation only:
#   sh scripts/run_cls_gpt3_1.3b.sh --evaluate_only --resume output/cls_1.3b
